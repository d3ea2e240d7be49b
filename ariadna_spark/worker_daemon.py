"""Python worker daemon with the engine's heavy imports preloaded.

pyspark's worker model forks workers from a daemon process; the stock
daemon imports only pyspark, so EVERY forked worker pays the
numpy/pandas/pyarrow import (~0.5s each, measured ~2.5s of wall for the
first Python-boundary job at local[32] as 32 workers import in
parallel). Importing them HERE, before the fork server starts, lets
every worker inherit the warm modules through copy-on-write fork —
first-job latency drops to fork cost.

Wired by session.get_spark via spark.python.daemon.module (local mode:
the daemon inherits the driver's environment, so PYTHONPATH is set there
to make this module importable; on a real cluster ship it with
--py-files and set the same conf).
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyarrow.compute  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
