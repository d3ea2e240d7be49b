"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship BM25 top-k on /root/testdata/sf0.001
queries()      -> registry of implemented operators (SURVEY.md §2)
oracle_sql()   -> DuckDB-equivalent SQL per query (driver correctness gate)

Implementations live in ariadna_spark/ (see SURVEY.md §7 build plan).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from ariadna_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-k over the sf0.001 documents corpus."""
    return _q.q_bm25_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    d = dict(_q.ORACLES)
    # embedding_ivf's oracle inlines DATA-FITTED centroid literals, so it
    # is generated lazily for the gate sf (driver default: sf0.01; local
    # runs parameterize via SPARK_GRAFT_TEST_SF_DIR) rather than frozen
    # at import like the data-independent SQL strings.
    d["embedding_ivf"] = _q.sql_embedding_ivf()
    return d
