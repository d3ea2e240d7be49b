import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ariadna_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ariadna-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    from ariadna_spark.corpus import load_docs

    d = load_docs(spark, SF_DIR)
    d.persist()
    d.count()
    return d


@pytest.fixture(scope="session")
def synth_docs(spark):
    from ariadna_spark.corpus import synth_code_corpus

    d = synth_code_corpus(spark, n=120, seed=42)
    d.persist()
    d.count()
    return d
