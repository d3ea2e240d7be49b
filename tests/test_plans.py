"""Plan-shape regression tests: the physical plans the design relies on
(SURVEY.md §4) must actually materialize."""

import os

import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filter,
    assert_take_ordered,
    physical_plan,
)
from ariadna_spark.sources.segments import build_index


@pytest.fixture(scope="module")
def index_dir(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans_idx"))
    build_index(spark, docs, out, build_id="p1", n_buckets=4)
    return out


def test_term_filter_pushed_to_parquet(spark, index_dir):
    reader = IndexReader(spark, index_dir)
    blocks = reader._blocks_for_terms(["merge", "join"])
    assert_pushed_filter(blocks, "term")


def test_topk_is_take_ordered(spark, docs):
    from ariadna_spark.operators.topk import bm25_topk

    assert_take_ordered(bm25_topk(docs, "merge join", 10))


def test_docs_scan_prunes_columns(spark):
    """term_freqs must read only (doc_id, content) from the source —
    ReadSchema in the scan should not mention repo/path/commit."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.stats import term_freqs

    tf = term_freqs(load_docs(spark, sf))
    plan = physical_plan(tf)
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    assert all("n_chars" not in ln for ln in scan_lines), scan_lines


def test_small_dim_join_broadcasts(spark, docs):
    dim = docs.select("doc_id", "repo").limit(100)
    joined = docs.join(F.broadcast(dim), "doc_id")
    assert_broadcast_join(joined)
