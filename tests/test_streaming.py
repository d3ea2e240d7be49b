"""Incremental (streaming) indexing: per-batch segments + merge-on-read
must be rank- and score-identical to one monolithic build."""

import os

import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.topk import bm25_topk
from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.sources.segments import SegmentStore, build_index
from ariadna_spark.streaming.incremental import ingest_available

QUERIES = ["merge join", "the", "spark stream batch", "mergeJoin sortTable"]


@pytest.fixture(scope="module")
def incremental_index(spark, docs, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    out = str(root / "idx")
    ckpt = str(root / "ckpt")
    # three arriving chunks, written as separate files
    docs.filter(F.col("doc_id") % 3 == 0).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.mode("append").parquet(src)
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode("append").parquet(src)
    builds = ingest_available(spark, src, out, ckpt, n_buckets=4, max_files_per_trigger=1)
    return out, builds, src, ckpt


def test_batches_became_segments(incremental_index):
    out, builds, _, _ = incremental_index
    assert len(builds) == 3, builds
    assert builds == sorted(builds)
    store = SegmentStore(out)
    assert store.live_builds() == builds


@pytest.mark.parametrize("query", QUERIES)
def test_merge_on_read_rank_identical_to_monolithic(spark, docs, incremental_index, query):
    out, _, _, _ = incremental_index
    expected = bm25_topk(docs, query, 10).collect()
    got = IndexReader(spark, out).topk(query, 10, range_size=128).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expected], query
    for g, e in zip(got, expected):
        assert g["score"] == pytest.approx(e["score"], abs=1e-9)


def test_late_batch_updates_results(spark, docs, incremental_index):
    out, builds, src, ckpt = incremental_index
    # nothing new -> no new segment
    builds2 = ingest_available(spark, src, out, ckpt, n_buckets=4)
    assert builds2 == builds
    # global stats reflect ALL segments
    reader = IndexReader(spark, out)
    assert reader.stats["N"] == docs.count()


def test_gc_respects_live_list(spark, incremental_index, docs, tmp_path):
    out, builds, _, _ = incremental_index
    store = SegmentStore(out)
    # an unpublished orphan build is GC'd; live segments survive
    build_index(spark, docs.limit(20), out, build_id="orphan", n_buckets=2, publish=False)
    removed = store.gc()
    assert removed == ["orphan"]
    assert store.live_builds() == builds


def test_compaction_preserves_results(spark, docs, tmp_path):
    """Compacting many small segments into one leaves query results
    rank+score identical and shrinks the live set to one build."""
    from ariadna_spark.sources.segments import compact

    src, out, ckpt = str(tmp_path / "s"), str(tmp_path / "i"), str(tmp_path / "c")
    for m in range(4):
        docs.filter(F.col("doc_id") % 4 == m).coalesce(1).write.mode("append").parquet(src)
    builds = ingest_available(spark, src, out, ckpt, n_buckets=4, max_files_per_trigger=1)
    assert len(builds) == 4
    before = IndexReader(spark, out).topk("merge join sort", 10).collect()
    manifest = compact(spark, out, build_id="merged", n_buckets=4)
    store = SegmentStore(out)
    assert store.live_builds() == ["merged"]
    # inputs GC'd
    import os as _os

    assert sorted(_os.listdir(_os.path.join(out, "builds"))) == ["merged"]
    after = IndexReader(spark, out).topk("merge join sort", 10).collect()
    # ranks exact; scores to 1e-9 (physical block layout changes the float
    # summation order inside the kernel -> last-ulp drift, the documented
    # tolerance contract from SURVEY.md hard-part 2)
    assert [r["doc_id"] for r in after] == [r["doc_id"] for r in before]
    for a, b in zip(after, before):
        assert a["score"] == pytest.approx(b["score"], abs=1e-9)
    assert manifest["total_postings"] > 0
