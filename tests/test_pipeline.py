"""Composed training-data pipeline: dedup -> (near-dup) -> PII scrub ->
quality gate -> chunk -> split, one lazy graph, invariants end-to-end."""

import os

import pytest
from pyspark.sql import functions as F

from ariadna_spark.analyze import tokenize_py
from ariadna_spark.corpus import load_docs
from ariadna_spark.operators.text import train_val_split
from ariadna_spark.pipeline import prepare_training_set, write_training_set

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def prepared(spark):
    docs = load_docs(spark, SF)
    out = prepare_training_set(docs, chunk_size=32, overlap=8, min_tokens=4)
    out.persist()
    out.count()
    return docs, out


def test_pipeline_invariants(spark, prepared):
    docs, out = prepared
    rows = out.collect()
    assert rows, "pipeline produced no chunks"
    # chunk size and quality gate hold
    assert all(4 <= r["n_tokens"] <= 32 for r in rows)
    # every chunk's tokens really are a window of its source doc's tokens
    src = {r["doc_id"]: tokenize_py(r["content"]) for r in docs.collect()}
    from ariadna_spark.operators.text import pii_scrub

    clean = {r["doc_id"]: r["clean"] for r in pii_scrub(docs).collect()}
    for r in rows[:50]:
        toks = tokenize_py(clean[r["doc_id"]])
        start = r["chunk_id"] * (32 - 8)
        assert r["chunk_text"].split(" ") == toks[start : start + 32]
    # one split side per doc — chunks never straddle the boundary
    sides = out.groupBy("doc_id").agg(F.countDistinct("split").alias("ns")).collect()
    assert all(s["ns"] == 1 for s in sides)
    # the doc-level assignment matches train_val_split on the raw docs
    want = {r["doc_id"]: r["split"] for r in train_val_split(docs).collect()}
    got = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").distinct().collect()}
    assert all(got[d] == want[d] for d in got)


def test_pipeline_near_dup_removal(spark):
    ddl = "doc_id long, repo string, path string, commit string, lang string, content string"
    base = "the quick brown fox jumps over the lazy dog again and again tokens"
    rows = [
        (0, "r", "a", "c", "py", base),
        (1, "r", "b", "c", "py", base + " extra"),   # near-dup of 0 -> dropped
        (2, "r", "c", "c", "py", "completely different content about spark shuffles"),
        (3, "r", "d", "c", "py", base),              # exact dup of 0 -> dropped earlier
    ]
    docs = spark.createDataFrame(rows, ddl).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
    out = prepare_training_set(
        docs, chunk_size=16, overlap=0, min_tokens=1, near_dup_threshold=0.7
    )
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert kept == {0, 2}


def test_pipeline_write_partitioned(spark, prepared, tmp_path):
    _, out = prepared
    path = str(tmp_path / "train_set")
    write_training_set(out, path)
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    splits = {r["split"] for r in back.select("split").distinct().collect()}
    assert splits <= {"train", "val"} and "train" in splits
    # physical layout: split=<side> partition dirs exist
    assert any(d.startswith("split=") for d in os.listdir(path))


def test_pipeline_decontamination_drops_benchmark_docs(spark):
    """VERDICT r3 #2 wiring: a doc sharing an 8-token n-gram with the
    benchmark table must be dropped before anything else sees it."""
    ddl = "doc_id long, repo string, path string, commit string, lang string, content string"
    leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (0, "r", "a", "c", "py", "def clean_function(): return spark shuffle partitions"),
        (1, "r", "b", "c", "py", f"prefix words then {leak} then suffix words"),
        (2, "r", "c", "c", "py", "another clean doc with enough tokens to chunk fine"),
    ]
    docs = spark.createDataFrame(rows, ddl).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
    bench = spark.createDataFrame([(leak,)], "text string")
    out = prepare_training_set(docs, chunk_size=16, overlap=0, min_tokens=1, bench=bench)
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert kept == {0, 2}
    # without the bench table nothing is dropped
    out2 = prepare_training_set(docs, chunk_size=16, overlap=0, min_tokens=1)
    assert {r["doc_id"] for r in out2.select("doc_id").distinct().collect()} == {0, 1, 2}


def test_decontaminate_counts_and_sample(spark):
    from ariadna_spark.operators.text import decontaminate

    ddl = "doc_id long, content string"
    # doc 1 contains two distinct contaminated 4-grams (overlapping windows
    # of a 5-token leak); doc 2 shares none
    leak5 = "aa bb cc dd ee"
    docs = spark.createDataFrame(
        [(1, f"x {leak5} y"), (2, "totally unrelated words here")], ddl
    )
    bench = spark.createDataFrame([(leak5,)], "text string")
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench, n=4).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_overlap"] == 2  # "aa bb cc dd" and "bb cc dd ee"
    assert rows[1]["sample_ngram"] == "aa bb cc dd"


def test_cluster_ids_three_chain_and_policy(spark):
    """VERDICT r3 #4: connected components over a planted 3-chain, and the
    cluster keep-policy retaining exactly one doc per cluster — including
    the shape where the old pairwise rule kept two (path 2-3, 3-1)."""
    from ariadna_spark.operators.dedup import cluster_ids, cluster_keep_policy

    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)], "da long, db long")
    lab = {r["doc_id"]: r["cluster_id"] for r in cluster_ids(pairs).collect()}
    assert lab == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    # pairwise-vs-cluster divergence: edges (2,3) and (1,3) — pairwise
    # drop-the-greater keeps {1, 2}; cluster policy keeps only 1
    p2 = spark.createDataFrame([(2, 3), (1, 3)], "da long, db long")
    lab2 = cluster_ids(p2)
    docs = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    kept = {r["doc_id"] for r in cluster_keep_policy(docs, lab2).collect()}
    assert kept == {1, 4}  # 4 untouched (no cluster), 2 and 3 dropped


def test_pipeline_cluster_keep_one_per_chain(spark):
    """A planted near-dup 3-chain (A~B, B~C, A!~C) must keep exactly the
    minimum doc_id through prepare_training_set."""
    t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    a = t
    b = t + " extra1 extra2"          # ~ a
    c = t + " extra1 extra2 more3 more4 more5"  # ~ b, less ~ a
    ddl = "doc_id long, repo string, path string, commit string, lang string, content string"
    rows = [
        (10, "r", "a", "x", "py", a),
        (11, "r", "b", "x", "py", b),
        (12, "r", "c", "x", "py", c),
        (13, "r", "d", "x", "py", "unrelated spark shuffle partition content entirely"),
    ]
    docs = spark.createDataFrame(rows, ddl).withColumn(
        "content_sha", F.sha2(F.col("content"), 256)
    )
    out = prepare_training_set(
        docs, chunk_size=16, overlap=0, min_tokens=1, near_dup_threshold=0.7
    )
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    assert kept == {10, 13}


def test_pipeline_perplexity_gate(spark):
    """max_nll drops exactly the docs whose mean bigram nll (under the
    gate's default deterministic sample-trained LM) exceeds the budget,
    and the gate composes with the rest of the pipeline."""
    from ariadna_spark.operators.dedup import keep_first_dedup
    from ariadna_spark.operators.text import perplexity_scores
    from ariadna_spark.pipeline import lm_sample

    docs = load_docs(spark, SF)
    d = keep_first_dedup(docs)  # mirror the dedup stage exactly
    lm = lm_sample(d, 20)  # mirror the gate's default LM sample
    assert lm.count() > 0, "test corpus too small for the default sample"
    ppl = {r["doc_id"]: r["nll_r"] for r in perplexity_scores(d, lm_docs=lm).collect()}
    cut = sorted(ppl.values())[int(len(ppl) * 0.9)]  # drop the worst ~10%
    out = prepare_training_set(docs, chunk_size=32, overlap=8, min_tokens=4, max_nll=cut)
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    base = prepare_training_set(docs, chunk_size=32, overlap=8, min_tokens=4)
    base_kept = {r["doc_id"] for r in base.select("doc_id").distinct().collect()}
    dropped = base_kept - kept
    assert dropped and kept < base_kept
    assert all(ppl[i] > cut for i in dropped)
    assert all(ppl.get(i, 0.0) <= cut for i in kept)


def test_pipeline_repetition_gate(spark):
    """max_top2_frac drops exactly the docs whose top-bigram coverage
    exceeds the budget (Gopher repetition filter), composing with the
    rest of the pipeline."""
    from ariadna_spark.operators.dedup import keep_first_dedup
    from ariadna_spark.operators.text import repetition_metrics

    docs = load_docs(spark, SF)
    d = keep_first_dedup(docs)
    rep = {r["doc_id"]: r["top2_frac"] for r in repetition_metrics(d).collect()}
    cut = sorted(rep.values())[int(len(rep) * 0.9)]
    out = prepare_training_set(
        docs, chunk_size=32, overlap=8, min_tokens=4, max_top2_frac=cut
    )
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    base = prepare_training_set(docs, chunk_size=32, overlap=8, min_tokens=4)
    base_kept = {r["doc_id"] for r in base.select("doc_id").distinct().collect()}
    dropped = base_kept - kept
    assert dropped and kept < base_kept
    assert all(rep[i] > cut for i in dropped)
    assert all(rep.get(i, 0.0) <= cut for i in kept)


def test_pipeline_duplicate_span_gate(spark):
    """max_dup_frac drops exactly the post-dedup docs whose n-token
    windows are mostly verbatim copies of OTHER surviving documents
    (Lee et al. exact-substring signal) — and the distinct-doc counts
    come from the deduped corpus, not the raw one."""
    from ariadna_spark.operators.dedup import keep_first_dedup
    from ariadna_spark.operators.text import duplicate_spans

    docs = load_docs(spark, SF)
    d = keep_first_dedup(docs)
    spans = {r["doc_id"]: r["dup_frac"] for r in duplicate_spans(d, n=6).collect()}
    nz = sorted({v for v in spans.values() if v > 0})
    assert nz, "fixture corpus must contain cross-doc duplicated spans"
    # pick a cut strictly below the max distinct value so the strict->
    # gate provably drops something even when scores tie
    cut = nz[(len(nz) - 1) // 2] if len(nz) > 1 else nz[0] / 2
    out = prepare_training_set(
        docs, chunk_size=32, overlap=8, min_tokens=4,
        max_dup_frac=cut, dup_span_n=6,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").distinct().collect()}
    base = prepare_training_set(docs, chunk_size=32, overlap=8, min_tokens=4)
    base_kept = {r["doc_id"] for r in base.select("doc_id").distinct().collect()}
    dropped = base_kept - kept
    assert dropped and kept < base_kept
    assert all(spans[i] > cut for i in dropped)
    assert all(spans.get(i, 0.0) <= cut for i in kept)
