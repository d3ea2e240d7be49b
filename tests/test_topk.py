"""M3 end-to-end: brute-force BM25 top-k vs a pure-Python oracle, plus
corpus-stat invariants (FIXTURES.md §5)."""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ariadna_spark.analyze import tokenize_py
from ariadna_spark.functions.bm25 import bm25_py
from ariadna_spark.operators.topk import bm25_topk
from ariadna_spark.stats import corpus_scalars, doc_freqs, doc_lengths, term_freqs


def python_oracle_topk(rows, query, k):
    """rows: list of (doc_id, content). Brute-force BM25 in pure python."""
    toks = {d: tokenize_py(c) for d, c in rows}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(rows)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for d, c in tf.items():
        for t in c:
            df[t] += 1
    qterms = sorted(set(tokenize_py(query)))
    scores = {}
    for d in tf:
        s = 0.0
        hit = False
        for t in qterms:
            if tf[d].get(t):
                hit = True
                s += bm25_py(tf[d][t], df[t], dl[d], n, avgdl)
        if hit:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


QUERIES = [
    ("merge join", 10),
    ("window", 5),
    ("the", 10),            # stop-word-heavy
    ("zzznotaterm", 10),    # absent term -> empty
    ("spark batch stream", 25),
]


@pytest.mark.parametrize("query,k", QUERIES)
def test_bm25_rank_identical_vs_python_oracle(spark, docs, query, k):
    rows = [(r["doc_id"], r["content"]) for r in docs.select("doc_id", "content").collect()]
    expected = python_oracle_topk(rows, query, k)
    got = bm25_topk(docs, query, k).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r["score"] == pytest.approx(s, abs=1e-6)


def test_bm25_on_synth_code_corpus(spark, synth_docs):
    rows = [(r["doc_id"], r["content"]) for r in synth_docs.select("doc_id", "content").collect()]
    for query in ["parseJsonData", "binary_search import", "the if"]:
        expected = python_oracle_topk(rows, query, 10)
        got = bm25_topk(synth_docs, query, 10).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], query


def test_stats_invariants(spark, docs):
    tf = term_freqs(docs)
    tf.persist()
    dl = doc_lengths(tf)
    n, avgdl = corpus_scalars(dl)
    assert n == docs.count()
    # sum(tf) per doc == token count of that doc
    sample = docs.limit(5).collect()
    dl_map = {r["doc_id"]: r["doc_len"] for r in dl.collect()}
    for r in sample:
        assert dl_map[r["doc_id"]] == len(tokenize_py(r["content"]))
    # sum over df == distinct (term, doc) pairs
    total_df = doc_freqs(tf).agg(F.sum("df")).collect()[0][0]
    assert total_df == tf.count()
    assert avgdl == pytest.approx(sum(dl_map.values()) / len(dl_map) if n == len(dl_map) else avgdl)


def test_ingest_sha_invariant(spark, docs):
    """E4: per-row content_sha equals sha2 recomputed on the source."""
    import os

    src = spark.read.parquet(os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001") + "/documents.parquet")
    src_sha = src.select(F.col("doc_id").cast("long").alias("doc_id"), F.sha2("text", 256).alias("src_sha"))
    bad = docs.join(src_sha, "doc_id").filter(F.col("content_sha") != F.col("src_sha")).count()
    assert bad == 0
