"""Round-6 hybrid/reverse-search verbs: significant_terms (JLH aggs),
percolate (stored queries vs incoming docs), and RRF fusion — handcrafted
semantics plus the plan shapes the scale story relies on."""

import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.percolate import percolate
from ariadna_spark.operators.similarity import rrf_fuse
from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.plans import assert_broadcast_join, physical_plan
from ariadna_spark.sources.segments import build_index


def _mk_docs(spark, contents, start_id=0):
    rows = [
        (start_id + i, "org/r", f"src/f{start_id + i}.py", "c0", "py", c)
        for i, c in enumerate(contents)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, repo string, path string, commit string, lang string, content string",
    )
    return df.withColumn("content_sha", F.sha2(F.col("content"), 256))


# --------------------------------------------------------------------------
# significant_terms
# --------------------------------------------------------------------------
SIG_DOCS = [
    "fruit apple",          # 0  fg
    "fruit apple",          # 1  fg
    "fruit apple banana",   # 2  fg
    "rock stone",           # 3
    "rock stone",           # 4
    "banana rock",          # 5
]


@pytest.fixture(scope="module")
def sig_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sig_idx"))
    build_index(spark, _mk_docs(spark, SIG_DOCS), out, build_id="s", n_buckets=2)
    return out


def test_significant_terms_jlh(spark, sig_index):
    """fg = docs matching 'fruit' (3 of 6). apple/fruit: fg%=1 vs bg%=0.5
    -> JLH (1-.5)*(1/.5) = 1.0. banana: fg% == bg% (1/3) -> excluded (must
    BEAT the background). rock/stone: no fg occurrence -> absent."""
    reader = IndexReader(spark, sig_index)
    docs = _mk_docs(spark, SIG_DOCS)
    rows = reader.significant_terms(docs, "fruit", size=10, min_doc_count=1).collect()
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score_r"]) for r in rows]
    assert got == [("apple", 3, 3, 1.0), ("fruit", 3, 3, 1.0)]


def test_significant_terms_min_doc_count(spark, sig_index):
    reader = IndexReader(spark, sig_index)
    docs = _mk_docs(spark, SIG_DOCS)
    # min_doc_count above fg size filters everything
    assert reader.significant_terms(docs, "fruit", min_doc_count=4).count() == 0
    # absent query term -> empty, no job explosion
    assert reader.significant_terms(docs, "zzznope", min_doc_count=1).count() == 0


def test_significant_terms_prunes_content_scan(spark, sig_index):
    """The corpus content scan must be gated by the candidate-id
    semi-join — foreground-only re-analysis, never a full corpus pass."""
    reader = IndexReader(spark, sig_index)
    docs = _mk_docs(spark, SIG_DOCS)
    plan = physical_plan(reader.significant_terms(docs, "fruit", min_doc_count=1))
    assert "LeftSemi" in plan, plan


# --------------------------------------------------------------------------
# percolate
# --------------------------------------------------------------------------
def _mk_queries(spark, rows):
    return spark.createDataFrame(rows, "query_id long, terms array<string>, msm int")


def test_percolate_and_or_msm(spark):
    docs = _mk_docs(
        spark,
        [
            "alpha beta gamma",  # 0
            "alpha delta",       # 1
            "beta beta beta",    # 2
            "epsilon",           # 3
        ],
    )
    queries = _mk_queries(
        spark,
        [
            (0, ["alpha", "beta"], None),  # AND: doc 0 only
            (1, ["alpha", "beta"], 1),     # OR: docs 0,1,2
            (2, ["alpha", "delta", "gamma"], 2),  # >=2 of 3: docs 0,1
            (3, ["zzz"], None),            # never matches
        ],
    )
    pairs = {
        (r["doc_id"], r["query_id"]) for r in percolate(docs, queries).collect()
    }
    assert pairs == {(0, 0), (0, 1), (1, 1), (2, 1), (0, 2), (1, 2)}


def test_percolate_duplicate_tokens_count_once(spark):
    """tf > 1 must not satisfy msm: 'beta beta' is ONE matched term."""
    docs = _mk_docs(spark, ["beta beta beta"])
    queries = _mk_queries(spark, [(0, ["alpha", "beta"], 2)])
    assert percolate(docs, queries).count() == 0


def test_percolate_registry_broadcasts(spark):
    docs = _mk_docs(spark, ["alpha beta"])
    queries = _mk_queries(spark, [(0, ["alpha"], None)])
    assert_broadcast_join(percolate(docs, queries))


# --------------------------------------------------------------------------
# rrf_fuse
# --------------------------------------------------------------------------
def test_rrf_fusion_math(spark):
    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    den = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    rows = rrf_fuse([lex, den], k=10, rank_const=60).collect()
    got = {r["doc_id"]: r["rrf_score"] for r in rows}
    assert got[20] == pytest.approx(1 / 62 + 1 / 61)
    assert got[10] == pytest.approx(1 / 61)
    assert got[40] == pytest.approx(1 / 62)
    assert got[30] == pytest.approx(1 / 63)
    # both-lists doc outranks every single-list doc
    order = [r["doc_id"] for r in rows]
    assert order[0] == 20 and set(order) == {10, 20, 30, 40}


def test_rrf_tie_breaks_by_id(spark):
    a = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (5, 2)], "doc_id long, rank int")
    order = [r["doc_id"] for r in rrf_fuse([a, b], k=10).collect()]
    assert order == [3, 5]  # equal scores -> doc_id asc
