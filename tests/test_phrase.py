"""Phrase queries over the positional index (SURVEY.md E5 match_phrase
half; VERDICT r2 missing-item 1): positions round-trip, adjacency
semantics incl. duplicate terms, overwrite masking, and compaction."""

import pytest
from pyspark.sql import functions as F

from ariadna_spark.analyze import tokenize_py
from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.sources.segments import (
    SegmentStore,
    append_segment,
    build_index,
    compact,
)
from ariadna_spark.stats import term_freqs_dl


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


PLANTED = [
    "alpha beta gamma extra words here",          # 0: has "alpha beta gamma"
    "alpha gamma beta alpha beta",                # 1: has "alpha beta" (tail)
    "beta alpha beta alpha",                      # 2: "alpha beta" + dup-term "beta alpha beta"
    "gamma gamma alpha",                          # 3: no adjacency
    "x alpha y beta z gamma",                     # 4: all terms, no adjacency
    "beta alpha alpha gamma",                     # 5: NOT "beta alpha beta"
    "unrelated words only",                       # 6
    "alpha beta gamma alpha beta gamma",          # 7: phrase twice
]


@pytest.fixture(scope="module")
def planted_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("phrase_idx"))
    build_index(spark, _mk_docs(spark, PLANTED), out, build_id="p", n_buckets=2)
    return out


def test_positions_round_trip_vs_tokenizer(spark):
    docs = _mk_docs(spark, PLANTED)
    tf = term_freqs_dl(docs, with_positions=True)
    rows = tf.collect()
    toks = {i: tokenize_py(c) for i, c in enumerate(PLANTED)}
    for r in rows:
        expect = [p for p, t in enumerate(toks[r["doc_id"]]) if t == r["term"]]
        assert list(r["positions"]) == expect, (r["doc_id"], r["term"])
        assert r["tf"] == len(expect)


def test_phrase_exact_adjacency(spark, planted_index):
    r = IndexReader(spark, planted_index)
    got = sorted(x["doc_id"] for x in r.phrase_topk("alpha beta gamma", 10).collect())
    assert got == [0, 7]
    got2 = sorted(x["doc_id"] for x in r.phrase_topk("alpha beta", 10).collect())
    assert got2 == [0, 1, 2, 7]


def test_phrase_duplicate_terms(spark, planted_index):
    r = IndexReader(spark, planted_index)
    got = sorted(x["doc_id"] for x in r.phrase_topk("beta alpha beta", 10).collect())
    # docs 1 ("... beta alpha beta") and 2 ("beta alpha beta ...") match;
    # doc 5 ("beta alpha alpha gamma") must NOT
    assert got == [1, 2]


def test_phrase_no_adjacency_and_absent_term(spark, planted_index):
    r = IndexReader(spark, planted_index)
    assert r.phrase_topk("alpha z gamma", 10).count() == 0
    assert r.phrase_topk("alpha zzznotaterm", 10).count() == 0
    assert r.phrase_topk("", 10).count() == 0


def test_phrase_single_token_is_match_query(spark, planted_index):
    r = IndexReader(spark, planted_index)
    a = [(x["doc_id"], round(x["score"], 10)) for x in r.phrase_topk("alpha", 10).collect()]
    b = [(x["doc_id"], round(x["score"], 10)) for x in r.topk("alpha", 10).collect()]
    assert a == b


def test_phrase_small_ranges_merge(spark, planted_index):
    """Multiple rid partitions (range_size=4) must merge to the same answer."""
    r = IndexReader(spark, planted_index)
    a = [x["doc_id"] for x in r.phrase_topk("alpha beta", 10).collect()]
    b = [x["doc_id"] for x in r.phrase_topk("alpha beta", 10, range_size=4).collect()]
    assert a == b


def test_phrase_scores_are_bm25_sum(spark, planted_index):
    """Matched docs score as the sum of their distinct phrase terms' BM25 —
    identical to restricting topk's exhaustive scores to the matched set."""
    r = IndexReader(spark, planted_index)
    ph = {x["doc_id"]: x["score"] for x in r.phrase_topk("alpha beta", 10).collect()}
    full = {x["doc_id"]: x["score"] for x in r.topk("alpha beta", 100).collect()}
    for d, s in ph.items():
        assert abs(s - full[d]) < 1e-12


def test_phrase_requires_positions(spark, tmp_path):
    out = str(tmp_path / "nopos")
    build_index(
        spark, _mk_docs(spark, PLANTED), out, build_id="np", n_buckets=2, with_positions=False
    )
    r = IndexReader(spark, out)
    with pytest.raises(ValueError, match="positions"):
        r.phrase_topk("alpha beta", 5)


def test_phrase_overwrite_and_compaction(spark, tmp_path):
    """Overwriting a phrase-bearing doc removes it from phrase results
    (tombstone masking inside the phrase kernel), and compaction preserves
    the answer bit-for-bit — positions survive the block merge."""
    out = str(tmp_path / "ovr")
    build_index(spark, _mk_docs(spark, PLANTED), out, build_id="base", n_buckets=2)
    # overwrite doc 0: phrase removed, same (repo, path) key
    upd = _mk_docs(spark, ["alpha gamma beta no phrase"], start_id=0)
    append_segment(spark, upd, out, build_id="upd", n_buckets=2)
    r = IndexReader(spark, out)
    got = sorted(x["doc_id"] for x in r.phrase_topk("alpha beta gamma", 10).collect())
    assert got == [7]
    before = [(x["doc_id"], x["score"]) for x in r.phrase_topk("alpha beta", 10).collect()]
    compact(spark, out, build_id="final", n_buckets=2)
    rc = IndexReader(spark, out)
    assert [b for b in SegmentStore(out).live_builds()] == ["final"]
    got_c = sorted(x["doc_id"] for x in rc.phrase_topk("alpha beta gamma", 10).collect())
    assert got_c == [7]
    after = [(x["doc_id"], x["score"]) for x in rc.phrase_topk("alpha beta", 10).collect()]
    assert [d for d, _ in before] == [d for d, _ in after]


def test_phrase_multi_segment(spark, tmp_path):
    """A phrase query over a 2-segment live set merges per-range results
    with GLOBAL df/avgdl stats (merge-on-read), same as topk."""
    out = str(tmp_path / "mseg")
    build_index(spark, _mk_docs(spark, PLANTED[:4]), out, build_id="s0", n_buckets=2)
    build_index(
        spark, _mk_docs(spark, PLANTED[4:], start_id=4), out, build_id="s1",
        n_buckets=2, publish=False,
    )
    SegmentStore(out).publish_many(["s0", "s1"])
    r = IndexReader(spark, out)
    got = sorted(x["doc_id"] for x in r.phrase_topk("alpha beta gamma", 10).collect())
    assert got == [0, 7]


def test_near_topk_window_semantics(spark, planted_index):
    """Proximity: all terms within a window of W positions, ANY order.
    On PLANTED: "alpha ... gamma" spans vary; window == span boundary
    flips membership, and order never matters."""
    r = IndexReader(spark, planted_index)
    # doc 4 "x alpha y beta z gamma": alpha@1, gamma@5 -> span 5 needs W>=5
    got_w5 = sorted(x["doc_id"] for x in r.near_topk("alpha gamma", window=5, k=10).collect())
    got_w4 = sorted(x["doc_id"] for x in r.near_topk("alpha gamma", window=4, k=10).collect())
    assert 4 in got_w5 and 4 not in got_w4
    # unordered: "gamma alpha" == "alpha gamma"
    got_rev = sorted(x["doc_id"] for x in r.near_topk("gamma alpha", window=5, k=10).collect())
    assert got_rev == got_w5
    # window = 2 over adjacent pair matches where phrase does (either order)
    near2 = sorted(x["doc_id"] for x in r.near_topk("alpha beta", window=2, k=10).collect())
    ph_ab = {x["doc_id"] for x in r.phrase_topk("alpha beta", 10).collect()}
    ph_ba = {x["doc_id"] for x in r.phrase_topk("beta alpha", 10).collect()}
    assert set(near2) == ph_ab | ph_ba


def test_near_topk_brute_force_identity(spark, planted_index):
    """Kernel window sweep == a brute-force python window check over the
    tokenizer output, for several windows."""
    r = IndexReader(spark, planted_index)
    toks = {i: tokenize_py(c) for i, c in enumerate(PLANTED)}
    for q, w in (("alpha beta gamma", 3), ("alpha beta gamma", 5), ("beta gamma", 3)):
        terms = set(q.split())
        want = set()
        for d, ts in toks.items():
            for i in range(len(ts)):
                if terms <= set(ts[i : i + w]):
                    want.add(d)
                    break
        got = {x["doc_id"] for x in r.near_topk(q, window=w, k=10).collect()}
        assert got == want, (q, w)


def test_near_topk_single_term_and_absent(spark, planted_index):
    r = IndexReader(spark, planted_index)
    a = [x["doc_id"] for x in r.near_topk("alpha", window=3, k=10).collect()]
    b = [x["doc_id"] for x in r.topk("alpha", 10).collect()]
    assert a == b
    assert r.near_topk("alpha zzznope", window=50, k=10).count() == 0


def test_min_cover_mask_equals_two_pointer_reference():
    """VERDICT r4 #7: the vectorized minimal-cover test must agree with
    the classic two-pointer sweep on dense random occurrence streams —
    including all-groups-missing, exact-boundary windows, and m=1."""
    import numpy as np

    from ariadna_spark.operators.wand import _min_cover_mask

    def reference(p, g, m, window, starts, ends):
        out = []
        for s, e in zip(starts, ends):
            cnt = {}
            have, lo_i, ok = 0, s, False
            for hi_i in range(s, e):
                c = g[hi_i]
                cnt[c] = cnt.get(c, 0) + 1
                if cnt[c] == 1:
                    have += 1
                while have == m:
                    if p[hi_i] - p[lo_i] < window:
                        ok = True
                        break
                    cnt[g[lo_i]] -= 1
                    if cnt[g[lo_i]] == 0:
                        have -= 1
                    lo_i += 1
                if ok:
                    break
            out.append(ok)
        return np.asarray(out, dtype=bool)

    rng = np.random.default_rng(7)
    for trial in range(200):
        n_docs = int(rng.integers(1, 6))
        m = int(rng.integers(1, 4))
        window = int(rng.integers(1, 8))
        d_l, p_l, g_l = [], [], []
        for doc in range(n_docs):
            occ = int(rng.integers(1, 12))
            pos = np.sort(rng.integers(0, 20, size=occ))
            d_l.append(np.full(occ, doc))
            p_l.append(pos)
            g_l.append(rng.integers(0, m, size=occ))
        d = np.concatenate(d_l)
        p = np.concatenate(p_l).astype(np.int64)
        g = np.concatenate(g_l).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        ends = np.concatenate((starts[1:], [d.size]))
        got = _min_cover_mask(p, g, m, window, starts, ends)
        want = reference(p, g, m, window, starts, ends)
        assert np.array_equal(got, want), (trial, p, g, m, window)


def test_phrase_prefix_semantics(spark, tmp_path_factory):
    """ES match_phrase_prefix: last token expands to its df-top
    completions; fixed tokens + ANY completion must be adjacent; rank =
    fixed BM25 sum + best matched completion's BM25 (hand-computed)."""
    from collections import Counter

    from ariadna_spark.functions.bm25 import bm25_py

    docs = _mk_docs(
        spark,
        [
            "merge scan alpha",        # 0: completes with 'scan'
            "merge sort beta",         # 1: completes with 'sort'
            "merge alpha scan",        # 2: 'scan' present but not adjacent
            "scan merge sort",         # 3: completes with 'sort' mid-doc
            "merge scan merge sort",   # 4: BOTH completions match -> best-of
            "sort merge",              # 5: wrong order
        ],
    )
    out = str(tmp_path_factory.mktemp("ppx_idx"))
    build_index(spark, docs, out, build_id="t", n_buckets=2)
    reader = IndexReader(spark, out)
    got = {
        r["doc_id"]: r["score"]
        for r in reader.phrase_prefix_topk("merge s", 10).collect()
    }
    assert set(got) == {0, 1, 3, 4}

    toks = {r["doc_id"]: tokenize_py(r["content"]) for r in docs.collect()}
    n = len(toks)
    dls = {i: len(t) for i, t in toks.items()}
    avgdl = sum(dls.values()) / n
    df: Counter = Counter()
    for t in toks.values():
        for w in set(t):
            df[w] += 1

    def sc(i, w):
        return bm25_py(toks[i].count(w), df[w], dls[i], n, avgdl)

    assert got[0] == pytest.approx(sc(0, "merge") + sc(0, "scan"), abs=1e-9)
    assert got[1] == pytest.approx(sc(1, "merge") + sc(1, "sort"), abs=1e-9)
    assert got[3] == pytest.approx(sc(3, "merge") + sc(3, "sort"), abs=1e-9)
    assert got[4] == pytest.approx(
        sc(4, "merge") + max(sc(4, "scan"), sc(4, "sort")), abs=1e-9
    )
    # single-token phrase degenerates to a pure prefix disjunction
    assert {r["doc_id"] for r in reader.phrase_prefix_topk("s", 10).collect()} == {
        0, 1, 2, 3, 4, 5,
    }
    # a prefix with no completions matches nothing
    assert reader.phrase_prefix_topk("merge zz", 10).count() == 0
