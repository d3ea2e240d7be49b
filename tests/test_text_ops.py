"""Text-analysis operators: language ID, quality metrics, token counts,
fingerprints."""

import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.text import (
    fingerprint,
    language_id,
    quality_metrics,
    token_counts,
)


@pytest.fixture(scope="module")
def lang_docs(spark):
    rows = [
        (0, "the cat is in the house and it is warm"),
        (1, "der Hund ist nicht in das Haus und die Katze"),
        (2, "le chat est dans la maison et les chiens"),
        (3, "el perro es un animal y la casa es grande en verano"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_language_id(spark, lang_docs):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(lang_docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es"}


def test_quality_metrics(spark):
    docs = spark.createDataFrame(
        [(0, "the the the 123 456"), (1, "unique tokens only here now")],
        "doc_id long, content string",
    )
    q = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    assert q[0]["n_tokens"] == 5 and q[0]["n_distinct"] == 3
    assert q[0]["digit_ratio"] == pytest.approx(0.4)
    assert q[0]["stop_ratio"] == pytest.approx(0.6)
    assert q[1]["uniq_ratio"] == 1.0


def test_token_counts(spark):
    docs = spark.createDataFrame(
        [(0, "fooBar baz_qux 12")], "doc_id long, content string"
    )
    r = token_counts(docs).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_code_tokens"] == 5  # foo bar baz qux 12
    assert r["n_bpe_est"] == 5  # ceil(18/4)


def test_fingerprint_normalization_invariance(spark):
    docs = spark.createDataFrame(
        [
            (0, "mergeSort(arr, lo, hi)"),
            (1, "merge_sort ARR  lo;;hi"),  # same token stream after analysis
            (2, "something else"),
        ],
        "doc_id long, content string",
    )
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_pii_scrub(spark):
    from ariadna_spark.operators.text import pii_scrub

    rows = [
        (0, "reach me at a.b+c@corp.example.io or 192.168.0.1 thanks"),
        (1, "no pii here at all"),
        (2, "two mails x@y.de z@w.org and ips 10.0.0.1 8.8.8.8"),
        (3, "host mail@10.0.0.5.example.com then bare 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[0]["clean"] == "reach me at <EMAIL> or <IP> thanks"
    assert (got[0]["n_emails"], got[0]["n_ips"]) == (1, 1)
    assert got[1]["clean"] == rows[1][1] and got[1]["n_emails"] == 0 and got[1]["n_ips"] == 0
    assert got[2]["clean"] == "two mails <EMAIL> <EMAIL> and ips <IP> <IP>"
    # email is redacted FIRST, so the ip-looking host inside it is part of
    # the email match, not a separate IP hit
    assert got[3]["clean"] == "host <EMAIL> then bare <IP>"
    assert (got[3]["n_emails"], got[3]["n_ips"]) == (1, 1)


def test_chunk_documents_boundaries(spark):
    from ariadna_spark.analyze import tokenize_py
    from ariadna_spark.operators.text import chunk_documents

    text = " ".join(f"tok{i}" for i in range(25))
    df = spark.createDataFrame(
        [(0, text), (1, "solo"), (2, "")], "doc_id long, content string"
    )
    got = chunk_documents(df, chunk_size=10, overlap=4).collect()
    toks = tokenize_py(text)
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: stride 6 over 25 tokens -> starts 0,6,12,18,24
    chunks = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    assert [c["chunk_id"] for c in chunks] == [0, 1, 2, 3, 4]
    for c in chunks:
        start = c["chunk_id"] * 6
        want = toks[start : start + 10]
        assert c["chunk_text"].split(" ") == want
        assert c["n_tokens"] == len(want)
    # consecutive chunks overlap by exactly `overlap` tokens (full chunks)
    assert chunks[0]["chunk_text"].split(" ")[-4:] == chunks[1]["chunk_text"].split(" ")[:4]
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "solo"
    assert 2 not in by_doc  # empty docs emit no chunks
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)


def test_train_val_split_deterministic(spark):
    from ariadna_spark.operators.text import train_val_split

    df = spark.createDataFrame(
        [(i, f"content {i}") for i in range(500)], "doc_id long, content string"
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    a = {r["doc_id"]: r["split"] for r in train_val_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in train_val_split(df.repartition(13)).collect()}
    assert a == b  # partition-independent (content-hash keyed)
    frac = sum(1 for v in a.values() if v == "val") / len(a)
    assert 0.05 < frac < 0.16  # ~10% with hash noise at n=500
    # identical content (dup rows) always lands on the same side
    dup = spark.createDataFrame(
        [(900, "content 7"), (901, "content 7")], "doc_id long, content string"
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    d = {r["doc_id"]: r["split"] for r in train_val_split(dup).collect()}
    assert d[900] == d[901] == a[7]


def test_stratified_take_deterministic(spark):
    from ariadna_spark.operators.text import stratified_take

    df = spark.createDataFrame(
        [(i, "l" + str(i % 3), f"doc content {i}") for i in range(120)],
        "doc_id long, lang string, content string",
    ).withColumn("content_sha", F.sha2(F.col("content"), 256))
    a = sorted((r["lang"], r["doc_id"]) for r in stratified_take(df, n_per_group=7).collect())
    b = sorted(
        (r["lang"], r["doc_id"])
        for r in stratified_take(df.repartition(17), n_per_group=7).collect()
    )
    assert a == b  # partition-order independent
    from collections import Counter

    c = Counter(l for l, _ in a)
    assert all(v == 7 for v in c.values()) and len(c) == 3


# ---------------------------------------------------------------------------
# Index-accelerated regex search (VERDICT r3 #1)
# ---------------------------------------------------------------------------
def test_regex_required_literals_extraction():
    from ariadna_spark.operators.text import regex_required_literals as rl

    assert rl(r"scan[a-z]*") == ["scan"]
    assert rl(r"foo\.bar") == ["foo.bar"]
    assert rl(r"ab?c") == ["a", "c"]  # optional atom splits the run
    assert rl(r"ab+c") == ["ab", "c"]  # >=1 keeps the atom, splits after
    assert rl(r"ab*c") == ["a", "c"]
    assert rl(r"a{2,3}b") == ["a", "b"]
    assert rl(r"a{0,3}b") == ["b"]
    assert rl(r"foo|bar") == []  # alternation poisons the group
    assert rl(r"pre(foo|bar)post") == ["pre", "post"]
    assert rl(r"a(bc)+d") == ["a", "bc", "d"]
    assert rl(r"a(bc)?d") == ["a", "d"]
    assert rl(r"a(?:bc)d") == ["a", "bc", "d"]
    assert rl(r"\d+err\w*") == ["err"]
    assert rl(r"^main$") == ["main"]
    assert rl(r".*") == []
    assert rl(r"(?i)foo") == []  # inline flags: bail entirely
    assert rl(r"x\1y") == []  # backref: bail
    assert rl(r"[abc]scan[0-9]") == ["scan"]


def test_required_index_substrings_analyzer_mapping():
    from ariadna_spark.operators.text import required_index_substrings as ris

    # camelCase literal splits like the analyzer; edge/interior sub-tokens
    # all become containment needles; longest first
    assert ris(r"myScanner") == ["scanner"]  # "my" < 3 chars dropped
    assert ris(r"can_do_this") == ["this", "can"]  # "do" dropped; longest first
    assert ris(r"parse_http") == ["parse", "http"]
    assert ris(r"foo|bar") == []


def test_regex_search_indexed_equals_full_scan(spark, docs, tmp_path_factory):
    from ariadna_spark.operators.text import regex_search, regex_search_indexed
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.sources.segments import build_index

    out = str(tmp_path_factory.mktemp("regex_idx"))
    build_index(spark, docs, out, build_id="rx", n_buckets=4)
    reader = IndexReader(spark, out)
    for pat in [r"scan[a-z]*", r"merge\w*join", r"group(ed)? by", r"zz9qqq[0-9]*"]:
        full = sorted(
            (r["doc_id"], r["n_matches"], r["first_match"])
            for r in regex_search(docs, pat).collect()
        )
        fast = sorted(
            (r["doc_id"], r["n_matches"], r["first_match"])
            for r in regex_search_indexed(docs, pat, reader).collect()
        )
        assert fast == full, pat
    # literal-free pattern falls back to the full scan, same rows
    pat = r"[a-z]{12}"
    full = sorted(r["doc_id"] for r in regex_search(docs, pat).collect())
    fast = sorted(
        r["doc_id"] for r in regex_search_indexed(docs, pat, reader).collect()
    )
    assert fast == full


def test_terms_containing_cap_returns_none(spark, docs, tmp_path_factory):
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.sources.segments import build_index

    out = str(tmp_path_factory.mktemp("regex_cap"))
    build_index(spark, docs, out, build_id="rx", n_buckets=4)
    reader = IndexReader(spark, out)
    # single-char needle matches a huge slice of the vocabulary: with a
    # tiny cap the expansion must refuse (None), never silently truncate
    assert reader.terms_containing("e", max_terms=5) is None
    # absent needle -> empty expansion (provably zero matching docs)
    assert reader.terms_containing("zz9qqqx7") == []


def test_regex_search_indexed_multi_literal_intersection(spark, docs, tmp_path_factory):
    """A pattern requiring several literals prunes through the
    INTERSECTION of their candidate sets and still matches the full scan
    exactly."""
    from ariadna_spark.operators.text import regex_search, regex_search_indexed
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.plans import physical_plan
    from ariadna_spark.sources.segments import build_index

    out = str(tmp_path_factory.mktemp("regex_multi"))
    build_index(spark, docs, out, build_id="rm", n_buckets=4)
    reader = IndexReader(spark, out)
    pat = r"merge[a-z_ ]*join"  # requires both "merge" and "join"
    # max_candidate_frac=1.0: this test pins the multi-literal INTERSECTION
    # mechanics; the selectivity gate (tested in test_plans) may otherwise
    # legitimately drop a Zipf-head literal on this corpus
    fast = regex_search_indexed(docs, pat, reader, max_candidate_frac=1.0)
    assert physical_plan(fast).count("LeftSemi") == 2
    full = sorted(
        (r["doc_id"], r["n_matches"], r["first_match"])
        for r in regex_search(docs, pat).collect()
    )
    got = sorted(
        (r["doc_id"], r["n_matches"], r["first_match"]) for r in fast.collect()
    )
    assert got == full


def test_required_index_substrings_uppercase_tail_stripped():
    """r4 ADVICE (high): the acronym rule ([A-Z]+)([A-Z][a-z]) splits
    based on the char AFTER an uppercase run, so a literal ending in an
    uppercase letter must not use its full last sub-token as an index
    needle — 'ABC' in doc 'ABCd' indexes as ['ab','cd']."""
    from ariadna_spark.operators.text import required_index_substrings as ris

    # 'abc' would miss doc 'ABCd'; stripped 'ab' is < min_len -> no needle
    assert ris(r"ABC") == []
    # interior sub-tokens stay whole; only the uppercase-ending tail strips
    assert ris(r"parseHTTP") == ["parse", "htt"]
    # lowercase-ending literals are unaffected
    assert ris(r"myScanner") == ["scanner"]
    # lowercase tail after an interior acronym split: context cannot
    # move that split, so the full tokens stay
    assert ris(r"HTTPResp") == ["http", "resp"]


def test_regex_search_indexed_uppercase_literal_sound(spark, tmp_path_factory):
    """End-to-end regression for the acronym-rule soundness hole: an
    uppercase literal whose match sits flush against a lowercase
    continuation must still be found by the indexed path."""
    from ariadna_spark.operators.text import regex_search, regex_search_indexed
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.sources.segments import build_index

    rows = [
        (0, "prefix ABCd suffix with words enough to index"),
        (1, "plain ABC token here with words enough to index"),
        (2, "nothing relevant in this document at all today"),
        (3, "XYZABCdef packed acronym run with words enough"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, content string").select(
        "doc_id",
        F.lit("r").alias("repo"),
        F.concat(F.lit("p/"), F.col("doc_id")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("txt").alias("lang"),
        "content",
        F.sha2("content", 256).alias("content_sha"),
    )
    out = str(tmp_path_factory.mktemp("regex_upper"))
    build_index(spark, d, out, build_id="ru", n_buckets=2)
    reader = IndexReader(spark, out)
    for pat in [r"ABC", r"ABCd", r"parseHTTP|ABC"]:
        full = sorted(
            (r["doc_id"], r["n_matches"], r["first_match"])
            for r in regex_search(d, pat).collect()
        )
        fast = sorted(
            (r["doc_id"], r["n_matches"], r["first_match"])
            for r in regex_search_indexed(d, pat, reader).collect()
        )
        assert fast == full, pat
        assert full, f"fixture must actually match {pat}"


def test_collocations_arrow_matches_catalyst(spark):
    """The r5 Arrow pair-stream kernel must emit exactly the arrays_zip
    null-padded (w, nx) stream: identical (w1, w2, n_pair, pmi) rows."""
    from ariadna_spark.operators.text import collocations

    rows = [
        (0, "new york city and new york state share new york"),
        (1, "the quick brown fox and the quick brown dog"),
        (2, "parseHTTPResponse handles the quick path in new york"),
        (3, "one-token"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    a = collocations(docs, min_count=2, use_arrow=True).orderBy("w1", "w2").collect()
    b = collocations(docs, min_count=2, use_arrow=False).orderBy("w1", "w2").collect()
    assert [(r.w1, r.w2, r.n_pair) for r in a] == [(r.w1, r.w2, r.n_pair) for r in b]
    for ra, rb in zip(a, b):
        assert ra.pmi == pytest.approx(rb.pmi, abs=1e-12)
    assert a, "fixture must produce collocations"


def test_perplexity_scores(spark):
    """Bigram-LM perplexity vs a hand-rolled python model: self-trained
    counts, null-padded marginal (doc-final tokens count in c1),
    add-alpha smoothing for unseen pairs, per-doc mean nll."""
    import math
    from collections import Counter

    from ariadna_spark.analyze import tokenize_py
    from ariadna_spark.operators.text import perplexity_scores

    rows = [
        (0, "merge join merge join merge"),
        (1, "merge join scan"),
        (2, "window window window window"),
        (3, "scan merge"),  # 'scan merge' is an unseen-elsewhere pair
        (4, "zebra"),  # single token: no bigrams -> absent from output
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll_r"])
        for r in perplexity_scores(docs, alpha=0.5).collect()
    }
    assert 4 not in out  # no pairs, no row

    toks = {i: tokenize_py(t) for i, t in rows}
    c2: Counter = Counter()
    c1: Counter = Counter()
    vocab = set()
    for ts in toks.values():
        for j, w in enumerate(ts):
            c1[w] += 1
            vocab.add(w)
            if j + 1 < len(ts):
                c2[(w, ts[j + 1])] += 1
    v = float(len(vocab))
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        nlls = [
            math.log((c1[ts[j]] + 0.5 * v) / (c2[(ts[j], ts[j + 1])] + 0.5))
            for j in range(len(ts) - 1)
        ]
        want = round(sum(nlls) / len(nlls), 4)
        assert out[i] == (len(ts) - 1, want), (i, out[i], want)

    # a doc full of unseen-context tokens scores the uniform-floor nll
    probe = spark.createDataFrame(
        [(9, "qqq www qqq")], "doc_id long, content string"
    )
    pr = perplexity_scores(probe, lm_docs=docs, alpha=0.5).collect()[0]
    assert pr["n_bigrams"] == 2
    assert pr["nll_r"] == round(math.log((0 + 0.5 * v) / (0 + 0.5)), 4)


def test_repetition_metrics(spark):
    """Gopher top-ngram fractions vs hand computation, including docs
    shorter than the gram sizes (0.0 fracs, still present)."""
    from ariadna_spark.operators.text import repetition_metrics

    rows = [
        (0, "merge join merge join merge join scan"),  # 'merge join' x3
        (1, "alpha beta gamma delta"),                 # all grams unique
        (2, "spam spam spam spam"),                    # one token repeated
        (3, "tiny"),                                   # 1 token: no grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    # doc 0: 7 tokens; 'merge join' occurs 3x -> 3*2/7; top 3-gram
    # ('merge join merge'|'join merge join') occurs 2x -> 2*3/7; top
    # 4-gram 'merge join merge join' occurs 2x -> 2*4/7
    assert out[0]["n_tokens"] == 7
    assert out[0]["top2_frac"] == round(6 / 7, 4)
    assert out[0]["top3_frac"] == round(6 / 7, 4)
    assert out[0]["top4_frac"] == round(8 / 7, 4)  # overlapping windows can exceed 1
    # doc 1: every gram unique -> n/ n_tokens
    assert out[1]["top2_frac"] == round(2 / 4, 4)
    assert out[1]["top4_frac"] == round(4 / 4, 4)
    # doc 2: 'spam spam' occurs 3x -> 6/4
    assert out[2]["top2_frac"] == round(6 / 4, 4)
    # doc 3: shorter than every n -> present with zeros
    assert out[3]["n_tokens"] == 1
    assert (out[3]["top2_frac"], out[3]["top3_frac"], out[3]["top4_frac"]) == (
        0.0, 0.0, 0.0,
    )


def test_repetition_arrow_equals_catalyst(spark, docs):
    """The map-side Arrow repetition kernel is row-identical to the
    Catalyst equivalence reference (and therefore to the oracle)."""
    from ariadna_spark.operators.text import repetition_metrics

    a = sorted(tuple(r) for r in repetition_metrics(docs).collect())
    b = sorted(tuple(r) for r in repetition_metrics(docs, use_arrow=False).collect())
    assert a == b and len(a) > 0


def test_duplicate_spans_semantics(spark):
    """Handcrafted contract: a span shared verbatim by two docs marks
    exactly the overlapping windows in BOTH docs; a unique doc reports
    zero; intra-doc repeats alone do NOT count (distinct-doc rule); docs
    shorter than n are absent from the output."""
    from ariadna_spark.operators.text import duplicate_spans

    shared = "alpha bravo charlie delta"  # 4 tokens, n=4 -> one window
    rows = [
        (0, f"{shared} unique tail zero"),
        (1, f"head one two {shared}"),
        (2, "all original tokens nothing shared here"),
        (3, "loop loop loop loop loop loop loop loop"),  # intra-doc repeat only
        (4, "tiny doc"),  # < n tokens: no windows
    ]
    docs = spark.createDataFrame(rows, "doc_id long, content string")
    got = {r["doc_id"]: r for r in duplicate_spans(docs, n=4).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["n_windows"] == 4 and got[0]["dup_windows"] == 1
    assert got[1]["n_windows"] == 4 and got[1]["dup_windows"] == 1
    assert got[2]["dup_windows"] == 0 and got[2]["dup_frac"] == 0.0
    assert got[3]["dup_windows"] == 0  # 5 identical windows, ONE doc
    assert got[0]["dup_frac"] == 0.25
