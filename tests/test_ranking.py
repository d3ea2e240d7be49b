"""Result-shaping verbs (collapse / top_hits / dis_max / rank_eval) and
the simple_query_string dialect: engine semantics against independent
recomputation from the exhaustive score table, DSL routing parity with
the direct calls, and loud errors for out-of-scope input."""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ariadna_spark.analyze import tokenize_py
from ariadna_spark.operators.ranking import (
    collapse_topk,
    dis_max_topk,
    rank_eval,
    top_hits,
)
from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.query_dsl import DslError, compile_query_string, compile_search
from ariadna_spark.sources.segments import build_index

Q = "table scan filter group"


@pytest.fixture(scope="module")
def reader(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rank_idx"))
    build_index(spark, docs, out, build_id="r1", n_buckets=4)
    return IndexReader(spark, out)


@pytest.fixture(scope="module")
def exhaustive(reader):
    """(doc_id, score, repo, lang) for every doc matching Q — recomputed
    from reader.scores (hash-green machinery) as the independent base."""
    s = reader.scores(sorted(set(tokenize_py(Q))))
    dm = reader.docmap().select("doc_id", "repo", "lang")
    return {r["doc_id"]: (r["score"], r["repo"], r["lang"]) for r in s.join(dm, "doc_id").collect()}


def test_collapse_semantics(reader, exhaustive):
    got = collapse_topk(reader, Q, "repo", 10).collect()
    # expected: best (score desc, doc_id asc) per repo, then global cut
    best = {}
    for did, (s, repo, _) in sorted(exhaustive.items()):
        if repo not in best or s > best[repo][1]:
            best[repo] = (did, s)
    want = sorted(best.values(), key=lambda t: (-t[1], t[0]))[:10]
    assert [(r["doc_id"], r["repo"]) for r in got] == [
        (did, [k for k, v in best.items() if v == (did, s)][0]) for did, s in want
    ]
    for r in got:
        assert r["score"] == pytest.approx(exhaustive[r["doc_id"]][0])
    # one row per group, scores non-increasing
    assert len({r["repo"] for r in got}) == len(got)
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_top_hits_semantics(reader, exhaustive):
    got = top_hits(reader, Q, "lang", 3).collect()
    per = {}
    for did, (s, _, lang) in sorted(exhaustive.items()):
        per.setdefault(lang, []).append((-s, did))
    want = []
    for lang in sorted(per):
        for rank, (neg_s, did) in enumerate(sorted(per[lang])[:3], start=1):
            want.append((lang, rank, did))
    assert [(r["bucket"], r["rank"], r["doc_id"]) for r in got] == want


def test_dis_max_semantics(reader):
    clauses = ["merge join", "window scan"]
    per_doc = {}
    for i, c in enumerate(clauses):
        for r in reader.scores(sorted(set(tokenize_py(c)))).collect():
            per_doc.setdefault(r["doc_id"], {})[i] = r["score"]
    tie = 0.4
    want = sorted(
        (
            (-(max(v.values()) + tie * (sum(v.values()) - max(v.values()))), did)
            for did, v in per_doc.items()
        ),
    )[:10]
    got = dis_max_topk(reader, clauses, tie_breaker=tie, k=10).collect()
    assert [r["doc_id"] for r in got] == [did for _, did in want]
    for r, (neg_s, _) in zip(got, want):
        assert r["score"] == pytest.approx(-neg_s)
    # tie_breaker=0 -> pure max of clause scores
    got0 = dis_max_topk(reader, clauses, tie_breaker=0.0, k=10).collect()
    for r in got0:
        assert r["score"] == pytest.approx(max(per_doc[r["doc_id"]].values()))


def test_rank_eval_semantics(spark, reader):
    k = 5
    requests = [(1, "merge join"), (2, "zzznotaterm")]
    top = {r["rank"]: r["doc_id"] for r in reader.topk("merge join", k).withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    ).collect()}
    # judge: ranks 2 and 4 relevant, graded 2.0 / 1.0
    rated = [(1, top[2], 2.0), (1, top[4], 1.0), (2, 999_999, 3.0)]
    ratings = spark.createDataFrame(rated, "query_id long, doc_id long, rating double")
    got = {r["query_id"]: r for r in rank_eval(reader, requests, ratings, k=k).collect()}
    assert got[1]["p_at_k"] == pytest.approx(2 / 5)
    assert got[1]["mrr"] == pytest.approx(round(1 / 2, 4))
    want_dcg = round(2.0 / math.log2(3) + 1.0 / math.log2(5), 4)
    assert got[1]["dcg"] == pytest.approx(want_dcg)
    # absent-term request present with zeros, never dropped
    assert (got[2]["p_at_k"], got[2]["mrr"], got[2]["dcg"]) == (0.0, 0.0, 0.0)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_query_string_routes(reader):
    cases = [
        ("merge join", {}, reader.topk("merge join", 10)),
        # must-only with several terms is a conjunction: every must token
        # is required (was wrongly routed to disjunctive topk pre-r7)
        ("+merge +join", {}, reader.bool_topk("merge join", k=10)),
        ('"merge join"', {}, reader.phrase_topk("merge join", 10)),
        ("mer*", {}, reader.prefix_topk("mer", 10)),
        ("mrege~2", {}, reader.fuzzy_topk("mrege", 10, max_dist=2)),
        (
            "+scan merge join",
            {},
            reader.bool_topk("scan", should="merge join", msm=1, k=10),
        ),
        (
            "+merge -window",
            {},
            reader.bool_topk("merge", must_not="window", k=10),
        ),
        (
            "+merge +join lang:fr",
            {},
            reader.bool_topk("merge join", flt=F.col("lang") == "fr", k=10),
        ),
        (
            "merge join",
            {"default_operator": "and"},
            reader.bool_topk("merge join", k=10),
        ),
        # single must term: conjunction of one == plain match — stays on
        # the cheaper pruned topk plan
        ("+merge", {}, reader.topk("merge", 10)),
    ]
    for qs, kw, want in cases:
        assert rows(compile_query_string(reader, qs, **kw)) == rows(want), qs


def test_query_string_errors(reader):
    for bad in ["", "   ", "*", "-only", "+", "lang:fr", '"unterminated',
                '"a b" extra', "mer* scan", "a~1 b~2", "badcol:x",
                # +/- on expansion clauses would silently invert/ignore
                # the operator (r7 ADVICE): loud errors instead
                "-mer*", "+mer*", "-mrege~1", '-"a b"', '+"a b"']:
        with pytest.raises(DslError):
            compile_query_string(reader, bad)
    with pytest.raises(DslError):
        compile_query_string(reader, "ok", default_operator="xor")


def test_dsl_routes_new_kinds(reader):
    body_qs = {
        "query": {"simple_query_string": {"query": "+merge -window lang:fr"}},
        "size": 7,
    }
    want = reader.bool_topk("merge", must_not="window", flt=F.col("lang") == "fr", k=7)
    assert rows(compile_search(reader, body_qs)) == rows(want)

    body_dm = {
        "query": {
            "dis_max": {
                "queries": [
                    {"match": {"content": "merge join"}},
                    {"match": {"content": "window scan"}},
                ],
                "tie_breaker": 0.3,
            }
        },
        "size": 6,
    }
    assert rows(compile_search(reader, body_dm)) == rows(
        dis_max_topk(reader, ["merge join", "window scan"], 0.3, 6)
    )

    body_cl = {
        "query": {"match": {"content": Q}},
        "collapse": {"field": "repo"},
        "size": 5,
    }
    assert rows(compile_search(reader, body_cl)) == rows(collapse_topk(reader, Q, "repo", 5))

    body_th = {
        "size": 0,
        "query": {"match": {"content": Q}},
        "aggs": {"g": {"terms": {"field": "lang"}, "aggs": {"h": {"top_hits": {"size": 2}}}}},
    }
    assert rows(compile_search(reader, body_th)) == rows(top_hits(reader, Q, "lang", 2))


def test_dsl_new_kind_errors(reader):
    for body in [
        {"query": {"dis_max": {"queries": []}}},
        {"query": {"dis_max": {"queries": [{"prefix": {"content": "me"}}]}}},
        {"query": {"match": {"content": Q}}, "collapse": {"field": "nope"}},
        {"query": {"match": {"content": Q}}, "collapse": {"field": "repo"}, "sort": [{"doc_len": "asc"}]},
        {"query": {"simple_query_string": {"query": 3}}},
        {
            "size": 0,
            "query": {"match": {"content": Q}},
            "aggs": {
                "g": {"terms": {"field": "lang"}, "aggs": {"h": {"top_hits": {}}}},
                "extra": {"stats": {"field": "doc_len"}},
            },
        },
    ]:
        with pytest.raises(DslError):
            compile_search(reader, body)


def test_boosting_semantics(reader):
    from ariadna_spark.operators.ranking import boosting_topk

    pos = {r["doc_id"]: r["score"] for r in reader.scores(sorted(set(tokenize_py("table scan")))).collect()}
    neg = {r["doc_id"]: r["score"] for r in reader.scores(sorted(set(tokenize_py("window")))).collect()}
    nb = 0.4
    want = sorted(
        ((-(s * (nb if d in neg else 1.0)), d) for d, s in pos.items())
    )[:10]
    got = boosting_topk(reader, "table scan", "window", nb, 10).collect()
    assert [r["doc_id"] for r in got] == [d for _, d in want]
    for r, (neg_s, _) in zip(got, want):
        assert r["score"] == pytest.approx(-neg_s)
    # negative-only docs never appear
    assert not ({r["doc_id"] for r in got} - set(pos))
    # at least one demoted doc exists in the corpus for this pair
    assert any(d in neg for d in pos), "fixture lost its demotion case"


def test_function_score_semantics(reader, exhaustive):
    from ariadna_spark.operators.ranking import function_score_topk

    dl = {r["doc_id"]: r["doc_len"] for r in reader.docmap().select("doc_id", "doc_len").collect()}
    want = sorted(
        ((-(s * math.log10(1.0 + 0.1 * dl[d])), d) for d, (s, _, _) in exhaustive.items())
    )[:10]
    got = function_score_topk(reader, Q, "doc_len", 0.1, "log1p", "multiply", 10).collect()
    assert [r["doc_id"] for r in got] == [d for _, d in want]
    for r, (neg_s, _) in zip(got, want):
        assert r["score"] == pytest.approx(-neg_s)
    # sum mode and sqrt modifier also honored
    got2 = function_score_topk(reader, Q, "doc_len", 1.0, "sqrt", "sum", 5).collect()
    want2 = sorted(
        ((-(s + math.sqrt(dl[d])), d) for d, (s, _, _) in exhaustive.items())
    )[:5]
    assert [r["doc_id"] for r in got2] == [d for _, d in want2]


def test_dsl_routes_boosting_and_function_score(reader):
    from ariadna_spark.operators.ranking import boosting_topk, function_score_topk

    body_b = {
        "query": {"boosting": {
            "positive": {"match": {"content": "table scan"}},
            "negative": {"match": {"content": "window"}},
            "negative_boost": 0.4,
        }},
        "size": 6,
    }
    assert rows(compile_search(reader, body_b)) == rows(
        boosting_topk(reader, "table scan", "window", 0.4, 6)
    )
    body_f = {
        "query": {"function_score": {
            "query": {"match": {"content": Q}},
            "field_value_factor": {"field": "doc_len", "factor": 0.1, "modifier": "log1p"},
            "boost_mode": "multiply",
        }},
        "size": 6,
    }
    assert rows(compile_search(reader, body_f)) == rows(
        function_score_topk(reader, Q, "doc_len", 0.1, "log1p", "multiply", 6)
    )
    for bad in [
        {"query": {"boosting": {"positive": {"match": {"content": "x"}}}}},
        {"query": {"function_score": {"query": {"match": {"content": "x"}},
                                      "field_value_factor": {"field": "nope"}}}},
        {"query": {"function_score": {"query": {"match": {"content": "x"}},
                                      "field_value_factor": {"field": "doc_len", "modifier": "exp"}}}},
    ]:
        with pytest.raises(DslError):
            compile_search(reader, bad)


def test_rescore_semantics(reader):
    from ariadna_spark.operators.ranking import rescore_topk

    window, rqw = 12, 0.7
    prim = {r["doc_id"]: r["score"] for r in reader.topk(Q, window).collect()}
    sec = {r["doc_id"]: r["score"] for r in reader.scores(sorted(set(tokenize_py("merge join")))).collect()}
    want = sorted(
        ((-(p + rqw * sec.get(d, 0.0)), d) for d, p in prim.items())
    )[:5]
    got = rescore_topk(reader, Q, "merge join", window, 1.0, rqw, k=5).collect()
    assert [r["doc_id"] for r in got] == [d for _, d in want]
    for r, (neg_s, _) in zip(got, want):
        assert r["score"] == pytest.approx(-neg_s)
    # only window docs can appear, even if a non-window doc has a huge
    # secondary score
    assert set(r["doc_id"] for r in got) <= set(prim)
    # unknown-term rescore query degrades to the primary ranking
    got2 = rescore_topk(reader, Q, "zzznotaterm", window, 1.0, rqw, k=5).collect()
    want2 = sorted(((-p, d) for d, p in prim.items()))[:5]
    assert [r["doc_id"] for r in got2] == [d for _, d in want2]


def test_min_score_and_rescore_dsl(reader):
    from ariadna_spark.operators.ranking import rescore_topk

    base = compile_search(reader, {"query": {"match": {"content": Q}}, "size": 10}).collect()
    cut = base[4]["score"]  # floor at the 5th hit's score
    got = compile_search(
        reader, {"query": {"match": {"content": Q}}, "size": 10, "min_score": cut}
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base if r["score"] >= cut]

    body = {
        "query": {"match": {"content": Q}},
        "rescore": {
            "window_size": 12,
            "query": {
                "rescore_query": {"match": {"content": "merge join"}},
                "query_weight": 1.0,
                "rescore_query_weight": 0.7,
            },
        },
        "size": 5,
    }
    assert rows(compile_search(reader, body)) == rows(
        rescore_topk(reader, Q, "merge join", 12, 1.0, 0.7, 5)
    )
    for bad in [
        {"query": {"match": {"content": Q}}, "sort": [{"doc_len": "asc"}], "min_score": 1.0},
        {"query": {"match": {"content": Q}}, "rescore": {"window_size": 5},
         "sort": [{"doc_len": "asc"}]},
        {"query": {"match_phrase": {"content": Q}}, "rescore": {
            "window_size": 5, "query": {"rescore_query": {"match": {"content": "x"}}}}},
        {"query": {"match": {"content": Q}}, "rescore": {
            "window_size": 5, "query": {"rescore_query": {"prefix": {"content": "me"}}}}},
    ]:
        with pytest.raises(DslError):
            compile_search(reader, bad)


def test_filter_dialect_terms_ids_exists(reader):
    from ariadna_spark.query_dsl import compile_filter

    base = compile_search(
        reader, {"query": {"match": {"content": Q}}, "size": 50}
    ).collect()
    ids = [r["doc_id"] for r in base[:6]]
    got = compile_search(reader, {
        "query": {"bool": {
            "must": [{"match": {"content": Q}}],
            "filter": [{"ids": {"values": ids}}],
        }},
        "size": 50,
    }).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(ids)

    langs = ["fr", "go"]
    got2 = compile_search(reader, {
        "query": {"bool": {
            "must": [{"match": {"content": Q}}],
            "filter": [{"terms": {"lang": langs}}],
        }},
        "size": 500,
    }).collect()
    allowed = {r["doc_id"] for r in reader.docmap().filter(F.col("lang").isin(langs)).select("doc_id").collect()}
    assert {r["doc_id"] for r in got2} <= allowed and got2
    # exists on an always-present column is a no-op filter
    got3 = compile_search(reader, {
        "query": {"bool": {
            "must": [{"match": {"content": Q}}],
            "filter": [{"exists": {"field": "lang"}}],
        }},
        "size": 10,
    }).collect()
    assert [r["doc_id"] for r in got3] == [r["doc_id"] for r in base[:10]]
    for bad in [
        [{"terms": {"lang": []}}],
        [{"terms": {"nope": ["x"]}}],
        [{"ids": {"values": ["a"]}}],
        [{"exists": {"field": "doc_id"}}],
        [{"exists": {"field": "nope"}}],
    ]:
        with pytest.raises(DslError):
            compile_filter(bad)


def test_suggest_in_search_body(reader):
    got = rows(compile_search(reader, {
        "suggest": {"s": {"prefix": "me", "completion": {"size": 5}}}
    }))
    assert got == rows(reader.suggest_terms("me", size=5))
    got2 = rows(compile_search(reader, {
        "suggest": {"s": {"text": "mrege", "term": {"size": 5, "max_edits": 2}}}
    }))
    assert got2 == rows(reader.suggest_corrections("mrege", size=5, max_dist=2))
    for bad in [
        {"suggest": {"s": {"prefix": "me", "completion": {}}}, "size": 5},
        {"suggest": {"a": {}, "b": {}}},
        {"suggest": {"s": {"prefix": "", "completion": {}}}},
        {"suggest": {"s": {"text": "x", "phrase": {}}}},
    ]:
        with pytest.raises(DslError):
            compile_search(reader, bad)


def test_wildcard_routes_and_errors(reader):
    # prefix anchor == prefix_topk; infix == disjunction over the
    # vocabulary expansion
    assert rows(reader.wildcard_topk("mer*", 10)) == rows(reader.prefix_topk("mer", 10))
    exp = reader.terms_containing("er") or []
    assert rows(reader.wildcard_topk("*er*", 10)) == rows(reader._topk_terms(sorted(exp), 10))
    suf = [t for t in (reader.terms_containing("ge") or []) if t.endswith("ge")]
    assert rows(reader.wildcard_topk("*ge", 10)) == rows(reader._topk_terms(sorted(suf), 10))
    body = {"query": {"wildcard": {"content": {"value": "*er*"}}}, "size": 7}
    assert rows(compile_search(reader, body)) == rows(reader.wildcard_topk("*er*", 7))
    for bad in ["er", "*", "**", "a*b", "m*re*"]:
        with pytest.raises(ValueError):
            reader.wildcard_topk(bad, 5)
    with pytest.raises(DslError):
        compile_search(reader, {"query": {"wildcard": {"content": "no_anchor"}}})
    with pytest.raises(ValueError):
        reader.wildcard_topk("*er*", 5, max_terms=2)  # over-cap is loud


def test_highlight_phrase(spark, docs, reader):
    phrase = "merge join"
    got = reader.highlight_phrase_topk(docs, phrase, 5, window=3).collect()
    winners = reader.phrase_topk(phrase, 5).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in winners]
    # recompute each snippet independently from the doc content with the
    # python analyzer (provably identical to the Catalyst expr)
    seq = tokenize_py(phrase)
    contents = {r["doc_id"]: r["content"] for r in docs.filter(
        F.col("doc_id").isin([r["doc_id"] for r in got])).collect()}
    for r in got:
        toks = tokenize_py(contents[r["doc_id"]])
        first = next(i for i in range(len(toks) - len(seq) + 1)
                     if toks[i:i + len(seq)] == seq)
        s0 = max(first - 3, 0)
        want = " ".join(toks[s0:first + len(seq) + 3])
        assert r["snippet"] == want
        assert r["matched"] == " ".join(seq)
    # DSL routing
    body = {
        "query": {"match_phrase": {"content": phrase}},
        "highlight": {"fields": {"content": {}}},
        "size": 5,
    }
    assert rows(compile_search(reader, body, docs=docs)) == rows(
        reader.highlight_phrase_topk(docs, phrase, 5)
    )


def test_regexp_topk(reader):
    exp = [t for t in (reader.terms_containing("") or [])]  # full vocab? may be None
    got = reader.regexp_topk("m[ae]rge|join", 10)
    want = reader._topk_terms(sorted({"merge", "join"} & set(
        r["term"] for r in reader._vocab(
            reader._read_parquet(reader._terms_dirs(), "terms")
        ).select("term").distinct().collect())), 10)
    assert rows(got) == rows(want)
    body = {"query": {"regexp": {"content": {"value": "m[ae]rge|join"}}}, "size": 6}
    assert rows(compile_search(reader, body)) == rows(reader.regexp_topk("m[ae]rge|join", 6))
    with pytest.raises(ValueError):
        reader.regexp_topk(".*", 5, max_terms=3)  # unselective is loud
    # at the tiny test sf the whole vocabulary fits the default cap, so
    # `.*` compiles; the cap path is pinned by the direct call above
