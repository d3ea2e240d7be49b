#!/usr/bin/env python
"""Search-serving entry point: a long-lived process holding ONE warm
SparkSession + IndexReader, answering queries over HTTP (stdlib
http.server — no external web framework).

The reference runs a web server on :8080 with /api/search
(/root/reference/osm/osm.go:179-186); this is the native analog. Unlike
scripts/query.py (one-shot: pays SparkSession + reader startup per
invocation), the serving loop pays them once; per-query latency is then
just the Spark job time measured in bench.py.

    spark-submit --py-files dist/ariadna_spark.zip scripts/serve.py \
        --index /tmp/idx --port 8080
    curl 'localhost:8080/api/search?q=binary+search&k=10'
    curl 'localhost:8080/api/prefix?q=bin&k=10'

Config (A8): --config YAML + ARIADNA_* env overrides, flags win.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SearchService:
    """Warm reader + serialized query execution (one SparkSession is not
    safely concurrent for independent actions with shared conf mutation;
    a lock keeps the serving loop simple — throughput scaling comes from
    batching via topk_many, not from racing jobs)."""

    def __init__(
        self,
        spark,
        index_dir: str,
        build_id: str | None = None,
        geo_dir: str | None = None,
        geo_cell_deg: float = 20.0,
        ann_dir: str | None = None,
        docs_dir: str | None = None,
    ):
        from ariadna_spark.operators.wand import IndexReader

        self.spark = spark
        self.reader = IndexReader(spark, index_dir, build_id=build_id)
        self._lock = threading.Lock()
        # open scroll contexts: scroll_id -> cursor state (body, last
        # search_after, done flag, ttl). Purged lazily on every scroll
        # call; hard-capped so a client can't grow driver memory.
        self._scrolls: dict[str, dict] = {}
        self._docs = None
        if docs_dir:
            from ariadna_spark.corpus import load_docs

            self._docs = load_docs(spark, docs_dir)
        self._geo = spark.read.parquet(geo_dir) if geo_dir else None
        self._geo_cell = geo_cell_deg
        self._ann = None
        if ann_dir:
            from ariadna_spark.operators.similarity import (
                ivf_index_read,
                ivf_store_read,
            )

            if os.path.exists(os.path.join(ann_dir, "MANIFEST.json")):
                self._ann = ivf_store_read(spark, ann_dir)  # incremental store
            else:
                self._ann = ivf_index_read(spark, ann_dir)  # flat ivf_index_write

    # docmap attributes a filter clause may constrain (ES bool-filter
    # terms over doc metadata); an allowlist, never raw expressions
    FILTERABLE = ("repo", "path", "commit", "lang")

    def _filter_expr(self, filters: dict[str, str] | None):
        """{col: value} -> conjunctive Catalyst equality predicate over
        allowlisted docmap columns (None passes through)."""
        if not filters:
            return None
        from pyspark.sql import functions as F

        bad = set(filters) - set(self.FILTERABLE)
        if bad:
            raise ValueError(f"unfilterable column(s): {sorted(bad)}")
        flt = F.lit(True)
        for c, v in filters.items():
            flt = flt & (F.col(c) == v)
        return flt

    def search(
        self, q: str, k: int = 10, mode: str = "match", docmap: bool = False,
        window: int = 8, after: tuple[float, int] | None = None,
        filters: dict[str, str] | None = None,
    ) -> list[dict]:
        """`after=(score, doc_id)` = ES search_after cursor (match mode).
        `filters={col: value}` = ES bool-filter terms over docmap
        attributes (match mode); conjunctive equality only. Cursor and
        filters compose — a filtered page 2 stays a pruned top-k job."""
        flt = self._filter_expr(filters)
        with self._lock:
            if mode == "near":
                rows = self.reader.near_topk(
                    q, window=window, k=k, with_docmap=docmap, flt=flt
                ).collect()
            elif mode == "fuzzy":
                rows = self.reader.fuzzy_topk(
                    q, k, max_dist=window, with_docmap=docmap, flt=flt
                ).collect()
            elif mode == "match":
                rows = self.reader.topk(
                    q, k, with_docmap=docmap, after=after, flt=flt
                ).collect()
            else:
                fn = {
                    "prefix": self.reader.prefix_topk,
                    "phrase": self.reader.phrase_topk,
                    "phrase_prefix": self.reader.phrase_prefix_topk,
                }[mode]
                rows = fn(q, k, with_docmap=docmap, flt=flt).collect()
        return [r.asDict() for r in rows]

    def bool_search(
        self, must: str = "", should: str = "", must_not: str = "",
        msm: int = 0, k: int = 10, docmap: bool = False,
        filters: dict[str, str] | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[dict]:
        """GET /api/bool: the composed ES bool query (must/should/
        must_not + minimum_should_match + non-scoring filter terms),
        with search_after cursor pagination — the cut runs in-kernel,
        so page N of a bool query stays one pruned job."""
        flt = self._filter_expr(filters)
        with self._lock:
            rows = self.reader.bool_topk(
                must, should, must_not, flt=flt, msm=msm, k=k,
                with_docmap=docmap, after=after,
            ).collect()
        return [r.asDict() for r in rows]

    def highlight(self, q: str, k: int = 10, window: int = 5) -> list[dict]:
        """Snippeted search (the ES highlight surface): pruned top-k, then
        an O(k) pushed IN-list fetch re-reads only the winners to cut the
        deterministic +-window snippet. Needs --docs (the corpus)."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        with self._lock:
            rows = self.reader.highlight_topk(
                self._docs, q, k, window=window
            ).collect()
        return [r.asDict() for r in rows]

    def reverse(self, lat: float, lon: float, k: int = 2) -> list[dict]:
        """Reverse geocode: exact haversine k-NN over the cell-partitioned
        geo store (the /api/reverse/:lat/:lon route the reference declares,
        /root/reference/osm/osm.go:182; its handler is a stub — the top-2
        client contract is public/static/js/map.js:54-71). Each ring probe
        partition-prunes to the probed cell directories."""
        if self._geo is None:
            raise ValueError("no geo index configured (--geo-index)")
        from ariadna_spark.operators.geo import geo_knn

        with self._lock:
            rows = geo_knn(self._geo, lat, lon, k=k, cell_deg=self._geo_cell).collect()
        return [r.asDict() for r in rows]

    def grep(self, pattern: str, limit: int = 100) -> dict:
        """Index-accelerated grep (GET /api/grep?q=<pattern>, VERDICT r4
        #8): required-literal extraction -> vocabulary expansion ->
        posting semi-join, with the r5 selectivity gate deciding per
        literal whether the prefilter pays — the interactive consumer of
        that gate. Literal-free / Zipf-head patterns fall back to the
        full scan; rows are identical either way. Response reports
        `prefilter_used` so a caller can see which shape ran."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        from ariadna_spark.operators.text import regex_search_indexed
        from ariadna_spark.plans import physical_plan

        with self._lock:
            df = regex_search_indexed(self._docs, pattern, self.reader)
            prefilter_used = "LeftSemi" in physical_plan(df)
            rows = df.orderBy("doc_id").limit(limit).collect()
        return {
            "pattern": pattern,
            "prefilter_used": prefilter_used,
            "matches": [r.asDict() for r in rows],
        }

    def suggest(self, prefix: str, k: int = 10) -> list[dict]:
        """GET /api/suggest?prefix=: ES completion suggester — vocabulary
        terms completing the analyzed prefix ranked by df, off the
        partition-pruned edge-ngram buckets (terms-scan fallback for
        prefixes outside the indexed gram lengths)."""
        with self._lock:
            rows = self.reader.suggest_terms(prefix, size=k).collect()
        return [r.asDict() for r in rows]

    def didyoumean(self, q: str, k: int = 5, dist: int = 2) -> list[dict]:
        """GET /api/didyoumean?q=: ES term suggester — vocabulary terms
        within Levenshtein `dist` sharing the first character, ranked
        (distance, df desc, term)."""
        with self._lock:
            rows = self.reader.suggest_corrections(q, size=k, max_dist=dist).collect()
        return [r.asDict() for r in rows]

    def analyze(self, text: str) -> dict:
        """GET /api/analyze?text=: the ES `_analyze` dev surface — the
        exact token stream the index and every query path use (driver
        local; the same tokenize_py impl the kernels pickle)."""
        from ariadna_spark.analyze import tokenize_py

        toks = tokenize_py(text)
        return {"tokens": [{"token": t, "position": i} for i, t in enumerate(toks)]}

    def explain(self, doc_id: int, q: str) -> list[dict]:
        """GET /api/explain?doc=<id>&q=<query>: the ES `_explain` surface
        — per-term BM25 breakdown (tf, doc_len, df, idf, tf_norm, score)
        of one (query, doc) pair, decoding only the blocks covering the
        doc id."""
        with self._lock:
            rows = self.reader.explain_score(doc_id, q).collect()
        return [r.asDict() for r in rows]

    def more_like_this(self, doc_id: int, k: int = 10) -> list[dict]:
        """GET /api/mlt?doc=<id>: docs similar to a source doc (ES MLT —
        tf x idf term selection off the terms table, disjunctive WAND,
        source excluded). Needs --docs."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        with self._lock:
            rows = self.reader.more_like_this(self._docs, doc_id, k).collect()
        return [r.asDict() for r in rows]

    def facets(self, q: str, by: str = "lang") -> list[dict]:
        """GET /api/facets?q=&by=: per-bucket match counts for an OR
        query, straight off the pruned posting blocks (content never
        read). Needs --docs for the bucket column."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        from pyspark.sql import functions as F

        from ariadna_spark.analyze import tokenize_py

        terms = sorted(set(tokenize_py(q)))
        with self._lock:
            cands = self.reader.candidate_doc_ids(terms)
            rows = (
                self._docs.select("doc_id", by)
                .join(cands, "doc_id", "left_semi")
                .groupBy(by)
                .agg(F.count(F.lit(1)).alias("n_docs"))
                .orderBy(by)
                .collect()
            )
        return [r.asDict() for r in rows]

    def sorted_search(
        self, q: str, by: str = "path", order: str = "asc", k: int = 10,
        after: tuple | None = None, filters: dict[str, str] | None = None,
    ) -> list[dict]:
        """GET /api/sorted: ES sort-by-field + search_after on the field
        sort key (TakeOrdered plan — no full sort, no over-fetch)."""
        flt = self._filter_expr(filters)
        with self._lock:
            rows = self.reader.sorted_topk(
                q, by, asc=(order != "desc"), k=k, after=after, flt=flt
            ).collect()
        return [r.asDict() for r in rows]

    def count(self, q: str) -> int:
        """GET /api/count?q=: exact OR-match doc count (ES `_count`)."""
        with self._lock:
            return int(self.reader.match_count(q).collect()[0]["n_docs"])

    def es_search(self, body: dict) -> dict:
        """POST /api/_search: the ES request-body dialect the reference
        delegates today (match / match_phrase[_prefix] / prefix / fuzzy /
        multi_match / bool + filter + search_after + sort + size),
        compiled onto the engine's own verbs (ariadna_spark.query_dsl)
        and answered in the ES hits envelope; `aggs` bodies (size: 0)
        answer in the aggregations envelope, `highlight` bodies carry
        snippets (needs --docs for the content re-read). Out-of-scope
        bodies 400 with the reason — never a silently different
        semantics."""
        from ariadna_spark.query_dsl import compile_search

        with self._lock:
            rows = [
                r.asDict()
                for r in compile_search(self.reader, body, docs=self._docs).collect()
            ]
        if "suggest" in body:
            (sname,) = body["suggest"].keys()
            return {"suggest": {sname: rows}}
        if "aggs" in body:
            if rows and "agg" not in rows[0]:
                # lone terms+top_hits agg: (bucket, rank, doc_id, score)
                # rows -> per-bucket hit arrays under the caller's name
                (aname,) = body["aggs"].keys()
                per: dict = {}
                for r in rows:
                    per.setdefault(r["bucket"], []).append(
                        {"_id": r["doc_id"], "_score": r["score"], "rank": r["rank"]}
                    )
                return {
                    "aggregations": {
                        aname: {
                            "buckets": [
                                {"key": k, "hits": hs} for k, hs in sorted(per.items())
                            ]
                        }
                    }
                }
            buckets: dict = {}
            for r in rows:
                b = buckets.setdefault(r["agg"], [])
                b.append(
                    {"key": r["bucket"], "doc_count": r["n_docs"], "metric": r["metric"]}
                )
            return {"aggregations": {a: {"buckets": bs} for a, bs in buckets.items()}}
        hits = []
        for r in rows:
            src = {c: v for c, v in r.items() if c not in ("doc_id", "score")}
            h = {"_id": r.get("doc_id"), "_score": r.get("score")}
            if src:
                h["fields"] = src
            hits.append(h)
        return {"hits": {"total": {"value": len(hits), "relation": "eq"}, "hits": hits}}

    _SCROLL_MAX = 64  # open contexts cap (driver-memory guard)

    @staticmethod
    def _parse_keep(s: str) -> int:
        import re

        m = re.fullmatch(r"(\d+)([sm])", s or "1m")
        if not m:
            raise ValueError("scroll must look like '30s' or '1m'")
        return int(m.group(1)) * (60 if m.group(2) == "m" else 1)

    def _purge_scrolls(self) -> None:
        import time

        now = time.monotonic()
        for sid in [s for s, c in self._scrolls.items() if c["exp"] < now]:
            del self._scrolls[sid]

    def _scroll_page(self, body: dict, after) -> tuple[dict, list | None, bool]:
        """One scroll page: inject the stored search_after cursor and run
        the body through the normal compiler — a pruned top-k job per
        page, never a from+size over-fetch. Returns (hits envelope,
        next cursor, exhausted)."""
        from ariadna_spark.query_dsl import compile_search

        b = dict(body)
        if after is not None:
            b["search_after"] = after
        with self._lock:
            rows = [r.asDict() for r in compile_search(self.reader, b).collect()]
        if body.get("sort"):
            sort = body["sort"] if isinstance(body["sort"], list) else [body["sort"]]
            col = next(iter(sort[0]))
        else:
            col = "score"
        new_after = [rows[-1][col], rows[-1]["doc_id"]] if rows else after
        hits = []
        for r in rows:
            src = {c: v for c, v in r.items() if c not in ("doc_id", "score")}
            h = {"_id": r.get("doc_id"), "_score": r.get("score")}
            if src:
                h["fields"] = src
            hits.append(h)
        env = {"hits": {"total": {"value": len(hits), "relation": "eq"}, "hits": hits}}
        return env, new_after, len(rows) < int(body.get("size", 10))

    def es_scroll_open(self, body: dict, keep: str = "1m") -> dict:
        """POST /api/_search?scroll=<keep>: first page + a scroll_id
        cursor. ES's scroll contract served over the engine's
        search_after machinery — the server keeps only (body, cursor),
        never result state, so each page is an independent pruned top-k
        job and the context costs O(1) driver memory."""
        import time
        import uuid

        from ariadna_spark.query_dsl import DslError

        if not isinstance(body, dict):
            raise DslError("request body must be an object")
        bad = set(body) - {"query", "size", "sort"}
        if bad:
            raise DslError(f"scroll bodies support query+size+sort, got {sorted(bad)}")
        kind = next(iter(body.get("query") or {"match_all": None}))
        if not body.get("sort") and kind not in ("match", "bool"):
            raise DslError(
                f"scroll needs a cursorable body: match/bool relevance or a "
                f"sorted query, got {kind!r}"
            )
        ttl = self._parse_keep(keep)
        self._purge_scrolls()
        if len(self._scrolls) >= self._SCROLL_MAX:
            raise ValueError("too many open scroll contexts")
        env, after, done = self._scroll_page(body, None)
        sid = uuid.uuid4().hex
        self._scrolls[sid] = {
            "body": body,
            "after": after,
            "done": done,
            "ttl": ttl,
            "exp": time.monotonic() + ttl,
        }
        env["_scroll_id"] = sid
        return env

    def es_scroll_next(self, body: dict) -> dict:
        """POST /api/_search/scroll: {"scroll_id"} -> next page (empty
        hits once exhausted, like ES). Each call renews the keep-alive."""
        import time

        sid = body.get("scroll_id")
        self._purge_scrolls()
        ctx = self._scrolls.get(sid)
        if ctx is None:
            raise ValueError("unknown or expired scroll_id")
        if ctx["done"]:
            env = {"hits": {"total": {"value": 0, "relation": "eq"}, "hits": []}}
        else:
            env, after, done = self._scroll_page(ctx["body"], ctx["after"])
            ctx["after"], ctx["done"] = after, done
        ctx["exp"] = time.monotonic() + ctx["ttl"]
        env["_scroll_id"] = sid
        return env

    def es_scroll_clear(self, body: dict) -> dict:
        """DELETE /api/_search/scroll: free contexts explicitly."""
        ids = body.get("scroll_id")
        if isinstance(ids, str):
            ids = [ids]
        n = sum(1 for s in ids or [] if self._scrolls.pop(s, None) is not None)
        return {"succeeded": True, "num_freed": n}

    def es_mget(self, body: dict) -> dict:
        """POST /api/_mget: {"ids": [...]} -> ES-shaped docs array. One
        tombstone-masked pruned docmap read; absent/dead ids come back
        found=false (never a stale version)."""
        ids = body.get("ids")
        if not isinstance(ids, list) or not ids or not all(
            isinstance(i, int) for i in ids
        ):
            raise ValueError("_mget needs a non-empty integer ids array")
        with self._lock:
            rows = self.reader.mget(ids).collect()
        return {
            "docs": [
                {
                    "_id": r["doc_id"],
                    "found": bool(r["found"]),
                    **(
                        {
                            "fields": {
                                c: r[c]
                                for c in (
                                    "repo", "path", "commit", "lang",
                                    "doc_len", "content_sha",
                                )
                            }
                        }
                        if r["found"]
                        else {}
                    ),
                }
                for r in rows
            ]
        }

    def es_msearch(self, raw: bytes) -> dict:
        """POST /api/_msearch: N `_search` bodies in one request, answered
        in order. Accepts a JSON array of bodies (or {"searches": [...]})
        or ES's NDJSON convention (header line, body line, repeated;
        header lines are ignored). Plain match bodies execute as ONE
        batched Spark job (query_dsl.msearch -> topk_many); the rest
        compile individually. Malformed input 400s the whole request."""
        from ariadna_spark.query_dsl import DslError, msearch

        try:
            parsed = json.loads(raw)
            if isinstance(parsed, dict) and isinstance(parsed.get("searches"), list):
                bodies = parsed["searches"]
            elif isinstance(parsed, list):
                bodies = parsed
            else:
                raise DslError("_msearch needs a JSON array of bodies or NDJSON")
        except json.JSONDecodeError:
            lines = [ln for ln in raw.decode("utf-8").splitlines() if ln.strip()]
            if len(lines) % 2:
                raise DslError("_msearch NDJSON must alternate header/body lines")
            try:
                bodies = [json.loads(ln) for ln in lines[1::2]]
            except json.JSONDecodeError as e:
                raise DslError(f"invalid NDJSON body line: {e}")
        with self._lock:
            results = msearch(self.reader, bodies, docs=self._docs)
        return {
            "responses": [
                {"hits": {"total": {"value": len(rs), "relation": "eq"},
                          "hits": [{"_id": r.pop("doc_id", None),
                                    "_score": r.pop("score", None),
                                    **({"fields": r} if r else {})}
                                   for r in rs]}}
                for rs in results
            ]
        }

    def es_validate(self, body: dict) -> dict:
        """POST /api/_validate: ES `_validate/query` — compile the request
        body without collecting results. Compilation builds the lazy plan
        only (rescore bodies additionally run their primary window pass —
        the one compile-time action in the dialect), so an out-of-scope
        or malformed body reports {valid: false, error} instead of 400ing
        at search time."""
        from ariadna_spark.query_dsl import DslError, compile_search

        try:
            with self._lock:
                compile_search(self.reader, body, docs=self._docs)
            return {"valid": True}
        except DslError as e:
            return {"valid": False, "error": str(e)}

    def es_rank_eval(self, body: dict) -> dict:
        """POST /api/_rank_eval: {"requests": [{"id": int, "query": str,
        "ratings": [[doc_id, rating], ...]}], "k": int} -> per-request
        precision@k / MRR / DCG@k. Simplified textbook metric forms, not
        ES's exact formulas (see operators.ranking.rank_eval: constant-k
        precision denominator, linear DCG gain). One batched topk_many job
        for the whole request set; ratings broadcast into the join."""
        reqs = body.get("requests")
        if not isinstance(reqs, list) or not reqs:
            raise ValueError("_rank_eval needs a non-empty requests array")
        k = int(body.get("k", 10))
        pairs, rating_rows = [], []
        for r in reqs:
            if not isinstance(r, dict) or "id" not in r or not r.get("query"):
                raise ValueError("each request needs id + query")
            qid = int(r["id"])
            pairs.append((qid, str(r["query"])))
            for it in r.get("ratings") or []:
                rating_rows.append((qid, int(it[0]), float(it[1])))
        from ariadna_spark.operators.ranking import rank_eval

        with self._lock:
            ratings = self.spark.createDataFrame(
                rating_rows or [(int(-1), int(-1), 0.0)],
                "query_id long, doc_id long, rating double",
            )
            rows = rank_eval(self.reader, pairs, ratings, k=k).collect()
        return {"details": [r.asDict() for r in rows], "k": k}

    def multifield(self, q: str, fields: list[tuple[str, float]], k: int = 10) -> list[dict]:
        """GET /api/multifield?q=...&fields=content:1,path:2 — BM25F over
        the store's per-field terms (requires a build_multifield_index
        store; every other endpoint already serves its primary field)."""
        from ariadna_spark.operators.wand import multifield_topk_single

        with self._lock:
            rows = multifield_topk_single(self.reader, fields, q, k).collect()
        return [r.asDict() for r in rows]

    def term_vectors(self, doc_id: int) -> list[dict]:
        """GET /api/termvectors?doc=: one doc's (term, tf, df, positions)
        — the ES `_termvectors` surface. Needs --docs (re-analysis)."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        with self._lock:
            rows = self.reader.term_vectors(self._docs, doc_id).collect()
        return [r.asDict() for r in rows]

    def aggs(self, q: str, interval: int = 25) -> list[dict]:
        """GET /api/aggs?q=&interval=: the non-terms agg suite (range /
        histogram / stats / cardinality) over an OR match — one pruned
        candidate pass, one GROUPING SETS shuffle, content never read."""
        with self._lock:
            rows = self.reader.match_aggs(q, interval=interval).collect()
        return [r.asDict() for r in rows]

    def significant(self, q: str, size: int = 10, min_doc_count: int = 3) -> list[dict]:
        """GET /api/significant?q=: ES significant_terms agg (JLH) over
        the OR-match foreground. Needs --docs (foreground re-analysis;
        background df comes from the index's terms metadata)."""
        if self._docs is None:
            raise ValueError("no docs configured (--docs)")
        with self._lock:
            rows = self.reader.significant_terms(
                self._docs, q, size=size, min_doc_count=min_doc_count
            ).collect()
        return [r.asDict() for r in rows]

    def percolate_body(self, body: dict) -> dict:
        """POST /api/percolate: the ES percolator, stateless form — both
        sides ride the request. {"docs": [{"id", "text"}], "queries":
        [{"id", "q", "msm"?}]} -> {"matches": [{"doc_id", "query_id"}]}.
        msm absent = all terms (AND); the query text goes through the
        index analyzer (symmetric-analyzer discipline)."""
        from ariadna_spark.analyze import tokenize_py
        from ariadna_spark.operators.percolate import percolate

        docs_in, qs_in = body.get("docs"), body.get("queries")
        if not isinstance(docs_in, list) or not docs_in:
            raise ValueError("missing docs")
        if not isinstance(qs_in, list) or not qs_in:
            raise ValueError("missing queries")
        drows = [
            (int(d.get("id", i)), str(d.get("text") or ""))
            for i, d in enumerate(docs_in)
        ]
        qrows = []
        for i, q in enumerate(qs_in):
            if not isinstance(q, dict) or not q.get("q"):
                raise ValueError(f"queries[{i}]: missing q")
            terms = sorted(set(tokenize_py(str(q["q"]))))
            msm = q.get("msm")
            # `if msm` would coerce an explicit msm=0/'0' to None and
            # silently flip to all-terms AND semantics — reject instead
            msm = int(msm) if msm is not None else None
            if msm is not None and msm < 1:
                raise ValueError(f"queries[{i}]: msm must be >= 1")
            qrows.append((int(q.get("id", i)), terms, msm))
        ddf = self.spark.createDataFrame(drows, "doc_id long, content string")
        qdf = self.spark.createDataFrame(
            qrows, "query_id long, terms array<string>, msm int"
        )
        with self._lock:
            pairs = percolate(ddf, qdf).orderBy("doc_id", "query_id").collect()
        return {
            "matches": [
                {"doc_id": r["doc_id"], "query_id": r["query_id"]} for r in pairs
            ]
        }

    def hybrid(
        self,
        q: str,
        v: list[float],
        k: int = 10,
        window: int = 20,
        n_probe: int = 4,
    ) -> list[dict]:
        """POST /api/hybrid: the ES 8.x `rrf` retriever — BM25 top-window
        (block-max WAND) fused with the ANN top-window over the
        configured IVF store via reciprocal-rank fusion. Body: {"q":
        "text", "v": [floats], "k"?, "window"?, "n_probe"?}."""
        if self._ann is None:
            raise ValueError("no ANN index configured (--ann-index)")
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from ariadna_spark.operators.similarity import ivf_topk_many, rrf_fuse

        qdf = self.spark.createDataFrame(
            [(0, [float(x) for x in v])], "qid long, qv array<double>"
        )
        indexed, centroids = self._ann
        with self._lock:
            lex = (
                self.reader.topk(q, window)
                .withColumn(
                    "rank",
                    F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc_id"))),
                )
                .select("doc_id", "rank")
            )
            den = ivf_topk_many(
                indexed, centroids, qdf, k=window, n_probe=n_probe, prune=True
            ).select(F.col("vec_id").alias("doc_id"), "rank")
            rows = rrf_fuse([lex, den], k=k).collect()
        return [{"doc_id": r["doc_id"], "rrf_score": r["rrf_score"]} for r in rows]

    def search_batch(self, queries: list[dict]) -> list[dict]:
        """The production enrichment entry point (VERDICT r3 #8): the
        WHOLE query set through IndexReader.topk_many in ONE Spark job —
        blocks fetched and shuffled once for the set, per-query WAND in
        the shared kernel. Body entries: {"id": int, "q": str, "k": int}
        (id defaults to the position, k to 10)."""
        trip = []
        for i, q in enumerate(queries):
            if not isinstance(q, dict) or not q.get("q"):
                raise ValueError(f"queries[{i}]: missing q")
            trip.append((int(q.get("id", i)), str(q["q"]), int(q.get("k", 10))))
        with self._lock:
            rows = self.reader.topk_many(trip).collect()
        by_q: dict[int, list] = {int(qid): [] for qid, _, _ in trip}
        for r in rows:
            by_q[r["query_id"]].append(
                {"rank": r["rank"], "doc_id": r["doc_id"], "score": r["score"]}
            )
        return [
            {"id": qid, "hits": sorted(h, key=lambda x: x["rank"])}
            for qid, h in by_q.items()
        ]

    def ann_batch(self, queries: list[dict], k: int = 10, n_probe: int = 4) -> list[dict]:
        """Batch ANN over the configured IVF store: one equi-join per
        query SET (ivf_topk_many, static partition pruning on the probed
        lists). Body entries: {"id": int, "v": [float, ...]}."""
        if self._ann is None:
            raise ValueError("no ANN index configured (--ann-index)")
        from ariadna_spark.operators.similarity import ivf_topk_many

        rows_in = []
        for i, q in enumerate(queries):
            if not isinstance(q, dict) or not q.get("v"):
                raise ValueError(f"queries[{i}]: missing v")
            rows_in.append((int(q.get("id", i)), [float(x) for x in q["v"]]))
        qdf = self.spark.createDataFrame(rows_in, "qid long, qv array<double>")
        indexed, centroids = self._ann
        with self._lock:
            rows = ivf_topk_many(
                indexed, centroids, qdf, k=k, n_probe=n_probe, prune=True
            ).collect()
        by_q: dict[int, list] = {qid: [] for qid, _ in rows_in}
        for r in rows:
            by_q[r["qid"]].append(
                {"rank": r["rank"], "vec_id": r["vec_id"], "cos": r["cos"]}
            )
        return [
            {"id": qid, "hits": sorted(h, key=lambda x: x["rank"])}
            for qid, h in by_q.items()
        ]

    def stats(self) -> dict:
        return {
            "builds": self.reader.build_ids,
            "N": self.reader.stats["N"],
            "avgdl": self.reader.stats["avgdl"],
        }


def make_handler(service: SearchService, public_dir: str | None = None):
    def _parse_filters(qs: dict) -> dict[str, str] | None:
        """?lang=fr&repo=... -> {col: value} over the service allowlist."""
        return {c: qs[c][0] for c in service.FILTERABLE if qs.get(c)} or None

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _static(self, path: str) -> None:
            """Static demo UI (the reference serves public/ via
            http.FileServer as the router fallback, osm.go:183).
            Resolution is confined to public_dir (no traversal)."""
            rel = path.lstrip("/") or "index.html"
            root = os.path.realpath(public_dir)
            full = os.path.realpath(os.path.join(root, rel))
            if not full.startswith(root + os.sep) and full != root:
                return self._json(404, {"error": "not found"})
            if os.path.isdir(full):
                full = os.path.join(full, "index.html")
            if not os.path.isfile(full):
                return self._json(404, {"error": "not found"})
            ctype = {
                ".html": "text/html; charset=utf-8",
                ".js": "text/javascript",
                ".css": "text/css",
                ".json": "application/json",
            }.get(os.path.splitext(full)[1], "application/octet-stream")
            with open(full, "rb") as f:
                body = f.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            qs = parse_qs(u.query)
            try:
                if u.path in (
                    "/api/search", "/api/prefix", "/api/phrase",
                    "/api/phrase_prefix", "/api/near", "/api/fuzzy",
                ):
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    k = int((qs.get("k") or ["10"])[0])
                    docmap = (qs.get("docmap") or ["0"])[0] in ("1", "true")
                    mode = {
                        "/api/search": "match",
                        "/api/prefix": "prefix",
                        "/api/phrase": "phrase",
                        "/api/phrase_prefix": "phrase_prefix",
                        "/api/near": "near",
                        "/api/fuzzy": "fuzzy",
                    }[u.path]
                    # w = proximity window for /api/near, max edit
                    # distance for /api/fuzzy
                    window = int((qs.get("w") or ["8" if mode == "near" else "1"])[0])
                    # ?after=<score>,<doc_id> — search_after cursor
                    # (match mode): deep pagination, page N is a normal
                    # pruned top-k job, never a from+size over-fetch
                    after = None
                    if qs.get("after"):
                        s, _, d = qs["after"][0].partition(",")
                        after = (float(s), int(d))
                    # ?lang=fr&repo=... — ES bool-filter terms over
                    # docmap attributes (match mode, allowlisted)
                    filters = _parse_filters(qs)
                    rows = service.search(
                        q, k, mode=mode, docmap=docmap, window=window,
                        after=after, filters=filters,
                    )
                    resp = {"query": q, "k": k, "hits": rows}
                    if rows and mode == "match":
                        # cursor for the NEXT page (echo-back protocol)
                        last = rows[-1]
                        resp["next_after"] = f"{last['score']!r},{last['doc_id']}"
                    return self._json(200, resp)
                if u.path.startswith("/api/reverse"):
                    # reference route style /api/reverse/:lat/:lon
                    # (osm.go:182); ?lat=&lon= also accepted
                    parts = [p for p in u.path.split("/") if p][2:]
                    if len(parts) == 2:
                        lat, lon = float(parts[0]), float(parts[1])
                    elif "lat" in qs and "lon" in qs:
                        lat, lon = float(qs["lat"][0]), float(qs["lon"][0])
                    else:
                        return self._json(400, {"error": "missing lat/lon"})
                    k = int((qs.get("k") or ["2"])[0])
                    rows = service.reverse(lat, lon, k=k)
                    return self._json(200, {"lat": lat, "lon": lon, "hits": rows})
                if u.path == "/api/bool":
                    must = (qs.get("must") or [""])[0]
                    should = (qs.get("should") or [""])[0]
                    must_not = (qs.get("not") or [""])[0]
                    if not (must or should):
                        return self._json(400, {"error": "missing must/should"})
                    k = int((qs.get("k") or ["10"])[0])
                    msm = int((qs.get("msm") or ["0"])[0])
                    docmap = (qs.get("docmap") or ["0"])[0] in ("1", "true")
                    filters = _parse_filters(qs)
                    after = None
                    if qs.get("after"):
                        s, _, d = qs["after"][0].partition(",")
                        after = (float(s), int(d))
                    rows = service.bool_search(
                        must, should, must_not, msm=msm, k=k, docmap=docmap,
                        filters=filters, after=after,
                    )
                    resp = {"must": must, "should": should, "must_not": must_not,
                            "msm": msm, "k": k, "hits": rows}
                    if rows:
                        last = rows[-1]
                        resp["next_after"] = f"{last['score']!r},{last['doc_id']}"
                    return self._json(200, resp)
                if u.path == "/api/highlight":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    k = int((qs.get("k") or ["10"])[0])
                    w = int((qs.get("w") or ["5"])[0])
                    rows = service.highlight(q, k, window=w)
                    return self._json(200, {"query": q, "k": k, "hits": rows})
                if u.path == "/api/explain":
                    doc = (qs.get("doc") or [""])[0]
                    q = (qs.get("q") or [""])[0]
                    if not doc or not q:
                        return self._json(400, {"error": "missing doc/q"})
                    rows = service.explain(int(doc), q)
                    return self._json(
                        200,
                        {
                            "doc": int(doc),
                            "query": q,
                            "terms": rows,
                            "score": sum(r["score"] for r in rows),
                        },
                    )
                if u.path == "/api/mlt":
                    doc = (qs.get("doc") or [""])[0]
                    if not doc:
                        return self._json(400, {"error": "missing doc"})
                    k = int((qs.get("k") or ["10"])[0])
                    rows = service.more_like_this(int(doc), k)
                    return self._json(200, {"doc": int(doc), "k": k, "hits": rows})
                if u.path == "/api/count":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    return self._json(200, {"query": q, "count": service.count(q)})
                if u.path == "/api/multifield":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    k = int((qs.get("k") or ["10"])[0])
                    spec = (qs.get("fields") or ["content:1.0"])[0]
                    try:
                        fields = [
                            (p.split(":", 1)[0], float(p.split(":", 1)[1]))
                            for p in spec.split(",")
                            if p
                        ]
                    except (IndexError, ValueError):
                        return self._json(
                            400, {"error": "fields must be name:boost[,name:boost...]"}
                        )
                    rows = service.multifield(q, fields, k)
                    return self._json(
                        200, {"query": q, "fields": fields, "k": k, "hits": rows}
                    )
                if u.path == "/api/termvectors":
                    doc = (qs.get("doc") or [""])[0]
                    if not doc:
                        return self._json(400, {"error": "missing doc"})
                    rows = service.term_vectors(int(doc))
                    return self._json(200, {"doc_id": int(doc), "terms": rows})
                if u.path == "/api/sorted":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    by = (qs.get("by") or ["path"])[0]
                    order = (qs.get("order") or ["asc"])[0]
                    k = int((qs.get("k") or ["10"])[0])
                    after = None
                    if qs.get("after"):
                        v, _, d = qs["after"][0].rpartition(",")
                        after = (int(v) if by == "doc_len" else v, int(d))
                    filters = _parse_filters(qs)
                    rows = service.sorted_search(
                        q, by=by, order=order, k=k, after=after, filters=filters
                    )
                    resp = {"query": q, "by": by, "order": order, "hits": rows}
                    if rows:
                        resp["next_after"] = f"{rows[-1][by]},{rows[-1]['doc_id']}"
                    return self._json(200, resp)
                if u.path == "/api/aggs":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    interval = int((qs.get("interval") or ["25"])[0])
                    rows = service.aggs(q, interval=interval)
                    return self._json(200, {"query": q, "aggs": rows})
                if u.path == "/api/significant":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    size = int((qs.get("size") or ["10"])[0])
                    mdc = int((qs.get("min_doc_count") or ["3"])[0])
                    rows = service.significant(q, size=size, min_doc_count=mdc)
                    return self._json(200, {"query": q, "terms": rows})
                if u.path == "/api/facets":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    by = (qs.get("by") or ["lang"])[0]
                    if by not in ("lang", "repo"):
                        return self._json(400, {"error": "by must be lang|repo"})
                    rows = service.facets(q, by=by)
                    return self._json(200, {"query": q, "by": by, "buckets": rows})
                if u.path == "/api/grep":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    limit = int((qs.get("limit") or ["100"])[0])
                    return self._json(200, service.grep(q, limit=limit))
                if u.path == "/api/suggest":
                    p = (qs.get("prefix") or qs.get("q") or [""])[0]
                    if not p:
                        return self._json(400, {"error": "missing prefix"})
                    k = int((qs.get("k") or ["10"])[0])
                    return self._json(
                        200, {"prefix": p, "suggestions": service.suggest(p, k=k)}
                    )
                if u.path == "/api/didyoumean":
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    k = int((qs.get("k") or ["5"])[0])
                    dist = int((qs.get("dist") or ["2"])[0])
                    return self._json(
                        200,
                        {"q": q, "suggestions": service.didyoumean(q, k=k, dist=dist)},
                    )
                if u.path == "/api/analyze":
                    text = (qs.get("text") or qs.get("q") or [""])[0]
                    if not text:
                        return self._json(400, {"error": "missing text"})
                    return self._json(200, service.analyze(text))
                if u.path == "/api/stats":
                    return self._json(200, service.stats())
                if public_dir and not u.path.startswith("/api/"):
                    return self._static(u.path)
                return self._json(404, {"error": "unknown endpoint"})
            except ValueError as e:  # malformed params -> client error
                return self._json(400, {"error": str(e)})
            except Exception as e:  # surface errors as JSON, keep serving
                return self._json(500, {"error": str(e)})

        def do_POST(self):
            u = urlparse(self.path)
            try:
                ln = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(ln) or b"{}"
                if u.path == "/api/_msearch":
                    return self._json(200, service.es_msearch(raw))
                try:
                    body = json.loads(raw)
                except json.JSONDecodeError:
                    return self._json(400, {"error": "invalid JSON body"})
                if u.path == "/api/_search":
                    qs = parse_qs(u.query)
                    if qs.get("scroll"):
                        return self._json(
                            200, service.es_scroll_open(body, qs["scroll"][0])
                        )
                    return self._json(200, service.es_search(body))
                if u.path == "/api/_search/scroll":
                    return self._json(200, service.es_scroll_next(body))
                if u.path == "/api/_mget":
                    return self._json(200, service.es_mget(body))
                if u.path == "/api/_rank_eval":
                    return self._json(200, service.es_rank_eval(body))
                if u.path == "/api/_validate":
                    return self._json(200, service.es_validate(body))
                if u.path == "/api/percolate":
                    return self._json(200, service.percolate_body(body))
                if u.path == "/api/hybrid":
                    q, v = body.get("q"), body.get("v")
                    if not q or not isinstance(v, list) or not v:
                        return self._json(400, {"error": "missing q or v"})
                    return self._json(
                        200,
                        {
                            "query": q,
                            "hits": service.hybrid(
                                str(q),
                                v,
                                k=int(body.get("k", 10)),
                                window=int(body.get("window", 20)),
                                n_probe=int(body.get("n_probe", 4)),
                            ),
                        },
                    )
                if u.path == "/api/search:batch":
                    queries = body.get("queries")
                    if not isinstance(queries, list) or not queries:
                        return self._json(400, {"error": "missing queries"})
                    return self._json(200, {"results": service.search_batch(queries)})
                if u.path == "/api/ann:batch":
                    queries = body.get("queries")
                    if not isinstance(queries, list) or not queries:
                        return self._json(400, {"error": "missing queries"})
                    return self._json(
                        200,
                        {
                            "results": service.ann_batch(
                                queries,
                                k=int(body.get("k", 10)),
                                n_probe=int(body.get("n_probe", 4)),
                            )
                        },
                    )
                return self._json(404, {"error": "unknown endpoint"})
            except ValueError as e:  # malformed entries -> client error
                return self._json(400, {"error": str(e)})
            except Exception as e:
                return self._json(500, {"error": str(e)})

        def do_DELETE(self):
            u = urlparse(self.path)
            try:
                ln = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(ln) or b"{}"
                try:
                    body = json.loads(raw)
                except json.JSONDecodeError:
                    return self._json(400, {"error": "invalid JSON body"})
                if u.path == "/api/_search/scroll":
                    return self._json(200, service.es_scroll_clear(body))
                return self._json(404, {"error": "unknown endpoint"})
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:
                return self._json(500, {"error": str(e)})

    return Handler


def serve(
    service: SearchService, port: int = 8080, public_dir: str | None = None
) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(service, public_dir=public_dir)
    )
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--index", default=None)
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--geo-index", default=None, help="geo_index_write store for /api/reverse")
    ap.add_argument("--geo-cell-deg", type=float, default=20.0)
    ap.add_argument(
        "--ann-index", default=None,
        help="ivf_store_write / ivf_index_write store for POST /api/ann:batch",
    )
    ap.add_argument(
        "--docs", default=None,
        help="sf dir holding documents.parquet, enables GET /api/grep",
    )
    ap.add_argument(
        "--public",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "public"),
        help="static demo UI dir (empty string disables)",
    )
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    from ariadna_spark.config import load_config, resolve

    cfg = load_config(args.config)
    index_dir = resolve(args.index, cfg, "out_dir")
    if not index_dir:
        ap.error("--index required (flag, config file, or ARIADNA_OUT_DIR)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ariadna-serve").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    service = SearchService(
        spark,
        index_dir,
        build_id=args.build_id,
        geo_dir=args.geo_index,
        geo_cell_deg=args.geo_cell_deg,
        ann_dir=args.ann_index,
        docs_dir=args.docs,
    )
    httpd = serve(service, args.port, public_dir=args.public or None)
    print(json.dumps({"serving": True, "port": args.port, **service.stats()}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
