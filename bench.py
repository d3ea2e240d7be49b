"""Benchmark harness (SURVEY.md M7, driver contract).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  1. full index build (tokenize -> stats -> salted postings -> segments
     with manifest) — reported as docs/sec and postings/sec,
  2. the reference query set, top-k BM25 via block-max WAND over the
     compressed segments — reported per-query and as p50,
  3. headline auxiliary operators (exact dedup scan, minhash signatures,
     embedding cosine top-k).

Prints exactly ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., plus informational extras}

With --scaling, additionally runs the index build at local[8] and
local[32] on the same input and reports throughput at both plus
efficiency = T(32)/(4*T(8)) — the in-sandbox stand-in for the north
rule's N vs 4N executor scaling (no real cluster here).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _fast_tmp(prefix: str) -> str:
    """Bench artifacts on tmpfs when available: the sandbox's ext4 virtual
    disk serializes under concurrent writers and would corrupt the
    parallelism measurement (a real deployment writes segments to
    per-node NVMe / object storage)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)

BENCH_QUERIES = [
    ("q_merge_join", "merge join", 10),
    ("q_window", "window scan", 10),
    ("q_stopword", "the", 10),
    ("q_camel", "mergeJoin sortTable", 10),
    ("q_multi", "spark stream batch filter", 10),
    ("q_k100", "data table row", 100),
]


def _mk_spark(cores: int, app: str):
    from ariadna_spark.session import get_spark

    return get_spark(app, cores=cores)


def run_build(spark, sf_dir: str, out_dir: str, build_id: str) -> dict:
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.sources.segments import build_index

    docs = load_docs(spark, sf_dir)
    t0 = time.monotonic()
    manifest = build_index(spark, docs, out_dir, build_id=build_id, n_buckets=16)
    wall = time.monotonic() - t0
    n_docs = manifest["stats"]["N"]
    return {
        "build_sec": wall,
        "docs": n_docs,
        "docs_per_sec": n_docs / wall,
        "postings": manifest["total_postings"],
        "postings_per_sec": manifest["total_postings"] / wall,
        "bytes_compressed": manifest["total_bytes_compressed"],
    }


def run_queries(spark, out_dir: str) -> dict:
    from ariadna_spark.operators.wand import IndexReader

    reader = IndexReader(spark, out_dir)
    timings = {}
    for name, q, k in BENCH_QUERIES:
        t0 = time.monotonic()
        reader.topk(q, k).collect()
        timings[name] = round(time.monotonic() - t0, 4)
    # the whole set as ONE Spark job (production batch-scoring shape)
    t0 = time.monotonic()
    reader.topk_many([(i, q, k) for i, (_, q, k) in enumerate(BENCH_QUERIES)]).collect()
    timings["q_batch_all"] = round(time.monotonic() - t0, 4)
    # steady-state warm-reader latency (the serve.py regime): best of 3
    # repeats of one query — informational, not part of the summed total
    warm = []
    for _ in range(3):
        t0 = time.monotonic()
        reader.topk("merge join", 10).collect()
        warm.append(time.monotonic() - t0)
    timings["_warm_min"] = round(min(warm), 4)
    # edge-ngram prefix path (TakeOrdered expansion + OR-scored top-k) —
    # informational for the same total-comparability reason
    t0 = time.monotonic()
    reader.prefix_topk("sc", 10).collect()
    timings["_prefix"] = round(time.monotonic() - t0, 4)
    # exact-phrase path (positions decode + adjacency in-kernel) —
    # informational, outside the summed total like warm/prefix
    t0 = time.monotonic()
    reader.phrase_topk("merge join", 10).collect()
    timings["_phrase"] = round(time.monotonic() - t0, 4)
    # stop-word phrase (VERDICT r3 #5 done-criterion): the two-pass decode
    # must keep a "the <rare>" phrase within ~2x of the plain stop-word
    # match query, because the stop word's positions only decode where the
    # rare term's postings left a candidate
    t0 = time.monotonic()
    reader.phrase_topk("the merge", 10).collect()
    timings["_phrase_stopword"] = round(time.monotonic() - t0, 4)
    # combined-bound multi-field WAND (VERDICT r4 #1 done-criterion): two
    # fields (the same physical index read twice with independent boosts
    # — 2x the blocks, one combined kernel) should land within ~1.5x of
    # the single-field q_merge_join wall, because the summed per-field
    # block-max bound prunes instead of the former exhaustive scores()
    from ariadna_spark.operators.wand import multifield_topk

    t0 = time.monotonic()
    multifield_topk([(reader, 1.0), (reader, 2.0)], "merge join", 10).collect()
    timings["_multifield2"] = round(time.monotonic() - t0, 4)
    # 3-field variant (VERDICT r5 #4: evidence beyond 2 fields) — the
    # combined bound is the weighted sum over N fields' block-max
    # metadata, so cost should grow roughly with the extra blocks read
    # (~1.5x the 2-field row), not explode
    t0 = time.monotonic()
    multifield_topk(
        [(reader, 1.0), (reader, 2.0), (reader, 1.5)], "merge join", 10
    ).collect()
    timings["_multifield3"] = round(time.monotonic() - t0, 4)
    return timings


def run_search_extras(spark, sf_dir: str, out_dir: str) -> dict:
    """Round-5 search-surface extensions — informational (outside the
    summed total for cross-round comparability): fuzzy expansion + WAND,
    snippeted top-k with the O(k) pushed winner fetch, more-like-this."""
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.operators.wand import IndexReader

    docs = load_docs(spark, sf_dir)
    reader = IndexReader(spark, out_dir)
    out = {}
    t0 = time.monotonic()
    reader.fuzzy_topk("mrege vectr", 10, max_dist=2).collect()
    out["query_fuzzy_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    reader.highlight_topk(docs, "merge join", 10, window=5).collect()
    out["query_highlight_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    reader.more_like_this(docs, 42, 10).collect()
    out["query_mlt_sec"] = round(time.monotonic() - t0, 4)
    # composed bool query (must/should/must_not + msm): the conjunctive
    # stride rule should keep this near the plain match wall even though
    # it reads three clauses' blocks
    t0 = time.monotonic()
    reader.bool_topk("table scan", "filter group merge", "window", msm=1, k=10).collect()
    out["query_bool_sec"] = round(time.monotonic() - t0, 4)
    # filter context: lang-filtered top-k (allow ids ride the rid shuffle;
    # strides without allowed docs never decode)
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    reader.filtered_topk("merge join", F.col("lang") == "fr", 10).collect()
    out["query_filtered_sec"] = round(time.monotonic() - t0, 4)
    # search_after page 2 (cursor cut in-kernel; a pruned top-k job, not
    # a from+size over-fetch)
    p1 = reader.topk("merge join", 10).collect()
    t0 = time.monotonic()
    reader.topk("merge join", 10, after=(p1[-1]["score"], p1[-1]["doc_id"])).collect()
    out["query_page2_sec"] = round(time.monotonic() - t0, 4)
    # aggregation suite: one candidate pass + one GROUPING SETS shuffle
    t0 = time.monotonic()
    reader.match_aggs("merge join").collect()
    out["query_aggs_sec"] = round(time.monotonic() - t0, 4)
    # suggest surface: completion off the pruned edge-ngram buckets;
    # did-you-mean off one pruned vocabulary scan
    t0 = time.monotonic()
    reader.suggest_terms("sc", size=10).collect()
    out["query_suggest_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    reader.suggest_corrections("smal", size=5).collect()
    out["query_didyoumean_sec"] = round(time.monotonic() - t0, 4)
    return out


def run_result_shaping(spark, sf_dir: str, out_dir: str) -> dict:
    """Round-6 result-shaping verbs — informational (outside the summed
    total): collapse and top_hits are exhaustive-candidate passes (the
    per-group cut can't prune early) so their cost class is match_aggs,
    NOT the pruned top-k; dis_max reads the union of its clauses' blocks
    once; query_string compiles onto bool_topk; rank_eval is one
    topk_many batch over the whole request set."""
    from pyspark.sql import functions as F

    from ariadna_spark.operators.ranking import (
        collapse_topk,
        dis_max_topk,
        rank_eval,
        top_hits,
    )
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.query_dsl import compile_query_string

    reader = IndexReader(spark, out_dir)
    out = {}
    t0 = time.monotonic()
    collapse_topk(reader, "merge join", "repo", 10).collect()
    out["query_collapse_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    top_hits(reader, "merge join", "lang", 3).collect()
    out["query_top_hits_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    dis_max_topk(reader, ["merge join", "window scan", "table group"], 0.3, 10).collect()
    out["query_dis_max_sec"] = round(time.monotonic() - t0, 4)
    t0 = time.monotonic()
    compile_query_string(reader, "+table scan -window lang:fr", k=10).collect()
    out["query_query_string_sec"] = round(time.monotonic() - t0, 4)
    reqs = [(0, "merge join"), (1, "window scan"), (2, "table group")]
    ratings = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)], "query_id long, doc_id long, rating double"
    )
    t0 = time.monotonic()
    rank_eval(reader, reqs, ratings, k=5).collect()
    out["query_rank_eval_sec"] = round(time.monotonic() - t0, 4)
    return out


def run_aux(spark, sf_dir: str) -> dict:
    from ariadna_spark import queries as Q

    timings = {}
    for name in ("dedup_exact", "minhash_signatures", "embedding_topk"):
        t0 = time.monotonic()
        Q.QUERIES[name](spark, sf_dir).collect()
        timings[f"aux_{name}"] = round(time.monotonic() - t0, 4)
    return timings


def run_regex(spark, sf_dir: str, out_dir: str) -> dict:
    """Accelerated-grep evidence (VERDICT r3 #1 done-criterion): indexed
    vs full-scan wall time on the gate pattern, plus candidate-set size vs
    corpus size — the fraction of the corpus the regexp actually touches."""
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.operators.text import regex_search, regex_search_indexed
    from ariadna_spark.operators.wand import IndexReader

    docs = load_docs(spark, sf_dir)
    reader = IndexReader(spark, out_dir)
    out = {"regex_corpus_docs": docs.count()}
    # two patterns: the correctness-gate one ('scan' is a Zipf-head token,
    # worst case for pruning) and a selective one ('dup' hits ~5% of the
    # corpus — the common grep shape, where the semi-join pays off)
    from ariadna_spark.plans import physical_plan

    for tag, pat, lit in (("gate", r"scan[a-z]*", "scan"), ("rare", r"dup[a-z]*", "dup")):
        fast_df = regex_search_indexed(docs, pat, reader)
        # r5 selectivity gate: a Zipf-head literal routes to the full scan
        # (prefilter_used False) — indexed wall ~= full-scan wall by design
        prefilter_used = "LeftSemi" in physical_plan(fast_df)
        t0 = time.monotonic()
        n_hits = fast_df.count()
        t_fast = time.monotonic() - t0
        t0 = time.monotonic()
        regex_search(docs, pat).count()
        t_full = time.monotonic() - t0
        n_cand = reader.candidate_doc_ids(reader.terms_containing(lit) or []).count()
        out[f"regex_{tag}_indexed_sec"] = round(t_fast, 4)
        out[f"regex_{tag}_fullscan_sec"] = round(t_full, 4)
        out[f"regex_{tag}_hits"] = n_hits
        out[f"regex_{tag}_candidates"] = n_cand
        out[f"regex_{tag}_prefilter_used"] = prefilter_used
    return out


def stress_run(n_docs: int = 1_000_000, cores: int = None) -> dict:
    """Scale-stress the training-data operators (VERDICT r3 #7) on a
    1M-doc synthetic corpus: sliding-window chunking (map-side explode),
    bigram collocations (the Zipf-head-SQUARED groupBy — the skew
    question), and the composed prepare_training_set graph (dedup ->
    scrub -> chunk -> gate -> split). Corpus is written once to tmpfs and
    all three run in one fresh session."""
    from pyspark.sql import functions as F

    from ariadna_spark.corpus import synth_code_corpus_distributed
    from ariadna_spark.operators.text import chunk_documents, collocations
    from ariadna_spark.pipeline import prepare_training_set

    cores = cores or CPUS
    spark = _mk_spark(cores, "ariadna-bench-stress")
    corpus_dir = _fast_tmp("stress_corpus_")
    out = {"stress_docs": n_docs}
    try:
        synth_code_corpus_distributed(spark, n_docs).write.mode("overwrite").parquet(
            os.path.join(corpus_dir, "docs")
        )
        docs = spark.read.parquet(os.path.join(corpus_dir, "docs"))

        t0 = time.monotonic()
        n_chunks = chunk_documents(docs).count()
        out["stress_chunk_sec"] = round(time.monotonic() - t0, 2)
        out["stress_chunks"] = n_chunks

        t0 = time.monotonic()
        n_big = collocations(docs, min_count=50).count()
        out["stress_collocations_sec"] = round(time.monotonic() - t0, 2)
        out["stress_bigrams"] = n_big

        t0 = time.monotonic()
        n_rows = prepare_training_set(docs, min_tokens=4).count()
        out["stress_pipeline_sec"] = round(time.monotonic() - t0, 2)
        out["stress_pipeline_rows"] = n_rows

        # round-5b quality operators at 1M docs: both are doc-scoped
        # aggregations (repetition) or one bigram-domain LM + two joins
        # (perplexity) — no corpus-level hot key
        from ariadna_spark.operators.text import perplexity_scores, repetition_metrics

        t0 = time.monotonic()
        out["stress_repetition_rows"] = repetition_metrics(docs).count()
        out["stress_repetition_sec"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        out["stress_perplexity_rows"] = perplexity_scores(docs).count()
        out["stress_perplexity_sec"] = round(time.monotonic() - t0, 2)

        # round-6: the perplexity SCORING shapes head-to-head, then the
        # composed pipeline WITH the gate on. Sample-LM = the default
        # production shape (deterministic ~2% hash-sample, (w, nx)
        # aggregates broadcast, zero corpus-side shuffle for the scoring
        # join); the self-trained row above is the two-corpus-exchange
        # comparison point. max_nll=3.5 ≈ p95 of the synthetic corpus'
        # nll_r — a realistic drop-the-tail gate.
        from ariadna_spark.pipeline import lm_sample

        t0 = time.monotonic()
        out["stress_perplexity_sample_rows"] = perplexity_scores(
            docs, lm_docs=lm_sample(docs, 20)
        ).count()
        out["stress_perplexity_sample_sec"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        n_gated = prepare_training_set(docs, min_tokens=4, max_nll=3.5).count()
        out["stress_pipeline_gated_sec"] = round(time.monotonic() - t0, 2)
        out["stress_pipeline_gated_rows"] = n_gated

        # round-6: cross-document duplicated-span detection — the
        # heaviest text op by shuffle volume (every n-token window rides
        # the exchange as a string key; collocations cost class). Two
        # tokenize passes by design: the duplicated-ngram aggregate is
        # checkpointed, the corpus-sized window table never is.
        from ariadna_spark.operators.text import duplicate_spans

        t0 = time.monotonic()
        ds = duplicate_spans(docs, n=8)
        agg = ds.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("dup_windows") > 0).cast("long")).alias("docs_with_dups"),
        ).collect()[0]
        out["stress_dupspan_sec"] = round(time.monotonic() - t0, 2)
        out["stress_dupspan_docs"] = int(agg["docs"])
        out["stress_dupspan_docs_with_dups"] = int(agg["docs_with_dups"])
        return out
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


def query_stress_run(n_docs: int = 1_000_000, cores: int = None) -> dict:
    """Query-path scale stress: build a 1M-doc index once, then measure
    the round-5 query surface's warm latencies at that scale — match,
    search_after page 2, filter context, composed bool, field-sorted,
    aggregation suite, count. The point is the SHAPE: every path must
    stay a pruned/pushed plan whose latency tracks the candidate set,
    not the corpus size."""
    from pyspark.sql import functions as F

    from ariadna_spark.corpus import synth_code_corpus_distributed
    from ariadna_spark.operators.wand import IndexReader
    from ariadna_spark.sources.segments import build_index

    cores = cores or CPUS
    spark = _mk_spark(cores, "ariadna-bench-qstress")
    work = _fast_tmp("qstress_")
    out = {"qstress_docs": n_docs}
    try:
        corpus = os.path.join(work, "docs")
        synth_code_corpus_distributed(spark, n_docs).write.mode("overwrite").parquet(corpus)
        docs = spark.read.parquet(corpus)
        idx = os.path.join(work, "idx")
        t0 = time.monotonic()
        build_index(spark, docs, idx, build_id="qs")
        out["qstress_build_sec"] = round(time.monotonic() - t0, 2)
        reader = IndexReader(spark, idx)
        q = "binary search hashMap"

        def timed(tag, fn):
            t0 = time.monotonic()
            fn()
            out[f"qstress_{tag}_sec"] = round(time.monotonic() - t0, 4)

        timed("match", lambda: reader.topk(q, 10).collect())
        p1 = reader.topk(q, 10).collect()
        timed(
            "page2",
            lambda: reader.topk(q, 10, after=(p1[-1]["score"], p1[-1]["doc_id"])).collect(),
        )
        timed(
            "filtered",
            lambda: reader.filtered_topk(q, F.col("lang") == "go", 10).collect(),
        )
        timed(
            "bool",
            lambda: reader.bool_topk(
                "binary search", "result index", "foo", msm=1, k=10
            ).collect(),
        )
        timed(
            "sorted",
            lambda: reader.sorted_topk(q, "doc_len", asc=False, k=10).collect(),
        )
        timed("aggs", lambda: reader.match_aggs(q).collect())
        timed("count", lambda: reader.match_count(q).collect())
        out["qstress_count_docs"] = int(
            reader.match_count(q).collect()[0]["n_docs"]
        )
        # round-5b surface at 1M docs: suggest = one TakeOrdered
        # vocabulary job; phrase_prefix = expansion job + positional
        # shape; delete_by_query = docmap scan + candidate semi-join +
        # tombstone write, then a query over the masked store
        timed("suggest", lambda: reader.suggest_terms("bi", size=10).collect())
        timed(
            "didyoumean",
            lambda: reader.suggest_corrections("serach", size=5).collect(),
        )
        timed(
            "phrase_prefix",
            lambda: reader.phrase_prefix_topk("binary se", 10).collect(),
        )
        # round-6: the multi-job expansion/snippet paths whose sf0.1 cost
        # is job overhead — at 1M docs a latent full-vocab or full-corpus
        # cost would show here. fuzzy = ONE vocabulary scan for all
        # tokens; highlight/MLT re-read only k/1 docs via a pushed
        # IN-list (typo'd forms of warm corpus tokens: binary, result)
        timed(
            "fuzzy",
            lambda: reader.fuzzy_topk("binray resutl", 10, max_dist=2).collect(),
        )
        timed(
            "highlight",
            lambda: reader.highlight_topk(docs, q, 10, window=5).collect(),
        )
        timed("mlt", lambda: reader.more_like_this(docs, 42, 10).collect())
        # round-6 result-shaping verbs at 1M docs: collapse/top_hits are
        # exhaustive-candidate passes (cost ∝ matching docs, like aggs —
        # NOT corpus size: the docmap join and window shuffle move only
        # candidate rows); dis_max reads its clauses' union of blocks
        # once; rank_eval is one topk_many batch
        from ariadna_spark.operators.ranking import (
            collapse_topk,
            dis_max_topk,
            rank_eval,
            top_hits,
        )

        timed("collapse", lambda: collapse_topk(reader, q, "repo", 10).collect())
        timed("top_hits", lambda: top_hits(reader, q, "lang", 3).collect())
        timed(
            "dis_max",
            lambda: dis_max_topk(
                reader, ["binary search", "hashMap index"], 0.3, 10
            ).collect(),
        )
        _re_ratings = spark.createDataFrame(
            [(0, p1[0]["doc_id"], 2.0), (1, 42, 1.0)],
            "query_id long, doc_id long, rating double",
        )
        timed(
            "rank_eval",
            lambda: rank_eval(
                reader, [(0, q), (1, "binary search")], _re_ratings, k=10
            ).collect(),
        )
        # wildcard = one terms-table scan (vocabulary-sized, tiny next to
        # postings) + a disjunctive WAND over the expansion; rescore =
        # pruned top-window job + rid-filtered secondary decode — both
        # must track candidate/window size, not corpus size
        from ariadna_spark.operators.ranking import rescore_topk

        timed("wildcard", lambda: reader.wildcard_topk("*earch*", 10).collect())
        timed(
            "rescore",
            lambda: rescore_topk(
                reader, q, "binary search", window_size=50, k=10
            ).collect(),
        )
        from ariadna_spark.sources.segments import delete_by_query

        t0 = time.monotonic()
        res = delete_by_query(
            spark, idx, flt=(F.col("doc_id") % 1000 == 7), build_id="qsdel"
        )
        out["qstress_delete_sec"] = round(time.monotonic() - t0, 4)
        out["qstress_delete_docs"] = res["deleted"]
        masked = IndexReader(spark, idx)
        timed("match_after_delete", lambda: masked.topk(q, 10).collect())
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def _build_once(corpus_dir: str, cores: int) -> dict:
    """One cold measurement: fresh session, build, report. Invoked in a
    fresh subprocess per cluster size so JVM heap/GC state cannot leak
    between the two measurements (a shared JVM keeps the first launch's
    memory settings and accumulated garbage)."""
    from ariadna_spark.sources.segments import build_index

    spark = _mk_spark(cores, f"ariadna-bench-scale-{cores}")
    out = _fast_tmp(f"seg_scale_{cores}_")
    try:
        docs = spark.read.parquet(os.path.join(corpus_dir, "docs"))
        t0 = time.monotonic()
        manifest = build_index(spark, docs, out, build_id=f"s{cores}", n_buckets=16)
        wall = time.monotonic() - t0
        return {
            "cores": cores,
            "build_sec": wall,
            "docs_per_sec": manifest["stats"]["N"] / wall,
            "postings": manifest["total_postings"],
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def scaling_run(
    n_docs: int = 300_000,
    core_levels: tuple = (2, 8, 32),
    trials: int = 2,
    control: bool = False,
) -> dict:
    """Index build at local[8] vs local[32] over the SAME deterministic
    synthetic corpus (the in-sandbox stand-in for N vs 4N executors).

    The driver testdata is too small (500-5000 docs) to exercise
    parallelism — fixed Spark overhead would dominate and report false
    non-scaling — so this generates a counter-based deterministic corpus
    (corpus.synth_code_corpus_distributed) large enough that compute
    dominates, writes it once, and feeds the identical parquet to both
    cluster sizes. Efficiency = throughput(32) / (4 * throughput(8)).
    """
    from ariadna_spark.corpus import synth_code_corpus_distributed
    from ariadna_spark.sources.segments import build_index

    import subprocess

    corpus_dir = _fast_tmp("scale_corpus_")
    results = {}
    try:
        gen_cmd = (
            "import sys; sys.path.insert(0, %r); "
            "from ariadna_spark.session import get_spark; "
            "from ariadna_spark.corpus import synth_code_corpus_distributed; "
            "s = get_spark('scale-gen', cores=32); "
            "synth_code_corpus_distributed(s, %d).write.mode('overwrite').parquet(%r); "
            "s.stop()"
        ) % (os.path.dirname(os.path.abspath(__file__)), n_docs, os.path.join(corpus_dir, "docs"))
        subprocess.run([sys.executable, "-c", gen_cmd], check=True, capture_output=True)

        # best-of-N per level: the sandbox VM shows 1.5-2x run-to-run noise
        # (shared host); min wall time is the standard estimator for the
        # machine's true capability at each parallelism level.
        # Each level is OS-pinned to exactly `cores` CPUs (taskset): a bare
        # local[c] JVM free-rides on the other 30 cores through ParallelGC
        # worker threads, compression and IO — measured 96.9s pinned vs
        # 81.7s unpinned at local[2] — which would understate the honest
        # N-core executor and deflate the efficiency ratio.
        for cores in core_levels:
            best = None
            for _ in range(trials):
                cmd = (
                    "import sys, json; sys.path.insert(0, %r); "
                    "import bench; print('RESULT ' + json.dumps(bench._build_once(%r, %d)))"
                ) % (os.path.dirname(os.path.abspath(__file__)), corpus_dir, cores)
                argv = [sys.executable, "-c", cmd]
                if shutil.which("taskset"):
                    argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
                # GC worker threads sized to the emulated executor, like a
                # real c-core executor JVM (default = host cores = 32,
                # which thrashes when pinned to 2 CPUs)
                env = dict(os.environ)
                env["SPARK_GC_OPTS"] = (
                    f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(cores, 2)}"
                )
                proc = subprocess.run(
                    argv, check=True, capture_output=True, text=True, env=env
                )
                line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
                r = json.loads(line[len("RESULT "):])
                if best is None or r["build_sec"] < best["build_sec"]:
                    best = r
            results[cores] = best
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    out = {"n_docs": n_docs, "trials": trials, "estimator": "best-of-N wall time"}
    for c in core_levels:
        out[f"throughput_local{c}_docs_sec"] = round(results[c]["docs_per_sec"], 1)
        out[f"build_sec_local{c}"] = round(results[c]["build_sec"], 2)
    # efficiency between each N -> 4N pair present in the ladder
    for lo, hi in zip(core_levels, core_levels[1:]):
        if hi == lo * 4:
            eff = results[hi]["docs_per_sec"] / (4.0 * results[lo]["docs_per_sec"])
            out[f"scaling_efficiency_{lo}to{hi}"] = round(eff, 3)
    if control:
        # same-window memory-streaming ceiling (VERDICT r4 #5): divide the
        # pipeline rung by what ANY bandwidth-bound job reaches in this
        # window — quantifies quiet-host inflation of the 2-core baseline
        ctl = stream_control(core_levels=core_levels, trials=trials)
        out.update(ctl)
        for lo, hi in zip(core_levels, core_levels[1:]):
            se = f"stream_eff_{lo}to{hi}"
            pe = f"scaling_efficiency_{lo}to{hi}"
            if se in out and pe in out:
                out[pe + "_normalized"] = round(out[pe] / out[se], 3)
    return out


def _stream_worker(args) -> float:
    """One streaming worker: fixed-byte pass over a private array (read +
    write traffic via in-place assignment, plus a reduction read) —
    returns its wall seconds."""
    import numpy as np

    mb, passes = args
    n = mb * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.monotonic()
    acc = 0.0
    for _ in range(passes):
        b[:] = a  # streaming read+write
        acc += float(b[::4096].sum())  # touch result, defeat elision
    return time.monotonic() - t0


def stream_control(
    core_levels: tuple = (2, 8), trials: int = 3, mb: int = 256, passes: int = 24
) -> dict:
    """Memory-streaming control measured in the SAME window as the ladder
    (VERDICT r4 #5): the hardware ceiling a bandwidth-bound job can reach
    on this box at each pinned core count, so the quiet-host inflation of
    the 2-core baseline is MEASURED, not argued. Each level runs `cores`
    concurrent workers inside one taskset-pinned subprocess (identical
    pinning to scaling_run); aggregate GB/s = cores x bytes / wall.
    eff_normalized in the ladder output divides the pipeline rung by this
    control's rung — 1.0 means 'scales as well as any bandwidth-bound
    job can here'."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    out: dict = {"control_mb": mb, "control_passes": passes, "control_trials": trials}
    gb_per_worker = mb * passes * 2 / 1024.0  # read + write traffic
    for cores in core_levels:
        best = None
        for _ in range(trials):
            cmd = (
                "import sys, json; sys.path.insert(0, %r); "
                "import bench; from multiprocessing import Pool; "
                "p = Pool(%d); "
                "walls = p.map(bench._stream_worker, [(%d, %d)] * %d); "
                "print('RESULT ' + json.dumps(max(walls)))"
            ) % (here, cores, mb, passes, cores)
            argv = [sys.executable, "-c", cmd]
            if shutil.which("taskset"):
                argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
            proc = subprocess.run(argv, check=True, capture_output=True, text=True)
            line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")][-1]
            wall = float(line[len("RESULT "):])
            gbps = cores * gb_per_worker / wall
            if best is None or gbps > best:
                best = gbps
        out[f"stream_gbps_{cores}c"] = round(best, 2)
    for lo, hi in zip(core_levels, core_levels[1:]):
        if hi == lo * 4:
            out[f"stream_eff_{lo}to{hi}"] = round(
                out[f"stream_gbps_{hi}c"] / (4.0 * out[f"stream_gbps_{lo}c"]), 3
            )
    return out


def _build_shard(corpus_dir: str, cores: int, shard: int, n_shards: int, out: str) -> dict:
    """One emulated executor: a pinned 8-core JVM building its shard of the
    corpus as an independent segment (the production segment model — the
    reader merges segments with results rank-identical to a monolithic
    build, proven in tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    from ariadna_spark.sources.segments import build_index

    spark = _mk_spark(cores, f"ariadna-exec-{shard}")
    try:
        docs = spark.read.parquet(os.path.join(corpus_dir, "docs"))
        if n_shards > 1:
            docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_shards)) == shard)
        t0 = time.monotonic()
        manifest = build_index(spark, docs, out, build_id=f"shard{shard}", n_buckets=16)
        return {"shard": shard, "build_sec": time.monotonic() - t0, "docs": manifest["stats"]["N"]}
    finally:
        spark.stop()


def executor_scaling_run(n_docs: int = 800_000, exec_cores: int = 8, trials: int = 2) -> dict:
    """N vs 4N EXECUTORS, emulated faithfully: 1 pinned 8-core JVM builds
    the whole corpus as one segment vs 4 concurrently-running pinned
    8-core JVMs each building a quarter as its own segment (separate JVM
    heaps, GCs and python workers — exactly what distinguishes executors
    from threads; only the box's memory bandwidth stays shared, which a
    real cluster would also multiply). Efficiency = T(1 exec)/(4 * T(4 exec)).
    """
    import subprocess

    corpus_dir = _fast_tmp("exec_scale_")
    try:
        gen_cmd = (
            "import sys; sys.path.insert(0, %r); "
            "from ariadna_spark.session import get_spark; "
            "from ariadna_spark.corpus import synth_code_corpus_distributed; "
            "s = get_spark('exec-gen', cores=32); "
            "synth_code_corpus_distributed(s, %d).write.mode('overwrite').parquet(%r); "
            "s.stop()"
        ) % (os.path.dirname(os.path.abspath(__file__)), n_docs, os.path.join(corpus_dir, "docs"))
        subprocess.run([sys.executable, "-c", gen_cmd], check=True, capture_output=True)

        def shard_cmd(cpu_lo: int, shard: int, n_shards: int, out: str) -> list[str]:
            code = (
                "import sys, json; sys.path.insert(0, %r); import bench; "
                "print('RESULT ' + json.dumps(bench._build_shard(%r, %d, %d, %d, %r)))"
            ) % (
                os.path.dirname(os.path.abspath(__file__)),
                corpus_dir, exec_cores, shard, n_shards, out,
            )
            argv = [sys.executable, "-c", code]
            if shutil.which("taskset"):
                argv = ["taskset", "-c", f"{cpu_lo}-{cpu_lo + exec_cores - 1}"] + argv
            env = dict(os.environ)
            env["SPARK_GC_OPTS"] = f"-XX:+UseParallelGC -XX:ParallelGCThreads={exec_cores}"
            return argv, env

        best1 = best4 = None
        for _ in range(trials):
            # 1 executor: whole corpus, one segment
            out1 = _fast_tmp("exec1_")
            argv, env = shard_cmd(0, 0, 1, out1)
            t0 = time.monotonic()
            subprocess.run(argv, check=True, capture_output=True, env=env)
            t1 = time.monotonic() - t0
            shutil.rmtree(out1, ignore_errors=True)
            best1 = t1 if best1 is None else min(best1, t1)

            # 4 executors: four shards, four concurrent pinned JVMs
            outs = [_fast_tmp(f"exec4_{i}_") for i in range(4)]
            procs = []
            t0 = time.monotonic()
            for i in range(4):
                argv, env = shard_cmd(i * exec_cores, i, 4, outs[i])
                procs.append(subprocess.Popen(argv, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env))
            for p in procs:
                rc = p.wait()
                if rc != 0:
                    raise RuntimeError(f"shard build failed rc={rc}")
            t4 = time.monotonic() - t0
            for o in outs:
                shutil.rmtree(o, ignore_errors=True)
            best4 = t4 if best4 is None else min(best4, t4)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    return {
        "n_docs": n_docs,
        "exec_cores": exec_cores,
        "trials": trials,
        "build_sec_1exec": round(best1, 2),
        "build_sec_4exec": round(best4, 2),
        "throughput_1exec_docs_sec": round(n_docs / best1, 1),
        "throughput_4exec_docs_sec": round(n_docs / best4, 1),
        "executor_scaling_efficiency": round(best1 / (4.0 * best4), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="also run the core-scaling ladder")
    ap.add_argument("--scaling-control", action="store_true",
                    help="with --scaling: same-window memory-streaming control + normalized efficiency")
    ap.add_argument("--executor-scaling", action="store_true",
                    help="also run the 1-vs-4 pinned-executor-JVM comparison")
    ap.add_argument("--scaling-docs", type=int, default=300_000, help="synthetic corpus size for --scaling")
    ap.add_argument("--executor-scaling-docs", type=int, default=800_000,
                    help="corpus size for --executor-scaling (own flag so the "
                    "--scaling-docs default never silently shrinks this run)")
    ap.add_argument("--stress", action="store_true",
                    help="also scale-stress the training-data operators")
    ap.add_argument("--stress-docs", type=int, default=1_000_000)
    ap.add_argument("--query-stress", action="store_true",
                    help="also scale-stress the query surface at --stress-docs")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = _mk_spark(CPUS, "ariadna-bench")
    out_dir = _fast_tmp("seg_bench_")
    try:
        build = run_build(spark, args.sf_dir, out_dir, build_id="bench")
        qt = run_queries(spark, out_dir)
        aux = run_aux(spark, args.sf_dir)
        extras = run_search_extras(spark, args.sf_dir, out_dir)
        shaping = run_result_shaping(spark, args.sf_dir, out_dir)
        regex = run_regex(spark, args.sf_dir, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()

    warm_min = qt.pop("_warm_min", None)
    prefix_sec = qt.pop("_prefix", None)
    phrase_sec = qt.pop("_phrase", None)
    phrase_stop_sec = qt.pop("_phrase_stopword", None)
    queries = {"index_build": round(build["build_sec"], 4), **qt, **aux}
    query_p50 = statistics.median(qt.values())
    total = sum(queries.values())
    result = {
        "metric": "index-build + BM25 WAND query set, end-to-end wall sec",
        "value": round(total, 4),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(build["docs_per_sec"], 1),
        "postings_per_sec": round(build["postings_per_sec"], 1),
        "bytes_compressed": build["bytes_compressed"],
        "query_p50_sec": round(query_p50, 4),
        "query_warm_min_sec": warm_min,
        "query_prefix_sec": prefix_sec,
        "query_phrase_sec": phrase_sec,
        "query_phrase_stopword_sec": phrase_stop_sec,
        **extras,
        **shaping,
        **regex,
        "cpus": CPUS,
    }
    if args.scaling:
        result["scaling"] = scaling_run(
            n_docs=args.scaling_docs, control=args.scaling_control
        )
    if args.executor_scaling:
        result["executor_scaling"] = executor_scaling_run(n_docs=args.executor_scaling_docs)
    if args.stress:
        result["stress"] = stress_run(n_docs=args.stress_docs)
    if args.query_stress:
        result["query_stress"] = query_stress_run(n_docs=args.stress_docs)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
