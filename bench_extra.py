"""Round-7 auxiliary benchmarks (bench.py is FROZEN for measurement; the
extra evidence cited in OPTIMIZATION_r07.md is reproducible from here).

Subcommands:

  build-trace [--sf-dir D] [--runs N]
      Full index build with the ARIADNA_TRACE phase breakdown
      (tokenize+ckpt / scalars / terms / ngrams / docmap / hot / postings
      batch), N repeats, reports each run's phases + total.

  tokenize-decompose [--sf-dir D]
      Guide §1.4 noop-sink isolation of the tokenize phase: the docs
      repartition shuffle alone, the tokenize kernel cold and warm, and
      the parquet checkpoint write — separates worker cold-start from
      compute from commit cost.

  warm-queries [--sf-dir D] [--repeats N]
      Builds one index, then min/median warm latency for the main verb
      families on a quiet reader (the steady-state serve regime).

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
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


def _tmp(prefix: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def build_trace(sf_dir: str, runs: int) -> dict:
    os.environ["ARIADNA_TRACE"] = "1"
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.session import get_spark
    from ariadna_spark.sources.segments import build_index

    totals = []
    for i in range(runs):
        spark = get_spark(f"bx-trace-{i}", cores=CPUS)
        out = _tmp("bx_trace_")
        try:
            docs = load_docs(spark, sf_dir)
            t0 = time.monotonic()
            build_index(spark, docs, out, build_id="t", n_buckets=16)
            totals.append(round(time.monotonic() - t0, 2))
        finally:
            shutil.rmtree(out, ignore_errors=True)
            spark.stop()
    return {"build_totals_sec": totals, "min": min(totals)}


def tokenize_decompose(sf_dir: str) -> dict:
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.session import get_spark
    from ariadna_spark.stats import term_freqs_dl

    spark = get_spark("bx-decomp", cores=CPUS)
    out = {}
    try:
        docs = load_docs(spark, sf_dir).repartition(CPUS * 2)

        def t(tag, fn):
            t0 = time.monotonic()
            fn()
            out[tag] = round(time.monotonic() - t0, 2)

        noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
        t("read_shuffle_noop", lambda: noop(docs))
        t("tokenize_noop_cold", lambda: noop(term_freqs_dl(docs)))
        t("tokenize_noop_warm", lambda: noop(term_freqs_dl(docs)))
        d = _tmp("bx_tf_")
        t("tokenize_parquet", lambda: term_freqs_dl(docs).write.mode("overwrite").parquet(d))
        shutil.rmtree(d, ignore_errors=True)
    finally:
        spark.stop()
    return out


def warm_queries(sf_dir: str, repeats: int) -> dict:
    from ariadna_spark.corpus import load_docs
    from ariadna_spark.operators.wand import IndexReader, multifield_topk
    from ariadna_spark.session import get_spark
    from ariadna_spark.sources.segments import build_index

    spark = get_spark("bx-warm", cores=CPUS)
    idx = _tmp("bx_idx_")
    out = {}
    try:
        docs = load_docs(spark, sf_dir)
        build_index(spark, docs, idx, build_id="w", n_buckets=16)
        reader = IndexReader(spark, idx)

        cases = {
            "topk": lambda: reader.topk("merge join", 10).collect(),
            "topk_k100": lambda: reader.topk("data table row", 100).collect(),
            "batch6": lambda: reader.topk_many(
                [(i, q, 10) for i, q in enumerate(
                    ["merge join", "window scan", "the",
                     "mergeJoin sortTable", "spark stream batch filter",
                     "data table row"])]).collect(),
            "fuzzy": lambda: reader.fuzzy_topk("mrege vectr", 10, max_dist=2).collect(),
            "highlight": lambda: reader.highlight_topk(docs, "merge join", 10).collect(),
            "aggs": lambda: reader.match_aggs("merge join").collect(),
            "multifield2": lambda: multifield_topk(
                [(reader, 1.0), (reader, 2.0)], "merge join", 10).collect(),
        }
        for tag, fn in cases.items():
            fn()  # warm
            walls = []
            for _ in range(repeats):
                t0 = time.monotonic()
                fn()
                walls.append(time.monotonic() - t0)
            out[tag] = {
                "min": round(min(walls), 3),
                "median": round(statistics.median(walls), 3),
            }
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build-trace", "tokenize-decompose", "warm-queries"])
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    if args.cmd == "build-trace":
        print(json.dumps(build_trace(args.sf_dir, args.runs)))
    elif args.cmd == "tokenize-decompose":
        print(json.dumps(tokenize_decompose(args.sf_dir)))
    else:
        print(json.dumps(warm_queries(args.sf_dir, args.repeats)))


if __name__ == "__main__":
    main()
