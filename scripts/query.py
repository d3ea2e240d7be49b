#!/usr/bin/env python
"""Query entry point: top-k BM25 (term or prefix) over a published index.

    spark-submit --py-files dist/ariadna_spark.zip scripts/query.py \
        --index /tmp/idx --q "binary search tree" --k 10 [--prefix] [--docmap]

Prints one JSON line per result row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config (A8); ARIADNA_* env vars override it")
    ap.add_argument("--index", default=None)
    ap.add_argument("--q", required=True)
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--prefix", action="store_true", help="edge-ngram prefix query")
    ap.add_argument(
        "--mode",
        default=None,
        choices=[
            "match", "prefix", "phrase", "phrase_prefix", "near", "fuzzy",
            "suggest", "didyoumean",
        ],
        help="query mode (default match; --prefix is shorthand for --mode prefix)",
    )
    ap.add_argument("--docmap", action="store_true", help="join repo/path onto results")
    args = ap.parse_args()

    from ariadna_spark.config import load_config, resolve

    cfg = load_config(args.config)
    index_dir = resolve(args.index, cfg, "out_dir")
    k = resolve(args.k, cfg, "k")
    if not index_dir:
        ap.error("--index required (flag, config file, or ARIADNA_OUT_DIR)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ariadna-query").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ariadna_spark.operators.wand import IndexReader

    reader = IndexReader(spark, index_dir, build_id=args.build_id)
    mode = args.mode or ("prefix" if args.prefix else "match")
    if mode == "suggest":
        df = reader.suggest_terms(args.q, size=k)
    elif mode == "didyoumean":
        df = reader.suggest_corrections(args.q, size=k)
    else:
        fn = {
            "match": lambda: reader.topk(args.q, k, with_docmap=args.docmap),
            "prefix": lambda: reader.prefix_topk(args.q, k, with_docmap=args.docmap),
            "phrase": lambda: reader.phrase_topk(args.q, k, with_docmap=args.docmap),
            "phrase_prefix": lambda: reader.phrase_prefix_topk(
                args.q, k, with_docmap=args.docmap
            ),
            "near": lambda: reader.near_topk(args.q, k=k, with_docmap=args.docmap),
            "fuzzy": lambda: reader.fuzzy_topk(args.q, k, with_docmap=args.docmap),
        }[mode]
        df = fn()
    for row in df.collect():
        print(json.dumps(row.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
