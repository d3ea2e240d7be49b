#!/usr/bin/env python
"""Compaction entry point: merge all live segments into one (the Lucene
force-merge / ES _forcemerge analog of the reference's rebuild+alias-swap
lifecycle, /root/reference/elastic/elastic.go:34-63).

Usage:
    spark-submit --py-files dist/ariadna_spark.zip scripts/compact.py \
        --index /tmp/idx [--build-id compacted] [--n-buckets 16]

    # policy mode: only merge when due (segment count / tombstone ratio)
    python scripts/compact.py --index /tmp/idx --if-due \
        --max-segments 8 --max-tomb-ratio 0.25

Prints one JSON line: the merged manifest, or {"compacted": false, ...}
when --if-due decides nothing needs merging. Exit code 0 either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--index", default=None, help="segment store root")
    ap.add_argument("--build-id", default=None, help="id for the merged build")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--if-due", action="store_true",
                    help="run the compaction policy check first; no-op unless due")
    ap.add_argument("--max-segments", type=int, default=8)
    ap.add_argument("--max-tomb-ratio", type=float, default=0.25)
    ap.add_argument("--no-gc", action="store_true", help="keep the input segments on disk")
    args = ap.parse_args()

    from ariadna_spark.config import load_config, resolve

    cfg = load_config(args.config)
    index_dir = resolve(args.index, cfg, "out_dir")
    if not index_dir:
        ap.error("--index required (flag, config file, or ARIADNA_OUT_DIR)")

    from pyspark.sql import SparkSession

    from ariadna_spark.sources.segments import compact, compaction_due

    if args.if_due:
        due = compaction_due(
            index_dir, max_segments=args.max_segments, max_tomb_ratio=args.max_tomb_ratio
        )
        if due is None:
            print(json.dumps({"compacted": False, "reason": "not_due"}))
            return

    spark = SparkSession.builder.appName("ariadna-compact").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        manifest = compact(
            spark,
            index_dir,
            build_id=args.build_id,
            n_buckets=args.n_buckets,
            gc=not args.no_gc,
        )
        out = {"compacted": True, "build_id": manifest["build_id"],
               "stats": manifest["stats"]}
        if args.if_due:
            out["trigger"] = due
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
