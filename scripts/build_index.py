#!/usr/bin/env python
"""Index-build entry point (north rule: `spark-submit --py-files`).

Usage (local sandbox):
    python scripts/make_pyfiles.py                       # -> dist/ariadna_spark.zip
    spark-submit --master local[32] \
        --py-files dist/ariadna_spark.zip \
        scripts/build_index.py \
        --docs /root/testdata/sf0.01/documents.parquet \
        --out /tmp/idx --build-id b1 --n-buckets 16

On a real cluster, --master spark://... / yarn and the same --py-files zip;
every knob that matters at scale (shuffle partitions, salts, buckets) is a
flag. Prints the manifest as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet path; raw documents.parquet or canonical docs table")
    ap.add_argument("--out", required=True, help="segment store root")
    ap.add_argument("--build-id", default="b0")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--n-salts", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--no-publish", action="store_true")
    ap.add_argument("--gc", action="store_true", help="delete unpublished builds after publish")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ariadna-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ariadna_spark.corpus import DOCS_COLUMNS, load_docs
    from ariadna_spark.sources.segments import SegmentStore, build_index

    raw = spark.read.parquet(args.docs)
    if set(DOCS_COLUMNS) <= set(raw.columns):
        docs = raw.select(*DOCS_COLUMNS)
    else:
        docs = load_docs(spark, os.path.dirname(args.docs.rstrip("/")))

    manifest = build_index(
        spark,
        docs,
        args.out,
        build_id=args.build_id,
        n_buckets=args.n_buckets,
        n_salts=args.n_salts,
        block_size=args.block_size,
        publish=not args.no_publish,
    )
    if args.gc and not args.no_publish:
        SegmentStore(args.out).gc()
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
