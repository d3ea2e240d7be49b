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
    ap.add_argument("--config", default=None, help="YAML config (A8); ARIADNA_* env vars override it, flags override both")
    ap.add_argument("--docs", default=None, help="parquet path; raw documents.parquet or canonical docs table")
    ap.add_argument("--out", default=None, help="segment store root")
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--n-salts", type=int, default=None)
    ap.add_argument("--block-size", type=int, default=None)
    ap.add_argument("--no-publish", action="store_true")
    ap.add_argument("--gc", action="store_true", help="delete unpublished builds after publish")
    args = ap.parse_args()

    from ariadna_spark.config import load_config, resolve

    cfg = load_config(args.config)
    docs_path = resolve(args.docs, cfg, "docs_path")
    out_dir = resolve(args.out, cfg, "out_dir")
    if not docs_path or not out_dir:
        ap.error("--docs/--out required (flag, config file, or ARIADNA_DOCS_PATH/ARIADNA_OUT_DIR)")
    build_id = resolve(args.build_id, cfg, "build_id")
    n_buckets = resolve(args.n_buckets, cfg, "n_buckets")
    n_salts = resolve(args.n_salts, cfg, "n_salts")
    block_size = resolve(args.block_size, cfg, "block_size")
    publish = cfg["publish"] and not args.no_publish

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ariadna-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ariadna_spark.corpus import DOCS_COLUMNS, load_docs
    from ariadna_spark.sources.segments import SegmentStore, build_index

    raw = spark.read.parquet(docs_path)
    if set(DOCS_COLUMNS) <= set(raw.columns):
        docs = raw.select(*DOCS_COLUMNS)
    else:
        docs = load_docs(spark, os.path.dirname(docs_path.rstrip("/")))

    manifest = build_index(
        spark,
        docs,
        out_dir,
        build_id=build_id,
        n_buckets=n_buckets,
        n_salts=n_salts,
        block_size=block_size,
        publish=publish,
    )
    if args.gc and publish:
        SegmentStore(out_dir).gc()
    print(json.dumps(manifest))
    spark.stop()


if __name__ == "__main__":
    main()
