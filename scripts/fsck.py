#!/usr/bin/env python
"""Index fsck: validate a segment store's physical artifacts against its
manifests and the posting-format invariants (see
ariadna_spark/sources/segments.py:verify_index). Exits non-zero on any
violation — the operational check before trusting a restored / copied /
long-lived index directory.

Usage:
    python scripts/fsck.py --index /path/to/segments [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from ariadna_spark.session import get_spark
    from ariadna_spark.sources.segments import verify_index

    spark = get_spark("ariadna-fsck", cores=args.cores, shuffle_partitions=args.cores)
    report = verify_index(spark, args.index)
    print(json.dumps(report, indent=2, sort_keys=True))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
