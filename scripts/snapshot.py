#!/usr/bin/env python
"""Snapshot / restore entry point — the ES `_snapshot`/`_restore`
lifecycle verbs over the segment store (the reference swaps whole
indices behind an alias, /root/reference/elastic/elastic.go:34-63; a
snapshot repository is the standard ES way to move/back up that state).

Pure driver-side file I/O (no SparkSession): builds are immutable once
published, so a snapshot is an incremental copy of the live build dirs
plus an atomic MANIFEST write.

Usage:
    python scripts/snapshot.py snapshot --index /tmp/idx --repo /backup/snap
    python scripts/snapshot.py restore  --repo /backup/snap --index /tmp/idx2

Prints one JSON line: {"builds": [...], "copied": [...], "skipped": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["snapshot", "restore"])
    ap.add_argument("--index", required=True, help="segment store root")
    ap.add_argument("--repo", required=True, help="snapshot repository dir")
    args = ap.parse_args()

    from ariadna_spark.sources.segments import restore_index, snapshot_index

    if args.action == "snapshot":
        out = snapshot_index(args.index, args.repo)
    else:
        out = restore_index(args.repo, args.index)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
