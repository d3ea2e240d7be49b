"""Capture .explain('formatted') for the r7-touched query paths.

Usage: python scripts/capture_plans_r07.py <repo_root> <suffix>
  repo_root: tree whose ariadna_spark to import (round-start worktree for
             'before', /root/repo for 'after')
  suffix:    'before' | 'after' — file name suffix under plans/r07/

Runs on sf0.1 (plan SHAPE is scale-independent; the bench numbers in
OPTIMIZATION_r07.md are sf1.0). Output: plans/r07/<name>_<suffix>.txt.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r07"

sys.path.insert(0, REPO)

from ariadna_spark.corpus import load_docs  # noqa: E402
from ariadna_spark.operators.wand import IndexReader, multifield_topk  # noqa: E402
from ariadna_spark.session import get_spark  # noqa: E402
from ariadna_spark.sources.segments import build_index  # noqa: E402
from ariadna_spark import queries as Q  # noqa: E402

spark = get_spark("plan-capture", cores=8)
docs = load_docs(spark, SF)
idx = tempfile.mkdtemp(prefix="plan_idx_", dir="/dev/shm")
build_index(spark, docs, idx, build_id="p", n_buckets=16)
reader = IndexReader(spark, idx)


def cap(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(buf.getvalue())
    print("captured", name)


cap("q_merge_join", reader.topk("merge join", 10))
cap("multifield2", multifield_topk([(reader, 1.0), (reader, 2.0)], "merge join", 10))
cap("minhash_signatures", Q.QUERIES["minhash_signatures"](spark, SF))
cap("near_dup_lsh", Q.QUERIES["near_dup_lsh"](spark, SF))
cap("simhash", Q.QUERIES["simhash"](spark, SF))
cap("batch_topk_many", reader.topk_many([(0, "merge join", 10), (1, "window scan", 10)]))
cap("fuzzy_topk", reader.fuzzy_topk("mrege vectr", 10, max_dist=2))
cap("match_aggs", reader.match_aggs("merge join"))

import shutil  # noqa: E402

shutil.rmtree(idx, ignore_errors=True)
spark.stop()
