"""Alias registry: the zero-downtime rotation surface
(/root/reference/elastic/elastic.go:33-97 — timestamped index, PutAlias,
DeleteIndices)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.wand import IndexReader
from ariadna_spark.sources.aliases import AliasRegistry
from ariadna_spark.sources.segments import build_index


@pytest.fixture(scope="module")
def rotation(spark, docs, tmp_path_factory):
    """Two stores under one registry root: full corpus and the even half."""
    root = str(tmp_path_factory.mktemp("alias_root"))
    reg = AliasRegistry(root)
    idx1 = os.path.join(root, "idx-1")
    idx2 = os.path.join(root, "idx-2")
    build_index(spark, docs, idx1, build_id="v1", n_buckets=2)
    build_index(
        spark, docs.filter(F.col("doc_id") % 2 == 0), idx2, build_id="v2", n_buckets=2
    )
    return reg, idx1, idx2


def test_alias_actions_atomic_batch(rotation):
    reg, idx1, idx2 = rotation
    reg.update_aliases([{"add": {"alias": "a", "index": idx1}}])
    assert reg.get_alias("a") == [os.path.abspath(idx1)]
    # a batch with a failing action must apply NOTHING
    with pytest.raises(KeyError):
        reg.update_aliases(
            [
                {"add": {"alias": "a", "index": idx2}},
                {"remove": {"alias": "a", "index": "/nope"}},
            ]
        )
    # the add that preceded the failing remove was rolled back with it
    # (one publish per batch, written only after every action validates)
    assert reg.aliases().get("a") == [os.path.abspath(idx1)]
    with pytest.raises(ValueError):
        reg.update_aliases([{"alias_madness": {}}])
    with pytest.raises(KeyError):
        reg.get_alias("never_created")
    # removing the last member drops the alias entirely
    reg.update_aliases([{"remove": {"alias": "a", "index": idx1}}])
    assert "a" not in reg.aliases()


def test_put_alias_replaces_members(rotation):
    reg, idx1, idx2 = rotation
    reg.put_alias("serving_t", idx1)
    reg.put_alias("serving_t", idx2)  # rotation: add-new + remove-old fused
    assert reg.get_alias("serving_t") == [os.path.abspath(idx2)]
    # idempotent re-put keeps exactly one member
    reg.put_alias("serving_t", idx2)
    assert reg.get_alias("serving_t") == [os.path.abspath(idx2)]
    reg.update_aliases([{"remove": {"alias": "serving_t", "index": idx2}}])


def test_gc_stores_safety(rotation, tmp_path):
    reg, idx1, idx2 = rotation
    reg.put_alias("gc_t", idx2)
    # a stray dir matching the base but with no MANIFEST is NOT touched
    stray = os.path.join(reg.root, "idx-stray")
    os.makedirs(stray, exist_ok=True)
    with open(os.path.join(stray, "keep.txt"), "w") as f:
        f.write("x")
    removed = reg.gc_stores("idx")
    assert removed == [os.path.abspath(idx1)]
    assert os.path.exists(stray) and os.path.exists(idx2)
    assert not os.path.exists(idx1)
    reg.update_aliases([{"remove": {"alias": "gc_t", "index": idx2}}])


def test_multi_member_search_is_score_merge(spark, docs, tmp_path_factory):
    """A 2-member alias answers like ES query_then_fetch: per-store
    top-k with each store's own stats, merged by (score, doc_id)."""
    root = str(tmp_path_factory.mktemp("alias_fan"))
    reg = AliasRegistry(root)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    mid = (int(lo) + int(hi)) // 2
    a, b = os.path.join(root, "shard-a"), os.path.join(root, "shard-b")
    build_index(spark, docs.filter(F.col("doc_id") <= mid), a, build_id="sa", n_buckets=2)
    build_index(spark, docs.filter(F.col("doc_id") > mid), b, build_id="sb", n_buckets=2)
    reg.update_aliases(
        [{"add": {"alias": "fan", "index": a}}, {"add": {"alias": "fan", "index": b}}]
    )
    got = reg.search(spark, "fan", "merge join", k=5).collect()
    per = IndexReader(spark, a).topk("merge join", 5).collect() + IndexReader(
        spark, b
    ).topk("merge join", 5).collect()
    want = sorted(per, key=lambda r: (-r["score"], r["doc_id"]))[:5]
    assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
        (r["doc_id"], round(r["score"], 6)) for r in want
    ]
    with pytest.raises(ValueError):  # single-store read path refuses fan-out
        reg.resolve_one("fan")


def test_registry_file_is_atomic_json(rotation):
    reg, idx1, idx2 = rotation
    reg.put_alias("fmt", idx2)
    with open(reg.path) as f:
        state = json.load(f)
    assert state["fmt"] == [os.path.abspath(idx2)]
    assert not [p for p in os.listdir(reg.root) if ".tmp." in p]
    reg.update_aliases([{"remove": {"alias": "fmt", "index": idx2}}])
