"""Corpus statistics (SURVEY.md C5 analog, M2).

The reference computes per-group aggregates by hand (way centroid =
mean of member node coords, /root/reference/osm/utils.go:18-25). Our
engine's analogous aggregates are the BM25 statistics:

    tf(term, doc)  — C1 analog (the inverted-index multimap build,
                     /root/reference/osm/handler/handler.go:145-148)
    doc_len(doc)   — sum of tf over a doc
    N, avgdl       — corpus-level scalars
    df(term)       — posting-list length per term

All pure DataFrame ops: explode -> groupBy; Catalyst does map-side partial
aggregation for the counts, so the shuffle carries (doc_id, term) partial
counts, not raw tokens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._pickle import register_by_value
from .analyze import CAMEL_1, CAMEL_2, NON_ASCII, TOKEN_SPLIT, tokenize_expr


def _tf_arrow_kernel(batches, with_dl: bool, with_positions: bool = False):
    """Tokenize AND count per doc inside one pure-Arrow kernel.

    Two scale decisions live here:

    * tf(doc, term) and doc_len are doc-local quantities: computing them
      via explode + groupBy would shuffle every token occurrence (the
      largest intermediate in the whole build); here they never leave the
      input partition. The only build-wide shuffle left is groupBy(term).

    * Pure pyarrow.compute (RE2 regex over contiguous string buffers, C++
      hash group-by) instead of pandas: python-object string handling is
      memory-bandwidth-bound and measured ~4x slower AND anti-scales when
      32 workers share one node's bandwidth. The Arrow kernel's token
      stream never materializes as python objects at all.

    The regex sequence is the canonical analyzer spec (analyze.py) —
    identical token streams are asserted against tokenize_py in tests.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    pa.set_cpu_count(1)  # one Spark worker per core already; don't oversubscribe

    for rb in batches:
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        doc_ids = tbl["doc_id"].combine_chunks()
        c = tbl["content"].combine_chunks()
        c = pc.replace_substring_regex(c, NON_ASCII, " ")
        c = pc.replace_substring_regex(c, CAMEL_1, r"\1 \2")
        c = pc.replace_substring_regex(c, CAMEL_2, r"\1 \2")
        c = pc.utf8_lower(c)
        toks = pc.split_pattern_regex(c, TOKEN_SPLIT)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parents = parents.filter(keep)
        if with_positions:
            # token position within its doc's filtered token stream (the
            # tokenize_py index): rank within each parent run. Arrow's
            # hash `list` aggregation accumulates in scan order, so the
            # per-(doc, term) position lists come out ascending — the
            # invariant the positions delta-codec asserts at encode time.
            par_np = parents.to_numpy(zero_copy_only=False)
            npos = par_np.shape[0]
            pos = np.arange(npos, dtype=np.int64)
            if npos:
                starts = np.flatnonzero(
                    np.concatenate(([True], par_np[1:] != par_np[:-1]))
                )
                runlen = np.diff(np.concatenate((starts, [npos])))
                pos -= np.repeat(pos[starts], runlen)
            grouped = pa.TableGroupBy(
                pa.table(
                    {"pi": parents, "term": flat, "pos": pa.array(pos, type=pa.int32())}
                ),
                ["pi", "term"],
            ).aggregate([("pos", "list"), ([], "count_all")])
        else:
            grouped = pa.TableGroupBy(
                pa.table({"pi": parents, "term": flat}), ["pi", "term"]
            ).aggregate([([], "count_all")])
        pi = grouped["pi"].to_numpy(zero_copy_only=False)
        ids_np = doc_ids.to_numpy(zero_copy_only=False)
        cols = {
            "doc_id": pa.array(ids_np[pi], type=pa.int64()),
            "term": grouped["term"].combine_chunks(),
            "tf": pc.cast(grouped["count_all"], pa.int32()),
        }
        if with_dl:
            dl = np.bincount(
                parents.to_numpy(zero_copy_only=False), minlength=rb.num_rows
            )
            cols["doc_len"] = pa.array(dl[pi], type=pa.int64())
        if with_positions:  # keep schema order: ..., doc_len, positions
            cols["positions"] = grouped["pos_list"].combine_chunks()
        yield from pa.table(cols).to_batches()


def term_freqs(docs: DataFrame, use_udf: bool = True) -> DataFrame:
    """docs -> (doc_id, term, tf). One row per distinct (doc, term).

    use_udf=True: shuffle-free Arrow kernel via mapInArrow (production).
    use_udf=False: pure-Catalyst explode + groupBy using the native
    tokenizer expression — the reference implementation parity tests
    compare against.
    """
    if use_udf:
        return docs.select("doc_id", "content").mapInArrow(
            lambda it: _tf_arrow_kernel(it, with_dl=False),
            "doc_id long, term string, tf int",
        )
    return (
        docs.select("doc_id", F.explode(tokenize_expr("content")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def _tf_arrow_kernel_fields(batches, fields: list[str], with_positions: bool = False):
    """Multi-field tokenize+count in ONE corpus pass (E8 at build time):
    for each input batch, every field column runs the same analyzer
    pipeline and emits (doc_id, field_idx, term, tf, doc_len[, positions])
    — doc_len and positions are PER-FIELD (the Lucene per-field model:
    each field is its own token stream with its own statistics). The
    corpus is read once and never re-scanned per field; the only
    build-wide shuffle downstream is still the single groupBy(term).
    """
    import pyarrow as pa

    for rb in batches:
        if rb.num_rows == 0:
            continue
        did_i = rb.schema.get_field_index("doc_id")
        for fi, f in enumerate(fields):
            sub = pa.RecordBatch.from_arrays(
                [rb.column(did_i), rb.column(rb.schema.get_field_index(f))],
                names=["doc_id", "content"],
            )
            for out in _tf_arrow_kernel([sub], with_dl=True, with_positions=with_positions):
                t = pa.Table.from_batches([out])
                cols = {"doc_id": t["doc_id"],
                        "field": pa.array(np.full(t.num_rows, fi, dtype=np.int32)),
                        "term": t["term"], "tf": t["tf"], "doc_len": t["doc_len"]}
                if with_positions:
                    cols["positions"] = t["positions"]
                yield from pa.table(cols).to_batches()


def term_freqs_dl_fields(
    docs: DataFrame, fields: list[str], with_positions: bool = False
) -> DataFrame:
    """docs -> (doc_id, field, term, tf, doc_len[, positions]) for every
    field in ONE mapInArrow pass — the multifield build's upper half."""
    schema = "doc_id long, field int, term string, tf int, doc_len long"
    if with_positions:
        schema += ", positions array<int>"
    flds = list(fields)
    return docs.select("doc_id", *flds).mapInArrow(
        lambda it: _tf_arrow_kernel_fields(it, flds, with_positions=with_positions),
        schema,
    )


def term_freqs_dl(docs: DataFrame, with_positions: bool = False) -> DataFrame:
    """docs -> (doc_id, term, tf, doc_len[, positions]) — doc_len computed
    in-kernel so the posting builder needs no doc_len side-join; positions
    (token offsets in the analyzed stream, for phrase queries) ride along
    when requested."""
    schema = "doc_id long, term string, tf int, doc_len long"
    if with_positions:
        schema += ", positions array<int>"
    return docs.select("doc_id", "content").mapInArrow(
        lambda it: _tf_arrow_kernel(it, with_dl=True, with_positions=with_positions),
        schema,
    )


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(doc_id, [term, tf, ...]) -> (doc_id, doc_len). Uses the in-kernel
    doc_len when present (tiny grouped max), else sums tf."""
    if "doc_len" in tf.columns:
        return tf.groupBy("doc_id").agg(F.max("doc_len").alias("doc_len"))
    return tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("doc_len"))


def doc_freqs(tf: DataFrame) -> DataFrame:
    """(doc_id, term, tf) -> (term, df). tf rows are already distinct per
    (doc, term), so df == count(*) — no countDistinct shuffle needed."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))


def corpus_scalars(dl: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — the only two values that ever reach the driver."""
    row = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def corpus_scalars_full(dl: DataFrame) -> tuple[int, float, int]:
    """(N, avgdl, total_tokens) — total kept as the exact integer sum so
    multi-segment readers can recompute a bit-exact global avgdl."""
    row = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("tot"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"]), int(row["tot"])


register_by_value(__name__)
