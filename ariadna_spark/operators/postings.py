"""Compressed posting-list construction (SURVEY.md E2, C1, §7.4).

The reference's inverted index is an in-memory multimap appended during the
scan (/root/reference/osm/handler/handler.go:13,145-148). At 10^12-file
scale that becomes: tf rows -> salted groupBy(term) -> per-group Arrow
kernel that sorts, chunks into fixed-size blocks, delta+varint compresses,
and attaches per-block max-score metadata for WAND pruning.

Skew handling (the north rule's "explicit skew splitting"): hot terms
(df above a threshold measured from the df distribution itself) are split
by *doc_id range* rather than hash. Range salting keeps each (term, salt)
group a contiguous, disjoint doc_id interval, so the per-group blocks are
globally doc_id-sorted by construction and the "multi-way posting merge"
degenerates to a metadata union — no second merge shuffle. A hash salt
would interleave doc_ids across groups and force a merge pass; ranges give
the same load-balancing for hot terms (which by definition appear across
the whole doc_id space) without that cost.

Block schema (FIXTURES.md §4, extended with df + dls so the query kernel
can recompute exact BM25 without a doc_len side-join):
    term, df, block_id, n_docs, first_doc_id, last_doc_id,
    block_max_tf, block_max_score, doc_ids_varint, tfs_varint, dls_varint
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import B, K1
from .._pickle import register_by_value
from ..functions import varint as _varint
from ..stats import doc_freqs, doc_lengths

BLOCK_SIZE = 128
POSTINGS_SCHEMA = (
    "term string, df long, block_id long, n_docs int, "
    "first_doc_id long, last_doc_id long, block_max_tf int, "
    "block_max_score double, doc_ids_varint binary, tfs_varint binary, "
    "dls_varint binary"
)


def _encode_group(
    pdf: pd.DataFrame, n_docs_total: int, avgdl: float, block_size: int
) -> pd.DataFrame:
    """One (term, salt) group -> block rows. Vectorized numpy throughout;
    the only loop is over 128-posting blocks."""
    term = pdf["term"].iloc[0]
    df_t = int(pdf["df"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)

    idf = float(np.log(1.0 + (n_docs_total - df_t + 0.5) / (df_t + 0.5)))
    scores = idf * (tfs * (K1 + 1.0)) / (tfs + K1 * (1.0 - B + B * dls / avgdl))

    rows = []
    n_blocks = (len(ids) + block_size - 1) // block_size
    for bi in range(n_blocks):
        s, e = bi * block_size, min((bi + 1) * block_size, len(ids))
        bid = (salt << 32) | bi
        rows.append(
            {
                "term": term,
                "df": df_t,
                "block_id": bid,
                "n_docs": e - s,
                "first_doc_id": int(ids[s]),
                "last_doc_id": int(ids[e - 1]),
                "block_max_tf": int(tfs[s:e].max()),
                "block_max_score": float(scores[s:e].max()),
                "doc_ids_varint": _varint.delta_encode_ids(ids[s:e]),
                "tfs_varint": _varint.varint_encode(tfs[s:e].astype(np.uint64)),
                "dls_varint": _varint.varint_encode(dls[s:e].astype(np.uint64)),
            }
        )
    return pd.DataFrame(rows)


def build_postings(
    tf: DataFrame,
    n_docs: int,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    hot_df_threshold: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """(doc_id, term, tf) -> compressed posting blocks.

    hot_df_threshold: terms with df above this get range-salted into
    n_salts groups. Default: N/8 — a term present in >12.5% of docs is a
    Zipf-head term whose single posting group would dominate a task.
    """
    if hot_df_threshold is None:
        hot_df_threshold = max(block_size * 4, n_docs // 8)

    dl = doc_lengths(tf)
    dfreq = doc_freqs(tf)
    enriched = tf.join(dl, "doc_id").join(F.broadcast(dfreq), "term")

    # Range salt: doc_id * n_salts / n_docs keeps each (term, salt) a
    # contiguous disjoint doc_id interval (doc_ids are dense 0..N-1).
    salt = F.when(
        F.col("df") > hot_df_threshold,
        F.floor(F.col("doc_id") * n_salts / F.lit(max(n_docs, 1))).cast("int"),
    ).otherwise(F.lit(0))
    salted = enriched.withColumn("salt", salt)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_group(pdf, n_docs, avgdl, block_size)

    return salted.groupBy("term", "salt").applyInPandas(kernel, POSTINGS_SCHEMA)


register_by_value(__name__)
