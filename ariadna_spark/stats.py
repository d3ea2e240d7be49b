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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analyze import tokenize_expr, tokenize_udf


def term_freqs(docs: DataFrame, use_udf: bool = True) -> DataFrame:
    """docs -> (doc_id, term, tf). One row per distinct (doc, term)."""
    tok = tokenize_udf(F.col("content")) if use_udf else tokenize_expr("content")
    return (
        docs.select("doc_id", F.explode(tok).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(doc_id, term, tf) -> (doc_id, doc_len)."""
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
