"""ES percolator: stored queries matched against incoming documents
(reverse search — the alerting/classification surface of the delegated ES
contract, /root/reference/elastic/elastic.go search passthrough; ES 7.x
`percolate` query over a registered-queries index).

The stored-query table is the small dimension (a percolator registry is
thousands of queries; the document stream is the 100-TB side), so the
Spark shape is broadcast-join-only:

 1. stored queries explode to distinct (query_id, term) rows and ride a
    broadcast — the registry never shuffles and is scanned once,
 2. incoming docs tokenize map-side and explode to DISTINCT
    (doc_id, term) pairs; the broadcast hash join filters the pair
    stream to query-vocabulary terms INSIDE the same stage, so only
    (doc in some query's vocabulary) pairs ever reach the exchange,
 3. one partial-aggregated groupBy(doc_id, query_id) tallies matched
    terms; a second broadcast join against the per-query requirement
    (minimum_should_match) keeps pairs meeting the bar.

No corpus-sized shuffle exists: the exchange carries matched
(doc_id, query_id, term) triples bounded by |docs| x |avg queries whose
vocabulary a doc touches| — the same bound ES's percolator pays walking
its query index per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyze import tokenize_expr


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """Match every incoming doc against every stored query.

    `queries`: (query_id long, terms array<string>, msm int) — msm is ES
    minimum_should_match as an absolute count; msm == size(terms) is the
    AND percolator, msm == 1 the OR one. Terms must be pre-analyzed with
    the index analyzer (symmetric-analyzer discipline, analyze.py).

    Returns the (doc_id, query_id) match pairs — a lazy frame; callers
    aggregate or sink it (the driver gate groups per query)."""
    qx = queries.select(
        "query_id", F.explode(F.array_distinct("terms")).alias("term")
    )
    qn = queries.select(
        "query_id",
        F.size(F.array_distinct("terms")).alias("nt"),
        F.coalesce(F.col("msm"), F.size(F.array_distinct("terms"))).alias("req"),
    )
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize_expr(content_col))).alias("term"),
    )
    hits = (
        dt.join(F.broadcast(qx), "term")
        .groupBy("doc_id", "query_id")
        .agg(F.count(F.lit(1)).cast("int").alias("matched"))
    )
    return (
        hits.join(F.broadcast(qn), "query_id")
        .filter(F.col("matched") >= F.col("req"))
        .select("doc_id", "query_id")
    )
