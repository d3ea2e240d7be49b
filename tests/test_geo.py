"""Geo k-NN (E7): ring-probed grid k-NN must equal brute-force haversine
top-k exactly, for any query point; the written index must partition-prune."""

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from ariadna_spark.operators.geo import (
    EARTH_R_KM,
    _ring_lower_bound_km,
    geo_index_write,
    geo_knn,
    haversine_km_expr,
    with_cells,
    with_synth_coords,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def pts(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    p = with_synth_coords(c)
    p.persist()
    p.count()
    return p


def _brute(pdf, qlat, qlon, k):
    lat = np.radians(pdf["lat"].to_numpy())
    lon = np.radians(pdf["lon"].to_numpy())
    ql, qo = math.radians(qlat), math.radians(qlon)
    h = np.sin((lat - ql) / 2) ** 2 + math.cos(ql) * np.cos(lat) * np.sin((lon - qo) / 2) ** 2
    d = 2 * EARTH_R_KM * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    order = sorted(zip(pdf["id"].to_numpy(), d), key=lambda t: (t[1], t[0]))[:k]
    return [int(i) for i, _ in order]


@pytest.mark.parametrize(
    "qlat,qlon",
    [
        (17.25, 42.5),   # mid-latitude
        (0.0, 0.0),      # cell corner exactly
        (-71.3, -88.0),  # near the domain edge / high latitude
        (39.999, 20.001),  # just inside a cell boundary
    ],
)
def test_geo_knn_equals_bruteforce(spark, pts, qlat, qlon):
    pdf = pts.toPandas()
    for k in (1, 10):
        want = _brute(pdf, qlat, qlon, k)
        got = [r["id"] for r in geo_knn(pts, qlat, qlon, k=k, cell_deg=20.0).collect()]
        assert got == want, (qlat, qlon, k)


def test_geo_knn_small_cells_force_ring_expansion(spark, pts):
    """Tiny cells make the first rings empty — the expansion loop must
    still converge to the exact answer."""
    pdf = pts.toPandas()
    want = _brute(pdf, 17.25, 42.5, 5)
    got = [r["id"] for r in geo_knn(pts, 17.25, 42.5, k=5, cell_deg=2.0).collect()]
    assert got == want


def test_ring_bound_is_valid(spark, pts):
    """No point outside Chebyshev radius r may be closer than the bound."""
    pdf = with_cells(pts, 20.0).toPandas()
    qlat, qlon = 17.25, 42.5
    qx, qy = math.floor(qlon / 20.0), math.floor(qlat / 20.0)
    lat = np.radians(pdf["lat"].to_numpy())
    lon = np.radians(pdf["lon"].to_numpy())
    ql, qo = math.radians(qlat), math.radians(qlon)
    h = np.sin((lat - ql) / 2) ** 2 + math.cos(ql) * np.cos(lat) * np.sin((lon - qo) / 2) ** 2
    d = 2 * EARTH_R_KM * np.arcsin(np.minimum(1.0, np.sqrt(h)))
    cheb = np.maximum(
        np.abs(pdf["cell_x"].to_numpy() - qx), np.abs(pdf["cell_y"].to_numpy() - qy)
    )
    for r in (1, 2, 3):
        outside = d[cheb > r]
        if outside.size:
            assert outside.min() >= _ring_lower_bound_km(qlat, r, 20.0) - 1e-9, r


def _pip_reference(px, py, xs, ys):
    """Independent textbook ray cast (with the division) as the oracle for
    the division-free Catalyst form."""
    inside = False
    n = len(xs)
    for i in range(n):
        xi, yi = xs[i], ys[i]
        xj, yj = xs[(i + 1) % n], ys[(i + 1) % n]
        if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def test_point_in_polygon_matches_reference(spark, pts):
    from ariadna_spark.operators.geo import polygon_containment_join

    polys = [
        ("square", [0.0, 10.0, 10.0, 0.0], [0.0, 0.0, 10.0, 10.0]),
        # concave "arrow": the notch makes parity matter
        ("arrow", [-40.0, 0.0, -40.0, -10.0], [-40.0, -20.0, 0.0, -20.0]),
    ]
    pdf = pts.toPandas()
    pol = spark.createDataFrame(polys, "name string, xs array<double>, ys array<double>")
    got = {
        (r["name"], r["id"])
        for r in polygon_containment_join(pts, pol).select("name", "id").collect()
    }
    want = set()
    for name, xs, ys in polys:
        for _, row in pdf.iterrows():
            if _pip_reference(row["lon"], row["lat"], xs, ys):
                want.add((name, int(row["id"])))
    assert got == want
    assert want, "fixture polygons should contain some points"


def test_point_in_polygon_hand_cases(spark):
    from ariadna_spark.operators.geo import point_in_polygon_expr

    sq = ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0])
    concave = ([0.0, 6.0, 6.0, 3.0, 0.0], [0.0, 0.0, 6.0, 2.5, 6.0])  # notch at top
    cases = [
        (2.0, 2.0, sq, True),
        (5.0, 2.0, sq, False),
        (-1.0, -1.0, sq, False),
        (3.0, 3.5, concave, False),  # inside the notch = outside polygon
        (1.0, 1.0, concave, True),
        (5.5, 4.0, concave, True),
    ]
    rows = [(px, py, xs, ys, want) for px, py, (xs, ys), want in cases]
    df = spark.createDataFrame(
        rows, "px double, py double, xs array<double>, ys array<double>, want boolean"
    )
    got = df.select(
        "want",
        point_in_polygon_expr(F.col("px"), F.col("py"), F.col("xs"), F.col("ys")).alias("got"),
    ).collect()
    for r in got:
        assert r["got"] == r["want"]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        qlat=st.floats(-89.99, 89.99),
        qlon=st.floats(-89.99, 89.99),
        cell=st.sampled_from([2.0, 5.0, 10.0, 20.0, 45.0]),
        r=st.integers(1, 6),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_ring_bound_property(qlat, qlon, cell, r, seed):
        """PROPERTY: no point outside Chebyshev cell radius r is ever
        closer than _ring_lower_bound_km — over random queries, cell sizes
        and point clouds (pure numpy; the correctness of geo_knn's early
        stop reduces to exactly this)."""
        rng = np.random.default_rng(seed)
        lat = rng.uniform(-90, 90, 400)
        lon = rng.uniform(-90, 90, 400)
        cx, cy = np.floor(lon / cell), np.floor(lat / cell)
        qx, qy = math.floor(qlon / cell), math.floor(qlat / cell)
        outside = np.maximum(np.abs(cx - qx), np.abs(cy - qy)) > r
        if not outside.any():
            return
        la, lo_ = np.radians(lat[outside]), np.radians(lon[outside])
        ql, qo = math.radians(qlat), math.radians(qlon)
        h = (
            np.sin((la - ql) / 2) ** 2
            + math.cos(ql) * np.cos(la) * np.sin((lo_ - qo) / 2) ** 2
        )
        d = 2 * EARTH_R_KM * np.arcsin(np.minimum(1.0, np.sqrt(h)))
        assert d.min() >= _ring_lower_bound_km(qlat, r, cell) - 1e-6
except ImportError:  # hypothesis is baked in, but stay import-safe
    pass


def test_geo_index_partition_pruned(spark, pts, tmp_path):
    from ariadna_spark.plans import assert_partition_pruned

    path = str(tmp_path / "geo_idx")
    geo_index_write(pts, path, cell_deg=20.0)
    stored = spark.read.parquet(path)
    probe = stored.filter(F.col("cell_x").between(1, 2) & F.col("cell_y").between(0, 1))
    assert_partition_pruned(probe, "cell_x")
    assert_partition_pruned(probe, "cell_y")
    # the stored index answers identically
    want = [r["id"] for r in geo_knn(pts, 17.25, 42.5, k=10, cell_deg=20.0).collect()]
    got = [r["id"] for r in geo_knn(stored, 17.25, 42.5, k=10, cell_deg=20.0).collect()]
    assert got == want


def test_geo_knn_many_matches_per_query(spark, pts):
    """Batch cell-join k-NN (geo_knn_many) == the per-query ring loop,
    for every query point, including rank order and distances."""
    from ariadna_spark.operators.geo import geo_knn_many

    queries = [(0, 17.25, 42.5), (1, -88.0, -89.9), (2, 0.0, 0.0), (3, 65.5, -20.0)]
    qdf = spark.createDataFrame(queries, "qid long, qlat double, qlon double")
    got = geo_knn_many(pts, qdf, k=7, cell_deg=20.0).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["id"], r["dist_km"]))
    for qid, qlat, qlon in queries:
        want = geo_knn(pts, qlat, qlon, k=7, cell_deg=20.0).collect()
        assert [i for _, i, _ in sorted(by_q[qid])] == [w["id"] for w in want], qid
        for (_, _, gd), w in zip(sorted(by_q[qid]), want):
            assert abs(gd - w["dist_km"]) < 1e-9


def test_geo_knn_many_multi_round(spark, pts):
    """A tiny cell size forces several doubling rounds (sparse rings), and
    k larger than some ring populations exercises the not-done path."""
    from ariadna_spark.operators.geo import geo_knn_many

    queries = [(7, 17.25, 42.5), (8, -45.0, 60.0)]
    qdf = spark.createDataFrame(queries, "qid long, qlat double, qlon double")
    got = geo_knn_many(pts, qdf, k=5, cell_deg=2.0).collect()
    for qid, qlat, qlon in queries:
        want = [r["id"] for r in geo_knn(pts, qlat, qlon, k=5, cell_deg=2.0).collect()]
        mine = [r["id"] for r in sorted(got, key=lambda r: r["rank"]) if r["qid"] == qid]
        assert mine == want, qid


def test_geo_knn_many_fewer_than_k(spark):
    """A point set smaller than k: every query must still return ALL
    points (globe-covering final round), never hang or drop rows."""
    from ariadna_spark.operators.geo import geo_knn_many, with_synth_coords

    pts = with_synth_coords(spark.range(1, 4).selectExpr("id AS c_custkey"))
    qdf = spark.createDataFrame([(0, 10.0, 10.0)], "qid long, qlat double, qlon double")
    rows = geo_knn_many(pts, qdf, k=10, cell_deg=20.0).collect()
    assert sorted(r["id"] for r in rows) == [1, 2, 3]
