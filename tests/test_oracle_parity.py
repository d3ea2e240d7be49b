"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# sf-parameterized oracles (embedding_ivf inlines data-fitted centroid
# literals) must be generated for the SAME sf this harness runs against
os.environ["SPARK_GRAFT_TEST_SF_DIR"] = SF_DIR
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (int, bool, str)):
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return str(v)


def _row_key(row, cols_order):
    return tuple(_norm(row[c]) for c in cols_order)


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check
        return
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    order = sorted(spark_cols)

    def _sort_key(t):  # total order even with None/mixed-type cells
        return tuple((v is None, type(v).__name__, str(v)) for v in t)

    s_set = sorted((_row_key(r.asDict(), order) for r in spark_rows), key=_sort_key)
    d_set = sorted(
        (tuple(_norm(dict(zip(duck_cols, r))[c]) for c in order) for r in duck_rows),
        key=_sort_key,
    )
    for i, (a, b) in enumerate(zip(s_set, d_set)):
        assert a == b, f"{name}: value mismatch at sorted row {i}: {a} vs {b}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score_r"]
