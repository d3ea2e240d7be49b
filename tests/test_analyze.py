"""Tokenizer golden cases + three-way parity (Spark expr / pandas UDF /
DuckDB SQL) — the property the driver's oracle comparison depends on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ariadna_spark.analyze import (
    duckdb_edge_ngrams_sql,
    duckdb_tokenize_sql,
    edge_ngrams_expr,
    edge_ngrams_py,
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
)

GOLDEN = [
    ("parseJsonData", ["parse", "json", "data"]),
    ("parseHTTPResponse", ["parse", "http", "response"]),
    ("get_user_name", ["get", "user", "name"]),
    ("MAX_BUFFER_SIZE", ["max", "buffer", "size"]),
    ("foo.bar(baz, 42)", ["foo", "bar", "baz", "42"]),
    ("x=1;y=2", ["x", "1", "y", "2"]),
    ("HTTPServer", ["http", "server"]),
    ("linkedList2Node", ["linked", "list2", "node"]),
    ("# комментарий 注释 ok", ["ok"]),
    ("", []),
    ("   ", []),
    ("___", []),
    ("camelCase snake_case UPPER lower 0xFF", ["camel", "case", "snake", "case", "upper", "lower", "0x", "ff"]),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_tokenize_py_golden(text, expected):
    assert tokenize_py(text) == expected


def test_three_way_parity(spark):
    texts = [t for t, _ in GOLDEN] + [
        "def binarySearch(arr, lo, hi):\n  if lo >= hi: return -1",
        "SELECT * FROM tbl WHERE x = 'ünïcödé'",
        None,
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, content string")
    expr_rows = df.select("id", tokenize_expr("content").alias("toks")).orderBy("id").collect()
    udf_rows = df.select("id", tokenize_udf(F.col("content")).alias("toks")).orderBy("id").collect()
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {duckdb_tokenize_sql('t')} FROM (SELECT unnest(?) AS t)",
        [[t or "" for t in texts]],
    ).fetchall()
    for i, (e, u, d) in enumerate(zip(expr_rows, udf_rows, duck)):
        assert list(e["toks"]) == list(u["toks"]), f"expr vs udf mismatch row {i}"
        assert list(e["toks"]) == list(d[0]), f"spark vs duckdb mismatch row {i}"


def test_edge_ngrams(spark):
    assert edge_ngrams_py("a") == []
    assert edge_ngrams_py("ab") == ["ab"]
    assert edge_ngrams_py("binarysearch") == [
        "bi", "bin", "bina", "binar", "binary", "binarys", "binaryse"
    ]
    toks = ["a", "ab", "binarysearch", "xyz"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r["tok"]: list(r["ng"]) for r in df.select("tok", edge_ngrams_expr("tok").alias("ng")).collect()}
    con = duckdb.connect()
    duck = dict(
        con.execute(
            f"SELECT t, {duckdb_edge_ngrams_sql('t')} FROM (SELECT unnest(?) AS t)", [toks]
        ).fetchall()
    )
    for t in toks:
        assert got[t] == edge_ngrams_py(t)
        assert list(duck[t]) == edge_ngrams_py(t)


from hypothesis import given, settings, strategies as st


@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
@settings(max_examples=30, deadline=None)
def test_three_way_parity_property(spark_global, texts):
    """Random unicode strings: Catalyst expr == pandas UDF == DuckDB SQL
    == pure python. (spark fixture injected via module global set in
    test_three_way_parity run; falls back to building rows directly.)"""
    import duckdb

    spark = spark_global
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, content string")
    expr_rows = df.select("id", tokenize_expr("content").alias("t")).orderBy("id").collect()
    udf_rows = df.select("id", tokenize_udf(F.col("content")).alias("t")).orderBy("id").collect()
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {duckdb_tokenize_sql('t')} FROM (SELECT unnest(?) AS t)", [texts]
    ).fetchall()
    for i, t in enumerate(texts):
        py = tokenize_py(t)
        assert list(expr_rows[i]["t"]) == py
        assert list(udf_rows[i]["t"]) == py
        assert list(duck[i][0]) == py


import pytest as _pytest


@_pytest.fixture(scope="module")
def spark_global(spark):
    return spark
