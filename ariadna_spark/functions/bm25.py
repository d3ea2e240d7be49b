"""BM25 scoring expressions (SURVEY.md E6).

Constants k1=1.2, b=0.75 — the Elasticsearch 7.x default similarity the
reference relies on (/root/reference/docker-compose.yml:5 pins ES 7.2.0;
/root/reference/go.mod requires go-elasticsearch/v7). IDF is the Lucene
BM25 form: ln(1 + (N - df + 0.5) / (df + 0.5)).

Expressed as Catalyst column expressions so scoring runs JVM-side inside
whole-stage codegen; the same formula is emitted as DuckDB SQL for the
driver oracle and re-implemented in numpy inside the WAND kernel — all
three are golden-tested to agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import B, K1


def idf_expr(df_col: Column, n_docs: int | Column) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log(F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tf_norm_expr(tf_col: Column, dl_col: Column, avgdl: float | Column) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return (tf_col * F.lit(K1 + 1.0)) / (
        tf_col + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_col / a)
    )


def bm25_expr(tf_col: Column, df_col: Column, dl_col: Column, n_docs, avgdl) -> Column:
    return idf_expr(df_col, n_docs) * tf_norm_expr(tf_col, dl_col, avgdl)


def duckdb_bm25_sql(tf: str, df: str, dl: str, n: str, avgdl: str) -> str:
    """Same formula as DuckDB SQL text (for oracle queries)."""
    idf = f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5))"
    tfn = f"({tf} * {K1 + 1.0}) / ({tf} + {K1} * ({1.0 - B} + {B} * {dl} / {avgdl}))"
    return f"({idf}) * ({tfn})"


def idf_py(df: int, n: int) -> float:
    import math

    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def bm25_py(tf: float, df: int, dl: float, n: int, avgdl: float) -> float:
    return idf_py(df, n) * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
