"""Corpus ingestion (SURVEY.md §1.3, A2 analog).

Two sources:

* ``load_docs(spark, sf_dir)`` — canonicalizes the driver's read-only
  ``documents.parquet`` into the input shape pinned by BASELINE.json
  input_hint: ``(doc_id, repo, path, commit, lang, content, content_sha)``.
  The reference's analog is the PBF scan + handler projection
  (/root/reference/osm/parser/parser.go:29-37,
  /root/reference/osm/handler/handler.go:91-161); here a columnar parquet
  scan with column pruning replaces the push-based row decoder.

* ``synth_code_corpus(spark, n)`` — deterministic seeded generator of
  plausible multi-language source-code rows (camelCase, snake_case, Zipf
  token skew) used by unit tests, per FIXTURES.md §1. Generated as an
  Arrow-backed pandas frame on the driver at test scale only; at real scale
  the source is the Iceberg table itself.

The ingest invariant (E4): ``content_sha = sha2(content, 256)`` computed at
ingest must equal the same expression over the source table per row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_COLUMNS = ["doc_id", "repo", "path", "commit", "lang", "content", "content_sha"]


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> canonical docs DataFrame.

    doc_id is taken from the source (already dense + deterministic);
    repo/path/commit are synthesized deterministically from (source, doc_id)
    so the corpus matches the input_hint shape.
    """
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return raw.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(F.lit("corpus/"), F.col("source")).alias("repo"),
        F.concat(
            F.lit("docs/"), F.col("lang"), F.lit("/doc_"), F.col("doc_id"), F.lit(".txt")
        ).alias("path"),
        F.sha2(F.concat_ws("|", F.col("source"), F.col("doc_id")), 256).substr(1, 40).alias(
            "commit"
        ),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


# ---------------------------------------------------------------------------
# Synthetic source-code corpus (tests only; FIXTURES.md §1)
# ---------------------------------------------------------------------------
_LANGS = ["python", "go", "java", "js", "c"]

# Vocabulary with a deliberate Zipf head: hot tokens (`the`, `if`, `import`,
# `0`, `i`) must dominate so the skew-splitting path is exercised.
_HOT = ["the", "if", "import", "0", "i", "return", "for", "def", "int", "="]
_WARM = [
    "parseJsonData", "HTTPResponse", "get_user_name", "MAX_BUFFER_SIZE",
    "readFileSync", "binary_search", "TreeNode", "hashMap", "linkedList",
    "foo", "bar", "baz", "qux", "tmp", "buf", "ctx", "err", "result",
    "index", "count", "value", "key", "node", "left", "right", "parent",
]
_COLD_N = 2000  # long tail of unique-ish identifiers


def _synth_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    cold = [f"sym{j}_{'XyZ'[j % 3]}Var" for j in range(_COLD_N)]
    vocab = np.array(_HOT + _WARM + cold)
    # Zipf-ish rank weights over the whole vocab (head gets most mass).
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    w = 1.0 / ranks
    w /= w.sum()

    rows = []
    for d in range(n):
        length = int(rng.integers(20, 400))
        toks = rng.choice(vocab, size=length, p=w)
        # sprinkle punctuation/newlines + a unicode comment to exercise step 1
        parts = []
        for t_i, t in enumerate(toks):
            parts.append(t)
            if t_i % 7 == 3:
                parts.append("(x);\n")
            elif t_i % 11 == 5:
                parts.append("# комментарий 注释\n")
        content = " ".join(parts)
        repo = f"org{d % 7}/proj{d % 13}"
        path = f"src/module_{d % 5}/file_{d}.py"
        commit = hashlib.sha256(f"{repo}|{path}".encode()).hexdigest()[:40]
        rows.append(
            {
                "doc_id": d,
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": _LANGS[d % len(_LANGS)],
                "content": content,
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["content_sha"] = pdf["content"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    return pdf


def synth_code_corpus(spark: SparkSession, n: int = 500, seed: int = 42) -> DataFrame:
    """Deterministic synthetic docs table matching the input_hint schema."""
    pdf = _synth_pdf(n, seed)
    df = spark.createDataFrame(pdf)
    return df.select(*DOCS_COLUMNS)
