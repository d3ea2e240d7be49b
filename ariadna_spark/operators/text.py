"""Text-analysis operators for training-data pipelines: language ID
(stopword-overlap heuristic), quality scoring, token counting, and
document fingerprinting. All JVM-side Catalyst expressions over the
analyzer's token arrays — no UDFs in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analyze import tokenize_expr, tokenize_udf

# Tiny per-language marker lexicons (heuristic language ID — the classic
# stopword-profile method; real pipelines would plug fastText here, same
# dataflow shape: per-doc score per language, argmax).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en"],
}

STOPWORDS = ["the", "a", "of", "and", "if", "import"]


def language_id(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, lang_pred, lang_score). Score = fraction of tokens that are
    markers of the winning language; ties broken by language name."""
    toks = tokenize_udf(F.col(content_col))
    d = docs.select("doc_id", toks.alias("toks")).withColumn("nt", F.size("toks"))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hit = F.size(F.filter("toks", lambda t: t.isin(markers)))
        scores.append(F.struct((hit / F.greatest("nt", F.lit(1))).alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return d.select(
        "doc_id",
        best["l"].alias("lang_pred"),
        F.round(best["s"], 4).alias("lang_score"),
    )


def quality_metrics(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Per-doc quality features: token counts, avg token length, digit and
    stopword ratios, punctuation density, uniqueness ratio."""
    toks = tokenize_expr(content_col)
    d = docs.select("doc_id", F.col(content_col).alias("c"), toks.alias("toks"))
    nt = F.greatest(F.size("toks"), F.lit(1))
    return d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.round(
            F.aggregate("toks", F.lit(0), lambda a, t: a + F.length(t)) / nt, 4
        ).alias("avg_tok_len"),
        F.round(F.size(F.filter("toks", lambda t: t.rlike("^[0-9]+$"))) / nt, 4).alias(
            "digit_ratio"
        ),
        F.round(F.size(F.filter("toks", lambda t: t.isin(STOPWORDS))) / nt, 4).alias(
            "stop_ratio"
        ),
        F.round(F.size(F.array_distinct("toks")) / nt, 4).alias("uniq_ratio"),
        F.round(
            (F.length("c") - F.length(F.regexp_replace("c", "[^a-zA-Z0-9\\s]", ""))) /
            F.greatest(F.length("c"), F.lit(1)),
            4,
        ).alias("punct_density"),
    )


def token_counts(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Whitespace tokens vs analyzer tokens vs BPE-ish subword estimate
    (len/4 heuristic — the common 'chars per token' rule of thumb)."""
    c = F.col(content_col)
    ws = F.size(F.filter(F.split(c, "\\s+"), lambda x: x != F.lit("")))
    code = F.size(tokenize_expr(content_col))
    bpe = F.ceil(F.length(c) / 4).cast("long")
    return docs.select(
        "doc_id", ws.alias("n_ws_tokens"), code.alias("n_code_tokens"), bpe.alias("n_bpe_est")
    )


def fingerprint(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Analyzer-normalized content fingerprint: sha256 over the token
    stream. Robust to whitespace/punctuation-only edits by construction."""
    return docs.select(
        "doc_id",
        F.sha2(F.concat_ws(" ", tokenize_expr(content_col)), 256).alias("fp"),
    )


# PII scrubbing (training-data hygiene): redact emails / IPv4 literals
# before a corpus reaches a trainer. Patterns are deliberately RE2-safe
# (no backrefs/lookaround) so the DuckDB oracle replays them verbatim.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """(doc_id, clean, n_emails, n_ips): redact email addresses and IPv4
    literals (order: emails first — an IP-looking host inside an email is
    part of the email match) and count what was removed. Pure Catalyst
    regexp ops — at 100 TB this runs inside whole-stage codegen with no
    Python in the loop."""
    c = F.col(content_col)
    n_emails = F.regexp_count(c, F.lit(PII_EMAIL_RE))
    no_email = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(no_email, F.lit(PII_IPV4_RE))
    clean = F.regexp_replace(no_email, PII_IPV4_RE, "<IP>")
    return docs.select(
        "doc_id",
        clean.alias("clean"),
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
    )
