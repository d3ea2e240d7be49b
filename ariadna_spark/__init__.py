"""ariadna_spark — a PySpark-native full-text inverted-index + BM25 engine.

Re-expresses the capabilities of maddevsio/ariadna (a Go geocoder that
delegates indexing/search to Elasticsearch 7.x) as idiomatic Spark dataflow:

* index build  : scan -> code-aware tokenize (Arrow/pandas UDF) -> corpus
  stats -> salted groupBy(term) posting construction -> delta+varint
  compressed blocks with block-max metadata -> partitioned segments with an
  atomic manifest swap (the analog of ariadna's timestamped-index + alias
  swap, reference elastic/elastic.go:34-63).
* query side   : top-k BM25 (k1=1.2, b=0.75 — the ES 7.x default ariadna
  relied on, reference docker-compose.yml:5) with block-max WAND pruning.

Everything is DataFrame-first; Python appears only inside vectorized
pandas/Arrow UDFs (tokenization, varint codec, WAND) — never per-row.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
