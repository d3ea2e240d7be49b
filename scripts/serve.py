#!/usr/bin/env python
"""Search-serving entry point: a long-lived process holding ONE warm
SparkSession + IndexReader, answering queries over HTTP (stdlib
http.server — no external web framework).

The reference runs a web server on :8080 with /api/search
(/root/reference/osm/osm.go:179-186); this is the native analog. Unlike
scripts/query.py (one-shot: pays SparkSession + reader startup per
invocation), the serving loop pays them once; per-query latency is then
just the Spark job time measured in bench.py.

    spark-submit --py-files dist/ariadna_spark.zip scripts/serve.py \
        --index /tmp/idx --port 8080
    curl 'localhost:8080/api/search?q=binary+search&k=10'
    curl 'localhost:8080/api/prefix?q=bin&k=10'

Config (A8): --config YAML + ARIADNA_* env overrides, flags win.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SearchService:
    """Warm reader + serialized query execution (one SparkSession is not
    safely concurrent for independent actions with shared conf mutation;
    a lock keeps the serving loop simple — throughput scaling comes from
    batching via topk_many, not from racing jobs)."""

    def __init__(self, spark, index_dir: str, build_id: str | None = None):
        from ariadna_spark.operators.wand import IndexReader

        self.spark = spark
        self.reader = IndexReader(spark, index_dir, build_id=build_id)
        self._lock = threading.Lock()

    def search(self, q: str, k: int = 10, prefix: bool = False, docmap: bool = False) -> list[dict]:
        with self._lock:
            fn = self.reader.prefix_topk if prefix else self.reader.topk
            rows = fn(q, k, with_docmap=docmap).collect()
        return [r.asDict() for r in rows]

    def stats(self) -> dict:
        return {
            "builds": self.reader.build_ids,
            "N": self.reader.stats["N"],
            "avgdl": self.reader.stats["avgdl"],
        }


def make_handler(service: SearchService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            u = urlparse(self.path)
            qs = parse_qs(u.query)
            try:
                if u.path in ("/api/search", "/api/prefix"):
                    q = (qs.get("q") or [""])[0]
                    if not q:
                        return self._json(400, {"error": "missing q"})
                    k = int((qs.get("k") or ["10"])[0])
                    docmap = (qs.get("docmap") or ["0"])[0] in ("1", "true")
                    rows = service.search(
                        q, k, prefix=(u.path == "/api/prefix"), docmap=docmap
                    )
                    return self._json(200, {"query": q, "k": k, "hits": rows})
                if u.path == "/api/stats":
                    return self._json(200, service.stats())
                return self._json(404, {"error": "unknown endpoint"})
            except Exception as e:  # surface errors as JSON, keep serving
                return self._json(500, {"error": str(e)})

    return Handler


def serve(service: SearchService, port: int = 8080) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(service))
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--index", default=None)
    ap.add_argument("--build-id", default=None)
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    from ariadna_spark.config import load_config, resolve

    cfg = load_config(args.config)
    index_dir = resolve(args.index, cfg, "out_dir")
    if not index_dir:
        ap.error("--index required (flag, config file, or ARIADNA_OUT_DIR)")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ariadna-serve").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    service = SearchService(spark, index_dir, build_id=args.build_id)
    httpd = serve(service, args.port)
    print(json.dumps({"serving": True, "port": args.port, **service.stats()}), flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
