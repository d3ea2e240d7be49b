"""Warm search-serving loop: one reader, many queries, HTTP contract
(the /root/reference/osm/osm.go:179-186 serving analog)."""

import json
import os
import sys
import threading
import urllib.request

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from ariadna_spark.sources.segments import build_index


@pytest.fixture(scope="module")
def service(spark, docs, tmp_path_factory):
    from serve import SearchService

    out = str(tmp_path_factory.mktemp("serve_idx"))
    build_index(spark, docs, out, build_id="srv", n_buckets=4)
    return SearchService(spark, out)


def test_warm_service_answers_repeatedly(spark, docs, service):
    from ariadna_spark.operators.topk import bm25_topk

    for q in ("merge join", "window scan"):
        hits = service.search(q, k=5)
        want = bm25_topk(docs, q, 5).collect()
        assert [h["doc_id"] for h in hits] == [r["doc_id"] for r in want]
    pref = service.search("sc", k=5, prefix=True)
    assert len(pref) == 5
    st = service.stats()
    assert st["N"] == docs.count() and st["builds"] == ["srv"]


def test_http_roundtrip(service):
    from serve import serve as mk_server

    httpd = mk_server(service, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/search?q=merge+join&k=3&docmap=1"
        ) as r:
            body = json.loads(r.read())
        assert body["k"] == 3 and len(body["hits"]) == 3
        assert all("repo" in h and "path" in h and "score" in h for h in body["hits"])
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/stats") as r:
            assert json.loads(r.read())["builds"] == ["srv"]
        # error contract
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/search") as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 400
    finally:
        httpd.shutdown()
