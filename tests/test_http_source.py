"""HTTP/REST source: jsonpath subset, response→rows parsing, retry with
backoff, and the config-driven read — served by a stdlib HTTP server (the
sandbox analog of the reference's mockserver e2e,
connector-http-e2e/src/test/resources/http_*_to_assert.conf)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from seatunnel_spark.sources.http import (
    fetch_http,
    jsonpath_values,
    read_http_source,
    rows_from_response,
)

BOOKS = {
    "store": {
        "book": [
            {"category": "fiction", "author": "a1", "title": "t1", "price": 8.95},
            {"category": "science", "author": "a2", "title": "t2", "price": 12.99},
            {"category": "fiction", "author": "a3", "title": "t3", "price": 8.99},
        ]
    }
}


class _Handler(BaseHTTPRequestHandler):
    fail_next = {"n": 0}

    def log_message(self, *a):  # keep test output clean
        pass

    def _send(self, code: int, body: str, ctype="application/json"):
        data = body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        if u.path == "/books":
            self._send(200, json.dumps(BOOKS))
        elif u.path == "/list":
            self._send(200, json.dumps([{"id": i, "name": f"n{i}"} for i in range(5)]))
        elif u.path == "/jsonl":
            lines = [json.dumps({"id": i, "name": f"n{i}"}) for i in range(4)]
            self._send(200, "\n".join(lines))
        elif u.path == "/paged":
            page = int(q.get("page", "1"))
            if page <= 3:
                rows = [{"id": (page - 1) * 2 + j, "page": page} for j in range(2)]
            else:
                rows = []
            self._send(200, json.dumps({"data": rows}))
        elif u.path == "/flaky":
            if self.fail_next["n"] > 0:
                self.fail_next["n"] -= 1
                self._send(500, "boom")
            else:
                self._send(200, json.dumps([{"id": 1, "name": "ok"}]))
        else:
            self._send(404, "{}")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n) or b"{}")
        self._send(200, json.dumps([{"echo": body.get("q", ""), "auth": self.headers.get("X-Token", "")}]))


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_jsonpath_subset():
    assert jsonpath_values(BOOKS, "$.store.book[*].category") == [
        "fiction", "science", "fiction"]
    assert jsonpath_values(BOOKS, "$.store.book[1].price") == [12.99]
    assert jsonpath_values(BOOKS, "$.store.book.*") == BOOKS["store"]["book"]
    assert jsonpath_values(BOOKS, "$.store.book") == [BOOKS["store"]["book"]]
    # missing leaf -> None; missing interior -> no match (jayway options)
    assert jsonpath_values(BOOKS, "$.store.book[0].missing") == [None]
    assert jsonpath_values(BOOKS, "$.nope.deeper") == []
    with pytest.raises(ValueError, match="jsonpath"):
        jsonpath_values(BOOKS, "store.book")


def test_rows_from_response_shapes():
    names = ["category", "author", "title", "price"]
    # content_field: path to the array of row objects
    rows = rows_from_response(
        json.dumps(BOOKS), names, content_field="$.store.book.*")
    assert len(rows) == 3 and rows[0]["category"] == "fiction"
    # json_field: parallel columnwise paths zipped into rows
    jf = {n: f"$.store.book[*].{n}" for n in names}
    rows = rows_from_response(json.dumps(BOOKS), names, json_field=jf)
    assert [r["author"] for r in rows] == ["a1", "a2", "a3"]
    # inconsistent match counts must be loud (FIELD_DATA_IS_INCONSISTENT)
    bad = dict(jf, price="$.store.book[0].price")
    with pytest.raises(ValueError, match="inconsistent"):
        rows_from_response(json.dumps(BOOKS), names, json_field=bad)
    # bare array / single object / jsonl
    assert len(rows_from_response('[{"a": 1}, {"a": 2}]', ["a"])) == 2
    assert rows_from_response('{"a": 7}', ["a"]) == [{"a": 7}]
    assert [r["a"] for r in rows_from_response(
        '{"a": 1}\n{"a": 2}', ["a"], enable_multi_lines=True)] == [1, 2]
    # text format: whole body or per line
    assert rows_from_response("hello", ["line"], fmt="text") == [{"line": "hello"}]
    assert len(rows_from_response("x\ny", ["line"], fmt="text",
                                  enable_multi_lines=True)) == 2
    # nested values render as canonical JSON text for string columns
    got = rows_from_response('[{"a": {"b": 1}}]', ["a"])
    assert got == [{"a": '{"b":1}'}]


def test_fetch_retry_with_backoff(server):
    _Handler.fail_next["n"] = 2
    body = fetch_http(f"{server}/flaky", retry=3, retry_backoff_multiplier_ms=1)
    assert json.loads(body)[0]["name"] == "ok"
    _Handler.fail_next["n"] = 2
    with pytest.raises(ConnectionError, match="after 1 attempts"):
        fetch_http(f"{server}/flaky", retry=0)


def test_read_http_source_basic(spark, server):
    df = read_http_source(spark, {
        "url": f"{server}/books",
        "content_field": "$.store.book.*",
        "schema": {"fields": {"category": "string", "author": "string",
                              "title": "string", "price": "double"}},
    })
    rows = df.orderBy("author").collect()
    assert [r["author"] for r in rows] == ["a1", "a2", "a3"]
    assert rows[1]["price"] == 12.99
    assert df.schema["price"].dataType.typeName() == "double"


def test_read_http_source_post_headers(spark, server):
    df = read_http_source(spark, {
        "url": f"{server}/echo", "method": "POST",
        "headers": {"X-Token": "secret", "Content-Type": "application/json"},
        "body": json.dumps({"q": "hello"}),
        "schema": {"fields": {"echo": "string", "auth": "string"}},
    })
    r = df.collect()[0]
    assert r["echo"] == "hello" and r["auth"] == "secret"


def test_read_http_source_paged_distributed(spark, server):
    """Known page count -> pages fan out through mapInPandas (executor-side
    fetch), and the union of pages is complete and exact."""
    df = read_http_source(spark, {
        "url": f"{server}/paged",
        "content_field": "$.data",
        "schema": {"fields": {"id": "bigint", "page": "int"}},
        "pagination": {"page_field": "page", "start": 1, "total_pages": 3},
    })
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # distributed, not a driver loop
    rows = df.orderBy("id").collect()
    assert [r["id"] for r in rows] == [0, 1, 2, 3, 4, 5]
    assert {r["page"] for r in rows} == {1, 2, 3}


def test_read_http_source_paged_until_empty(spark, server):
    df = read_http_source(spark, {
        "url": f"{server}/paged",
        "content_field": "$.data",
        "schema": {"fields": {"id": "bigint", "page": "int"}},
        "pagination": {"page_field": "page", "start": 1, "max_pages": 50},
    })
    assert df.count() == 6  # stopped at the first empty page, not max_pages


def test_http_conf_through_run_job(spark, server):
    """A reference-shaped Http .conf (http_contentjson_to_assert.conf) runs
    through the HOCON loader and the config runner into an Assert sink."""
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      Http {{
        result_table_name = "http"
        url = "{server}/books"
        method = "GET"
        format = "json"
        content_field = "$.store.book.*"
        schema = {{ fields {{ category = string  author = string
                              title = string  price = double }} }}
      }}
    }}
    sink {{
      Assert {{
        source_table_name = "http"
        rules {{ min_rows = 3  max_rows = 3
                 field_rules = [{{ field = "author"  not_null = true }}] }}
      }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Assert#0"]["_n"] == 3  # all rules passed, 3 rows seen
