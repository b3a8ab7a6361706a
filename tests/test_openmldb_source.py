"""OpenMLDB source over the public APIServer REST surface: request
rendering, typed row binding, error envelope, and a config e2e against a
local server."""

from __future__ import annotations

import datetime
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sources.openmldb import (
    query_body,
    query_url,
    rows_from_response,
)


def test_query_request_shape():
    assert query_url("omldb", 9080, "db1") == "http://omldb:9080/dbs/db1"
    assert json.loads(query_body("select * from t1")) == {
        "mode": "online",
        "sql": "select * from t1",
    }
    assert json.loads(query_body("select 1", mode="offsync"))["mode"] == "offsync"
    with pytest.raises(ValueError, match="mode"):
        query_body("select 1", mode="batch")


def test_typed_row_binding():
    payload = json.dumps({
        "code": 0, "msg": "ok",
        "data": {"schema": ["Int32", "String", "Timestamp", "Date", "Double", "Bool"],
                 "data": [[7, "a", 1735689600000, "2026-01-02", 1.5, True],
                          [None, None, None, None, None, None]]},
    })
    fields = {"id": "int", "name": "string", "ts": "timestamp",
              "d": "date", "score": "double", "ok": "boolean"}
    rows = rows_from_response(payload, fields)
    # epoch-millis → naive datetime, ISO string → date (the APIServer's
    # JSON encodings), nulls pass through
    assert rows[0] == (7, "a", datetime.datetime(2025, 1, 1, 0, 0),
                       datetime.date(2026, 1, 2), 1.5, True)
    assert rows[1] == (None,) * 6


def test_error_envelope_and_arity():
    with pytest.raises(RuntimeError, match="APIServer error 2000"):
        rows_from_response(json.dumps({"code": 2000, "msg": "bad sql"}),
                           {"id": "int"})
    with pytest.raises(ValueError, match="arity"):
        rows_from_response(
            json.dumps({"code": 0, "data": {"data": [[1, 2]]}}), {"id": "int"})


def test_zk_only_addressing_refused(spark):
    from seatunnel_spark.sources.openmldb import read_openmldb_source

    with pytest.raises(ValueError, match="SDK-only"):
        read_openmldb_source(spark, {
            "zk_host": "zk:2181", "zk_path": "/openmldb",
            "database": "db1", "sql": "select 1",
            "schema": {"fields": {"x": "int"}},
        })


class _ApiServer(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        assert self.path == "/dbs/testdb"
        req = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        assert req == {"mode": "online", "sql": "select id, name, ts from t1"}
        body = json.dumps({
            "code": 0, "msg": "ok",
            "data": {"schema": ["Int32", "String", "Timestamp"],
                     "data": [[1, "a", 1000], [2, "b", 2000], [3, None, 3000]]},
        }).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_openmldb_source_through_config(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiServer)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      OpenMldb {{ result_table_name = "s"
                  host = "127.0.0.1"  port = {srv.server_address[1]}
                  database = "testdb"  cluster_mode = false
                  sql = "select id, name, ts from t1"
                  schema = {{ fields {{ id = int  name = string  ts = timestamp }} }} }}
    }}
    sink {{
      Assert {{ source_table_name = "s"  rules {{ min_rows = 3  max_rows = 3 }} }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Assert#0"]["_n"] == 3
    srv.shutdown()
