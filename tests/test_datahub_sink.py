"""Aliyun DataHub sink (sinks/datahub.py): documented signature
algorithm, pub-body rendering, and a config e2e executing against a
local server that verifies the Authorization header byte-for-byte.

Reference: connector-datahub sink/DataHubWriter.java (putRecords +
retryTimes), config/DataHubConfig.java (endpoint/accessId/accessKey/
project/topic/timeout/retryTimes)."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sinks.datahub import (
    datahub_signature,
    pub_body,
    put_records_request,
    requests_for_batch,
)

DATE = "Mon, 17 Aug 2026 12:00:00 GMT"


def test_signature_matches_documented_algorithm():
    sign_str = (
        "POST\napplication/json\n" + DATE +
        "\nx-datahub-client-version:1.1\n/projects/p/topics/t/shards"
    )
    want = base64.b64encode(
        hmac.new(b"s3cret", sign_str.encode(), hashlib.sha1).digest()
    ).decode()
    got = datahub_signature(
        "s3cret", "post", "application/json", DATE,
        "/projects/p/topics/t/shards",
        datahub_headers={"X-DataHub-Client-Version": " 1.1 ",
                         "Content-Length": "99"},
    )
    assert got == want  # x-datahub-* sorted+lowercased, others excluded


def test_pub_body_rendering():
    body = json.loads(pub_body(
        [{"id": 1, "name": "a", "ok": True}, {"id": 2, "name": None, "ok": None}],
        ["id", "name", "ok"],
        shard_id="0",
    ))
    assert body["Action"] == "pub"
    assert body["Records"] == [
        {"Data": ["1", "a", "true"], "ShardId": "0"},
        {"Data": ["2", None, None], "ShardId": "0"},
    ]


def test_request_shape_and_chunking(spark):
    df = spark.createDataFrame(
        [(i, f"n{i}", "I", i) for i in range(5)],
        "id int, name string, op string, seq long",
    )
    reqs = requests_for_batch(
        df, "http://dh.example.com", "p1", "t1", "AKID", "AKSECRET",
        date=DATE, chunk_rows=2,
    )
    assert len(reqs) == 3  # 5 rows / 2-row chunks
    r = reqs[0]
    assert r.url == "http://dh.example.com/projects/p1/topics/t1/shards"
    assert r.method == "POST"
    assert r.headers["Authorization"].startswith("DATAHUB AKID:")
    body = json.loads(r.body)
    # op/seq bookkeeping columns are not part of the tuple schema
    assert body["Records"][0]["Data"] == ["0", "n0"]


def test_config_e2e_against_local_server(spark):
    got: list[dict] = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            got.append({
                "path": self.path,
                "auth": self.headers["Authorization"],
                "ctype": self.headers["Content-Type"],
                "body": body.decode(),
            })
            self.send_response(200)
            out = json.dumps({"FailedRecordCount": 0}).encode()
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from seatunnel_spark.config import run_job
        from seatunnel_spark.hocon import load_job_config

        conf = f"""
        env {{ job.mode = "BATCH" }}
        source {{ FakeSource {{
            result_table_name = "t"
            schema {{ fields {{ id = "int", name = "string" }} }}
            rows = [
              {{ kind = INSERT, fields = [1, "a"] }},
              {{ kind = INSERT, fields = [2, "b"] }}
            ]
        }} }}
        sink {{ DataHub {{
            source_table_name = "t"
            endpoint = "http://127.0.0.1:{srv.server_address[1]}"
            accessId = "AKID"
            accessKey = "AKSECRET"
            project = "p1"
            topic = "t1"
            date = "{DATE}"
        }} }}
        """
        run_job(spark, load_job_config(conf))
        assert len(got) == 1
        g = got[0]
        assert g["path"] == "/projects/p1/topics/t1/shards"
        # recompute the documented signature over what the server saw
        sign_str = (
            "POST\n" + g["ctype"] + "\n" + DATE +
            "\nx-datahub-client-version:1.1\n/projects/p1/topics/t1/shards"
        )
        want = base64.b64encode(
            hmac.new(b"AKSECRET", sign_str.encode(), hashlib.sha1).digest()
        ).decode()
        assert g["auth"] == f"DATAHUB AKID:{want}"
        body = json.loads(g["body"])
        assert body["Action"] == "pub"
        assert sorted(r["Data"] for r in body["Records"]) == [
            ["1", "a"], ["2", "b"],
        ]
    finally:
        srv.shutdown()


def test_config_missing_keys_raise(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source { FakeSource {
        result_table_name = "t"
        schema { fields { id = "int" } }
        rows = [ { kind = INSERT, fields = [1] } ]
    } }
    sink { DataHub { source_table_name = "t" endpoint = "http://x" } }
    """
    with pytest.raises(ConfigError, match="DataHub sink needs accessId"):
        run_job(spark, load_job_config(conf))
