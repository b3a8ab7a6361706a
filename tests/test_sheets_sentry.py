"""Google Sheets source (values.get against a local server) and Sentry
sink (store-API request parity)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sinks.sentry import parse_dsn, store_event_request
from seatunnel_spark.sources.sheets import rows_from_values, values_url


def test_values_url_and_row_binding():
    url = values_url("SHEET1", "People", "A1:B3")
    assert url == ("https://sheets.googleapis.com/v4/spreadsheets/SHEET1"
                   "/values/People%21A1%3AB3")
    rows = rows_from_values(
        json.dumps({"values": [["1", "alice"], ["2"]]}), ["id", "name"])
    # short rows pad with None (trailing empty cells omitted by the API)
    assert rows == [{"id": "1", "name": "alice"}, {"id": "2", "name": None}]
    assert rows_from_values("{}", ["id"]) == []


class _Sheets(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        assert self.path.startswith("/v4/spreadsheets/S1/values/")
        body = json.dumps({"values": [["1", "a"], ["2", "b"], ["3", "c"]]}).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_sheets_source_through_config(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Sheets)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      GoogleSheets {{ result_table_name = "s"
                      sheet_id = "S1"  sheet_name = "People"  range = "A1:B3"
                      base_url = "{base}"
                      schema = {{ fields {{ id = string  name = string }} }} }}
    }}
    sink {{
      Assert {{ source_table_name = "s"  rules {{ min_rows = 3  max_rows = 3 }} }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Assert#0"]["_n"] == 3
    srv.shutdown()


def test_sentry_dsn_and_event_request():
    d = parse_dsn("https://abc123@o99.ingest.sentry.io/424242")
    assert d == {"scheme": "https", "key": "abc123",
                 "host": "o99.ingest.sentry.io", "project": "424242"}
    r = store_event_request(
        "https://abc123@o99.ingest.sentry.io/424242",
        '{"id": 1}', environment="prod", release="r5",
        event_id="e" * 32, timestamp="2026-01-01T00:00:00",
    )
    assert r.url == "https://o99.ingest.sentry.io/api/424242/store/"
    assert "sentry_key=abc123" in r.headers["X-Sentry-Auth"]
    ev = json.loads(r.body)
    assert ev["message"] == '{"id": 1}'
    assert ev["environment"] == "prod" and ev["release"] == "r5"
    with pytest.raises(ValueError, match="dsn"):
        parse_dsn("not-a-dsn")


def test_sentry_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 2
                   schema = { fields { id = bigint } } }
    }
    sink {
      Sentry { source_table_name = "t"
               dsn = "https://k@sentry.example/7"  env = "staging"
               dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["Sentry#0"]["requests"]
    assert len(reqs) == 2
    assert all(r["url"] == "https://sentry.example/api/7/store/" for r in reqs)
    assert all(json.loads(r["body"])["environment"] == "staging" for r in reqs)
