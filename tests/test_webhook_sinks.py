"""Slack / DingTalk / Feishu notification sinks: request-text parity
(including the documented DingTalk HMAC signature) and the config
surface, with one live POST against a local HTTP server."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from seatunnel_spark.sinks.webhooks import (
    dingtalk_send,
    dingtalk_sign,
    feishu_send,
    slack_post_message,
)


def test_slack_request_shape():
    r = slack_post_message("xoxb-token", "C12345", "hello world")
    assert r.url == "https://slack.com/api/chat.postMessage"
    assert r.headers["Authorization"] == "Bearer xoxb-token"
    assert json.loads(r.body) == {"channel": "C12345", "text": "hello world"}


def test_dingtalk_signature_matches_reference_algorithm():
    secret, ts = "SEC-abc", 1700000000123
    expect = urllib.parse.quote_plus(base64.b64encode(
        hmac.new(secret.encode(), f"{ts}\n{secret}".encode(),
                 hashlib.sha256).digest()).decode())
    assert dingtalk_sign(secret, ts) == expect
    r = dingtalk_send("https://oapi.dingtalk.com/robot/send?access_token=T",
                      "alert!", secret=secret, timestamp_ms=ts)
    assert r.url == ("https://oapi.dingtalk.com/robot/send?access_token=T"
                     f"&timestamp={ts}&sign={expect}")
    assert json.loads(r.body) == {"msgtype": "text",
                                  "text": {"content": "alert!"}}
    # unsigned webhook: plain URL
    r = dingtalk_send("https://oapi.dingtalk.com/robot/send?access_token=T", "x")
    assert "sign=" not in r.url
    with pytest.raises(ValueError, match="timestamp_ms"):
        dingtalk_send("u", "x", secret="s")


def test_feishu_request_shape():
    r = feishu_send("https://open.feishu.cn/open-apis/bot/v2/hook/H", "ping")
    assert json.loads(r.body) == {"msg_type": "text", "content": {"text": "ping"}}


class _Hook(BaseHTTPRequestHandler):
    seen: list[dict] = []

    def log_message(self, *a):
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        self.seen.append(json.loads(self.rfile.read(n)))
        body = b'{"ok": true}'
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def test_feishu_conf_live_post_and_dingtalk_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    _Hook.seen = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Hook)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/hook"
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      FakeSource {{ result_table_name = "t"  row.num = 2
                    schema = {{ fields {{ id = bigint  name = string }} }} }}
    }}
    sink {{
      Feishu {{ source_table_name = "t"  url = "{url}" }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Feishu#0"]["written"]
    assert len(_Hook.seen) == 2  # one message per row, actually POSTed
    assert all(m["msg_type"] == "text" for m in _Hook.seen)
    srv.shutdown()

    conf2 = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { id = bigint } } }
    }
    sink {
      DingTalk { source_table_name = "t"
                 url = "https://oapi.dingtalk.com/robot/send?access_token=T"
                 secret = "SEC"  timestamp_ms = 1700000000123
                 dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf2))
    reqs = res["DingTalk#0"]["requests"]
    assert len(reqs) == 3
    assert all("timestamp=1700000000123&sign=" in r["url"] for r in reqs)
