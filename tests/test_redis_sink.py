"""Redis sink seam: command rendering per RedisDataType, RESP encoding,
live socket execution against a tiny in-process RESP server, and the
config surface in dry_run + executing modes."""

from __future__ import annotations

import json
import socket
import socketserver
import threading

import pytest

from seatunnel_spark.sinks.redis import (
    batch_commands,
    execute_commands,
    resp_encode,
    row_commands,
)

ROW = {"id": 7, "name": "alice"}
COLS = ["id", "name"]


def test_row_commands_per_data_type():
    # KEY -> SET key json; key comes from the key_field's row value
    assert row_commands(ROW, COLS, "id") == [["SET", "7", '{"id":7,"name":"alice"}']]
    # literal key when key_field is not a column (RedisSinkWriter.java:56-60)
    assert row_commands(ROW, COLS, "all_users", "list") == [
        ["LPUSH", "all_users", '{"id":7,"name":"alice"}']]
    # HASH -> per-field map; non-strings serialize as JSON scalars
    assert row_commands(ROW, COLS, "id", "hash") == [
        ["HSET", "7", "id", "7", "name", "alice"]]
    assert row_commands(ROW, COLS, "id", "set")[0][0] == "SADD"
    # ZSET scores every member 1 (RedisDataType.java:85)
    assert row_commands(ROW, COLS, "id", "zset") == [
        ["ZADD", "7", "1", '{"id":7,"name":"alice"}']]
    # expire > 0 appends EXPIRE to every type
    cmds = row_commands(ROW, COLS, "id", "key", expire=120)
    assert cmds[1] == ["EXPIRE", "7", "120"]
    with pytest.raises(ValueError, match="data_type"):
        row_commands(ROW, COLS, "id", "stream")


def test_resp_encoding_exact_bytes():
    assert resp_encode(["SET", "k", "v1"]) == b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$2\r\nv1\r\n"


class _RespServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    seen: list[bytes] = []


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        buf = b""
        while True:
            chunk = self.request.recv(65536)
            if not chunk:
                break
            buf += chunk
        self.server.seen.append(buf)
        n = buf.count(b"*")  # one top-level array per command
        self.request.sendall(b"+OK\r\n" * n)


@pytest.fixture()
def resp_server():
    srv = _RespServer(("127.0.0.1", 0), _Handler)
    srv.seen = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def test_execute_commands_over_socket(resp_server):
    host, port = resp_server.server_address
    replies = execute_commands(host, port, [["SET", "a", "1"], ["SET", "b", "2"]])
    assert replies == ["+OK", "+OK"]
    assert resp_server.seen[0].startswith(b"*3\r\n$3\r\nSET\r\n")


def test_redis_conf_dry_run_and_live(spark, resp_server):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    host, port = resp_server.server_address
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      FakeSource {{ result_table_name = "t"  row.num = 3
                    schema = {{ fields {{ id = bigint  name = string }} }} }}
    }}
    sink {{
      Redis {{ source_table_name = "t"  host = "{host}"  port = {port}
               key = "id"  data_type = "key"  expire = 60  dry_run = true }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    cmds = res["Redis#0"]["commands"]
    assert len(cmds) == 6  # 3 SETs + 3 EXPIREs
    assert {c[0] for c in cmds} == {"SET", "EXPIRE"}
    assert all(json.loads(c[2]).keys() == {"id", "name"} for c in cmds if c[0] == "SET")

    live = conf.replace("dry_run = true", "dry_run = false")
    res = run_job(spark, load_job_config(live))
    assert res["Redis#0"]["written"] and res["Redis#0"]["replies"] == 6
    assert any(b"EXPIRE" in s for s in resp_server.seen)
