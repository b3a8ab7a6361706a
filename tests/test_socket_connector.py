"""Socket source/sink — executed for real against in-process TCP servers
(the sandbox analog of connector-socket-e2e)."""

from __future__ import annotations

import json
import socket
import socketserver
import threading

import pytest

from seatunnel_spark.sources.socket import read_socket_lines, write_socket_rows


def _serve_once(payload: bytes):
    """One-shot TCP server: send payload, close. Returns (host, port)."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def run():
        conn, _ = srv.accept()
        conn.sendall(payload)
        conn.close()
        srv.close()

    threading.Thread(target=run, daemon=True).start()
    return srv.getsockname()


def test_read_socket_lines_including_trailing_partial():
    host, port = _serve_once(b"alpha\nbeta\ngamma")  # no trailing newline
    lines = read_socket_lines(host, port)
    assert lines == ["alpha", "beta", "gamma"]  # partial tail emitted too
    host, port = _serve_once(b"one\ntwo\n")
    assert read_socket_lines(host, port) == ["one", "two"]


class _Collector(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    got: list[bytes] = []


class _Recv(socketserver.BaseRequestHandler):
    def handle(self):
        buf = b""
        while True:
            chunk = self.request.recv(65536)
            if not chunk:
                break
            buf += chunk
        self.server.got.append(buf)


@pytest.fixture()
def collector():
    srv = _Collector(("127.0.0.1", 0), _Recv)
    srv.got = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _wait_got(srv, n, timeout_s=5.0):
    import time

    t0 = time.time()
    while len(srv.got) < n and time.time() - t0 < timeout_s:
        time.sleep(0.02)
    assert len(srv.got) >= n, f"collector saw {len(srv.got)} payloads"


def test_write_socket_rows_json_lines(collector):
    host, port = collector.server_address
    n = write_socket_rows([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
                          host, port)
    assert n == 2
    _wait_got(collector, 1)
    lines = collector.got[0].decode().strip().split("\n")
    assert [json.loads(ln)["id"] for ln in lines] == [1, 2]
    with pytest.raises(ConnectionError, match="attempts"):
        write_socket_rows([{"id": 1}], "127.0.0.1", 1, max_retries=1)


def test_socket_source_to_socket_sink_through_config(spark, collector):
    """socket -> transform -> socket, config-driven end to end."""
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    host, port = _serve_once(b"aa\nbb\ncc\n")
    chost, cport = collector.server_address
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      Socket {{ result_table_name = "s"  host = "{host}"  port = {port} }}
    }}
    transform {{
      Sql {{ source_table_name = "s"  result_table_name = "t"
             query = "SELECT UCASE(value) AS value FROM s" }}
    }}
    sink {{
      Socket {{ source_table_name = "t"  host = "{chost}"  port = {cport} }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    assert res["Socket#0"]["rows"] == 3
    _wait_got(collector, 1)
    lines = collector.got[-1].decode().strip().split("\n")
    assert [json.loads(ln)["value"] for ln in lines] == ["AA", "BB", "CC"]
