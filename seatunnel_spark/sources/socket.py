"""Socket connector — fully executable with stdlib (plain TCP text).

Reference: connector-socket — the source reads newline-delimited text
from a TCP endpoint into single-string rows
(``SocketSourceReader``: delimiter "\\n", trailing partial line emitted
on close); the sink serializes each row as JSON and writes it back over a
socket with bounded retries (``SocketClient``).

Spark mapping:
- STREAMING: Spark's built-in ``socket`` source IS this connector —
  ``socket_stream`` returns the one-line reader form.
- BATCH (the config runner's mode): the endpoint is read on the driver
  until the server closes — a socket is a single ordered byte stream, so
  a driver read is the honest shape (the reference reads it in one
  single-split reader too) — then parallelized from memory.
"""

from __future__ import annotations

import json
import socket


def read_socket_lines(host: str, port: int, timeout_s: float = 30.0) -> list[str]:
    """Bounded read: newline-split text until the peer closes; a trailing
    unterminated line is emitted too (SocketSourceReader parity)."""
    with socket.create_connection((host, int(port)), timeout=timeout_s) as s:
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    text = buf.decode("utf-8", errors="replace")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return lines


def socket_batch_source(spark, opts: dict):
    """Config-shaped BATCH read: (host, port) → single-column DataFrame
    (``value: string``), one row per line — the reference's row shape."""
    if not opts.get("host") or opts.get("port") is None:
        raise ValueError("Socket source needs host and port")
    lines = read_socket_lines(
        opts["host"], int(opts["port"]), timeout_s=float(opts.get("timeout_s", 30.0))
    )
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def socket_stream(spark, host: str, port: int):
    """STREAMING form: Spark's built-in socket source (one ``value:
    string`` column, unbounded)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", int(port))
        .load()
    )


def write_socket_rows(
    rows: list[dict],
    host: str,
    port: int,
    max_retries: int = 3,
    timeout_s: float = 30.0,
) -> int:
    """Sink path (SocketClient parity): each row as one JSON line, bounded
    reconnect retries, returns rows written."""
    payload = "".join(
        json.dumps(r, separators=(",", ":"), default=str) + "\n" for r in rows
    ).encode()
    last: Exception | None = None
    for _ in range(int(max_retries) + 1):
        try:
            with socket.create_connection((host, int(port)), timeout=timeout_s) as s:
                s.sendall(payload)
            return len(rows)
        except OSError as e:
            last = e
    raise ConnectionError(f"socket sink failed after {max_retries + 1} attempts: {last}")
