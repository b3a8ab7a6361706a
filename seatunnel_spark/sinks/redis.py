"""Redis sink — command-seam form: render the exact Redis commands the
reference writer issues per data type, RESP-encode them, and (when a
server exists) execute them over a plain socket. stdlib only.

Reference: connector-redis ``sink/RedisSinkWriter.java`` (key =
``key_field``'s row value when that column exists, else the literal key;
value = the row as JSON) and ``config/RedisDataType.java`` (KEY → SET,
HASH → HSET of the row's fields, LIST → LPUSH, SET → SADD, ZSET →
ZADD score 1; every type follows with EXPIRE when ``expire`` > 0).
Config surface: ``config/RedisConfig.java`` (host / port / auth / user /
key / data_type / expire).
"""

from __future__ import annotations

import json
import socket

DATA_TYPES = ("key", "hash", "list", "set", "zset")


def row_commands(
    row: dict,
    columns: list[str],
    key_field: str,
    data_type: str = "key",
    expire: int = -1,
) -> list[list[str]]:
    """One row → its Redis command list (RedisDataType.set parity)."""
    dt = data_type.lower()
    if dt not in DATA_TYPES:
        raise ValueError(f"unknown redis data_type {data_type!r}; use {DATA_TYPES}")
    key = str(row[key_field]) if key_field in columns else key_field
    doc = {c: row.get(c) for c in columns}
    value = json.dumps(doc, separators=(",", ":"))
    if dt == "key":
        cmds = [["SET", key, value]]
    elif dt == "hash":
        flat: list[str] = []
        for f, v in doc.items():
            flat += [f, v if isinstance(v, str) else json.dumps(v)]
        cmds = [["HSET", key, *flat]]
    elif dt == "list":
        cmds = [["LPUSH", key, value]]
    elif dt == "set":
        cmds = [["SADD", key, value]]
    else:  # zset — the reference scores every member 1
        cmds = [["ZADD", key, "1", value]]
    if expire > 0:
        cmds.append(["EXPIRE", key, str(int(expire))])
    return cmds


def batch_commands(
    df,
    key_field: str,
    data_type: str = "key",
    expire: int = -1,
) -> list[list[str]]:
    """Collected-batch path: every row's commands in row order."""
    cols = [c for c in df.columns if c not in ("op", "seq")]
    out: list[list[str]] = []
    for r in df.select(*cols).collect():
        out.extend(row_commands(r.asDict(), cols, key_field, data_type, expire))
    return out


def resp_encode(cmd: list[str]) -> bytes:
    """RESP array-of-bulk-strings encoding — the wire form any Redis server
    accepts verbatim."""
    out = [f"*{len(cmd)}\r\n".encode()]
    for arg in cmd:
        b = arg.encode() if isinstance(arg, str) else bytes(arg)
        out.append(b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n")
    return b"".join(out)


def execute_commands(
    host: str,
    port: int,
    cmds: list[list[str]],
    auth: str | None = None,
    user: str | None = None,
    timeout_s: float = 30.0,
) -> list[str]:
    """Pipeline the commands over one socket; returns the raw reply lines.
    An -ERR reply raises (no silent partial writes)."""
    pre: list[list[str]] = []
    if auth is not None:
        pre.append(["AUTH", *([user, auth] if user else [auth])])
    with socket.create_connection((host, int(port)), timeout=timeout_s) as s:
        payload = b"".join(resp_encode(c) for c in [*pre, *cmds])
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        buf = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    replies = [ln for ln in buf.decode(errors="replace").split("\r\n") if ln]
    errs = [r for r in replies if r.startswith("-")]
    if errs:
        raise RuntimeError(f"redis replied with errors: {errs[:3]}")
    return replies


def foreach_partition_sender(
    host: str,
    port: int,
    key_field: str,
    columns: list[str],
    data_type: str = "key",
    expire: int = -1,
    auth: str | None = None,
    user: str | None = None,
    op_col: str = "op",
    dry_run_sink=None,
):
    """Distributed twin of ``batch_commands`` + ``execute_commands`` for
    ``df.foreachPartition`` (reference: per-subtask ``RedisSinkWriter.write``
    issuing one command per row on its own Jedis connection). Each
    partition pipelines its rows over ONE socket. SET/HSET are keyed
    overwrites (replay converges); LPUSH/SADD/ZADD replays duplicate
    members exactly like the reference's re-sent writes —
    at-least-once, documented per data_type.

    ``dry_run_sink`` receives the command lists instead of opening a
    socket (request-shape tests)."""
    from seatunnel_spark.sinks.partition_send import partition_sender

    class _Pipeline:
        def __init__(self, cmds: list[list[str]]):
            self.cmds = cmds

        def execute(self):
            execute_commands(host, port, self.cmds, auth=auth, user=user)

    def build(rows: list[dict]):
        cmds: list[list[str]] = []
        for r in rows:
            cmds.extend(row_commands(r, columns, key_field, data_type, expire))
        if cmds:
            yield _Pipeline(cmds)

    return partition_sender(
        build, columns, op_col=op_col, drop_kinds=("D", "-U"),
        dry_run_sink=dry_run_sink,
    )
