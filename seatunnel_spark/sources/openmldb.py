"""OpenMLDB source — bounded SQL read over the public APIServer REST
surface: ``POST http://{host}:{port}/dbs/{database}`` with body
``{"mode": "online", "sql": "..."}`` returns
``{"code": 0, "msg": "ok", "data": {"schema": [...], "data": [[...]]}}``;
each inner list is one row bound by position to the declared
``schema.fields`` (the reference binds the SDK ResultSet through the
declared SeaTunnelRowType the same way).

Reference: connector-openmldb ``source/OpenMldbSourceReader.java``
(executeSQL(database, sql) → per-field typed getObject over
BOOLEAN/SMALLINT/INT/BIGINT/FLOAT/DOUBLE/STRING/DATE/TIMESTAMP) and
``config/OpenMldbConfig.java`` (zk_host / zk_path / host / port /
cluster_mode / database / sql / session_timeout / request_timeout).

Transport note: the reference rides the proprietary `4paradigm` SDK
(zk-brokered in cluster mode). The public, stdlib-executable surface is
the OpenMLDB APIServer's JSON REST API, which needs a direct host/port —
so `zk_host`-only configs are refused loudly instead of silently
half-working; `session_timeout`/`request_timeout` (ms) bound the HTTP
exchange."""

from __future__ import annotations

import datetime
import json

from seatunnel_spark.sources.http import fetch_http

# Response-value → declared-type coercions for the APIServer's JSON
# encoding: timestamps arrive as epoch-millis integers, dates as
# "YYYY-mm-dd" strings; numerics may arrive widened (JSON has one number
# type). Mirrors OpenMldbSourceReader.getObject's per-SqlType switch.
def _coerce(v, spark_type: str):
    if v is None:
        return None
    t = spark_type.strip().lower()
    if t in ("timestamp", "timestamp_ntz"):
        if isinstance(v, (int, float)):
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                milliseconds=int(v)
            )
        return datetime.datetime.fromisoformat(str(v))
    if t == "date":
        if isinstance(v, str):
            return datetime.date.fromisoformat(v)
        # days since epoch (the SDK's internal date form)
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
    if t in ("int", "integer", "smallint", "tinyint", "bigint", "long", "short"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t in ("boolean", "bool"):
        return bool(v)
    if t == "string":
        return str(v)
    return v


def query_url(host: str, port: int, database: str) -> str:
    return f"http://{host}:{int(port)}/dbs/{database}"


def query_body(sql: str, mode: str = "online") -> str:
    """The APIServer query envelope. ``online`` executes synchronously in
    the online engine (the rows-returning path a bounded source needs);
    ``offsync`` waits on an offline batch job."""
    if mode not in ("online", "offsync", "offasync"):
        raise ValueError(f"unknown OpenMLDB query mode {mode!r}")
    return json.dumps({"mode": mode, "sql": sql}, separators=(",", ":"))


def rows_from_response(payload: str, fields: dict[str, str]) -> list[tuple]:
    """APIServer response → typed row tuples bound by position. Raises on
    ``code != 0`` (the server's error envelope) rather than yielding an
    empty table."""
    doc = json.loads(payload)
    if doc.get("code", 0) != 0:
        raise RuntimeError(
            f"OpenMLDB APIServer error {doc.get('code')}: {doc.get('msg')}"
        )
    data = (doc.get("data") or {}).get("data") or []
    types = list(fields.values())
    out = []
    for row in data:
        if len(row) != len(types):
            raise ValueError(
                f"OpenMLDB row arity {len(row)} != declared schema arity "
                f"{len(types)}"
            )
        out.append(tuple(_coerce(v, t) for v, t in zip(row, types)))
    return out


def read_openmldb_source(spark, opts: dict):
    """Config-shaped read: host / port / database / sql / schema.fields
    (+ mode, request_timeout ms, retry). cluster_mode is accepted for
    config parity; zk-only addressing has no public REST form and raises."""
    fields = (opts.get("schema") or {}).get("fields") or {}
    if not fields:
        raise ValueError("OpenMldb source needs schema.fields")
    for k in ("database", "sql"):
        if not opts.get(k):
            raise ValueError(f"OpenMldb source needs {k}")
    if not opts.get("host"):
        if opts.get("zk_host"):
            raise ValueError(
                "OpenMldb zk_host addressing is SDK-only; point host/port "
                "at an OpenMLDB APIServer for the REST surface"
            )
        raise ValueError("OpenMldb source needs host")
    body = fetch_http(
        query_url(opts["host"], int(opts.get("port", 9080)), opts["database"]),
        method="POST",
        headers={"Content-Type": "application/json"},
        body=query_body(opts["sql"], opts.get("mode", "online")),
        retry=int(opts.get("retry", 0)),
        timeout_s=int(opts.get("request_timeout", 60_000)) / 1000.0,
    )
    ddl = ", ".join(f"{n} {t}" for n, t in fields.items())
    return spark.createDataFrame(rows_from_response(body, fields), ddl)
