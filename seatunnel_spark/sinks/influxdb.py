"""InfluxDB sink — line-protocol seam: render the exact line-protocol
points the reference serializer builds and the HTTP /write request that
carries them (fully executable with stdlib urllib — InfluxDB's write API
is plain HTTP).

Reference: connector-influxdb ``serialize/DefaultSerializer.java`` — a
row maps to one point: ``measurement`` from config, tags from
``key_tags`` columns, the timestamp from ``key_time`` (epoch ms), and
every remaining column becomes a field; ``config/SinkConfig.java`` adds
url / database / batch_size / retention policy options.

Line protocol (public InfluxDB wire format)::

    measurement,tag1=v1,tag2=v2 field1=1i,field2="s",field3=1.5 1700000000000

Escaping rules per the spec: measurement escapes comma/space; tag keys,
tag values and field keys escape comma/equals/space; string field values
are double-quoted with backslash-escaped quotes. Integer fields carry the
``i`` suffix, booleans are true/false, floats are bare. Timestamps are
written at millisecond precision with ``precision=ms`` on the request.
"""

from __future__ import annotations

from seatunnel_spark.sinks.streamload import StreamLoadRequest, _basic_auth


def _esc_tag(s: str) -> str:
    return (
        str(s).replace("\\", "\\\\").replace(",", "\\,")
        .replace("=", "\\=").replace(" ", "\\ ")
    )


def _esc_measurement(s: str) -> str:
    return str(s).replace("\\", "\\\\").replace(",", "\\,").replace(" ", "\\ ")


def _field_value(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"{v}i"
    if isinstance(v, float):
        return repr(v)
    return '"' + str(v).replace("\\", "\\\\").replace('"', '\\"') + '"'


def line_protocol(
    rows: list[dict],
    columns: list[str],
    measurement: str,
    key_tags: list[str] | None = None,
    key_time: str | None = None,
) -> list[str]:
    """Rows → line-protocol lines (one point per row; rows with no
    non-null fields are skipped — a point needs at least one field)."""
    tags = key_tags or []
    field_cols = [c for c in columns if c not in tags and c != key_time]
    if not field_cols:
        raise ValueError("influxdb point needs at least one field column")
    out: list[str] = []
    for r in rows:
        parts = [_esc_measurement(measurement)]
        for t in tags:
            v = r.get(t)
            if v is not None:
                parts.append(f",{_esc_tag(t)}={_esc_tag(v)}")
        fields = []
        for c in field_cols:
            fv = _field_value(r.get(c))
            if fv is not None:
                fields.append(f"{_esc_tag(c)}={fv}")
        if not fields:
            continue
        line = "".join(parts) + " " + ",".join(fields)
        if key_time is not None and r.get(key_time) is not None:
            line += f" {int(r[key_time])}"
        out.append(line)
    return out


def write_request(
    url: str,
    database: str,
    lines: list[str],
    username: str | None = None,
    password: str | None = None,
    retention_policy: str | None = None,
) -> StreamLoadRequest:
    """POST {url}/write?db=...&precision=ms with the line batch."""
    import urllib.parse

    q = {"db": database, "precision": "ms"}
    if retention_policy:
        q["rp"] = retention_policy
    headers = {"Content-Type": "text/plain; charset=utf-8"}
    if username is not None:
        headers["Authorization"] = _basic_auth(username, password or "")
    return StreamLoadRequest(
        url=f"{url.rstrip('/')}/write?{urllib.parse.urlencode(q)}",
        method="POST",
        headers=headers,
        body="\n".join(lines) + ("\n" if lines else ""),
    )


def requests_for_batch(
    df,
    url: str,
    database: str,
    measurement: str,
    key_tags: list[str] | None = None,
    key_time: str | None = None,
    batch_size: int = 1024,
    username: str | None = None,
    password: str | None = None,
    retention_policy: str | None = None,
) -> list[StreamLoadRequest]:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).collect()]
    lines = line_protocol(rows, cols, measurement, key_tags, key_time)
    return [
        write_request(url, database, lines[i : i + batch_size],
                      username, password, retention_policy)
        for i in range(0, max(len(lines), 1), batch_size)
    ]


def foreach_partition_sender(
    url: str,
    database: str,
    measurement: str,
    columns: list[str],
    key_tags: list[str] | None = None,
    key_time: str | None = None,
    batch_size: int = 1024,
    username: str | None = None,
    password: str | None = None,
    retention_policy: str | None = None,
    op_col: str = "op",
    dry_run_sink=None,
):
    """Distributed twin of ``requests_for_batch`` for ``df.foreachPartition``
    (reference: per-subtask ``InfluxDBSinkWriter.write`` batching points).
    Points are (measurement, tags, time)-keyed upserts in InfluxDB, so a
    retried task re-writing the same points converges — at-least-once
    send, idempotent effect when key_time is set (without a time column
    each write stamps server-side time: then replays duplicate, same as
    the reference writer)."""
    from seatunnel_spark.sinks.partition_send import chunked, partition_sender

    def build(rows: list[dict]):
        lines = line_protocol(rows, columns, measurement, key_tags, key_time)
        for i in range(0, len(lines), max(1, batch_size)):
            yield write_request(
                url, database, lines[i : i + batch_size],
                username, password, retention_policy,
            )

    return partition_sender(
        build, columns, op_col=op_col, drop_kinds=("D", "-U"),
        dry_run_sink=dry_run_sink,
    )
