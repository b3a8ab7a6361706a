"""SelectDB Cloud sink — the upload-then-COPY-INTO protocol as an
executable request seam (all plain HTTP): stage files via
``PUT http://{host}/copy/upload`` (the endpoint 307-redirects to object
storage; a follow-up PUT carries the bytes), then commit with the exact
``COPY INTO`` statement through ``POST http://{host}/copy/query``.

Reference: connector-selectdb-cloud ``sink/writer/SelectDBStageLoad.java``
(UPLOAD_URL_PATTERN, per-buffer file names), ``writer/CopySQLBuilder``
(COPY INTO {table} FROM @~('{files}') PROPERTIES ('copy.async'='false',
'copy.use_delete_sign'='true' when delete handling is on, + stage-load
props)) and ``committer/SelectDBCommitter`` (COMMIT_PATTERN /copy/query
with {"sql": copySQL} — replayed commits dedup server-side on the copy
file set).
"""

from __future__ import annotations

import json

from seatunnel_spark.sinks.streamload import StreamLoadRequest, _basic_auth


def upload_request(
    host_port: str,
    file_name: str,
    body: str,
    username: str = "admin",
    password: str = "",
) -> StreamLoadRequest:
    """The staged upload PUT (the server answers 307 with the storage URL;
    drivers then PUT the same body there — this request is step one)."""
    return StreamLoadRequest(
        url=f"http://{host_port}/copy/upload",
        method="PUT",
        headers={
            "Authorization": _basic_auth(username, password),
            "fileName": file_name,
        },
        body=body,
    )


def copy_into_sql(
    table_identifier: str,
    file_names: list[str],
    enable_delete: bool = False,
    props: dict | None = None,
) -> str:
    """CopySQLBuilder.buildCopySQL parity (async off, delete sign on when
    CDC delete handling is enabled)."""
    if not file_names:
        raise ValueError("copy into needs at least one staged file")
    merged = {"copy.async": "false"}
    if enable_delete:
        merged["copy.use_delete_sign"] = "true"
    merged.update({str(k): str(v) for k, v in (props or {}).items()})
    prop_text = ",".join(f"'{k}'='{v}'" for k, v in merged.items())
    return (
        f"COPY INTO {table_identifier} "
        f"FROM @~('{{{','.join(file_names)}}}') "
        f"PROPERTIES ({prop_text})"
    )


def commit_request(
    host_port: str,
    copy_sql: str,
    cluster: str | None = None,
    username: str = "admin",
    password: str = "",
) -> StreamLoadRequest:
    """SelectDBCommitter's /copy/query POST carrying the COPY statement."""
    body = {"sql": copy_sql}
    if cluster:
        body["cluster"] = cluster
    return StreamLoadRequest(
        url=f"http://{host_port}/copy/query",
        method="POST",
        headers={
            "Content-Type": "application/json",
            "Authorization": _basic_auth(username, password),
        },
        body=json.dumps(body, separators=(",", ":")),
    )
