"""MaxCompute (ODPS) sink — seam over the public RESTful API: the
reference rides the proprietary Tunnel SDK (protobuf block upload), but
its write semantics — append rows to a table / partition_spec, optional
overwrite — map 1:1 onto ODPS SQL submitted through the documented
public REST surface: ``POST {endpoint}/projects/{project}/instances``
with an ``<Instance><Job>…<SQL>…`` XML body and the documented
``Authorization: ODPS {accessId}:{base64(hmac-sha1)}`` request signing
(method, Content-MD5, Content-Type, Date, canonicalized x-odps-* headers
and resource — the algorithm every Aliyun ODPS client implements).

Reference: connector-maxcompute ``sink/MaxcomputeWriter.java`` (tunnel
createUploadSession(project, table[, PartitionSpec]) → write block 0 →
session.commit; overwrite truncates table/partition first) and
``config/MaxcomputeConfig.java`` (accessId / accesskey / endpoint /
project / table_name / partition_spec / overwrite / split_row).

The tunnel's per-block protobuf framing is SDK-internal; one SQL
instance per split_row chunk keeps each chunk atomic server-side (an
ODPS instance either runs or doesn't), which is the same at-least-once
contract the reference writer offers (commit happens in close()).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
from xml.sax.saxutils import escape

from seatunnel_spark.sinks.streamload import StreamLoadRequest


def odps_signature(
    access_key: str,
    method: str,
    content_md5: str,
    content_type: str,
    date: str,
    canonicalized_resource: str,
    odps_headers: dict | None = None,
) -> str:
    """The documented ODPS request signature: base64(HMAC-SHA1(accesskey,
    METHOD\\nContent-MD5\\nContent-Type\\nDate\\n{x-odps-* headers sorted,
    lowercased, one per line}{resource}))."""
    lines = [method.upper(), content_md5, content_type, date]
    hdrs = {
        k.lower().strip(): str(v).strip()
        for k, v in (odps_headers or {}).items()
        if k.lower().startswith("x-odps-")
    }
    for k in sorted(hdrs):
        lines.append(f"{k}:{hdrs[k]}")
    sign_str = "\n".join(lines) + "\n" + canonicalized_resource
    digest = hmac.new(
        access_key.encode(), sign_str.encode(), hashlib.sha1
    ).digest()
    return base64.b64encode(digest).decode()


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _partition_clause(partition_spec: str) -> str:
    """PartitionSpec text ("ds=20260101,region=bj" — quoted or not) →
    ``PARTITION (ds='20260101', region='bj')``."""
    parts = []
    for kv in partition_spec.split(","):
        k, _, v = kv.partition("=")
        if not _ or not k.strip():
            raise ValueError(f"bad partition_spec component {kv!r}")
        parts.append(f"{k.strip()}={_lit(v.strip().strip(chr(39)))}")
    return "PARTITION (" + ", ".join(parts) + ")"


def insert_sql(
    table: str,
    columns: list[str],
    rows: list[dict],
    partition_spec: str | None = None,
    overwrite: bool = False,
) -> str:
    """One multi-row ODPS ``INSERT INTO|OVERWRITE TABLE … VALUES`` —
    the SQL equivalent of the reference's tunnel block write (+ its
    overwrite flag, which truncates the target first)."""
    if not rows:
        raise ValueError("insert needs at least one row")
    verb = "INSERT OVERWRITE TABLE" if overwrite else "INSERT INTO TABLE"
    part = f" {_partition_clause(partition_spec)}" if partition_spec else ""
    cols = ", ".join(columns)
    values = ", ".join(
        "(" + ", ".join(_lit(r.get(c)) for c in columns) + ")" for r in rows
    )
    return f"{verb} {table}{part} ({cols}) VALUES {values};"


def instance_xml(sql: str, settings: str | None = None) -> str:
    """The documented instance-submission job body: one anonymous SQL
    task; ``settings`` is the JSON property the SDK forwards as task
    config. The query must be ';'-terminated (server-side requirement)."""
    if not sql.rstrip().endswith(";"):
        sql = sql.rstrip() + ";"
    props = ""
    if settings:
        props = (
            "<Config><Property><Name>settings</Name><Value>"
            + escape(settings)
            + "</Value></Property></Config>"
        )
    return (
        '<?xml version="1.0" encoding="utf-8"?>'
        "<Instance><Job><Priority>9</Priority><Tasks><SQL>"
        "<Name>AnonymousSQLTask</Name>"
        + props
        + "<Query><![CDATA["
        + sql
        + "]]></Query></SQL></Tasks></Job></Instance>"
    )


def submit_instance_request(
    endpoint: str,
    project: str,
    access_id: str,
    access_key: str,
    xml_body: str,
    date: str,
) -> StreamLoadRequest:
    """Fully-signed ``POST /projects/{p}/instances``. ``date`` is the
    RFC-1123 GMT Date header (passed in so rendering is deterministic);
    Content-MD5 is the hex body digest the ODPS clients send."""
    resource = f"/projects/{project}/instances"
    md5 = hashlib.md5(xml_body.encode()).hexdigest().upper()
    ctype = "application/xml"
    sig = odps_signature(access_key, "POST", md5, ctype, date, resource)
    return StreamLoadRequest(
        url=endpoint.rstrip("/") + resource,
        method="POST",
        headers={
            "Content-Type": ctype,
            "Content-MD5": md5,
            "Date": date,
            "Authorization": f"ODPS {access_id}:{sig}",
        },
        body=xml_body,
    )


def requests_for_batch(
    df,
    endpoint: str,
    project: str,
    table_name: str,
    access_id: str,
    access_key: str,
    date: str,
    partition_spec: str | None = None,
    overwrite: bool = False,
    split_row: int = 10_000,
    op_col: str = "op",
) -> list[StreamLoadRequest]:
    """Changelog batch → one signed instance submission per split_row
    chunk. The reference sink is append-only (AbstractSinkWriter.write of
    every row), so D/-U images are dropped rather than routed; overwrite
    applies to the FIRST chunk only — later chunks append, matching one
    tunnel-session truncate-then-write."""
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    batch = df
    if op_col in df.columns:
        batch = batch.where(~batch[op_col].isin("D", "-U"))
    rows = [r.asDict() for r in batch.select(*cols).collect()]
    out = []
    for i in range(0, len(rows), split_row):
        sql = insert_sql(
            f"{project}.{table_name}",
            cols,
            rows[i : i + split_row],
            partition_spec=partition_spec,
            overwrite=overwrite and i == 0,
        )
        out.append(
            submit_instance_request(
                endpoint, project, access_id, access_key,
                instance_xml(sql), date,
            )
        )
    return out


def foreach_partition_sender(
    endpoint: str,
    project: str,
    table_name: str,
    access_id: str,
    access_key: str,
    columns: list[str],
    date: str,
    partition_spec: str | None = None,
    overwrite: bool = False,
    split_row: int = 10_000,
    op_col: str = "op",
    dry_run_sink=None,
):
    """Distributed twin of ``requests_for_batch`` for ``df.foreachPartition``
    (reference: per-subtask ``MaxcomputeWriter.write`` over one tunnel
    upload session per subtask). INSERT INTO is append-only, so a retried
    task duplicates its chunk — the same at-least-once semantics as the
    reference's tunnel re-upload; route through a staging table + driver
    INSERT OVERWRITE when exactly-once matters. ``overwrite`` is refused
    here: truncate-then-append cannot be coordinated from inside parallel
    partitions (no "first chunk" exists) — use the collected-batch path."""
    if overwrite:
        raise ValueError(
            "overwrite (truncate-then-write) needs single-point coordination; "
            "use requests_for_batch or stage + INSERT OVERWRITE"
        )
    from seatunnel_spark.sinks.partition_send import chunked, partition_sender

    def build(rows: list[dict]):
        for chunk in chunked(rows, split_row):
            sql = insert_sql(
                f"{project}.{table_name}", columns, chunk,
                partition_spec=partition_spec, overwrite=False,
            )
            yield submit_instance_request(
                endpoint, project, access_id, access_key, instance_xml(sql), date
            )

    return partition_sender(
        build, columns, op_col=op_col, drop_kinds=("D", "-U"),
        dry_run_sink=dry_run_sink,
    )
