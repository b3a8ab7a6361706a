"""Doris / StarRocks stream-load sinks — the analytics-warehouse bulk-HTTP
family, as an executable-verbatim request seam (the same dialect-as-text
pattern as ``sources/kafka.py`` and ``lake/iceberg.py``: generate the EXACT
HTTP request a real deployment issues, unit-test the text, execute it with
stdlib urllib when a server exists).

Reference:
- Doris: ``connector-doris/.../sink/writer/DorisStreamLoad.java`` (PUT
  ``http://{fe}/api/{db}/{table}/_stream_load``; 2PC commit/abort via
  ``.../_stream_load_2pc`` with txn_id + txn_operation headers),
  ``HttpPutBuilder.java`` (Expect/Authorization/label/two_phase_commit/
  hidden_columns headers), ``serialize/SeaTunnelRowSerializer.java``
  (CSV with ``\\N`` nulls / JSON rows; delete sign column "0"/"1" from
  RowKind), ``writer/LoadConstants.java`` (separator + delete-sign names).
- StarRocks: ``connector-starrocks/.../client/StarRocksStreamLoadVisitor``
  (same URL shape; headers columns/`strip_outer_array`/format/label/basic
  auth; CSV rows joined by row_delimiter, JSON rows as one outer array),
  ``serialize/StarRocksSinkOP.java`` (``__op`` 0=UPSERT / 1=DELETE for
  primary-key tables).

Scale note: stream load is a per-batch bulk POST to one frontend — the
natural Spark shape is one request per PARTITION (each executor posts its
own partition under a partition-suffixed label, Doris/StarRocks dedup by
label). ``requests_for_batch`` builds per-chunk requests from a collected
batch (the config path's bounded micro-batches); ``foreach_partition_sender``
returns a function suitable for ``df.foreachPartition`` for the
cluster-side path.
"""

from __future__ import annotations

import base64
import io
import json
from dataclasses import dataclass, field

DORIS_DELETE_SIGN = "__DORIS_DELETE_SIGN__"
STARROCKS_OP = "__op"
NULL_VALUE = "\\N"


@dataclass
class StreamLoadRequest:
    """One HTTP exchange, fully rendered: executable verbatim via
    ``execute()`` or assertable as text in tests."""

    url: str
    method: str = "PUT"
    headers: dict = field(default_factory=dict)
    body: str = ""

    def execute(self, timeout_s: float = 60.0) -> str:
        import urllib.request

        req = urllib.request.Request(
            self.url, data=self.body.encode(), method=self.method
        )
        for k, v in self.headers.items():
            req.add_header(k, v)
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read().decode()


def _basic_auth(user: str, password: str) -> str:
    return "Basic " + base64.b64encode(f"{user}:{password}".encode()).decode()


def _csv_cell(v) -> str:
    if v is None:
        return NULL_VALUE  # LoadConstants.NULL_VALUE
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _delete_sign(op) -> str:
    # SeaTunnelRowSerializer.parseDeleteSign: I/+U -> "0", D/-U -> "1"
    return "1" if op in ("D", "-U") else "0"


def _rows_body(
    rows: list[dict],
    columns: list[str],
    fmt: str,
    *,
    field_delimiter: str,
    line_delimiter: str,
    delete_col: str | None,
    op_col: str = "op",
    outer_array: bool = False,
) -> str:
    """Rows → load body. CSV: cells joined by field_delimiter, records by
    line_delimiter, nulls as \\N, optional trailing delete-sign column.
    JSON: one object per record (joined by line_delimiter), or one outer
    array when ``outer_array`` (the StarRocks strip_outer_array contract)."""
    if fmt == "csv":
        recs = []
        for r in rows:
            cells = [_csv_cell(r.get(c)) for c in columns]
            if delete_col:
                cells.append(_delete_sign(r.get(op_col)))
            recs.append(field_delimiter.join(cells))
        return line_delimiter.join(recs)
    if fmt == "json":
        objs = []
        for r in rows:
            o = {c: r.get(c) for c in columns}
            if delete_col:
                o[delete_col] = _delete_sign(r.get(op_col))
            objs.append(o)
        if outer_array:
            return json.dumps(objs, separators=(",", ":"))
        return line_delimiter.join(
            json.dumps(o, separators=(",", ":")) for o in objs
        )
    raise ValueError(f"unknown stream-load format {fmt!r}")


# ------------------------------------------------------------------ Doris
def doris_stream_load_request(
    fenodes: str,
    database: str,
    table: str,
    columns: list[str],
    rows: list[dict],
    *,
    username: str = "root",
    password: str = "",
    label: str,
    fmt: str = "csv",
    field_delimiter: str = "\t",
    line_delimiter: str = "\n",
    enable_delete: bool = False,
    enable_2pc: bool = False,
    props: dict | None = None,
) -> StreamLoadRequest:
    """The exact stream-load PUT DorisStreamLoad.startLoad issues:
    URL ``http://{fe}/api/{db}/{table}/_stream_load``, common headers
    (Expect 100-continue, basic auth), label, ``hidden_columns`` =
    __DORIS_DELETE_SIGN__ when delete handling is on, ``two_phase_commit``
    when 2PC, plus doris.config passthrough properties."""
    headers = {
        "Expect": "100-continue",
        "Authorization": _basic_auth(username, password),
        "label": label,
        "format": fmt,
    }
    if fmt == "csv":
        headers["column_separator"] = field_delimiter
        headers["line_delimiter"] = line_delimiter
    else:
        headers["read_json_by_line"] = "true"
    if enable_delete:
        headers["hidden_columns"] = DORIS_DELETE_SIGN
    if enable_2pc:
        headers["two_phase_commit"] = "true"
    for k, v in (props or {}).items():
        headers[str(k)] = str(v)
    body = _rows_body(
        rows, columns, fmt,
        field_delimiter=field_delimiter, line_delimiter=line_delimiter,
        delete_col=DORIS_DELETE_SIGN if enable_delete else None,
    )
    return StreamLoadRequest(
        url=f"http://{fenodes}/api/{database}/{table}/_stream_load",
        headers=headers,
        body=body,
    )


def doris_txn_request(
    fenodes: str,
    database: str,
    txn_id: int,
    operation: str,
    *,
    username: str = "root",
    password: str = "",
) -> StreamLoadRequest:
    """2PC completion (DorisCommitter COMMIT_PATTERN /
    DorisStreamLoad.abortTransaction): PUT ``.../_stream_load_2pc`` with
    txn_id + txn_operation commit|abort headers and an empty body."""
    if operation not in ("commit", "abort"):
        raise ValueError(f"txn_operation must be commit|abort, got {operation!r}")
    return StreamLoadRequest(
        url=f"http://{fenodes}/api/{database}/_stream_load_2pc",
        headers={
            "Expect": "100-continue",
            "Authorization": _basic_auth(username, password),
            "txn_id": str(int(txn_id)),
            "txn_operation": operation,
        },
        body="",
    )


# -------------------------------------------------------------- StarRocks
def starrocks_stream_load_request(
    node_url: str,
    database: str,
    table: str,
    columns: list[str],
    rows: list[dict],
    *,
    username: str = "root",
    password: str = "",
    label: str,
    fmt: str = "json",
    field_delimiter: str = "\t",
    line_delimiter: str = "\n",
    enable_upsert_delete: bool = False,
    props: dict | None = None,
) -> StreamLoadRequest:
    """StarRocksStreamLoadVisitor.doStreamLoad's request: same URL shape;
    headers carry backtick-quoted ``columns`` (CSV only), format,
    strip_outer_array=true, label, basic auth and the
    sink's starrocks.config passthrough; JSON bodies are ONE outer array
    (joinRows), CSV bodies are row_delimiter-joined records. Primary-key
    upsert/delete rides the ``__op`` column (0=UPSERT, 1=DELETE)."""
    fmt = fmt.lower()
    headers = {
        "Expect": "100-continue",
        "Content-Type": "application/x-www-form-urlencoded",
        "Authorization": _basic_auth(username, password),
        "label": label,
        "format": fmt.upper(),
        "strip_outer_array": "true",
    }
    out_cols = list(columns) + ([STARROCKS_OP] if enable_upsert_delete else [])
    if fmt == "csv":
        headers["columns"] = ",".join(f"`{c}`" for c in out_cols)
        headers["column_separator"] = field_delimiter
        headers["row_delimiter"] = line_delimiter
    for k, v in (props or {}).items():
        headers[str(k)] = str(v)
    body = _rows_body(
        rows, columns, fmt,
        field_delimiter=field_delimiter, line_delimiter=line_delimiter,
        delete_col=STARROCKS_OP if enable_upsert_delete else None,
        outer_array=(fmt == "json"),
    )
    return StreamLoadRequest(
        url=f"http://{node_url}/api/{database}/{table}/_stream_load",
        headers=headers,
        body=body,
    )


# ------------------------------------------------------- batch / partition
def requests_for_batch(
    df,
    build_request,
    columns: list[str] | None = None,
    chunk_rows: int = 100_000,
    op_col: str = "op",
):
    """Collected-batch path (bounded config jobs): slice ``df`` into
    ``chunk_rows`` chunks and render one request per chunk via
    ``build_request(chunk_index, columns, row_dicts)``. Returns the request
    list. Row order within the batch is preserved; each chunk gets its own
    label from the builder, so replays dedup server-side."""
    cols = columns or [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    return [
        build_request(i // chunk_rows, cols, rows[i : i + chunk_rows])
        for i in range(0, len(rows), chunk_rows)
    ] or [build_request(0, cols, [])]


def foreach_partition_sender(build_request, columns: list[str], dry_run_sink=None):
    """Cluster-side path: a function for ``df.foreachPartition`` — each
    partition renders its own request (label suffixed by a partition tag
    from the first row's hash, so retried tasks re-issue the SAME label and
    the server dedups). ``dry_run_sink(request)`` collects instead of
    executing when given (tests)."""

    def send(it):
        rows = [r.asDict() for r in it]
        if not rows:
            return
        tag = abs(hash(tuple(sorted(rows[0].items())))) % (1 << 31)
        req = build_request(tag, columns, rows)
        if dry_run_sink is not None:
            dry_run_sink(req)
        else:
            req.execute()

    return send
