"""Elasticsearch bulk sink — the third member of the analytics-warehouse
bulk-HTTP family (with sinks/streamload.py), as an executable request seam.

Reference: connector-elasticsearch
``serialize/ElasticsearchRowSerializer.java`` (RowKind → bulk actions:
I/+U → update+doc_as_upsert when primary keys are configured, plain index
otherwise; D/-U → delete), ``serialize/KeyExtractor.java`` (_id = primary
key values joined by key_delimiter), ``serialize/index/impl/
VariableIndexSerializer.java`` (index names may embed ``${field}``
variables resolved per row), ``config/SinkConfig.java`` (hosts / index /
primary_keys / key_delimiter / max_batch_size).

The bulk wire format is NDJSON: one metadata line per action, followed by
a document line for index/update actions, POSTed to ``{host}/_bulk`` with
``Content-Type: application/x-ndjson``.
"""

from __future__ import annotations

import json
import re

from seatunnel_spark.sinks.streamload import StreamLoadRequest, _basic_auth

_VAR_RX = re.compile(r"\$\{([^}]+)\}")


def _resolve_index(index: str, row: dict) -> str:
    """VariableIndexSerializer: ``seatunnel_${age}`` → per-row index name;
    a missing field is the serializer's NULL_DEFAULT ("null")."""
    return _VAR_RX.sub(lambda m: str(row.get(m.group(1), "null")), index)


def _doc_id(row: dict, primary_keys: list[str], key_delimiter: str) -> str:
    return key_delimiter.join(str(row.get(k)) for k in primary_keys)


def bulk_lines(
    rows: list[dict],
    index: str,
    columns: list[str],
    primary_keys: list[str] | None = None,
    key_delimiter: str = "_",
    op_col: str = "op",
) -> list[str]:
    """Rows → NDJSON bulk action lines (ElasticsearchRowSerializer
    semantics): with primary keys, upserts are update+doc_as_upsert and
    deletes (D and the -U before-image) are delete actions; without keys,
    every row is a plain index action and deletes are unaddressable —
    refused loudly rather than silently indexed."""
    out: list[str] = []
    for r in rows:
        op = r.get(op_col, "I")
        doc = {c: r.get(c) for c in columns}
        idx = _resolve_index(index, r)
        if op in ("D", "-U"):
            if not primary_keys:
                raise ValueError(
                    "delete rows need primary_keys (no _id without a key)"
                )
            meta = {"_index": idx, "_id": _doc_id(r, primary_keys, key_delimiter)}
            out.append(json.dumps({"delete": meta}, separators=(",", ":")))
        elif primary_keys:
            meta = {"_index": idx, "_id": _doc_id(r, primary_keys, key_delimiter)}
            out.append(json.dumps({"update": meta}, separators=(",", ":")))
            out.append(
                json.dumps(
                    {"doc": doc, "doc_as_upsert": True}, separators=(",", ":")
                )
            )
        else:
            out.append(json.dumps({"index": {"_index": idx}}, separators=(",", ":")))
            out.append(json.dumps(doc, separators=(",", ":")))
    return out


def bulk_request(
    host: str,
    lines: list[str],
    username: str | None = None,
    password: str | None = None,
) -> StreamLoadRequest:
    """One ``POST {host}/_bulk`` — NDJSON body with the mandatory trailing
    newline."""
    headers = {"Content-Type": "application/x-ndjson"}
    if username is not None:
        headers["Authorization"] = _basic_auth(username, password or "")
    return StreamLoadRequest(
        url=f"{host.rstrip('/')}/_bulk",
        method="POST",
        headers=headers,
        body="\n".join(lines) + "\n" if lines else "",
    )


def requests_for_batch(
    df,
    host: str,
    index: str,
    primary_keys: list[str] | None = None,
    key_delimiter: str = "_",
    max_batch_size: int = 10,
    username: str | None = None,
    password: str | None = None,
    op_col: str = "op",
) -> list[StreamLoadRequest]:
    """Collected-batch path: chunk rows by ``max_batch_size`` (the
    reference's bulk flush threshold) into one bulk request each."""
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    reqs = []
    for i in range(0, max(len(rows), 1), max_batch_size):
        chunk = rows[i : i + max_batch_size]
        lines = bulk_lines(chunk, index, cols, primary_keys, key_delimiter, op_col)
        reqs.append(bulk_request(host, lines, username, password))
    return reqs


def foreach_partition_sender(
    host: str,
    index: str,
    columns: list[str],
    primary_keys: list[str] | None = None,
    key_delimiter: str = "_",
    max_batch_size: int = 10,
    username: str | None = None,
    password: str | None = None,
    op_col: str = "op",
    dry_run_sink=None,
):
    """Distributed twin of ``requests_for_batch`` for ``df.foreachPartition``
    (reference: per-subtask ``SinkWriter.write`` +
    ``BulkProcessor``-style flush every max_batch_size). Keyed
    update/doc_as_upsert + delete actions are idempotent per ``_id``, so a
    retried task converges to the same documents (at-least-once send,
    exactly-once effect when primary_keys are set)."""
    from seatunnel_spark.sinks.partition_send import chunked, partition_sender

    def build(rows: list[dict]):
        for chunk in chunked(rows, max_batch_size):
            lines = bulk_lines(
                chunk, index, columns, primary_keys, key_delimiter, op_col
            )
            yield bulk_request(host, lines, username, password)

    # ES routes deletes itself (bulk delete actions), so keep the op column
    return partition_sender(
        build, columns, op_col=op_col, keep_op=True, dry_run_sink=dry_run_sink
    )
