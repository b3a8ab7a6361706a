"""Amazon DynamoDB sink — request seam: render the exact
``BatchWriteItem`` request payloads (the public AWS API JSON shape) the
reference client issues. Execution requires SigV4 signing (an AWS SDK),
so the config sink is dry_run-only in-sandbox.

Reference: connector-amazondynamodb ``sink/DynamoDbSinkClient.java``
(rows buffer as PutRequest WriteRequests, flushed as
BatchWriteItemRequest at batch_size) and its serializer's
AttributeValue mapping (strings → S, numbers → N as strings, booleans →
BOOL, null → NULL, binary → B base64, lists/maps recurse to L/M).

AWS caps a BatchWriteItem at 25 items — chunking clamps to that.
"""

from __future__ import annotations

import base64

AWS_MAX_BATCH = 25


def attribute_value(v) -> dict:
    """Python value → DynamoDB AttributeValue (the API's typed envelope)."""
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v) if isinstance(v, float) else str(v)}
    if isinstance(v, (bytes, bytearray)):
        return {"B": base64.b64encode(bytes(v)).decode()}
    if isinstance(v, (list, tuple)):
        return {"L": [attribute_value(x) for x in v]}
    if isinstance(v, dict):
        return {"M": {str(k): attribute_value(x) for k, x in v.items()}}
    return {"S": str(v)}


def batch_write_requests(
    rows: list[dict],
    table: str,
    columns: list[str],
    batch_size: int = AWS_MAX_BATCH,
    op_col: str = "op",
) -> list[dict]:
    """Rows → BatchWriteItem request bodies. I/+U rows become PutRequests
    (DynamoDB put IS the keyed upsert); D rows need the key attributes
    only and become DeleteRequests; '-U' images are skipped."""
    batch_size = min(int(batch_size), AWS_MAX_BATCH)
    writes: list[dict] = []
    for r in rows:
        op = r.get(op_col, "I")
        if op == "-U":
            continue
        item = {c: attribute_value(r.get(c)) for c in columns}
        if op == "D":
            writes.append({"DeleteRequest": {"Key": item}})
        else:
            writes.append({"PutRequest": {"Item": item}})
    return [
        {"RequestItems": {table: writes[i : i + batch_size]}}
        for i in range(0, len(writes), batch_size)
    ]


def requests_for_batch(
    df,
    table: str,
    batch_size: int = AWS_MAX_BATCH,
    key_columns: list[str] | None = None,
    op_col: str = "op",
) -> list[dict]:
    """Collected-batch path; delete rows project to ``key_columns`` when
    given (a DeleteRequest's Key must hold ONLY the key attributes)."""
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    if key_columns:
        for r in rows:
            if r.get(op_col) == "D":
                for c in cols:
                    if c not in key_columns:
                        r[c] = None
        out: list[dict] = []
        for req in batch_write_requests(rows, table, cols, batch_size, op_col):
            for w in req["RequestItems"][table]:
                if "DeleteRequest" in w:
                    w["DeleteRequest"]["Key"] = {
                        k: v for k, v in w["DeleteRequest"]["Key"].items()
                        if k in key_columns
                    }
            out.append(req)
        return out
    return batch_write_requests(rows, table, cols, batch_size, op_col)
