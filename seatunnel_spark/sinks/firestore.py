"""Google Firestore sink — REST commit seam: rows render as the public
Firestore v1 ``documents:commit`` request (typed Value envelopes, one
write per row) — plain HTTPS JSON; auth takes a pre-obtained OAuth
bearer (same stdlib boundary as the Sheets source: service-account RS256
signing needs RSA).

Reference: connector-google-firestore (``config/FirestoreConfig.java``:
project_id / collection / credentials; the writer adds each row as a
document to the collection).

Value typing per the Firestore REST spec: stringValue / integerValue
(string-encoded) / doubleValue / booleanValue / nullValue / arrayValue /
mapValue.
"""

from __future__ import annotations

import json

from seatunnel_spark.sinks.streamload import StreamLoadRequest

BASE = "https://firestore.googleapis.com"


def fs_value(v) -> dict:
    if v is None:
        return {"nullValue": None}
    if isinstance(v, bool):
        return {"booleanValue": v}
    if isinstance(v, int):
        return {"integerValue": str(v)}  # spec: int64 as string
    if isinstance(v, float):
        return {"doubleValue": v}
    if isinstance(v, (list, tuple)):
        return {"arrayValue": {"values": [fs_value(x) for x in v]}}
    if isinstance(v, dict):
        return {"mapValue": {"fields": {str(k): fs_value(x) for k, x in v.items()}}}
    return {"stringValue": str(v)}


def commit_request(
    project_id: str,
    collection: str,
    rows: list[dict],
    columns: list[str],
    key_column: str | None = None,
    access_token: str | None = None,
    base_url: str = BASE,
) -> StreamLoadRequest:
    """One documents:commit carrying an update write per row; with
    ``key_column`` the document id is the key value (idempotent upsert),
    otherwise the server assigns ids via an empty-name create."""
    parent = f"projects/{project_id}/databases/(default)/documents"
    writes = []
    for r in rows:
        fields = {c: fs_value(r.get(c)) for c in columns}
        doc = {"fields": fields}
        if key_column is not None:
            doc["name"] = f"{parent}/{collection}/{r.get(key_column)}"
            writes.append({"update": doc})
        else:
            writes.append(
                {"update": doc, "currentDocument": {"exists": False}}
            )
    headers = {"Content-Type": "application/json"}
    if access_token:
        headers["Authorization"] = f"Bearer {access_token}"
    return StreamLoadRequest(
        url=f"{base_url.rstrip('/')}/v1/{parent}:commit",
        method="POST",
        headers=headers,
        body=json.dumps({"writes": writes}, separators=(",", ":")),
    )


def requests_for_batch(
    df,
    project_id: str,
    collection: str,
    key_column: str | None = None,
    batch_size: int = 500,  # the API's writes-per-commit cap
    access_token: str | None = None,
    base_url: str = BASE,
) -> list[StreamLoadRequest]:
    cols = [c for c in df.columns if c not in ("op", "seq")]
    rows = [r.asDict() for r in df.select(*cols).collect()]
    batch_size = min(int(batch_size), 500)
    return [
        commit_request(project_id, collection, rows[i : i + batch_size],
                       cols, key_column, access_token, base_url)
        for i in range(0, max(len(rows), 1), batch_size)
    ]
