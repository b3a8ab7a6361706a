"""Google Sheets source — the values.get REST surface (public Sheets API
v4): ``GET {base}/v4/spreadsheets/{sheet_id}/values/{sheet_name}!{range}``
returns ``{"values": [[...], ...]}``; each inner list is one row bound to
the declared schema fields by position.

Reference: connector-google-sheets (``config/SheetsConfig.java``:
service_account_key / sheet_id / sheet_name / range; the reader
deserializes each values row through the declared SeaTunnelRowType).

Auth note: a service-account key needs RS256 JWT signing (no RSA in the
stdlib), so this seam takes a pre-obtained OAuth ``access_token``
(gcloud auth print-access-token et al.) — the honest stdlib boundary;
``base_url`` overrides the endpoint for tests.
"""

from __future__ import annotations

import json
import urllib.parse

from seatunnel_spark.sources.http import fetch_http

DEFAULT_BASE = "https://sheets.googleapis.com"


def values_url(sheet_id: str, sheet_name: str, cell_range: str,
               base_url: str = DEFAULT_BASE) -> str:
    rng = urllib.parse.quote(f"{sheet_name}!{cell_range}")
    return f"{base_url.rstrip('/')}/v4/spreadsheets/{sheet_id}/values/{rng}"


def rows_from_values(payload: str, field_names: list[str]) -> list[dict]:
    """values.get response → row dicts bound by position; short rows pad
    with None (trailing empty cells are omitted by the API)."""
    doc = json.loads(payload)
    values = doc.get("values") or []
    out = []
    for row in values:
        out.append({
            n: (row[i] if i < len(row) else None)
            for i, n in enumerate(field_names)
        })
    return out


def read_sheets_source(spark, opts: dict):
    """Config-shaped read: sheet_id / sheet_name / range / schema.fields
    (+ access_token, base_url)."""
    fields = (opts.get("schema") or {}).get("fields") or {}
    if not fields:
        raise ValueError("GoogleSheets source needs schema.fields")
    for k in ("sheet_id", "sheet_name", "range"):
        if not opts.get(k):
            raise ValueError(f"GoogleSheets source needs {k}")
    headers = {}
    if opts.get("access_token"):
        headers["Authorization"] = f"Bearer {opts['access_token']}"
    body = fetch_http(
        values_url(opts["sheet_id"], opts["sheet_name"], opts["range"],
                   opts.get("base_url", DEFAULT_BASE)),
        headers=headers or None,
        retry=int(opts.get("retry", 0)),
    )
    names = list(fields)
    rows = rows_from_values(body, names)
    ddl = ", ".join(f"{n} {t}" for n, t in fields.items())
    return spark.createDataFrame(
        [tuple(r[n] for n in names) for r in rows], ddl
    )
