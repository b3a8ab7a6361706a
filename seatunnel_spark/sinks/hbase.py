"""HBase sink — mutation seam: render the exact Put mutations the
reference writer builds (and their hbase-shell command text, the public
executable form), batch them from a DataFrame. The HBase RPC protocol is
protobuf-over-SASL — no honest stdlib executable path — so the config sink
is dry_run-only and says so.

Reference: connector-hbase ``sink/HbaseSinkWriter.java`` — rowkey = the
``rowkey_column`` values joined by ``rowkey_delimiter``; cell timestamp
from ``version_column`` when configured; every non-rowkey/non-version
column becomes a cell under ``family_name[field]`` (default family =
the ``all_columns`` mapping); NULLs write an empty value (EMPTY mode) or
no cell (SKIP). The reference writer is append-only (every RowKind
becomes a Put); ``route_deletes=True`` additionally maps op='D' rows to
deleteall — an extension for CDC feeds, off by default for parity.
"""

from __future__ import annotations

NULL_MODES = ("skip", "empty")


def row_mutations(
    rows: list[dict],
    columns: list[str],
    rowkey_columns: list[str],
    rowkey_delimiter: str = "",
    family_map: dict[str, str] | None = None,
    default_family: str = "info",
    version_column: str | None = None,
    null_mode: str = "skip",
    op_col: str = "op",
    route_deletes: bool = False,
) -> list[dict]:
    """Rows → ordered mutation dicts: {"type": "put"|"delete",
    "row": rowkey, "ts": version-or-None, "cells": {"family:qualifier":
    value-string}} (cells absent for deletes)."""
    if not rowkey_columns:
        raise ValueError("hbase sink needs rowkey_column")
    if null_mode not in NULL_MODES:
        raise ValueError(f"unknown null_mode {null_mode!r}; use {NULL_MODES}")
    fam = family_map or {}
    out: list[dict] = []
    cell_cols = [
        c for c in columns if c not in rowkey_columns and c != version_column
    ]
    for r in rows:
        rowkey = rowkey_delimiter.join(str(r.get(k)) for k in rowkey_columns)
        ts = None
        if version_column is not None:
            v = r.get(version_column)
            ts = int(v) if v is not None else None
        op = r.get(op_col, "I")
        if route_deletes and op == "D":
            out.append({"type": "delete", "row": rowkey, "ts": ts})
            continue
        if op == "-U":
            continue  # before-images never land as puts
        cells: dict[str, str] = {}
        for c in cell_cols:
            v = r.get(c)
            if v is None:
                if null_mode == "empty":
                    cells[f"{fam.get(c, default_family)}:{c}"] = ""
                continue  # SKIP: no cell
            if isinstance(v, bool):
                v = "true" if v else "false"
            cells[f"{fam.get(c, default_family)}:{c}"] = str(v)
        out.append({"type": "put", "row": rowkey, "ts": ts, "cells": cells})
    return out


def shell_commands(mutations: list[dict], table: str) -> list[str]:
    """Mutations → hbase-shell statements (one per cell for puts, matching
    the shell's grammar), executable verbatim in `hbase shell`."""

    def q(s: str) -> str:
        return "'" + str(s).replace("'", "\\'") + "'"

    out: list[str] = []
    for m in mutations:
        if m["type"] == "delete":
            out.append(f"deleteall {q(table)}, {q(m['row'])}")
            continue
        for cq, val in m["cells"].items():
            stmt = f"put {q(table)}, {q(m['row'])}, {q(cq)}, {q(val)}"
            if m["ts"] is not None:
                stmt += f", {int(m['ts'])}"
            out.append(stmt)
    return out


def mutations_for_batch(
    df,
    rowkey_columns: list[str],
    rowkey_delimiter: str = "",
    family_map: dict[str, str] | None = None,
    default_family: str = "info",
    version_column: str | None = None,
    null_mode: str = "skip",
    op_col: str = "op",
    route_deletes: bool = False,
) -> list[dict]:
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    return row_mutations(
        rows, cols, rowkey_columns, rowkey_delimiter, family_map,
        default_family, version_column, null_mode, op_col, route_deletes,
    )
