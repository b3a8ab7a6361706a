"""Kudu sink — SQL seam over the public Impala surface: Kudu's RPC
protocol is binary (protobuf), but every reference write maps 1:1 onto
Impala SQL against Kudu tables — ``UPSERT INTO`` (Kudu's native keyed
upsert, exactly the reference writer's ``newUpsert``/session.apply) and
``DELETE WHERE`` for CDC deletes. Statements run verbatim in
impala-shell / any Impala JDBC session.

Reference: connector-kudu ``sink/KuduSinkWriter.java`` + ``KuduOutputFormat``
(session.apply of upsert operations per row; ``kudu_master`` /
``kudu_table`` / ``save_mode`` config).
"""

from __future__ import annotations


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v) if isinstance(v, float) else str(v)
    return "'" + str(v).replace("'", "''") + "'"


def upsert_sql(table: str, columns: list[str], rows: list[dict]) -> str:
    """One multi-row UPSERT (Kudu's keyed write: newest apply wins —
    the engine's LWW contract server-side)."""
    if not rows:
        raise ValueError("upsert needs at least one row")
    cols = ", ".join(columns)
    values = ", ".join(
        "(" + ", ".join(_lit(r.get(c)) for c in columns) + ")" for r in rows
    )
    return f"UPSERT INTO {table} ({cols}) VALUES {values}"


def delete_sql(table: str, key_columns: list[str], rows: list[dict]) -> str:
    if not key_columns:
        raise ValueError("delete needs key_columns")
    preds = " OR ".join(
        "(" + " AND ".join(f"{k} = {_lit(r.get(k))}" for k in key_columns) + ")"
        for r in rows
    )
    return f"DELETE FROM {table} WHERE {preds}"


def statements_for_batch(
    df,
    table: str,
    key_columns: list[str] | None = None,
    batch_size: int = 1000,
    op_col: str = "op",
) -> list[str]:
    """RowKind routing: I/+U chunks upsert, D chunks delete by key,
    '-U' images are skipped — consecutive same-kind runs stay ordered so
    delete-then-reinsert of a key is preserved."""
    cols = [c for c in df.columns if c not in (op_col, "seq")]
    sel = cols + ([op_col] if op_col in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    out: list[str] = []
    run: list[dict] = []
    run_kind = None

    def flush():
        nonlocal run
        if not run:
            return
        if run_kind == "D":
            out.append(delete_sql(table, key_columns or [], run))
        else:
            for i in range(0, len(run), batch_size):
                out.append(upsert_sql(table, cols, run[i : i + batch_size]))
        run = []

    for r in rows:
        op = r.get(op_col, "I")
        if op == "-U":
            continue
        kind = "D" if op == "D" else "U"
        if kind != run_kind:
            flush()
            run_kind = kind
        run.append(r)
    flush()
    return out
