"""Cassandra sink — CQL seam: render the prepared-INSERT batches the
reference writer executes, as literal CQL statements (executable verbatim
in cqlsh / any driver). The native protocol is binary framed, so the
config sink is dry_run-only in-sandbox.

Reference: connector-cassandra ``sink/CassandraSinkWriter.java`` — one
prepared ``INSERT INTO table (cols) VALUES (?, ...)`` bound per row,
flushed as BatchStatements of the configured batch_size/batch_type;
``config/CassandraConfig.java``: host / keyspace / table / username /
password / consistency_level / batch_size / batch_type / fields.

CQL literal rules: strings single-quoted with '' escaping, booleans
true/false, numbers bare, NULL for missing — an upsert by primary key is
Cassandra's native INSERT semantics (last write wins on the partition
key), which is exactly the engine's LWW contract.
"""

from __future__ import annotations

BATCH_TYPES = ("UNLOGGED", "LOGGED", "COUNTER")


def _cql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v) if isinstance(v, float) else str(v)
    return "'" + str(v).replace("'", "''") + "'"


def insert_cql(table: str, columns: list[str], row: dict) -> str:
    cols = ", ".join(columns)
    vals = ", ".join(_cql_literal(row.get(c)) for c in columns)
    return f"INSERT INTO {table} ({cols}) VALUES ({vals})"


def batch_statements(
    rows: list[dict],
    table: str,
    columns: list[str],
    batch_size: int = 500,
    batch_type: str = "UNLOGGED",
    op_col: str = "op",
) -> list[str]:
    """Rows → BEGIN [UNLOGGED|COUNTER] BATCH ... APPLY BATCH; statements
    (the reference's BatchStatement flushes). Deletes route as
    DELETE-by-full-column-equality is NOT expressible generically without
    key metadata, so like the reference writer this is append/upsert-only;
    '-U' before-images are skipped."""
    bt = batch_type.upper()
    if bt not in BATCH_TYPES:
        raise ValueError(f"unknown batch_type {batch_type!r}; use {BATCH_TYPES}")
    kw = "" if bt == "LOGGED" else f"{bt} "
    stmts = []
    live = [r for r in rows if r.get(op_col, "I") != "-U"]
    for i in range(0, len(live), batch_size):
        chunk = live[i : i + batch_size]
        body = ";\n  ".join(insert_cql(table, columns, r) for r in chunk)
        stmts.append(f"BEGIN {kw}BATCH\n  {body};\nAPPLY BATCH;")
    return stmts


def statements_for_batch(
    df,
    keyspace: str,
    table: str,
    fields: list[str] | None = None,
    batch_size: int = 500,
    batch_type: str = "UNLOGGED",
) -> list[str]:
    cols = fields or [c for c in df.columns if c not in ("op", "seq")]
    sel = cols + (["op"] if "op" in df.columns else [])
    rows = [r.asDict() for r in df.select(*sel).collect()]
    return batch_statements(rows, f"{keyspace}.{table}", cols, batch_size, batch_type)
