"""Changelog serialization sink: typed change rows → debezium/canal JSON.

Reference: seatunnel-format-json's serialization side —
DebeziumJsonSerializationSchema.java / CanalJsonSerializationSchema.java
(RowToJsonConverters) — SeaTunnel can WRITE the CDC wire formats it reads,
so a lake's change feed can feed another CDC consumer. Composed with
LakeTable.changes_between this closes the loop: lake-as-CDC-source →
wire-format topic → any downstream debezium/canal consumer (including this
engine's own parsers — the round-trip is the test).

All serialization is ``to_json(struct(...))`` — JVM-side, codegen'd, no
Python; the writer is a plain text sink so it streams with the same
partitioning as the input (one file per partition, a topic-partition
analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS_DEBEZIUM = {"I": "c", "U": "u", "D": "d"}


def to_debezium_json(
    df: DataFrame,
    row_cols: list[str],
    table: str,
    op_col: str = "op",
    seq_col: str = "seq",
    ts_col: str | None = None,
) -> DataFrame:
    """(row cols + op + seq [+ ts]) → one debezium envelope string per row
    (column ``value``). Deletes carry the row image in ``before`` (the
    after-state is null), inserts/updates in ``after`` — exactly what
    parse_debezium_json expects back."""
    row = F.struct(*[F.col(c) for c in row_cols])
    is_del = F.col(op_col) == "D"
    op = F.coalesce(
        *[F.when(F.col(op_col) == k, F.lit(v)) for k, v in _OPS_DEBEZIUM.items()]
    )
    ts_ms = (
        (F.col(ts_col).cast("double") * 1000).cast("long")
        if ts_col
        else F.col(seq_col).cast("long")
    )
    env = F.struct(
        F.when(is_del, row).alias("before"),
        F.when(~is_del, row).alias("after"),
        op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.lit(table).alias("table"),
            F.col(seq_col).cast("long").alias("seq"),
        ).alias("source"),
    )
    return df.select(F.to_json(env).alias("value"))


def to_canal_json(
    df: DataFrame,
    row_cols: list[str],
    table: str,
    op_col: str = "op",
    seq_col: str = "seq",
    ts_col: str | None = None,
) -> DataFrame:
    """(row cols + op + seq [+ ts]) → one canal envelope per row. The seq
    rides as the monotonic batch ``id`` (the parser folds id into _seq's low
    bits, so same-millisecond rows keep their relative order); ``ts`` is the
    real event time when ``ts_col`` is given, else the seq — which then must
    stay below 2^41 or the parser's 22-bit shift would overflow (it raises).
    Never put a parser-derived _seq (~2^63 scale) in ``ts``: that is exactly
    the overflow the id slot exists to avoid."""
    row = F.struct(*[F.col(c) for c in row_cols])
    typ = (
        F.when(F.col(op_col) == "I", "INSERT")
        .when(F.col(op_col) == "U", "UPDATE")
        .when(F.col(op_col) == "D", "DELETE")
    )
    ts_ms = (
        (F.col(ts_col).cast("double") * 1000).cast("long")
        if ts_col
        else F.col(seq_col).cast("long")
    )
    env = F.struct(
        F.array(row).alias("data"),
        typ.alias("type"),
        F.lit(table).alias("table"),
        ts_ms.alias("ts"),
        F.col(seq_col).cast("long").alias("id"),
    )
    return df.select(F.to_json(env).alias("value"))


def write_changelog(
    df: DataFrame,
    path: str,
    wire_format: str,
    row_cols: list[str],
    table: str,
    **kwargs,
) -> None:
    """Serialize and write as text files (the file-backed topic shape the
    queue source reads; on a real broker this is
    ``.write.format("kafka")`` with the same ``value`` column)."""
    if wire_format == "debezium-json":
        out = to_debezium_json(df, row_cols, table, **kwargs)
    elif wire_format == "canal-json":
        out = to_canal_json(df, row_cols, table, **kwargs)
    else:
        raise ValueError(f"unknown wire_format {wire_format!r}")
    out.write.mode("overwrite").text(path)
