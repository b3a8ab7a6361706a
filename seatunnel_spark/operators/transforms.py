"""SeaTunnel's transform layer, re-expressed as DataFrame operators.

The reference's transforms are per-row ``map(SeaTunnelRow)`` functions
(seatunnel-transforms-v2 AbstractSeaTunnelTransform.java); none shuffle.
Each maps to a single narrow Catalyst projection here — whole-stage-codegen,
zero Python in the hot path.

| transform      | reference file (LoC)                              |
|----------------|---------------------------------------------------|
| sql            | sql/zeta/ZetaSQLEngine.java:99-157 (single-table SELECT/WHERE only) |
| filter         | filter/FilterFieldTransform.java (163)            |
| fieldmapper    | fieldmapper/FieldMapperTransform.java (178)       |
| copy           | copy/CopyFieldTransform.java (223)                |
| replace        | replace/ReplaceTransform.java (145)               |
| split          | split/SplitTransform.java (135)                   |
| filterrowkind  | filterrowkind/FilterRowKindTransform.java (100)   |
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sql_transform(df: DataFrame, select_exprs: list[str], where: str | None = None) -> DataFrame:
    """Zeta SQL subset with pre-split expressions. For the real SeaTunnel
    config surface — an actual SQL string, parsed and validated with the
    reference's rejections (ZetaSQLEngine.java:99-157) and the full scalar
    function mapping — use functions.sql_engine.zeta_sql_transform."""
    out = df.selectExpr(*select_exprs)
    return out.where(where) if where else out


def filter_fields(df: DataFrame, fields: list[str]) -> DataFrame:
    """Keep only the listed fields (FilterFieldTransform)."""
    return df.select(*fields)


def field_mapper(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename/reorder/project fields; mapping = {src: dst} in output order
    (FieldMapperTransform)."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def copy_fields(df: DataFrame, copies: dict[str, str]) -> DataFrame:
    """Duplicate fields to new names; copies = {src: new_name}
    (CopyFieldTransform)."""
    for src, dst in copies.items():
        df = df.withColumn(dst, F.col(src))
    return df


def replace_field(
    df: DataFrame, field: str, pattern: str, replacement: str, is_regex: bool = False
) -> DataFrame:
    """Literal or regex replace on a string field (ReplaceTransform)."""
    pat = pattern if is_regex else None
    if is_regex:
        return df.withColumn(field, F.regexp_replace(F.col(field), pattern, replacement))
    # literal replace — escape via split/join semantics of `replace`
    return df.withColumn(field, F.replace(F.col(field), F.lit(pattern), F.lit(replacement)))


def split_field(
    df: DataFrame, field: str, separator: str, output_fields: list[str]
) -> DataFrame:
    """Split a string field into N output fields by separator (SplitTransform).
    Missing positions become null, matching the reference's padding."""
    parts = F.split(F.col(field), separator, -1)
    for i, name in enumerate(output_fields):
        df = df.withColumn(name, F.element_at(parts, i + 1))
    return df


def filter_row_kind(
    df: DataFrame, include: list[str] | None = None, exclude: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Include/exclude rows by RowKind (FilterRowKindTransform) — e.g. drop
    deletes before an append-only sink."""
    if include:
        return df.where(F.col(op_col).isin(include))
    if exclude:
        return df.where(~F.col(op_col).isin(exclude))
    return df
