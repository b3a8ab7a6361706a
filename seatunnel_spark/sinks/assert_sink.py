"""Assert sink: declarative output assertions, computed in ONE aggregation.

Reference: connector-assert/.../sink/AssertSink.java + rule/AssertFieldRule.java
— SeaTunnel's e2e configs attach row-count and per-field rules (non-null,
min/max value, regex) to any pipeline. Here the rules compile into a single
``agg`` pass (count + conditional counts + min/max per rule), so asserting
costs one job regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldRule:
    field: str
    not_null: bool = False
    min_value: float | None = None
    max_value: float | None = None
    regex: str | None = None


class AssertError(AssertionError):
    pass


def assert_sink(
    df: DataFrame,
    min_rows: int | None = None,
    max_rows: int | None = None,
    field_rules: list[FieldRule] | None = None,
) -> dict:
    """Evaluate all rules in one aggregation; raise AssertError listing every
    violated rule. Returns the computed stats on success."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(field_rules or []):
        c = F.col(r.field)
        if r.not_null:
            aggs.append(F.sum(c.isNull().cast("long")).alias(f"_null_{i}"))
        if r.min_value is not None:
            aggs.append(F.min(c).alias(f"_min_{i}"))
        if r.max_value is not None:
            aggs.append(F.max(c).alias(f"_max_{i}"))
        if r.regex is not None:
            aggs.append(
                F.sum((~c.rlike(r.regex)).cast("long")).alias(f"_badre_{i}")
            )
    row = df.agg(*aggs).collect()[0].asDict()

    errors = []
    n = row["_n"]
    if min_rows is not None and n < min_rows:
        errors.append(f"row count {n} < min_rows {min_rows}")
    if max_rows is not None and n > max_rows:
        errors.append(f"row count {n} > max_rows {max_rows}")
    for i, r in enumerate(field_rules or []):
        if r.not_null and row.get(f"_null_{i}", 0):
            errors.append(f"{r.field}: {row[f'_null_{i}']} null values")
        if r.min_value is not None and row[f"_min_{i}"] is not None and row[f"_min_{i}"] < r.min_value:
            errors.append(f"{r.field}: min {row[f'_min_{i}']} < {r.min_value}")
        if r.max_value is not None and row[f"_max_{i}"] is not None and row[f"_max_{i}"] > r.max_value:
            errors.append(f"{r.field}: max {row[f'_max_{i}']} > {r.max_value}")
        if r.regex is not None and row.get(f"_badre_{i}", 0):
            errors.append(f"{r.field}: {row[f'_badre_{i}']} values fail regex {r.regex}")
    if errors:
        raise AssertError("; ".join(errors))
    return row
