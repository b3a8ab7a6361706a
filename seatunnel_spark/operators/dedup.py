"""Last-writer-wins key dedup — the pre-MERGE reduction.

Reference: connector-jdbc BufferReducedBatchStatementExecutor.java:42-106 —
a LinkedHashMap keyed by PK where later ops overwrite earlier ones and
UPDATE_BEFORE is skipped (:56-58). In Spark this is a single keyed window:

    row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1

which Catalyst executes as one hash exchange + in-partition sort; with AQE
skew handling a hot key still lands in one partition (a window cannot be
split), which is why the *merge* path uses the algebraically identical
``max_by`` aggregate instead — aggregates get map-side partial combine, so a
hot repo's millions of events reduce locally before the shuffle. Both are
exposed; the window form is the literal SQL the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(df: DataFrame, key: list[str], order_col: str = "seq") -> DataFrame:
    """Keep only the last event per key (by order_col), window form."""
    w = Window.partitionBy(*key).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_agg(df: DataFrame, key: list[str], order_col: str = "seq") -> DataFrame:
    """Algebraically identical reduction via max_by — map-side combinable,
    so hot keys partially reduce before the shuffle (preferred at scale)."""
    payload = [c for c in df.columns if c not in key]
    return (
        df.groupBy(*key)
        .agg(F.max_by(F.struct(*payload), F.col(order_col)).alias("_r"))
        .select(*key, "_r.*")
    )


def lww_reduce(
    df: DataFrame, key: list[str], order_col: str = "seq", strategy: str = "auto"
) -> DataFrame:
    """One row per key: the one with the max ``order_col`` (LWW).

    Two physical plans:
    - ``max_by``: one aggregate; carries full rows in its hash buffers
      (map-side AND final) — fastest for narrow rows, GC-heavy when rows
      are KBs.
    - ``semi_join``: find (key, max order) on NARROW columns (cheap,
      map-side combinable), then keep the winning wide rows with a
      buffer-free shuffled hash semi-join (hash table built on the narrow
      winners) — wide bytes cross the wire once and never sit in
      aggregation state. Preferred for wide payloads.
    ``auto`` picks semi_join when a wide text column is present.

    Ties: rows equal on (key, order_col) are broken deterministically by
    max xxhash64(payload), so the one-row-per-key contract holds even for
    sources with non-unique ordering values (e.g. timestamp-ordered input).
    The tie-break aggregate groups on the semi-join's own join keys, so
    Catalyst reuses the join's partitioning — no extra exchange.
    """
    if strategy == "auto":
        strategy = "semi_join" if "content" in df.columns else "max_by"
    if strategy == "max_by":
        return lww_dedup_agg(df, key, order_col)
    winners = df.groupBy(*key).agg(F.max(order_col).alias(order_col))
    survivors = df.join(winners.hint("shuffle_hash"), [*key, order_col], "leftsemi")
    payload = [c for c in df.columns if c not in key and c != order_col]
    if not payload:  # (key, order) ties are full-row duplicates
        return survivors.distinct()
    return (
        survivors.groupBy(*key, order_col)
        .agg(F.max_by(F.struct(*payload), F.xxhash64(*payload)).alias("_r"))
        .select(*[F.col(f"_r.{c}").alias(c) if c in payload else F.col(c) for c in df.columns])
    )
