"""Per-key grouped apply (applyInPandas) with salted skew-breaking.

The BASELINE input hint mandates vectorized ``applyInPandas`` for per-key
row transforms. The footgun at 100 TB is hot-key skew: ``groupBy(key)
.applyInPandas`` puts ALL of a hot repo's rows in one task, and AQE does
NOT rebalance grouped-map pandas UDFs (SURVEY §4). The fix is the classic
two-phase shape:

    groupBy(key, salt).applyInPandas(partial)   # hot key split N_SALT ways
      .groupBy(key).applyInPandas(merge)        # tiny partials re-combined

which requires the per-key function to decompose into (partial, merge) —
the same contract as any combinable aggregate. ``salted_apply_per_key``
wires that shape; ``apply_per_key`` is the plain form for non-decomposable
functions (then pre-filter/cap hot keys explicitly).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_per_key(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Plain grouped-map: one pandas DataFrame per key group (Arrow batches)."""
    return df.groupBy(*keys).applyInPandas(fn, schema)


def salted_apply_per_key(
    df: DataFrame,
    keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    partial_schema: T.StructType | str,
    merge_schema: T.StructType | str,
    n_salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase grouped apply: partial per (key, salt), merge per key.

    ``salt_on``: column whose hash spreads a hot key's rows across salts
    (defaults to a uniform random-ish hash of all columns via
    monotonically_increasing_id — prefer a real column for determinism).
    """
    salt_src = F.xxhash64(F.col(salt_on)) if salt_on else F.monotonically_increasing_id()
    salted = df.withColumn("_salt", F.pmod(salt_src, F.lit(n_salt)).cast("int"))
    partials = salted.groupBy(*keys, "_salt").applyInPandas(partial_fn, partial_schema)
    return partials.groupBy(*keys).applyInPandas(merge_fn, merge_schema)
