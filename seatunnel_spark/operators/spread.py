"""Small-input spreading for compute-heavy operators.

The degenerate input every local test corpus presents — ONE parquet file
with ONE row group — scans as ONE partition, so any expression-heavy map
work (shingling, n-gram explodes, per-row regex, vector dot products)
serializes onto a single core regardless of session parallelism. At real
scale (many files / row groups) the scan is already wide and this helper
is a no-op, which is what keeps it scale-adaptive rather than a local-mode
tuning knob (guide §2: partitioning must derive from the input, not a
constant).

The probe uses file-listing metadata (``inputFiles``) rather than
``df.rdd.getNumPartitions`` — the RDD conversion forces a full plan
analysis per call. A non-file source (createDataFrame, streams) lists no
files and is left untouched: its parallelism already follows the session
default. The repartition shuffles only the columns the downstream plan
needs (Catalyst prunes through Repartition), so for the small inputs that
trigger it the exchange moves a few MB once and buys a cluster-wide map
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target)
    return df
