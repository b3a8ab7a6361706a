"""SparkSession factory with scale-aware defaults.

Local mode is a correctness proxy; the configs below are the ones that matter
on a 1000-executor cluster too: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for every pandas-UDF boundary, and shuffle
partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "seatunnel_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism: local[N] → N; at cluster scale this would be
        # 2-3x total cores, but AQE coalescing makes the exact figure soft.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # max_by/min_by (LWW reduce) are ObjectHashAggregate; the default
        # 128-key sort fallback makes the reduce SORT full payload rows —
        # measured 6x slower and anti-scaling on wide string rows. Budget:
        # keys/partition × row size must fit executor memory; tune with
        # shuffle partition count at scale.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # the merge path pre-partitions each batch by the table key so the
        # LWW semi-join (keys = key + order + tiebreak) reuses that single
        # exchange; joins co-partitioned on a SUBSET of their keys need this
        # off (our subset is the full PK — cardinality is never degraded)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
