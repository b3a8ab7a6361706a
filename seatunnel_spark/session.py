"""SparkSession factory with scale-aware defaults.

Local mode is a correctness proxy; the configs below are the ones that matter
on a 1000-executor cluster too: AQE for runtime re-planning (skew joins,
partition coalescing), Arrow for every pandas-UDF boundary, and shuffle
partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def default_gc_opts(heap: str = "48g") -> str:
    """Throughput-biased driver JVM options for this engine's batch/replay
    workloads: ParallelGC with growth-biased ergonomics.

    Why not the JDK-17 default G1: measured on this sandbox (2026-08-17
    boot, kernel 6.18.5-fc-v20) the 4M-event CDC replay took 225-507s
    under G1 — its concurrent refinement/mark machinery degenerates into
    a futex/timer storm (79% system CPU, `hrtimer: interrupt took 17ms`
    in dmesg) under this kernel's timer behavior. ParallelGC alone was
    unstable (ergonomics shrank the heap and issued 24 Full GCs = 210s of
    pauses on one run); pinning growth-biased sizing (GCTimeRatio=99,
    never shrink, modest -Xms) gives a reproducible 68-75s. On a real
    cluster executors get explicit heap sizing anyway; a stop-the-world
    throughput collector is the standard choice for batch/ETL executors.

    ``-Xms`` is capped at a quarter of the heap so small-heap runs (the
    N-vs-4N scaling protocol uses 24g) never pre-commit more than they
    can grow into, and is OMITTED entirely when the heap string can't be
    parsed or resolves below 4g — a floor like ``-Xms1g`` against e.g.
    ``SPARK_DRIVER_MEM=512m`` makes the JVM refuse to start ("Initial
    heap size set to a larger value than the maximum heap size").
    Override everything via SPARK_GRAFT_JAVA_OPTS.
    """
    env = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if env is not None:
        return env
    # JVM memory strings: digits + optional unit k/m/g/t (case-insensitive);
    # no unit means bytes
    m = re.fullmatch(r"\s*(\d+)\s*([kmgt]?)b?\s*", str(heap).lower())
    gb = 0.0
    if m:
        scale = {"": 1 / 2**30, "k": 1 / 2**20, "m": 1 / 2**10, "g": 1.0, "t": 1024.0}
        gb = int(m.group(1)) * scale[m.group(2)]
    base = (
        "-XX:+UseParallelGC -XX:ParallelGCThreads=8 "
        "-XX:MinHeapFreeRatio=10 -XX:MaxHeapFreeRatio=100 -XX:GCTimeRatio=99"
    )
    if gb < 4:
        return base
    xms = max(1, min(12, int(gb) // 4))
    return f"{base} -Xms{xms}g"


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
        # 32m (not the 128m default): scan splits can only parallelize at
        # row-group boundaries, and a local cell's worth of cores must fan
        # out over single-file tables (the CDC base snapshot measured 1-2
        # scan tasks wide at 128m regardless of core count). At cluster
        # scale with many files per table the figure is soft — AQE
        # coalesces the excess.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
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
        .config(
            "spark.driver.extraJavaOptions",
            default_gc_opts(os.environ.get("SPARK_DRIVER_MEM", "48g")),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    # netty/rpc pools default to 2x HOST cpus — 64 mostly-idle timer-wheel
    # threads in a small session. Size them to the session's parallelism
    # (capped at 8: local-mode RPC is driver-internal and never needs
    # more); on the degraded sandbox kernel idle timers are taxed heavily
    # (see default_gc_opts), and on a real cluster this is the standard
    # "threads follow executor cores" rule.
    io_threads = str(max(1, min(8, shuffle_partitions)))
    for k in (
        "spark.rpc.io.serverThreads",
        "spark.rpc.io.clientThreads",
        "spark.shuffle.io.serverThreads",
        "spark.shuffle.io.clientThreads",
        "spark.rpc.netty.dispatcher.numThreads",
    ):
        builder = builder.config(k, io_threads)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
