"""spark-submit entry point: bounded CDC replay (snapshot + incremental).

Run via:
    spark-submit --master local[N] --py-files seatunnel_spark.zip \
        tools/replay_job.py --events 200000 --base 50000 --workdir /tmp/x

Prints ONE JSON line: wall times, events/sec, verification flag. The master
comes from spark-submit (never overridden here), so the same script measures
any cluster size — the N vs 4N scaling protocol of BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200000)
    ap.add_argument("--base", type=int, default=50000)
    ap.add_argument("--fixture", required=True, help="dir with base.parquet + events/")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    ap.add_argument("--shuffle-partitions", type=int, default=0, help="0 = #cores")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("cdc_replay")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # single-exchange merge: the probe-side repartition by key must be
        # reusable by the LWW semi-join (keys = key + order + tiebreak) and
        # the bucketed write — same conf as session.get_spark
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # scan splits sized so the 1M-row base table and each event chunk
        # fan out across the cell's cores (fixture row groups are 64k rows
        # ≈ 12 MB; the default 128m would leave the base scan 1-2 tasks
        # wide no matter the core count)
        .config("spark.sql.files.maxPartitionBytes", "32m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    else:
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.operators.dedup import lww_reduce
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
    from seatunnel_spark.streaming.job import CdcIngestJob, project_to_table_schema

    base_path = os.path.join(args.fixture, "base.parquet")
    events_dir = os.path.join(args.fixture, "events")
    shutil.rmtree(args.workdir, ignore_errors=True)

    job = CdcIngestJob(
        spark,
        table_root=os.path.join(args.workdir, "table"),
        events_dir=events_dir,
        checkpoint_dir=os.path.join(args.workdir, "ckpt"),
        num_buckets=args.buckets,
        max_files_per_trigger=args.files_per_trigger,
        total_events=args.events,
    )
    base_df = spark.read.parquet(base_path)
    events_df = spark.read.schema(event_schema()).parquet(events_dir)

    # Disclosed warmup (BENCH.md "warmup" section): the FIRST Spark action of
    # a fresh JVM pays whole-stage-codegen compilation, JIT, shuffle service
    # init, and Arrow/pandas Python-worker spin-up — a constant that a
    # 10^10-event replay amortizes to zero but that a minutes-long bench
    # sample books entirely against the snapshot cell (measured: it alone
    # pushed the snapshot phase's pair efficiency to 0.58 while incremental
    # held 0.82). One tiny data-free action per pool warms all three paths;
    # it touches NOTHING of the fixture (no page-cache advantage): a
    # hash-agg + shuffle through codegen, and a pandas_udf to fork the
    # per-core Python workers (1 worker at local[1], 4 at local[4] — the
    # warmed resource scales with the cell, as on a real cluster).
    import pandas as pd  # noqa: F401 — resolved by the hint eval below
    from pyspark.sql.functions import pandas_udf

    # NB: no `pd.Series` type hints — this module has
    # `from __future__ import annotations`, which stringifies hints, and
    # pyspark evaluates them in the function's globals where a
    # function-local import is invisible. The decorator argument alone
    # fixes the eval type when paired with the explicit iterator-free
    # signature below.
    def _wu_fn(v):
        return v

    _wu_fn.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _wu = pandas_udf(_wu_fn, "long")

    wu = spark.range(0, 200_000, 1, cores).withColumn("k", F.col("id") % 64)
    wu.groupBy("k").agg(F.sum(_wu(F.col("id")))).collect()

    t0 = time.time()
    job.ensure_snapshot(base_df, events_df, REPO_FIELDS, REPO_KEY, max_fence=args.events // 20)
    snap_s = time.time() - t0
    t1 = time.time()
    job.run_incremental(available_now=True, timeout_s=3600)
    inc_s = time.time() - t1
    wall = time.time() - t0

    table = LakeTable.load(os.path.join(args.workdir, "table"))
    final = table.scan(spark)
    hash_expr = F.sum(
        F.conv(F.substring(F.sha2(F.col("content"), 256), 1, 10), 16, 10).cast("bigint")
    )
    got = final.agg(F.count("*").alias("n"), hash_expr.alias("h")).collect()[0]

    base_rows = (
        base_df.withColumn("op", F.lit("I"))
        .withColumn("seq", F.lit(-1).cast("long"))
        .withColumn("ddl", F.lit(None).cast("string"))
        .withColumn("extra", F.lit(None).cast("string"))
    )
    ref = lww_reduce(
        project_to_table_schema(table, base_rows).unionByName(
            project_to_table_schema(table, events_df.where(F.col("op") != "DDL"))
        ),
        REPO_KEY,
        "seq",
    ).where(F.col("op") != "D")
    exp = ref.agg(F.count("*").alias("n"), hash_expr.alias("h")).collect()[0]

    print(
        json.dumps(
            {
                "cores": cores,
                "events_total": args.events,
                "snapshot_s": round(snap_s, 2),
                "incremental_s": round(inc_s, 2),
                "wall_s": round(wall, 2),
                "events_per_sec": round(args.events / wall, 1),
                "rows_final": got["n"],
                "sha256_verified": bool(got["n"] == exp["n"] and got["h"] == exp["h"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
