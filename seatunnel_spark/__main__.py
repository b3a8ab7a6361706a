"""CLI entry point — the `seatunnel.sh --config job.conf` executable:

    python -m seatunnel_spark --config job.conf [--master local[8]]

Accepts a HOCON .conf (the reference's format, via the hocon subset reader)
or a .json config. Prints one JSON line of per-sink results.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="seatunnel_spark")
    ap.add_argument("--config", "-c", required=True, help="job config (.conf HOCON or .json)")
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    args = ap.parse_args(argv)

    with open(args.config) as fh:
        text = fh.read()
    if args.config.endswith(".json"):
        cfg = json.loads(text)
    else:
        from seatunnel_spark.hocon import load_job_config

        cfg = load_job_config(text)

    from pyspark.sql import SparkSession

    from seatunnel_spark.config import run_job
    from seatunnel_spark.session import get_spark

    # reuse a host process's active session untouched (getOrCreate would
    # apply our configs TO it — e.g. clobbering a test session's shuffle
    # partitions); create and own one only when none exists
    existing = SparkSession.getActiveSession()
    created = existing is None
    spark = existing or get_spark("seatunnel_spark_job", master=args.master)
    try:
        results = run_job(spark, cfg)
    finally:
        if created:
            spark.stop()
    print(json.dumps(results, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
