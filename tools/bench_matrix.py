"""Serialized, isolated replay matrix: kills stray Spark processes between
runs, runs one spark-submit at a time, repeats each cell, reports medians.

Usage: python tools/bench_matrix.py --cores 8,32 --reps 2 --events 4000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def kill_stray_spark() -> None:
    subprocess.run(
        "ps aux | grep -i sparksubmit | grep -v grep | awk '{print $2}' | xargs -r kill -9",
        shell=True, capture_output=True,
    )
    time.sleep(2)


def run_once(cores: int, events: int, fixture: str, workdir: str, mem: str,
             tmpfs: bool, files_per_trigger: int = 8) -> dict:
    kill_stray_spark()
    shutil.rmtree(workdir, ignore_errors=True)
    spark_submit = shutil.which("spark-submit") or str(
        Path(sys.executable).parent / "spark-submit")
    cmd = [spark_submit, "--master", f"local[{cores}]", "--driver-memory", mem]
    # same throughput-GC options the engine session uses (see
    # seatunnel_spark.session.default_gc_opts: the sandbox kernel's timer
    # behavior degenerates G1 into a futex storm; ParallelGC with
    # growth-biased ergonomics is stable at every core count), with GC
    # threads sized to the CELL's cores — the JVM would otherwise size
    # them to the 32 HOST cpus, and 8+ GC threads inside a local[4] cell
    # measured 278s vs 158s (A/B in BENCH.md). Same rule a real cluster
    # applies: executor JVM threads scale with executor cores, not with
    # whatever machine the container lands on.
    from seatunnel_spark.session import default_gc_opts

    opts = default_gc_opts(mem)
    if "SPARK_GRAFT_JAVA_OPTS" not in os.environ:
        opts = opts.replace(
            "-XX:ParallelGCThreads=8",
            f"-XX:ParallelGCThreads={max(1, min(8, cores))}",
        )
    cmd += ["--conf", f"spark.driver.extraJavaOptions={opts}"]
    # netty/rpc pools likewise default to 2x HOST cpus (64 threads in a
    # 1-core cell); idle timer wheels are what the degraded host taxes.
    # local[4] with pools=4 measured 109s vs 158s (BENCH.md).
    for k in ("spark.rpc.io.serverThreads", "spark.rpc.io.clientThreads",
              "spark.shuffle.io.serverThreads", "spark.shuffle.io.clientThreads",
              "spark.rpc.netty.dispatcher.numThreads"):
        cmd += ["--conf", f"{k}={cores}"]
    if tmpfs:
        os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
        cmd += ["--conf", "spark.local.dir=/dev/shm/spark-tmp"]
    cmd += ["--py-files", str(REPO / ".cache" / "seatunnel_spark.zip"),
            str(REPO / "tools" / "replay_job.py"),
            "--events", str(events), "--fixture", fixture, "--workdir", workdir,
            "--files-per-trigger", str(files_per_trigger)]
    res = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
    for line in res.stdout.splitlines():
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(res.stderr[-2000:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--events", type=int, default=4000000)
    ap.add_argument("--base", type=int, default=500000)
    ap.add_argument("--mem", default="24g")
    ap.add_argument("--tmpfs", action="store_true", default=True)
    ap.add_argument("--files-per-trigger", type=int, default=8)
    args = ap.parse_args()

    from seatunnel_spark.sources import generator as gen
    from tools.scale_bench import build_zip

    fixture = REPO / ".cache" / f"cdc_{args.base}_{args.events}"
    gen.write_fixture(str(fixture), args.base, args.events, seed=42, n_event_files=16)
    build_zip(REPO / ".cache")

    results: dict[int, list[dict]] = {}
    cores_list = [int(c) for c in args.cores.split(",")]
    for rep in range(args.reps):
        for c in cores_list:
            wd = f"/dev/shm/cdc/mx_{c}" if args.tmpfs else str(REPO / ".cache" / f"mx_{c}")
            r = run_once(c, args.events, str(fixture), wd, args.mem, args.tmpfs,
                         args.files_per_trigger)
            print(f"rep{rep} cores={c}: wall={r['wall_s']}s "
                  f"(snap {r['snapshot_s']} + inc {r['incremental_s']}) "
                  f"thr={r['events_per_sec']} verified={r['sha256_verified']}",
                  file=sys.stderr)
            results.setdefault(c, []).append(r)

    summary = {}
    for c, rs in results.items():
        summary[c] = {
            "wall_s_median": statistics.median(x["wall_s"] for x in rs),
            "throughput_median": statistics.median(x["events_per_sec"] for x in rs),
            "snapshot_s_median": statistics.median(x["snapshot_s"] for x in rs),
            "incremental_s_median": statistics.median(x["incremental_s"] for x in rs),
            "verified": all(x["sha256_verified"] for x in rs),
        }
    lo, hi = min(cores_list), max(cores_list)
    eff = (summary[hi]["throughput_median"] / summary[lo]["throughput_median"]) / (hi / lo)
    print(json.dumps({"events": args.events, "cells": summary,
                      "pair": [lo, hi], "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
