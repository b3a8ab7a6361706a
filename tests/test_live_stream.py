"""Continuous-mode streaming with live event arrival — the reference's e2e
applies live DML and asserts convergence within 60 s (MysqlCDCIT.java:210-245).
Here files land in the stream directory while the query runs continuously."""

import os
import shutil
import time

import pandas as pd

from seatunnel_spark import oracle
from seatunnel_spark.lake import LakeTable
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
from seatunnel_spark.sources import generator as gen
from seatunnel_spark.streaming.job import CdcIngestJob


def test_live_convergence(spark, tmp_path):
    paths = gen.write_fixture(str(tmp_path / "fx"), 120, 500, seed=21, n_event_files=5)
    base = pd.read_parquet(paths["base"])
    events = pd.read_parquet(paths["events"])
    expected, _ = oracle.replay(base, events)

    live_dir = tmp_path / "live_events"
    live_dir.mkdir()
    files = sorted(os.listdir(paths["events"]))
    shutil.copy(os.path.join(paths["events"], files[0]), live_dir / files[0])

    job = CdcIngestJob(
        spark, str(tmp_path / "t"), str(live_dir), str(tmp_path / "c"),
        num_buckets=4, max_files_per_trigger=2, total_events=len(events),
    )
    ev_df = spark.read.schema(event_schema()).parquet(paths["events"])
    job.ensure_snapshot(spark.read.parquet(paths["base"]), ev_df, REPO_FIELDS, REPO_KEY,
                        max_fence=0)

    query = job.run_incremental(available_now=False)
    try:
        for f in files[1:]:
            shutil.copy(os.path.join(paths["events"], f), live_dir / f)
            time.sleep(1.0)
        # convergence budget: wait until every event is applied (≤ 120 s)
        deadline = time.time() + 120
        table = LakeTable.load(str(tmp_path / "t"))
        while time.time() < deadline:
            table.refresh()
            top = table.current_snapshot()
            if top and top["summary"].get("seq_max") == len(events) - 1:
                break
            query.processAllAvailable()
            time.sleep(0.5)
    finally:
        query.stop()

    got = table.scan(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["content"].values == expected["content"].values).all()
