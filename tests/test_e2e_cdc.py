"""End-to-end CDC replay: snapshot → incremental stream → final state equals
the pandas oracle (the reference's source==sink equality, MysqlCDCIT.java:134-167),
verified per-row by sha256(content) — the BASELINE invariant."""

import hashlib
import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from seatunnel_spark import oracle
from seatunnel_spark.lake import LakeTable
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
from seatunnel_spark.sources import generator as gen
from seatunnel_spark.streaming.job import CdcIngestJob

N_BASE, N_EVENTS = 300, 1200


@pytest.fixture(scope="module")
def fixture_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("cdc_fixture")
    paths = gen.write_fixture(str(d), N_BASE, N_EVENTS, seed=42, n_event_files=6)
    base = pd.read_parquet(paths["base"])
    events = pd.read_parquet(paths["events"])
    expected, cols = oracle.replay(base, events)
    return {"paths": paths, "base": base, "events": events, "expected": expected, "cols": cols}


def _assert_state_equals_oracle(spark, table, expected):
    got = table.scan(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    assert list(got.columns) == list(expected.columns), (got.columns, expected.columns)
    assert len(got) == len(expected)
    # row-set equality on the key
    pd.testing.assert_frame_equal(
        got[["repo", "path"]], expected[["repo", "path"]], check_dtype=False
    )
    # per-row sha256(content) — the BASELINE invariant
    got_sha = got["content"].map(lambda s: hashlib.sha256(s.encode()).hexdigest())
    exp_sha = oracle.content_sha(expected)
    assert (got_sha.values == exp_sha.values).all()
    # evolved columns
    for c in ("commit_sha", "stars"):
        assert c in got.columns
    pd.testing.assert_series_equal(
        got["stars"].astype("float64"), expected["stars"].astype("float64"), check_names=False
    )
    pd.testing.assert_series_equal(got["commit_sha"], expected["commit_sha"], check_names=False)


def _run_job(spark, tmp, events_dir, fixture_data, max_fence):
    job = CdcIngestJob(
        spark,
        table_root=os.path.join(tmp, "table"),
        events_dir=events_dir,
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        num_buckets=8,
        max_files_per_trigger=2,
        total_events=N_EVENTS,
    )
    base_df = spark.read.parquet(fixture_data["paths"]["base"])
    events_df = spark.read.schema(event_schema()).parquet(events_dir)
    job.ensure_snapshot(base_df, events_df, REPO_FIELDS, REPO_KEY, max_fence=max_fence)
    job.run_incremental(available_now=True, timeout_s=600)
    return job


def test_full_replay_matches_oracle(spark, tmp_path, fixture_data):
    """Snapshot at fence 0 (pure base) then stream the whole log."""
    _run_job(spark, str(tmp_path), fixture_data["paths"]["events"], fixture_data, max_fence=0)
    table = LakeTable.load(str(tmp_path / "table"))
    _assert_state_equals_oracle(spark, table, fixture_data["expected"])


def test_snapshot_race_reconciliation(spark, tmp_path, fixture_data):
    """Staggered per-chunk fences: events already folded into a chunk's
    normalized snapshot must NOT be re-applied when tailing starts (shouldEmit
    fence, IncrementalSourceStreamFetcher.java:273-303)."""
    _run_job(
        spark, str(tmp_path), fixture_data["paths"]["events"], fixture_data, max_fence=400
    )
    table = LakeTable.load(str(tmp_path / "table"))
    _assert_state_equals_oracle(spark, table, fixture_data["expected"])


def test_restart_from_checkpoint_no_double_apply(spark, tmp_path, fixture_data):
    """Feed half the log, run to completion, add the rest, resume from the
    same checkpoint; then force-replay an already-applied batch — the epoch
    ledger must skip it (ClusterFaultToleranceIT analog)."""
    src = fixture_data["paths"]["events"]
    staged = tmp_path / "events_staged"
    staged.mkdir()
    files = sorted(os.listdir(src))
    for f in files[:3]:
        shutil.copy(os.path.join(src, f), staged / f)

    job = _run_job(spark, str(tmp_path), str(staged), fixture_data, max_fence=120)
    table = LakeTable.load(str(tmp_path / "table"))
    v_mid = table.version

    for f in files[3:]:
        shutil.copy(os.path.join(src, f), staged / f)
    job.run_incremental(available_now=True, timeout_s=600)

    table.refresh()
    _assert_state_equals_oracle(spark, table, fixture_data["expected"])

    # force a replay of an old batch through the committer: every epoch skips
    first_batch = spark.read.schema(event_schema()).parquet(
        os.path.join(str(staged), files[0])
    )
    v_before = table.version
    lineage_before = spark.read.parquet(job.lineage_dir).count()
    metrics_before = spark.read.parquet(job.metrics_dir).count()
    applied_before = job._events_applied
    job._apply_batch(first_batch, 0)
    table.refresh()
    assert table.version == v_before  # no new data/schema commits
    _assert_state_equals_oracle(spark, table, fixture_data["expected"])

    # the side tables are epoch-guarded too: a fully-replayed batch appends
    # no duplicate lineage/metrics rows and doesn't double-count throughput
    assert spark.read.parquet(job.lineage_dir).count() == lineage_before
    assert spark.read.parquet(job.metrics_dir).count() == metrics_before
    assert job._events_applied == applied_before

    # lineage covers the whole log exactly (per-partition offset ranges)
    lineage = spark.read.parquet(job.lineage_dir)
    n = lineage.where(F.col("batch_id") >= 0).agg(F.sum("n_events")).collect()[0][0]
    metrics = spark.read.parquet(job.metrics_dir)
    assert metrics.where(F.col("phase") == "snapshot").count() >= 1
    assert n is not None and n > 0


def test_snapshot_window_scan_pushes_seq_bound(spark, tmp_path, fixture_data):
    """The snapshot's in-window event filter keys on a computed bucket
    column (never pushable); the coarse `seq < max_fence` conjunct must
    reach the parquet scan so a 100 TB log is row-group-pruned to its head
    instead of fully decoded. Pins the optimized plan, not just results."""
    from seatunnel_spark.operators.snapshot import fence_map_expr
    from seatunnel_spark.schema import OP_DDL

    events = spark.read.schema(event_schema()).parquet(
        fixture_data["paths"]["events"]
    )
    table = LakeTable.create(
        str(tmp_path / "t"), REPO_FIELDS, REPO_KEY, 8
    )
    fences = {b: 60 for b in range(8)}
    in_window = (
        events.where(F.col("op") != OP_DDL)
        .where(F.col("seq") < F.lit(60).cast("long"))
        .withColumn("bucket", table.bucket_expr())
        .where(F.col("seq") < fence_map_expr(fences)[F.col("bucket")])
        .drop("bucket")
    )
    plan = in_window._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(seq,60)" in plan, plan[:2000]
