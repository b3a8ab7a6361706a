"""Savepoint / graceful suspend-resume parity (VERDICT r3 #4).

Reference: the Zeta engine distinguishes deliberate savepoints from crash
checkpoints — CheckpointType.java:32 ``SAVEPOINT_TYPE(false, "savepoint")``,
triggered via CheckpointCoordinator.java:447 — and ClusterFaultToleranceIT
asserts a suspended job resumes to the same final state. On Spark the
micro-batch epoch IS the aligned barrier: draining the available log with
``trigger(availableNow=True)`` and letting the query terminate is a clean
stop-at-barrier, and the Structured Streaming checkpoint plus the lake's
seq-guarded merge make resume — even from a DIFFERENT job object with
DIFFERENT parameters — converge to the uninterrupted run's exact state.
"""

import hashlib
import os
import shutil

import pandas as pd

from seatunnel_spark.lake import LakeTable
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
from seatunnel_spark.sources import generator as gen
from seatunnel_spark.streaming.job import CdcIngestJob


def _digest(table: LakeTable, spark) -> str:
    pdf = (
        table.scan(spark)
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    return hashlib.sha256(
        pdf.to_csv(index=False).encode()
    ).hexdigest(), pdf


def test_savepoint_suspend_then_resume_with_changed_params(spark, tmp_path):
    paths = gen.write_fixture(str(tmp_path / "fx"), 150, 600, seed=13,
                              n_event_files=6, with_ddl=True)
    base = spark.read.parquet(paths["base"])
    events = spark.read.schema(event_schema()).parquet(paths["events"])

    # ---- reference: one uninterrupted run over the full log
    job_a = CdcIngestJob(spark, str(tmp_path / "ta"), paths["events"],
                         str(tmp_path / "cka"), num_buckets=8, total_events=600)
    job_a.ensure_snapshot(base, events, REPO_FIELDS, REPO_KEY, max_fence=100)
    job_a.run_incremental(available_now=True, timeout_s=300)
    sha_a, pdf_a = _digest(LakeTable.load(str(tmp_path / "ta")), spark)

    # ---- suspended run: only half the log is visible, drain to a barrier
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    chunks = sorted(f for f in os.listdir(paths["events"]) if not f.startswith("_"))
    assert len(chunks) == 6
    for f in chunks[:3]:
        shutil.copy(os.path.join(paths["events"], f), stream_dir)

    ckb = str(tmp_path / "ckb")
    tb = str(tmp_path / "tb")
    job_b = CdcIngestJob(spark, tb, stream_dir, ckb, num_buckets=8,
                         max_files_per_trigger=1)
    job_b.ensure_snapshot(base, events, REPO_FIELDS, REPO_KEY, max_fence=100)
    job_b.run_incremental(available_now=True, timeout_s=300)  # clean stop
    mid_version = LakeTable.load(tb).version

    # ---- the rest of the log arrives while suspended
    for f in chunks[3:]:
        shutil.copy(os.path.join(paths["events"], f), stream_dir)

    # ---- resume with a DIFFERENT job object and DIFFERENT parameters:
    # bigger trigger batches and a different (ignored-for-existing-table)
    # bucket count — the savepoint contract is that none of this matters
    job_c = CdcIngestJob(spark, tb, stream_dir, ckb, num_buckets=4,
                         max_files_per_trigger=3, total_events=600)
    job_c.run_incremental(available_now=True, timeout_s=300)

    sha_b, pdf_b = _digest(LakeTable.load(tb), spark)
    assert sha_b == sha_a
    pd.testing.assert_frame_equal(pdf_a, pdf_b)

    # resumed run actually advanced past the savepoint barrier
    assert LakeTable.load(tb).version > mid_version

    # idempotence across a further no-new-data resume (replay safety)
    v = LakeTable.load(tb).version
    CdcIngestJob(spark, tb, stream_dir, ckb, num_buckets=8).run_incremental(
        available_now=True, timeout_s=300
    )
    assert LakeTable.load(tb).version == v
