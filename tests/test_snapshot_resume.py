"""Chunk-level snapshot resumability (S14): a crash mid-snapshot resumes at
the last uncommitted chunk group and never recomputes committed ones."""

import pandas as pd
import pytest

import seatunnel_spark.operators.snapshot as snap_mod
from seatunnel_spark import oracle
from seatunnel_spark.lake import LakeTable
from seatunnel_spark.operators.snapshot import default_fences, run_snapshot_phase
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
from seatunnel_spark.sources import generator as gen


def test_chunked_snapshot_resumes_after_crash(spark, tmp_path, monkeypatch):
    paths = gen.write_fixture(str(tmp_path / "fx"), 200, 300, seed=31,
                              n_event_files=2, with_ddl=False)
    base_df = spark.read.parquet(paths["base"])
    events_df = spark.read.schema(event_schema()).parquet(paths["events"])
    table = LakeTable.create(str(tmp_path / "t"), REPO_FIELDS, REPO_KEY, num_buckets=8)
    fences = default_fences(8, 100)

    # crash after 2 group commits
    real_merge = snap_mod.merge_into
    calls = {"n": 0}

    def crashing(spark_, table_, batch_, epoch_id_, **kw):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return real_merge(spark_, table_, batch_, epoch_id_, **kw)

    monkeypatch.setattr(snap_mod, "merge_into", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_snapshot_phase(spark, table, base_df, events_df, fences, chunk_groups=4)
    table.refresh()
    assert "snapshot.0.g0" in table.meta["epochs"]
    assert "snapshot.0.g1" in table.meta["epochs"]
    assert "snapshot.0" not in table.meta["epochs"]  # phase not complete

    # restart: committed groups skip, the rest run
    monkeypatch.setattr(snap_mod, "merge_into", real_merge)
    stats = run_snapshot_phase(spark, table, base_df, events_df, fences, chunk_groups=4)
    assert stats["groups"] == 4 and stats["skipped_groups"] == 2
    table.refresh()
    assert table.epoch_committed("snapshot.0")

    # a second full call is a no-op
    assert run_snapshot_phase(spark, table, base_df, events_df, fences,
                              chunk_groups=4)["skipped"] is True

    # final state equals the single-shot snapshot on a fresh table
    t2 = LakeTable.create(str(tmp_path / "t2"), REPO_FIELDS, REPO_KEY, num_buckets=8)
    run_snapshot_phase(spark, t2, base_df, events_df, fences, chunk_groups=1)
    a = table.scan(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    b = t2.scan(spark).toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
