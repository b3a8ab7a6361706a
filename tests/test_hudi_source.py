"""Hudi COW snapshot source (sources/hudi.py).

Reference: connector-hudi HudiSource.java (cow-only guard, "has no
parquet file" error), HudiSourceReader.java (HoodieParquetInputFormat
snapshot semantics: latest committed file slice per file group,
uncommitted files invisible). The fixture synthesizes the publicly
specified COW layout: a .hoodie timeline plus
{fileId}_{writeToken}_{instantTime}.parquet base files."""

import os

import pytest

from seatunnel_spark.sources.hudi import (
    hudi_completed_instants,
    hudi_snapshot_files,
    read_hudi,
)

C1, C2, C3 = "20260817100000000", "20260817110000000", "20260817120000000"
FG1 = "a1b2c3d4-0000-0000-0000-000000000001-0"
FG2 = "a1b2c3d4-0000-0000-0000-000000000002-0"


def _base(table, part, file_id, instant):
    d = os.path.join(table, part) if part else table
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{file_id}_0-1-0_{instant}.parquet")


def _commit(table, instant, action="commit"):
    d = os.path.join(table, ".hoodie")
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, f"{instant}.{action}"), "w").close()


def _make_table(spark, root):
    """Two commits + one inflight: fg1 rewritten at c2 (id=1 updated),
    fg2 only at c1, and an UNCOMMITTED c3 file for fg2 that must stay
    invisible to the snapshot."""
    table = str(root / "hudi_t1")
    spark.createDataFrame([(1, "v1"), (2, "v1")], "id int, val string") \
        .coalesce(1).write.parquet(str(root / "_tmp1"))
    spark.createDataFrame([(3, "v1")], "id int, val string") \
        .coalesce(1).write.parquet(str(root / "_tmp2"))
    spark.createDataFrame([(1, "v2"), (2, "v2")], "id int, val string") \
        .coalesce(1).write.parquet(str(root / "_tmp3"))
    spark.createDataFrame([(3, "UNCOMMITTED")], "id int, val string") \
        .coalesce(1).write.parquet(str(root / "_tmp4"))

    def one_parquet(d):
        return [p for p in os.listdir(d) if p.endswith(".parquet")][0]

    import shutil
    shutil.copy(os.path.join(str(root / "_tmp1"), one_parquet(str(root / "_tmp1"))),
                _base(table, "pt=a", FG1, C1))
    shutil.copy(os.path.join(str(root / "_tmp2"), one_parquet(str(root / "_tmp2"))),
                _base(table, "pt=a", FG2, C1))
    shutil.copy(os.path.join(str(root / "_tmp3"), one_parquet(str(root / "_tmp3"))),
                _base(table, "pt=a", FG1, C2))
    # c3 is inflight: its base file exists on disk but the instant has no
    # completed timeline entry
    shutil.copy(os.path.join(str(root / "_tmp4"), one_parquet(str(root / "_tmp4"))),
                _base(table, "pt=a", FG2, C3))
    _commit(table, C1)
    _commit(table, C2)
    _commit(table, C3, action="commit.inflight")
    return table


def test_timeline_and_slice_resolution(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    assert hudi_completed_instants(table) == {C1, C2}
    files = hudi_snapshot_files(table)
    # fg1 -> its C2 rewrite only; fg2 -> C1 (C3 uncommitted, invisible)
    assert len(files) == 2
    assert any(f"{FG1}_0-1-0_{C2}" in f for f in files)
    assert any(f"{FG2}_0-1-0_{C1}" in f for f in files)
    assert not any(C3 in f for f in files)


def test_snapshot_read_latest_committed_state(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    rows = {(r.id, r.val) for r in read_hudi(spark, table).collect()}
    assert rows == {(1, "v2"), (2, "v2"), (3, "v1")}


def test_mor_and_missing_guards(spark, tmp_path):
    table = _make_table(spark, tmp_path)
    with pytest.raises(ValueError, match="mor table"):
        read_hudi(spark, table, table_type="mor")
    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        hudi_snapshot_files(str(tmp_path / "nope"))
    empty = str(tmp_path / "empty_t")
    _commit(empty, C1)
    with pytest.raises(FileNotFoundError, match="no parquet file"):
        read_hudi(spark, empty)


def test_config_plugin_e2e(spark, tmp_path):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    table = _make_table(spark, tmp_path)
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{ Hudi {{
        table.path = "{table}"
        table.type = "cow"
        conf.files = "/dev/null"
        result_table_name = "t"
    }} }}
    sink {{ Assert {{ source_table_name = "t" rules {{ min_rows = 3 }} }} }}
    """
    run_job(spark, load_job_config(conf))
