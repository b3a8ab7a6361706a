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
    hudi_replaced_file_groups,
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


def test_replacecommit_hides_replaced_groups(spark, tmp_path):
    """A completed replacecommit (clustering / insert_overwrite) writes
    new file groups and records the obsoleted ones in
    partitionToReplaceFileIds; snapshot reads must hide the replaced
    groups even though their base files are still on disk (reference:
    HoodieROTablePathFilter semantics)."""
    import json
    import shutil

    table = _make_table(spark, tmp_path)
    # clustering at C4 rewrites fg1+fg2's rows into one new group fg3
    c4 = "20260817130000000"
    fg3 = "a1b2c3d4-0000-0000-0000-000000000003-0"
    spark.createDataFrame(
        [(1, "v2"), (2, "v2"), (3, "v1")], "id int, val string"
    ).coalesce(1).write.parquet(str(tmp_path / "_tmp5"))
    src = str(tmp_path / "_tmp5")
    pq = [p for p in os.listdir(src) if p.endswith(".parquet")][0]
    shutil.copy(os.path.join(src, pq), _base(table, "pt=a", fg3, c4))
    meta = {"partitionToReplaceFileIds": {"pt=a": [FG1, FG2]}}
    with open(os.path.join(table, ".hoodie", f"{c4}.replacecommit"), "w") as fh:
        json.dump(meta, fh)

    assert hudi_replaced_file_groups(table) == {("pt=a", FG1), ("pt=a", FG2)}
    files = hudi_snapshot_files(table)
    assert len(files) == 1 and fg3 in files[0]
    rows = {(r.id, r.val) for r in read_hudi(spark, table).collect()}
    assert rows == {(1, "v2"), (2, "v2"), (3, "v1")}

    # an unparseable replacecommit refuses loudly instead of returning a
    # possibly-duplicate snapshot; an EMPTY one replaces nothing
    bad = os.path.join(table, ".hoodie", f"{c4}.replacecommit")
    with open(bad, "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="replacecommit"):
        hudi_snapshot_files(table)
    open(bad, "w").close()
    assert hudi_replaced_file_groups(table) == set()
    assert len(hudi_snapshot_files(table)) == 3  # fg1@C2, fg2@C1, fg3@c4


def test_mixed_width_instants_compare_numerically(spark, tmp_path):
    """Tables upgraded across Hudi 0.10 mix 14-digit (second) and
    17-digit (ms) instants in one timeline; lexicographic comparison
    would rank '20260817110000000' (17w, 11:00) below '99991231235959'
    — numeric compare with zero-ms padding picks the true latest."""
    import shutil

    table = str(tmp_path / "hudi_mixed")
    old_i = "20260817100000"  # 14-digit, 10:00
    new_i = "20260817110000000"  # 17-digit, 11:00
    spark.createDataFrame([(1, "old")], "id int, val string") \
        .coalesce(1).write.parquet(str(tmp_path / "_m1"))
    spark.createDataFrame([(1, "new")], "id int, val string") \
        .coalesce(1).write.parquet(str(tmp_path / "_m2"))

    def one(d):
        return [p for p in os.listdir(d) if p.endswith(".parquet")][0]

    shutil.copy(os.path.join(str(tmp_path / "_m1"), one(str(tmp_path / "_m1"))),
                _base(table, "pt=a", FG1, old_i))
    shutil.copy(os.path.join(str(tmp_path / "_m2"), one(str(tmp_path / "_m2"))),
                _base(table, "pt=a", FG1, new_i))
    _commit(table, old_i)
    _commit(table, new_i)
    files = hudi_snapshot_files(table)
    assert len(files) == 1 and new_i in files[0]
    assert {(r.id, r.val) for r in read_hudi(spark, table).collect()} == {(1, "new")}


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
