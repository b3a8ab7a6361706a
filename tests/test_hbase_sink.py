"""HBase sink seam: rowkey/family/version mutation rendering per the
reference writer, null modes, shell-text form, and the config surface."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.hbase import row_mutations, shell_commands

ROWS = [
    {"id": 1, "region": "eu", "name": "a", "score": 10, "v": 1111, "op": "I"},
    {"id": 2, "region": "us", "name": None, "score": 20, "v": 2222, "op": "U"},
]
COLS = ["id", "region", "name", "score", "v"]


def test_rowkey_family_version_and_null_modes():
    muts = row_mutations(
        ROWS, COLS, rowkey_columns=["region", "id"], rowkey_delimiter="_",
        family_map={"score": "stats"}, default_family="info",
        version_column="v",
    )
    assert muts[0]["row"] == "eu_1" and muts[0]["ts"] == 1111
    # non-rowkey/non-version columns only; per-field family mapping
    assert muts[0]["cells"] == {"info:name": "a", "stats:score": "10"}
    # SKIP null mode (default): no cell for the null name
    assert muts[1]["cells"] == {"stats:score": "20"}
    # EMPTY null mode writes an empty value instead
    muts = row_mutations(ROWS, COLS, ["id"], version_column="v",
                         null_mode="empty")
    assert muts[1]["cells"]["info:name"] == ""
    with pytest.raises(ValueError, match="rowkey_column"):
        row_mutations(ROWS, COLS, [])
    with pytest.raises(ValueError, match="null_mode"):
        row_mutations(ROWS, COLS, ["id"], null_mode="zero")


def test_delete_routing_and_shell_text():
    rows = ROWS + [{"id": 3, "region": "eu", "name": "c", "score": 1,
                    "v": 3333, "op": "D"}]
    # reference parity: every kind is a Put (append-only writer)
    muts = row_mutations(rows, COLS, ["id"], version_column="v")
    assert [m["type"] for m in muts] == ["put", "put", "put"]
    # CDC extension: deletes route to deleteall when asked
    muts = row_mutations(rows, COLS, ["id"], version_column="v",
                         route_deletes=True)
    assert [m["type"] for m in muts] == ["put", "put", "delete"]
    sh = shell_commands(muts, "st_table")
    assert "put 'st_table', '1', 'info:region', 'eu', 1111" in sh
    assert sh[-1] == "deleteall 'st_table', '3'"


def test_hbase_conf_dry_run_only(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      Hbase { source_table_name = "t"
              zookeeper_quorum = "zk:2181"  table = "st_table"
              rowkey_column = ["id"]
              family_name { all_columns = "cf" }
              dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    out = res["Hbase#0"]
    assert len(out["mutations"]) == 3
    assert all(set(m["cells"]) == {"cf:name"} for m in out["mutations"])
    assert all(c.startswith("put 'st_table'") for c in out["shell"])
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))
