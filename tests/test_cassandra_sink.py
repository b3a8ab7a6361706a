"""Cassandra CQL seam: literal rendering, batch statement shape, config
surface (dry_run-only)."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.cassandra import batch_statements, insert_cql


def test_insert_cql_literals():
    row = {"id": 7, "name": "o'brien", "score": 1.5, "ok": True, "gone": None}
    sql = insert_cql("ks.t", ["id", "name", "score", "ok", "gone"], row)
    assert sql == ("INSERT INTO ks.t (id, name, score, ok, gone) "
                   "VALUES (7, 'o''brien', 1.5, true, NULL)")


def test_batch_statement_shape_and_chunking():
    rows = [{"id": i, "op": "I"} for i in range(5)]
    rows.insert(2, {"id": 99, "op": "-U"})  # before-image skipped
    stmts = batch_statements(rows, "ks.t", ["id"], batch_size=2)
    assert len(stmts) == 3  # 5 live rows at batch_size=2
    assert stmts[0].startswith("BEGIN UNLOGGED BATCH")
    assert stmts[0].endswith("APPLY BATCH;")
    assert "VALUES (99)" not in "".join(stmts)
    assert batch_statements(rows, "ks.t", ["id"], batch_type="LOGGED")[0].startswith(
        "BEGIN BATCH")  # LOGGED is the bare form
    with pytest.raises(ValueError, match="batch_type"):
        batch_statements(rows, "ks.t", ["id"], batch_type="TURBO")


def test_cassandra_conf_dry_run_only(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      Cassandra { source_table_name = "t"  host = "c:9042"
                  keyspace = "ks"  table = "sink"  batch_size = 2
                  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    stmts = res["Cassandra#0"]["statements"]
    assert len(stmts) == 2  # 3 rows at batch_size=2
    assert all("INSERT INTO ks.sink (id, name) VALUES" in s for s in stmts)
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))
