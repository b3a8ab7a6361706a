"""Kudu Impala-SQL seam: UPSERT/DELETE routing with preserved cross-kind
order and the config surface."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.kudu import delete_sql, upsert_sql


def test_upsert_and_delete_sql():
    rows = [{"id": 1, "name": "o'x"}, {"id": 2, "name": None}]
    sql = upsert_sql("impala::db.t", ["id", "name"], rows)
    assert sql == ("UPSERT INTO impala::db.t (id, name) "
                   "VALUES (1, 'o''x'), (2, NULL)")
    sql = delete_sql("impala::db.t", ["id"], [{"id": 7}, {"id": 9}])
    assert sql == "DELETE FROM impala::db.t WHERE (id = 7) OR (id = 9)"
    with pytest.raises(ValueError, match="key_columns"):
        delete_sql("t", [], rows)


def test_kudu_conf_routing_preserves_order(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource {
        result_table_name = "cl"
        schema = { fields { id = bigint  name = string } }
        rows = [
          { kind = INSERT  fields = [1, "a"] },
          { kind = INSERT  fields = [2, "b"] },
          { kind = DELETE  fields = [1, "a"] },
          { kind = INSERT  fields = [1, "a2"] },
          { kind = UPDATE_BEFORE  fields = [2, "b"] },
          { kind = UPDATE_AFTER  fields = [2, "b2"] }
        ]
      }
    }
    sink {
      Kudu { source_table_name = "cl"  kudu_master = "m:7051"
             kudu_table = "impala::db.sink"  key_columns = ["id"]
             dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    stmts = res["Kudu#0"]["statements"]
    kinds = ["D" if s.startswith("DELETE") else "U" for s in stmts]
    assert kinds == ["U", "D", "U"]  # delete-then-reinsert order preserved
    assert "(1, 'a'), (2, 'b')" in stmts[0]
    assert stmts[1] == "DELETE FROM impala::db.sink WHERE (id = 1)"
    assert "(1, 'a2'), (2, 'b2')" in stmts[2]  # -U image skipped
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))
