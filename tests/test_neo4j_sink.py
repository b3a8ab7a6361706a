"""Neo4j cypher seam: per-row param binding, $batch UNWIND mode, config
surface."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.neo4j import batch_queries, row_queries

ROWS = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
COLS = ["id", "name"]


def test_row_mode_binds_params_by_position():
    q = "MERGE (n:Repo {id: $pid}) SET n.name = $pname"
    out = row_queries(ROWS, q, {"pid": 0, "pname": 1}, COLS)
    assert out == [
        (q, {"pid": 1, "pname": "a"}),
        (q, {"pid": 2, "pname": "b"}),
    ]
    with pytest.raises(ValueError, match="out of range"):
        row_queries(ROWS, q, {"pid": 7}, COLS)


def test_batch_mode_unwinds():
    q = "UNWIND $batch AS row MERGE (n:Repo {id: row.id}) SET n += row"
    out = batch_queries(ROWS * 3, q, COLS, max_batch_size=4)
    assert len(out) == 2  # 6 rows at batch 4
    assert out[0][1]["batch"][0] == {"id": 1, "name": "a"}
    assert len(out[0][1]["batch"]) == 4 and len(out[1][1]["batch"]) == 2
    with pytest.raises(ValueError, match="batch"):
        batch_queries(ROWS, "MERGE (n) RETURN n", COLS)


def test_neo4j_conf_dry_run_only(spark):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      Neo4j { source_table_name = "t"
              uri = "neo4j://db:7687"  username = "neo4j"  password = "pw"
              database = "neo4j"
              query = "UNWIND $batch AS row MERGE (n:R {id: row.id}) SET n += row"
              max_batch_size = 2  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    qs = res["Neo4j#0"]["queries"]
    assert len(qs) == 2  # 3 rows at batch 2
    assert all(q["query"].startswith("UNWIND $batch") for q in qs)
    assert sum(len(q["parameters"]["batch"]) for q in qs) == 3
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))
