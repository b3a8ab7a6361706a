"""TDengine sink seam: the reference's USING/TAGS insert statement shape
and the REST SQL request."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.tdengine import insert_statements, rest_sql_request


def test_insert_statement_shape():
    rows = [{"sub": "d1001", "ts": "2024-01-01 00:00:00", "current": 10.5,
             "location": "sf", "group_id": 2}]
    cols = ["sub", "ts", "current", "location", "group_id"]
    stmts = insert_statements(rows, cols, "meters", tags_num=2)
    assert stmts == [
        "INSERT INTO d1001 USING meters "
        "TAGS ( 'sf', 2 ) VALUES ( '2024-01-01 00:00:00', 10.5 );"
    ]
    with pytest.raises(ValueError, match="tags_num"):
        insert_statements(rows, cols, "meters", tags_num=4)


def test_rest_sql_request():
    r = rest_sql_request("http://td:6041", "SELECT 1;", database="power")
    assert r.url == "http://td:6041/rest/sql/power"
    assert r.method == "POST" and r.body == "SELECT 1;"
    assert r.headers["Authorization"].startswith("Basic ")


def test_tdengine_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 3
                   schema = { fields { sub = string  val = double
                                       loc = string } } }
    }
    sink {
      TDengine { source_table_name = "t"  url = "http://td:6041"
                 database = "power"  stable = "meters"  tags_num = 1
                 dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["TDengine#0"]["requests"]
    assert len(reqs) == 3
    assert all(r["url"].endswith("/rest/sql/power") for r in reqs)
    assert all("USING meters TAGS" in r["body"] for r in reqs)
