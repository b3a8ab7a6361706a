"""SelectDB Cloud sink seam: COPY INTO text parity, upload/commit request
shapes, and the config surface."""

from __future__ import annotations

import json

import pytest

from seatunnel_spark.sinks.selectdb import (
    commit_request,
    copy_into_sql,
    upload_request,
)


def test_copy_into_sql_parity():
    sql = copy_into_sql("db.sink", ["l_0.csv", "l_1.csv"], enable_delete=True,
                        props={"file.column_separator": "\\t"})
    assert sql.startswith("COPY INTO db.sink FROM @~('{l_0.csv,l_1.csv}') ")
    assert "'copy.async'='false'" in sql  # CopySQLBuilder forces sync
    assert "'copy.use_delete_sign'='true'" in sql
    assert "'file.column_separator'='\\t'" in sql
    with pytest.raises(ValueError, match="staged file"):
        copy_into_sql("db.t", [])


def test_upload_and_commit_requests():
    u = upload_request("warehouse:8080", "batch_0.csv", "1\ta\n2\tb")
    assert u.url == "http://warehouse:8080/copy/upload" and u.method == "PUT"
    assert u.headers["fileName"] == "batch_0.csv"
    c = commit_request("warehouse:8080", "COPY INTO db.t ...", cluster="c1")
    assert c.url == "http://warehouse:8080/copy/query"
    assert json.loads(c.body) == {"sql": "COPY INTO db.t ...", "cluster": "c1"}


def test_selectdb_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource {
        result_table_name = "cl"
        schema = { fields { id = bigint  name = string } }
        rows = [
          { kind = INSERT  fields = [1, "a"] },
          { kind = DELETE  fields = [2, "b"] }
        ]
      }
    }
    sink {
      SelectDBCloud { source_table_name = "cl"
                      load-url = "warehouse:8080"
                      cluster-name = "c1"
                      table.identifier = "db.sink"
                      sink.enable-delete = "true"
                      sink.label-prefix = "st-fixed"
                      dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    out = res["SelectDBCloud#0"]
    assert len(out["uploads"]) == 1
    body = out["uploads"][0]["body"].split("\n")
    assert body[0] == "1\ta\t0" and body[1] == "2\tb\t1"  # delete sign
    assert out["copy_sql"].startswith("COPY INTO db.sink FROM @~('{st-fixed_0.csv}')")
    assert json.loads(out["commit"]["body"])["cluster"] == "c1"
