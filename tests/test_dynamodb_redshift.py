"""DynamoDB BatchWriteItem seam + S3-Redshift stage-then-COPY sink."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.dynamodb import attribute_value, batch_write_requests


def test_attribute_value_typing():
    assert attribute_value("x") == {"S": "x"}
    assert attribute_value(7) == {"N": "7"}
    assert attribute_value(1.5) == {"N": "1.5"}
    assert attribute_value(True) == {"BOOL": True}
    assert attribute_value(None) == {"NULL": True}
    assert attribute_value(b"\x01\x02") == {"B": "AQI="}
    assert attribute_value([1, "a"]) == {"L": [{"N": "1"}, {"S": "a"}]}
    assert attribute_value({"k": 2}) == {"M": {"k": {"N": "2"}}}


def test_batch_write_requests_chunk_and_rowkinds():
    rows = [{"id": i, "name": f"n{i}", "op": "I"} for i in range(30)]
    rows.append({"id": 99, "name": "gone", "op": "D"})
    rows.append({"id": 98, "name": "img", "op": "-U"})  # skipped
    reqs = batch_write_requests(rows, "st_table", ["id", "name"])
    # 31 writes at the AWS cap of 25 -> 2 requests
    assert len(reqs) == 2
    writes = [w for r in reqs for w in r["RequestItems"]["st_table"]]
    assert len(writes) == 31
    assert "PutRequest" in writes[0]
    assert writes[0]["PutRequest"]["Item"]["id"] == {"N": "0"}
    assert "DeleteRequest" in writes[-1]
    # batch_size above the AWS cap clamps to 25
    assert len(batch_write_requests(rows, "t", ["id"], batch_size=100)) == 2


def test_dynamodb_conf_dry_run_with_key_projection(spark):
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
          { kind = DELETE  fields = [2, "b"] }
        ]
      }
    }
    sink {
      AmazonDynamoDB { source_table_name = "cl"  url = "http://ddb:8000"
                       region = "us-east-1"  table = "st_table"
                       key_columns = ["id"]  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    writes = [w for r in res["AmazonDynamoDB#0"]["requests"]
              for w in r["RequestItems"]["st_table"]]
    put = next(w for w in writes if "PutRequest" in w)
    dele = next(w for w in writes if "DeleteRequest" in w)
    assert put["PutRequest"]["Item"]["name"] == {"S": "a"}
    # DeleteRequest Key holds ONLY the key attributes
    assert dele["DeleteRequest"]["Key"] == {"id": {"N": "2"}}
    with pytest.raises(ConfigError, match="dry_run-only"):
        run_job(spark, load_job_config(conf.replace("dry_run = true",
                                                    "dry_run = false")))


def test_s3redshift_stage_then_copy(spark, tmp_path):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    path = str(tmp_path / "stage")
    conf = f"""
    env {{ job.mode = "BATCH" }}
    source {{
      FakeSource {{ result_table_name = "t"  row.num = 6
                    schema = {{ fields {{ id = bigint  name = string }} }} }}
    }}
    sink {{
      S3Redshift {{
        source_table_name = "t"
        path = "{path}"
        jdbc_url = "jdbc:redshift://rs:5439/dev"
        jdbc_user = "u"  jdbc_password = "p"
        execute_sql = "COPY target_table FROM '${{path}}' IAM_ROLE 'arn:aws:iam::1:role/rs' FORMAT AS PARQUET"
      }}
    }}
    """
    res = run_job(spark, load_job_config(conf))
    out = res["S3Redshift#0"]
    assert out["staged"]
    # files really staged; ${path} substituted into the commit statement
    assert spark.read.parquet(path).count() == 6
    assert out["commit_sql"] == (
        f"COPY target_table FROM '{path}' "
        "IAM_ROLE 'arn:aws:iam::1:role/rs' FORMAT AS PARQUET"
    )
