"""Firestore commit seam: typed Value envelopes, keyed vs server-assigned
writes, and the config surface."""

from __future__ import annotations

import json

from seatunnel_spark.sinks.firestore import commit_request, fs_value


def test_value_typing():
    assert fs_value("x") == {"stringValue": "x"}
    assert fs_value(7) == {"integerValue": "7"}  # int64 rides as string
    assert fs_value(1.5) == {"doubleValue": 1.5}
    assert fs_value(True) == {"booleanValue": True}
    assert fs_value(None) == {"nullValue": None}
    assert fs_value([1, "a"]) == {
        "arrayValue": {"values": [{"integerValue": "1"}, {"stringValue": "a"}]}}
    assert fs_value({"k": 2}) == {
        "mapValue": {"fields": {"k": {"integerValue": "2"}}}}


def test_commit_request_keyed_vs_assigned():
    rows = [{"id": 1, "name": "a"}]
    r = commit_request("p1", "repos", rows, ["id", "name"], key_column="id")
    body = json.loads(r.body)
    assert r.url == ("https://firestore.googleapis.com/v1/projects/p1/"
                     "databases/(default)/documents:commit")
    w = body["writes"][0]
    assert w["update"]["name"].endswith("/documents/repos/1")  # keyed upsert
    assert "currentDocument" not in w
    r = commit_request("p1", "repos", rows, ["id", "name"])
    w = json.loads(r.body)["writes"][0]
    assert "name" not in w["update"]
    assert w["currentDocument"] == {"exists": False}  # create-only


def test_firestore_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 7
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      GoogleFirestore { source_table_name = "t"  project_id = "p1"
                        collection = "repos"  key_column = "id"
                        batch_size = 3  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["GoogleFirestore#0"]["requests"]
    assert len(reqs) == 3  # 7 rows at batch 3
    total = sum(len(json.loads(r["body"])["writes"]) for r in reqs)
    assert total == 7
