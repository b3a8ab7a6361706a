"""IoTDB sink seam: insertRecords payload shape + config surface."""

from __future__ import annotations

import json

from seatunnel_spark.sinks.iotdb import insert_records_request, records_payload


def test_records_payload_shape():
    rows = [
        {"dev": "d1", "ts": 1700000000000, "temp": 21.5, "hum": 40},
        {"dev": "root.sg.d2", "ts": 1700000000001, "temp": 22.0, "hum": 41},
    ]
    p = records_payload(rows, ["dev", "ts", "temp", "hum"], "dev", "ts",
                        storage_group="root.sg")
    # storage-group prefix applied only where missing
    assert p["devices"] == ["root.sg.d1", "root.sg.d2"]
    assert p["timestamps"] == [1700000000000, 1700000000001]
    assert p["measurements_list"] == [["temp", "hum"]] * 2
    assert p["values_list"][0] == [21.5, 40]
    # explicit measurement subset
    p = records_payload(rows, ["dev", "ts", "temp", "hum"], "dev", "ts",
                        key_measurement_fields=["temp"])
    assert p["measurements_list"] == [["temp"]] * 2
    assert p["values_list"] == [[21.5], [22.0]]


def test_insert_records_request():
    r = insert_records_request("iotdb:18080", {"devices": []})
    assert r.url == "http://iotdb:18080/rest/v2/insertRecords"
    assert r.method == "POST"
    assert r.headers["Authorization"].startswith("Basic ")
    assert json.loads(r.body) == {"devices": []}


def test_iotdb_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 5
                   schema = { fields { dev = string  ts = bigint
                                       temp = double } } }
    }
    sink {
      IoTDB { source_table_name = "t"  node_urls = ["iotdb:18080"]
              key_device = "dev"  key_timestamp = "ts"
              storage_group = "root.sg"  batch_size = 2  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["IoTDB#0"]["requests"]
    assert len(reqs) == 3  # 5 rows at batch 2
    total = sum(len(json.loads(r["body"])["devices"]) for r in reqs)
    assert total == 5
    assert all(json.loads(r["body"])["devices"][0].startswith("root.sg.")
               for r in reqs)
