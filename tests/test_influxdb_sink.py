"""InfluxDB line-protocol sink: spec-exact escaping and typing, the
/write request shape, and the config surface in dry_run."""

from __future__ import annotations

import pytest

from seatunnel_spark.sinks.influxdb import line_protocol, write_request


def test_line_protocol_types_and_escaping():
    rows = [
        {"host": "web 1", "region": "eu,west", "cpu": 0.5, "count": 7,
         "up": True, "note": 'say "hi"', "ts": 1700000000123},
        {"host": "db1", "region": None, "cpu": None, "count": None,
         "up": None, "note": None, "ts": 1700000000456},  # no fields -> skip
    ]
    cols = ["host", "region", "cpu", "count", "up", "note", "ts"]
    lines = line_protocol(rows, cols, "sys metrics",
                          key_tags=["host", "region"], key_time="ts")
    assert len(lines) == 1  # the all-null-fields point is skipped
    ln = lines[0]
    assert ln.startswith("sys\\ metrics,host=web\\ 1,region=eu\\,west ")
    assert "cpu=0.5" in ln and "count=7i" in ln and "up=true" in ln
    assert 'note="say \\"hi\\""' in ln
    assert ln.endswith(" 1700000000123")
    with pytest.raises(ValueError, match="field column"):
        line_protocol(rows, ["host", "ts"], "m", key_tags=["host"], key_time="ts")


def test_write_request_shape():
    r = write_request("http://flux:8086", "metrics", ["m v=1i 1", "m v=2i 2"],
                      username="u", password="p", retention_policy="rp30d")
    assert r.url == "http://flux:8086/write?db=metrics&precision=ms&rp=rp30d"
    assert r.method == "POST"
    assert r.headers["Content-Type"].startswith("text/plain")
    assert r.body == "m v=1i 1\nm v=2i 2\n"


def test_influxdb_conf_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 5
                   schema = { fields { host = string  cpu = double } } }
    }
    sink {
      InfluxDB { source_table_name = "t"
                 url = "http://flux:8086"  database = "metrics"
                 measurement = "sys"  key_tags = ["host"]
                 batch_size = 2  dry_run = true }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["InfluxDB#0"]["requests"]
    assert len(reqs) == 3  # 5 points at batch_size=2
    assert all(r["url"].startswith("http://flux:8086/write?db=metrics")
               for r in reqs)
    total = sum(r["body"].count("\n") for r in reqs)
    assert total == 5
