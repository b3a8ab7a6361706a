"""Doris / StarRocks stream-load sinks: request-text parity with the
reference writers (DorisStreamLoad + HttpPutBuilder,
StarRocksStreamLoadVisitor), the CDC delete-sign / __op serialization, and
the reference-shaped .conf surfaces through run_job in dry_run."""

from __future__ import annotations

import base64
import json

import pytest

from seatunnel_spark.sinks.streamload import (
    doris_stream_load_request,
    doris_txn_request,
    starrocks_stream_load_request,
)

ROWS = [
    {"pk_id": 1, "name": "A", "score": 100, "op": "I"},
    {"pk_id": 2, "name": None, "score": 90, "op": "U"},
    {"pk_id": 3, "name": "C", "score": 80, "op": "D"},
]
COLS = ["pk_id", "name", "score"]


def test_doris_csv_request_text():
    r = doris_stream_load_request(
        "doris-fe:8030", "test", "e2e_table_sink", COLS, ROWS,
        username="root", password="", label="test-cdc-0",
        fmt="csv", enable_delete=True, enable_2pc=True,
    )
    assert r.url == "http://doris-fe:8030/api/test/e2e_table_sink/_stream_load"
    assert r.method == "PUT"
    h = r.headers
    assert h["Expect"] == "100-continue"
    assert h["label"] == "test-cdc-0"
    assert h["two_phase_commit"] == "true"
    assert h["hidden_columns"] == "__DORIS_DELETE_SIGN__"
    assert h["column_separator"] == "\t" and h["line_delimiter"] == "\n"
    assert h["Authorization"] == "Basic " + base64.b64encode(b"root:").decode()
    # CSV body: \N nulls, trailing delete sign 0/0/1 (I/U/D)
    lines = r.body.split("\n")
    assert lines[0] == "1\tA\t100\t0"
    assert lines[1] == "2\t\\N\t90\t0"
    assert lines[2] == "3\tC\t80\t1"


def test_doris_json_request_and_props_passthrough():
    r = doris_stream_load_request(
        "fe:8030", "db", "t", COLS, ROWS[:1],
        label="l-0", fmt="json", props={"max_filter_ratio": "0.1"},
    )
    assert r.headers["format"] == "json"
    assert r.headers["read_json_by_line"] == "true"
    assert r.headers["max_filter_ratio"] == "0.1"
    assert "hidden_columns" not in r.headers  # delete handling off
    assert json.loads(r.body) == {"pk_id": 1, "name": "A", "score": 100}


def test_doris_2pc_txn_requests():
    c = doris_txn_request("fe:8030", "db", 42, "commit")
    assert c.url == "http://fe:8030/api/db/_stream_load_2pc"
    assert c.headers["txn_id"] == "42" and c.headers["txn_operation"] == "commit"
    assert c.body == ""
    a = doris_txn_request("fe:8030", "db", 42, "abort")
    assert a.headers["txn_operation"] == "abort"
    with pytest.raises(ValueError, match="commit|abort"):
        doris_txn_request("fe:8030", "db", 1, "rollback")


def test_starrocks_json_request_text():
    r = starrocks_stream_load_request(
        "sr-fe:8030", "test", "sink", COLS, ROWS,
        label="sr-0", fmt="json", enable_upsert_delete=True,
    )
    assert r.url == "http://sr-fe:8030/api/test/sink/_stream_load"
    h = r.headers
    assert h["format"] == "JSON" and h["strip_outer_array"] == "true"
    assert h["Content-Type"] == "application/x-www-form-urlencoded"
    assert "columns" not in h  # CSV-only header (visitor contract)
    body = json.loads(r.body)  # ONE outer array (joinRows)
    assert [o["__op"] for o in body] == ["0", "0", "1"]  # upsert/upsert/delete
    assert body[1]["name"] is None


def test_starrocks_csv_request_text():
    r = starrocks_stream_load_request(
        "fe:8030", "db", "t", COLS, ROWS[:2],
        label="sr-1", fmt="csv", field_delimiter="|", line_delimiter=";",
    )
    assert r.headers["columns"] == "`pk_id`,`name`,`score`"
    assert r.headers["column_separator"] == "|"
    assert r.headers["row_delimiter"] == ";"
    assert r.body == "1|A|100;2|\\N|90"


def test_doris_conf_through_run_job_dry_run(spark):
    """The reference's write-cdc-changelog-to-doris.conf shape (FakeSource
    changelog rows -> Doris CDC sink) renders the exact stream-load request
    without a server."""
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource {
        result_table_name = "fake"
        schema = { fields { pk_id = bigint  name = string  score = int } }
        rows = [
          { kind = INSERT  fields = [1, "A", 100] },
          { kind = UPDATE_BEFORE  fields = [1, "A", 100] },
          { kind = UPDATE_AFTER  fields = [1, "A_1", 100] },
          { kind = DELETE  fields = [2, "B", 100] }
        ]
      }
    }
    sink {
      Doris {
        source_table_name = "fake"
        fenodes = "doris_cdc_e2e:8030"
        username = root
        password = ""
        table.identifier = "test.e2e_table_sink"
        sink.label-prefix = "test-cdc"
        sink.enable-2pc = "false"
        sink.enable-delete = "true"
        doris.config { format = "json" }
        dry_run = true
      }
    }
    """
    res = run_job(spark, load_job_config(conf))
    out = res["Doris#0"]
    assert out["dry_run"] and len(out["requests"]) == 1
    req = out["requests"][0]
    assert req["url"] == "http://doris_cdc_e2e:8030/api/test/e2e_table_sink/_stream_load"
    assert req["headers"]["label"] == "test-cdc-0"
    assert req["headers"]["hidden_columns"] == "__DORIS_DELETE_SIGN__"
    objs = [json.loads(ln) for ln in req["body"].split("\n")]
    signs = {(o["pk_id"], o["name"]): o["__DORIS_DELETE_SIGN__"] for o in objs}
    # all four kinds serialized: -U and D carry delete sign 1 (the server's
    # UNIQUE KEY MoR applies them in order — the reference sends them too)
    assert signs[(1, "A_1")] == "0" and signs[(2, "B")] == "1"
    assert signs[(1, "A")] == "1"  # the UPDATE_BEFORE image


def test_starrocks_conf_through_run_job_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 5
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      StarRocks {
        source_table_name = "t"
        nodeUrls = ["starrocks_e2e:8030"]
        username = root
        password = ""
        database = "test"
        table = "e2e_table_sink"
        batch_max_rows = 2
        starrocks.config = { format = "JSON"  strip_outer_array = true }
        dry_run = true
      }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["StarRocks#0"]["requests"]
    assert len(reqs) == 3  # 5 rows at batch_max_rows=2 -> 3 chunked loads
    assert all(r["url"] == "http://starrocks_e2e:8030/api/test/e2e_table_sink/_stream_load"
               for r in reqs)
    labels = [r["headers"]["label"] for r in reqs]
    assert len(set(labels)) == 3  # distinct labels -> server-side dedup safe
    assert sum(len(json.loads(r["body"])) for r in reqs) == 5


def test_elasticsearch_bulk_lines_rowkind_routing():
    """ElasticsearchRowSerializer parity: keyed upserts are
    update+doc_as_upsert, D and the -U before-image are delete actions,
    _id joins primary keys on key_delimiter, ${field} index variables
    resolve per row."""
    from seatunnel_spark.sinks.elasticsearch import bulk_lines, bulk_request

    rows = [
        {"pk_id": 1, "name": "A", "op": "I"},
        {"pk_id": 1, "name": "A", "op": "-U"},
        {"pk_id": 1, "name": "A2", "op": "U"},
        {"pk_id": 2, "name": "B", "op": "D"},
    ]
    lines = bulk_lines(rows, "st_index", ["pk_id", "name"],
                       primary_keys=["pk_id", "name"], key_delimiter="-")
    acts = [json.loads(ln) for ln in lines]
    assert list(acts[0]) == ["update"] and acts[0]["update"]["_id"] == "1-A"
    assert acts[1] == {"doc": {"pk_id": 1, "name": "A"}, "doc_as_upsert": True}
    assert acts[2] == {"delete": {"_index": "st_index", "_id": "1-A"}}  # -U image
    assert acts[3]["update"]["_id"] == "1-A2"
    assert acts[5] == {"delete": {"_index": "st_index", "_id": "2-B"}}
    # unkeyed: plain index actions; deletes refuse
    lines = bulk_lines([{"pk_id": 7, "name": "x", "op": "I"}], "i", ["pk_id", "name"])
    assert json.loads(lines[0]) == {"index": {"_index": "i"}}
    with pytest.raises(ValueError, match="primary_keys"):
        bulk_lines([{"pk_id": 7, "op": "D"}], "i", ["pk_id"])
    # ${field} index variables (VariableIndexSerializer)
    lines = bulk_lines([{"pk_id": 1, "age": 30, "op": "I"}],
                       "seatunnel_${age}", ["pk_id"], primary_keys=["pk_id"])
    assert json.loads(lines[0])["update"]["_index"] == "seatunnel_30"
    req = bulk_request("http://es:9200", lines, username="elastic", password="pw")
    assert req.url == "http://es:9200/_bulk" and req.method == "POST"
    assert req.headers["Content-Type"] == "application/x-ndjson"
    assert req.body.endswith("\n")  # the bulk API's mandatory trailing newline


def test_elasticsearch_conf_through_run_job_dry_run(spark):
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource { result_table_name = "t"  row.num = 5
                   schema = { fields { id = bigint  name = string } } }
    }
    sink {
      Elasticsearch {
        source_table_name = "t"
        hosts = ["http://es:9200"]
        index = "st_index"
        primary_keys = ["id"]
        max_batch_size = 2
        dry_run = true
      }
    }
    """
    res = run_job(spark, load_job_config(conf))
    reqs = res["Elasticsearch#0"]["requests"]
    assert len(reqs) == 3  # 5 rows at max_batch_size=2
    assert all(r["url"] == "http://es:9200/_bulk" for r in reqs)
    total_updates = sum(r["body"].count('"update"') for r in reqs)
    assert total_updates == 5


def test_foreach_partition_sender_renders_per_partition(spark):
    from seatunnel_spark.sinks.streamload import foreach_partition_sender

    df = spark.range(0, 8).selectExpr("id AS pk_id", "'x' AS name").repartition(4)
    seen = []
    send = foreach_partition_sender(
        lambda tag, cols, rows: doris_stream_load_request(
            "fe:8030", "db", "t", cols, rows, label=f"p-{tag}", fmt="csv"
        ),
        ["pk_id", "name"],
        dry_run_sink=seen.append,
    )
    for part_rows in df.rdd.glom().collect():
        send(iter(part_rows))
    assert 1 <= len(seen) <= 4
    total = sum(len(r.body.split("\n")) for r in seen if r.body)
    assert total == 8
    assert len({r.headers["label"] for r in seen}) == len(seen)
