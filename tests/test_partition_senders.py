"""Partition-path (foreachPartition) senders for the bulk-HTTP sink family
— the distributed twin of each sink's collected-batch ``requests_for_batch``
(reference: per-subtask SinkWriter.write, seatunnel-api .../sink/
SinkWriter.java:38-89). Each test drives the partition function over
``df.rdd.glom().collect()`` (same harness as the streamload sender test):
request SHAPE and coverage are what's asserted; the closure itself is
executor-safe (module-level builders, no driver state)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def cdc_df(spark):
    rows = [
        (1, "alpha", "I"),
        (2, "beta", "+U"),
        (3, "gamma", "D"),
        (4, "delta", "-U"),
        (5, "epsilon", "I"),
    ]
    return (
        spark.createDataFrame(rows, "pk_id int, name string, op string")
        .repartition(3)
    )


def _drive(df, send):
    for part in df.rdd.glom().collect():
        send(iter(part))


def test_es_partition_sender_routes_deletes(spark, cdc_df):
    from seatunnel_spark.sinks.elasticsearch import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "http://es:9200", "idx", ["pk_id", "name"],
        primary_keys=["pk_id"], max_batch_size=2, dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    lines = [ln for r in seen for ln in r.body.splitlines() if ln]
    metas = [json.loads(ln) for ln in lines if '"update"' in ln or '"delete"' in ln]
    # I/+U -> update actions, D/-U -> delete actions; every row routed
    assert sum(1 for m in metas if "update" in m) == 3
    assert sum(1 for m in metas if "delete" in m) == 2
    ids = {m.get("update", m.get("delete"))["_id"] for m in metas}
    assert ids == {"1", "2", "3", "4", "5"}
    # every request is a well-formed _bulk POST with trailing newline
    assert all(r.url.endswith("/_bulk") and r.body.endswith("\n") for r in seen)


def test_tablestore_partition_sender_puts_only(spark, cdc_df):
    from seatunnel_spark.sinks.tablestore import (
        decode_plainbuffer,
        foreach_partition_sender,
    )

    seen = []
    send = foreach_partition_sender(
        "http://ots", "inst", "ak", "sk", "tbl",
        primary_keys=["pk_id"], columns=["pk_id", "name"],
        date="2026-08-18T00:00:00.000Z", batch_size=2,
        dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    assert seen and all(r.url.endswith("/BatchWriteRow") for r in seen)
    assert all("x-ots-signature" in r.headers for r in seen)
    # D/-U dropped (RowPutChange-only serializer): exactly the 3 surviving
    # rows' full PlainBuffer encodings appear (embedded verbatim as
    # length-delimited protobuf fields), the dropped rows' never do
    from seatunnel_spark.sinks.tablestore import encode_put_row

    body = b"".join(r.body for r in seen)
    for pk, name in ((1, "alpha"), (2, "beta"), (5, "epsilon")):
        assert body.count(encode_put_row([("pk_id", pk)], [("name", name)])) == 1
    for pk, name in ((3, "gamma"), (4, "delta")):
        assert encode_put_row([("pk_id", pk)], [("name", name)]) not in body


def test_maxcompute_partition_sender_appends(spark, cdc_df):
    from seatunnel_spark.sinks.maxcompute import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "http://odps", "proj", "tbl", "id", "key",
        columns=["pk_id", "name"], date="Mon, 18 Aug 2026 00:00:00 GMT",
        split_row=2, dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    bodies = "".join(r.body for r in seen)
    # append-only: D/-U images dropped, survivors all inserted
    assert "INSERT OVERWRITE" not in bodies
    for name in ("alpha", "beta", "epsilon"):
        assert name in bodies
    for name in ("gamma", "delta"):
        assert name not in bodies
    assert all(r.headers["Authorization"].startswith("ODPS id:") for r in seen)


def test_maxcompute_partition_sender_refuses_overwrite(spark):
    from seatunnel_spark.sinks.maxcompute import foreach_partition_sender

    with pytest.raises(ValueError, match="coordinat"):
        foreach_partition_sender(
            "http://odps", "p", "t", "id", "key",
            columns=["a"], date="d", overwrite=True,
        )


def test_datahub_partition_sender_publishes_all(spark, cdc_df):
    from seatunnel_spark.sinks.datahub import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "http://dh", "proj", "topic", "id", "key",
        columns=["pk_id", "name"], date="Mon, 18 Aug 2026 00:00:00 GMT",
        chunk_rows=2, dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    recs = [rec for r in seen for rec in json.loads(r.body)["Records"]]
    # message hub: every arriving row published as-is (no rowkind routing)
    assert len(recs) == 5
    assert all(
        r.headers["Authorization"].startswith("DATAHUB id:") for r in seen
    )


def test_empty_partition_sends_nothing(spark):
    from seatunnel_spark.sinks.datahub import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "http://dh", "p", "t", "id", "key",
        columns=["pk_id"], date="d", dry_run_sink=seen.append,
    )
    send(iter([]))
    assert seen == []


def test_influxdb_partition_sender_lines(spark, cdc_df):
    from seatunnel_spark.sinks.influxdb import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "http://influx:8086", "db", "m", ["pk_id", "name"],
        key_tags=["pk_id"], batch_size=2, dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    lines = [ln for r in seen for ln in r.body.splitlines() if ln]
    # D/-U dropped: 3 surviving rows -> 3 points, tagged by pk
    assert len(lines) == 3
    assert all(ln.startswith("m,pk_id=") for ln in lines)
    assert all("/write?db=db" in r.url for r in seen)


def test_redis_partition_sender_pipelines(spark, cdc_df):
    from seatunnel_spark.sinks.redis import foreach_partition_sender

    seen = []
    send = foreach_partition_sender(
        "localhost", 6379, "pk_id", ["pk_id", "name"],
        data_type="hash", expire=60, dry_run_sink=seen.append,
    )
    _drive(cdc_df, send)
    cmds = [c for p in seen for c in p.cmds]
    hsets = [c for c in cmds if c[0] == "HSET"]
    expires = [c for c in cmds if c[0] == "EXPIRE"]
    assert {c[1] for c in hsets} == {"1", "2", "5"}  # D/-U dropped
    assert len(expires) == 3 and all(c[2] == "60" for c in expires)
