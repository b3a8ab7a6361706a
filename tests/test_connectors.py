"""Tests for wire formats (debezium/canal JSON), assert sink, file connectors."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seatunnel_spark.sinks.assert_sink import AssertError, FieldRule, assert_sink
from seatunnel_spark.sources.files import read_file_source, write_file_sink
from seatunnel_spark.sources.formats import parse_canal_json, parse_debezium_json

ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)


def test_parse_debezium_json(spark):
    msgs = [
        json.dumps({"before": None, "after": {"id": 1, "name": "a"}, "op": "c",
                    "ts_ms": 100, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": {"id": 1, "name": "a"}, "after": {"id": 1, "name": "b"},
                    "op": "u", "ts_ms": 200, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": {"id": 1, "name": "b"}, "after": None, "op": "d",
                    "ts_ms": 300, "source": {"table": "t1", "db": "d"}}),
        json.dumps({"before": None, "after": {"id": 2, "name": "z"}, "op": "r",
                    "ts_ms": 50, "source": {"table": "t2", "db": "d"}}),
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_debezium_json(df, ROW_SCHEMA).collect()
    by_ts = {r["ts_ms"]: r for r in out}
    assert by_ts[100]["op"] == "I" and by_ts[100]["name"] == "a"
    assert by_ts[200]["op"] == "U" and by_ts[200]["name"] == "b"   # after image
    assert by_ts[300]["op"] == "D" and by_ts[300]["name"] == "b"   # before image
    assert by_ts[50]["op"] == "I" and by_ts[50]["_table"] == "t2"  # READ → insert


def test_parse_canal_json(spark):
    msg = json.dumps(
        {"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}], "old": None,
         "type": "UPDATE", "table": "t1", "ts": 42}
    )
    df = spark.createDataFrame([(msg,)], "value string")
    out = parse_canal_json(df, ROW_SCHEMA).collect()
    assert len(out) == 2 and all(r["op"] == "U" for r in out)
    assert {r["id"] for r in out} == {1, 2}


def test_assert_sink_pass_and_fail(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "id long, name string")
    stats = assert_sink(df, min_rows=3, field_rules=[FieldRule("id", min_value=1, max_value=3)])
    assert stats["_n"] == 3
    with pytest.raises(AssertError, match="null"):
        assert_sink(df, field_rules=[FieldRule("name", not_null=True)])
    with pytest.raises(AssertError, match="row count"):
        assert_sink(df, min_rows=10)
    with pytest.raises(AssertError, match="regex"):
        assert_sink(df.where(F.col("name").isNotNull()),
                    field_rules=[FieldRule("name", regex="^a$")])


def test_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    for fmt in ["json", "csv", "parquet", "orc"]:
        p = str(tmp_path / fmt)
        write_file_sink(df, fmt, p, save_mode="overwrite",
                        options={"header": "true"} if fmt == "csv" else None or {})
        back = read_file_source(
            spark, fmt, p,
            schema=df.schema if fmt in ("json", "csv") else None,
            options={"header": "true"} if fmt == "csv" else {},
        )
        assert back.count() == 2
    with pytest.raises(NotImplementedError):
        write_file_sink(df, "excel", str(tmp_path / "x"))
