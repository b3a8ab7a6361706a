"""Kafka broker seam: option-dict text tests (no broker in the sandbox) —
the same dialect-as-text pattern as the Iceberg SQL backend and the JDBC
upsert dialects. Reference: connector-kafka StartMode.java,
KafkaSource.java:138-170, KafkaSourceSplitEnumerator.java:139-160."""

import json

import pytest

from seatunnel_spark.sources.kafka import (
    kafka_read_options,
    kafka_stop_options,
)


def test_start_mode_earliest_latest():
    o = kafka_read_options("b1:9092,b2:9092", "cdc.repos")
    assert o["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert o["subscribe"] == "cdc.repos"
    assert o["startingOffsets"] == "earliest"
    assert o["failOnDataLoss"] == "false"
    assert kafka_read_options("b:9092", "t", "latest")["startingOffsets"] == "latest"


def test_start_mode_timestamp_is_offsets_for_times():
    """TIMESTAMP start resolves per partition via the broker's timestamp
    index — Spark's startingTimestamp IS offsetsForTimes
    (KafkaSourceSplitEnumerator.java:148)."""
    o = kafka_read_options(
        "b:9092", "t", start_mode="timestamp", start_timestamp_ms=1700000000123
    )
    assert o["startingTimestamp"] == "1700000000123"
    assert "startingOffsets" not in o
    with pytest.raises(ValueError, match="start_timestamp_ms"):
        kafka_read_options("b:9092", "t", start_mode="timestamp")
    with pytest.raises(ValueError, match="start_timestamp_ms"):
        kafka_read_options(
            "b:9092", "t", start_mode="timestamp", start_timestamp_ms=-1
        )  # KafkaSource.java:145-149 rejects negatives


def test_start_mode_specific_offsets_json_shape():
    o = kafka_read_options(
        "b:9092", "t", start_mode="specific_offsets", start_offsets={0: 100, 2: 5}
    )
    assert json.loads(o["startingOffsets"]) == {"t": {"0": 100, "2": 5}}
    with pytest.raises(ValueError, match="start_offsets"):
        kafka_read_options("b:9092", "t", start_mode="specific_offsets")


def test_start_mode_group_offsets_and_pattern():
    # Spark's Kafka source never resumes from a group's committed offsets —
    # group_offsets without an explicit first-start fallback must refuse,
    # not silently reprocess the topic from earliest.
    with pytest.raises(ValueError, match="not supported on the Spark transport"):
        kafka_read_options(
            "b:9092", "t", start_mode="group_offsets", consumer_group="st-group"
        )
    o = kafka_read_options(
        "b:9092", "t", start_mode="group_offsets", consumer_group="st-group",
        group_offsets_fallback="latest",
    )
    assert o["kafka.group.id"] == "st-group"
    assert o["startingOffsets"] == "latest"  # the caller's explicit choice
    with pytest.raises(ValueError, match="consumer_group"):
        kafka_read_options("b:9092", "t", start_mode="group_offsets")
    # topic regex subscription (the reference's PATTERN option)
    o = kafka_read_options("b:9092", "cdc\\..*", pattern=True)
    assert o["subscribePattern"] == "cdc\\..*"
    assert "subscribe" not in o
    with pytest.raises(ValueError, match="unknown start_mode"):
        kafka_read_options("b:9092", "t", start_mode="bogus")


def test_stop_modes():
    assert kafka_stop_options("t", "never") == {}
    assert kafka_stop_options("t", "latest") == {"endingOffsets": "latest"}
    o = kafka_stop_options("t", "timestamp", stop_timestamp_ms=42)
    assert o == {"endingTimestamp": "42"}
    o = kafka_stop_options("t", "specific_offsets", stop_offsets={1: 7})
    assert json.loads(o["endingOffsets"]) == {"t": {"1": 7}}
    with pytest.raises(ValueError, match="unknown stop_mode"):
        kafka_stop_options("t", "sometime")


def test_queue_e2e_runs_unchanged_through_file_fallback(spark, tmp_path):
    """The seam must not disturb the default transport: the canal queue e2e
    (file-backed stand-in, broker=None) behaves exactly as before."""
    import os

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, repo_schema
    from seatunnel_spark.streaming.job import CdcIngestJob

    lines = [
        json.dumps({"data": [{"repo": "o/r", "path": "a.py", "commit": "c1",
                              "lang": "py", "content": "v1"}],
                    "old": None, "type": "INSERT", "table": "repos", "ts": 1}),
        json.dumps({"data": [{"repo": "o/r", "path": "a.py", "commit": "c2",
                              "lang": "py", "content": "v2"}],
                    "old": None, "type": "UPDATE", "table": "repos", "ts": 2}),
    ]
    topic = str(tmp_path / "topic")
    os.makedirs(topic)
    with open(os.path.join(topic, "p0.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    root = str(tmp_path / "t")
    LakeTable.create(root, REPO_FIELDS, REPO_KEY, num_buckets=2)
    job = CdcIngestJob(spark, root, topic, str(tmp_path / "c"), num_buckets=2,
                       wire_format="canal-json", wire_row_schema=repo_schema(),
                       broker=None)
    job.run_incremental(available_now=True, timeout_s=300)
    got = {r["path"]: r["content"]
           for r in LakeTable.load(root).scan(spark).collect()}
    assert got == {"a.py": "v2"}
