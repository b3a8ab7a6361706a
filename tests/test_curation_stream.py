"""Streaming corpus curation (streaming/curation_stream.py): quality gate +
watermark-bounded exact dedup over an unbounded document stream."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from seatunnel_spark.streaming.curation_stream import (
    stream_corpus_clean,
    stream_dedup_exact,
)

GOOD = ("this is a perfectly reasonable document with plenty of words and "
        "enough length to pass the quality gate easily, twice over.")
GOOD2 = ("another quite acceptable piece of text that also clears every "
         "quality heuristic with room to spare, full sentences and all.")
JUNK = "!!! ??? ,,,"  # fails length/punct gates

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _write_batch(d, name, rows, mtime=None):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    with open(p, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    if mtime is not None:
        # FileStreamSource orders by modification time — make it explicit
        # so "batch 0 before batch 1" is deterministic
        os.utime(p, (mtime, mtime))


def test_stream_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch file 1: original + same-batch dup; batch file 2: cross-batch dup
    # (within watermark) + a fresh doc
    _write_batch(src, "b0.json", [
        {"doc_id": 1, "text": GOOD, "ts": "2024-01-01T10:00:00"},
        {"doc_id": 2, "text": GOOD, "ts": "2024-01-01T10:00:01"},
        {"doc_id": 3, "text": GOOD2, "ts": "2024-01-01T10:00:02"},
    ], mtime=1_700_000_000)
    _write_batch(src, "b1.json", [
        {"doc_id": 4, "text": GOOD, "ts": "2024-01-01T10:30:00"},
        {"doc_id": 5, "text": GOOD2 + " fresh tail", "ts": "2024-01-01T10:30:01"},
    ], mtime=1_700_000_060)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream_dedup_exact(stream, watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.schema(DOC_SCHEMA).parquet(out_dir)
    ids = sorted(r["doc_id"] for r in got.collect())
    # doc 2 (same-batch dup) and doc 4 (cross-batch dup within watermark)
    # are dropped; 1, 3, 5 survive
    assert ids == [1, 3, 5]
    # the state key is the fingerprint, and batch mode agrees on it
    batch = spark.read.schema(DOC_SCHEMA).json(src)
    batch_ids = sorted(
        r["doc_id"]
        for r in stream_dedup_exact(batch).orderBy("doc_id").collect()
    )
    assert set(batch_ids) == {1, 3, 5}


def test_stream_corpus_clean_gates_before_dedup(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0.json", [
        {"doc_id": 1, "text": GOOD, "ts": "2024-01-01T10:00:00"},
        {"doc_id": 2, "text": JUNK, "ts": "2024-01-01T10:00:01"},
        {"doc_id": 3, "text": GOOD, "ts": "2024-01-01T10:00:02"},
    ])
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out_dir = str(tmp_path / "out")
    cleaned = stream_corpus_clean(stream, watermark="1 hour")
    assert cleaned.isStreaming
    assert set(cleaned.columns) == {"doc_id", "text", "ts"}  # gate cols dropped
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(r["doc_id"] for r in
                 spark.read.schema(DOC_SCHEMA).parquet(out_dir).collect())
    assert got == [1]  # junk gated out, duplicate dropped

    # the streaming plan carries the bounded-state dedup operator
    plan = cleaned._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan or "dropDuplicatesWithinWatermark" in plan
