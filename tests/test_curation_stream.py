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


def test_stream_neardup_drops_variants_across_batches(spark, tmp_path):
    """The near-dup path: a VARIANT (not exact duplicate) of an accepted
    doc arriving in a later micro-batch within the watermark is dropped by
    the bounded band-hash store; fresh docs pass; within-batch variants
    collapse to one canonical."""
    from seatunnel_spark.streaming.curation_stream import run_stream_clean_neardup

    # realistic document length: one edited word in ~100 words keeps ~95%
    # of shingles, so variants collide in most LSH bands (short snippets
    # collide in ≤1 band and are below the ≥2-band precision floor — the
    # compaction-time exact verify owns that tail)
    base = " ".join(
        f"sentence {i} of a long and reasonably varied document about "
        f"data pipelines topic{i}" for i in range(10)
    )
    near1 = base  # original
    near2 = base.replace("topic7", "subject7")  # cross-batch variant
    near3 = base.replace("topic2", "theme2")    # same-batch variant
    src = str(tmp_path / "src")
    _write_batch(src, "b0.json", [
        {"doc_id": 1, "text": near1, "ts": "2024-01-01T10:00:00"},
        {"doc_id": 2, "text": near3, "ts": "2024-01-01T10:00:01"},
        {"doc_id": 3, "text": GOOD2, "ts": "2024-01-01T10:00:02"},
    ], mtime=1_700_000_000)
    _write_batch(src, "b1.json", [
        {"doc_id": 4, "text": near2, "ts": "2024-01-01T10:20:00"},
        {"doc_id": 5, "text": "a wholly different subject entirely: "
                              "gardening tips for arid climates, with many "
                              "practical suggestions and helpful notes.",
         "ts": "2024-01-01T10:20:01"},
    ], mtime=1_700_000_060)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = str(tmp_path / "out")
    run_stream_clean_neardup(
        stream, out, str(tmp_path / "ck"), str(tmp_path / "store"),
        watermark_s=3600,
    )
    ids = sorted(r["doc_id"] for r in
                 spark.read.schema(DOC_SCHEMA).parquet(out).collect())
    # 2 collapses within batch 0 (canonical = 1); 4 is dropped by the store
    # as a near-dup of 1 across batches; 3 and 5 are genuinely fresh
    assert ids == [1, 3, 5]
    # the store holds only (band, bh, ts) per epoch partition — never text
    st = spark.read.parquet(str(tmp_path / "store"))
    assert set(st.columns) == {"band", "bh", "ts", "epoch"}
    assert st.count() > 0


def test_neardup_store_evicts_past_watermark(spark, tmp_path):
    """A variant arriving AFTER the watermark horizon is re-admitted (the
    documented stream/batch split: the late tail is compaction's job) —
    proving state is genuinely bounded, not grow-forever."""
    from seatunnel_spark.streaming.curation_stream import NearDupStore

    base = " ".join(
        f"paragraph {i} covering storage engines and shuffle behavior in "
        f"distributed systems item{i}" for i in range(10)
    )
    store = NearDupStore(str(tmp_path / "store"), watermark_s=600)
    b0 = spark.createDataFrame(
        [(1, base, "2024-01-01T10:00:00")],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert [r["doc_id"] for r in store.filter_batch(b0, epoch_id=0).collect()] == [1]
    # 5 min later (inside watermark): variant dropped
    b1 = spark.createDataFrame(
        [(2, base.replace("item4", "entry4"), "2024-01-01T10:05:00")],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert store.filter_batch(b1, epoch_id=1).count() == 0
    # crash replay of the SAME epoch: identical outcome, not self-collision
    assert store.filter_batch(b1, epoch_id=1).count() == 0
    assert [r["doc_id"]
            for r in store.filter_batch(b0, epoch_id=0).collect()] == [1]
    # 2 hours later (far past watermark): the store evicted doc 1's bands
    # when the horizon advanced, so the variant is re-admitted
    b2 = spark.createDataFrame(
        [(3, base.replace("item8", "entry8"), "2024-01-01T12:30:00")],
        "doc_id long, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert [r["doc_id"] for r in store.filter_batch(b2, epoch_id=2).collect()] == [3]
    st = spark.read.parquet(str(tmp_path / "store" / "epoch=2"))
    assert st.where(F.col("ts") < "2024-01-01T12:00:00").count() == 0
    import os

    # epoch partitions 0/1 dropped whole (partition-drop eviction)
    assert sorted(os.listdir(tmp_path / "store")) == ["epoch=2"]


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
