"""Streaming corpus curation: the batch cleaning operators composed onto an
unbounded document stream with bounded state.

A training-data pipeline's ingest side is a stream (crawl batches, upload
feeds); the curation rules are the batch suite's (operators/text.py,
operators/dedup_docs.py) — pure codegen'd expressions, so they apply to a
streaming DataFrame unchanged. The one genuinely stateful step is exact
dedup across micro-batches: Spark's ``dropDuplicatesWithinWatermark``
keeps one state row per fingerprint and EVICTS it once the watermark
passes — bounded state, the only kind that survives an unbounded stream.
(Plain ``dropDuplicates`` on a stream grows state forever; the watermark
variant is the scale-correct form.)

Contract: a duplicate arriving within the watermark delay of its first
sighting is dropped; one arriving later may be re-admitted — at 100 TB
that tail is the batch dedup's job (minhash/exact over the landed corpus),
exactly how production pipelines split stream-time vs compaction-time
dedup. State is keyed by the 32-char md5 fingerprint, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seatunnel_spark.operators.text import quality_score


def doc_fingerprint(col: str = "text") -> F.Column:
    """Whitespace-normalized md5 — identical to operators/dedup_docs.
    exact_dedup's grouping key, so stream-time and compaction-time dedup
    agree on what "exact duplicate" means."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))


def stream_dedup_exact(
    docs: DataFrame,
    ts_col: str = "ts",
    col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup across micro-batches with watermark-bounded state: the
    first arrival of each fingerprint passes, duplicates within the
    watermark window are dropped, state evicts at the watermark. Works on
    batch DataFrames too (falls back to plain dropDuplicates — batch has
    no unbounded-state problem)."""
    with_fp = docs.withColumn("_fp", doc_fingerprint(col))
    if not docs.isStreaming:
        return with_fp.dropDuplicates(["_fp"]).drop("_fp")
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def stream_corpus_clean(
    docs: DataFrame,
    ts_col: str = "ts",
    col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming cleaning stage: quality gate (pure expressions — C4/Gopher
    heuristics) THEN watermarked exact dedup. Filter-before-dedup keeps
    junk documents out of the dedup state entirely — state size tracks the
    accepted corpus, not the crawl."""
    q = quality_score(docs, col).where(F.col("quality_ok"))
    q = q.select(docs.columns)  # quality columns were only the gate
    return stream_dedup_exact(q, ts_col=ts_col, col=col, watermark=watermark)
