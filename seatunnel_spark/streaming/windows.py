"""Event-time windowed aggregation with watermarks over the change stream.

SeaTunnel's "watermark" is a log-offset fence (SURVEY §2.4 note) — it has no
event-time windowing. A Spark-native engine gets real event-time semantics
for free, and a CDC pipeline wants them for monitoring (change rates per
table/op/hour with late-event tolerance). This module is that operator:

    events ─ readStream ─ withWatermark(ts, delay)
           ─ groupBy(window(ts, size), op) ─ count/sum ─ append sink

Late events inside the watermark delay still update their window; events
later than the delay are dropped (counted by Spark's stateOperators metrics).
State is bounded by (windows in flight × group cardinality) — the watermark
is what lets Spark evict closed windows, which is the difference between
bounded and unbounded state at 10^10 events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_rates(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window change-rate aggregation (streaming or batch DF)."""
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"), F.col("op"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
        )
    )


def run_windowed_metrics_stream(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    event_schema,
    window_size: str = "1 hour",
    watermark_delay: str = "10 minutes",
    available_now: bool = True,
):
    """Side pipeline: stream the event log into an append-mode windowed
    metrics table (closed windows only — exactly-once via the checkpoint)."""
    stream = spark.readStream.schema(event_schema).parquet(events_dir)
    agg = windowed_change_rates(stream, window_size, watermark_delay)
    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def sessionize(
    df, gap: str = "2 hours", key: str = "user_id", ts_col: str = "ts"
):
    """Gap-based sessionization via Spark's native session_window — the
    dynamic-gap event-time window (state merges adjacent windows closer
    than ``gap``). Works identically on a batch frame and on a stream with
    a watermark; the oracle form is the classic lag/cumulative-sum island
    computation. One keyed shuffle; session state is bounded by the
    watermark on streams."""
    from pyspark.sql import functions as F

    return (
        df.groupBy(key, F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
