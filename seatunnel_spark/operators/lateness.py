"""Watermark lateness audit over an arrival-ordered event log.

Structured Streaming drops events that arrive later than the watermark
(streaming/windows.py) but only COUNTS them in opaque stateOperators
metrics. This operator recomputes the same watermark semantics over the
persisted log as an auditable batch query: the watermark at arrival i is
``max(event time over arrivals before i) - delay`` (Spark's
EventTimeWatermark contract), and an event is late when its own event
time falls behind that fence.

The prefix-max is the textbook sequential scan; the distributed shape is
the two-phase split sharding.py uses for ranks:

1. chunk the log by arrival-order ranges (``order div chunk_span``) and
   aggregate each chunk's max event time — one map-side-combinable agg,
   output rows = n/chunk_span;
2. exclusive running max ACROSS chunks — a window over the tiny chunk
   table (thousands of rows at 10^10 events with a 10^7 span: the only
   single-partition step, and it is O(chunks), never O(events));
3. join the chunk fences back and finish the prefix-max INSIDE each chunk
   with a chunk-partitioned window — fully parallel again.

All comparisons run in integer epoch-microseconds (unix_micros /
epoch_us): timestamp-interval arithmetic rounds differently across
engines, int64 micros never do.

Requires unique ``order_col`` values (a log offset / binlog position —
the CDC log's `seq`, the events table's `event_id`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def late_events(
    df: DataFrame,
    order_col: str = "event_id",
    ts_col: str = "ts",
    delay_s: int = 3600,
    chunk_span: int = 100_000,
) -> DataFrame:
    """Per-event lateness flags: adds ``watermark_us`` (the exclusive
    prefix-max of event time in epoch-micros, NULL for the first arrival)
    and ``is_late`` (event time < watermark - delay). Aggregate downstream
    (the registry head groups by event_type)."""
    # parquet event-time columns read as TIMESTAMP_NTZ; the cast to
    # session-zoned timestamp is exact under the engine's UTC session
    # (session.get_spark / replay_job both pin spark.sql.session.timeZone)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    chunk = F.expr(
        f"CAST(({order_col} - ({order_col} % {int(chunk_span)})) / {int(chunk_span)} AS BIGINT)"
    )
    tagged = df.withColumn("_us", us).withColumn("_chunk", chunk)

    chunk_max = tagged.groupBy("_chunk").agg(F.max("_us").alias("_cmax"))
    w_chunks = (
        Window.orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    )
    fences = chunk_max.select(
        "_chunk", F.max("_cmax").over(w_chunks).alias("_prev_max")
    )

    w_in = (
        Window.partitionBy("_chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    delay_us = int(delay_s) * 1_000_000
    return (
        tagged.join(fences, "_chunk")
        .withColumn(
            "watermark_us",
            F.greatest(
                F.max("_us").over(w_in),
                F.col("_prev_max"),
            ),
        )
        .withColumn(
            "is_late",
            F.when(F.col("watermark_us").isNull(), F.lit(False)).otherwise(
                F.col("_us") < F.col("watermark_us") - F.lit(delay_us)
            ),
        )
        .drop("_chunk", "_cmax", "_prev_max", "_us")
    )
