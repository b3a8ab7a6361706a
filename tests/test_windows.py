"""Event-time windows + watermark over the change stream."""

from pyspark.sql import functions as F

from seatunnel_spark.schema import event_schema
from seatunnel_spark.sources import generator as gen
from seatunnel_spark.streaming.windows import (
    run_windowed_metrics_stream,
    windowed_change_rates,
)


def test_windowed_change_rates_batch_equals_manual(spark, tmp_path):
    paths = gen.write_fixture(str(tmp_path / "fx"), 100, 2000, seed=5, n_event_files=4)
    ev = spark.read.schema(event_schema()).parquet(paths["events"])
    got = windowed_change_rates(ev, "1 hour").orderBy("window_start", "op").collect()
    # manual check: ts = EPOCH0 + seq seconds → 3600 events/hour window
    manual = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "op")
        .agg(F.count("*").alias("n"))
        .orderBy("h", "op")
        .collect()
    )
    assert [(r["window_start"], r["op"], r["n_events"]) for r in got] == [
        (r["h"], r["op"], r["n"]) for r in manual
    ]


def test_windowed_stream_appends_closed_windows(spark, tmp_path):
    paths = gen.write_fixture(str(tmp_path / "fx"), 100, 8000, seed=6, n_event_files=4)
    out = str(tmp_path / "win_out")
    run_windowed_metrics_stream(
        spark, paths["events"], out, str(tmp_path / "ck"), event_schema(),
        window_size="30 minutes", watermark_delay="5 minutes",
    )
    got = spark.read.parquet(out)
    # 8000 events at 1 ev/s ≈ 2.2h → at least 3 closed 30-min windows emitted
    assert got.select("window_start").distinct().count() >= 3
    # closed windows carry exact counts (events are in-order here)
    ev = spark.read.schema(event_schema()).parquet(paths["events"])
    one = got.orderBy("window_start", "op").collect()[0]
    n = ev.where(
        (F.col("ts") >= one["window_start"]) & (F.col("ts") < one["window_end"])
        & (F.col("op") == one["op"])
    ).count()
    assert one["n_events"] == n


def test_sessionize_gap_semantics(spark):
    """Session boundaries: events within the gap merge; a gap strictly
    larger than the threshold splits; session end = last event + gap."""
    import datetime as dt

    from seatunnel_spark.streaming.windows import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            (1, 1, ts(0)), (2, 1, ts(30)), (3, 1, ts(50)),   # one session
            (4, 1, ts(200)),                                  # gap > 2h: new
            (5, 2, ts(0)),                                    # other user
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = sorted(
        ((r["user_id"], r["session_start"], r["session_end"], r["n_events"])
         for r in sessionize(df, gap="2 hours").collect())
    )
    assert got == [
        (1, ts(0), ts(50 + 120), 3),
        (1, ts(200), ts(200 + 120), 1),
        (2, ts(0), ts(0 + 120), 1),
    ]
