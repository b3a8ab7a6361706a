"""Custom stateful operator: per-repo counters survive across micro-batches
(state store), final cumulative counts equal the batch ground truth."""

from pyspark.sql import functions as F

from seatunnel_spark.schema import event_schema
from seatunnel_spark.sources import generator as gen
from seatunnel_spark.streaming.stateful import repo_change_tracker


def test_stateful_repo_tracker(spark, tmp_path):
    paths = gen.write_fixture(str(tmp_path / "fx"), 100, 1000, seed=9, n_event_files=4)
    stream = (
        spark.readStream.schema(event_schema())
        .option("maxFilesPerTrigger", 1)
        .parquet(paths["events"])
        .where(F.col("op") != "DDL")
    )
    out_dir = str(tmp_path / "out")
    q = (
        repo_change_tracker(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tracker")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql(
        """SELECT repo, max(cum_events) AS cum, max(last_seq) AS last_seq,
                  sum(batch_events) AS summed
           FROM tracker GROUP BY repo"""
    ).collect()
    ev = spark.read.schema(event_schema()).parquet(paths["events"]).where(F.col("op") != "DDL")
    truth = {
        r["repo"]: (r["n"], r["m"])
        for r in ev.groupBy("repo").agg(F.count("*").alias("n"), F.max("seq").alias("m")).collect()
    }
    assert len(got) == len(truth)
    for r in got:
        n, m = truth[r["repo"]]
        assert r["cum"] == n, (r["repo"], r["cum"], n)   # state accumulated across batches
        assert r["summed"] == n                           # per-batch emissions partition the total
        assert r["last_seq"] == m
