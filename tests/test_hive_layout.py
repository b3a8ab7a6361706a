"""Metastore-less Hive-layout connector (sources/hive.py).

Reference: connector-hive HiveSource.java:63-120 (metastore_uri+table_name →
location, reads delegate to the file source), HiveSink + the repo's own
fakesource_to_hive.conf. The metastore's name→location job is resolved by
the warehouse-layout convention; everything else is Spark's partitioned
directory machinery (native partition pruning)."""

import os

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.sources.hive import (
    hive_table_path,
    read_hive_table,
    write_hive_table,
)


def test_table_path_resolution(tmp_path):
    w = str(tmp_path)
    assert hive_table_path(w, "db1.t1") == os.path.join(w, "db1.db", "t1")
    assert hive_table_path(w, "default.t1") == os.path.join(w, "t1")
    assert hive_table_path(w, "t1") == os.path.join(w, "t1")


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    w = str(tmp_path / "warehouse")
    df = spark.createDataFrame(
        [(i, f"n{i}", "2024-01-0%d" % (i % 3 + 1), i % 2) for i in range(30)],
        "id long, name string, dt string, bucket int",
    )
    path = write_hive_table(df, w, "db1.events", partition_by=["dt", "bucket"])
    assert os.path.isdir(os.path.join(path, "dt=2024-01-01", "bucket=0"))

    back = read_hive_table(spark, w, "db1.events")
    assert back.count() == 30
    # partition columns materialize from the directory names
    assert set(back.columns) == {"id", "name", "dt", "bucket"}

    # read_partitions (the reference's spelling) → directory pruning: only
    # the named partition dirs are even opened
    part = read_hive_table(
        spark, w, "db1.events", read_partitions=["dt=2024-01-01/bucket=0"]
    )
    files = part.inputFiles()
    assert files and all("dt=2024-01-01/bucket=0" in f for f in files)
    # (Spark type-infers partition values from the dir names — dt becomes a
    # real DATE column, which is what a typed metastore would declare too)
    assert str(part.select("dt").distinct().collect()[0]["dt"]) == "2024-01-01"

    # a filter on the partition column prunes natively too (metastore
    # parity): it lands as a PartitionFilter on the scan, not a data filter
    pruned = read_hive_table(spark, w, "db1.events").where(F.col("dt") == "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan and "= 2024-01-02)" in plan
    assert pruned.count() == 10

    # read_columns projection narrows the read schema
    proj = read_hive_table(spark, w, "db1.events", read_columns=["id", "dt"])
    assert proj.columns == ["id", "dt"]

    # mixed-depth partition lists are rejected (Hive.md equal-depth rule)
    with pytest.raises(ValueError, match="directory depth"):
        read_hive_table(spark, w, "db1.events",
                        read_partitions=["dt=2024-01-01", "dt=2024-01-02/bucket=1"])
    with pytest.raises(ValueError, match="col=value"):
        read_hive_table(spark, w, "db1.events", read_partitions=["2024-01-01"])


def test_reference_hive_sink_conf_runs(spark, tmp_path):
    """The repo's own fakesource_to_hive.conf shape runs through run_job —
    only the thrift:// metastore URI is swapped for the file:// warehouse
    (there is no metastore in the sandbox; the layout IS the contract)."""
    from seatunnel_spark.config import run_job
    from seatunnel_spark.hocon import load_job_config

    w = str(tmp_path / "wh")
    conf = """
    env { job.mode = "BATCH" }
    source {
      FakeSource {
        result_table_name = "fake"
        row.num = 16
        schema = { fields { name = string  age = int } }
      }
    }
    sink {
      Hive {
        hive_table_name = "default.test_fake_to_hive"
        hive_metastore_uris = "file://%s"
        partition_by = ["age"]
        sink_columns = ["name", "age"]
      }
    }
    """ % w
    run_job(spark, load_job_config(conf))
    back = read_hive_table(spark, w, "default.test_fake_to_hive")
    assert back.count() == 16
    assert set(back.columns) == {"name", "age"}
    # the partition layout is real Hive dirs
    tdir = os.path.join(w, "test_fake_to_hive")
    assert any(d.startswith("age=") for d in os.listdir(tdir))


def test_hive_source_through_config_and_thrift_rejection(spark, tmp_path):
    from seatunnel_spark.config import ConfigError, run_job
    from seatunnel_spark.hocon import load_job_config

    w = str(tmp_path / "wh")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    write_hive_table(df, w, "db9.src")

    conf = """
    env { job.mode = "BATCH" }
    source {
      Hive {
        result_table_name = "t"
        table_name = "db9.src"
        metastore_uri = "file://%s"
      }
    }
    sink { Assert { source_table_name = "t" rules { min_rows = 2 } } }
    """ % w
    run_job(spark, load_job_config(conf))

    bad = conf.replace("file://%s" % w, "thrift://localhost:9083")
    with pytest.raises(ConfigError, match="thrift"):
        run_job(spark, load_job_config(bad))
