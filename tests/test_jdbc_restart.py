"""Kill-between-prepare-and-commit on the staged JDBC sink (embedded Derby
— a real JDBC database in Spark's classpath).

The reference's JdbcExactlyOnceSinkWriter (connector-jdbc .../sink/
JdbcExactlyOnceSinkWriter.java:56-216) prepares an XA transaction per
checkpoint and lets recovery either commit or roll it back, so a crash
between prepare and commit never half-applies. This engine's staged-merge
design has the same crash window: the distributed stage write (prepare)
lands in ``{target}_STAGE``, and the set-based MERGE (commit) publishes it
atomically. These tests kill the job in that window and prove the
recovery contract: uncommitted staged data is invisible, a restart
converges to exactly-once state, stale staged rows from the crashed
attempt can never leak into the target, and re-committing an
already-committed epoch does not double-apply."""

from __future__ import annotations

import pytest


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _read_tgt(spark, url):
    return {
        r["id"]: (r["name"], r["v"])
        for r in spark.read.format("jdbc").option("url", url)
        .option("dbtable", "TGT").load().collect()
    }


def _stage_only(df, url, staging="TGT_STAGE"):
    """The prepare phase alone: exactly the stage write jdbc_upsert_write
    issues, with the merge (commit) never reached — the crash point."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("truncate", "true")
        .option("createTableColumnTypes", "name VARCHAR(50)")
        .mode("overwrite")
        .save()
    )


def test_kill_between_prepare_and_commit_no_double_apply(spark, derby_url):
    from seatunnel_spark.sinks.jdbc import jdbc_upsert_write
    from seatunnel_spark.sources.jdbc import driver_connection

    conn = driver_connection(spark, derby_url)
    conn.createStatement().execute(
        'CREATE TABLE TGT ("id" BIGINT PRIMARY KEY, "name" VARCHAR(50), "v" DOUBLE)'
    )
    conn.close()

    b0 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, v double"
    )
    jdbc_upsert_write(b0, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    committed = _read_tgt(spark, derby_url)
    assert committed == {1: ("a", 1.0), 2: ("b", 2.0)}

    # ---- epoch 1 prepares, then the job dies before the merge ----
    b1 = spark.createDataFrame(
        [(2, "B-new", 20.0), (3, "c", 3.0)], "id long, name string, v double"
    )
    _stage_only(b1, derby_url)
    # prepared-but-uncommitted work is invisible to readers of the target
    assert _read_tgt(spark, derby_url) == committed

    # ---- restart: the engine replays epoch 1 through the full path ----
    jdbc_upsert_write(b1, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    after = _read_tgt(spark, derby_url)
    assert after == {1: ("a", 1.0), 2: ("B-new", 20.0), 3: ("c", 3.0)}

    # ---- second restart AFTER commit (checkpoint not yet recorded):
    # re-running the same epoch must not change the final state ----
    jdbc_upsert_write(b1, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    assert _read_tgt(spark, derby_url) == after


def test_stale_staging_from_crashed_attempt_never_leaks(spark, derby_url):
    """A crashed attempt leaves arbitrary rows in the staging table
    (possibly a DIFFERENT, partially-written batch). The next epoch's
    truncate-overwrite restage must fully discard them — no ghost of a
    crashed batch may reach the target."""
    from seatunnel_spark.sinks.jdbc import jdbc_upsert_write

    from seatunnel_spark.sources.jdbc import driver_connection

    conn = driver_connection(spark, derby_url)
    conn.createStatement().execute(
        'CREATE TABLE TGT ("id" BIGINT PRIMARY KEY, "name" VARCHAR(50), "v" DOUBLE)'
    )
    conn.close()

    # crashed attempt: poison rows staged, merge never ran
    poison = spark.createDataFrame(
        [(99, "GHOST", 666.0)], "id long, name string, v double"
    )
    _stage_only(poison, derby_url)

    # recovery applies the real batch
    real = spark.createDataFrame(
        [(1, "a", 1.0)], "id long, name string, v double"
    )
    jdbc_upsert_write(real, derby_url, "TGT", key=["id"],
                      staging_column_types="name VARCHAR(50)")
    got = _read_tgt(spark, derby_url)
    assert got == {1: ("a", 1.0)}
    assert 99 not in got
