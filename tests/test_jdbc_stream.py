"""CDC changelog → JDBC table with exactly-once epochs (embedded Derby).

Reference: connector-jdbc JdbcExactlyOnceSinkWriter.java:56-216 (XA
transaction per checkpoint, recovery commits-or-rolls-back so a crash
between prepare and commit never double-applies) and
BufferReducedBatchStatementExecutor.java:42-106 (per-key LWW buffer,
UPDATE_BEFORE skipped). This engine's mapping: the epoch ledger row
commits in the SAME local database transaction as the MERGE/DELETE —
see streaming/jdbc_stream.py."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _mk_target(spark, url, name="TGT"):
    from seatunnel_spark.sources.jdbc import driver_connection

    conn = driver_connection(spark, url)
    conn.createStatement().execute(
        f'CREATE TABLE {name} ("id" BIGINT PRIMARY KEY, "name" VARCHAR(50), '
        '"v" DOUBLE)'
    )
    conn.close()


def _read_tgt(spark, url, name="TGT"):
    return {
        r["id"]: (r["name"], r["v"])
        for r in spark.read.format("jdbc").option("url", url)
        .option("dbtable", name).load().collect()
    }


def _write_changelog(spark, d):
    """Three files → three availableNow epochs at maxFilesPerTrigger=1.
    Exercises I / +U / -U / D plus a cross-epoch delete-then-reinsert."""
    schema = "seq long, op string, id long, name string, v double"
    batches = [
        [(1, "I", 1, "a", 1.0), (2, "I", 2, "b", 2.0), (3, "I", 3, "c", 3.0)],
        # epoch 2: update 2 (before+after images), delete 3,
        # within-epoch insert+update of 4 (LWW keeps the update)
        [(4, "-U", 2, "b", 2.0), (5, "+U", 2, "B", 20.0), (6, "D", 3, None, None),
         (7, "I", 4, "d", 4.0), (8, "+U", 4, "D4", 40.0)],
        # epoch 3: reinsert the deleted key
        [(9, "I", 3, "c2", 33.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(d)
    return d


def test_stream_exactly_once_epochs(spark, derby_url, tmp_path):
    from seatunnel_spark.streaming.jdbc_stream import JdbcExactlyOnceStreamSink

    _mk_target(spark, derby_url)
    log_dir = _write_changelog(spark, str(tmp_path / "log"))
    stream = (
        spark.readStream.schema("seq long, op string, id long, name string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    js = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"],
        staging_column_types='name VARCHAR(50)',
    )
    js.run_stream(stream, str(tmp_path / "ckpt"))

    assert _read_tgt(spark, derby_url) == {
        1: ("a", 1.0), 2: ("B", 20.0), 3: ("c2", 33.0), 4: ("D4", 40.0),
    }
    lineage = js.epoch_lineage(spark)
    assert [e["batch_id"] for e in lineage] == sorted(e["batch_id"] for e in lineage)
    assert sum(e["n_deletes"] for e in lineage) == 1
    # -U images never reach the target path (reference :56-58)
    assert sum(e["n_upserts"] for e in lineage) == 6

    # restart from the same checkpoint: everything already consumed +
    # committed — no new epochs, state unchanged
    before = _read_tgt(spark, derby_url)
    n_epochs = len(lineage)
    stream2 = (
        spark.readStream.schema("seq long, op string, id long, name string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    js2 = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"],
        staging_column_types='name VARCHAR(50)',
    )
    js2.run_stream(stream2, str(tmp_path / "ckpt"))
    assert _read_tgt(spark, derby_url) == before
    assert len(js2.epoch_lineage(spark)) == n_epochs


def test_epoch_replay_is_skipped_by_ledger(spark, derby_url):
    """foreachBatch redelivers an in-flight epoch after a crash that
    happened AFTER the DB commit but BEFORE the Spark checkpoint advanced.
    The ledger row (committed atomically with the DML) makes the replay a
    no-op — the exactly-once point."""
    from seatunnel_spark.streaming.jdbc_stream import JdbcExactlyOnceStreamSink

    _mk_target(spark, derby_url)
    js = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"], staging_column_types='name VARCHAR(50)',
    )
    b = spark.createDataFrame(
        [(1, "I", 1, "a", 1.0)], "seq long, op string, id long, name string, v double"
    )
    r1 = js.apply_batch(b, 7)
    assert r1 == {"batch_id": 7, "skipped": False, "n_upserts": 1,
                  "n_deletes": 0, "n_ddl_skipped": 0}
    state = _read_tgt(spark, derby_url)
    r2 = js.apply_batch(b, 7)
    assert r2 == {"batch_id": 7, "skipped": True}
    assert _read_tgt(spark, derby_url) == state


def test_failed_commit_leaves_no_trace_and_retry_succeeds(spark, derby_url):
    """Kill INSIDE the transaction (the merge SQL fails): neither DML nor
    ledger row may survive the rollback; the retry applies cleanly."""
    from seatunnel_spark.streaming.jdbc_stream import JdbcExactlyOnceStreamSink

    _mk_target(spark, derby_url)
    js = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"], staging_column_types='name VARCHAR(50)',
    )
    b = spark.createDataFrame(
        [(1, "I", 1, "a", 1.0)], "seq long, op string, id long, name string, v double"
    )
    orig = js.dialect.upsert_from_staging
    js.dialect = type(js.dialect)()  # private instance so the patch is local
    js.dialect.upsert_from_staging = lambda *a, **k: "MERGE INTO NOWHERE"
    with pytest.raises(Exception):
        js.apply_batch(b, 0)
    assert _read_tgt(spark, derby_url) == {}
    assert js.epoch_lineage(spark) == []  # rollback took the ledger row too

    js.dialect.upsert_from_staging = orig.__func__.__get__(js.dialect)
    out = js.apply_batch(b, 0)
    assert out["skipped"] is False
    assert _read_tgt(spark, derby_url) == {1: ("a", 1.0)}


def test_ddl_events_are_skipped_loudly(spark, derby_url):
    from seatunnel_spark.streaming.jdbc_stream import JdbcExactlyOnceStreamSink

    _mk_target(spark, derby_url)
    js = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"], staging_column_types='name VARCHAR(50)',
    )
    b = spark.createDataFrame(
        [(1, "I", 1, "a", 1.0), (2, "DDL", None, None, None)],
        "seq long, op string, id long, name string, v double",
    )
    with pytest.warns(UserWarning, match="DDL"):
        out = js.apply_batch(b, 0)
    assert out["n_ddl_skipped"] == 1
    assert _read_tgt(spark, derby_url) == {1: ("a", 1.0)}


def test_config_driven_cdc_to_jdbc(spark, derby_url, tmp_path):
    """The reference's mysqlcdc_to_mysql.conf scenario end-to-end from
    config: native changelog fixture → Jdbc sink block → final state equals
    the batch LWW oracle computed over the same log."""
    from pyspark.sql import functions as F

    from seatunnel_spark.config import run_job
    from seatunnel_spark.schema import event_schema
    from seatunnel_spark.sources import generator as gen
    from seatunnel_spark.sources.jdbc import driver_connection

    paths = gen.write_fixture(
        str(tmp_path / "fx"), n_base=50, n_events=200, seed=11, n_event_files=2
    )
    conn = driver_connection(spark, derby_url)
    conn.createStatement().execute(
        'CREATE TABLE RTGT ("repo" VARCHAR(100), "path" VARCHAR(200), '
        '"commit" VARCHAR(64), "lang" VARCHAR(10), "content" VARCHAR(32000), '
        'PRIMARY KEY ("repo", "path"))'
    )
    conn.close()

    config = {
        "env": {"job.mode": "STREAMING", "job.timeout.s": 300},
        "source": [{
            "plugin": "CdcChangelog",
            "topic_dir": paths["events"],
        }],
        "sink": [{
            "plugin": "Jdbc",
            "url": derby_url,
            "table": "RTGT",
            "primary_keys": ["repo", "path"],
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "staging_column_types":
                'repo VARCHAR(100), path VARCHAR(200), '
                '`commit` VARCHAR(64), lang VARCHAR(10), '
                'content VARCHAR(32000)',
        }],
    }
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")  # fixture logs contain DDL events
        result = run_job(spark, config)
    assert result["Jdbc#0"]["written"]

    # batch LWW oracle over the same log (DDL + stale images excluded)
    ev = spark.read.schema(event_schema()).parquet(paths["events"])
    from seatunnel_spark.operators.dedup import lww_reduce

    last = lww_reduce(ev.where(F.col("op") != "DDL"), ["repo", "path"], "seq")
    expected = {
        (r["repo"], r["path"]): r["content"]
        for r in last.where(F.col("op") != "D")
        .select("repo", "path", "content").collect()
    }
    got = {
        (r["repo"], r["path"]): r["content"]
        for r in spark.read.format("jdbc").option("url", derby_url)
        .option("dbtable", "RTGT").load().collect()
    }
    assert got == expected
    assert result["Jdbc#0"]["rows"] == len(expected)


def test_initial_snapshot_then_stream_converges(spark, derby_url, tmp_path):
    """startup.mode=initial: bulk-load the base as ledger epoch -1, then
    replay the log — LWW merge convergence makes snapshot/stream overlap
    harmless (the JDBC path's fence-free snapshot contract). Re-running
    ensure_snapshot is a ledger no-op."""
    from seatunnel_spark.streaming.jdbc_stream import JdbcExactlyOnceStreamSink

    _mk_target(spark, derby_url)
    base = spark.createDataFrame(
        [(1, "a0", 1.0), (2, "b0", 2.0)], "id long, name string, v double"
    )
    log_dir = _write_changelog(spark, str(tmp_path / "log"))
    js = JdbcExactlyOnceStreamSink(
        derby_url, "TGT", key=["id"], staging_column_types='name VARCHAR(50)',
    )
    snap = js.ensure_snapshot(base)
    assert snap == {"batch_id": -1, "skipped": False, "n_upserts": 2,
                    "n_deletes": 0, "n_ddl_skipped": 0}
    assert js.ensure_snapshot(base) == {"batch_id": -1, "skipped": True}

    stream = (
        spark.readStream.schema("seq long, op string, id long, name string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(log_dir)
    )
    js.run_stream(stream, str(tmp_path / "ckpt"))
    # log events overwrite the base images; base-only keys would survive
    assert _read_tgt(spark, derby_url) == {
        1: ("a", 1.0), 2: ("B", 20.0), 3: ("c2", 33.0), 4: ("D4", 40.0),
    }
    assert [e["batch_id"] for e in js.epoch_lineage(spark)][0] == -1
