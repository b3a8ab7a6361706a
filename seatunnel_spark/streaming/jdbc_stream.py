"""Exactly-once CDC streaming into a JDBC table — the engine's analog of
the reference's XA sink.

Reference: connector-jdbc ``JdbcExactlyOnceSinkWriter.java:56-216`` — one XA
transaction per checkpoint: rows buffer into a prepared transaction
(prepare on snapshotState), the coordinator commits it after the checkpoint
completes, and recovery either commits or rolls back in-doubt transactions
so a crash between prepare and commit never double-applies. And
``BufferReducedBatchStatementExecutor.java:42-106`` — the per-key
last-writer-wins buffer (UPDATE_BEFORE skipped) that reduces each
checkpoint's rows before execution.

Spark-first mapping — a LOCAL transaction carrying its own epoch ledger
instead of XA. Per micro-batch:

1. the batch LWW-reduces per key (``lww_reduce`` — map-side-combinable
   aggregate, wide payload crosses the shuffle once);
2. the surviving upsert images stage into ``{target}_STAGE`` and the
   surviving delete keys into ``{target}_STAGE_DEL`` via distributed
   ``df.write.jdbc`` (every executor streams its partition — the
   per-subtask write path, no driver collect);
3. ONE driver-side database transaction executes: set-based MERGE from
   staging, keyed DELETE from delete-staging, and an INSERT into the epoch
   ledger ``{target}_EPOCHS`` (batch_id PRIMARY KEY + applied counts +
   lineage) — then commits.

Because the ledger row commits ATOMICALLY with the DML, a crash anywhere
leaves either (no ledger row, no DML — the restart re-runs the epoch from
its unchanged staging) or (ledger row + DML — the restart sees the epoch
and skips). That is the same exactly-once guarantee XA's
prepare/recover-commit protocol buys, with one fewer distributed-consensus
moving part: when source offsets live in the Spark checkpoint and results
live in ONE database, a transactional idempotence ledger in that database
is strictly simpler and equally safe (the classic transactional-sink
construction; Spark has no XA coordinator to drive recovery anyway).

DDL events (op = "DDL") are NOT applied — the reference's JDBC sink
likewise does not evolve target schemas mid-stream; they are counted and
skipped with a warning so a schema-evolving stream fails loud in tests
rather than silently dropping columns.
"""

from __future__ import annotations

import time
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seatunnel_spark.operators.dedup import lww_reduce
from seatunnel_spark.sinks.jdbc import DIALECTS, AnsiMergeDialect
from seatunnel_spark.sources.jdbc import driver_connection

OP_DDL = "DDL"


class JdbcExactlyOnceStreamSink:
    """``foreachBatch`` target: exactly-once keyed upsert/delete stream into
    one JDBC table. The target table must exist with a key/unique
    constraint on ``key``; the ledger and staging tables are created on
    first use."""

    def __init__(
        self,
        url: str,
        target: str,
        key: list[str],
        dialect: AnsiMergeDialect | str = "ansi",
        op_col: str = "op",
        order_col: str = "seq",
        columns: list[str] | None = None,
        staging: str | None = None,
        ledger: str | None = None,
        staging_column_types: str | None = None,
    ) -> None:
        if not key:
            raise ValueError("JdbcExactlyOnceStreamSink needs a primary key")
        if columns is not None and any(k not in columns for k in key):
            raise ValueError(f"columns {columns} must include the key {key}")
        self.url = url
        self.target = target
        self.key = list(key)
        self.dialect = DIALECTS[dialect] if isinstance(dialect, str) else dialect
        self.op_col = op_col
        self.order_col = order_col
        self.columns = list(columns) if columns is not None else None
        self.staging = staging or f"{target}_STAGE"
        self.staging_del = f"{self.staging}_DEL"
        self.ledger = ledger or f"{target}_EPOCHS"
        self.staging_column_types = staging_column_types
        self._ledger_ready = False

    # ------------------------------------------------------------ ledger
    def _ensure_ledger(self, spark) -> None:
        if self._ledger_ready:
            return
        conn = driver_connection(spark, self.url)
        try:
            st = conn.createStatement()
            try:
                st.execute(
                    f"CREATE TABLE {self.ledger} ("
                    '"batch_id" BIGINT PRIMARY KEY, '
                    '"n_upserts" BIGINT, "n_deletes" BIGINT, '
                    '"n_ddl_skipped" BIGINT, "committed_ms" BIGINT)'
                )
            except Exception as create_err:
                # CREATE IF NOT EXISTS isn't portable, so "already exists"
                # surfaces as an exception — but a REAL failure
                # (connectivity, permissions, bad ledger name) must not be
                # swallowed here only to resurface later as a confusing
                # missing-table error in committed_epochs/apply_batch.
                # Probe the table; if the ledger is genuinely absent the
                # CREATE failure was real — re-raise it.
                try:
                    st2 = conn.createStatement()
                    rs = st2.executeQuery(
                        f"SELECT 1 FROM {self.ledger} WHERE 1=0"
                    )
                    rs.close()
                    st2.close()
                except Exception:
                    raise create_err
            st.close()
        finally:
            conn.close()
        self._ledger_ready = True

    def committed_epochs(self, spark) -> set[int]:
        self._ensure_ledger(spark)
        conn = driver_connection(spark, self.url)
        try:
            st = conn.createStatement()
            rs = st.executeQuery(f'SELECT "batch_id" FROM {self.ledger}')
            out = set()
            while rs.next():
                out.add(int(rs.getLong(1)))
            rs.close()
            st.close()
            return out
        finally:
            conn.close()

    def epoch_lineage(self, spark) -> list[dict]:
        """The per-epoch lineage rows (applied counts + commit time) the
        ledger accumulates — the JDBC-side twin of the lake job's lineage
        table."""
        self._ensure_ledger(spark)
        conn = driver_connection(spark, self.url)
        try:
            st = conn.createStatement()
            rs = st.executeQuery(
                f'SELECT "batch_id", "n_upserts", "n_deletes", '
                f'"n_ddl_skipped", "committed_ms" FROM {self.ledger} '
                f'ORDER BY "batch_id"'
            )
            out = []
            while rs.next():
                out.append(
                    {
                        "batch_id": int(rs.getLong(1)),
                        "n_upserts": int(rs.getLong(2)),
                        "n_deletes": int(rs.getLong(3)),
                        "n_ddl_skipped": int(rs.getLong(4)),
                        "committed_ms": int(rs.getLong(5)),
                    }
                )
            rs.close()
            st.close()
            return out
        finally:
            conn.close()

    # ------------------------------------------------------------- stage
    def _stage(self, df: DataFrame, table: str) -> None:
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .option("truncate", "true")  # epoch-idempotent restage
            .mode("overwrite")
        )
        if self.staging_column_types:
            # only forward types for columns actually present (the delete
            # staging carries just the key)
            keep = [
                t.strip()
                for t in self.staging_column_types.split(",")
                if t.strip().split()[0].strip('"`') in df.columns
            ]
            if keep:
                writer = writer.option("createTableColumnTypes", ", ".join(keep))
        if self.dialect.staging_create_options:
            writer = writer.option(
                "createTableOptions", self.dialect.staging_create_options
            )
        writer.save()

    def _count(self, spark, table: str) -> int:
        conn = driver_connection(spark, self.url)
        try:
            st = conn.createStatement()
            rs = st.executeQuery(f"SELECT COUNT(*) FROM {table}")
            rs.next()
            n = int(rs.getLong(1))
            rs.close()
            st.close()
            return n
        finally:
            conn.close()

    # ------------------------------------------------------ foreachBatch
    def apply_batch(self, batch: DataFrame, batch_id: int) -> dict:
        """Idempotent epoch apply. Safe to replay: an epoch present in the
        ledger is skipped outright; an epoch that crashed mid-way re-runs
        from unchanged inputs (staging is truncate-replaced, the commit is
        atomic)."""
        spark = batch.sparkSession
        self._ensure_ledger(spark)
        if int(batch_id) in self.committed_epochs(spark):
            return {"batch_id": int(batch_id), "skipped": True}

        op, order = self.op_col, self.order_col
        n_ddl = 0
        if op in batch.columns:
            n_ddl = batch.where(F.col(op) == OP_DDL).count()
            if n_ddl:
                warnings.warn(
                    f"JdbcExactlyOnceStreamSink: {n_ddl} DDL event(s) in epoch "
                    f"{batch_id} skipped — JDBC targets do not evolve schemas "
                    "mid-stream (route through the lake sink for DDL)",
                    stacklevel=2,
                )
            # UPDATE_BEFORE skipped per BufferReducedBatchStatementExecutor:56-58
            batch = batch.where(~F.col(op).isin(OP_DDL, "-U"))

        reduced = lww_reduce(batch, self.key, order_col=order)
        data_cols = self.columns or [
            c for c in reduced.columns if c not in (op, order)
        ]
        if op in reduced.columns:
            ups = reduced.where(F.col(op) != "D").select(*data_cols)
            dels = reduced.where(F.col(op) == "D").select(*self.key)
        else:
            ups, dels = reduced.select(*data_cols), None

        self._stage(ups, self.staging)
        if dels is not None:
            self._stage(dels, self.staging_del)

        n_up = self._count(spark, self.staging)
        n_del = self._count(spark, self.staging_del) if dels is not None else 0

        merge_sql = self.dialect.upsert_from_staging(
            self.target, self.staging, data_cols, self.key
        )
        del_sql = (
            self.dialect.delete_from_staging(self.target, self.staging_del, self.key)
            if dels is not None
            else None
        )
        conn = driver_connection(spark, self.url)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            # deletes first: a key both deleted and re-inserted in this epoch
            # was LWW-reduced to ONE image upstream, so order only matters
            # for keys deleted THIS epoch that exist from prior epochs
            if del_sql is not None and n_del:
                st.execute(del_sql)
            if n_up:
                st.execute(merge_sql)
            st.execute(
                f"INSERT INTO {self.ledger} VALUES "
                f"({int(batch_id)}, {n_up}, {n_del}, {n_ddl}, "
                f"{int(time.time() * 1000)})"
            )
            st.close()
            conn.commit()  # ← the atomic exactly-once point
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()
        return {
            "batch_id": int(batch_id),
            "skipped": False,
            "n_upserts": n_up,
            "n_deletes": n_del,
            "n_ddl_skipped": n_ddl,
        }

    # ---------------------------------------------------------- snapshot
    def ensure_snapshot(self, base: DataFrame) -> dict:
        """Initial bulk load (startup.mode = initial) as ledger epoch -1 —
        idempotent across restarts like any epoch. The lake path's
        per-chunk low/high fences exist to avoid double-emitting events a
        chunk's snapshot already folded; the JDBC path doesn't need them:
        the target merge is LWW-idempotent, so snapshot THEN full-log
        replay converges to the same final state regardless of overlap (at
        the cost of re-applying in-window events — the correctness-first
        trade the reference's at-least-once XA recovery makes too)."""
        b = base.withColumn(self.op_col, F.lit("I")).withColumn(
            self.order_col, F.lit(0).cast("long")
        )
        return self.apply_batch(b, -1)

    # ------------------------------------------------------------ stream
    def run_stream(
        self,
        events: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
        timeout_s: float | None = 300,
    ):
        """Drive a streaming event DataFrame through ``apply_batch`` with
        checkpointed offsets (availableNow = drain-and-return; rerunning
        resumes from the checkpoint — replayed epochs no-op on the ledger)."""
        writer = (
            events.writeStream.foreachBatch(
                lambda df, eid: self.apply_batch(df, eid) and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .queryName(f"cdc-jdbc-{self.target}")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination(timeout_s)
            if q.isActive:
                q.stop()
            if q.exception() is not None:
                raise q.exception()
            return q
        return writer.start()
