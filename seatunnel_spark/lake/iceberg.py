"""Real-Iceberg adapter: the exact Spark SQL an Iceberg catalog would run.

The bespoke ``LakeTable`` format exists because this sandbox ships no Iceberg
runtime jar; its commit semantics (CAS snapshot commits, epoch ledger in the
snapshot summary, column-id schema evolution, merge-on-read + compaction)
deliberately mirror Iceberg's. This module is the deployment seam to a REAL
Iceberg catalog: a dialect-style SQL-text layer — the same pattern
``sinks/jdbc.py`` uses for MySQL/Postgres/ANSI upserts — whose statements are
unit-tested as text here and executable verbatim on any Spark session with an
Iceberg catalog configured.

Reference parity: SeaTunnel abstracts its sink exactly so targets are
swappable — SinkWriter.java:38-89 (per-split staged writes) and
SinkAggregatedCommitter.java:33-60 (driver-side global commit); the Spark
translation layer commits through ``SeaTunnelBatchWrite.java:55-105``. Here
the swap is: ``LakeTable`` backend (sandbox, default) ↔ ``IcebergSqlBackend``
(real catalog) — one config key (sink plugin ``Iceberg`` vs ``LakeTable``).

Exactly-once WITHOUT a bespoke epoch ledger: every merged row carries its
last-applied log offset in a ``_seq`` column, and every MERGE clause is
guarded on it::

    WHEN MATCHED AND s.op = 'D' AND s.seq >= t._seq THEN DELETE
    WHEN MATCHED AND s.op <> 'D' AND s.seq >  t._seq THEN UPDATE ...
    WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT ...

Replaying any prefix of micro-batches (Structured Streaming re-delivers the
unacknowledged batch with the same contents after restart) is row-wise
idempotent: a replayed update ties on seq and is skipped, a replayed delete
finds no row, a replayed insert matches with equal seq and is skipped, and an
out-of-order OLD event can never resurrect or downgrade a row — the same
contract LakeTable enforces at scan time with its ``_seq`` tombstone rule.
Epoch ids are still stamped into the Iceberg snapshot summary for lineage
(``snapshot-property.`` write options on the snapshot phase; observable via
the ``.snapshots`` metadata table) but correctness never depends on them.

Scale notes (100 TB): the generated CREATE TABLE buckets by the merge key
(``bucket(N, repo)``), so Iceberg's storage-partitioned join lets MERGE
shuffle only the source batch — O(batch), never O(table); write.merge.mode =
merge-on-read makes each commit write position/equality deletes + new data
files instead of rewriting buckets (the same O(batch) argument as
lake/merge.py); compaction/expiry are the stock maintenance procedures
(rewrite_data_files / expire_snapshots), generated below.
"""

from __future__ import annotations

from typing import Callable

from seatunnel_spark.schema import SchemaChange, normalize_sql_type

# lattice spelling → Iceberg/Spark DDL type (Iceberg has no byte/short; its
# spec promotes them to int — same mapping the Iceberg Spark writer applies)
_ICEBERG_TYPES = {
    "string": "string",
    "int": "int",
    "tinyint": "int",
    "smallint": "int",
    "bigint": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "bytes": "binary",
}

SEQ_COL = "_seq"


def to_iceberg_type(t: str) -> str:
    n = normalize_sql_type(t)
    if n.startswith("decimal("):
        return n
    return _ICEBERG_TYPES.get(n, n)


class IcebergSqlBackend:
    """Generates (and optionally executes) Iceberg Spark-SQL for the CDC
    sink surface: CREATE TABLE, guarded MERGE INTO, ALTER TABLE schema
    evolution, and the maintenance procedures.

    ``target`` is the fully-qualified catalog table (``cat.db.repos``);
    ``run_sql`` is the executor — ``spark.sql`` in a real deployment, a
    recording fake in tests. With ``run_sql=None`` the backend is text-only.
    """

    def __init__(
        self,
        target: str,
        key: list[str],
        run_sql: Callable | None = None,
    ):
        if not key:
            raise ValueError("IcebergSqlBackend requires a non-empty key")
        self.target = target
        self.key = list(key)
        self.run_sql = run_sql

    # ------------------------------------------------------------ SQL text
    def create_sql(self, fields: list[tuple[str, str]], num_buckets: int = 16) -> str:
        """CREATE TABLE bucketed by the first key column, merge-on-read,
        format v2 (row-level deletes need v2). ``_seq`` is a real column —
        it IS the exactly-once mechanism (module docstring)."""
        cols = ", ".join(f"{n} {to_iceberg_type(t)}" for n, t in fields)
        return (
            f"CREATE TABLE IF NOT EXISTS {self.target} "
            f"({cols}, {SEQ_COL} bigint) USING iceberg "
            f"PARTITIONED BY (bucket({num_buckets}, {self.key[0]})) "
            "TBLPROPERTIES ('format-version'='2', "
            "'write.merge.mode'='merge-on-read', "
            "'write.update.mode'='merge-on-read', "
            "'write.delete.mode'='merge-on-read')"
        )

    def merge_sql(self, source: str, columns: list[str]) -> str:
        """The guarded LWW MERGE. ``columns`` are the table's data columns
        (no op/seq); the source view must expose them plus ``op`` and
        ``seq``. Explicit column lists, not UPDATE/INSERT *: dialect-safe
        (same reasoning as the JDBC layer) and keeps t._seq assignment
        visible."""
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.key)
        non_key = [c for c in columns if c not in self.key]
        sets = ", ".join(f"t.{c} = s.{c}" for c in non_key)
        sets = (sets + ", " if sets else "") + f"t.{SEQ_COL} = s.seq"
        ins_cols = ", ".join(columns + [SEQ_COL])
        ins_vals = ", ".join([f"s.{c}" for c in columns] + ["s.seq"])
        return (
            f"MERGE INTO {self.target} t USING {source} s ON {on} "
            f"WHEN MATCHED AND s.op = 'D' AND s.seq >= t.{SEQ_COL} THEN DELETE "
            f"WHEN MATCHED AND s.op <> 'D' AND s.seq > t.{SEQ_COL} "
            f"THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND s.op <> 'D' "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )

    def alter_sql(self, change: SchemaChange) -> list[str]:
        """SchemaChange → Iceberg ALTER TABLE statements (Iceberg implements
        all of these as metadata-only column-id operations — the semantics
        LakeTable.update_schema reproduces)."""
        c = change
        if c.kind == "batch":
            out: list[str] = []
            for sub in c.changes or ():
                out.extend(self.alter_sql(sub))
            return out
        if c.kind == "add_column":
            return [
                f"ALTER TABLE {self.target} ADD COLUMN {c.name} {to_iceberg_type(c.type)}"
            ]
        if c.kind == "drop_column":
            return [f"ALTER TABLE {self.target} DROP COLUMN {c.name}"]
        if c.kind == "rename_column":
            return [f"ALTER TABLE {self.target} RENAME COLUMN {c.old_name} TO {c.name}"]
        if c.kind == "widen_type":
            return [
                f"ALTER TABLE {self.target} ALTER COLUMN {c.name} "
                f"TYPE {to_iceberg_type(c.type)}"
            ]
        if c.kind == "rename_table":
            return [f"ALTER TABLE {self.target} RENAME TO {c.name}"]
        raise ValueError(f"unknown schema change kind: {c.kind}")

    EPOCH_SUMMARY_KEY = "epoch-id"

    def snapshot_property_options(self, epoch_id: str) -> dict[str, str]:
        """Writer-API options that stamp the epoch id into the Iceberg
        snapshot summary: pass to ``df.writeTo(target).option(k, v)`` /
        ``DataFrameWriterV2`` on the paths that go through the writer API
        (the snapshot phase's append). SQL ``MERGE INTO`` statements cannot
        carry snapshot properties — those commits rely SOLELY on the seq
        guard for replay idempotence (module docstring) and are absent from
        ``epoch_scan_sql`` results by design."""
        return {f"snapshot-property.{self.EPOCH_SUMMARY_KEY}": str(epoch_id)}

    def epoch_scan_sql(self, epoch_id: str) -> str:
        """Lineage probe: has a snapshot stamped with this epoch id been
        committed? Only finds snapshots written through the writer API with
        ``snapshot_property_options`` (same summary key by construction);
        SQL MERGE commits never appear here — they are covered by the seq
        guard, so this is observability, not the correctness gate."""
        return (
            f"SELECT snapshot_id FROM {self.target}.snapshots "
            f"WHERE summary['{self.EPOCH_SUMMARY_KEY}'] = '{epoch_id}'"
        )

    def compact_sql(self, catalog: str) -> str:
        """Stock Iceberg compaction — the counterpart of merge.maybe_compact
        folding deep delta stacks (binpack keeps it O(touched files))."""
        tbl = self.target.split(".", 1)[1] if "." in self.target else self.target
        return (
            f"CALL {catalog}.system.rewrite_data_files("
            f"table => '{tbl}', strategy => 'binpack')"
        )

    def expire_sql(self, catalog: str, older_than: str, retain_last: int = 50) -> str:
        """Counterpart of LakeTable.vacuum (grace window = older_than)."""
        tbl = self.target.split(".", 1)[1] if "." in self.target else self.target
        return (
            f"CALL {catalog}.system.expire_snapshots("
            f"table => '{tbl}', older_than => TIMESTAMP '{older_than}', "
            f"retain_last => {retain_last})"
        )

    def time_travel_sql(self, snapshot_id: int | None = None, as_of: str | None = None) -> str:
        """Read-path parity with LakeTable.scan(snapshot_id=): Spark SQL
        time travel over Iceberg (VERSION AS OF / TIMESTAMP AS OF)."""
        if (snapshot_id is None) == (as_of is None):
            raise ValueError("pass exactly one of snapshot_id / as_of")
        if snapshot_id is not None:
            return f"SELECT * FROM {self.target} VERSION AS OF {int(snapshot_id)}"
        return f"SELECT * FROM {self.target} TIMESTAMP AS OF TIMESTAMP '{as_of}'"

    def changes_read_options(self, start_snapshot_id: int, end_snapshot_id: int | None = None) -> dict:
        """Incremental-read parity with LakeTable.changes_between (the
        IcebergStreamSplitEnumerator surface): the DataFrameReader options a
        real catalog takes — ``spark.read.format("iceberg")
        .options(**these).load(target)`` returns only rows appended in
        (start, end]."""
        opts = {"start-snapshot-id": str(int(start_snapshot_id))}
        if end_snapshot_id is not None:
            opts["end-snapshot-id"] = str(int(end_snapshot_id))
        return opts

    # ------------------------------------------------------- execution path
    def merge_into(self, batch, epoch_id: str) -> dict:
        """LWW-reduce the micro-batch (same shared reducer as the LakeTable
        path — one wide shuffle, map-side combinable) and run the guarded
        MERGE. Safe to replay: the seq guard makes it row-wise idempotent."""
        if self.run_sql is None:
            raise RuntimeError("no run_sql executor configured (text-only backend)")
        from seatunnel_spark.operators.dedup import lww_reduce

        columns = [c for c in batch.columns if c not in ("op", "seq", "bucket")]
        reduced = lww_reduce(batch.select(*columns, "op", "seq"), self.key)
        view = f"_st_iceberg_src_{abs(hash(epoch_id)) % 10**9}"
        reduced.createOrReplaceTempView(view)
        sql = self.merge_sql(view, columns)
        self.run_sql(sql)
        return {"epoch_id": epoch_id, "merge_sql": sql, "skipped": False}

    def update_schema(self, change: SchemaChange, epoch_id: str) -> bool:
        """Run the ALTERs; an already-applied ADD (replayed DDL epoch) is
        the same no-op the LakeTable ledger produces — Iceberg raises
        'already exists', which we treat as _NoopDDL parity."""
        if self.run_sql is None:
            raise RuntimeError("no run_sql executor configured (text-only backend)")
        applied = False
        for stmt in self.alter_sql(change):
            try:
                self.run_sql(stmt)
                applied = True
            except Exception as e:  # AnalysisException without the jar import
                msg = str(e).lower()
                if "already exists" in msg or "duplicate" in msg:
                    continue
                raise
        return applied
