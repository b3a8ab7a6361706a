"""Apache Paimon adapter: the exact Spark SQL a Paimon catalog would run —
the second real-lake seam beside ``lake/iceberg.py`` (same dialect-as-text
pattern; executable verbatim on a Spark session with the Paimon catalog
configured, text-tested in-sandbox).

Reference: connector-paimon (``sink/PaimonSinkWriter.java`` writes through
the table-store Java API with per-checkpoint CommitMessages recommitted on
restore — the same staged-write/aggregated-commit 2PC shape as every other
sink; ``config/PaimonConfig.java``: warehouse/database/table).

Paimon expresses this engine's LWW contract NATIVELY: a primary-key table
with ``'sequence.field' = '_seq'`` resolves same-key writes by the max
sequence value regardless of arrival order, and ``'merge-engine' =
'deduplicate'`` keeps exactly the newest row — so the plain APPEND of a
reduced micro-batch is already an idempotent LWW upsert (a replayed batch
re-appends rows that tie on _seq and lose to the incumbent — row-wise
idempotent, the property the Iceberg seam needs the guarded MERGE for).
The guarded MERGE INTO remains available (Paimon's Spark integration
supports MERGE) for delete-carrying batches; this backend reuses the
Iceberg seam's statement text for it unchanged.

Scale notes: ``'bucket' = 'N'`` fixes the hash-bucket layout on the merge
key — the same layout LakeTable uses — so writes shuffle O(batch) into
buckets and compaction is per-bucket LSM folding (Paimon's native model);
maintenance maps to the stock ``sys.compact`` / ``sys.expire_snapshots``
procedures.
"""

from __future__ import annotations

from seatunnel_spark.lake.iceberg import SEQ_COL, IcebergSqlBackend, to_iceberg_type


class PaimonSqlBackend(IcebergSqlBackend):
    """Paimon Spark-SQL generation: CREATE TABLE with primary-key/
    sequence-field/bucket properties, append-as-upsert, the shared guarded
    MERGE, ALTERs, and maintenance procedures."""

    def create_sql(self, fields: list[tuple[str, str]], num_buckets: int = 16) -> str:
        cols = ", ".join(f"{n} {to_iceberg_type(t)}" for n, t in fields)
        pk = ",".join(self.key)
        return (
            f"CREATE TABLE IF NOT EXISTS {self.target} "
            f"({cols}, {SEQ_COL} bigint) USING paimon "
            "TBLPROPERTIES ("
            f"'primary-key'='{pk}', "
            f"'bucket'='{int(num_buckets)}', "
            "'merge-engine'='deduplicate', "
            f"'sequence.field'='{SEQ_COL}')"
        )

    def append_upsert_sql(self, source: str, columns: list[str]) -> str:
        """Upsert-only batches (no deletes) need NO MERGE on Paimon: the
        primary-key + sequence.field table folds an append by max _seq.
        ``source`` must expose ``columns`` plus ``seq``."""
        ins_cols = ", ".join(columns + [SEQ_COL])
        sel = ", ".join([f"s.{c}" for c in columns] + ["s.seq"])
        return (
            f"INSERT INTO {self.target} ({ins_cols}) "
            f"SELECT {sel} FROM {source} s"
        )

    def compact_sql(self, catalog: str) -> str:
        tbl = self.target.split(".", 1)[1] if "." in self.target else self.target
        return f"CALL {catalog}.sys.compact(table => '{tbl}')"

    def expire_sql(self, catalog: str, older_than: str, retain_last: int = 50) -> str:
        tbl = self.target.split(".", 1)[1] if "." in self.target else self.target
        return (
            f"CALL {catalog}.sys.expire_snapshots("
            f"table => '{tbl}', older_than => TIMESTAMP '{older_than}', "
            f"retain_min => {retain_last})"
        )

    def changes_read_options(self, start_snapshot_id: int, end_snapshot_id: int | None = None) -> dict:
        """Incremental read between snapshots — Paimon's
        ``incremental-between`` scan option (LakeTable.changes_between
        parity)."""
        if end_snapshot_id is None:
            return {"scan.snapshot-id": str(int(start_snapshot_id))}
        return {
            "incremental-between": f"{int(start_snapshot_id)},{int(end_snapshot_id)}"
        }
