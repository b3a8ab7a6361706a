"""Multi-table changelog routing — SeaTunnel's MultipleRowType surface.

Reference: SeaTunnelRow carries a ``tableId`` so one CDC stream can feed
many destination tables (seatunnel-api MultipleRowType.java; the Zeta
engine shuffles by table id, ShuffleMultipleRowStrategy.java:46-99).

Spark realization: the wire stream carries a ``_table`` column (the
debezium/canal parsers in sources/formats.py emit it); ``foreachBatch``
routes each table's slice to its own LakeTable with per-(batch, table)
epoch ids, so the multi-table commit set is idempotent exactly like the
single-table path. Routing is a filter per table — each slice scan prunes
on the `_table` predicate (pushed to parquet), so per-table cost tracks
per-table volume, not stream volume; at many-table scale you'd first
`partitionBy(_table)` the landing zone so slices prune by directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seatunnel_spark.lake.merge import merge_into
from seatunnel_spark.lake.table import LakeTable


class MultiTableRouter:
    """Route a changelog batch (with a ``_table`` column) into N LakeTables."""

    def __init__(self, spark: SparkSession, tables: dict[str, LakeTable],
                 table_col: str = "_table"):
        self.spark = spark
        self.tables = tables
        self.table_col = table_col

    def apply_batch(self, batch: DataFrame, batch_id: int) -> dict[str, dict]:
        """One idempotent merge per destination table; unknown table ids are
        counted and skipped (the reference drops rows for unconfigured
        tables). Returns per-table merge stats."""
        results: dict[str, dict] = {}
        for name, table in self.tables.items():
            slice_df = batch.where(F.col(self.table_col) == name).drop(self.table_col)
            results[name] = merge_into(
                self.spark, table, slice_df,
                epoch_id=f"b{batch_id}.t.{name}",
                collect_stats=False,
            )
        return results

    def run_stream(self, stream: DataFrame, checkpoint_dir: str,
                   available_now: bool = True, timeout_s: float | None = None):
        writer = (
            stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName("cdc-multi-table")
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
