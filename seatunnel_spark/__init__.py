"""seatunnel_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of Apache SeaTunnel's CDC ingest path
(reference: AfterShip/seatunnel @ /root/reference, v2.3.3-SNAPSHOT) as an
idiomatic PySpark engine:

- snapshot-then-incremental capture with low/high-watermark reconciliation
  (reference: connector-cdc-base IncrementalSource / HybridSplitAssigner)
- RowKind changelog semantics as an explicit ``op`` column
  (reference: seatunnel-api table/type/RowKind.java)
- last-writer-wins key dedup via a row_number window
  (reference: connector-jdbc BufferReducedBatchStatementExecutor.java:42-106)
- exactly-once idempotent commits with an epoch ledger
  (reference: seatunnel-api sink/SinkAggregatedCommitter.java + Zeta
  CheckpointCoordinator.java:687-741)
- in-flight schema evolution applied at exact event offsets
  (reference: IncrementalSourceStreamFetcher.splitSchemaChangeStream:152-236,
  AlterTableEventHandler.java:53-163)

The lake layer (`seatunnel_spark.lake`) implements Iceberg-style atomic
snapshot commits, column-ID-based schema evolution and bucket-partitioned
copy-on-write MERGE in pure PySpark + POSIX-atomic metadata swaps, because
this sandbox has no Iceberg runtime jar. The interface is deliberately shaped
so a real `spark.sql("MERGE INTO iceberg.t ...")` backend can be swapped in
on a cluster.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the Apache SeaTunnel source tree, and the Iceberg spec's
publicly documented commit protocol.
"""

__version__ = "0.1.0"
