"""Phase A: chunked parallel snapshot with low/high watermark fences.

Reference protocol (connector-cdc-base):
- the table is split into chunks and each chunk is read while recording the
  log offset before (LOW) and after (HIGH) the scan
  (MySqlSnapshotSplitReadTask.doExecute:121-153, WatermarkEvent.java:59-115);
- change events that landed *inside* a chunk's [low, high) window are folded
  into the chunk's buffer — upsert/remove by key — so the emitted chunk is
  already normalized (IncrementalSourceScanFetcher.pollSplitRecords:110-180,
  JdbcSourceFetchTaskContext.rewriteOutputBuffer:80-117);
- the incremental phase then starts and a per-chunk fence guarantees events
  already folded are never re-applied (shouldEmit,
  IncrementalSourceStreamFetcher.java:273-303).

Spark realization: a chunk is a hash bucket of the key (the same bucketing
the lake layout uses, so chunk == rewrite unit == pruning unit). The whole
phase is ONE declarative job — base rows at seq=-1 unioned with each chunk's
in-window events, reduced by ``max_by(seq)`` per key — i.e. the reference's
LinkedHashMap rewrite becomes the same LWW reduction the sink uses. Fences
(bucket → high watermark) are committed atomically with the snapshot so a
restart re-derives the exact reconciliation point.

Chunks deliberately get *different* high watermarks (as in the reference,
where chunks scan at different times while the log advances); correctness of
the handoff is exactly what the race tests assert.

Constraint (asserted): no DDL event may precede max(fence) — the reference
likewise serializes schema changes against the snapshot phase (schema is
fixed while chunks are read; Debezium locks DDL during snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seatunnel_spark.lake.merge import merge_into
from seatunnel_spark.lake.table import LakeTable
from seatunnel_spark.schema import OP_DDL, OP_INSERT


# Upper bound on in-window events (seqs are unique, so window rows
# < max_fence) below which the snapshot fold broadcasts the window's
# winner keys for a map-side anti-join; larger windows fall back to a
# shuffled anti-join (see run_snapshot_phase). ~2M keys of a few tens of
# bytes is comfortably inside executor/driver broadcast budgets.
SNAPSHOT_BROADCAST_MAX_WINDOW = 2_000_000


def default_fences(num_buckets: int, max_fence: int) -> dict[int, int]:
    """Deterministic staggered per-chunk high watermarks in [0, max_fence]."""
    if num_buckets == 1:
        return {0: max_fence}
    return {b: (b * max_fence) // (num_buckets - 1) for b in range(num_buckets)}


def fence_map_expr(fences: dict[int, int]) -> F.Column:
    """bucket → fence literal map (≤ num_buckets entries, pure codegen)."""
    pairs: list = []
    for b, w in fences.items():
        pairs += [F.lit(int(b)), F.lit(int(w)).cast("long")]
    return F.create_map(*pairs)


def run_snapshot_phase(
    spark: SparkSession,
    table: LakeTable,
    base: DataFrame,
    events: DataFrame,
    fences: dict[int, int],
    epoch_id: str = "snapshot.0",
    chunk_groups: int = 1,
    unique_order: bool = False,
) -> dict:
    """Build the initial table state: base ⊎ in-window events, normalized.

    ``events`` is the full bounded log (only rows with seq < fence[bucket]
    participate — the reference reads the log tail up to HIGH per chunk).
    Returns merge stats. Idempotent via the epoch ledger.

    ``chunk_groups > 1`` commits the snapshot in per-bucket-group epochs
    (``{epoch_id}.g{i}``): a crash mid-snapshot resumes at the last
    uncommitted group — the reference's chunk-level snapshot resumability
    (SnapshotSplitAssigner re-offers unfinished splits on restore,
    SnapshotSplitAssigner.java:198-237, IncrementalSource.restoreEnumerator
    :234-274). One group == one declarative job, so groups trade restart
    granularity against per-commit overhead.
    """
    table.refresh()
    if table.epoch_committed(epoch_id):
        return {"skipped": True, "epoch_id": epoch_id}

    max_fence = max(fences.values())
    # Assertion: no DDL precedes the snapshot fence. Equivalent to checking
    # min(DDL seq) >= max_fence, but phrased as "no DDL below the fence" so
    # the `seq < max_fence` predicate prunes to the log HEAD via parquet
    # row-group stats — the original full-log min() aggregate scanned every
    # file's op/seq columns just to prove a negative (guide §6: make
    # predicates reach the scan).
    early_ddl = (
        events.where((F.col("op") == OP_DDL) & (F.col("seq") < F.lit(max_fence).cast("long")))
        .select("seq")
        .limit(1)
        .collect()
    )
    assert not early_ddl, (
        f"DDL at seq={early_ddl[0]['seq']} precedes snapshot fence {max_fence}; "
        "schema changes are serialized against the snapshot phase"
    )

    field_names = [f["name"] for f in table.schema_fields()]
    base_rows = base.select(
        *[F.col(c).cast(dict((f["name"], f["type"]) for f in table.schema_fields())[c]).alias(c)
          for c in field_names if c in base.columns],
        *[F.lit(None).cast(f["type"]).alias(f["name"])
          for f in table.schema_fields() if f["name"] not in base.columns],
    ).select(*field_names).withColumn("op", F.lit(OP_INSERT)).withColumn(
        "seq", F.lit(-1).cast("long")
    )

    in_window = (
        # the per-bucket fence predicate keys on a COMPUTED bucket column,
        # which no scanner can push down — without the coarse conjunct the
        # snapshot would decode the ENTIRE log to keep ~fence/total of it.
        # `seq < max_fence` is a conservative superset of every bucket's
        # window and pushes to parquet row-group stats (the log is
        # seq-ordered), so the snapshot reads only the log head; the exact
        # per-bucket cut still applies behind it.
        events.where(F.col("op") != OP_DDL)
        .where(F.col("seq") < F.lit(max_fence).cast("long"))
        .withColumn("bucket", table.bucket_expr())
        .where(F.col("seq") < fence_map_expr(fences)[F.col("bucket")])
        .drop("bucket")
    )
    from seatunnel_spark.streaming.job import project_to_table_schema  # cycle-free
    from seatunnel_spark.operators.dedup import lww_reduce

    window_rows = project_to_table_schema(table, in_window)

    # The reference folds in-window events into each chunk's buffer by key
    # (rewriteOutputBuffer:80-117). Spark realization: LWW-reduce only the
    # (small) window slice, then anti-join the base scan against a
    # BROADCAST of the window's keys — base is a consistent snapshot and
    # therefore key-unique already, so its wide rows stream MAP-SIDE
    # through the anti-join straight into the bucketed write exchange:
    # no winner aggregate, no semi-join, no wide distinct ever touches
    # them (measured: the previous base ∪ window LWW plan spent its time
    # hashing 1M wide rows that were unique by construction). Window
    # winners keep their op so deletes persist as tombstones.
    # The broadcast is GATED on the window's size bound: seqs are unique,
    # so the in-window event count (and hence the winner-key count) is
    # < max_fence. A snapshot with high fences / a long catch-up window
    # would otherwise broadcast an unbounded key set — a driver OOM at
    # scale (the same reasoning as CdcIngestJob.broadcast_winners_max_
    # events). Above the gate the anti-join is left un-hinted: the
    # planner/AQE picks a shuffled anti-join keyed on the table key, which
    # the bucketed write's repartition immediately reuses.
    key = table.key
    # unique_order (native log): the window fold's winner aggregate scans
    # only (key, seq) — no payload tie-break hash (lww_reduce docstring).
    win = lww_reduce(window_rows, key, "seq", unique_order=unique_order)
    win_keys = win.select(*key)
    if max_fence <= SNAPSHOT_BROADCAST_MAX_WINDOW:
        win_keys = F.broadcast(win_keys)
    base_clean = base_rows.join(win_keys, key, "left_anti")
    batch = base_clean.unionByName(win)
    fences_prop = {"fences": {str(b): int(w) for b, w in fences.items()}}

    if chunk_groups <= 1:
        return merge_into(
            spark, table, batch, epoch_id,
            extra_summary={"phase": "snapshot", "fences_max": max_fence},
            properties_update=fences_prop,
            pre_reduced=True,
        )

    groups = [
        [b for b in range(table.num_buckets) if b % chunk_groups == g]
        for g in range(chunk_groups)
    ]
    stats = {"groups": 0, "skipped_groups": 0}
    for g, buckets in enumerate(groups):
        g_epoch = f"{epoch_id}.g{g}"
        g_batch = batch.where(table.bucket_expr().isin(buckets))
        res = merge_into(
            spark, table, g_batch, g_epoch,
            extra_summary={"phase": "snapshot", "group": g, "fences_max": max_fence},
            properties_update=fences_prop,
            pre_reduced=True,
        )
        stats["groups"] += 1
        stats["skipped_groups"] += 1 if res.get("skipped") else 0
    # final marker epoch: phase A complete (the hybrid assigner's
    # "all splits finished" gate, HybridSplitAssigner.getNext:91-109)
    table.commit_snapshot({}, epoch_id, {"phase": "snapshot-complete"})
    return stats
