"""Cluster-side send path shared by the bulk-HTTP sink family.

The reference writes sinks per SUBTASK (``SinkWriter.write`` is invoked on
each parallel subtask — seatunnel-api/src/main/java/org/apache/seatunnel/
api/sink/SinkWriter.java:38-89); this repo's ``requests_for_batch``
functions are the driver-collected twin for bounded config micro-batches.
This module is the distributed form: a factory producing a function for
``df.foreachPartition`` so each partition renders and executes its own
requests executor-side — no ``collect()``, no driver bottleneck, exactly
the streamload sink's partition path (sinks/streamload.py
``foreach_partition_sender``) generalized.

Idempotence note: unlike stream-load (server-side label dedup), most HTTP
APIs here are at-least-once on task retry — Elasticsearch and Tablestore
are keyed upserts (replay converges), DataHub pub and MaxCompute INSERT
INTO are append-only (replay duplicates; same semantics as the reference
writers, which also re-send on retry). Each sink's factory documents its
own behavior.

``dry_run_sink`` collects rendered requests instead of executing them.
It only observes requests when the partition function runs in the calling
process (tests drive it via ``df.rdd.glom().collect()``); under a real
``foreachPartition`` the closure executes in executor workers, so use it
for request-shape verification, not production capture.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable


def partition_sender(
    build_requests: Callable[[list[dict]], Iterable],
    columns: list[str],
    op_col: str = "op",
    drop_kinds: tuple[str, ...] = (),
    keep_op: bool = False,
    dry_run_sink=None,
):
    """Generic per-partition sender: materialize the partition's rows as
    dicts of ``columns`` (plus ``op_col`` when ``keep_op`` — sinks that
    route deletes themselves need it), drop ``drop_kinds`` row images
    (append-only sinks drop D/-U exactly like their batch twin), then
    execute every request ``build_requests(rows)`` yields. Empty
    partitions send nothing — no empty-body requests from idle tasks."""

    def send(it):
        rows = []
        for r in it:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            if drop_kinds and d.get(op_col) in drop_kinds:
                continue
            out = {c: d.get(c) for c in columns}
            if keep_op and op_col in d:
                out[op_col] = d[op_col]
            rows.append(out)
        if not rows:
            return
        for req in build_requests(rows):
            if dry_run_sink is not None:
                dry_run_sink(req)
            else:
                req.execute()

    return send


def chunked(rows: list[dict], n: int) -> Iterable[list[dict]]:
    for i in range(0, len(rows), max(1, int(n))):
        yield rows[i : i + max(1, int(n))]
