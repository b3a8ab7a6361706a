"""Plan lint: every driver-facing query must compile to a plan with no
row-at-a-time Python and no unplanned cartesian product — the two
anti-patterns that silently break 100 TB scale. Arrow-batched Python
(ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the sanctioned
slow path; BatchEvalPython (per-row pickling) is banned outright."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_row_at_a_time_python_and_no_cartesian(spark):
    import __spark_entry__ as e

    qs = e.queries()
    offenders = {}
    for name, fn in sorted(qs.items()):
        plan = _plan(fn(spark, SF_DIR))
        bad = []
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython (row-at-a-time Python UDF)")
        # CartesianProduct = unbroadcast cross join; the exact-cosine
        # baseline deliberately broadcasts, which plans as
        # BroadcastNestedLoopJoin, so a true CartesianProduct is always a bug
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct (unbroadcast cross join)")
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_engine_foreachbatch_plans_lint_clean(spark, tmp_path, monkeypatch):
    """The same lint over the ENGINE's executed plans: drive one CDC e2e
    (snapshot + incremental with DDL) while spying on every DataFrame
    action (collect + parquet writes), then assert no captured plan —
    stage, LWW reduce, MERGE source, metadata pass — contains
    row-at-a-time Python or an unbroadcast cross join. This closes the gap
    where a regression inside foreachBatch would dodge the query lint."""
    import os

    import pyspark.sql.classic.dataframe as D
    import pyspark.sql.readwriter as RW

    from seatunnel_spark.lake import LakeTable
    from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY, event_schema
    from seatunnel_spark.sources import generator as gen
    from seatunnel_spark.streaming.job import CdcIngestJob

    captured: list[tuple[str, str]] = []

    def grab(df, tag):
        try:
            captured.append((tag, df._jdf.queryExecution().executedPlan().toString()))
        except Exception:
            pass  # streaming sources can't produce an executed plan pre-start

    orig_collect = D.DataFrame.collect
    monkeypatch.setattr(
        D.DataFrame, "collect",
        lambda self: (grab(self, "collect"), orig_collect(self))[1],
    )
    orig_parquet = RW.DataFrameWriter.parquet
    monkeypatch.setattr(
        RW.DataFrameWriter, "parquet",
        lambda self, *a, **kw: (grab(self._df, "write"), orig_parquet(self, *a, **kw))[1],
    )

    work = str(tmp_path)
    paths = gen.write_fixture(os.path.join(work, "fx"), n_base=60,
                              n_events=240, seed=11, n_event_files=2)
    job = CdcIngestJob(spark, os.path.join(work, "table"), paths["events"],
                       os.path.join(work, "ckpt"), num_buckets=4,
                       total_events=240)
    job.ensure_snapshot(spark.read.parquet(paths["base"]),
                        spark.read.schema(event_schema()).parquet(paths["events"]),
                        REPO_FIELDS, REPO_KEY, max_fence=40)
    job.run_incremental(available_now=True, timeout_s=300)
    assert LakeTable.load(os.path.join(work, "table")).scan(spark).count() > 0
    # round 6 fused the DDL segments into ONE merge per batch, so the
    # engine now runs exactly: first-DDL probe + snapshot write + per-batch
    # (metadata collect + merge write) — 4 actions for this 1-batch drive
    assert len(captured) >= 4  # ddl probe + snapshot + metadata + merge

    offenders = {}
    for i, (tag, plan) in enumerate(captured):
        bad = []
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if bad:
            offenders[f"{i}:{tag}"] = bad
    assert not offenders, offenders


def test_scans_prune_columns(spark):
    """Spot-check pushdown: narrow queries must not read the wide text
    column they don't use."""
    import re

    import __spark_entry__ as e

    qs = e.queries()
    # s2 reads only event_id from events
    plan = _plan(qs["s2_chunk_split_even"](spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("payload" not in s and "event_type" not in s for s in schemas)
    # exact dedup shuffles digests, never raw text, and its scan reads
    # only (doc_id, text)
    plan = _plan(qs["dedup_exact"](spark, SF_DIR))
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas and all("lang" not in s and "source" not in s for s in schemas)
