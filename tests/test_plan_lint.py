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
