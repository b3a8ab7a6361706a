"""Property-based invariants (hypothesis): for ANY op sequence and ANY way
of splitting it into ordered batches, the engine's merged state equals the
sequential oracle — the algebraic heart of the exactly-once CDC claim."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark import oracle
from seatunnel_spark.lake import LakeTable, merge_into
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY

KEYS = [("o/r", f"f{i}.py") for i in range(4)]


@st.composite
def op_sequences(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    ops = []
    for seq in range(n):
        repo, path = KEYS[draw(st.integers(0, len(KEYS) - 1))]
        kind = draw(st.sampled_from(["I", "U", "D"]))
        ops.append((seq, kind, repo, path))
    cuts = sorted(draw(st.sets(st.integers(1, max(n - 1, 1)), max_size=3)))
    return ops, cuts


def _expected(ops):
    state = {}
    for seq, kind, repo, path in ops:
        if kind == "D":
            state.pop((repo, path), None)
        else:
            state[(repo, path)] = f"v{seq}"
    return state


@settings(max_examples=12, deadline=None)
@given(op_sequences())
def test_any_batching_matches_sequential_oracle(spark, tmp_path_factory, case):
    ops, cuts = case
    d = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(str(d / "t"), REPO_FIELDS, REPO_KEY, num_buckets=2)

    def rows(chunk):
        return [
            (repo, path, f"c{seq}", "py", f"v{seq}" if kind != "D" else None, kind, seq)
            for seq, kind, repo, path in chunk
        ]

    bounds = [0, *cuts, len(ops)]
    for i in range(len(bounds) - 1):
        chunk = ops[bounds[i] : bounds[i + 1]]
        if not chunk:
            continue
        df = spark.createDataFrame(
            rows(chunk),
            "repo string, path string, commit string, lang string, content string, op string, seq long",
        )
        merge_into(spark, table, df, f"e{i}", compact_threshold=3)

    got = {(r["repo"], r["path"]): r["content"] for r in table.scan(spark).collect()}
    assert got == _expected(ops)
