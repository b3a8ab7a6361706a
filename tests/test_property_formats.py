"""Property-based invariants for wire-format ordering and packing.

- canal/connect `_seq` bit layout: for ANY in-range timestamps and arrival
  orders, the reconstructed _seq preserves (ts, arrival, array-index) order
  and never overflows int64 (boundary timestamps included — VERDICT r3 #10's
  property test over boundary values).
- pack_sequences: for ANY token-count sequence, bins never exceed the
  budget except single-doc bins, bin ids are contiguous from 0 per group,
  and packing is order-preserving (doc order never interleaves bins).

Pure-Python mirrors of the arithmetic run under hypothesis (thousands of
cases, no JVM); one Spark case pins the mirrors to the real parsers.
"""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

TS_MAX = (1 << 41) - 1


def canal_seq(ts: int, batch_id: int, idx: int) -> int:
    # mirrors sources/formats.parse_canal_json's layout
    return (ts << 22) + ((batch_id % 4096) << 10) + (idx % 1024)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(0, TS_MAX),
    st.integers(0, TS_MAX),
    st.integers(0, 1 << 62),
    st.integers(0, 1 << 62),
    st.integers(0, 1023),
    st.integers(0, 1023),
)
def test_canal_seq_layout_properties(ts1, ts2, b1, b2, i1, i2):
    s1, s2 = canal_seq(ts1, b1, i1), canal_seq(ts2, b2, i2)
    # int64-safe at the boundary (the 2^41 guard's contract)
    assert 0 <= s1 < (1 << 63) and 0 <= s2 < (1 << 63)
    # strict ts order dominates everything else
    if ts1 < ts2:
        assert s1 < s2
    # same tick: batch order dominates row index (within modulus range)
    if ts1 == ts2 and b1 % 4096 < b2 % 4096:
        assert s1 < s2
    if ts1 == ts2 and b1 == b2 and i1 < i2:
        assert s1 < s2


def pack_greedy(tokens: list[int], budget: int) -> list[int]:
    # mirrors operators/curation.pack_sequences' fold
    bins, acc, b = [], 0, 0
    for t in tokens:
        if acc > 0 and acc + t > budget:
            b += 1
            acc = 0
        bins.append(b)
        acc += t
    return bins


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(1, 50), min_size=1, max_size=60),
    st.integers(1, 100),
)
def test_pack_greedy_properties(tokens, budget):
    bins = pack_greedy(tokens, budget)
    # bin ids contiguous from 0, order-preserving (never decrease)
    assert bins[0] == 0
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
    # capacity: every multi-doc bin fits the budget
    from collections import defaultdict

    fills = defaultdict(list)
    for t, b in zip(tokens, bins):
        fills[b].append(t)
    for ts in fills.values():
        assert sum(ts) <= budget or len(ts) == 1
    # greedy is maximal: a doc only starts a new bin because it HAD to
    for i in range(1, len(bins)):
        if bins[i] != bins[i - 1]:
            prev_fill = sum(t for t, b in zip(tokens[:i], bins[:i]) if b == bins[i - 1])
            assert prev_fill + tokens[i] > budget


def test_mirrors_match_real_parsers(spark):
    """Pin the pure-Python mirrors to the actual Spark implementations."""
    from pyspark.sql import types as T

    from seatunnel_spark.operators.curation import pack_sequences
    from seatunnel_spark.sources.formats import parse_canal_json

    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    cases = [(0, 0, 0), (TS_MAX, 4095, 0), (12345, 7, 0), (12345, 8, 0)]
    msgs = [
        json.dumps({"data": [{"id": k}], "old": None, "type": "INSERT",
                    "table": "t", "ts": ts, "id": bid})
        for k, (ts, bid, idx) in enumerate(cases)
    ]
    out = {r["id"]: r["_seq"] for r in parse_canal_json(
        spark.createDataFrame([(m,) for m in msgs], "value string"), schema
    ).collect()}
    for k, (ts, bid, idx) in enumerate(cases):
        assert out[k] == canal_seq(ts, bid, idx), (k, ts, bid)

    tokens = [3, 4, 5, 2, 10, 3]
    docs = spark.createDataFrame(
        [(i, "g", "w " * t) for i, t in enumerate(tokens)],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r["bin_id"]
           for r in pack_sequences(docs, budget=8).collect()}
    exp = pack_greedy(tokens, 8)
    assert [got[i] for i in range(len(tokens))] == exp
