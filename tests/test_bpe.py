"""Distributed BPE vocabulary trainer (operators/bpe.py, Sennrich et al.
2016 re-shaped for Spark: one corpus-scale word-count aggregate, then
vocabulary-bounded merge iterations with codegen'd literal-replace merge
application)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_bpe(texts, n_merges, passes=4):
    """Pure-Python replay of the operator's EXACT semantics (including the
    passes-bounded replace fixpoint) — an independent implementation, not
    a copy of the Spark expressions."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                words[w] += 1
    segs = {(" " + " ".join(list(w)) + " </w> "): n for w, n in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for seg, n in segs.items():
            toks = seg.strip().split(" ")
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        # deterministic: count desc then lexicographic asc on (l, r)
        top = max(pc.values())
        l, r = sorted(p for p, c in pc.items() if c == top)[0]
        cnt = pc[(l, r)]
        if cnt < 2:
            break
        pat, rep = f" {l} {r} ", f" {l}{r} "
        new = {}
        for seg, n in segs.items():
            s = seg
            for _ in range(passes):
                s = s.replace(pat, rep)
            new[s] = new.get(s, 0) + n
        segs = new
        merges.append((rank, l, r, l + r, cnt))
    return merges


def test_bpe_train_matches_reference_replay(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide width",
        "low new wide lower",
    ]
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in __import__(
            "seatunnel_spark.operators.bpe", fromlist=["bpe_train"]
        ).bpe_train(_docs(spark, texts), n_merges=5, min_freq=2)
        .orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(texts, 5)
    # sanity: the classic example learns 'lo' + 'low'-family merges early
    assert len(got) == 5
    assert all(m[4] >= 2 for m in got)


def test_bpe_train_early_stop_below_min_freq(spark):
    from seatunnel_spark.operators.bpe import bpe_train

    # every word unique, every char distinct -> all pairs count 1 < min_freq
    out = bpe_train(_docs(spark, ["ab cd", "ef gh"]), n_merges=3, min_freq=2)
    assert out.count() == 0
    assert out.columns == ["merge_rank", "left", "right", "merged", "pair_count"]


def test_bpe_same_pair_run_fixpoint(spark):
    """The documented passes-bound: 'a a a a' merges to [aa, aa] (both
    pairs) under the multi-pass replace, not the single-pass [aa, a, b]
    truncation."""
    from seatunnel_spark.operators.bpe import bpe_segment, bpe_train

    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges = bpe_train(docs, n_merges=1, min_freq=2)
    m = merges.collect()[0]
    assert (m["left"], m["right"]) == ("a", "a")
    seg = bpe_segment(docs, [("a", "a")])
    toks = {r["token"]: r["tf"] for r in seg.collect()}
    # each 'aaaa' -> [aa, aa, </w>] exactly
    assert toks == {"aa": 6, "</w>": 3}


def test_bpe_segment_counts(spark):
    from seatunnel_spark.operators.bpe import bpe_segment

    docs = _docs(spark, ["low low lower"])
    out = bpe_segment(docs, [("l", "o"), ("lo", "w")])
    toks = {r["token"]: r["tf"] for r in out.collect()}
    # 'low' -> [low, </w>] x2; 'lower' -> [low, e, r, </w>]
    assert toks == {"low": 3, "</w>": 3, "e": 1, "r": 1}


def test_bpe_plan_is_codegen(spark):
    """The merge application must stay whole-stage-codegen expressions —
    no Python in the hot path."""
    from seatunnel_spark.operators.bpe import _initial_segments, bpe_word_counts

    df = _docs(spark, ["aa bb aa bb"] * 4)
    segs = _initial_segments(bpe_word_counts(df))
    plan = segs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
