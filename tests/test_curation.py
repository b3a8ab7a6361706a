"""Unit tests for training-data curation: decontamination, sequence
packing, domain mixing (operators/curation.py)."""

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.operators import curation


def test_decontaminate_flags_ngram_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),   # contains bench gram
            (2, "totally unrelated words in this document here"),
            (3, "prefix alpha beta gamma delta epsilon suffix"),  # shares 5-gram
            (4, "alpha beta gamma"),  # shorter than n: whole text is the gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in curation.decontaminate(docs, bench, n=5).collect()}
    assert out[1] == (1, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (0, False)  # 3-word doc produces one 3-word "gram" != bench 5-gram
    assert len(out) == 4  # every doc present, clean ones included


def test_decontaminate_counts_distinct_grams(spark):
    # a doc repeating the bench gram counts it ONCE (distinct grams per doc)
    docs = spark.createDataFrame(
        [(1, "a b c d e x a b c d e")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    r = curation.decontaminate(docs, bench, n=5).collect()[0]
    assert r["n_overlap"] == 1 and r["contaminated"]


def test_pack_sequences_greedy_first_fit(spark):
    docs = spark.createDataFrame(
        [
            # source s1: token counts 3, 4, 5, 2 with budget 8 → bins [0,0,1,1]
            (1, "s1", "w w w"),
            (2, "s1", "w w w w"),
            (3, "s1", "w w w w w"),
            (4, "s1", "w w"),
            # source s2: one doc larger than budget gets its own bin, then next
            (10, "s2", "w w w w w w w w w w"),  # 10 > 8 → bin 0 alone
            (11, "s2", "w w w"),                # bin 1
        ],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: (r["bin_id"], r["n_tokens"])
           for r in curation.pack_sequences(docs, budget=8).collect()}
    assert out[1] == (0, 3) and out[2] == (0, 4)    # 3+4=7 <= 8
    assert out[3] == (1, 5) and out[4] == (1, 2)    # 5 would overflow → new bin
    assert out[10] == (0, 10)                       # oversized doc: own bin
    assert out[11] == (1, 3)
    # bins never exceed budget except single-doc bins
    from collections import defaultdict

    fills = defaultdict(list)
    for doc_id, (b, t) in out.items():
        src = "s1" if doc_id < 10 else "s2"
        fills[(src, b)].append(t)
    for (src, b), ts in fills.items():
        assert sum(ts) <= 8 or len(ts) == 1


def test_pack_sequences_plan_is_grouped_pandas(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "w " * (i % 7 + 1)) for i in range(30)],
        "doc_id long, source string, text string",
    )
    plan = curation.pack_sequences(docs, budget=10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan  # Arrow-batched, not row-at-a-time
    assert "BatchEvalPython" not in plan


def test_domain_mix_thresholds_sqrt_weighting(spark):
    # source big: 400 docs, source small: 100 docs → sqrt weighting gives
    # small a sqrt(400/100)=2x larger keep probability (uncapped regime)
    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    th = {r["source"]: r["keep_ppm"]
          for r in curation.domain_mix_thresholds(docs, 500_000).collect()}
    assert th["small"] > th["big"]
    assert 1.95 < th["small"] / th["big"] < 2.05
    # thresholds are capped at 10^6 ppm; extreme imbalance hits the cap
    assert all(0 <= v <= 1_000_000 for v in th.values())
    extreme = spark.createDataFrame(
        [(i, "huge") for i in range(900)] + [(10_000 + i, "tiny") for i in range(4)],
        "doc_id long, source string",
    )
    th_x = {r["source"]: r["keep_ppm"]
            for r in curation.domain_mix_thresholds(extreme, 500_000).collect()}
    assert th_x["tiny"] == 1_000_000  # keep everything from the tiny source

    sampled = curation.domain_mix_sample(docs, 500_000)
    n = sampled.count()
    assert 0.35 * 500 < n < 0.65 * 500  # md5 coin ≈ target_frac overall
    by_src = {r["source"]: r["n"] for r in
              sampled.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # small source keeps a ~2x larger FRACTION of its docs
    frac_small = by_src.get("small", 0) / 100
    frac_big = by_src.get("big", 0) / 400
    assert frac_small > 1.4 * frac_big

    # deterministic: identical second run
    again = sampled.collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in curation.domain_mix_sample(docs, 500_000).collect()
    )


def test_domain_mix_thresholds_web_scale_no_overflow(spark):
    # w*N*10^6 used to be int64 arithmetic, which wraps negative past ~7M
    # docs (silently dropping whole sources). Feed fabricated counts at
    # web-corpus scale (10^9-10^12 docs per source) and compare against
    # exact Python big-int math.
    import math

    counts = [("cc", 1_200_000_000_000), ("github", 9_000_000_000),
              ("wiki", 60_000_000), ("books", 7_500_000), ("tiny", 12_345)]
    df = spark.createDataFrame(counts, "source string, n_docs long")
    got = {r["source"]: r["keep_ppm"]
           for r in curation.thresholds_from_counts(df, 500_000).collect()}

    ws = {s: int(math.floor(math.sqrt(n) * 1000)) for s, n in counts}
    tot = sum(n for _, n in counts)
    wsum = sum(ws.values())
    n_target = tot * 500_000 // 1_000_000
    want = {s: min(1_000_000, ws[s] * n_target * 1_000_000 // (wsum * n))
            for s, n in counts}
    assert got == want
    assert all(0 <= v <= 1_000_000 for v in got.values())  # never negative


def test_domain_mix_single_source_keeps_target_frac(spark):
    docs = spark.createDataFrame(
        [(i, "only") for i in range(2000)], "doc_id long, source string"
    )
    th = curation.domain_mix_thresholds(docs, 250_000).collect()[0]
    # one source: keep_ppm == floor(target) / n normalization ≈ 250000
    assert abs(th["keep_ppm"] - 250_000) < 2_000
    n = curation.domain_mix_sample(docs, 250_000).count()
    assert 0.2 * 2000 < n < 0.3 * 2000


def test_fuzzy_decontaminate_catches_paraphrase(spark):
    """A lightly-edited copy of a benchmark doc (one word changed) is below
    any exact-n-gram-coverage bar for small n-gram overlap thresholds but
    shares most shingles -> the fuzzy pass flags it; unrelated text stays."""
    from seatunnel_spark.operators.curation import fuzzy_decontaminate

    bench_text = (
        "the quick brown fox jumps over the lazy dog and then runs away "
        "very fast into the deep dark forest tonight"
    )
    corpus = spark.createDataFrame(
        [
            (1, bench_text),                                # verbatim leak
            (2, bench_text.replace("fast", "slowly")),      # paraphrase leak
            (3, "completely unrelated prose about spark shuffle tuning"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "bench_id long, text string"
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()
    }
    assert got[(1, 100)] == 1.0
    assert 0.5 <= got[(2, 100)] < 1.0
    assert (3, 100) not in got


def test_leakage_free_split_cluster_cohesion(spark):
    """Near-dup cluster members always share a split; singletons key on
    themselves; the assignment is deterministic across runs."""
    from seatunnel_spark.operators.curation import leakage_free_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
    )
    # clusters: {0,7,13} labeled 0, {2,9} labeled 2 — rest singletons
    clusters = spark.createDataFrame(
        [(0, 0), (7, 0), (13, 0), (2, 2), (9, 2)],
        "doc_id long, cluster_id long",
    )
    out = {r.doc_id: r for r in leakage_free_split(docs, clusters).collect()}
    assert len(out) == 20
    assert out[0].split == out[7].split == out[13].split
    assert out[0].split_key == out[7].split_key == 0
    assert out[2].split == out[9].split and out[2].split_key == 2
    assert out[5].split_key == 5  # singleton keys on itself
    again = {r.doc_id: r.split for r in
             leakage_free_split(docs, clusters).collect()}
    assert again == {k: v.split for k, v in out.items()}


def test_leakage_free_split_fractions(spark):
    """ppm thresholds carve the id space: every bucket respects the
    configured boundaries."""
    from seatunnel_spark.operators.curation import leakage_free_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, cluster_id long")
    out = leakage_free_split(docs, empty, train_ppm=800_000, val_ppm=900_000)
    rows = out.collect()
    for r in rows:
        if r.split == "train":
            assert r.split_ppm < 800_000
        elif r.split == "val":
            assert 800_000 <= r.split_ppm < 900_000
        else:
            assert r.split_ppm >= 900_000
    splits = {r.split for r in rows}
    assert splits == {"train", "val", "test"}


def test_clean_funnel_first_failing_gate(spark):
    """Each doc lands in exactly its FIRST failing gate, and the funnel
    totals the corpus."""
    from seatunnel_spark.operators.curation import clean_funnel_report

    docs = spark.createDataFrame(
        [(1, 10), (2, 200), (3, 200), (4, 200), (5, 200), (6, 200)],
        "doc_id long, n_chars long",
    )
    rep = spark.createDataFrame(
        [
            # doc 1: fails short_chars AND few_words -> counted short_chars
            (1, 5, 0.0, 0.0),
            (2, 10, 0.9, 0.9),   # few_words (first failing)
            (3, 100, 0.9, 0.9),  # dup_word_frac
            (4, 100, 0.1, 0.9),  # top_word_frac
            (5, 100, 0.1, 0.1),  # near_dup (via non_canonical)
            (6, 100, 0.1, 0.1),  # kept
        ],
        "doc_id long, n_words long, dup_word_frac double, top_word_frac double",
    )
    non_canon = spark.createDataFrame([(5,)], "doc_id long")
    got = {r.stage: r.n_docs for r in
           clean_funnel_report(docs, rep, non_canon).collect()}
    assert got == {"short_chars": 1, "few_words": 1, "dup_word_frac": 1,
                   "top_word_frac": 1, "near_dup": 1, "kept": 1}
    assert sum(got.values()) == 6


def test_funnel_kept_equals_corpus_clean(spark):
    """The report's 'kept' bucket is corpus_clean's survivor count on the
    same data — the funnel and the filter are the same recipe."""
    from seatunnel_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    kept = {r.stage: r.n_docs
            for r in QUERIES["corpus_clean_report"](spark, sf).collect()}
    n_clean = QUERIES["corpus_clean"](spark, sf).count()
    assert kept.get("kept", 0) == n_clean


def test_dsir_scores_ranks_target_like_docs_higher(spark):
    """Docs drawn from the target domain's vocabulary must outscore docs
    from a disjoint vocabulary (score is the log2-quantized likelihood
    ratio of hashed unigram+bigram features)."""
    from seatunnel_spark.operators.curation import dsir_scores

    booksy = [
        "the quiet library held a thousand old stories",
        "a reader wandered the shelves of old stories",
        "stories of the library filled a thousand pages",
    ]
    webby = [
        "click here buy now free shipping limited offer",
        "subscribe login cookie settings accept all offers",
        "free offer click now buy buy buy",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(booksy + webby)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(booksy)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dsir_scores(docs, target, n_buckets=512).collect()}
    assert set(out) == set(range(6))
    # per-feature normalized score separates the domains cleanly
    book_rates = [out[i]["score"] / out[i]["n_feats"] for i in range(3)]
    web_rates = [out[i]["score"] / out[i]["n_feats"] for i in range(3, 6)]
    assert min(book_rates) > max(web_rates)


def test_dsir_scores_deterministic_and_total(spark):
    from seatunnel_spark.operators.curation import dsir_scores

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(10)],
        "doc_id long, text string",
    )
    tgt = docs.where("doc_id < 3")
    a = sorted(dsir_scores(docs, tgt).collect())
    b = sorted(dsir_scores(docs, tgt).collect())
    assert a == b
    assert len(a) == 10  # every doc scored (raw model anchors the join)
