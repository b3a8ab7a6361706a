"""Unit tests for transforms, dedup suite, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.functions.zeta import rewrite_zeta_sql
from seatunnel_spark.operators import dedup_docs, similarity, text, transforms
from seatunnel_spark.operators.dedup import lww_dedup, lww_dedup_agg, lww_reduce


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "s0"),
        (1, "the quick brown fox jumps over the lazy dog and runs away fast", "en", "s1"),
        (2, "the quick brown fox jumps over the lazy dog and runs away slow", "en", "s2"),
        (3, "der hund ist und das der die und auch hier", "de", "s3"),
        (4, "completely different text about spark query engines and shuffles", "en", "s4"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_lww_forms_agree(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c"), (2, 7, "d"), (1, 15, "e")],
        "k long, seq long, v string",
    )
    a = {r["k"]: r["v"] for r in lww_dedup(ev, ["k"]).collect()}
    b = {r["k"]: r["v"] for r in lww_dedup_agg(ev, ["k"]).collect()}
    assert a == b == {1: "b", 2: "d"}


def test_lww_reduce_semi_join_breaks_ties(spark):
    """Non-unique ordering values (e.g. timestamp-ordered sources): exactly
    one row per key survives, deterministically across runs."""
    ev = spark.createDataFrame(
        [(1, 10, "a", "pa"), (1, 10, "b", "pb"), (1, 5, "c", "pc"),
         (2, 7, "d", "pd"), (2, 7, "d", "pd")],  # full-row duplicate tie
        "k long, seq long, v string, content string",  # content → semi_join path
    )
    out1 = lww_reduce(ev, ["k"], "seq").collect()
    out2 = lww_reduce(ev, ["k"], "seq").collect()
    assert sorted(r["k"] for r in out1) == [1, 2]  # one row per key
    assert {(r["k"], r["seq"], r["v"]) for r in out1} == {
        (r["k"], r["seq"], r["v"]) for r in out2
    }  # deterministic winner
    assert next(r for r in out1 if r["k"] == 2)["v"] == "d"
    assert ev.columns == lww_reduce(ev, ["k"], "seq").columns


def test_transforms(spark):
    df = spark.createDataFrame([(1, "a/b/c", "x y")], "id long, p string, t string")
    out = transforms.split_field(df, "p", "/", ["p0", "p1", "p2"])
    r = out.collect()[0]
    assert (r["p0"], r["p1"], r["p2"]) == ("a", "b", "c")
    out = transforms.field_mapper(df, {"id": "ident", "t": "txt"})
    assert out.columns == ["ident", "txt"]
    out = transforms.replace_field(df, "t", "y", "z")
    assert out.collect()[0]["t"] == "x z"
    out = transforms.copy_fields(df, {"t": "t2"})
    assert out.collect()[0]["t2"] == "x y"


def test_exact_dedup_groups(spark, docs):
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"]) for r in
           dedup_docs.exact_dedup(docs).collect()}
    assert got[0] == (0, 2) and got[1] == (0, 2)  # 0 and 1 identical
    assert got[2][1] == 1 and got[4][1] == 1


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             dedup_docs.minhash_lsh_pairs(docs, k=16, bands=8).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 4) not in pairs and (1, 4) not in pairs  # unrelated docs don't
    jac = dedup_docs.ngram_jaccard(
        docs, spark.createDataFrame([(0, 1), (0, 2), (0, 4)], "doc_a long, doc_b long")
    )
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in jac.collect()}
    assert j[(0, 1)] == 1.0
    assert 0.5 < j[(0, 2)] < 1.0
    assert j[(0, 4)] < 0.1


def test_lsh_bucket_cap_bounds_duplicate_clusters(spark):
    """A cluster of N identical docs must NOT emit N² candidate pairs: its
    band buckets exceed the cap and are skipped (exact_dedup handles them in
    O(N)); genuinely-near pairs outside the cluster still surface."""
    dup_text = "copy pasted boilerplate license header repeated in every file verbatim"
    near_a = "the quick brown fox jumps over the lazy dog and runs away fast"
    near_b = "the quick brown fox jumps over the lazy dog and runs away slow"
    rows = [(i, dup_text) for i in range(200)] + [(1000, near_a), (1001, near_b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = dedup_docs.minhash_lsh_pairs(df, k=16, bands=4, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert all(a >= 1000 for a, _ in got), "capped cluster leaked pairs"
    assert (1000, 1001) in got
    # the oversized cluster is exact-dup territory: collapsed in O(N)
    collapsed = dedup_docs.exact_dedup(df).where(F.col("group_size") == 200)
    assert collapsed.count() == 200
    # uncapped (max_bucket=None) would emit the full N² blowup: prove the
    # cap is what bounds it
    uncapped = dedup_docs.minhash_lsh_pairs(df, k=16, bands=4, max_bucket=None)
    assert uncapped.count() == 200 * 199 // 2 + 1


def test_lsh_min_band_matches_pregate(spark, docs):
    """min_band_matches=2 keeps pairs colliding in ≥2 bands (true near-dups
    collide in most bands) and drops single-band accidental collisions; it
    can only ever shrink the default pair list."""
    near_a = "the quick brown fox jumps over the lazy dog and runs away fast"
    near_b = "the quick brown fox jumps over the lazy dog and runs away slow"
    rows = [(0, near_a), (1, near_b), (2, near_a), (3, "totally different text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {(r["doc_a"], r["doc_b"]) for r in
            dedup_docs.minhash_lsh_pairs(df, k=16, bands=4).collect()}
    gated = {(r["doc_a"], r["doc_b"]) for r in
             dedup_docs.minhash_lsh_pairs(df, k=16, bands=4,
                                          min_band_matches=2).collect()}
    assert gated <= base
    assert (0, 2) in gated          # identical docs share ALL bands
    assert (0, 1) in gated          # one-word-off near-dups share most bands
    # impossible thresholds yield nothing (> number of bands)
    assert dedup_docs.minhash_lsh_pairs(
        df, k=16, bands=4, min_band_matches=5).count() == 0


def test_lsh_star_pair_policy(spark):
    """star policy: each bucket emits only (bucket-min, member) edges —
    linear in bucket size, same connectivity for clustering. A clique of N
    identical docs yields exactly N-1 edges from the hub instead of
    C(N,2)."""
    dup = "identical boilerplate text repeated across every single file here"
    rows = [(i, dup) for i in range(8)] + [(100, "something else entirely now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    star = {(r["doc_a"], r["doc_b"]) for r in dedup_docs.minhash_lsh_pairs(
        df, k=16, bands=4, pair_policy="star").collect()}
    assert star == {(0, i) for i in range(1, 8)}  # hub 0 -> 7 edges, not 28
    allp = dedup_docs.minhash_lsh_pairs(df, k=16, bands=4).count()
    assert allp == 8 * 7 // 2
    # clustering over star edges resolves the same single component
    clusters = dedup_docs.dup_clusters(
        dedup_docs.minhash_lsh_pairs(df, k=16, bands=4, pair_policy="star"))
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {i: 0 for i in range(8)}
    with pytest.raises(ValueError, match="pair_policy"):
        dedup_docs.minhash_lsh_pairs(df, pair_policy="ring").count()


def test_simhash_near_dup_close(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup_docs.simhash(docs, bits=32).collect()}
    assert sh[0] == sh[1]
    ham_02 = bin(sh[0] ^ sh[2]).count("1")
    ham_04 = bin(sh[0] ^ sh[4]).count("1")
    assert ham_02 <= ham_04

def test_brute_force_topk_self_similarity(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((4, [1.0, 0.0, 0.0, 0.001]))  # near-dup of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=1)
    r = out.collect()[0]
    assert r["vec_id"] == 4 and r["rank"] == 1 and r["cos_sim"] > 0.999


def test_lsh_near_dup_pairs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0
        (2, [-1.0, 0.0, 0.0, 0.0]),    # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["vec_a"], r["vec_b"]) for r in
             similarity.lsh_near_dup_pairs(emb, dim=4, planes=4, threshold=0.99).collect()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_text_operators(spark, docs):
    tc = text.token_count(docs).collect()[0]
    assert tc["n_tokens_ws"] == 13
    li = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    assert li[3] == "de"
    q = text.quality_score(docs).collect()[0]
    assert q["n_words"] == 13 and 0 < q["stopword_ratio"] < 1
    fp = text.fingerprint(docs).select("fp").distinct().count()
    assert fp == 4  # 0/1 share a fingerprint


def test_multimodal_plumbing(spark):
    from seatunnel_spark.operators import multimodal

    media = multimodal.synthesize_media(spark, n=12)
    feats = multimodal.extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    # deterministic: same payload → same features
    again = {r["media_id"]: r["features"] for r in
             multimodal.extract_features(media, fake=True).collect()}
    assert again[0] == rows[0]["features"] or again[rows[0]["media_id"]] == rows[0]["features"]
    plan = multimodal.frame_sample_plan(media, every_ms=10000)
    assert plan.where(F.col("frame_ms") % 10000 != 0).count() == 0


def test_sample_sharding_plan_never_sorts_raw_table(spark):
    """The s4 sharding plan's single-partition window must run over the KEY
    HISTOGRAM (post-aggregate), never a global sort of the raw event table —
    the 100× scale guarantee. Asserts the physical plan shape."""
    from seatunnel_spark.entry_queries import QUERIES

    df = QUERIES["s4_sample_sharding"](spark, "/root/testdata/sf0.001")
    df.collect()  # finalize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
    # everything below the single-partition exchange is already aggregated
    below = plan.split("Exchange SinglePartition", 1)[1]
    assert "HashAggregate(keys=[user_id" in below
    # the raw scan is pruned to the key column only
    assert "ReadSchema: struct<user_id:bigint>" in below


def test_zeta_sql_rewrite():
    assert rewrite_zeta_sql("FORMATDATETIME(ts, 'yyyy')") == "DATE_FORMAT(ts, 'yyyy')"
    assert rewrite_zeta_sql("CONCAT(UPPER(x), LOWER(y))") == "CONCAT(UPPER(x), LOWER(y))"
    # argument-aware transforms
    assert rewrite_zeta_sql("DATEADD(ts, 3)") == "TIMESTAMPADD(DAY, 3, ts)"
    assert rewrite_zeta_sql("DATEADD(ts, 3, 'HOUR')") == "TIMESTAMPADD(HOUR, 3, ts)"
    assert rewrite_zeta_sql("DATEDIFF(a, b, 'MINUTE')") == "TIMESTAMPDIFF(MINUTE, a, b)"
    assert rewrite_zeta_sql("DATE_TRUNC(ts, 'MONTH')") == "DATE_TRUNC('MONTH', ts)"
    assert (
        rewrite_zeta_sql("INSERT(s, 2, 3, 'xy')")
        == "CONCAT(SUBSTRING(s, 1, (2) - 1), 'xy', SUBSTRING(s, (2) + (3)))"
    )
    # nesting + strings containing commas/parens stay intact
    assert (
        rewrite_zeta_sql("CONCAT(FORMATDATETIME(ts, 'a,(b'), TRUNCATE(x, 2))")
        == "CONCAT(DATE_FORMAT(ts, 'a,(b'), (CASE WHEN (x) >= 0 THEN "
        "FLOOR((x) * POW(10, 2)) ELSE CEILING((x) * POW(10, 2)) END / POW(10, 2)))"
    )


def test_entry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert len(qs) >= 25
    assert set(os_) <= set(qs)
    # every registered query now has a DuckDB oracle (r3: media closed)
    assert set(qs) == set(os_)


def test_ivf_topk_recall_and_plan(spark):
    """IVF-Flat: (1) assignment is a pure projection — NO exchange in the
    corpus-side plan (the 10^9-vector guarantee); (2) probing 2/8 cells
    recovers most of the exact top-5 (recall sanity, deterministic)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = similarity.ivf_fit(emb, 8)
    assert len(cents) == 8 and len(cents[0][1]) == 64

    assigned = similarity.ivf_assign(emb, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    # map-only over the corpus: the centroids ride as ONE broadcast row
    # (BroadcastExchange of a 1-row table is allowed; a hash/range exchange
    # of the corpus is the thing the 10^9-vector guarantee forbids)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # every vector lands in exactly one existing cell
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {cid for cid, _ in cents}
    assert assigned.count() == emb.count()

    queries = emb.where(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(emb, queries, cents, k=5, nprobe=2)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # nprobe=2/8 on random-ish embeddings: expect meaningful overlap, and
    # every IVF result must be a real corpus vector scored against its query
    assert len(a) > 0 and len(a & e) >= len(e) // 4
    # raising nprobe to all cells converges to exact
    full = similarity.ivf_topk(emb, queries, cents, k=5, nprobe=8)
    f = {(r["query_id"], r["vec_id"]) for r in full.collect()}
    assert f == e


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org today"),
            (2, "call +44 207 946 0958 or +1 555 123 4567"),
            (3, "server at 192.168.1.254 and 10.0.0.1 is up"),
            (4, "no pii here at all"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r for r in text.pii_redact(df).collect()}
    assert got[1]["text_redacted"] == "mail me at <EMAIL> today"
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 0
    assert got[2]["text_redacted"] == "call <PHONE> or <PHONE>"
    assert got[2]["n_phone"] == 2
    assert got[3]["text_redacted"] == "server at <IP> and <IP> is up"
    assert got[3]["n_ipv4"] == 2
    assert got[4]["text_redacted"] == "no pii here at all"
    assert got[4]["n_email"] == got[4]["n_phone"] == got[4]["n_ipv4"] == 0


def test_lsh_near_dup_pairs_bucket_cap(spark):
    """VERDICT r2: a cluster of N near-identical embeddings shares one
    signature → uncapped self-join emits N²/2 pairs. With max_bucket the
    oversized bucket is skipped entirely and total pair count stays
    O(buckets × cap²)."""
    import math

    dim, cap = 8, 16
    # 1000 identical vectors (one signature bucket) + 40 distinct others
    dup = [(i, [1.0] * dim) for i in range(1000)]
    distinct = [
        (1000 + i, [math.sin(i * 7.3 + d) for d in range(dim)]) for i in range(40)
    ]
    df = spark.createDataFrame(dup + distinct, "vec_id long, embedding array<double>")

    capped = similarity.lsh_near_dup_pairs(
        df, dim, planes=4, threshold=-1.0, max_bucket=cap
    )
    n = capped.count()
    # every surviving bucket has ≤ cap members → ≤ 16 buckets × C(cap,2)
    assert n <= 16 * cap * (cap - 1) // 2
    # the dup cluster contributed nothing (its bucket size 1000+ > cap)
    assert capped.where(F.col("vec_a") < 1000).count() == 0
    # uncapped on just the small corpus still works (cap=None passthrough)
    un = similarity.lsh_near_dup_pairs(
        spark.createDataFrame(distinct, "vec_id long, embedding array<double>"),
        dim, planes=4, threshold=-1.0, max_bucket=None,
    )
    assert un.count() > 0


def test_sample_sharding_sampled_path(spark):
    """VERDICT r2: above the key-count threshold the histogram must be
    SAMPLED before any single-partition window (the reference's 1/1000
    sampling). Activates the path with threshold=0 and checks boundary
    quality: every event lands in exactly one shard and shard depths stay
    within tolerance of ideal."""
    from seatunnel_spark.operators.sharding import sample_sharding

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    total = ev.count()

    exact, sampled_flag = sample_sharding(ev, "user_id", shards=16)
    assert sampled_flag is False
    approx, sampled_flag = sample_sharding(
        ev, "user_id", shards=16, sample_threshold=0, sample_rate=4
    )
    assert sampled_flag is True
    rows = approx.collect()
    # partition property: counts cover the table exactly once
    assert sum(r["n_rows"] for r in rows) == total
    # shards are contiguous, non-overlapping key ranges
    rows.sort(key=lambda r: r["shard"])
    for a, b in zip(rows, rows[1:]):
        assert a["key_hi"] < b["key_lo"]
    # depth balance within sampling tolerance: no shard above 3x ideal
    ideal = total / 16
    assert max(r["n_rows"] for r in rows) <= 3 * ideal
    assert len(rows) >= 12  # nearly all shards materialize


def test_dup_clusters_connected_components(spark):
    """Cluster resolution over candidate pairs: a chain, a clique, and an
    isolated pair each collapse to their min-id label; convergence needs
    diameter rounds (the chain exercises >1 round)."""
    pairs = spark.createDataFrame(
        [
            # chain 1-2-3-4 (diameter 3: propagation must iterate)
            (1, 2), (2, 3), (3, 4),
            # clique 10-11-12
            (10, 11), (10, 12), (11, 12),
            # isolated pair
            (20, 21),
        ],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_docs.dup_clusters(pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False), 12: (10, False),
        20: (20, True), 21: (20, False),
    }


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # one word repeated: max repetition
            (2, "a b c d"),            # all distinct: zero repetition
            (3, "a b a b a b"),        # looping bigram "a b"
            (4, "solo"),               # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert got[1]["dup_word_frac"] == 0.75 and got[1]["top_word_frac"] == 1.0
    assert got[1]["dup_2gram_frac"] == round(1 - 1 / 3, 6)  # "a a" x3
    assert got[2]["dup_word_frac"] == 0.0 and got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["top_word_frac"] == 0.25
    assert got[3]["dup_word_frac"] == round(1 - 2 / 6, 6)
    # bigrams of doc 3: "a b" x3, "b a" x2 -> 1 - 2/5
    assert got[3]["dup_2gram_frac"] == round(1 - 2 / 5, 6)
    assert got[4]["n_words"] == 1 and got[4]["dup_2gram_frac"] == 0.0


def test_dup_clusters_nonconvergence_is_loud(spark):
    """ADVICE r3: a chain-shaped component with diameter > max_iters used to
    come back silently SPLIT (wrong canonical ids). It now raises."""
    chain = [(i, i + 1) for i in range(12)]  # path graph, diameter 12
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="did not converge"):
        dedup_docs.dup_clusters(pairs, max_iters=2)
    # enough rounds → converges to one cluster rooted at 0
    out = dedup_docs.dup_clusters(pairs, max_iters=20).collect()
    assert {r["cluster_id"] for r in out} == {0}


def test_lsh_near_dup_pairs_warns_on_skipped_buckets(spark):
    """ADVICE r3: the max_bucket cap silently dropped every pair in over-cap
    buckets. Coverage loss is now observable: a UserWarning reports the
    skipped bucket/vector counts, and lsh_over_cap_buckets returns the
    skipped set for exact-dedup routing."""
    import math
    import warnings

    dim, cap = 8, 4
    dup = [(i, [1.0] * dim) for i in range(20)]  # one over-cap bucket
    distinct = [
        (100 + i, [math.sin(i * 7.3 + d) for d in range(dim)]) for i in range(6)
    ]
    df = spark.createDataFrame(dup + distinct, "vec_id long, embedding array<double>")

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        similarity.lsh_near_dup_pairs(
            df, dim, planes=4, threshold=-1.0, max_bucket=cap
        ).count()
    skip_warns = [x for x in w if "skipped" in str(x.message)]
    assert len(skip_warns) == 1
    import re

    m = re.search(r"holding (\d+) vectors", str(skip_warns[0].message))
    assert m and int(m.group(1)) >= 20  # at least the dup cluster

    over = similarity.lsh_over_cap_buckets(df, dim, planes=4, max_bucket=cap).collect()
    assert len(over) == 1 and over[0]["bucket_size"] >= 20

    # under-cap corpus → no warning, empty over-cap set
    small = spark.createDataFrame(distinct, "vec_id long, embedding array<double>")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        similarity.lsh_near_dup_pairs(small, dim, planes=4, threshold=-1.0,
                                      max_bucket=cap).count()
    assert not [x for x in w if "skipped" in str(x.message)]
    assert similarity.lsh_over_cap_buckets(small, dim, planes=4,
                                           max_bucket=cap).count() == 0


def test_distributed_rank_no_single_partition_sort(spark):
    """VERDICT r3 #6: the sampled-boundary rank must not funnel the sample
    through one task. The two-phase rank (range partition -> offset +
    per-partition row_number) produces exact global ranks with NO
    SinglePartition exchange anywhere in the plan."""
    from seatunnel_spark.operators.sharding import _distributed_rank

    df = spark.range(0, 5000).select(
        (F.pmod(F.xxhash64("id"), 997)).alias("k")
    )
    ranked, ns = _distributed_rank(df, "k")
    assert ns == 5000
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the rank window is keyed by partition id (the range exchange itself
    # sits behind the localCheckpoint, so this plan starts at its RDD)
    assert "hashpartitioning(_pid" in plan
    rows = ranked.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 5001))  # exact 1..n
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)  # rank order IS key order

    # empty sample degrades cleanly
    empty, n0 = _distributed_rank(df.where(F.lit(False)), "k")
    assert n0 == 0 and empty.count() == 0


def test_line_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "- first bullet\n- second bullet\nplain line"),
            (2, "a sentence that trails off...\nand another one…\nnormal"),
            (3, "has # two # hashes and one... ellipsis here"),
            (4, "just plain text"),
        ],
        "doc_id long, text string",
    )
    from seatunnel_spark.operators import text as text_mod

    got = {r["doc_id"]: r for r in text_mod.line_stats(df).collect()}
    assert got[1]["n_lines"] == 3
    assert abs(got[1]["bullet_line_frac"] - 2 / 3) < 1e-6
    assert abs(got[2]["ellipsis_line_frac"] - 2 / 3) < 1e-6
    assert got[3]["symbol_word_ratio"] > 0.3  # 2 hashes + 1 "..." over 8 words
    assert got[4]["bullet_line_frac"] == 0.0
    assert got[4]["symbol_word_ratio"] == 0.0


def test_line_dedup_stats(spark):
    """CCNet/RefinedWeb-style cross-doc line dedup: a line in >= min_docs
    DISTINCT docs is boilerplate; within-doc repeats count once for document
    frequency but every occurrence counts in the per-doc stats."""
    from seatunnel_spark.operators.text import line_dedup_stats

    rows = [
        (1, "COOKIE NOTICE\nalpha body one\nfooter"),
        (2, "COOKIE NOTICE\nbeta body two\nfooter"),
        (3, "COOKIE NOTICE\nCOOKIE NOTICE\ngamma body three"),
        (4, "delta body four\n\n   \nfooter"),  # blank lines dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_lines"], r["n_boiler_lines"], r["boiler_line_ppm"])
        for r in line_dedup_stats(df, min_docs=3).collect()
    }
    # COOKIE NOTICE: docs {1,2,3} -> boiler; footer: docs {1,2,4} -> boiler
    assert got[1] == (3, 2, 666666)
    assert got[2] == (3, 2, 666666)
    assert got[3] == (3, 2, 666666)  # both COOKIE occurrences flagged
    assert got[4] == (2, 1, 500000)


def test_quantize_int8_properties(spark):
    from seatunnel_spark.operators.similarity import quantize_int8, quantized_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 2.0, 0.0, 0.0]),
        (2, [1.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),   # all-zero -> zero codes, no div-by-0
        (4, [0.5, -0.25, 0.125, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = {r["vec_id"]: (r["codes"], r["scale"]) for r in quantize_int8(df).collect()}
    assert q[0][0] == [127, 0, 0, 0]
    assert q[3][0] == [0, 0, 0, 0] and q[3][1] == 0.0
    assert all(-127 <= c <= 127 for codes, _ in q.values() for c in codes)
    # de-quantization error is bounded by half a quantization step
    scale = q[4][1]
    for c, v in zip(q[4][0], rows[4][1]):
        assert abs(c * scale - v) <= scale / 2 + 1e-12

    # quantized cosine agrees with exact cosine on these vectors: the
    # orthogonal/parallel structure survives quantization unchanged
    top = quantized_topk(df, df.where(F.col("vec_id") == 0), k=2).collect()
    got = [(r["vec_id"], r["qcos_sim"], r["rank"]) for r in top]
    assert got[0][0] == 2 and abs(got[0][1] - 0.70711) < 1e-5  # 1/sqrt(2)
    assert got[0][2] == 1


def test_token_rarity(spark):
    """Integral unigram rarity: corpus of 10 tokens -> 'the' (5x) = 500000
    ppm, hapaxes = 100000 ppm each; doc means are exact integral division."""
    from seatunnel_spark.operators.text import token_rarity

    rows = [
        (1, "the the the apple"),   # the x3, apple x1
        (2, "the the banana"),      # the x2, banana
        (3, "cherry date egg"),     # three hapaxes
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["mean_tf_ppm"], r["min_tf_ppm"], r["n_hapax"]
        )
        for r in token_rarity(df).collect()
    }
    # total tokens = 10; tf: the=5, others=1 -> fppm: 500000 / 100000
    assert got[1] == (4, (3 * 500000 + 100000) // 4, 100000, 1)
    assert got[2] == (3, (2 * 500000 + 100000) // 3, 100000, 1)
    assert got[3] == (3, 100000, 100000, 3)


def test_repeated_spans(spark):
    """Two docs sharing a verbatim 60-char license header: the header's
    spans are corpus-repeated; the distinct bodies are not. A short doc
    (< window) contributes its whole text as one span."""
    from seatunnel_spark.operators.text import repeated_spans

    header = "x" * 60
    rows = [
        (1, header + " unique body alpha " + "a" * 40),
        (2, header + " unique body beta  " + "b" * 40),
        (3, "tiny"),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_spans"], r["n_repeated_spans"])
        for r in repeated_spans(df, window=40, stride=10, min_docs=2).collect()
    }
    # spans fully inside the shared 60-char header (starts 1 and 11) repeat
    assert got[1][1] >= 2 and got[2][1] >= 2
    assert got[1][1] < got[1][0]        # the distinct tails don't repeat
    assert got[3] == (1, 1) and got[4] == (1, 1)  # whole-text span shared


def test_uneven_chunk_splits_gap_heavy_keys(spark):
    """S3: boundaries every chunk_size-th DISTINCT key regardless of key
    gaps — the case the even splitter's distributionFactor guard rejects
    (AbstractJdbcSourceChunkSplitter.java:183-231)."""
    from seatunnel_spark.operators.sharding import uneven_chunk_splits

    # 10 keys with huge gaps + a duplicate row (distinct collapses it)
    keys = [1, 2, 3, 1000, 1001, 50000, 50001, 50002, 9_000_000, 9_000_001]
    df = spark.createDataFrame([(k,) for k in keys] + [(3,)], "k long")
    out = {r.chunk_id: r for r in uneven_chunk_splits(df, "k", chunk_size=4).collect()}
    assert len(out) == 3
    assert (out[0].n_rows, out[0].key_lo, out[0].key_hi) == (4, 1, 1000)
    assert (out[1].n_rows, out[1].key_lo, out[1].key_hi) == (4, 1001, 50002)
    assert (out[2].n_rows, out[2].key_lo, out[2].key_hi) == (2, 9_000_000, 9_000_001)
    import pytest as _pt
    with _pt.raises(ValueError, match="chunk_size"):
        uneven_chunk_splits(df, "k", chunk_size=0)


def test_ngram_novelty(spark):
    from seatunnel_spark.operators.text import ngram_novelty

    shared = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [
            (1, f"{shared} one two"),       # grams shared with doc 2
            (2, f"{shared} three four"),
            (3, "totally different words here entirely"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_novelty(df, n=4).collect()}
    # doc 3 shares nothing: fully novel
    assert out[3].n_shared == 0 and out[3].novelty_ppm == 1_000_000
    # docs 1 and 2 share the 'alpha beta gamma delta' 4-gram
    assert out[1].n_shared >= 1 and out[1].novelty_ppm < 1_000_000
    assert out[2].n_shared >= 1
    # short doc (< n words): whole text is one gram
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    srow = ngram_novelty(short, n=13).collect()[0]
    assert srow.n_grams == 1 and srow.novelty_ppm == 1_000_000


def test_vocab_top_tokens(spark):
    from seatunnel_spark.operators.text import vocab_top_tokens

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "b z  z")], "doc_id long, text string"
    )
    rows = vocab_top_tokens(df, top_n=3).collect()
    assert [(r.rank, r.token, r.tf) for r in rows] == [
        (1, "a", 3), (2, "b", 3), (3, "z", 2)  # tie a/b broken by string
    ]


def test_char_diversity(spark):
    from seatunnel_spark.operators.text import char_diversity

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abcdefgh"), (3, "x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_diversity(df).collect()}
    assert out[1].simpson_ppm == 1_000_000  # one char flooded
    assert out[1].top_char_ppm == 1_000_000
    assert out[2].simpson_ppm == 0          # all distinct: zero collisions
    assert out[2].distinct_chars == 8
    assert out[3].simpson_ppm == 1_000_000  # single-char doc, defined case
    # exact rational: 'aab' -> collisions 2*1=2 over 3*2=6 -> 333333
    one = spark.createDataFrame([(4, "aab")], "doc_id long, text string")
    assert char_diversity(one).collect()[0].simpson_ppm == 333_333


def test_stratified_sample(spark):
    from seatunnel_spark.operators.curation import stratified_sample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", n_per_stratum=5).collect()
    by = {}
    for r in out:
        by.setdefault(r.source, []).append(r)
    assert len(by["big"]) == 5 and len(by["small"]) == 3  # min(n, |stratum|)
    assert sorted(r.sample_rank for r in by["big"]) == [1, 2, 3, 4, 5]
    # deterministic across runs
    again = stratified_sample(df, "source", n_per_stratum=5).collect()
    assert sorted((r.doc_id, r.sample_rank) for r in out) == \
           sorted((r.doc_id, r.sample_rank) for r in again)


def test_late_events_two_phase_matches_sequential_window(spark):
    """The distributed prefix-max (chunk maxima -> cross-chunk fence ->
    in-chunk window) must equal the naive single sequential window for
    every chunking, including spans that split mid-run and span=huge
    (single chunk)."""
    import datetime as dt

    from pyspark.sql import Window

    from seatunnel_spark.operators.lateness import late_events

    base = dt.datetime(2024, 1, 1)
    # arrival order 0..N with deliberately late event times sprinkled in
    rows = []
    t = 0
    for i in range(200):
        t += (i * 7) % 13  # advancing, uneven
        ts = base + dt.timedelta(seconds=t - (5000 if i % 17 == 0 and i > 0 else 0))
        rows.append((i, ts))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = df.select(
        "event_id",
        F.max(us).over(w).alias("wm"),
        us.alias("_us"),
    ).select(
        "event_id",
        F.when(F.col("wm").isNull(), F.lit(False))
        .otherwise(F.col("_us") < F.col("wm") - 3600 * 1_000_000)
        .alias("is_late"),
    )
    expect = {r["event_id"]: r["is_late"] for r in naive.collect()}
    assert any(expect.values()) and not all(expect.values())

    for span in (7, 64, 10_000):
        got = {
            r["event_id"]: r["is_late"]
            for r in late_events(df, "event_id", "ts", 3600, span).collect()
        }
        assert got == expect, f"span={span}"


def test_bigram_surprise_matches_python_replay(spark):
    """Integer surprise bits agree with an independent pure-Python replay
    of the same quantization (len(bin(prefix+1)) - len(bin(bigram+1)))."""
    from collections import Counter

    from seatunnel_spark.operators.text import bigram_surprise

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "colorless green ideas sleep furiously"),
        (4, "one"),  # single word -> one unigram 'bigram'
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def grams(s):
        ws = s.lower().split()
        return [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)] or [ws[0]]

    bg = Counter(g for _, s in docs for g in grams(s))
    pf = Counter()
    for g, c in bg.items():
        pf[g.split(" ")[0]] += c
    expect = {}
    for d, s in docs:
        bits = [
            len(bin(pf[g.split(" ")[0]] + 1)[2:]) - len(bin(bg[g] + 1)[2:])
            for g in grams(s)
        ]
        expect[d] = (len(bits), sum(bits), (sum(bits) * 100) // len(bits))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_bits"], r["mean_centibits"])
        for r in bigram_surprise(df).collect()
    }
    assert got == expect


def test_range_search_is_threshold_filter_of_exact_scores(spark):
    from seatunnel_spark.operators.similarity import brute_force_topk, range_search

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.5, 0.5, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") == 0)
    got = {(r["query_id"], r["vec_id"]) for r in range_search(df, q, 0.7).collect()}
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(df, q, k=10).collect()
        if r["cos_sim"] >= 0.7
    }
    assert got == exact and (0, 1) in got and (0, 4) not in got


def test_lww_reduce_broadcast_winners_parity(spark):
    """broadcast_winners moves the LWW filter map-side; results (including
    deterministic tie-breaks and byte-dup collapse) must be identical to
    the shuffled semi-join path, with and without bucket pre-partitioning."""
    rows = [
        ("k1", 1, "a"), ("k1", 3, "c"), ("k1", 2, "b"),
        ("k2", 5, "x"), ("k2", 5, "y"),        # tie on order -> hash break
        ("k3", 7, "z"), ("k3", 7, "z"),        # byte-identical duplicates
    ]
    df = spark.createDataFrame(rows, "k string, seq long, content string")
    for bp in (None, 4):
        a = sorted(
            lww_reduce(df, ["k"], "seq", strategy="semi_join",
                       bucket_partitions=bp).collect()
        )
        b = sorted(
            lww_reduce(df, ["k"], "seq", strategy="semi_join",
                       bucket_partitions=bp, broadcast_winners=True).collect()
        )
        assert a == b
        assert len(b) == 3 and {r["k"] for r in b} == {"k1", "k2", "k3"}


def test_lww_reduce_unique_order_parity(spark):
    """unique_order drops the tie-break tag and the post-join dedup (legal
    only when order values are unique, the native log's contract). On such
    input every path — default semi-join, unique_order shuffled, unique_order
    broadcast, with/without bucket pre-partitioning — must return identical
    rows."""
    rows = [
        ("k1", 1, "a"), ("k1", 3, "c"), ("k1", 2, "b"),
        ("k2", 5, "x"), ("k2", 6, "y"),
        ("k3", 7, "z"),
    ]
    df = spark.createDataFrame(rows, "k string, seq long, content string")
    expect = sorted(lww_reduce(df, ["k"], "seq", strategy="semi_join").collect())
    for bp in (None, 4):
        for bw in (False, True):
            got = sorted(
                lww_reduce(df, ["k"], "seq", strategy="semi_join",
                           bucket_partitions=bp, broadcast_winners=bw,
                           unique_order=True).collect()
            )
            assert got == expect, (bp, bw)
    assert len(expect) == 3 and {r["content"] for r in expect} == {"c", "y", "z"}
