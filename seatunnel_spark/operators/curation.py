"""Training-data curation operators: decontamination, sequence packing,
domain mixing — the steps between "deduped corpus" and "training batches".

All deterministic (md5-derived hashes, integer-space arithmetic) so every
operator has a bit-exact DuckDB oracle, and all shuffle-conscious:

- decontaminate: benchmark n-gram overlap removal (the GPT-3 appendix-C /
  Llama eval-contamination rule: drop or flag training docs sharing long
  n-grams with an evaluation set). The benchmark side is tiny → broadcast;
  the corpus side aggregates per doc BEFORE the shuffle (partial agg on
  doc_id reduces each doc's grams to one row in-partition), so the shuffle
  carries (doc_id, count), never text.
- pack_sequences: greedy first-fit packing of documents into fixed
  token-budget bins (sequence packing for training efficiency) — an
  order-dependent sequential fold, i.e. exactly the per-key
  ``applyInPandas`` shape; parallel across groups (source), salting
  unnecessary because bins are per-group by construction.
- domain_mix_sample: temperature-based source re-weighting (the multinomial
  mixture rule from GPT-3/Gopher data recipes, alpha=0.5 → sqrt scaling):
  per-source keep thresholds computed in INTEGER space (floor(sqrt(c)*1000)
  — IEEE sqrt is correctly rounded, hence bit-identical across engines; all
  later arithmetic is int64), selection by deterministic md5 coin per doc.
  Thresholds are a per-source broadcast; the corpus pass is a map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from seatunnel_spark.operators.dedup_docs import _h48


def _words(col: str) -> F.Column:
    return F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")


def _ngrams(col: str, n: int) -> F.Column:
    """n-word grams as array<string> (same normalization as the dedup
    shingles; dedup_docs._shingles is the n=3 case)."""
    words = _words(col)
    cnt = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), cnt)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Flag training documents that share any n-gram with the benchmark
    (evaluation) corpus. Returns every doc: (doc_id, n_overlap,
    contaminated).

    The benchmark's distinct n-gram hashes are the broadcast side (eval
    suites are ~10^4-10^6 grams — kilobytes to megabytes); corpus docs
    explode to distinct grams, inner-join the broadcast set, and re-aggregate
    on doc_id (map-side combinable: a doc's grams never leave its partition
    before the partial count). 48-bit hashes keep the shuffle rows tiny and
    the oracle exact; at 10^9+ benchmark grams widen to the full md5."""
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(_ngrams(col, n))).alias("g")
        )
        .select(_h48(F.col("g"), "contam").alias("gh"))
        .distinct()
    )
    from seatunnel_spark.operators.spread import spread_small_input

    doc_grams = spread_small_input(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngrams(col, n))).alias("g"),
    ).select(id_col, _h48(F.col("g"), "contam").alias("gh"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Greedy first-fit sequence packing: within each group (source),
    documents in id order accumulate into bins of at most ``budget``
    whitespace tokens; a doc that would overflow starts the next bin (a doc
    alone larger than the budget still gets its own bin). Returns
    (doc_id, source, n_tokens, bin_id) with bin_id 0-based per group.

    The fold is inherently sequential WITHIN a group (bin state carries
    forward), so it runs as Arrow-batched ``applyInPandas`` per group —
    parallel across groups, which is the real parallelism axis (a corpus
    has many sources/shards; packing order inside one shard is the
    contract). Only (id, token-count) reach Python — never the text."""
    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(group_col).cast("string").alias("source"),
        F.size(_words(col)).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, acc, b = [], 0, 0
        for t in pdf["n_tokens"]:
            if acc > 0 and acc + t > budget:
                b += 1
                acc = 0
            bins.append(b)
            acc += t
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_tokens": pdf["n_tokens"],
                "bin_id": pd.Series(bins, dtype="int64"),
            }
        )

    return slim.groupBy("source").applyInPandas(pack, _PACK_SCHEMA)


def pack_stats(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Packing-efficiency report over ``pack_sequences``: per group the bin
    count, doc count, total tokens, and mean fill in ppm of the budget
    (floor(total_tokens * 10^6 / (n_bins * budget)), computed with the
    same decimal(38,0) + integral-div discipline as the mixing thresholds
    — token totals at corpus scale exceed int64 once multiplied by 10^6).
    Fill can exceed 10^6 ppm when oversized single docs get their own
    bins. One tiny aggregate over the packer's output — the report a
    training pipeline uses to size its sequence budget."""
    packed = pack_sequences(docs, budget, group_col, id_col, col)
    dec = "decimal(38,0)"
    agg = packed.groupBy("source").agg(
        (F.max("bin_id") + 1).cast("bigint").alias("n_bins"),
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
    )
    return agg.select(
        "source", "n_bins", "n_docs", "total_tokens", "max_doc_tokens",
        F.expr(
            f"CAST((CAST(total_tokens AS {dec}) * 1000000) div "
            f"(CAST(n_bins AS {dec}) * {int(budget)}) AS BIGINT)"
        ).alias("fill_ppm"),
    )


def domain_mix_thresholds(
    docs: DataFrame,
    target_frac_ppm: int = 500_000,
    group_col: str = "source",
) -> DataFrame:
    """Per-source keep thresholds for sqrt-temperature mixing (alpha=0.5),
    entirely in integer space: weight w = floor(sqrt(count)*1000) (IEEE
    sqrt: bit-identical on any engine), target rows N = floor(total *
    target_frac_ppm / 10^6), keep-per-million = min(10^6,
    floor(w*N*10^6 / (sum(w)*count))). Returns (source, n_docs,
    keep_ppm) — a tiny table, broadcast by the sampler."""
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    return thresholds_from_counts(counts, target_frac_ppm, group_col)


def thresholds_from_counts(
    counts: DataFrame,
    target_frac_ppm: int = 500_000,
    group_col: str = "source",
) -> DataFrame:
    """Threshold arithmetic over a pre-computed (group, n_docs) table —
    split out so the overflow-safety of the math is testable at fabricated
    web-corpus scales (10^9-10^12 docs) without materializing rows."""
    w = F.floor(F.sqrt(F.col("n_docs")) * 1000).cast("bigint")
    tot = counts.select(
        F.sum("n_docs").alias("_tot"), F.sum(w).alias("_wsum")
    )
    # w*N*10^6 reaches ~10^27 on a 10^12-doc corpus — far past int64 (it
    # overflows around 7M docs, silently wrapping keep_ppm negative with
    # ANSI off). Widen to decimal(38,0) and use the integral `div` operator
    # throughout: exact truncating division, no float/decimal rounding at
    # quotient boundaries (n_target via double `/` would already lose
    # exactness past 2^53). The DuckDB oracle mirrors this with HUGEINT
    # `//`. decimal(38,0) holds 10^38: headroom to ~10^17 docs.
    dec = "decimal(38,0)"
    n_target = F.expr(
        f"(CAST(_tot AS {dec}) * {target_frac_ppm}) div 1000000"
    ).cast(dec)
    num = (w.cast(dec) * n_target * F.lit(1_000_000).cast(dec)).alias("_num")
    den = (F.col("_wsum").cast(dec) * F.col("n_docs").cast(dec)).alias("_den")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(F.col(group_col), F.col("n_docs"), num, den)
        .select(
            group_col,
            "n_docs",
            F.least(
                F.lit(1_000_000).cast("bigint"),
                F.expr("CAST(_num div _den AS BIGINT)"),
            ).alias("keep_ppm"),
        )
    )


def domain_mix_sample(
    docs: DataFrame,
    target_frac_ppm: int = 500_000,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-resampled corpus: keep a doc iff its md5
    coin (h48 mod 10^6) falls under its source's keep_ppm threshold. Small
    sources are up-weighted relative to their share, large ones capped —
    the sqrt mixture every LLM data recipe uses. One broadcast join + a
    map-side filter over the corpus: zero corpus shuffle."""
    th = domain_mix_thresholds(docs, target_frac_ppm, group_col)
    coin = F.pmod(_h48(F.col(id_col).cast("string"), "mix"), F.lit(1_000_000))
    return (
        docs.join(F.broadcast(th), group_col)
        .where(coin < F.col("keep_ppm"))
        .select(id_col, group_col, "keep_ppm")
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    col: str = "text",
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy benchmark decontamination: MinHash-LSH candidate generation
    between the corpus and a benchmark set, verified by exact shingle
    Jaccard — catches paraphrased / lightly-edited benchmark leakage the
    exact-13-gram rule (``decontaminate_ids``) misses. Returns
    ``(doc_id, bench_id, jaccard)`` for every corpus doc whose Jaccard with
    a benchmark doc reaches ``threshold``.

    100 TB shape: the benchmark side is tiny — its band table AND its
    shingle sets broadcast; the corpus NEVER self-joins, so no bucket cap
    is needed (per-bucket cost is corpus-matches x bench-bucket-size,
    linear in corpus size). The corpus contributes one signature pass (the
    same md5 family as the dedup spine — shared if both run) and its only
    shuffle carries (doc_id, band, bh) digests."""
    from seatunnel_spark.operators.dedup_docs import (
        _shingles,
        band_hashes,
        minhash_signatures,
    )

    bband = band_hashes(
        minhash_signatures(bench, bench_id_col, col, k), bench_id_col, k, bands
    )
    cband = band_hashes(
        minhash_signatures(corpus, id_col, col, k), id_col, k, bands
    )
    cand = (
        cband.join(F.broadcast(bband), ["band", "bh"])
        .select(id_col, bench_id_col)
        .distinct()
    )
    csh = corpus.select(id_col, F.array_distinct(_shingles(col)).alias("cs"))
    bsh = bench.select(
        bench_id_col, F.array_distinct(_shingles(col)).alias("bs")
    )
    inter = F.size(F.array_intersect("cs", "bs"))
    j = inter / (F.size("cs") + F.size("bs") - inter)
    return (
        cand.join(csh, id_col)
        .join(F.broadcast(bsh), bench_id_col)
        .select(id_col, bench_id_col, j.alias("_j"))
        .where(F.col("_j") >= threshold)
        .select(id_col, bench_id_col, F.round("_j", 6).alias("jaccard"))
    )


def leakage_free_split(
    docs: DataFrame,
    clusters: DataFrame,
    train_ppm: int = 950_000,
    val_ppm: int = 975_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test assignment with ZERO near-dup leakage across splits.

    Naive doc-hash splits put paraphrase-grade duplicates of training
    documents into the eval split — the classic silent-contamination bug
    in LLM data pipelines. Here the split key is the document's near-dup
    CLUSTER representative (``clusters`` = dup_clusters output: doc_id,
    cluster_id; singletons may be absent and key on themselves), so every
    member of a cluster lands in the same split by construction.

    Buckets are the deterministic 48-bit md5 hash of the key mod 1e6
    (exact integer ppm space — bit-exact on any engine): < train_ppm →
    train, < val_ppm → val, else test.

    Scale shape: one broadcast-size left join against the cluster map
    (near-dup clusters are a tiny fraction of the corpus) and a pure
    expression — no extra shuffle beyond what cluster resolution already
    paid."""
    rep = (
        docs.select(id_col)
        .join(clusters.select(id_col, "cluster_id"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("split_key"),
        )
    )
    ppm = _h48(F.col("split_key").cast("string"), "split") % 1_000_000
    return rep.select(
        id_col,
        "split_key",
        ppm.alias("split_ppm"),
        F.when(ppm < train_ppm, "train")
        .when(ppm < val_ppm, "val")
        .otherwise("test")
        .alias("split"),
    )


def clean_funnel_report(
    docs: DataFrame,
    rep_stats: DataFrame,
    non_canonical: DataFrame,
    min_chars: int = 150,
    min_words: int = 30,
    max_dup_word_frac: float = 0.6,
    max_top_word_frac: float = 0.12,
    id_col: str = "doc_id",
) -> DataFrame:
    """Auditable funnel for the corpus_clean recipe: every document is
    attributed to its FIRST failing gate (the order below — fixed, so the
    report is deterministic), giving per-gate drop counts plus the
    survivor count. A cleaning pipeline that can't say WHERE documents
    went is untrustworthy at 100 TB; this is the lineage view.

    Gate order: short_chars → few_words → dup_word_frac → top_word_frac
    → near_dup → kept. One narrow join per input, one CASE expression,
    one k-row aggregation — no work beyond what corpus_clean already
    does."""
    nd = non_canonical.select(id_col).withColumn("_nd", F.lit(True))
    joined = docs.join(rep_stats, id_col).join(nd, id_col, "left")
    stage = (
        F.when(F.col("n_chars") < min_chars, "short_chars")
        .when(F.col("n_words") < min_words, "few_words")
        .when(F.col("dup_word_frac") > max_dup_word_frac, "dup_word_frac")
        .when(F.col("top_word_frac") > max_top_word_frac, "top_word_frac")
        .when(F.col("_nd"), "near_dup")
        .otherwise("kept")
    )
    return (
        joined.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str = "source",
    n_per_stratum: int = 50,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sample: exactly ``min(n, |stratum|)`` docs
    per stratum, chosen by md5 rank — the eval-set / human-review draw
    every corpus pipeline needs (uniform random sampling over-represents
    big domains; a seeded-rng sample isn't replayable across engines).
    The md5 of (salt, doc id) is a uniform deterministic permutation, so
    the draw is unbiased within each stratum and bit-reproducible
    anywhere md5 exists. Returns (doc_id, <strata_col>, sample_rank).

    100 TB shape: one shuffle keyed by stratum; the rank-k window sorts
    each stratum's (id, digest) pairs only — no payload columns travel.
    For pathological single-stratum corpora, pre-gate with a per-stratum
    count and hash-threshold filter (keep ~2n by digest range, then
    window the survivors) — the same two-phase trick sharding uses."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(key, id_col)
    return (
        df.select(id_col, strata_col)
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("sample_rank") <= int(n_per_stratum))
    )


def dsir_scores(
    df: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style importance scores (Data Selection via Importance
    Resampling, arXiv:2302.03169): rank raw-corpus documents by how much
    their hashed-ngram distribution resembles a TARGET corpus — the
    quality-domain selection step (e.g. "books+wiki-like") of an LLM data
    pipeline. Features are word unigrams + bigrams hashed into
    ``n_buckets`` (the paper's hashed generative bag model); each bucket
    gets a log-ratio weight between the add-one-smoothed target and raw
    counts, and a document's score is the feature-weighted sum — its
    unnormalized log importance weight. Returns (doc_id, n_feats, score);
    select by (score desc) or score-per-feature as the recipe dictates.

    Cross-engine determinism: the paper's ln() is NOT correctly-rounded
    IEEE (engines may differ in the last ulp, breaking bit-exact oracles),
    so the log-ratio is quantized to INTEGER log2 magnitudes —
    length(bin(c+1)) is floor(log2(c+1))+1, exact string arithmetic in
    any engine. A power-of-two-coarse importance weight changes ranking
    only within ~2x likelihood bands, which the paper's own resampling
    noise dwarfs; swap the lr expression for ln() when bit-exact replay
    isn't required.

    100 TB shape: the bucket model tables are ``n_buckets``-bounded (the
    target side is usually tiny anyway) and BROADCAST into the per-doc
    score join; document features shuffle once as (48-bit digest % B)
    bucket ids with counts (map-side combinable), never text. One corpus
    aggregate for the raw model, one for the target, one per-doc rollup."""
    from seatunnel_spark.operators.dedup_docs import _h48
    from seatunnel_spark.operators.spread import spread_small_input

    def feats(d: DataFrame, with_id: bool):
        grams = F.concat(_ngrams(col, 1), _ngrams(col, 2))
        cols = ([F.col(id_col)] if with_id else []) + [
            F.explode(grams).alias("g")
        ]
        e = spread_small_input(d).select(*cols)
        b = F.pmod(_h48(F.col("g"), salt), F.lit(n_buckets)).alias("bucket")
        if with_id:
            return e.select(id_col, b).groupBy(id_col, "bucket").agg(
                F.count(F.lit(1)).cast("bigint").alias("c")
            )
        return e.select(b).groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )

    raw_model = feats(df, False).withColumnRenamed("c", "rc")
    tgt_model = feats(target, False).withColumnRenamed("c", "tc")
    # every doc feature lands in a raw-model bucket by construction, so the
    # raw side anchors the join; absent target buckets smooth to tc=0
    lr = raw_model.join(tgt_model, "bucket", "left").select(
        "bucket",
        (
            F.length(F.bin(F.coalesce(F.col("tc"), F.lit(0)) + 1))
            - F.length(F.bin(F.col("rc") + 1))
        ).cast("bigint").alias("lr"),
    )
    doc_feats = feats(df, True)
    return (
        doc_feats.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_feats"),
            F.sum(F.col("c") * F.col("lr")).cast("bigint").alias("score"),
        )
    )
