"""Deduplication suite for training-data pipelines over `documents`.

Five dedup families, all deterministic (md5-keyed hash functions so the
DuckDB oracle reproduces them exactly), all shuffle-conscious:

- exact: hash-groupBy on a content fingerprint. One shuffle on a 32-char
  key; at 100 TB do it on the md5, never on the raw text (tiny shuffle rows).
- minhash + LSH: word-shingles → k minhashes → b bands → candidate pairs by
  band-bucket join. The join is on (band_idx, band_hash); bucket sizes are
  capped (``max_bucket``) so a duplicate-heavy cluster can never emit N²
  pairs — oversized buckets are exact-dup clusters routed through
  ``exact_dedup`` instead.
- simhash: 64-bit sign-aggregated token hashes; near-dups share the value or
  differ in few bits (banded by 16-bit quarters for candidate generation).
- n-gram Jaccard: exact verify step for LSH candidates (intersection over
  union of shingle sets, computed only on candidate pairs).
- embedding cosine near-dup: see similarity.py (shares the dot-product
  kernel).

Scale note: every self-join here is LSH-bucketed — candidates only — which is
what makes near-dedup feasible at 10^9 docs; the verify step touches only the
candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_WORDS = 3


def _shingles(col: str = "text"):
    """3-word shingles as an array<string> (lowercased, ws-normalized)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
    n = F.greatest(F.size(words) - F.lit(SHINGLE_WORDS - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, SHINGLE_WORDS))
    )


def _h48(col, salt):
    """Deterministic 48-bit hash: md5 prefix → bigint (DuckDB-reproducible)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col)), 1, 12), 16, 10).cast(
        "bigint"
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Exact duplicate groups: fingerprint → groupBy, keep min id as canonical.
    Returns (doc_id, canonical_id, group_size)."""
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))
    with_fp = _spread_small_input(df).select(F.col(id_col), fp.alias("fp"))
    groups = with_fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        with_fp.join(groups, "fp")
        .select(id_col, "canonical_id", "group_size")
    )


from seatunnel_spark.operators.spread import spread_small_input as _spread_small_input  # noqa: E402


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", col: str = "text", k: int = 16
) -> DataFrame:
    """k-permutation MinHash signature as array<bigint> of length k.

    ONE pass over the shingle array: each shingle yields its k salted hashes
    (``transform`` → inner array), then a single ``aggregate`` folds an
    elementwise ``least`` — the shingle array is built once instead of once
    per hash function (the k-separate-``array_min`` form re-evaluated the
    shingling k times: measured ~16x the work at k=16). Values are
    identical — same md5 family, same min — so the DuckDB oracle is
    unchanged."""
    df = _spread_small_input(df)
    sh = _shingles(col)
    # NB: single-arity lambdas only — a (x, i) lambda makes Spark pass the
    # element index as the second arg, which would silently replace the salt.
    per_shingle = F.transform(sh, lambda s: F.array(*[_h48(s, i) for i in range(k)]))
    init = F.array_repeat(F.lit(1 << 62).cast("bigint"), k)
    sig = F.aggregate(
        per_shingle, init, lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b))
    )
    return df.select(F.col(id_col), sig.alias("minhash"))


def band_hashes(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH band hashes from a minhash-signature table: (id, band, bh) with
    bh = md5 over the band's signature slice — the band family shared by
    the batch pair generator and the streaming near-dup store (identical
    hashes, so stream-time and compaction-time dedup agree on collisions)."""
    r = k // bands
    return sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(",", *[F.col("minhash")[b * r + j].cast("string") for j in range(r)])
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = 64,
    min_band_matches: int = 1,
    pair_policy: str = "all",
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs sharing any band bucket.
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    ``min_band_matches`` > 1 is the candidate-pair pregate: keep only pairs
    colliding in at least that many bands. One shared band out of b=4
    (r=4-row bands) admits pairs with Jaccard well below any verify
    threshold; requiring 2 sharply cuts the pair list BEFORE the expensive
    exact-Jaccard verify (array_intersect over full shingle sets — the
    dominant per-pair cost at scale) while keeping true near-dups, which
    collide in most bands. The count runs on the same shuffle the distinct
    already needed, so the pregate is free.

    ``pair_policy="star"`` is the CLUSTERING-bound pair generator: each
    band bucket emits only (bucket-min doc, member) edges — n-1 per
    bucket instead of C(n,2) — which preserves exactly the bucket's
    connectivity for connected components while cutting the verify load
    ~n/2-fold on duplicate-heavy corpora (the adversarial case the caps
    exist for). Trade-off vs "all": a star edge the Jaccard verify
    rejects is not rescued by member-member edges of the same bucket, so
    chain-shaped near-dup sets whose hub is dissimilar may split — at
    clustering thresholds LSH buckets are cliques and this is the
    standard recall/cost trade every production dedup makes. Use "all"
    when the pair LIST itself is the product.

    ``max_bucket`` caps band-bucket size before the self-join: a bucket of N
    docs emits N² pairs, and on a duplicate-heavy corpus (the exact case
    dedup exists for) one cluster of 10^6 identical docs would emit 10^12
    rows. Buckets above the cap are skipped — identical docs all share ALL
    band buckets, so oversized buckets are exact-dup clusters that
    ``exact_dedup`` collapses in O(N) instead; run it first and feed only
    canonical representatives here (the reference guards its chunk splitter
    against the same skew, JdbcSourceOptions.java:102-138). The cap makes
    the pair count O(buckets × cap²) by construction."""
    # Materialize signatures ONCE (id + k bigints — tiny): every band-hash
    # below accesses minhash[i], and Catalyst's projection collapse +
    # extract-value simplification would inline the full shingle+minhash
    # expression tree into each of the k accesses (and again into every
    # downstream reference: bucket histogram, leftsemi, both join sides) —
    # measured as a ~50x recomputation of the text-processing work. On a
    # cluster needing executor-failure tolerance use checkpoint() instead.
    sigs = minhash_signatures(df, id_col, col, k).localCheckpoint(eager=True)
    band_rows = band_hashes(sigs, id_col, k, bands)
    if pair_policy == "star":
        # ONE bucket aggregate carries both the size cap and the hub: the
        # cap drops whole buckets, so min(id) over a surviving bucket is
        # the same whether computed before or after the filter — the
        # previous cap-leftsemi + separate hub agg + join shape paid two
        # aggregation exchanges and two joins for the same pair list.
        stats = band_rows.groupBy("band", "bh").agg(
            F.count("*").alias("_bn"), F.min(id_col).alias("_hub")
        )
        if max_bucket is not None:
            stats = stats.where(F.col("_bn") <= max_bucket)
        hits = (
            band_rows.join(stats, ["band", "bh"])
            .where(F.col(id_col) != F.col("_hub"))
            .select(F.col("_hub").alias("doc_a"), F.col(id_col).alias("doc_b"))
        )
        if min_band_matches <= 1:
            return hits.distinct()
        return (
            hits.groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("_nb"))
            .where(F.col("_nb") >= min_band_matches)
            .select("doc_a", "doc_b")
        )
    if max_bucket is not None:
        small = (
            band_rows.groupBy("band", "bh")
            .agg(F.count("*").alias("_bn"))
            .where(F.col("_bn") <= max_bucket)
        )
        band_rows = band_rows.join(small, ["band", "bh"], "leftsemi")
    if pair_policy == "all":
        left = band_rows.alias("l")
        right = band_rows.alias("r")
        hits = left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        ).select(
            F.col(f"l.{id_col}").alias("doc_a"), F.col(f"r.{id_col}").alias("doc_b")
        )
    else:
        raise ValueError(f"unknown pair_policy {pair_policy!r}; use 'all' or 'star'")
    if min_band_matches <= 1:
        return hits.distinct()
    # a (pair, band) collision is unique per band, so count(*) == number of
    # shared bands; the aggregate shuffles exactly what distinct() would
    return (
        hits.groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_nb"))
        .where(F.col("_nb") >= min_band_matches)
        .select("doc_a", "doc_b")
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Exact Jaccard over shingle sets, computed ONLY on candidate pairs
    (the LSH verify step). Returns (doc_a, doc_b, jaccard).

    The shingle build is the dominant map cost and runs once per join side,
    so the input is spread first — on the single-file local corpus the
    un-spread form serialized ~2x the whole corpus' shingling onto one
    core (measured 6.2s of corpus_clean's 5.5s wall at sf0.1)."""
    sh = _spread_small_input(df).select(
        F.col(id_col), F.array_distinct(_shingles(col)).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        pairs.join(a, pairs["doc_a"] == F.col(f"a.{id_col}"))
        .join(b, pairs["doc_b"] == F.col(f"b.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("jaccard"),
        )
    )


def simhash(df: DataFrame, id_col: str = "doc_id", col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash over word tokens: sign-sum of per-token hash bits → one
    integer fingerprint. Near-dups have small Hamming distance.

    Implemented as a pure expression: for each bit position, count tokens
    whose hash has that bit set vs total, majority vote sets the bit.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
    hashes = F.transform(words, lambda w: _h48(w, "simhash"))
    n = F.size(hashes)

    def bit_test(mask):
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    bit_exprs = []
    for b in range(bits):
        ones = F.size(F.filter(hashes, bit_test(1 << b)))
        bit_exprs.append(F.when(ones * 2 > n, F.lit(1 << b)).otherwise(F.lit(0)))
    sim = bit_exprs[0]
    for e in bit_exprs[1:]:
        sim = sim + e
    return df.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Near-dup CLUSTER RESOLUTION: connected components over the candidate
    pair list → (doc_id, cluster_id, is_canonical), cluster_id = the
    smallest doc id in the component (the canonical representative a
    training-data pipeline keeps; the rest are dropped or down-weighted).

    Algorithm: iterative min-label propagation over the edge list — each
    round is one shuffle join (edges ⋈ labels) + a groupBy-min, i.e.
    O(E) per round, and rounds are bounded by the component diameter.
    Near-dup components are LSH-bucket cliques (diameter 1-2), so this
    converges in 2-3 rounds in practice; ``max_iters`` is the adversarial
    backstop. Each round ``localCheckpoint``s the label table to truncate
    the lineage chain (iterative plans otherwise grow unboundedly — the
    standard Spark iterative-algorithm discipline; on a cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
    executor-fault tolerance).

    Only documents that appear in at least one pair are returned —
    singletons are by definition their own cluster and never need
    rewriting."""
    e = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # materialize the edge list ONCE: the loop joins against it every round,
    # and without this the whole upstream candidate pipeline (LSH + verify)
    # would re-execute per iteration
    edges = edges.localCheckpoint(eager=True)
    # Right-size the loop's parallelism to the edge list: each round is a
    # join + groupBy over (src, dst, lbl) longs, and running a small edge
    # table at full session width makes per-round task overhead — not data
    # — the dominant cost (measured 11s -> ~4s at 430k edges / 32 parts).
    # ~100k edge rows per partition keeps tasks meaningful; a genuinely
    # huge pair graph still fans out to the session default.
    n_edges = edges.count()
    nparts = max(1, min(
        edges.sparkSession.sparkContext.defaultParallelism,
        n_edges // 100_000 + 1,
    ))
    # re-checkpoint in the loop layout so the repartition isn't re-executed
    # from the first checkpoint every round (the table is tiny — longs only)
    edges = edges.repartition(nparts, "dst").localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    labels = labels.repartition(nparts, "node").localCheckpoint(eager=True)
    changed = 0
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nmin"))
        )
        merged = (
            labels.join(neigh, labels["node"] == neigh["src"], "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce(F.col("nmin"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                F.col("lbl").alias("old_lbl"),
            )
        ).localCheckpoint(eager=True)
        changed = merged.where(F.col("new_lbl") != F.col("old_lbl")).count()
        labels = merged.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    if changed != 0:
        # a chain-shaped component with diameter > max_iters would otherwise
        # come back silently SPLIT (wrong canonical ids → duplicates kept
        # downstream). Loud failure; raising max_iters is the remedy — rounds
        # are bounded by component diameter, and LSH cliques need only 2-3.
        raise ValueError(
            f"dup_clusters did not converge within max_iters={max_iters} "
            f"({changed} labels still changing); raise max_iters — the pair "
            "graph has a component with diameter exceeding it"
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        (F.col("node") == F.col("lbl")).alias("is_canonical"),
    )
