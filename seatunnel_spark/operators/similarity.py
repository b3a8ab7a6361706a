"""Similarity search over an embedding column (array<float>).

Two tiers, as a 100 TB pipeline needs:
- brute-force cosine top-k: exact baseline. The dot product runs JVM-side
  via ``aggregate(zip_with(...))`` — codegen'd, no Python. Cost is
  |queries| × |corpus|; correct tool when |queries| is small (the broadcast
  side) or as the verify stage.
- LSH-bucketed (random-hyperplane signs → bucket join): the scale path.
  Candidates share a signature bucket, so the join shuffles on a uniform
  key and the quadratic blowup is bounded per bucket. Hyperplanes are
  deterministic (seeded md5 folding) so results are reproducible and
  oracle-checkable.

Third tier — IVF (inverted-file index, the FAISS IVF-Flat shape):
- ``ivf_fit`` picks a deterministic pseudo-random sample of corpus vectors
  as the coarse quantizer's centroids (md5-ordered take — k-means init
  without the iterations; centroid quality trades recall, never correctness,
  and determinism keeps the whole operator DuckDB-oracle-checkable).
- ``ivf_assign`` maps every vector to its nearest cell with the centroids
  embedded as plan literals: a pure projection, ZERO shuffle over the corpus
  — at 10^9 vectors this is the difference between a map pass and a
  corpus-wide shuffle.
- ``ivf_topk`` probes the query's top-``nprobe`` cells and scores exact
  cosine only against those cells' members (the broadcast-joined candidate
  slice), then ranks per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seatunnel_spark.operators.spread import spread_small_input


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (small);
    ranking is one window per query id. Returns (query_id, vec_id, cos_sim, rank)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = spread_small_input(corpus).select(F.col(id_col), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qv"), F.col("cv")), 8).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bits."""
    import hashlib

    vals = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane|{plane}|{d}".encode()).hexdigest()[:8], 16)
        vals.append((h / float(1 << 32)) * 2.0 - 1.0)
    return vals


def lsh_signature(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """Random-hyperplane signature: one bit per plane = sign(v · h_p).
    ``round_dp`` rounds the dot product before the sign test — keeps
    borderline values bit-stable across engines (oracle parity)."""
    bits = []
    for p in range(planes):
        h = F.lit(_hyperplane(dim, p))  # ONE Literal node, not dim nodes
        d = _dot(F.col(vec_col), h)
        if round_dp is not None:
            d = F.round(d, round_dp)
        bits.append(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn("lsh_sig", sig.cast("int"))


def ivf_fit(
    df: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the n_centroids corpus vectors with
    the smallest md5(id) (a seeded pseudo-random sample — k-means init
    without iterations). Spark executes orderBy+limit as a map-side
    takeOrdered, so this is one O(corpus) pass collecting k tiny rows."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def _cell_ranking(
    vec, centroids: list[tuple[int, list[float]]], nprobe: int, vnorm=None
) -> F.Column:
    """Array of the nprobe nearest centroid ids for ``vec`` — a single
    codegen'd projection with the centroids as literals (no join, no
    shuffle). Ties break to the smallest centroid id: structs sort by
    (cos desc, -cid desc) == (cos desc, cid asc).

    Plan-size discipline: each centroid is ONE array Literal (not dim
    literal nodes), centroid norms are Python-precomputed constants, and
    the vector's own norm is computed once (``vnorm``) instead of once per
    centroid — Catalyst analysis cost scales with expression-node count,
    and the per-element-literal form made plan build dominate wall time.
    Arithmetic is IEEE-identical to the naive form (same dot fold order,
    same sqrt, same multiply order), so results are bit-equal."""
    import math

    if vnorm is None:
        vnorm = _norm(vec)
    scored = F.array(
        *[
            F.struct(
                F.round(
                    _dot(vec, F.lit(cvec))
                    / (vnorm * F.lit(math.sqrt(sum(x * x for x in cvec)))),
                    8,
                ).alias("cos"),
                F.lit(-cid).alias("neg_cid"),
            )
            for cid, cvec in centroids
        ]
    )
    ranked = F.slice(F.sort_array(scored, asc=False), 1, nprobe)
    return F.transform(ranked, lambda s: -s["neg_cid"])


def _centroid_table(spark, centroids: list[tuple[int, list[float]]]):
    """The coarse quantizer as ONE broadcastable row holding
    array<struct<cid,cvec,cnorm>> — the same centroids `_cell_ranking`
    embeds as literals, shipped as DATA instead. Plan size (and DataFrame
    BUILD time, which the literal form pays in py4j/analysis per centroid
    — measured 0.8-0.9s per ivf_topk call at k=8/dim=64) becomes O(1) in
    k. ``cnorm`` is Python-precomputed with the identical float fold the
    literal path used, so the scoring arithmetic below is bit-equal."""
    import math

    payload = [
        {
            "cid": int(cid),
            "cvec": [float(x) for x in cvec],
            "cnorm": math.sqrt(sum(x * x for x in cvec)),
        }
        for cid, cvec in centroids
    ]
    return spark.createDataFrame(
        [(payload,)], "cents array<struct<cid:int,cvec:array<double>,cnorm:double>>"
    )


def _cell_ranking_data(vec, nprobe: int, vnorm) -> F.Column:
    """`_cell_ranking` over the broadcast ``cents`` column instead of
    literals: same struct sort keys (cos desc 8dp, neg_cid desc == cid
    asc), same dot fold order, same sqrt/multiply order — bit-equal
    assignments, O(1) expression nodes in k."""
    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            F.round(_dot(vec, c["cvec"]) / (vnorm * c["cnorm"]), 8).alias("cos"),
            (-c["cid"]).alias("neg_cid"),
        ),
    )
    ranked = F.slice(F.sort_array(scored, asc=False), 1, nprobe)
    return F.transform(ranked, lambda s: -s["neg_cid"])


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-cell assignment as a pure map — the centroids ride as one
    broadcast row (no shuffle, no per-vector join fan-out)."""
    cdf = _centroid_table(df.sparkSession, centroids)
    return (
        df.crossJoin(F.broadcast(cdf))
        .withColumn(
            "cell", F.element_at(_cell_ranking_data(F.col(vec_col), 1, _norm(F.col(vec_col))), 1)
        )
        .drop("cents")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat search: probe each query's top-``nprobe`` cells, exact cosine
    only within those cells. Corpus side stays map-shaped (assignment is a
    projection; the query×probe table is broadcast), so the only shuffle is
    the per-query top-k window over the candidate slice."""
    from pyspark.sql import Window

    vnorm = _norm(F.col(vec_col))
    cdf = _centroid_table(corpus.sparkSession, centroids)
    assigned = (
        spread_small_input(corpus)
        .crossJoin(F.broadcast(cdf))
        .select(
            F.col(id_col),
            F.col(vec_col).alias("cv"),
            vnorm.alias("cvn"),
            F.element_at(_cell_ranking_data(F.col(vec_col), 1, vnorm), 1).alias(
                "cell"
            ),
        )
    )
    probes = (
        queries.crossJoin(F.broadcast(cdf))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            vnorm.alias("qvn"),
            F.explode(_cell_ranking_data(F.col(vec_col), nprobe, vnorm)).alias(
                "cell"
            ),
        )
    )
    # norms ride the join as columns so the verify cosine is a single dot
    # product per candidate — same IEEE result as cosine(qv, cv)
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qvn") * F.col("cvn")), 8
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 64,
    round_dp: int | None = None,
    warn_skipped: bool = True,
) -> DataFrame:
    """Embedding near-dup pairs: bucket by full signature, verify cosine
    within buckets only. Returns (vec_a, vec_b, cos_sim).

    ``max_bucket`` caps signature-bucket size before the self-join (the same
    guard its minhash sibling has, dedup_docs.minhash_lsh_pairs): on a
    near-dup-heavy corpus — the exact case this operator exists for — a
    cluster of N near-identical embeddings shares one signature and would
    emit N²/2 pairs (10^6 dupes → 5·10^11 rows). Buckets above the cap are
    skipped: such a bucket is an (near-)exact-dup cluster that exact
    dedup collapses in O(N); run it first and feed canonical representatives
    here. The cap bounds the pair count at O(buckets × cap²) by
    construction.

    Coverage loss is never silent: with ``warn_skipped`` (default) a
    ``UserWarning`` reports how many buckets/vectors the cap dropped (one
    small aggregate action over the id+signature table — the embeddings are
    not recomputed); ``lsh_over_cap_buckets`` returns the same skipped set
    as a DataFrame for callers that route oversized buckets through exact
    dedup instead."""
    sigs = lsh_signature(df, dim, planes, vec_col, round_dp=round_dp).select(
        id_col, vec_col, "lsh_sig"
    )
    if max_bucket is not None:
        counts = sigs.groupBy("lsh_sig").agg(F.count("*").alias("_bn"))
        if warn_skipped:
            import warnings

            over = (
                counts.where(F.col("_bn") > max_bucket)
                .agg(
                    F.count("*").alias("buckets"),
                    F.coalesce(F.sum("_bn"), F.lit(0)).alias("vecs"),
                )
                .first()
            )
            if over["buckets"]:
                warnings.warn(
                    f"lsh_near_dup_pairs: max_bucket={max_bucket} skipped "
                    f"{over['buckets']} over-cap signature bucket(s) holding "
                    f"{over['vecs']} vectors — run exact dedup first or raise "
                    "max_bucket (see lsh_over_cap_buckets)",
                    stacklevel=2,
                )
        small = counts.where(F.col("_bn") <= max_bucket).select("lsh_sig")
        sigs = sigs.join(small, "lsh_sig", "leftsemi")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.lsh_sig") == F.col("b.lsh_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 8).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_over_cap_buckets(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 64,
    round_dp: int | None = None,
) -> DataFrame:
    """The buckets ``lsh_near_dup_pairs`` would SKIP under ``max_bucket``:
    (lsh_sig, bucket_size). Route these through exact dedup (a bucket this
    dense is a near-identical cluster — O(N) collapse) instead of the N²
    pairwise path; empty result means the cap dropped nothing."""
    sigs = lsh_signature(df, dim, planes, vec_col, round_dp=round_dp)
    counts = sigs.groupBy("lsh_sig").agg(F.count("*").alias("bucket_size"))
    if max_bucket is None:
        return counts.where(F.lit(False))
    return counts.where(F.col("bucket_size") > max_bucket)


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the standard memory-cut for
    corpus-scale vector search (4x smaller than float32, integer SIMD dot
    products). codes[d] = round(v[d] * 127 / max|v|); an all-zero vector
    quantizes to zeros. Returns (id, codes: array<bigint>, scale: double)
    where ``scale = max|v| / 127`` de-quantizes (v ≈ codes * scale).

    A narrow map over the scan — no shuffle, no Python; at 100 TB the
    quantized corpus is what sits in executor memory for the serving path.
    """
    v = F.col(vec_col).cast("array<double>")
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    codes = F.when(
        mx == 0, F.transform(v, lambda x: F.lit(0).cast("bigint"))
    ).otherwise(
        F.transform(v, lambda x: F.round(x * 127 / mx, 0).cast("bigint"))
    )
    return df.select(
        F.col(id_col),
        codes.alias("codes"),
        (mx / 127).alias("scale"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k over int8-quantized vectors. The per-vector scale
    cancels out of cosine, so scoring is pure integer dot products
    (exact in int64) divided by integer-normed sqrt — bit-identical on
    any IEEE engine, no float accumulation-order hazard. Same plan shape
    as brute_force_topk: quantized queries broadcast, one window per
    query id. Returns (query_id, vec_id, qcos_sim, rank)."""
    from pyspark.sql import Window

    cq = quantize_int8(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("qc")
    )
    cc = quantize_int8(spread_small_input(corpus), id_col, vec_col).select(
        F.col(id_col), F.col("codes").alias("cc")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("cc"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nq = F.aggregate(
        F.transform(F.col("qc"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nc = F.aggregate(
        F.transform(F.col("cc"), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # zero-norm vectors have no cosine: null them out (ANSI-safe), then
    # drop — a zero embedding can never be a neighbor anyway
    raw = F.when(
        (nq > 0) & (nc > 0), F.round(dot / (F.sqrt(nq) * F.sqrt(nc)), 8)
    )
    scored = (
        cc.crossJoin(F.broadcast(cq))
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, raw.alias("qcos_raw"))
        .where(F.col("qcos_raw").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos_raw").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.round("qcos_raw", 5).alias("qcos_sim"),
            "rank",
        )
    )


def range_search(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine RANGE query: every corpus vector within ``threshold`` of each
    query (the radius-neighbor companion to brute_force_topk — retrieval
    recall sweeps and near-dup audits ask "everything this similar", not
    "the k best"). Returns (query_id, vec_id, cos_sim).

    100 TB shape: identical to brute_force_topk's — the query side is
    broadcast, the corpus is scanned exactly once map-only (no shuffle at
    all: unlike top-k there is no per-query ranking state, the threshold
    is a pure filter), so it pipelines with the parquet scan and scales
    linearly with corpus bytes."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = spread_small_input(corpus).select(F.col(id_col), F.col(vec_col).alias("cv"))
    return (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(cosine(F.col("qv"), F.col("cv")), 8).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= F.lit(float(threshold)))
    )
