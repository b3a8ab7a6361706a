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

An IVF variant (k-means coarse quantizer) is the next step noted here; LSH
was chosen first because it is stateless/deterministic — no trained model to
persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
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
    df: DataFrame, dim: int, planes: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Random-hyperplane signature: one bit per plane = sign(v · h_p)."""
    bits = []
    for p in range(planes):
        h = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bits.append(F.when(_dot(F.col(vec_col), h) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn("lsh_sig", sig.cast("int"))


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    planes: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: bucket by full signature, verify cosine
    within buckets only. Returns (vec_a, vec_b, cos_sim)."""
    sigs = lsh_signature(df, dim, planes, vec_col).select(id_col, vec_col, "lsh_sig")
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
