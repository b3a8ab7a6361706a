"""Embedding k-means trainer + SemDeDup prune (operators/clustering.py).

The oracle parity run (tools/check_oracles.py: embedding_kmeans,
semdedup_prune) proves bit-exactness vs DuckDB; these tests pin the
algorithmic semantics on hand-computable fixtures."""

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.operators.clustering import (
    derive_k,
    kmeans_quantized,
    semdedup_prune,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_two_obvious_clusters_converge(spark):
    # two tight groups on orthogonal axes: any init, one update, and the
    # second assignment pass must separate them perfectly
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [1.0, 0.05, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]), (11, [0.0, 0.0, 0.9, 0.1]),
        (12, [0.0, 0.0, 1.0, 0.05]),
    ]
    out = kmeans_quantized(_emb(spark, rows), k=2, n_iters=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    assert sorted(len(v) for v in by_cluster.values()) == [3, 3]
    groups = sorted(by_cluster.values(), key=min)
    assert groups[0] == {0, 1, 2} and groups[1] == {10, 11, 12}
    # every member sits close to its own centroid
    assert all(r.centroid_sim > 0.9 for r in out)


def test_deterministic_across_runs(spark):
    rows = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(40)]
    a = sorted((r.vec_id, r.cluster) for r in
               kmeans_quantized(_emb(spark, rows), k=4, n_iters=3).collect())
    b = sorted((r.vec_id, r.cluster) for r in
               kmeans_quantized(_emb(spark, rows), k=4, n_iters=3).collect())
    assert a == b


def test_zero_vector_goes_to_cluster_zero(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])]
    out = {r.vec_id: r for r in
           kmeans_quantized(_emb(spark, rows), k=2, n_iters=1).collect()}
    # zero-norm vector scores -2 against every centroid -> smallest cid
    assert out[2].cluster == 0
    assert out[2].centroid_sim == -2.0


def test_semdedup_prune_rule(spark):
    # 0 and 1 near-identical (same direction), 2 orthogonal: 1 is dropped
    # as a dup of the lower id 0; 0 and 2 kept
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    out = {r.vec_id: r for r in
           semdedup_prune(_emb(spark, rows), k=2, threshold=0.9).collect()}
    assert out[0].kept and out[0].dup_of is None
    assert not out[1].kept and out[1].dup_of == 0 and out[1].dup_sim > 0.9
    assert out[2].kept
    # every input id is present in the output
    assert set(out) == {0, 1, 2}


def test_prune_keeper_is_min_id(spark):
    # three mutual near-dups: 5 keeps, 7 and 9 both point at 5 (not 7)
    rows = [
        (5, [1.0, 0.0]), (7, [0.999, 0.001]), (9, [0.998, 0.002]),
    ]
    out = {r.vec_id: r for r in
           semdedup_prune(_emb(spark, rows), k=1, threshold=0.9).collect()}
    assert out[5].kept
    assert out[7].dup_of == 5 and out[9].dup_of == 5


def test_derive_k_keeps_cluster_size_bounded():
    # pure function of (n, target): oracle-replayable and scale-linear
    assert derive_k(0) == 8
    assert derive_k(500, 256) == 8      # sf0.01 — matches the static oracle
    assert derive_k(2000, 256) == 8     # sf0.1 — same k, same oracle
    assert derive_k(20000, 256) == 128  # 10x bench fixture: pair stage linear
    assert derive_k(1_000_000, 256) == 4096
    # expected cluster size stays within 2x of target at any scale
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        k = derive_k(n, 256)
        assert n / k <= 256 * 2


def test_semdedup_derived_k_matches_pinned_k(spark):
    rows = [(i, [float((i * 3 + d) % 7) for d in range(8)]) for i in range(24)]
    pinned = sorted((r.vec_id, r.kept) for r in
                    semdedup_prune(_emb(spark, rows), k=8).collect())
    derived = sorted((r.vec_id, r.kept) for r in
                     semdedup_prune(_emb(spark, rows), k=None).collect())
    assert pinned == derived  # n=24 -> derive_k floors at 8


def test_semdedup_oversized_cluster_guard(spark):
    # all vectors collinear -> k=1 puts everything in one cluster; with
    # max_cluster below that size the pair stage is skipped LOUDLY and
    # every member comes back kept
    rows = [(i, [1.0 + i * 1e-4, 0.0]) for i in range(10)]
    with pytest.warns(UserWarning, match="max_cluster"):
        out = semdedup_prune(
            _emb(spark, rows), k=1, threshold=0.5, max_cluster=5
        ).collect()
    assert len(out) == 10 and all(r.kept for r in out)
    # same data, guard off: the prune actually fires
    ungated = semdedup_prune(
        _emb(spark, rows), k=1, threshold=0.5, max_cluster=None
    ).collect()
    assert sum(1 for r in ungated if not r.kept) > 0


def test_bad_params_raise(spark):
    with pytest.raises(ValueError, match="k and n_iters"):
        kmeans_quantized(_emb(spark, [(0, [1.0])]), k=0)
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_quantized(_emb(spark, []).where(F.lit(False)), k=2)


def test_assign_broadcast_parity_with_literal_path(spark):
    """Bit-equal assignments from the two physical forms: centroid
    literals in-plan (small k) vs one broadcast array row (large k) — the
    arithmetic is expression-identical, only plan size differs."""
    from seatunnel_spark.operators.clustering import (
        _assign,
        _assign_broadcast,
        quantize_int8,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_int8(emb, "vec_id", "embedding").select("vec_id", "codes")
    init = (
        q.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(10)
        .collect()
    )
    cents = [(i, [int(x) for x in r["codes"]]) for i, r in enumerate(init)]
    lit = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"])
        for r in _assign(q, cents, "vec_id").collect()
    }
    bc = {
        r["vec_id"]: (r["cluster"], r["centroid_sim"])
        for r in _assign_broadcast(q, cents, "vec_id").collect()
    }
    assert lit == bc


def test_assign_dispatches_to_broadcast_above_threshold(spark):
    from seatunnel_spark.operators.clustering import (
        _ASSIGN_LITERAL_MAX_K,
        kmeans_quantized,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k = _ASSIGN_LITERAL_MAX_K + 4
    out = kmeans_quantized(emb, k=k, n_iters=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # broadcast-data path: no k-wide literal array in the plan, one
    # BroadcastNestedLoopJoin instead
    assert "BroadcastNestedLoop" in plan
    n_clusters = out.select("cluster").distinct().count()
    assert 1 <= n_clusters <= k
    assert out.count() == emb.count()
