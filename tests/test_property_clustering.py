"""Property-based invariants (hypothesis) for the k-means trainer and
SemDeDup prune: for ANY vector set, k, and iteration count —
assignments are total and in-range, the prune partitions the corpus
exactly, keepers always precede their dups, and dup edges never cross
cluster boundaries."""

from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark.operators.clustering import kmeans_quantized, semdedup_prune

DIM = 4


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    vecs = []
    for i in range(n):
        v = [
            float(draw(st.integers(min_value=-3, max_value=3)))
            for _ in range(DIM)
        ]
        vecs.append((i, v))
    k = draw(st.integers(min_value=1, max_value=4))
    iters = draw(st.integers(min_value=1, max_value=3))
    return vecs, k, iters


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_kmeans_assignment_total_and_in_range(spark, case):
    vecs, k, iters = case
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = kmeans_quantized(df, k=k, n_iters=iters).collect()
    assert sorted(r.vec_id for r in out) == [v[0] for v in vecs]
    assert all(0 <= r.cluster < k for r in out)
    # similarity is a rounded cosine or the -2 zero-norm sentinel
    assert all(r.centroid_sim == -2.0 or -1.0 <= r.centroid_sim <= 1.0
               for r in out)


@settings(max_examples=8, deadline=None)
@given(corpora())
def test_semdedup_partitions_corpus_exactly(spark, case):
    vecs, k, _ = case
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           semdedup_prune(df, k=k, threshold=0.95, n_iters=1).collect()}
    assert sorted(out) == [v[0] for v in vecs]           # total
    clusters = {i: out[i].cluster for i in out}
    for i, r in out.items():
        if r.kept:
            assert r.dup_of is None and r.dup_sim is None
        else:
            assert r.dup_of is not None and r.dup_of < i  # keeper precedes
            assert clusters[r.dup_of] == r.cluster        # same cluster
            assert r.dup_sim >= 0.95
            # the min-id member of any cluster can never be dropped
    for c in set(clusters.values()):
        m = min(i for i in out if clusters[i] == c)
        assert out[m].kept
