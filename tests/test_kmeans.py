"""Deterministic spherical k-means: cluster recovery, determinism,
empty-cluster survival, and the trained-IVF integration path."""

from __future__ import annotations

from pyspark.sql import functions as F

from topnotch_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
)


def _clustered(spark, per_cluster=20):
    """Three well-separated direction clusters in 4-d."""
    rows = []
    dirs = [(10.0, 0.1, 0.0, 0.0), (0.0, 10.0, 0.1, 0.0), (0.0, 0.0, 10.0, 0.1)]
    i = 0
    for cx, d in enumerate(dirs):
        for j in range(per_cluster):
            jitter = 0.01 * ((j % 5) - 2)
            rows.append((i, [d[0] + jitter, d[1], d[2] + jitter, d[3]]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_separable_clusters(spark):
    df = _clustered(spark)
    cents, assign = kmeans_centroids(df, n_centroids=3, max_iter=6)
    groups = (
        assign.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sorted(g["n"] for g in groups) == [20, 20, 20]
    # members of each true cluster land together
    got = {r["id"]: r["centroid_id"] for r in assign.collect()}
    for base in (0, 20, 40):
        assert len({got[base + j] for j in range(20)}) == 1
    assert {r["n_members"] for r in cents.collect()} == {20}


def test_kmeans_deterministic(spark):
    df = _clustered(spark)
    _, a1 = kmeans_centroids(df, n_centroids=3, max_iter=4)
    _, a2 = kmeans_centroids(df, n_centroids=3, max_iter=4)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_kmeans_more_centroids_than_points(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents, assign = kmeans_centroids(df, n_centroids=2, max_iter=3)
    assert assign.count() == 2
    assert cents.count() == 2


def test_trained_ivf_full_probe_matches_brute_force(spark):
    df = _clustered(spark)
    cents, _ = kmeans_centroids(df, n_centroids=3, max_iter=4)
    queries = df.filter("vec_id IN (0, 25, 45)")
    trained = ivf_topk(
        df, queries, k=5, n_centroids=3, n_probe=3, centroids=cents
    ).collect()
    exact = brute_force_topk(df, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(trained, key=key) == sorted(exact, key=key)
