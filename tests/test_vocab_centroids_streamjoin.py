"""Unit tests for vocab_topk, label_centroids, stream_stream_time_join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from topnotch_spark.operators.similarity import label_centroids
from topnotch_spark.operators.textqc import vocab_topk
from topnotch_spark.streaming.ops import (
    run_stream_to_table,
    stream_from_parquet,
    stream_stream_time_join,
)


def test_vocab_topk_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b"), (3, "c")], "doc_id long, text string"
    )
    out = vocab_topk(df, "doc_id", "text", k=2).collect()
    assert [(r["token"], r["n_total"], r["n_docs"]) for r in out] == [
        ("a", 3, 2),
        ("b", 3, 2),  # tie on n_total -> token asc
    ]


def test_vocab_topk_k_bounds(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    assert vocab_topk(df, "doc_id", "text", k=50).count() == 2


def test_label_centroids_means(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in label_centroids(df).collect()}
    assert out[0]["n_vectors"] == 2 and out[0]["centroid"] == [2.0, 3.0]
    assert out[1]["n_vectors"] == 1 and out[1]["centroid"] == [10.0, 20.0]


def test_stream_stream_time_join_batch_and_stream(spark, tmp_path):
    # two micro-batch files, a click in batch 1 pairing with an error in
    # batch 2 (cross-batch state), plus an out-of-range click
    rows1 = [(1, "click", 100, "2024-01-01 10:00:00")]
    rows2 = [
        (2, "error", 100, "2024-01-01 10:30:00"),
        (3, "click", 100, "2024-01-01 12:00:00"),
        (4, "error", 100, "2024-01-01 12:10:00"),
        (5, "error", 200, "2024-01-01 10:30:00"),  # no click for user
    ]
    schema = "event_id long, event_type string, user_id long, ts timestamp"
    src = str(tmp_path / "replay")
    os.makedirs(src)
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(
            [(a, b, c, __import__("datetime").datetime.fromisoformat(d)) for a, b, c, d in rows],
            schema,
        ).coalesce(1).write.parquet(f"{src}/part{i}")
    stream = stream_from_parquet(
        spark, f"{src}/part*", schema=schema, max_files_per_trigger=1
    )
    errors = stream.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = stream_stream_time_join(
        errors, clicks, ("user_id", "c_user"), ("error_ts", "click_ts"),
        tolerance_seconds=3600,
    ).select("error_id", "click_id")
    got = {
        (r["error_id"], r["click_id"])
        for r in run_stream_to_table(joined, output_mode="append").collect()
    }
    # error 2 pairs with click 1 (30 min, cross-batch); error 4 with
    # click 3 (10 min); click 1 is >1h before error 4 -> excluded
    assert got == {(2, 1), (4, 3)}


def test_embedding_norm_outliers_flags_extreme(spark):
    from topnotch_spark.operators.similarity import embedding_norm_outliers

    rows = [(i, [1.0, 0.0, 0.0], 1) for i in range(10)]
    rows.append((99, [100.0, 0.0, 0.0], 1))  # broken-encoder vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: (r["l2_norm"], r["is_outlier"])
           for r in embedding_norm_outliers(df, k=2.0).collect()}
    assert out[0][0] == 1.0
    assert out[99][0] == 100.0
    assert out[99][1] is True
    assert not any(v[1] for k, v in out.items() if k != 99)


def test_embedding_norm_outliers_zero_std(spark):
    from topnotch_spark.operators.similarity import embedding_norm_outliers

    df = spark.createDataFrame(
        [(i, [3.0, 4.0], 7) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    )
    out = embedding_norm_outliers(df).collect()
    assert all(r["l2_norm"] == 5.0 and r["zscore"] == 0.0
               and r["is_outlier"] is False for r in out)


def test_project_embeddings_preserves_plane_math(spark):
    from topnotch_spark.functions.vectors import plane_signs
    from topnotch_spark.operators.similarity import project_embeddings

    dim = 4
    vec = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    out = {
        r["pos"]: r["value"]
        for r in project_embeddings(df, out_dim=3, dim=dim).collect()
    }
    for p in range(3):
        want = round(sum(x * s for x, s in zip(vec, plane_signs(p, dim))), 6)
        assert out[p] == want
    # JL sanity: projections of identical vectors are identical
    df2 = spark.createDataFrame(
        [(1, vec), (2, vec)], "vec_id long, embedding array<float>"
    )
    rows = project_embeddings(df2, out_dim=2, dim=dim).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["vec_id"], {})[r["pos"]] = r["value"]
    assert by_id[1] == by_id[2]
