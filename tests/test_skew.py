"""Salted join: identical results to the plain join, spread partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from topnotch_spark.operators.skew import SALT_COL, salted_join


def _skewed_frames(spark):
    # 90% of rows share key 1 — the shape AQE alone handles awkwardly
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.createDataFrame(
        [(1, "hot"), (950, "cold"), (999, "cold2"), (12345, "nomatch")],
        "k long, rval string",
    )
    return left, right


def test_salted_inner_join_equals_plain(spark):
    left, right = _skewed_frames(spark)
    plain = {(r["k"], r["lval"], r["rval"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["lval"], r["rval"])
        for r in salted_join(left, right, ["k"], salt=8).collect()
    }
    assert salted == plain
    assert len(plain) == 902  # 900 hot + 2 cold matches


def test_salted_left_join_equals_plain(spark):
    left, right = _skewed_frames(spark)
    plain = {
        (r["k"], r["lval"], r["rval"])
        for r in left.join(right, "k", "left").collect()
    }
    salted = {
        (r["k"], r["lval"], r["rval"])
        for r in salted_join(left, right, ["k"], how="left", salt=4).collect()
    }
    assert salted == plain
    assert len(plain) == 1000  # every left row survives exactly once


def test_salt_column_not_leaked(spark):
    left, right = _skewed_frames(spark)
    out = salted_join(left, right, ["k"])
    assert SALT_COL not in out.columns


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    salted = left.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)),
    )
    per_salt = (
        salted.filter("k = 1").groupBy(SALT_COL).count().collect()
    )
    assert len(per_salt) == 8                      # hot key hits all salts
    assert max(r["count"] for r in per_salt) < 900  # no salt owns the key


def test_key_skew_topk_ranks_and_fracs(spark):
    from topnotch_spark.operators.skew import key_skew_topk

    left, _ = _skewed_frames(spark)
    out = key_skew_topk(left, ["k"], k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    # hottest key first with its exact share
    assert out[0]["k"] == 1 and out[0]["n_rows"] == 900
    assert out[0]["frac"] == 0.9
    # ties (all remaining keys have 1 row) break on key ascending
    assert out[1]["k"] == 900 and out[2]["k"] == 901


def test_key_skew_topk_k_exceeds_cardinality(spark):
    from topnotch_spark.operators.skew import key_skew_topk

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    out = key_skew_topk(df, ["k"], k=10).collect()
    assert len(out) == 2
    assert [(r["k"], r["n_rows"], r["rank"]) for r in out] == [(1, 2, 1), (2, 1, 2)]
    assert abs(sum(r["frac"] for r in out) - 1.0) < 1e-9
