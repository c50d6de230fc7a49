"""Mergeable HLL distinct-sketch tests: estimate accuracy bounds vs
exact counts, merge consistency, and the plan command."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.sketch import (
    build_distinct_sketches,
    distinct_rollup,
    rollup_distinct,
)


def test_estimate_within_hll_error_bound(spark):
    # 5000 distinct users across 10 days
    df = spark.range(50000).select(
        (F.col("id") % 10).alias("day"), (F.col("id") % 5000).alias("user")
    )
    out = distinct_rollup(df, ["day"], [], "user").collect()
    assert len(out) == 1
    est = out[0]["n_distinct_est"]
    assert est == pytest.approx(5000, rel=0.05)  # lg_k=12 => ~2.5% RSE


def test_per_group_estimates(spark):
    df = spark.range(10000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    out = {
        r["g"]: r["n_distinct_est"]
        for r in distinct_rollup(df, ["g"], ["g"], "v").collect()
    }
    assert out[0] == pytest.approx(5000, rel=0.05)
    assert out[1] == pytest.approx(5000, rel=0.05)


def test_merge_consistency_union_of_parts(spark):
    """Rolling up daily sketches estimates the same distinct set as
    sketching the whole — the property that makes sketch tables
    reusable across incremental loads."""
    df = spark.range(30000).select(
        (F.col("id") % 30).alias("day"),
        ((F.col("id") * 7919) % 9000).alias("user"),
    )
    daily = build_distinct_sketches(df, ["day"], "user")
    merged = rollup_distinct(daily, []).collect()[0]["n_distinct_est"]
    direct = (
        distinct_rollup(df.withColumn("whole", F.lit(1)), ["whole"], [], "user")
        .collect()[0]["n_distinct_est"]
    )
    assert merged == pytest.approx(direct, rel=0.02)
    assert merged == pytest.approx(9000, rel=0.05)


def test_rollup_cols_must_be_subset(spark):
    df = spark.range(10).select(
        (F.col("id") % 2).alias("a"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="not in"):
        distinct_rollup(df, ["a"], ["b"], "v")
    with pytest.raises(ValueError, match="detail_cols required"):
        build_distinct_sketches(df, [], "v")


def test_sketch_plan_command(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    sf = "/root/testdata/sf0.001"
    plan = {
        "commands": [
            {
                "command": "sketch",
                "input": {"ref": f"{sf}/events.parquet", "onDisk": True},
                "params": {"detailColumns": ["event_type"],
                           "rollupColumns": [], "valueColumn": "user_id"},
                "outputKey": "distinctUsers",
            },
        ],
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    est = engine.registry["distinctUsers"].collect()[0]["n_distinct_est"]
    exact = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert est == pytest.approx(exact, rel=0.05)
