"""Column-profile operator tests (hand-computed)."""

from __future__ import annotations

import math

import pytest

from topnotch_spark.operators.profile import profile_columns


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, None), (None, "a")],
        "x double, s string",
    )
    out = {r["column"]: r for r in profile_columns(df).collect()}

    x = out["x"]
    assert (x["n"], x["n_null"], x["n_distinct"]) == (4, 1, 3)
    assert (x["min_value"], x["max_value"]) == (1.0, 3.0)
    assert x["avg_value"] == 2.0
    assert x["stddev_value"] == pytest.approx(1.0)  # stddev_samp of 1,2,3

    s = out["s"]
    assert (s["n"], s["n_null"], s["n_distinct"]) == (4, 1, 2)
    assert s["min_value"] is None and s["avg_value"] is None  # non-numeric


def test_profile_two_branch_plan(spark):
    """The profile is exactly two aggregation branches (stats+distinct
    with its EXPAND, and percentiles kept apart from it), never
    per-column jobs."""
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    prof = profile_columns(df, ["a", "b"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 2
