"""Column-profile operator tests (hand-computed)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

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


def test_approx_profile_bounded_error(spark):
    """The exact=False scale path (HLL distinct + sketch percentiles) must
    stay within its documented error bounds vs the exact profile, and the
    two paths must agree exactly on the exact statistics (n, nulls, min,
    max, avg, stddev)."""
    import random

    rng = random.Random(7)
    rows = [(rng.randint(0, 500), rng.gauss(100.0, 15.0)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "k int, v double").repartition(8)

    exact = {r["column"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    approx = {
        r["column"]: r
        for r in profile_columns(df, ["k", "v"], exact=False).collect()
    }
    assert set(exact) == set(approx) == {"k", "v"}
    for c in ("k", "v"):
        e, a = exact[c], approx[c]
        # exact stats identical on both paths
        for fld in ("n", "n_null", "min_value", "max_value", "avg_value",
                    "stddev_value"):
            assert a[fld] == e[fld], (c, fld)
        # HLL relative error: default rsd 5%, allow 10% slack
        assert abs(a["n_distinct"] - e["n_distinct"]) <= 0.10 * e["n_distinct"]
        # sketch percentile rank error eps = 1/accuracy -> tight here;
        # compare by value with a generous tolerance of 2% of the range
        spread = e["max_value"] - e["min_value"]
        for fld in ("p25", "p50", "p75", "p95"):
            assert abs(a[fld] - e[fld]) <= 0.02 * spread, (c, fld)


def test_approx_profile_single_job_plan(spark):
    """exact=False must be ONE aggregation (no EXPAND, no crossJoin of a
    second agg): the optimized plan contains no Expand node and only one
    source scan."""
    df = spark.createDataFrame([(1, 2.0)], "k int, v double")
    plan = profile_columns(df, ["k", "v"], exact=False)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Expand" not in plan
    assert plan.lower().count("localrelation") + plan.lower().count("logicalrdd") == 1


def test_profile_accuracy_verdicts(spark):
    """profile_accuracy emits the deterministic verdict frame: exact
    n/n_null plus all-True sketch verdicts on well-behaved data, and the
    percentile verdict flips False when given an impossible rank bound."""
    import random

    from topnotch_spark.operators.profile import profile_accuracy

    rng = random.Random(11)
    rows = [
        (rng.randint(0, 500), rng.gauss(100.0, 15.0) if i % 7 else None)
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "k int, v double").repartition(8)

    out = {r["column"]: r for r in profile_accuracy(df, ["k", "v"]).collect()}
    assert set(out) == {"k", "v"}
    for c in ("k", "v"):
        assert out[c]["n"] == 20_000
        assert out[c]["distinct_ok"] is True
        assert out[c]["pct_ok"] is True
    assert out["v"]["n_null"] == 20_000 // 7 + 1
    assert out["k"]["n_null"] == 0

    # an impossible rank epsilon must flip pct_ok, proving the boolean
    # is measured rather than constant-folded
    strict = {
        r["column"]: r
        for r in profile_accuracy(df, ["v"], pct_rank_eps=-1.0).collect()
    }
    assert strict["v"]["pct_ok"] is False

    with pytest.raises(ValueError, match="numeric"):
        profile_accuracy(df.withColumn("s", F.lit("x")), ["s"])


def test_zscore_outliers_flags_extremes(spark):
    from pyspark.sql import functions as F

    from topnotch_spark.operators.profile import zscore_outliers

    base = [(i, "g", 10.0) for i in range(20)] + [(99, "g", 1000.0)]
    df = spark.createDataFrame(base, "id long, grp string, v double")
    out = {r["id"]: r for r in zscore_outliers(df, "v", ["grp"], k=3.0).collect()}
    assert out[99]["is_outlier"]
    assert not any(out[i]["is_outlier"] for i in range(20))
    # constant group -> zscore 0, no flags
    const = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, v double")
    rows = zscore_outliers(const, "v", None).collect()
    assert all(r["zscore"] == 0.0 and not r["is_outlier"] for r in rows)


def test_zscore_ungrouped_tolerates_reserved_names(spark):
    from topnotch_spark.operators.profile import zscore_outliers

    df = spark.createDataFrame(
        [(1, 1.0, "x"), (2, 2.0, "y"), (3, 30.0, "z")],
        "id long, v double, __m__ string",
    )
    out = zscore_outliers(df, "v", None, k=1.0).collect()
    assert len(out) == 3 and {r["id"] for r in out if r["is_outlier"]} == {3}
    assert set(out[0].asDict()) == {"id", "v", "__m__", "zscore", "is_outlier"}
