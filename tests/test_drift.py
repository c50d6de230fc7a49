"""Distribution-drift (PSI) operator tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.drift import histogram_drift, psi


def test_identical_distributions_zero_psi(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    assert psi(df, df, "x") == pytest.approx(0.0, abs=1e-12)


def test_shifted_distribution_positive_psi(spark):
    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    cur = ref.select((F.col("x") * 2).alias("x"))  # half clamps into top bucket
    total = psi(ref, cur, "x")
    assert total > 0.25  # classic "significant shift" threshold


def test_histogram_buckets_hand_computed(spark):
    # ref uniform over [0, 10): buckets are [0,1), [1,2), ... [9,10]
    ref = spark.createDataFrame(
        [(float(i),) for i in range(10)], "x double"
    )
    cur = spark.createDataFrame(
        [(0.5,), (0.6,), (9.5,), (100.0,), (-5.0,)], "x double"
    )
    rows = {r["bucket"]: r for r in histogram_drift(ref, cur, "x", 10).collect()}
    assert len(rows) == 10
    # ref: exactly one value per bucket... x=9 lands in bucket 9 ((9-0)/0.9=10 -> clamp)
    assert rows[0]["n_ref"] == 1
    # cur: 0.5, 0.6, -5.0 clamp/fall into bucket 0; 9.5 and 100.0 into bucket 9
    assert rows[0]["n_cur"] == 3
    assert rows[9]["n_cur"] == 2
    assert sum(r["n_cur"] for r in rows.values()) == 5
    # bounds span the REFERENCE range [0, 9]: width = 0.9, last hi = 9.0
    assert rows[0]["lo"] == 0.0 and rows[9]["hi"] == pytest.approx(9.0)


def test_empty_bucket_smoothing(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    cur = spark.createDataFrame([(0.1,)], "x double")  # 9 empty cur buckets
    out = histogram_drift(ref, cur, "x", 10).collect()
    for r in out:
        assert r["psi_term"] is not None and math.isfinite(r["psi_term"])


def test_drift_empty_and_constant_reference_raise(spark):
    empty = spark.createDataFrame([], "x double")
    cur = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="no non-null"):
        histogram_drift(empty, cur, "x")
    const = spark.createDataFrame([(2.0,), (2.0,)], "x double")
    with pytest.raises(ValueError, match="constant"):
        histogram_drift(const, cur, "x")


def test_ks_empty_side_yields_null_not_crash(spark):
    from pyspark.sql import functions as F

    from topnotch_spark.operators.drift import ks_statistic

    vals = spark.range(10).select(F.col("id").cast("double").alias("x"))
    empty = vals.filter("x < 0")
    row = ks_statistic(vals, empty, "x").collect()[0]
    assert row["ks_stat"] is None and row["n_cur"] == 0 and row["n_ref"] == 10


def test_ks_both_sides_empty_single_row(spark):
    from pyspark.sql import functions as F

    from topnotch_spark.operators.drift import ks_statistic

    empty = spark.range(0).select(F.col("id").cast("double").alias("x"))
    row = ks_statistic(empty, empty, "x").collect()[0]
    assert row["ks_stat"] is None and row["n_ref"] == 0 and row["n_cur"] == 0


class TestChi2Drift:
    def test_identical_distributions_zero_stat(self, spark):
        from topnotch_spark.operators.drift import chi2_drift

        df = spark.createDataFrame(
            [("a",)] * 6 + [("b",)] * 4, "c string"
        )
        out = chi2_drift(df, df, "c").collect()
        assert sum(r.chi2_term for r in out) == 0.0
        assert {r.category for r in out} == {"a", "b"}

    def test_shifted_mix_positive_stat_and_counts(self, spark):
        from topnotch_spark.operators.drift import chi2_drift

        ref = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "c string")
        cur = spark.createDataFrame([("a",)] * 2 + [("b",)] * 8, "c string")
        out = {r.category: r for r in chi2_drift(ref, cur, "c").collect()}
        assert out["a"].n_ref == 8 and out["a"].n_cur == 2
        total = sum(r.chi2_term for r in out.values())
        # hand-computed 2x2 chi-square: N=20, all expected cells = 5 -> 7.2
        assert abs(total - 7.2) < 1e-6

    def test_category_missing_on_one_side(self, spark):
        from topnotch_spark.operators.drift import chi2_drift

        ref = spark.createDataFrame([("a",)] * 5, "c string")
        cur = spark.createDataFrame([("a",)] * 3 + [("z",)] * 2, "c string")
        out = {r.category: r for r in chi2_drift(ref, cur, "c").collect()}
        assert out["z"].n_ref == 0 and out["z"].n_cur == 2
        assert out["z"].chi2_term > 0

    def test_nulls_folded_to_sentinel(self, spark):
        from topnotch_spark.operators.drift import chi2_drift

        ref = spark.createDataFrame([("a",), (None,)], "c string")
        out = chi2_drift(ref, ref, "c").collect()
        assert {r.category for r in out} == {"a", "__NULL__"}
