"""Edge-case tests for the round-5 analytics additions: token entropy,
readability, MAD outliers, pivot cross-tab, retention cohorts, rolling
time-range aggregates."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from topnotch_spark.operators.profile import mad_outliers, pivot_counts
from topnotch_spark.operators.temporal import retention_cohorts, rolling_window_agg
from topnotch_spark.operators.textqc import readability, token_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTokenEntropy:
    def test_uniform_distinct_tokens_hit_norm_one(self, spark):
        out = token_entropy(
            _docs(spark, [(1, "a b c d")]), "doc_id", "text"
        ).first()
        assert out.n_tokens == 4 and out.n_distinct_tokens == 4
        assert out.token_entropy == 2.0  # log2(4)
        assert out.norm_entropy == 1.0

    def test_single_token_doc_is_zero_not_negative_zero(self, spark):
        out = token_entropy(
            _docs(spark, [(1, "same same same")]), "doc_id", "text"
        ).first()
        assert out.token_entropy == 0.0
        assert math.copysign(1.0, out.token_entropy) == 1.0
        assert out.norm_entropy == 0.0

    def test_empty_doc(self, spark):
        out = token_entropy(_docs(spark, [(1, "   ")]), "doc_id", "text").first()
        assert out.n_tokens == 0
        assert out.token_entropy == 0.0 and out.norm_entropy == 0.0

    def test_skewed_distribution_below_uniform(self, spark):
        skew = token_entropy(
            _docs(spark, [(1, "a a a a a a b")]), "doc_id", "text"
        ).first()
        assert 0.0 < skew.token_entropy < 1.0  # < log2(2)


class TestReadability:
    def test_counts_and_band(self, spark):
        out = readability(
            _docs(spark, [(1, "The cat sat. The dog ran!")]), "doc_id", "text"
        ).first()
        assert out.n_words == 6
        assert out.n_sentences == 2
        assert out.readability_band in {
            "very_easy", "standard", "difficult", "very_difficult"
        }

    def test_empty_doc_band(self, spark):
        out = readability(_docs(spark, [(1, "")]), "doc_id", "text").first()
        assert out.flesch_score is None
        assert out.readability_band == "empty"

    def test_sentences_floored_at_one(self, spark):
        out = readability(
            _docs(spark, [(1, "no terminal punctuation here")]), "doc_id", "text"
        ).first()
        assert out.n_sentences == 1


class TestMadOutliers:
    def test_flags_gross_outlier_and_survives_it(self, spark):
        # mean/stddev z-score on this data would be dragged by the 1e9 row;
        # median/MAD flags it and nothing else
        rows = [(i, "g", 100.0 + i) for i in range(20)] + [(99, "g", 1e9)]
        df = spark.createDataFrame(rows, "id long, grp string, v double")
        out = mad_outliers(df, "v", ["grp"]).collect()
        flagged = {r.id for r in out if r.is_outlier}
        assert flagged == {99}

    def test_constant_group_yields_null_score(self, spark):
        df = spark.createDataFrame(
            [(1, "g", 5.0), (2, "g", 5.0)], "id long, grp string, v double"
        )
        out = mad_outliers(df, "v", ["grp"]).collect()
        assert all(r.robust_z is None and not r.is_outlier for r in out)

    def test_ungrouped_path(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(11)], "id long, v double"
        )
        out = mad_outliers(df, "v", None, k=1.0).collect()
        med = {r.group_median for r in out}
        assert med == {5.0}


class TestPivotCounts:
    def test_absent_cell_count_zero_sum_null(self, spark):
        df = spark.createDataFrame(
            [("p1", "A", 10.0), ("p1", "A", 20.0), ("p2", "B", 5.0)],
            "grp string, cat string, v double",
        )
        out = {
            r.grp: r
            for r in pivot_counts(df, "grp", "cat", ["A", "B"], "v").collect()
        }
        assert out["p1"].A_cnt == 2 and out["p1"].A_sum == 30.0
        assert out["p1"].B_cnt == 0 and out["p1"].B_sum is None
        assert out["p2"].B_cnt == 1

    def test_count_only_mode_uses_value_names(self, spark):
        df = spark.createDataFrame(
            [("p1", "A")], "grp string, cat string"
        )
        out = pivot_counts(df, "grp", "cat", ["A", "B"])
        assert set(out.columns) == {"grp", "A", "B"}
        row = out.first()
        assert row.A == 1 and row.B == 0


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


class TestRetentionCohorts:
    def test_week_cells(self, spark):
        # user 1 first seen week of Jan 1 (Mon), active again 2 weeks later;
        # user 2 same cohort, never returns
        rows = [
            (1, _ts(2)), (1, _ts(16)),
            (2, _ts(3)),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            (str(r.cohort_week), r.weeks_since): r
            for r in retention_cohorts(df, "user_id", "ts").collect()
        }
        assert out[("2024-01-01", 0)].n_active == 2
        assert out[("2024-01-01", 0)].retention == 1.0
        cell = out[("2024-01-01", 2)]
        assert cell.n_active == 1 and cell.cohort_size == 2
        assert cell.retention == 0.5

    def test_distinct_users_not_events(self, spark):
        rows = [(1, _ts(2)), (1, _ts(2, 5)), (1, _ts(2, 9))]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = retention_cohorts(df, "user_id", "ts").collect()
        assert len(out) == 1 and out[0].n_active == 1


class TestRollingWindowAgg:
    def test_trailing_window_drops_old_rows(self, spark):
        rows = [
            (1, 10, _ts(1), 1.0),
            (2, 10, _ts(5), 2.0),
            (3, 10, _ts(20), 4.0),  # >7d after both others
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, v double"
        )
        out = {
            r.event_id: r
            for r in rolling_window_agg(df, "user_id", "ts", "v").collect()
        }
        assert out[1].roll_n == 1 and out[1].roll_sum == 1.0
        assert out[2].roll_n == 2 and out[2].roll_sum == 3.0
        assert out[3].roll_n == 1 and out[3].roll_sum == 4.0

    def test_same_timestamp_peers_share_frame(self, spark):
        rows = [
            (1, 10, _ts(1), 1.0),
            (2, 10, _ts(1), 2.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, v double"
        )
        out = rolling_window_agg(df, "user_id", "ts", "v").collect()
        assert all(r.roll_n == 2 and r.roll_sum == 3.0 for r in out)

    def test_keys_independent(self, spark):
        rows = [(1, 10, _ts(1), 1.0), (2, 20, _ts(1), 5.0)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, v double"
        )
        out = {r.event_id: r for r in rolling_window_agg(df, "user_id", "ts", "v").collect()}
        assert out[1].roll_sum == 1.0 and out[2].roll_sum == 5.0


class TestEquidepthHistogram:
    def test_equal_counts_and_boundaries(self, spark):
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "v double"
        )
        from topnotch_spark.operators.profile import equidepth_histogram
        out = {r.bucket: r for r in
               equidepth_histogram(df, "v", n_buckets=4).collect()}
        assert sum(r.n_rows for r in out.values()) == 100
        assert set(out) == {0, 1, 2, 3}
        # ~25 per bucket on uniform data
        assert all(20 <= r.n_rows <= 30 for r in out.values())
        assert out[0].lo_bound is None and out[3].hi_bound is None
        assert out[1].lo_bound == out[0].hi_bound

    def test_nulls_excluded_and_skew_survives(self, spark):
        from topnotch_spark.operators.profile import equidepth_histogram
        rows = [(1.0,)] * 50 + [(1e9,)] * 50 + [(None,)]
        df = spark.createDataFrame(rows, "v double")
        out = equidepth_histogram(df, "v", n_buckets=2).collect()
        assert sum(r.n_rows for r in out) == 100  # NULL dropped
        # equal-width would put all mass in one bar; equi-depth splits it
        assert len(out) == 2

    def test_approx_path_runs(self, spark):
        from topnotch_spark.operators.profile import equidepth_histogram
        df = spark.createDataFrame(
            [(float(i),) for i in range(1, 101)], "v double"
        )
        out = equidepth_histogram(df, "v", n_buckets=4, exact=False).collect()
        assert sum(r.n_rows for r in out) == 100


class TestAsofDirections:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5), "L")],
            "event_id long, user_id long, ts timestamp, tag string",
        )
        right = spark.createDataFrame(
            [(10, _ts(3), 100), (10, _ts(8), 200)],
            "user_id long, ts timestamp, rid long",
        )
        return left, right

    def _join(self, left, right, **kw):
        from topnotch_spark.operators.temporal import asof_join
        return asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], **kw
        ).first()

    def test_forward_picks_earliest_at_or_after(self, spark):
        left, right = self._frames(spark)
        row = self._join(left, right, direction="forward")
        assert row.rid_right == 200

    def test_forward_equality_matches(self, spark):
        from topnotch_spark.operators.temporal import asof_join
        left = spark.createDataFrame(
            [(1, 10, _ts(8))], "event_id long, user_id long, ts timestamp"
        )
        _, right = self._frames(spark)
        row = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], direction="forward",
        ).first()
        assert row.rid_right == 200

    def test_nearest_prefers_closer_side(self, spark):
        left, right = self._frames(spark)
        # left at day 5: backward gap 2d, forward gap 3d -> backward
        row = self._join(left, right, direction="nearest")
        assert row.rid_right == 100

    def test_nearest_tie_resolves_backward(self, spark):
        from topnotch_spark.operators.temporal import asof_join
        left = spark.createDataFrame(
            [(1, 10, _ts(5))], "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(10, _ts(3), 1), (10, _ts(7), 2)],
            "user_id long, ts timestamp, rid long",
        )
        row = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], direction="nearest",
        ).first()
        assert row.rid_right == 1

    def test_nearest_falls_through_null_side(self, spark):
        from topnotch_spark.operators.temporal import asof_join
        left = spark.createDataFrame(
            [(1, 10, _ts(1))], "event_id long, user_id long, ts timestamp"
        )
        right = spark.createDataFrame(
            [(10, _ts(9), 7)], "user_id long, ts timestamp, rid long"
        )
        row = asof_join(
            left, right, on=["user_id"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], direction="nearest",
        ).first()
        assert row.rid_right == 7  # no backward match exists

    def test_forward_tolerance_nulls_far_matches(self, spark):
        left, right = self._frames(spark)
        row = self._join(
            left, right, direction="forward", tolerance_seconds=86400
        )
        assert row.rid_right is None  # forward gap is 3 days

    def test_unknown_direction_raises(self, spark):
        left, right = self._frames(spark)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="direction"):
            self._join(left, right, direction="sideways")


class TestTrendPerKey:
    def test_perfect_line_slope_and_r2(self, spark):
        from topnotch_spark.operators.temporal import trend_per_key
        # value rises exactly 1.00/day -> slope 1.0, r2 1.0
        rows = [(1, _ts(d), 10.0 + d) for d in range(1, 11)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = trend_per_key(df, "k", "ts", "v").first()
        assert out.n_points == 10
        assert out.slope_per_day == 1.0
        assert out.r2 == 1.0

    def test_flat_series_zero_slope(self, spark):
        from topnotch_spark.operators.temporal import trend_per_key
        rows = [(1, _ts(d), 5.0) for d in range(1, 6)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = trend_per_key(df, "k", "ts", "v").first()
        assert out.slope_per_day == 0.0
        assert out.r2 is None  # deny == 0 for a constant series

    def test_single_day_null_slope(self, spark):
        from topnotch_spark.operators.temporal import trend_per_key
        rows = [(1, _ts(1, h), float(h)) for h in range(3)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = trend_per_key(df, "k", "ts", "v").first()
        assert out.slope_per_day is None and out.r2 is None

    def test_downtrend_negative(self, spark):
        from topnotch_spark.operators.temporal import trend_per_key
        rows = [(1, _ts(d), 100.0 - 2 * d) for d in range(1, 8)]
        df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = trend_per_key(df, "k", "ts", "v").first()
        assert out.slope_per_day == -2.0
