"""Assertion operator tests — ported case matrix from the reference suite
(tnassertion/TnAssertionRunnerTest.scala, see SURVEY.md §5)."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.assertions import (
    INVALID_COL_NAME,
    AssertionRule,
    SampleWindowParams,
    identify_invalid_rows,
    run_assertions,
)


@pytest.fixture(scope="module")
def values_df(spark):
    # reference fixture F1 (FIXTURES.md): 4 rows
    return spark.createDataFrame(
        [
            (1, 2.0, "Failure1", False),
            (3, 4.0, "Failure2", True),
            (5, 6.0, "Failure3", False),
            (7, 8.0, "Failure4", True),
        ],
        "Ints long, Doubles double, Strings string, Booleans boolean",
    )


def _rule(query, desc="d", threshold=0.0, **kw):
    return AssertionRule(query=query, description=desc, threshold=threshold, **kw)


class TestFractions:
    def test_none_invalid(self, values_df):
        res = run_assertions(values_df, "k", [_rule("Ints > 0")])
        assert res.reports[0].fraction_invalid == 0.0
        assert res.reports[0].num_invalid == 0
        assert res.num_failed == 0

    def test_all_invalid(self, values_df):
        res = run_assertions(values_df, "k", [_rule("Ints < 0", threshold=0.5)])
        assert res.reports[0].fraction_invalid == 1.0
        assert res.reports[0].num_invalid == 4
        assert res.num_failed == 1

    def test_half_invalid(self, values_df):
        res = run_assertions(values_df, "k", [_rule("Ints > 3", threshold=0.5)])
        assert res.reports[0].fraction_invalid == 0.5
        # fails only when fraction EXCEEDS threshold (reference :37-38)
        assert res.num_failed == 0

    def test_empty_input_fraction_zero(self, spark):
        empty = spark.createDataFrame([], "Ints long")
        res = run_assertions(empty, "k", [_rule("Ints > 0")])
        assert res.reports[0].fraction_invalid == 0.0

    def test_multiple_rules_failed_count(self, values_df):
        res = run_assertions(
            values_df,
            "k",
            [
                _rule("Ints > 1", threshold=0.01),   # 1/4 invalid > 0.01 → fail
                _rule("Booleans = true", threshold=0.6),  # 2/4 = 0.5 ≤ 0.6 → pass
            ],
        )
        assert res.num_failed == 1

    def test_null_predicate_not_counted_invalid(self, spark):
        df = spark.createDataFrame(
            [(None,), (False,), (True,)], "Success boolean"
        )
        # NOT(Success != false) is NULL for null rows → not counted (:55-56)
        res = run_assertions(df, "k", [_rule("Success != false")])
        assert res.reports[0].num_invalid == 1  # only the False row

    def test_sample_capped_at_20(self, spark):
        df = spark.range(100).withColumnRenamed("id", "Ints")
        res = run_assertions(df, "k", [_rule("Ints < 0")])
        assert len(res.reports[0].sample_invalid) == 20
        assert res.reports[0].num_invalid == 100


class TestInvalidRows:
    def test_reason_column(self, values_df):
        out = identify_invalid_rows(values_df, [_rule("Ints > 1", "too small")])
        rows = out.collect()
        assert [r[INVALID_COL_NAME] for r in rows] == ["too small"]
        assert rows[0]["Ints"] == 1

    def test_reason_joiner(self, values_df):
        out = identify_invalid_rows(
            values_df,
            [_rule("Ints > 1", "r1"), _rule("Booleans = true", "r2")],
        )
        got = {r["Ints"]: r[INVALID_COL_NAME] for r in out.collect()}
        assert got == {1: "r1 &&& r2", 5: "r2"}

    def test_null_predicate_gets_reason(self, spark):
        # reference when(query, null).otherwise(desc): NULL query → reason
        df = spark.createDataFrame([(None,), (True,)], "B boolean")
        out = identify_invalid_rows(df, [_rule("B = true", "bad")])
        assert out.count() == 1

    def test_cumulative_features_across_rules(self, values_df):
        # rule 2 references the feature defined by rule 1 (reference :121-133)
        rules = [
            _rule(
                "total > 2",
                "r1",
                user_defined_features={"total": "Ints + Doubles"},
            ),
            _rule("total < 100", "r2"),
        ]
        out = identify_invalid_rows(values_df, rules)
        assert out.columns[-2:] == ["total", INVALID_COL_NAME]
        assert out.count() == 0  # 1+2.0=3 > 2 for all rows and all < 100

    def test_own_feature_in_query(self, values_df):
        res = run_assertions(
            values_df,
            "k",
            [
                _rule(
                    "total > 3",
                    "r1",
                    user_defined_features={"total": "Ints + Doubles"},
                )
            ],
        )
        assert res.reports[0].num_invalid == 1  # 1+2.0=3 not > 3


class TestSummaryStats:
    def test_fused_summary(self, values_df):
        res = run_assertions(
            values_df,
            "k",
            [
                _rule(
                    "Ints > 3",
                    user_defined_summary_expr={
                        "maxTotal": "max(Ints + Doubles)",
                        "avgLen": "avg(length(Strings))",
                    },
                )
            ],
        )
        stats = res.reports[0].user_summary_statistics
        # invalid rows: Ints 1,3 → max(1+2, 3+4)=7.0, avg(len)=8.0
        assert stats["maxTotal"] == 7.0
        assert stats["avgLen"] == 8.0

    def test_non_fusable_summary_falls_back(self, values_df):
        res = run_assertions(
            values_df,
            "k",
            [
                _rule(
                    "Ints > 3",
                    user_defined_summary_expr={"span": "max(Ints) - min(Ints)"},
                )
            ],
        )
        assert res.reports[0].user_summary_statistics["span"] == 2

    def test_summary_with_features(self, values_df):
        res = run_assertions(
            values_df,
            "k",
            [
                _rule(
                    "total > 3",
                    user_defined_features={"total": "Ints + Doubles"},
                    user_defined_summary_expr={"minTotal": "min(total)"},
                )
            ],
        )
        assert res.reports[0].user_summary_statistics["minTotal"] == 3.0


class TestSampleWindows:
    @pytest.fixture(scope="class")
    def windows_df(self, spark):
        return spark.createDataFrame(
            [
                (1, "win1", 10.0, 1.0, 100),
                (1, "win1", 10.0, 2.0, -5),
                (1, "win1", 11.0, 1.0, 200),
                (2, "win2", 12.0, 1.0, 300),
                (2, "win2", 13.0, 1.0, -7),
                (2, "win3", 14.0, 1.0, 400),
            ],
            "Window1 long, Window2 string, Order1 double, Order2 double, V long",
        )

    def test_windows_pair_with_samples(self, windows_df):
        rules = [
            _rule(
                "V >= 0",
                sample_window_params=SampleWindowParams(
                    ("Window1", "Window2"), ("Order1", "Order2")
                ),
            )
        ]
        res = run_assertions(windows_df, "k", rules)
        rep = res.reports[0]
        assert rep.num_invalid == 2
        swr = rep.sample_window_report
        assert swr is not None
        assert len(swr.windows) == len(rep.sample_invalid)
        for sample, window in zip(rep.sample_invalid, swr.windows):
            keys = {(r["Window1"], r["Window2"]) for r in window}
            assert keys == {(sample["Window1"], sample["Window2"])}
            orders = [(r["Order1"], r["Order2"]) for r in window]
            assert orders == sorted(orders)
        # the (1, win1) window has all 3 rows
        by_key = {w[0]["Window2"]: w for w in swr.windows}
        assert len(by_key["win1"]) == 3
        assert len(by_key["win2"]) == 2

    def test_no_params_no_windows(self, windows_df):
        res = run_assertions(windows_df, "k", [_rule("V >= 0")])
        assert res.reports[0].sample_window_report is None

    def test_empty_partition_cols_none(self, windows_df):
        rules = [
            _rule(
                "V >= 0",
                sample_window_params=SampleWindowParams((), ("Order1",)),
            )
        ]
        res = run_assertions(windows_df, "k", rules)
        assert res.reports[0].sample_window_report is None


class TestOwnFeatureMetricSemantics:
    """Per-rule metrics use input + ONLY that rule's own features
    (reference checkAssertion :50-55); the invalid-row union stays
    cumulative (:121-133)."""

    def test_duplicate_feature_names_use_own_definition(self, spark):
        # Both rules define "total" differently. Per-rule metrics must give
        # each rule its own definition (fusing against a combined frame
        # would silently pick one); the invalid-row union then crashes on
        # the ambiguous cumulative column, exactly as the reference's
        # identifyInvalidRows fold does (reports first, crash after).
        from topnotch_spark.operators.assertions import (
            _fused_metrics,
            _own_frame,
        )

        df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "Ints int, Doubles double")
        rules = [
            _rule(
                "total > 5",
                "r1",  # total = Ints + Doubles: 11, 22 -> none invalid
                user_defined_features={"total": "Ints + Doubles"},
            ),
            _rule(
                "total > 5",
                "r2",  # total = Ints: 1, 2 -> both invalid
                user_defined_features={"total": "Ints"},
            ),
        ]
        own = [_own_frame(df, r) for r in rules]
        total, counts, _ = _fused_metrics(df, own, rules)
        assert total == 2
        assert counts == [0, 2]  # each rule saw its OWN total
        # the full run still crashes on the cumulative invalid-row union,
        # matching the reference's ambiguous-column AnalysisException
        with pytest.raises(Exception):
            run_assertions(df, "k", rules, with_samples=False)

    def test_query_referencing_other_rules_feature_raises(self, spark):
        # The reference's checkAssertion would crash resolving a column
        # that only another rule defines; so do we, samples on or off.
        df = spark.createDataFrame([(1, 10.0)], "Ints int, Doubles double")
        rules = [
            _rule("total > 5", "r1", user_defined_features={"total": "Ints + Doubles"}),
            _rule("total < 100", "r2"),  # "total" is r1's feature, not r2's
        ]
        with pytest.raises(Exception):
            run_assertions(df, "k", rules, with_samples=False)

    def test_unique_features_still_fused_and_correct(self, spark):
        df = spark.createDataFrame([(1, 10.0), (5, 1.0)], "Ints int, Doubles double")
        rules = [
            _rule("t1 > 5", "r1", user_defined_features={"t1": "Ints + Doubles"}),
            _rule("t2 < 4", "r2", user_defined_features={"t2": "Ints"}),
        ]
        res = run_assertions(df, "k", rules, with_samples=False)
        assert res.reports[0].num_invalid == 0   # 11, 6 both > 5
        assert res.reports[1].num_invalid == 1   # Ints=5 not < 4
