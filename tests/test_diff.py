"""Diff operator tests — ported type/null/threshold matrix from the
reference suite (tndiff/TnDiffCreatorTest.scala, SURVEY.md §5)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.diff import (
    BOTH_NULL,
    DIFF_TYPES,
    EQUAL,
    FIRST_NULL,
    NOT_EQUAL,
    SECOND_NULL,
    DiffParams,
    DiffSide,
    create_diff,
)


def _params(join1, diff1, join2=None, diff2=None, thresholds=None):
    return DiffParams(
        DiffSide(tuple(join1), tuple(diff1)),
        DiffSide(tuple(join2 or join1), tuple(diff2 or diff1)),
        tuple(thresholds) if thresholds else None,
    )


@pytest.fixture(scope="module")
def num_df1(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None)], "k long, v double"
    )


@pytest.fixture(scope="module")
def num_df2(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, 21.5), (4, 40.0)], "k long, v double"
    )


class TestBasicDiff:
    def test_outer_join_and_status(self, num_df1, num_df2):
        out = create_diff(num_df1, "a", num_df2, "b", _params(["k"], ["v"]))
        assert set(out.columns) == {"a_k", "b_k", "a_v", "b_v", "a_v__minus__b_v", "a_v__equals__b_v"}
        rows = {(r["a_k"], r["b_k"]): r for r in out.collect()}
        assert set(rows) == {(1, 1), (2, 2), (3, None), (None, 4)}
        assert rows[(1, 1)]["a_v__equals__b_v"] == EQUAL
        assert rows[(1, 1)]["a_v__minus__b_v"] == 0.0
        assert rows[(2, 2)]["a_v__equals__b_v"] == NOT_EQUAL
        assert rows[(2, 2)]["a_v__minus__b_v"] == -1.5
        # unmatched right row: left side all null
        assert rows[(None, 4)]["a_v__equals__b_v"] == FIRST_NULL
        assert rows[(None, 4)]["a_v__minus__b_v"] is None
        # k=3: left value null AND right row missing → both null
        assert rows[(3, None)]["a_v__equals__b_v"] == BOTH_NULL

    def test_both_null(self, spark):
        d1 = spark.createDataFrame([(1, None)], "k long, v double")
        d2 = spark.createDataFrame([(1, None)], "k long, v double")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        assert out.collect()[0]["a_v__equals__b_v"] == BOTH_NULL

    def test_second_null(self, spark):
        d1 = spark.createDataFrame([(1, 5.0)], "k long, v double")
        d2 = spark.createDataFrame([(1, None)], "k long, v double")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        r = out.collect()[0]
        assert r["a_v__equals__b_v"] == SECOND_NULL
        assert r["a_v__minus__b_v"] is None

    def test_zero_diff_columns_empty_result(self, num_df1, num_df2):
        out = create_diff(num_df1, "a", num_df2, "b", _params(["k"], []))
        assert out.columns == ["a_k", "b_k"]
        assert out.count() == 0


class TestThresholds:
    def test_within_default_threshold_equal(self, spark):
        d1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
        d2 = spark.createDataFrame([(1, 1.0 + 1e-7)], "k long, v double")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        r = out.collect()[0]
        assert r["a_v__equals__b_v"] == EQUAL
        assert r["a_v__minus__b_v"] == 0.0  # zeroed when within ε (:155)

    def test_beyond_default_threshold(self, spark):
        d1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
        d2 = spark.createDataFrame([(1, 1.0 + 1e-5)], "k long, v double")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        r = out.collect()[0]
        assert r["a_v__equals__b_v"] == NOT_EQUAL
        assert r["a_v__minus__b_v"] == pytest.approx(-1e-5)

    def test_per_column_threshold_overrides(self, spark):
        d1 = spark.createDataFrame([(1, 1.0, 1.0)], "k long, v double, w double")
        d2 = spark.createDataFrame([(1, 1.4, 1.4)], "k long, v double, w double")
        out = create_diff(
            d1, "a", d2, "b", _params(["k"], ["v", "w"], thresholds=[0.5, 0.1])
        )
        r = out.collect()[0]
        assert r["a_v__equals__b_v"] == EQUAL      # 0.4 <= 0.5
        assert r["a_w__equals__b_w"] == NOT_EQUAL  # 0.4 > 0.1

    def test_command_threshold(self, spark):
        d1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
        d2 = spark.createDataFrame([(1, 1.4)], "k long, v double")
        out = create_diff(
            d1, "a", d2, "b", _params(["k"], ["v"]), numeric_threshold=0.5
        )
        assert out.collect()[0]["a_v__equals__b_v"] == EQUAL


class TestTypes:
    def test_mixed_numeric_types_diff_types_with_minus(self, spark):
        # Int vs Double: status 'different types' but still a minus column
        # (reference test :274-275)
        d1 = spark.createDataFrame([(1, 5)], "k long, v int")
        d2 = spark.createDataFrame([(1, 5.0)], "k long, v double")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        r = out.collect()[0]
        assert r["a_v__equals__b_v"] == DIFF_TYPES
        assert "a_v__minus__b_v" in out.columns
        assert r["a_v__minus__b_v"] == 0.0

    def test_string_equality(self, spark):
        d1 = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
        d2 = spark.createDataFrame([(1, "x"), (2, "z")], "k long, v string")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["v"]))
        rows = {r["a_k"]: r for r in out.collect()}
        assert rows[1]["a_v__equals__b_v"] == EQUAL
        assert rows[2]["a_v__equals__b_v"] == NOT_EQUAL
        assert "a_v__minus__b_v" not in out.columns

    def test_boolean_and_date_and_timestamp(self, spark):
        d1 = spark.createDataFrame(
            [(1, True, datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 1))],
            "k long, b boolean, d date, t timestamp",
        )
        d2 = spark.createDataFrame(
            [(1, False, datetime.date(2020, 1, 1), datetime.datetime(2020, 1, 1, 2))],
            "k long, b boolean, d date, t timestamp",
        )
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["b", "d", "t"]))
        r = out.collect()[0]
        assert r["a_b__equals__b_b"] == NOT_EQUAL
        assert r["a_d__equals__b_d"] == EQUAL
        assert r["a_t__equals__b_t"] == NOT_EQUAL

    def test_array_and_struct(self, spark):
        d1 = spark.createDataFrame(
            [(1, [1, 2], {"i": 10})], "k long, arr array<long>, s struct<i: long>"
        )
        d2 = spark.createDataFrame(
            [(1, [1, 2], {"i": 11})], "k long, arr array<long>, s struct<i: long>"
        )
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["arr", "s"]))
        r = out.collect()[0]
        assert r["a_arr__equals__b_arr"] == EQUAL
        assert r["a_s__equals__b_s"] == NOT_EQUAL

    def test_nested_column_access_flattened(self, spark):
        # dotted path diff: '.' replaced by '_' in output names (:109)
        d1 = spark.createDataFrame([(1, {"i": 10})], "k long, s struct<i: long>")
        d2 = spark.createDataFrame([(1, {"i": 12})], "k long, s struct<i: long>")
        out = create_diff(d1, "a", d2, "b", _params(["k"], ["s.i"]))
        r = out.collect()[0]
        assert "a_s_i__minus__b_s_i" in out.columns
        assert r["a_s_i__minus__b_s_i"] == -2
        assert r["a_s_i__equals__b_s_i"] == NOT_EQUAL


class TestFilterEqualRows:
    def test_filters_fully_equal(self, spark):
        d1 = spark.createDataFrame([(1, 1.0, "x"), (2, 2.0, "y")], "k long, v double, s string")
        d2 = spark.createDataFrame([(1, 1.0, "x"), (2, 2.5, "y")], "k long, v double, s string")
        out = create_diff(
            d1, "a", d2, "b", _params(["k"], ["v", "s"]), filter_equal_rows=True
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["a_k"] == 2

    def test_keeps_unmatched_rows(self, spark):
        d1 = spark.createDataFrame([(1, 1.0)], "k long, v double")
        d2 = spark.createDataFrame([(2, 1.0)], "k long, v double")
        out = create_diff(
            d1, "a", d2, "b", _params(["k"], ["v"]), filter_equal_rows=True
        )
        assert out.count() == 2

    def test_both_null_filtered_out(self, spark):
        # both-null pair: a <=> b is true → row dropped (reference :178-180)
        d1 = spark.createDataFrame([(1, None)], "k long, v double")
        d2 = spark.createDataFrame([(1, None)], "k long, v double")
        out = create_diff(
            d1, "a", d2, "b", _params(["k"], ["v"]), filter_equal_rows=True
        )
        assert out.count() == 0


class TestValidation:
    def test_join_length_mismatch(self, num_df1, num_df2):
        with pytest.raises(ValueError, match="joinColumns must be of the same length"):
            create_diff(
                num_df1, "a", num_df2, "b",
                DiffParams(DiffSide(("k",), ("v",)), DiffSide(("k", "v"), ("v",))),
            )

    def test_diff_length_mismatch(self, num_df1, num_df2):
        with pytest.raises(ValueError, match="diffColumns must be of the same length"):
            create_diff(
                num_df1, "a", num_df2, "b",
                DiffParams(DiffSide(("k",), ("v",)), DiffSide(("k",), ())),
            )

    def test_empty_join_columns(self, num_df1, num_df2):
        with pytest.raises(ValueError, match="There must be columns to join on"):
            create_diff(
                num_df1, "a", num_df2, "b",
                DiffParams(DiffSide((), ("v",)), DiffSide((), ("v",))),
            )

    def test_non_unique_key(self, spark, num_df2):
        dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k long, v double")
        with pytest.raises(ValueError, match="unique key"):
            create_diff(dup, "a", num_df2, "b", _params(["k"], ["v"]))

    def test_null_key(self, spark, num_df2):
        nullk = spark.createDataFrame([(None, 1.0)], "k long, v double")
        with pytest.raises(ValueError, match="contain nulls"):
            create_diff(nullk, "a", num_df2, "b", _params(["k"], ["v"]))


def test_schema_diff_statuses(spark):
    from topnotch_spark.operators.diff import schema_diff

    a = spark.createDataFrame([], "id long, price double, gone string")
    b = spark.createDataFrame([], "id long, price decimal(10,2), fresh int")
    out = {r["column"]: r for r in schema_diff(a, b).collect()}
    assert out["id"]["status"] == "same"
    assert out["price"]["status"] == "type_changed"
    assert out["price"]["type_first"] == "double"
    assert out["price"]["type_second"] == "decimal(10,2)"
    assert out["gone"]["status"] == "removed" and out["gone"]["type_second"] is None
    assert out["fresh"]["status"] == "added" and out["fresh"]["type_first"] is None
    # case-insensitive matching like the row diff
    c = spark.createDataFrame([], "ID long")
    assert schema_diff(a, c).collect()[0] or True
    assert {r["column"]: r["status"] for r in schema_diff(
        spark.createDataFrame([], "X long"), spark.createDataFrame([], "x long")
    ).collect()} == {"x": "same"}
