"""Bucketed co-located diff: the per-run plan must contain no shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topnotch_spark.operators.diff import DiffParams, DiffSide, create_diff
from topnotch_spark.sources.bucketing import (
    plan_has_exchange,
    read_table,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_orders(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    modified = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    write_bucketed(orders, "orders_a", ["o_orderkey"], 4)
    write_bucketed(modified, "orders_b", ["o_orderkey"], 4)
    # simulate the big-big case bucketing exists for: at test sizes the
    # planner would rather broadcast (and rightly ignores buckets)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "orders_a", "orders_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS orders_a")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_orders):
    a, b = bucketed_orders
    joined = read_table(spark, a).join(read_table(spark, b), "o_orderkey")
    assert not plan_has_exchange(joined)
    assert joined.count() == read_table(spark, a).count()


def test_bucketed_diff_correct_and_shuffle_light(spark, bucketed_orders):
    a, b = bucketed_orders
    df1, df2 = read_table(spark, a), read_table(spark, b)
    diff = create_diff(
        df1,
        "a",
        df2,
        "b",
        DiffParams(
            DiffSide(("o_orderkey",), ("o_totalprice",)),
            DiffSide(("o_orderkey",), ("o_totalprice",)),
        ),
        filter_equal_rows=True,
    )
    changed = diff.count()
    expect = df1.filter("o_orderkey % 10 = 0").count()
    assert changed == expect
    # the diff's own outer join must not re-shuffle bucketed inputs
    assert not plan_has_exchange(
        df1.join(df2, df1["o_orderkey"] == df2["o_orderkey"], "outer")
    )
