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


def test_create_diff_plan_has_no_exchange(spark, bucketed_orders):
    """The diff operator ITSELF (not just a bare join) over bucketed
    tables plans zero Exchange — both snapshot shuffles were paid once at
    write time (VERDICT r5 #7)."""
    a, b = bucketed_orders
    diff = create_diff(
        read_table(spark, a),
        "a",
        read_table(spark, b),
        "b",
        DiffParams(
            DiffSide(("o_orderkey",), ("o_totalprice",)),
            DiffSide(("o_orderkey",), ("o_totalprice",)),
        ),
        filter_equal_rows=True,
    )
    assert not plan_has_exchange(diff)


def test_diff_command_over_bucketed_table_inputs(spark, bucketed_orders, tmp_path):
    """Plan-surface wiring: a diff command whose inputs are catalog
    tables (format: "table") runs shuffle-free over pre-bucketed
    snapshots and produces the same changed-row count."""
    import json

    from topnotch_spark.engine import TnEngine

    a, b = bucketed_orders
    plan = {
        "commands": [
            {
                "command": "diff",
                "input1": {"ref": a, "onDisk": True, "format": "table"},
                "input1Name": "a",
                "input2": {"ref": b, "onDisk": True, "format": "table"},
                "input2Name": "b",
                "outputKey": "bucketedDiff",
                "filterEqualRows": True,
                "params": {
                    "input1Columns": {
                        "joinColumns": ["o_orderkey"],
                        "diffColumns": ["o_totalprice"],
                    },
                    "input2Columns": {
                        "joinColumns": ["o_orderkey"],
                        "diffColumns": ["o_totalprice"],
                    },
                },
            }
        ]
    }
    path = tmp_path / "bucketed_diff_plan.json"
    path.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(path)) == 0
    out = engine.registry["bucketedDiff"]
    assert not plan_has_exchange(out)
    expect = read_table(spark, a).filter("o_orderkey % 10 = 0").count()
    assert out.count() == expect

    # a missing table name must fail static validation with the clear
    # invalid-input message, not a deep analysis error
    bad = dict(plan)
    bad["commands"] = [dict(plan["commands"][0])]
    bad["commands"][0] = {
        **bad["commands"][0],
        "input1": {"ref": "no_such_table", "onDisk": True, "format": "table"},
    }
    bad_path = tmp_path / "bad_bucketed_diff_plan.json"
    bad_path.write_text(json.dumps(bad))
    with pytest.raises(Exception, match="invalid"):
        TnEngine(spark).run(str(bad_path))


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
