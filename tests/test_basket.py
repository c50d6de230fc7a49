"""Market-basket co-occurrence unit tests (hand-computed lifts)."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.basket import market_basket_pairs


def _rows(df):
    return {
        (r["item_a"], r["item_b"]): (
            r["pair_count"], r["count_a"], r["count_b"], r["lift"])
        for r in df.collect()
    }


def test_basket_pairs_counts_and_lift(spark):
    # baskets: 1={x,y}, 2={x,y}, 3={x,z}, 4={y}; duplicates collapse
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (1, "y"),
         (2, "x"), (2, "y"),
         (3, "x"), (3, "z"),
         (4, "y")],
        "b int, i string",
    )
    out = _rows(market_basket_pairs(df, "b", "i", min_support=1))
    # n_baskets=4, count x=3, y=3, z=1
    assert out[("x", "y")] == (2, 3, 3, round(2 * 4 / (3 * 3), 6))
    assert out[("x", "z")] == (1, 3, 1, round(1 * 4 / (3 * 1), 6))
    assert ("y", "z") not in out  # never co-occur


def test_basket_pairs_min_support_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, None)],
        "b int, i string",
    )
    out = _rows(market_basket_pairs(df, "b", "i", min_support=2))
    assert list(out) == [("x", "y")]  # NULL items ignored; support filter


def test_basket_pairs_mega_basket_valve(spark):
    rows = [(1, f"i{k}") for k in range(10)] + [(2, "i0"), (2, "i1")]
    df = spark.createDataFrame(rows, "b int, i string")
    out = _rows(
        market_basket_pairs(df, "b", "i", min_support=1, max_basket_items=5)
    )
    # basket 1 (10 items) is excluded from pairing; margins still count it
    assert list(out) == [("i0", "i1")]
    assert out[("i0", "i1")] == (1, 2, 2, round(1 * 2 / (2 * 2), 6))


def test_basket_pairs_set_semantics(spark):
    df = spark.createDataFrame(
        [(1, "x")] * 5 + [(1, "y")] * 3, "b int, i string"
    )
    out = _rows(market_basket_pairs(df, "b", "i", min_support=1))
    assert out[("x", "y")][0] == 1  # presence, not multiplicity
