"""Grid-blocked spatial within-radius join unit tests."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.spatial import within_radius_join


def test_within_radius_basic(spark):
    left = spark.createDataFrame(
        [(1, 0, 0), (2, 100, 100)], "lid int, x bigint, y bigint"
    )
    right = spark.createDataFrame(
        [(10, 3, 4), (11, 0, 11), (12, 103, 96)],
        "rid int, x bigint, y bigint",
    )
    out = {
        (r["lid"], r["rid"]): r["dist_sq"]
        for r in within_radius_join(left, right, radius=10).collect()
    }
    # (1,10): 3²+4²=25 <= 100; (1,11): 121 > 100 excluded;
    # (2,12): 3²+4²=25
    assert out == {(1, 10): 25, (2, 12): 25}


def test_within_radius_boundary_inclusive(spark):
    left = spark.createDataFrame([(1, 0, 0)], "lid int, x bigint, y bigint")
    right = spark.createDataFrame([(2, 6, 8)], "rid int, x bigint, y bigint")
    assert within_radius_join(left, right, radius=10).count() == 1  # ==r²
    assert within_radius_join(left, right, radius=9.99).count() == 0


def test_within_radius_matches_bruteforce(spark):
    """Grid blocking finds exactly the brute-force pair set, including
    pairs straddling cell boundaries and negative coordinates."""
    left = spark.range(80).selectExpr(
        "id AS lid", "CAST(id * 37 % 97 - 40 AS BIGINT) x",
        "CAST(id * 53 % 89 - 40 AS BIGINT) y")
    right = spark.range(60).selectExpr(
        "id AS rid", "CAST(id * 41 % 97 - 40 AS BIGINT) x",
        "CAST(id * 59 % 89 - 40 AS BIGINT) y")
    got = sorted(
        (r["lid"], r["rid"])
        for r in within_radius_join(left, right, radius=7).collect()
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in left.toDF("lid", "lx", "ly")
        .crossJoin(right.toDF("rid", "rx", "ry"))
        .filter("(lx-rx)*(lx-rx) + (ly-ry)*(ly-ry) <= 49")
        .collect()
    )
    assert got == want and len(want) > 0


def test_within_radius_suffixes_collisions(spark):
    left = spark.createDataFrame([(1, 0, 0, "L")], "id int, x int, y int, tag string")
    right = spark.createDataFrame([(9, 1, 1, "R")], "id int, x int, y int, tag string")
    row = within_radius_join(left, right, radius=5).collect()[0]
    assert row["id_l"] == 1 and row["id_r"] == 9
    assert row["tag_l"] == "L" and row["tag_r"] == "R"
    assert row["dist_sq"] == 2


def test_within_radius_rejects_bad_radius(spark):
    df = spark.range(1).selectExpr("id", "id x", "id y")
    with pytest.raises(ValueError, match="radius"):
        within_radius_join(df, df, radius=0)
