"""Unit tests: SCD2 merge, interval lookup join, compaction."""

from __future__ import annotations

import datetime as dt

import pytest

from topnotch_spark.operators.scd import scd2_merge
from topnotch_spark.operators.temporal import interval_join
from topnotch_spark.sources.maintenance import compact_table

D0 = dt.date(1992, 1, 1)
DU = dt.date(1996, 6, 1)


def _current(spark):
    # key, tracked(seg, bal), valid_from, valid_to, is_current
    return spark.createDataFrame(
        [
            (1, "AUTO", 100.0, D0, None, True),
            (2, "BIKE", 200.0, D0, None, True),
            (3, "AUTO", 300.0, D0, None, True),
            # key 3 already has one closed historical row
            (3, "SHIP", 250.0, dt.date(1990, 1, 1), D0, False),
        ],
        "k int, seg string, bal double, valid_from date, "
        "valid_to date, is_current boolean",
    )


def test_scd2_merge_cases(spark):
    cur = _current(spark)
    upd = spark.createDataFrame(
        [
            (1, "AUTO", 100.0, DU),   # unchanged -> passthrough
            (2, "MOTO", 200.0, DU),   # changed seg -> close + insert
            (9, "NEW", 50.0, DU),     # new key -> insert
            # key 3 has no update -> passthrough (open + closed history)
        ],
        "k int, seg string, bal double, ts date",
    )
    out = scd2_merge(cur, upd, ["k"], ["seg", "bal"], "ts")
    rows = {
        (r["k"], r["valid_from"], r["is_current"]): (
            r["seg"], r["bal"], r["valid_to"])
        for r in out.collect()
    }
    assert len(rows) == 6
    assert rows[(1, D0, True)] == ("AUTO", 100.0, None)
    assert rows[(2, D0, False)] == ("BIKE", 200.0, DU)      # closed
    assert rows[(2, DU, True)] == ("MOTO", 200.0, None)     # new version
    assert rows[(9, DU, True)] == ("NEW", 50.0, None)       # brand new
    assert rows[(3, D0, True)] == ("AUTO", 300.0, None)     # untouched
    assert rows[(3, dt.date(1990, 1, 1), False)] == ("SHIP", 250.0, D0)


def test_scd2_merge_null_safe_tracked(spark):
    cur = spark.createDataFrame(
        [(1, None, D0, None, True)],
        "k int, seg string, valid_from date, valid_to date, is_current boolean",
    )
    # null -> null is NOT a change; null -> value is
    upd_same = spark.createDataFrame([(1, None, DU)], "k int, seg string, ts date")
    upd_diff = spark.createDataFrame([(1, "X", DU)], "k int, seg string, ts date")
    assert scd2_merge(cur, upd_same, ["k"], ["seg"], "ts").count() == 1
    assert scd2_merge(cur, upd_diff, ["k"], ["seg"], "ts").count() == 2


def test_scd2_merge_validates_updates(spark):
    cur = _current(spark)
    dup = spark.createDataFrame(
        [(1, "A", 1.0, DU), (1, "B", 2.0, DU)],
        "k int, seg string, bal double, ts date",
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        scd2_merge(cur, dup, ["k"], ["seg", "bal"], "ts")
    nullk = spark.createDataFrame(
        [(None, "A", 1.0, DU)], "k int, seg string, bal double, ts date"
    )
    with pytest.raises(ValueError, match="null keys"):
        scd2_merge(cur, nullk, ["k"], ["seg", "bal"], "ts")


def test_scd2_merge_idempotent(spark):
    """Re-applying the same batch changes nothing (updates now match)."""
    cur = _current(spark)
    upd = spark.createDataFrame(
        [(2, "MOTO", 200.0, DU)], "k int, seg string, bal double, ts date"
    )
    once = scd2_merge(cur, upd, ["k"], ["seg", "bal"], "ts")
    twice = scd2_merge(once, upd, ["k"], ["seg", "bal"], "ts")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_interval_join_basic(spark):
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 10.0), (5, -3.0), (6, 99.0)],
        "id int, v double",
    )
    ranges = spark.createDataFrame(
        [("low", -10.0, 10.0), ("mid", 10.0, 20.0), ("wide", 0.0, 30.0)],
        "band string, lo double, hi double",
    )
    out = interval_join(facts, ranges, "v", "lo", "hi", ["band"])
    got = sorted((r["id"], r["band"]) for r in out.collect())
    # half-open [lo, hi): v=10 is mid+wide, not low; overlaps duplicate
    assert got == [
        (1, "low"), (1, "wide"), (2, "mid"), (2, "wide"),
        (3, "wide"), (4, "mid"), (4, "wide"), (5, "low"),
    ]


def test_interval_join_matches_theta_join(spark):
    """Chunked equi-join == naive theta join on random-ish data."""
    facts = spark.range(200).selectExpr("id", "cast(id * 7 % 97 as double) v")
    ranges = spark.range(12).selectExpr(
        "concat('b', id) band",
        "cast(id * 11 % 50 as double) lo",
        "cast(id * 11 % 50 + (id % 7) * 9 as double) hi",
    )
    got = sorted(
        (r["id"], r["band"])
        for r in interval_join(
            facts, ranges, "v", "lo", "hi", ["band"], chunk_width=13.0
        ).collect()
    )
    want = sorted(
        (r["id"], r["band"])
        for r in facts.join(
            ranges, (facts.v >= ranges.lo) & (facts.v < ranges.hi)
        ).collect()
    )
    assert got == want and len(want) > 0


def test_interval_join_with_keys(spark):
    facts = spark.createDataFrame(
        [("us", 5.0), ("eu", 5.0)], "region string, v double"
    )
    ranges = spark.createDataFrame(
        [("us", 0.0, 10.0, "us-band"), ("eu", 4.0, 6.0, "eu-band")],
        "region string, lo double, hi double, band string",
    )
    out = interval_join(
        facts, ranges, "v", "lo", "hi", ["band"], on=["region"]
    )
    got = sorted((r["region"], r["band"]) for r in out.collect())
    assert got == [("eu", "eu-band"), ("us", "us-band")]


def test_interval_join_rejects_degenerate(spark):
    facts = spark.range(1).selectExpr("cast(id as double) v")
    empty = spark.createDataFrame([], "lo double, hi double, band string")
    with pytest.raises(ValueError, match="chunk_width"):
        interval_join(facts, empty, "v", "lo", "hi", ["band"])


def test_compact_table(spark, tmp_path):
    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    spark.range(10_000).selectExpr(
        "id", "cast(id % 100 as double) v"
    ).repartition(40).write.parquet(src)
    stats = compact_table(spark, src, dest, target_file_mb=1024).collect()[0]
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    assert stats["n_rows"] == 10_000
    back = spark.read.parquet(dest)
    assert back.count() == 10_000
    assert sorted(back.columns) == ["id", "v"]
    # values survive the rewrite
    assert back.selectExpr("sum(id) s").collect()[0]["s"] == 10_000 * 9_999 // 2


def test_compact_table_rejects_bad_target(spark, tmp_path):
    with pytest.raises(ValueError, match="target_file_mb"):
        compact_table(spark, str(tmp_path), str(tmp_path / "o"), 0)


def test_cdc_apply_latest_wins_and_tiebreak(spark):
    from topnotch_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    # key 1: upsert then (same ts, higher seq) delete -> deleted
    # key 2: two upserts, higher seq wins
    # key 4: insert of a brand-new key
    changes = spark.createDataFrame(
        [
            (1, "a2", "u", 10, 1), (1, "a2", "d", 10, 2),
            (2, "b2", "u", 10, 1), (2, "b3", "u", 10, 2),
            (4, "new", "c", 10, 1),
        ],
        "k long, v string, op string, ts long, seq long",
    )
    out = {
        r["k"]: r["v"]
        for r in cdc_apply(
            snap, changes, ["k"], "ts", "op", tiebreak_col="seq"
        ).collect()
    }
    assert out == {2: "b3", 3: "c", 4: "new"}


def test_cdc_apply_missing_columns_raises(spark):
    import pytest as _pytest

    from topnotch_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    bad = spark.createDataFrame([(1, "a")], "k long, v string")
    with _pytest.raises(ValueError, match="missing columns"):
        cdc_apply(snap, bad, ["k"], "ts", "op")


def test_cdc_apply_plan(spark, tmp_path):
    import json as _json

    from topnotch_spark.engine import TnEngine

    snap = tmp_path / "snap"
    ch = tmp_path / "changes"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).write.parquet(str(snap))
    spark.createDataFrame(
        [(1, "a9", "u", 5, 1), (2, "b", "d", 5, 1)],
        "k long, v string, op string, ts long, seq long",
    ).write.parquet(str(ch))
    plan = {
        "commands": [
            {
                "command": "cdcApply",
                "snapshot": {"ref": str(snap), "onDisk": True},
                "changes": {"ref": str(ch), "onDisk": True},
                "params": {"keys": ["k"], "tsColumn": "ts",
                           "opColumn": "op", "tiebreakColumn": "seq"},
                "outputKey": "applied",
            },
        ],
    }
    p = tmp_path / "plan.json"
    p.write_text(_json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    out = {r["k"]: r["v"] for r in engine.registry["applied"].collect()}
    assert out == {1: "a9"}
