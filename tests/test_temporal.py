"""As-of join and range join unit tests with hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from topnotch_spark.operators.temporal import asof_join, range_join_pairs

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(100)), (1, _ts(200)), (1, _ts(50)), (2, _ts(100))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(90), "a"), (1, _ts(150), "b"), (2, _ts(500), "c")],
        "k int, ts timestamp, tag string",
    )
    out = {
        (r["k"], r["ts"]): (r["ts_r"], r["tag_r"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["tag"], suffix="_r",
        ).collect()
    }
    assert out[(1, _ts(100))] == (_ts(90), "a")   # latest at-or-before
    assert out[(1, _ts(200))] == (_ts(150), "b")
    assert out[(1, _ts(50))] == (None, None)      # nothing before
    assert out[(2, _ts(100))] == (None, None)     # right is in the future


def test_asof_join_equality_matches(spark):
    left = spark.createDataFrame([(1, _ts(100))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(100), "same")], "k int, ts timestamp, tag string"
    )
    r = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], suffix="_r",
    ).collect()[0]
    assert r["tag_r"] == "same"  # ts equality is a match (ASOF >= semantics)


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(100))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), "old")], "k int, ts timestamp, tag string"
    )
    with_tol = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], suffix="_r", tolerance_seconds=60,
    ).collect()[0]
    assert with_tol["tag_r"] is None  # 90s gap > 60s tolerance
    without = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["tag"], suffix="_r", tolerance_seconds=120,
    ).collect()[0]
    assert without["tag_r"] == "old"


def test_range_join_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, 10, _ts(0)),
            (1, 11, _ts(30)),    # 30s after id 10 -> pair
            (1, 12, _ts(100)),   # 70s after 11 (no), 100s after 10 (no)
            (2, 20, _ts(0)),     # other key, no cross-key pairs
            (1, 13, _ts(30)),    # same ts as 11 -> pair with 11 (id order)
        ],
        "k int, id int, ts timestamp",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dt_seconds"]
        for r in range_join_pairs(
            df, on=["k"], ts_col="ts", id_col="id", tolerance_seconds=60
        ).collect()
    }
    # (11,12) is 70s apart -> excluded; (11,13) tie broken by id order
    assert pairs == {(10, 11): 30.0, (10, 13): 30.0, (11, 13): 0.0}


def test_range_join_bucket_boundary(spark):
    # pair straddling a bucket boundary must still be found
    df = spark.createDataFrame(
        [(1, 1, _ts(59)), (1, 2, _ts(61))], "k int, id int, ts timestamp"
    )
    got = range_join_pairs(
        df, on=["k"], ts_col="ts", id_col="id", tolerance_seconds=60
    ).collect()
    assert len(got) == 1 and got[0]["dt_seconds"] == 2.0


# ---------------------------------------------------------------------------
# randomized cross-validation against naive Python references (seeded)
# ---------------------------------------------------------------------------

def _random_events(seed: int, n: int, n_keys: int):
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(n_keys), i, _ts(rng.randrange(0, 5000)))
        for i in range(n)
    ]


def test_asof_join_matches_naive_reference(spark):
    left_rows = _random_events(1, 120, 5)
    right_rows = [
        (k, i + 1000, t) for (k, i, t) in _random_events(2, 80, 5)
    ]
    # dedupe right per (k, ts) keeping max id — the operator's documented
    # tie contract
    best = {}
    for k, i, t in right_rows:
        if (k, t) not in best or i > best[(k, t)][1]:
            best[(k, t)] = (k, i, t)
    right_rows = list(best.values())

    left = spark.createDataFrame(left_rows, "k int, id int, ts timestamp")
    right = spark.createDataFrame(right_rows, "k int, rid int, ts timestamp")
    got = {
        r["id"]: r["rid_r"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["rid"], suffix="_r",
        ).collect()
    }
    for k, i, t in left_rows:
        cands = [(rt, ri) for (rk, ri, rt) in right_rows if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, f"left id {i}"


def test_range_join_matches_naive_reference(spark):
    rows = _random_events(3, 100, 4)
    df = spark.createDataFrame(rows, "k int, id int, ts timestamp")
    tol = 120
    got = {
        (r["id_a"], r["id_b"])
        for r in range_join_pairs(
            df, on=["k"], ts_col="ts", id_col="id", tolerance_seconds=tol
        ).collect()
    }
    expect = set()
    for (k1, i1, t1) in rows:
        for (k2, i2, t2) in rows:
            if k1 == k2 and (t1, i1) < (t2, i2) and (t2 - t1).total_seconds() <= tol:
                expect.add((i1, i2))
    assert got == expect


def test_range_join_pre_1970_timestamps(spark):
    """Negative epoch micros must bucket with floor, not truncate-toward-
    zero: a pair straddling a bucket boundary below 1970 would otherwise
    be silently dropped."""
    import datetime as dt

    from topnotch_spark.operators.temporal import range_join_pairs

    rows = [
        (1, "u", dt.datetime(1969, 12, 31, 23, 59, 30)),   # -30s epoch
        (2, "u", dt.datetime(1970, 1, 1, 0, 0, 20)),        # +20s epoch
        (3, "u", dt.datetime(1969, 12, 31, 23, 58, 0)),     # -120s epoch
        (4, "u", dt.datetime(1969, 12, 31, 23, 58, 50)),    # -70s epoch
    ]
    df = spark.createDataFrame(rows, "event_id int, user_id string, ts timestamp")
    pairs = {
        (r["id_a"], r["id_b"]): r["dt_seconds"]
        for r in range_join_pairs(
            df, ["user_id"], "ts", "event_id", tolerance_seconds=60
        ).collect()
    }
    # (1, 2): -30s -> +20s = 50s apart, straddles the epoch-0 boundary
    assert pairs[(1, 2)] == 50.0
    # (3, 4): -120s -> -70s = 50s apart, straddles the -60s boundary
    assert pairs[(3, 4)] == 50.0
    # (4, 1): -70s -> -30s = 40s apart, same negative bucket
    assert pairs[(4, 1)] == 40.0
    assert (3, 2) not in pairs and (3, 1) not in pairs  # > 60s apart


def test_latest_per_key_tiebreak(spark):
    import datetime as dt

    from topnotch_spark.operators.temporal import latest_per_key

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 100, t, "a"),
            (2, 100, t, "b"),              # same ts: higher id wins
            (3, 100, t - dt.timedelta(1), "c"),
            (4, 200, t, "d"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    out = {r["user_id"]: r for r in latest_per_key(df, ["user_id"], "ts", "event_id").collect()}
    assert out[100]["event_id"] == 2
    assert out[200]["event_id"] == 4
    assert len(out) == 2


def test_resample_timeseries_fills_gaps(spark):
    import datetime as dt

    from topnotch_spark.operators.temporal import resample_timeseries

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        (d(1), "a", 1.0),
        (d(1, 5), "a", 2.0),
        (d(4), "a", 4.0),   # days 2-3 missing for a
        (d(2), "b", 8.0),   # b missing days 1, 3, 4
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["event_type"], r["bucket_start"].day): (r["n_events"], r["sum_value"])
        for r in resample_timeseries(df, "ts", "event_type", "value").collect()
    }
    # dense grid: 4 days x 2 types
    assert len(out) == 8
    assert out[("a", 1)] == (2, 3.0)
    assert out[("a", 2)] == (0, 0.0)
    assert out[("a", 4)] == (1, 4.0)
    assert out[("b", 2)] == (1, 8.0)
    assert out[("b", 3)] == (0, 0.0)


def test_throttle_dedup_gap_semantics(spark):
    from topnotch_spark.operators.temporal import throttle_dedup

    df = spark.createDataFrame(
        [
            (1, 10, "a", _ts(0)),       # first per key -> kept
            (2, 10, "a", _ts(100)),     # 100s gap <= 300 -> dropped
            (3, 10, "a", _ts(500)),     # 400s gap > 300 -> kept
            (4, 10, "b", _ts(100)),     # different key -> first, kept
            (5, 20, "a", _ts(100)),     # different user -> first, kept
        ],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    rows = {
        r["event_id"]: (r["kept"], r["gap_seconds"])
        for r in throttle_dedup(
            df, ["user_id", "event_type"], "ts", "event_id", 300
        ).collect()
    }
    assert rows[1] == (True, None)
    assert rows[2] == (False, 100.0)
    assert rows[3] == (True, 400.0)
    assert rows[4][0] is True and rows[5][0] is True


def test_throttle_dedup_tie_order(spark):
    from topnotch_spark.operators.temporal import throttle_dedup

    # equal timestamps: the tiebreak id orders the lag chain
    df = spark.createDataFrame(
        [(2, 1, "x", _ts(0)), (1, 1, "x", _ts(0))],
        "event_id int, user_id int, event_type string, ts timestamp",
    )
    rows = {
        r["event_id"]: r["kept"]
        for r in throttle_dedup(df, ["user_id", "event_type"], "ts",
                                "event_id", 60).collect()
    }
    assert rows[1] is True and rows[2] is False  # 0s gap <= 60


def test_transition_counts(spark):
    from topnotch_spark.operators.temporal import transition_counts

    df = spark.createDataFrame(
        [
            (1, 1, _ts(0), "view"),
            (2, 1, _ts(10), "click"),
            (3, 1, _ts(20), "view"),
            (4, 2, _ts(0), "view"),
            (5, 2, _ts(5), "click"),
        ],
        "event_id int, user_id int, ts timestamp, event_type string",
    )
    out = {
        (r["prev_state"], r["next_state"]): r["n_transitions"]
        for r in transition_counts(
            df, "user_id", "ts", "event_id", "event_type"
        ).collect()
    }
    # user1: view->click, click->view; user2: view->click
    assert out == {("view", "click"): 2, ("click", "view"): 1}


def test_funnel_stages_strict_order(spark):
    from topnotch_spark.operators.temporal import funnel_stages

    df = spark.createDataFrame(
        [
            # u1 completes the funnel in order
            (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "buy"),
            # u2 clicks BEFORE viewing -> stops at view
            (2, _ts(10), "click"), (2, _ts(20), "view"),
            # u3 views+clicks but never buys
            (3, _ts(0), "view"), (3, _ts(5), "click"),
            # u4 only buys -> counts nowhere
            (4, _ts(0), "buy"),
        ],
        "user_id int, ts timestamp, event_type string",
    )
    out = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(
            df, "user_id", "ts", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "buy": 1}


def test_funnel_stages_empty_raises(spark):
    import pytest

    from topnotch_spark.operators.temporal import funnel_stages

    df = spark.createDataFrame([], "user_id int, ts timestamp, event_type string")
    with pytest.raises(ValueError):
        funnel_stages(df, "user_id", "ts", "event_type", [])
