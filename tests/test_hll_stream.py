"""Deterministic md5-register HLL distinct sketch (streaming/ops.
hll_register_stream + windowed_distinct_estimate): python replay of the
register spec, accuracy vs exact distinct, merge insensitivity, and
stream == batch."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from topnotch_spark.streaming.ops import (
    hll_register_stream,
    windowed_distinct_estimate,
)


def _py_regs(keys):
    """Python replay of the register spec over one window."""
    regs: dict[int, int] = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(h[:2], 16)
        v = int(h[2:10], 16)
        rho = 33 if v == 0 else 33 - v.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _py_estimate(regs):
    import math

    d = sum(1 << (33 - r) for r in regs.values()) + (256 - len(regs)) * (1 << 33)
    raw = (7182 * 256 * 256 * (1 << 33)) // (10000 * d)
    zeros = 256 - len(regs)
    if zeros > 0 and raw <= 640:
        return round(256 * math.log(256 / zeros))
    return raw


def test_registers_match_python_replay(spark):
    keys = list(range(1, 401))
    df = spark.createDataFrame(
        [("2024-01-01 05:30:00", k) for k in keys],
        "ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    regs = {
        r["reg"]: r["max_rho"]
        for r in hll_register_stream(df).collect()
    }
    assert regs == _py_regs(keys)


def test_estimate_matches_python_and_tracks_exact(spark):
    for n in (50, 400, 3000):
        keys = list(range(n))
        df = spark.createDataFrame(
            [("2024-01-01 05:30:00", k) for k in keys],
            "ts string, user_id long",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        row = windowed_distinct_estimate(hll_register_stream(df)).collect()[0]
        assert row["est_distinct"] == _py_estimate(_py_regs(keys))
        # HLL rsd at m=256 is ~6.5% (linear counting tighter below
        # 2.5m); allow 4 sigma
        assert abs(row["est_distinct"] - n) <= max(0.26 * n, 12)


def test_duplicates_do_not_move_the_estimate(spark):
    once = [("2024-01-01 05:30:00", k) for k in range(500)]
    many = once * 7
    df1 = spark.createDataFrame(once, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    df7 = spark.createDataFrame(many, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    e1 = windowed_distinct_estimate(hll_register_stream(df1)).collect()[0]
    e7 = windowed_distinct_estimate(hll_register_stream(df7)).collect()[0]
    assert e1["est_distinct"] == e7["est_distinct"]


def test_merge_of_parts_equals_whole(spark):
    """Register-max union across batches == registers of the whole: the
    mergeable-sketch property the streaming complete-mode agg relies
    on."""
    rows = [("2024-01-01 05:30:00", k) for k in range(1000)]
    df = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    whole = hll_register_stream(df)
    part_a = hll_register_stream(df.filter(F.col("user_id") % 2 == 0))
    part_b = hll_register_stream(df.filter(F.col("user_id") % 2 == 1))
    merged = (
        part_a.union(part_b)
        .groupBy("window_start", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    got = {(r["reg"]): r["max_rho"] for r in merged.collect()}
    want = {(r["reg"]): r["max_rho"] for r in whole.collect()}
    assert got == want


def test_stream_equals_batch(spark, tmp_path):
    """The stateful streamed registers equal the batch groupBy over the
    same rows — MAX is batch-boundary-insensitive."""
    from topnotch_spark.streaming import run_stream_to_table

    rows = [
        ("2024-01-01 05:%02d:00" % (i % 60), i % 700) for i in range(2000)
    ]
    src = str(tmp_path / "replay")
    batch_df = spark.createDataFrame(
        rows, "ts string, user_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch_df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_stream_to_table(
        hll_register_stream(stream),
        output_mode="complete",
        state_partitions=4,
    )
    got = {
        (r["window_start"], r["reg"]): r["max_rho"] for r in streamed.collect()
    }
    want = {
        (r["window_start"], r["reg"]): r["max_rho"]
        for r in hll_register_stream(batch_df).collect()
    }
    assert got == want
