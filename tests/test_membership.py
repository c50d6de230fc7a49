"""Bloom-filter membership: no false negatives ever; false positives
bounded and visible; build/probe parameter mismatch detectable."""

from __future__ import annotations

from pyspark.sql import functions as F

from topnotch_spark.operators.membership import bloom_build, bloom_probe


def _kv(n, start=0):
    return [(i, f"key-{i}") for i in range(start, start + n)]


def test_bloom_no_false_negatives(spark):
    seen = spark.createDataFrame(_kv(200), "id long, k string")
    bl = bloom_build(seen, "k", m_bits=4096, k_hashes=3)
    out = bloom_probe(seen, "id", "k", bl, m_bits=4096, k_hashes=3)
    assert out.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_rejects_most_unseen_at_low_load(spark):
    seen = spark.createDataFrame(_kv(100), "id long, k string")
    unseen = spark.createDataFrame(_kv(1000, start=10_000), "id long, k string")
    # ~40 bits/key: FP rate well under 1%
    bl = bloom_build(seen, "k", m_bits=4096, k_hashes=3)
    fp = (
        bloom_probe(unseen, "id", "k", bl, m_bits=4096, k_hashes=3)
        .filter(F.col("bloom_hit"))
        .count()
    )
    assert fp <= 20  # generous bound; expected ≈ a handful


def test_bloom_filter_is_compact(spark):
    seen = spark.createDataFrame(_kv(500), "id long, k string")
    bl = bloom_build(seen, "k", m_bits=1024, k_hashes=3)
    # at most m/32 words, only non-zero ones materialized
    assert bl.count() <= 1024 // 32


def test_bloom_saturated_filter_hits_everything(spark):
    seen = spark.createDataFrame(_kv(2000), "id long, k string")
    unseen = spark.createDataFrame(_kv(50, start=90_000), "id long, k string")
    bl = bloom_build(seen, "k", m_bits=256, k_hashes=3)  # way overloaded
    out = bloom_probe(unseen, "id", "k", bl, m_bits=256, k_hashes=3)
    # saturated filter: almost every probe reads as maybe-seen
    assert out.filter(F.col("bloom_hit")).count() >= 45
