"""Tests for SymSpell deletion-neighborhood fuzzy matching."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.fuzzy import fuzzy_match_pairs


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def _pairs(spark, rows, **kw):
    return {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_match_pairs(_df(spark, rows), "id", "name", **kw).collect()
    }


def test_substitution_insertion_deletion_all_found(spark):
    rows = [
        (1, "acme corp"),
        (2, "acme c0rp"),   # substitution
        (3, "acme corps"),  # insertion
        (4, "acme cor"),    # deletion
        (5, "totally different"),
    ]
    out = _pairs(spark, rows)
    assert (1, 2) in out and out[(1, 2)] == 1
    assert (1, 3) in out and out[(1, 3)] == 1
    assert (1, 4) in out and out[(1, 4)] == 1
    assert not any(5 in p for p in out)


def test_exact_duplicates_distance_zero(spark):
    out = _pairs(spark, [(1, "same"), (2, "same")])
    assert out == {(1, 2): 0}


def test_distance_two_not_matched(spark):
    # two substitutions -> outside the d=1 neighborhood
    out = _pairs(spark, [(1, "abcdef"), (2, "abcxxf")])
    assert out == {}


def test_normalization_case_and_trim(spark):
    out = _pairs(spark, [(1, "  Acme "), (2, "acmes")])
    assert (1, 2) in out


def test_pair_reported_once_despite_shared_keys(spark):
    # equal strings share len+1 deletion keys; distinct() must collapse
    out = fuzzy_match_pairs(
        _df(spark, [(1, "aaaa"), (2, "aaaa")]), "id", "name"
    ).collect()
    assert len(out) == 1


def test_max_key_df_valve_drops_hot_keys(spark):
    rows = [(i, f"x{i}") for i in range(1, 10)]  # all share deletion "x"
    full = _pairs(spark, rows)
    capped = _pairs(spark, rows, max_key_df=3)
    assert len(capped) <= len(full)


def test_unsupported_distance_raises(spark):
    with pytest.raises(ValueError, match="max_distance=1"):
        _pairs(spark, [(1, "a")], max_distance=2)


def test_empty_strings_excluded(spark):
    out = _pairs(spark, [(1, "   "), (2, "")])
    assert out == {}
