"""Referential-integrity summaries and embedding quantization."""

from __future__ import annotations

from topnotch_spark.operators.integrity import (
    referential_integrity,
    referential_integrity_suite,
)
from topnotch_spark.operators.similarity import quantize_embeddings


def test_fk_orphans_nulls_and_matches(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = referential_integrity(child, parent, ["fk"], ["pk"], "c->p").collect()[0]
    assert row["relation"] == "c->p"
    assert row["n_child"] == 4
    # NULL FK opts out of the constraint, counted separately
    assert row["n_null_fk"] == 1
    assert row["n_orphans"] == 1  # fk=99 only
    assert row["orphan_frac"] == 0.25


def test_fk_duplicate_parents_do_not_multiply(spark):
    child = spark.createDataFrame([(1, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (10,), (10,)], "pk long")
    row = referential_integrity(child, parent, ["fk"], ["pk"], "r").collect()[0]
    assert row["n_orphans"] == 0 and row["n_child"] == 1


def test_fk_suite_row_per_relation(spark):
    child = spark.createDataFrame([(1, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    out = referential_integrity_suite([
        ("a", child, ["fk"], parent, ["pk"]),
        ("b", child, ["id"], parent, ["pk"]),
    ]).collect()
    assert [r["relation"] for r in out] == ["a", "b"]
    assert out[1]["n_orphans"] == 1  # id=1 is no parent pk


def test_quantize_roundtrip_error_bounded(spark):
    vecs = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        (3, [127.0, -127.0, 63.5, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = quantize_embeddings(df, "vec_id", "embedding").collect()
    assert len(rows) == 12
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], []).append(r)
    # zero vector: q = 0, scale = 0 (no division blowup)
    assert all(r["q"] == 0 and r["scale"] == 0.0 for r in by_vec[2])
    # clamp holds and dequantization error is within scale/2
    for vid, (_, vec) in zip([1, 3], [vecs[0], vecs[2]]):
        for r in sorted(by_vec[vid], key=lambda r: r["pos"]):
            assert -127 <= r["q"] <= 127
            err = abs(r["q"] * r["scale"] - vec[r["pos"]])
            assert err <= r["scale"] / 2 + 1e-9
    # extreme components hit exactly +/-127
    v3 = {r["pos"]: r["q"] for r in by_vec[3]}
    assert v3[0] == 127 and v3[1] == -127


def test_k_anonymity_risky_groups(spark):
    from topnotch_spark.operators.integrity import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [(None, 1)],
        "seg string, band int",
    )
    risky = {
        (r["seg"], r["band"]): r["group_size"]
        for r in k_anonymity(df, ["seg", "band"], k=5).collect()
    }
    # (a,1) meets k=5; (a,2) and the NULL tuple do not
    assert risky == {("a", 2): 2, (None, 1): 1}

    full = k_anonymity(df, ["seg", "band"], k=5, risky_only=False)
    rows = {(r["seg"], r["band"]): r["meets_k"] for r in full.collect()}
    assert rows == {("a", 1): True, ("a", 2): False, (None, 1): False}


def test_k_anonymity_rejects_bad_k(spark):
    import pytest

    from topnotch_spark.operators.integrity import k_anonymity

    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(spark.range(1), ["id"], k=0)
