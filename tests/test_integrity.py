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
