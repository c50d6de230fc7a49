"""Chunking semantics: window/overlap math, short docs, empty docs,
reconstruction property (non-overlap parts concatenate to the doc)."""

from __future__ import annotations

import pytest

from topnotch_spark.operators.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_and_overlap(spark):
    # len 10, size 4, overlap 2 -> starts 0,2,4,6 (start 8 would yield
    # "ij", a strict substring of "ghij" -> suppressed)
    text = "abcdefghij"
    out = chunk_documents(
        _docs(spark, [(1, text)]), "doc_id", "text", size=4, overlap=2
    ).collect()
    chunks = {r["chunk_idx"]: r for r in out}
    assert [chunks[i]["chunk_text"] for i in range(4)] == [
        "abcd", "cdef", "efgh", "ghij",
    ]
    assert all(r["n_chunks"] == 4 for r in out)
    assert chunks[3]["chunk_start"] == 6


def test_no_redundant_tail_chunk(spark):
    # doc exactly `size` long: one chunk only, not a duplicated tail
    out = chunk_documents(
        _docs(spark, [(1, "x" * 400)]), "doc_id", "text", size=400, overlap=100
    ).collect()
    assert len(out) == 1 and out[0]["n_chunks"] == 1
    # tail longer than overlap still emitted
    out2 = chunk_documents(
        _docs(spark, [(1, "x" * 500)]), "doc_id", "text", size=400, overlap=100
    ).collect()
    assert len(out2) == 2 and out2[1 if out2[0]["chunk_idx"] == 0 else 0]["chunk_len"] == 200


def test_doc_shorter_than_size(spark):
    out = chunk_documents(
        _docs(spark, [(1, "xy")]), "doc_id", "text", size=100, overlap=10
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "xy"
    assert out[0]["n_chunks"] == 1


def test_empty_and_null_docs_dropped(spark):
    out = chunk_documents(
        _docs(spark, [(1, ""), (2, None), (3, "ok")]),
        "doc_id", "text", size=2, overlap=0,
    ).collect()
    assert {r["doc_id"] for r in out} == {3}


def test_zero_overlap_reconstructs(spark):
    text = "0123456789abcdef"
    out = chunk_documents(
        _docs(spark, [(7, text)]), "doc_id", "text", size=5, overlap=0
    ).collect()
    joined = "".join(
        r["chunk_text"] for r in sorted(out, key=lambda r: r["chunk_idx"])
    )
    assert joined == text


def test_bad_overlap_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "x")]), "doc_id", "text", size=4, overlap=4)
