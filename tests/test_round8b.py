"""Round-8 (second batch) additions: n-gram novelty scoring, corpus
diversity indices, label-noise kNN agreement, contrastive hard-negative
mining, and the KMV quantile sketch."""

from __future__ import annotations

import json

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------

def test_ngram_novelty_hand_computed(spark):
    """doc 1 'a b c' and doc 2 'a b x' share the bigram 'a b'; each
    keeps one private bigram -> rate 0.5.  doc 4 is all-novel -> 1.0.
    doc 3 has one token -> no shingles -> no row."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.textqc import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b x"), (3, "zz"), (4, "p q r")],
        "doc_id long, text string",
    )
    with dedup_scope():
        rows = {
            r["doc_id"]: r
            for r in ngram_novelty(docs, "doc_id", "text", shingle_n=2).collect()
        }
    assert set(rows) == {1, 2, 4}
    assert rows[1]["n_shingles"] == 2 and rows[1]["n_novel"] == 1
    assert rows[1]["novelty_rate"] == 0.5
    assert rows[2]["novelty_rate"] == 0.5
    assert rows[4]["n_shingles"] == 2 and rows[4]["novelty_rate"] == 1.0


def test_ngram_novelty_counts_distinct_shingles_once(spark):
    """Within-doc repeats of a shingle collapse (distinct semantics,
    shared with the dedup family): 'a b a b' has ONE distinct bigram
    'a b' plus 'b a'."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.textqc import ngram_novelty

    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    with dedup_scope():
        row = ngram_novelty(docs, "doc_id", "text", shingle_n=2).collect()[0]
    assert row["n_shingles"] == 2  # {'a b', 'b a'}
    assert row["novelty_rate"] == 1.0


def test_text_plan_novelty_method(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "novelty",
                "params": {"method": "novelty", "idColumn": "doc_id",
                           "textColumn": "text", "shingleN": 3},
            }
        ]
    }
    path = tmp_path / "novelty_plan.json"
    path.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(path)) == 0
    out = engine.registry["novelty"]
    assert set(out.columns) == {
        "doc_id", "n_shingles", "n_novel", "novelty_rate"
    }
    assert out.count() > 0
