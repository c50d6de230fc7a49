"""Round-8 additions: the BM25 viral-term valve (max_token_df) semantics
and plan exposure, and the fused single-pass referential-integrity shape."""

from __future__ import annotations

import json

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BM25 max_token_df valve
# ---------------------------------------------------------------------------

def test_bm25_max_token_df_drops_stopword_term(spark):
    """A stopword in the query ('the', present in EVERY doc) normally
    drags the corpus-sized postings list through the join; with the
    valve below its document frequency the term is dropped BEFORE the
    postings join, so the scores equal the same query without the
    stopword — and the rare term's scoring is untouched."""
    from topnotch_spark.operators.dedup import dedup_scope
    from topnotch_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"the filler{i} " + ("apple" if i < 3 else "pear"))
         for i in range(10)],
        "doc_id long, text string",
    )
    with dedup_scope():
        capped = {
            (r["doc_id"]): r["score"]
            for r in bm25_topk(
                spark, docs, [(1, "the apple")], k=10, max_token_df=5
            ).collect()
        }
        rare_only = {
            (r["doc_id"]): r["score"]
            for r in bm25_topk(spark, docs, [(1, "apple")], k=10).collect()
        }
        uncapped = {
            (r["doc_id"]): r["score"]
            for r in bm25_topk(
                spark, docs, [(1, "the apple")], k=10
            ).collect()
        }
    # valve active: 'the' (df=10 > 5) contributes nothing
    assert capped == rare_only
    # only the 3 apple docs survive (the stopword postings never join)
    assert set(capped) == {0, 1, 2}
    # without the valve the stopword DOES score — all 10 docs match
    assert set(uncapped) == set(range(10))


def test_retrieve_plan_accepts_max_token_df(spark, tmp_path):
    from topnotch_spark.engine import TnEngine
    from topnotch_spark.plans.extensions import RetrieveCmd

    obj = {
        "command": "retrieve",
        "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
        "outputKey": "hits",
        "params": {"queries": [[1, "spark window agg"]], "k": 5,
                   "maxTokenDf": 400},
    }
    cmd = RetrieveCmd.from_json(obj)
    assert cmd.options == {"k": 5, "max_token_df": 400}

    plan = tmp_path / "retrieve_valve.json"
    plan.write_text(json.dumps({"commands": [obj]}))
    engine = TnEngine(spark)
    assert engine.run(str(plan)) == 0
    hits = engine.registry["hits"]
    assert set(hits.columns) == {"query_id", "doc_id", "score", "rank"}
    assert hits.count() <= 5


# ---------------------------------------------------------------------------
# Fused referential integrity (one pass per side)
# ---------------------------------------------------------------------------

def test_referential_integrity_counts_on_empty_child(spark):
    from topnotch_spark.operators.integrity import referential_integrity

    child = spark.createDataFrame([], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    row = referential_integrity(child, parent, ["fk"], ["pk"], "r").collect()[0]
    assert (row["n_child"], row["n_null_fk"], row["n_orphans"]) == (0, 0, 0)
    assert row["orphan_frac"] is None


def test_referential_integrity_duplicate_parent_keys_no_fanout(spark):
    """The parent side is deduped before the join — duplicate PKs must
    not multiply child rows (n_child stays exact)."""
    from topnotch_spark.operators.integrity import referential_integrity

    child = spark.createDataFrame([(1,), (1,), (2,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
    row = referential_integrity(child, parent, ["fk"], ["pk"], "r").collect()[0]
    assert row["n_child"] == 4
    assert row["n_null_fk"] == 1
    assert row["n_orphans"] == 1  # fk=2
    assert row["orphan_frac"] == pytest.approx(0.25)
