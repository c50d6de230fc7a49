"""Model-based quality filtering (textqc.linear_classifier_score):
integer milli-weight linear classifier applied corpus-wide."""

from __future__ import annotations

import json

import pytest

from topnotch_spark.operators.textqc import linear_classifier_score

W = {"good": 100, "fine": 40, "bad": -80}


def test_classifier_logits_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "good good fine"),      # 2*100 + 40 = 240
            (2, "bad bad bad good"),    # -240 + 100 = -140
            (3, "meh nothing known"),   # no vocab hit -> bias only
            (4, ""),                    # empty -> 0 tokens, bias only
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_tokens"], r["logit_milli"], r["keep"])
        for r in linear_classifier_score(
            docs, "doc_id", "text", W, bias_milli=-50
        ).collect()
    }
    assert rows[1] == (3, 190, True)
    assert rows[2] == (4, -190, False)
    assert rows[3] == (3, -50, False)
    assert rows[4] == (0, -50, False)


def test_classifier_zero_logit_is_dropped(spark):
    """keep is logit > 0 strictly: the 0.5-probability point fails."""
    docs = spark.createDataFrame([(1, "good bad")], "doc_id long, text string")
    row = linear_classifier_score(
        docs, "doc_id", "text", {"good": 80, "bad": -80}
    ).collect()[0]
    assert row["logit_milli"] == 0 and not row["keep"]


def test_classifier_tf_weighting_case_fold(spark):
    """Term FREQUENCY weighting (not presence), over lowercased tokens."""
    docs = spark.createDataFrame(
        [(1, "Good GOOD gOOd")], "doc_id long, text string"
    )
    row = linear_classifier_score(docs, "doc_id", "text", W).collect()[0]
    assert row["logit_milli"] == 300 and row["keep"]


def test_classifier_plan_method(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "text",
                "input": {
                    "ref": "/root/testdata/sf0.001/documents.parquet",
                    "onDisk": True,
                },
                "params": {
                    "method": "classifierScore",
                    "idColumn": "doc_id",
                    "textColumn": "text",
                    "weights": {"spark": 40, "slow": -35},
                    "biasMilli": -10,
                },
                "outputKey": "scored",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    scored = engine.registry["scored"]
    assert {"doc_id", "n_tokens", "logit_milli", "keep"} == set(scored.columns)
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert scored.count() == n_docs  # every doc scored, none vanish


def test_classifier_plan_requires_weights(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "text",
                "input": {
                    "ref": "/root/testdata/sf0.001/documents.parquet",
                    "onDisk": True,
                },
                "params": {"method": "classifierScore", "idColumn": "doc_id"},
                "outputKey": "x",
            }
        ]
    }
    p = tmp_path / "plan.json"
    p.write_text(json.dumps(plan))
    with pytest.raises(ValueError, match="requires param 'weights'"):
        TnEngine(spark).run(str(p))
