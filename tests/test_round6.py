"""Round-6 operators: BM25 retrieval, curriculum sampling, split-leakage
report — semantics + plan-surface wiring."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_scores_match_reference_formula(spark):
    """Hand-checkable corpus: scores equal the Robertson/Lucene BM25
    formula computed in plain Python; ranking is deterministic."""
    from topnotch_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "apple"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(spark, docs, [(7, "apple cherry")], k=10)
    rows = {r["doc_id"]: r for r in out.collect()}

    # reference computation
    corpus = {1: ["apple", "banana", "apple"], 2: ["banana", "cherry"],
              3: ["cherry", "cherry", "cherry", "durian"], 4: ["apple"]}
    N = 4
    avgdl = sum(len(t) for t in corpus.values()) / N
    df_t = {"apple": 2, "cherry": 2}

    def score(doc):
        s = 0
        for t in ("apple", "cherry"):
            tf = corpus[doc].count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (N - df_t[t] + 0.5) / (df_t[t] + 0.5))
            dl = len(corpus[doc])
            term = (
                idf * (tf * (1.2 + 1.0))
                / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
            )
            s += int(round(term * 1_000_000))
        return s / 1_000_000

    for d in (1, 2, 3, 4):
        assert rows[d]["score"] == pytest.approx(score(d), abs=2e-6), d
    # rank order: score desc, doc_id asc
    ranked = sorted(rows.values(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in ranked] == sorted(
        rows, key=lambda d: (-rows[d]["score"], d)
    )


def test_bm25_validates_and_limits(spark):
    from topnotch_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, "common word") for i in range(20)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(spark, docs, [])
    out = bm25_topk(spark, docs, [(1, "common")], k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5
    ]


# ---------------------------------------------------------------------------
# Curriculum sample
# ---------------------------------------------------------------------------

def test_curriculum_bands_and_rates(spark):
    from topnotch_spark.operators.curation import curriculum_sample

    rows = [(i, "s" if i < 40 else "t", float(100 - i)) for i in range(80)]
    df = spark.createDataFrame(rows, "id long, src string, q double")
    out = curriculum_sample(df, "id", "q", "src", n_bands=4)
    got = out.collect()
    # best band keeps everything: band 1 of each source = top quarter
    kept_by_band = {}
    for r in got:
        kept_by_band.setdefault(r["band"], 0)
        kept_by_band[r["band"]] += 1
        assert r["keep_rate"] == pytest.approx((4 + 1 - r["band"]) / 4)
    assert kept_by_band[1] == 20  # 10 per source, rate 1.0 keeps all
    # monotone expectation: lower bands keep fewer (statistically; exact
    # per-band counts are deterministic given the md5 draw)
    assert kept_by_band.get(4, 0) < kept_by_band[1]
    # determinism: same result on re-run
    again = {(r["id"], r["band"]) for r in out.collect()}
    assert {(r["id"], r["band"]) for r in got} == again


# ---------------------------------------------------------------------------
# Split leakage
# ---------------------------------------------------------------------------

def test_split_leakage_flags_cross_split_neardups(spark):
    """A val doc that near-duplicates a train doc is flagged; fully
    distinct docs are not."""
    from topnotch_spark.operators.curation import hash_split, split_leakage

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(40)]  # identical docs spread splits
    rows += [(100 + i, f"unique text {i} totally distinct content piece "
              f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    rep = split_leakage(df, "doc_id", "text", shingle_n=5)
    got = {r["doc_id"]: r for r in rep.collect()}

    splits = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .collect()
    }
    dup_val = [i for i in range(40) if splits[i] == "val"]
    dup_train = [i for i in range(40) if splits[i] == "train"]
    uniq_val = [100 + i for i in range(10) if splits[100 + i] == "val"]
    if dup_val and dup_train:
        for i in dup_val:
            assert i in got
            assert got[i]["n_train_partners"] == len(dup_train)
            assert got[i]["leak_frac"] == 1.0  # identical text
    for i in uniq_val:
        assert i not in got


# ---------------------------------------------------------------------------
# Plan-surface wiring
# ---------------------------------------------------------------------------

def test_round6_plan_commands(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "retrieve",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "bm25Hits",
                "params": {
                    "queries": [[1, "spark window agg"]],
                    "k": 5,
                },
            },
            {
                "command": "sample",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "curriculum",
                "params": {
                    "idColumn": "doc_id",
                    "orderColumn": "n_chars",
                    "partitionColumn": "source",
                    "nBands": 4,
                },
            },
            {
                "command": "split",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "leakage",
                "params": {
                    "idColumn": "doc_id",
                    "textColumn": "text",
                    "shingleN": 5,
                    "maxShingleDf": 1000,
                },
            },
        ]
    }
    path = tmp_path / "round6_plan.json"
    path.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(path)) == 0
    hits = engine.registry["bm25Hits"]
    assert hits.count() == 5
    assert set(hits.columns) == {"query_id", "doc_id", "score", "rank"}
    cur = engine.registry["curriculum"]
    assert cur.filter("band = 1").count() > 0
    assert "leak_frac" in engine.registry["leakage"].columns

    # malformed: curriculum + rates must fail with the validation message
    bad = {
        "commands": [
            {
                "command": "sample",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "x",
                "params": {
                    "idColumn": "doc_id",
                    "orderColumn": "n_chars",
                    "partitionColumn": "source",
                    "rates": {"a": 0.5},
                },
            }
        ]
    }
    bad_path = tmp_path / "round6_bad.json"
    bad_path.write_text(json.dumps(bad))
    with pytest.raises(Exception, match="mutually exclusive"):
        TnEngine(spark).run(str(bad_path))

    # split without fractions and without textColumn is invalid
    bad2 = {
        "commands": [
            {
                "command": "split",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "y",
                "params": {"idColumn": "doc_id"},
            }
        ]
    }
    bad2_path = tmp_path / "round6_bad2.json"
    bad2_path.write_text(json.dumps(bad2))
    with pytest.raises(Exception, match="fractions"):
        TnEngine(spark).run(str(bad2_path))


# ---------------------------------------------------------------------------
# PSI trend + rank calibration
# ---------------------------------------------------------------------------

def test_psi_trend_zero_for_identical_weeks(spark):
    """Weeks drawn from the same distribution as week 1 get psi ~ 0;
    a shifted week gets a clearly positive PSI; the reference week's own
    PSI is exactly 0."""
    import datetime

    from topnotch_spark.operators.drift import psi_trend

    rows = []
    for wk in range(3):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(weeks=wk)
        for i in range(1000):
            v = float(i % 100)  # identical discrete uniform each week
            if wk == 2:
                v += 60.0  # shifted distribution
            rows.append((day + datetime.timedelta(seconds=i), v))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["period"]: r for r in psi_trend(df, "ts", "value").collect()}
    periods = sorted(out)
    assert len(periods) == 3
    assert out[periods[0]]["psi"] == 0.0
    assert abs(out[periods[1]]["psi"]) < 1e-5
    assert out[periods[2]]["psi"] > 0.5
    assert all(out[p]["n_rows"] == 1000 for p in periods)

    with pytest.raises(ValueError, match="constant"):
        psi_trend(
            spark.createDataFrame(
                [(datetime.datetime(2024, 1, 1), 1.0)], "ts timestamp, value double"
            ),
            "ts",
            "value",
        )


def test_quality_rank_calibrate_bounds_and_order(spark):
    from topnotch_spark.operators.textqc import quality_rank_calibrate

    rows = [(i, "a" if i < 6 else "b", float(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, src string, q double")
    out = quality_rank_calibrate(df, "id", "q", "src").collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    for src, rs in by_src.items():
        ranks = sorted(r["q_calibrated"] for r in rs)
        assert ranks[0] == 0.0 and ranks[-1] == 1.0
        # monotone in (q, id)
        ordered = sorted(rs, key=lambda r: (r["q"], r["id"]))
        assert [r["q_calibrated"] for r in ordered] == ranks


def test_trend_and_calibrate_plan_forms(spark, tmp_path):
    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "drift",
                "input": {"ref": f"{SF}/events.parquet", "onDisk": True},
                "outputKey": "weeklyPsi",
                "params": {"method": "trend", "column": "value",
                           "period": "week", "nBuckets": 10},
            },
            {
                "command": "text",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "calibrated",
                "params": {"method": "calibrateRanks", "idColumn": "doc_id",
                           "orderCol": "n_chars", "partitionCol": "source"},
            },
        ]
    }
    path = tmp_path / "trend_plan.json"
    path.write_text(json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(path)) == 0
    assert "psi" in engine.registry["weeklyPsi"].columns
    assert engine.registry["calibrated"].filter("q_calibrated > 1").count() == 0

    bad = {
        "commands": [
            {
                "command": "drift",
                "input": {"ref": f"{SF}/events.parquet", "onDisk": True},
                "outputKey": "x",
                "params": {"method": "trend", "column": "value",
                           "bins": 5},
            }
        ]
    }
    bad_path = tmp_path / "trend_bad.json"
    bad_path.write_text(json.dumps(bad))
    with pytest.raises(Exception, match="does not accept"):
        TnEngine(spark).run(str(bad_path))


# ---------------------------------------------------------------------------
# Vocab OOV rate
# ---------------------------------------------------------------------------

def test_vocab_oov_rate(spark, tmp_path):
    from topnotch_spark.operators.textqc import vocab_oov_rate

    rows = [(i, "a", "common common word") for i in range(8)]
    rows += [(100 + i, "b", f"common rare{i} oddity{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "id long, grp string, text string")
    # vocab_k=2 -> {"common", "word"} (word: 8 occurrences beats rare*)
    out = {r["grp"]: r for r in
           vocab_oov_rate(df, "id", "text", "grp", vocab_k=2).collect()}
    assert out["a"]["n_tokens"] == 24 and out["a"]["n_oov"] == 0
    assert out["b"]["n_tokens"] == 12 and out["b"]["n_oov"] == 8
    assert out["b"]["oov_rate"] == pytest.approx(8 / 12, abs=1e-6)

    # plan form
    import json as _json

    from topnotch_spark.engine import TnEngine

    plan = {
        "commands": [
            {
                "command": "text",
                "input": {"ref": f"{SF}/documents.parquet", "onDisk": True},
                "outputKey": "oov",
                "params": {"method": "oovRate", "idColumn": "doc_id",
                           "partitionCol": "source", "vocabK": 40},
            }
        ]
    }
    p = tmp_path / "oov_plan.json"
    p.write_text(_json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    assert engine.registry["oov"].count() == 20
