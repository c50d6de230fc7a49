"""Round-5 second-pass operators: token-distribution drift, vocabulary
overlap, l-diversity, EWMA, rolling z-score anomalies, Z-order keys."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from topnotch_spark.functions.layout import z_value, z_value_sql
from topnotch_spark.operators.drift import token_distribution_drift
from topnotch_spark.operators.integrity import l_diversity
from topnotch_spark.operators.temporal import (
    ewma_per_key,
    rolling_zscore_anomalies,
)
from topnotch_spark.operators.textqc import vocab_overlap


# ---- token distribution drift ---------------------------------------------


def test_token_drift_identical_corpora_zero(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a dog ran far")], "id long, text string"
    )
    row = token_distribution_drift(docs, docs, "text").collect()[0]
    assert row["kl_ref_cur"] == 0.0
    assert row["kl_cur_ref"] == 0.0
    assert row["js_divergence"] == 0.0
    assert row["vocab_size"] == 7
    assert row["n_tokens_ref"] == 7 and row["n_tokens_cur"] == 7


def test_token_drift_disjoint_corpora_positive(spark):
    a = spark.createDataFrame([(1, "aa bb cc")], "id long, text string")
    b = spark.createDataFrame([(1, "xx yy zz")], "id long, text string")
    row = token_distribution_drift(a, b, "text").collect()[0]
    assert row["kl_ref_cur"] > 0 and row["kl_cur_ref"] > 0
    # JS is bounded by ln(2)
    assert 0 < row["js_divergence"] <= math.log(2) + 1e-9
    assert row["vocab_size"] == 6


def test_token_drift_hand_computed(spark):
    # ref = {a:2}, cur = {a:1, b:1}; joint vocab = {a,b} (V=2)
    # p(a) = 3/4, p(b) = 1/4 ; q(a) = 2/4, q(b) = 2/4
    a = spark.createDataFrame([(1, "a a")], "id long, text string")
    b = spark.createDataFrame([(1, "a b")], "id long, text string")
    row = token_distribution_drift(a, b, "text").collect()[0]
    kl = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    assert row["kl_ref_cur"] == pytest.approx(kl, abs=1e-6)


# ---- vocabulary overlap ---------------------------------------------------


def test_vocab_overlap_jaccard(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "alpha beta gamma"),
            ("s2", "beta gamma delta"),
            ("s3", "zzz"),
        ],
        "src string, text string",
    )
    out = {
        (r["group_a"], r["group_b"]): r
        for r in vocab_overlap(docs, "text", "src").collect()
    }
    r = out[("s1", "s2")]
    assert r["vocab_a"] == 3 and r["vocab_b"] == 3
    assert r["shared_tokens"] == 2
    assert r["jaccard"] == pytest.approx(2 / 4, abs=1e-9)
    # disjoint vocabularies never meet the join → no row
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_vocab_overlap_dedupes_within_group(spark):
    docs = spark.createDataFrame(
        [("s1", "x x x"), ("s1", "x y"), ("s2", "x")],
        "src string, text string",
    )
    r = vocab_overlap(docs, "text", "src").collect()[0]
    assert r["vocab_a"] == 2  # {x, y}, repeats collapse
    assert r["shared_tokens"] == 1


# ---- l-diversity ----------------------------------------------------------


def test_l_diversity_flags_homogeneous_group(spark):
    df = spark.createDataFrame(
        [
            ("g1", "A"), ("g1", "A"), ("g1", "A"),   # 3 rows, 1 value: leak
            ("g2", "A"), ("g2", "B"), ("g2", "C"),   # 3 distinct: fine
        ],
        "quasi string, sens string",
    )
    out = l_diversity(df, ["quasi"], "sens", l=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["quasi"] == "g1"
    assert r["group_size"] == 3
    assert r["distinct_sensitive"] == 1
    assert r["meets_l"] is False


def test_l_diversity_null_sensitive_counts_as_value(spark):
    df = spark.createDataFrame(
        [("g1", None), ("g1", "A")], "quasi string, sens string"
    )
    out = l_diversity(df, ["quasi"], "sens", l=2, risky_only=False).collect()
    assert out[0]["distinct_sensitive"] == 2
    assert out[0]["meets_l"] is True


def test_l_diversity_rejects_bad_l(spark):
    df = spark.createDataFrame([("g", "a")], "quasi string, sens string")
    with pytest.raises(ValueError):
        l_diversity(df, ["quasi"], "sens", l=0)


# ---- EWMA -----------------------------------------------------------------


def test_ewma_recursive_matches_closed_form(spark):
    # adjust=True EWMA: y_i = sum(0.5^k x_{i-k}) / sum(0.5^k)
    vals = [10.0, 20.0, 40.0]
    df = spark.createDataFrame(
        [(1, i, i, v) for i, v in enumerate(vals)],
        "k long, ts long, tb long, value double",
    )
    out = (
        ewma_per_key(df, "k", "ts", "value", "tb")
        .orderBy("ts")
        .collect()
    )
    assert out[0]["ewma"] == pytest.approx(10.0)
    assert out[1]["ewma"] == pytest.approx((20 + 0.5 * 10) / 1.5)
    assert out[2]["ewma"] == pytest.approx((40 + 0.5 * 20 + 0.25 * 10) / 1.75)


def test_ewma_constant_series_is_identity(spark):
    df = spark.createDataFrame(
        [(1, i, i, 7.25) for i in range(40)],
        "k long, ts long, tb long, value double",
    )
    for r in ewma_per_key(df, "k", "ts", "value", "tb").collect():
        assert r["ewma"] == pytest.approx(7.25, abs=1e-9)


def test_ewma_drops_null_values(spark):
    df = spark.createDataFrame(
        [(1, 0, 0, 5.0), (1, 1, 1, None), (1, 2, 2, 15.0)],
        "k long, ts long, tb long, value double",
    )
    out = ewma_per_key(df, "k", "ts", "value", "tb").orderBy("ts").collect()
    assert len(out) == 2
    # the null row is not a lag: second row sees x=[15, 5]
    assert out[1]["ewma"] == pytest.approx((15 + 0.5 * 5) / 1.5)


# ---- rolling z-score anomalies --------------------------------------------


def test_rolling_zscore_flags_spike(spark):
    rows = [(1, i, i, 100.0 + (i % 3)) for i in range(30)]
    rows.append((1, 30, 30, 500.0))  # the spike
    df = spark.createDataFrame(
        rows, "k long, ts long, tb long, value double"
    )
    out = rolling_zscore_anomalies(df, "k", "ts", "value", "tb").collect()
    assert len(out) == 1
    assert out[0]["ts"] == 30
    assert out[0]["zscore"] > 3.0
    assert out[0]["n_window"] == 20


def test_rolling_zscore_quiet_series_clean(spark):
    df = spark.createDataFrame(
        [(1, i, i, 50.0 + (i % 5)) for i in range(60)],
        "k long, ts long, tb long, value double",
    )
    assert rolling_zscore_anomalies(df, "k", "ts", "value", "tb").count() == 0


def test_rolling_zscore_short_prefix_never_flags(spark):
    # huge spike but only 5 trailing rows (< min_rows): not flagged
    rows = [(1, i, i, 10.0 + i) for i in range(5)] + [(1, 5, 5, 9999.0)]
    df = spark.createDataFrame(
        rows, "k long, ts long, tb long, value double"
    )
    assert rolling_zscore_anomalies(df, "k", "ts", "value", "tb").count() == 0


def test_rolling_zscore_constant_window_no_div_by_zero(spark):
    df = spark.createDataFrame(
        [(1, i, i, 5.0) for i in range(25)],
        "k long, ts long, tb long, value double",
    )
    assert rolling_zscore_anomalies(df, "k", "ts", "value", "tb").count() == 0


# ---- Z-order keys ---------------------------------------------------------


def test_z_value_hand_computed(spark):
    # x=0b11 (bits at 0,2), y=0b10 (bit at 3): z = 0b1101... compute:
    # x bits: b0=1→pos0, b1=1→pos2 ; y bits: b0=0, b1=1→pos3 → 0b1101 = 13
    df = spark.createDataFrame([(3, 2)], "x long, y long")
    assert df.select(z_value("x", "y", 4).alias("z")).collect()[0]["z"] == 13


def test_z_value_locality_beats_linear_on_y(spark):
    # neighbors in y land in nearby z ranges, unlike x-major ordering
    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    out = df.select("x", "y", z_value("x", "y", 4).alias("z")).collect()
    zmap = {(r["x"], r["y"]): r["z"] for r in out}
    # 256 distinct keys (bijection on the 16x16 grid)
    assert len(set(zmap.values())) == 256
    # the z-range spanned by one 4x4 tile is much tighter than the
    # x-major range (which spans ~the whole table for any y-slice)
    tile = [zmap[(x, y)] for x in range(4) for y in range(4)]
    assert max(tile) - min(tile) <= 63  # one 4x4 Morton block is contiguous


def test_z_value_sql_matches_spark(spark):
    import duckdb

    pairs = [(x, y) for x in range(0, 1000, 37) for y in range(0, 1000, 41)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value("x", "y", 10).alias("z")).collect()
    }
    expr = z_value_sql("x", "y", 10)
    con = duckdb.connect()  # keep a live ref: .sql() is lazy
    rows = con.sql(
        "SELECT x, y, " + expr + " AS z FROM (SELECT "
        "unnest($1::BIGINT[]) AS x, unnest($2::BIGINT[]) AS y)",
        params=[[p[0] for p in pairs], [p[1] for p in pairs]],
    ).fetchall()
    assert len(rows) == len(pairs)
    for x, y, z in rows:
        assert got[(x, y)] == z


def test_z_value_bits_bounds(spark):
    with pytest.raises(ValueError):
        z_value("x", "y", 0)
    with pytest.raises(ValueError):
        z_value("x", "y", 32)


# ---- embedding decontamination --------------------------------------------


def test_embedding_decontaminate_finds_planted_leak(spark):
    # benchmark vec 100 == corpus vec 1 exactly; vec 2 is orthogonal
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    from topnotch_spark.operators.curation import embedding_decontaminate

    out = embedding_decontaminate(
        corpus, bench, "vec_id", "embedding", threshold=0.9, n_planes=2, dim=4
    ).collect()
    assert [(r["corpus_id"], r["bench_id"]) for r in out] == [(1, 100)]
    assert out[0]["cos_sim"] == pytest.approx(1.0)


def test_embedding_decontaminate_orthogonal_clean(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    bench = spark.createDataFrame(
        [(99, [0.0] * 7 + [1.0])], "vec_id long, embedding array<float>"
    )
    from topnotch_spark.operators.curation import embedding_decontaminate

    out = embedding_decontaminate(
        corpus, bench, "vec_id", "embedding", threshold=0.5, n_planes=1, dim=8
    ).collect()
    # only the identical basis vector survives the cosine gate
    assert [(r["corpus_id"], r["bench_id"]) for r in out] == [(7, 99)]


def test_embedding_decontaminate_plan_method(spark, tmp_path):
    import json as _json

    from topnotch_spark.engine import TnEngine

    sf = "/root/testdata/sf0.001"
    plan = {
        "commands": [
            {
                "command": "decontaminate",
                "corpus": {"ref": f"{sf}/embeddings.parquet", "onDisk": True},
                "benchmark": {"ref": f"{sf}/embeddings.parquet",
                              "onDisk": True},
                "params": {"method": "embedding", "idColumn": "vec_id",
                           "vecColumn": "embedding", "threshold": 0.99,
                           "nPlanes": 4, "dim": 64},
                "outputKey": "semLeaks",
            },
        ],
    }
    p = tmp_path / "plan.json"
    p.write_text(_json.dumps(plan))
    engine = TnEngine(spark)
    assert engine.run(str(p)) == 0
    leaks = engine.registry["semLeaks"]
    assert {"corpus_id", "bench_id", "cos_sim"} == set(leaks.columns)
    # corpus == benchmark: every vector matches itself at cos 1.0
    n = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert leaks.filter("corpus_id = bench_id").count() == n


# ---- inter-arrival gap stats ----------------------------------------------


def test_interarrival_hand_computed(spark):
    import datetime as dt

    from topnotch_spark.operators.temporal import interarrival_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10), (1, t0 + dt.timedelta(seconds=2), 11),
        (1, t0 + dt.timedelta(seconds=10), 12),
        (2, t0, 20),  # single event: no gaps
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, tb long")
    out = {r["k"]: r for r in interarrival_stats(df, "k", "ts", "tb").collect()}
    r1 = out[1]
    assert r1["n_events"] == 3 and r1["n_gaps"] == 2
    assert r1["min_gap_s"] == 2.0 and r1["max_gap_s"] == 8.0
    assert r1["avg_gap_s"] == 5.0
    r2 = out[2]
    assert r2["n_events"] == 1 and r2["n_gaps"] == 0
    assert r2["min_gap_s"] is None and r2["avg_gap_s"] is None


def test_interarrival_ties_use_tiebreak(spark):
    import datetime as dt

    from topnotch_spark.operators.temporal import interarrival_stats

    t0 = dt.datetime(2024, 1, 1)
    # two events at the same ts: gap 0, ordered by tiebreak
    df = spark.createDataFrame(
        [(1, t0, 2), (1, t0, 1)], "k long, ts timestamp, tb long"
    )
    r = interarrival_stats(df, "k", "ts", "tb").collect()[0]
    assert r["n_gaps"] == 1 and r["min_gap_s"] == 0.0


# ---- melt / unpivot --------------------------------------------------------


def test_melt_long_shape_and_values(spark):
    from topnotch_spark.operators.profile import melt

    df = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "id long, a int, b double"
    )
    out = melt(df, ["id"], ["a", "b"]).collect()
    got = {(r["id"], r["metric"]): r["value"] for r in out}
    assert got == {
        (1, "a"): 10.0, (1, "b"): 1.5, (2, "a"): 20.0, (2, "b"): 2.5,
    }
    assert len(out) == 4  # N rows x M measures


def test_melt_rejects_empty_measures(spark):
    from topnotch_spark.operators.profile import melt

    df = spark.createDataFrame([(1, 2)], "id long, a int")
    with pytest.raises(ValueError):
        melt(df, ["id"], [])


# ---- cross-library property checks ----------------------------------------


def test_ewma_matches_pandas_ewm(spark):
    """Our truncated EWMA equals pandas ewm(alpha=.5, adjust=True) for
    series shorter than the truncation horizon."""
    import pandas as pd

    vals = [3.25, 9.5, 1.0, 7.75, 2.5, 8.0, 4.25, 6.5, 0.5, 5.0]
    expected = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    df = spark.createDataFrame(
        [(1, i, i, v) for i, v in enumerate(vals)],
        "k long, ts long, tb long, value double",
    )
    got = [
        r["ewma"]
        for r in ewma_per_key(df, "k", "ts", "value", "tb")
        .orderBy("ts")
        .collect()
    ]
    for g, e in zip(got, expected):
        assert g == pytest.approx(e, abs=1e-6)


def test_z_value_roundtrip_decodable(spark):
    """The Morton key is a bijection: x and y decode back out."""
    pairs = [(x, y) for x in (0, 1, 5, 33, 1023) for y in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(pairs, "x long, y long")
    for r in df.select("x", "y", z_value("x", "y", 10).alias("z")).collect():
        z = r["z"]
        x = sum(((z >> (2 * b)) & 1) << b for b in range(10))
        y = sum(((z >> (2 * b + 1)) & 1) << b for b in range(10))
        assert (x, y) == (r["x"], r["y"])


def test_cdc_apply_idempotent(spark):
    from topnotch_spark.operators.scd import cdc_apply

    snap = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string"
    )
    changes = spark.createDataFrame(
        [(i, f"u{i}", "u", 1, 1) for i in range(0, 10)]
        + [(i, "x", "d", 1, 2) for i in range(5, 15)],
        "k long, v string, op string, ts long, seq long",
    )
    once = cdc_apply(snap, changes, ["k"], "ts", "op", tiebreak_col="seq")
    twice = cdc_apply(once, changes, ["k"], "ts", "op", tiebreak_col="seq")
    rows1 = {tuple(r) for r in once.collect()}
    rows2 = {tuple(r) for r in twice.collect()}
    assert rows1 == rows2
    # deletes won for 5..14, upserts for 0..4, untouched 15..19
    assert {k for k, _ in rows1} == set(range(5)) | set(range(15, 20))


# ---- correlation matrix ----------------------------------------------------


def test_corr_matrix_hand_computed(spark):
    from topnotch_spark.operators.profile import corr_matrix

    # y = 2x exactly: corr 1.0 ; z anti-correlated with x: corr -1.0
    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)],
        "x double, y double, z double",
    )
    out = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in corr_matrix(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "y")] == pytest.approx(1.0)
    assert out[("x", "z")] == pytest.approx(-1.0)
    assert out[("y", "z")] == pytest.approx(-1.0)


def test_corr_matrix_zero_variance_null(spark):
    from topnotch_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
    )
    r = corr_matrix(df, ["x", "c"]).collect()[0]
    assert r["corr"] is None


def test_corr_matrix_listwise_null_drop(spark):
    from topnotch_spark.operators.profile import corr_matrix

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (None, 9.0), (4.0, 4.0)],
        "x double, y double",
    )
    r = corr_matrix(df, ["x", "y"]).collect()[0]
    assert r["n"] == 3 and r["corr"] == pytest.approx(1.0)


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    from topnotch_spark.operators.profile import corr_matrix

    xs = [1.25, 8.5, 3.75, 6.0, 2.25, 9.5, 4.0, 7.75]
    ys = [2.0, 7.25, 1.5, 8.0, 3.25, 6.5, 5.0, 4.75]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = corr_matrix(df, ["x", "y"]).collect()[0]["corr"]
    expected = np.corrcoef(xs, ys)[0, 1]
    assert got == pytest.approx(expected, abs=1e-6)


def test_corr_matrix_needs_two_cols(spark):
    from topnotch_spark.operators.profile import corr_matrix

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        corr_matrix(df, ["x"])


# ---- mutual information ----------------------------------------------------


def test_mi_independent_columns_zero(spark):
    from topnotch_spark.operators.drift import mutual_information

    # a and b perfectly independent (full factorial, equal counts)
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(10)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["n"] == 40 and r["n_cats_a"] == 2 and r["n_cats_b"] == 2


def test_mi_identical_columns_equals_entropy(spark):
    import math

    from topnotch_spark.operators.drift import mutual_information

    # b == a: MI = H(a); two equally likely categories -> ln 2, NMI = 1
    rows = [("x", "x")] * 10 + [("y", "y")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi_nats"] == pytest.approx(math.log(2), abs=1e-6)
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_mi_null_category_is_a_value(spark):
    from topnotch_spark.operators.drift import mutual_information

    df = spark.createDataFrame(
        [("x", None), ("x", None), ("y", "p")], "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["n_cats_b"] == 2  # NULL folded to its own category
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)  # still deterministic


def test_mi_constant_column_null_nmi(spark):
    from topnotch_spark.operators.drift import mutual_information

    df = spark.createDataFrame(
        [("x", "c"), ("y", "c")], "a string, b string"
    )
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert r["nmi"] is None  # H(b) = 0
