"""Curation-operator semantics: PII redaction, quality rule chain,
deterministic stratified sampling, token-budget packing, KS statistic."""

from __future__ import annotations

from pyspark.sql import functions as F

from topnotch_spark.operators.curation import (
    pack_token_shards,
    pii_scrub,
    quality_filter,
    stratified_sample,
)
from topnotch_spark.operators.drift import ks_statistic


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---- PII scrub ------------------------------------------------------------

def test_pii_scrub_redacts_and_counts(spark):
    text = (
        "mail a@b.co and c.d+x@e.org, ssn 123-45-6789, "
        "call 555-123-4567 or 555.987.6543, host 10.1.2.3"
    )
    row = pii_scrub(_docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (
        2, 1, 2, 1,
    )
    clean = row["clean_text"]
    assert "<EMAIL>" in clean and "<SSN>" in clean and "<PHONE>" in clean
    assert "<IP>" in clean
    assert "a@b.co" not in clean and "123-45-6789" not in clean
    assert "10.1.2.3" not in clean


def test_pii_scrub_clean_text_untouched(spark):
    row = pii_scrub(
        _docs(spark, [(1, "no pii here, just words")]), "doc_id", "text"
    ).collect()[0]
    assert row["clean_text"] == "no pii here, just words"
    assert row["n_email"] == row["n_ssn"] == row["n_phone"] == row["n_ipv4"] == 0


# ---- quality filter -------------------------------------------------------

def test_quality_filter_reasons(spark):
    good = "the cat sat on the mat and then the dog sat on the log today"
    short = "tiny text"
    digits = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20"
    out = {
        r["doc_id"]: r
        for r in quality_filter(
            _docs(spark, [(1, good), (2, short), (3, digits)]), "doc_id", "text"
        ).collect()
    }
    assert out[1]["keep"] and out[1]["drop_reasons"] == ""
    assert not out[2]["keep"] and "too_short" in out[2]["drop_reasons"]
    assert not out[3]["keep"] and "low_alpha" in out[3]["drop_reasons"]


# ---- stratified sample ----------------------------------------------------

def test_stratified_sample_deterministic_and_rate(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    a = stratified_sample(df, "doc_id", "lang", rates).collect()
    b = stratified_sample(df, "doc_id", "lang", rates).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    n_en = sum(1 for r in a if r["lang"] == "en")
    n_de = sum(1 for r in a if r["lang"] == "de")
    assert 400 <= n_en <= 600  # 1000 * 0.5 ± slack
    assert 50 <= n_de <= 160  # 1000 * 0.1 ± slack


def test_stratified_sample_edge_rates(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    assert stratified_sample(df, "doc_id", "lang", {"en": 1.0}).count() == 100
    assert stratified_sample(df, "doc_id", "lang", {"en": 0.0}).count() == 0
    # stratum not in rates -> default_rate
    assert stratified_sample(df, "doc_id", "lang", {"xx": 1.0}).count() == 0
    assert (
        stratified_sample(df, "doc_id", "lang", {"xx": 0.0}, default_rate=1.0).count()
        == 100
    )


# ---- token packing --------------------------------------------------------

def test_pack_token_shards_budget_math(spark):
    # 4 docs x 3 tokens, budget 6 -> shards [0,0,1,1]
    rows = [(i, "a b c") for i in range(4)]
    out = sorted(
        pack_token_shards(
            _docs(spark, rows), "doc_id", "text", budget=6, global_ordering=True
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["shard_id"] for r in out] == [0, 0, 1, 1]
    assert all(r["n_tokens"] == 3 for r in out)


def test_pack_token_shards_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "a b", "x"), (2, "a b", "x"), (3, "a b", "y"), (4, "a b", "y")],
        "doc_id long, text string, part string",
    )
    out = pack_token_shards(
        df, "doc_id", "text", budget=2, partition_col="part"
    ).collect()
    by_id = {r["doc_id"]: (r["part"], r["shard_id"]) for r in out}
    # packing restarts per partition
    assert by_id[1] == ("x", 0) and by_id[2] == ("x", 1)
    assert by_id[3] == ("y", 0) and by_id[4] == ("y", 1)


# ---- KS statistic ---------------------------------------------------------

def test_ks_identical_is_zero(spark):
    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("x"))
    row = ks_statistic(df, df, "x").collect()[0]
    assert row["ks_stat"] == 0.0
    assert row["n_ref"] == row["n_cur"] == 100


def test_ks_disjoint_is_one(spark):
    lo = spark.range(50).select(F.col("id").cast("double").alias("x"))
    hi = spark.range(50).select((F.col("id") + 1000).cast("double").alias("x"))
    assert ks_statistic(lo, hi, "x").collect()[0]["ks_stat"] == 1.0


def test_ks_known_value(spark):
    # ref = {1,2,3,4}, cur = {3,4,5,6}: max gap at v=2 -> |2/4 - 0| = 0.5
    ref = _vals(spark, [1, 2, 3, 4])
    cur = _vals(spark, [3, 4, 5, 6])
    assert ks_statistic(ref, cur, "x").collect()[0]["ks_stat"] == 0.5


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def test_ks_binned_approximates_exact(spark):
    import pytest as _pytest

    ref = spark.range(1000).select((F.col("id") % 97).cast("double").alias("x"))
    cur = spark.range(1000).select(((F.col("id") % 97) + 20).cast("double").alias("x"))
    exact = ks_statistic(ref, cur, "x").collect()[0]["ks_stat"]
    binned = ks_statistic(ref, cur, "x", bins=32).collect()[0]["ks_stat"]
    # binned is an approximation bounded by bucket coarseness
    assert abs(binned - exact) < 0.15
    assert 0.0 < binned <= 1.0
    with _pytest.raises(ValueError, match="empty or constant"):
        ks_statistic(
            spark.range(5).select(F.lit(1.0).alias("x")), cur, "x", bins=8
        )


# ---- decontamination ------------------------------------------------------

def test_cross_corpus_overlap_detects_leak(spark):
    from topnotch_spark.operators.curation import cross_corpus_overlap

    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(spark, [
        (1, "prefix words alpha beta gamma delta epsilon suffix"),  # leak
        (2, "totally different text with no overlap at all here"),
    ])
    out = cross_corpus_overlap(
        corpus, bench, "doc_id", "text", shingle_n=5
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["corpus_id"], r["bench_id"]) == (1, 100)
    # bench has 2 distinct 5-grams; 1 is shared
    assert r["n_common"] == 1 and r["overlap_frac"] == 0.5


def test_cross_corpus_overlap_df_cap_drops_hot_shingle(spark):
    from topnotch_spark.operators.curation import cross_corpus_overlap

    hot = "one two three four five"
    bench = _docs(spark, [(100, hot)])
    corpus = _docs(spark, [(i, hot) for i in range(5)])
    # cap 3 < df 5 -> the only shingle is dropped from the join
    out = cross_corpus_overlap(
        corpus, bench, "doc_id", "text", shingle_n=5, max_shingle_df=3
    ).collect()
    assert out == []
    # without the cap all 5 pairs surface
    assert (
        cross_corpus_overlap(corpus, bench, "doc_id", "text", shingle_n=5).count()
        == 5
    )


def test_stratified_topn_exact_counts(spark):
    from topnotch_spark.operators.curation import stratified_topn

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_topn(df, "doc_id", "lang", 7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["en"]) == 7 and len(by_lang["de"]) == 7
    # deterministic across invocations
    again = stratified_topn(df, "doc_id", "lang", 7).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)
    # n larger than stratum -> whole stratum
    assert stratified_topn(df, "doc_id", "lang", 60).count() == 100


def test_stratified_sample_null_stratum_uses_default(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None)], "doc_id long, lang string"
    )
    # default_rate=1.0 keeps NULL-stratum rows
    got = {
        r["doc_id"]
        for r in stratified_sample(
            df, "doc_id", "lang", {"en": 1.0}, default_rate=1.0
        ).collect()
    }
    assert got == {1, 2, 3}
    # default_rate=0 drops them
    got0 = {
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", "lang", {"en": 1.0}).collect()
    }
    assert got0 == {1}


def test_stratified_sample_null_distinct_from_empty_string(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, lang string"
    )
    # '' has an explicit 0-rate; NULL must still follow default_rate=1.0
    got = {
        r["doc_id"]
        for r in stratified_sample(
            df, "doc_id", "lang", {"": 0.0}, default_rate=1.0
        ).collect()
    }
    assert got == {2}


def test_quality_filter_null_text_dropped(spark):
    out = {
        r["doc_id"]: r
        for r in quality_filter(
            _docs(spark, [(1, None), (2, "")]), "doc_id", "text"
        ).collect()
    }
    assert not out[1]["keep"] and "null_text" in out[1]["drop_reasons"]
    assert not out[2]["keep"] and "too_short" in out[2]["drop_reasons"]


def test_pii_counts_reflect_actual_redactions(spark):
    # the email swallows the ipv4-looking host: no <IP> redaction occurs,
    # so n_ipv4 must be 0 (counts are staged, not taken on the original)
    row = pii_scrub(
        _docs(spark, [(1, "mail user@1.2.3.4.net ok")]), "doc_id", "text"
    ).collect()[0]
    assert row["n_email"] == 1 and row["n_ipv4"] == 0
    assert "<EMAIL>" in row["clean_text"] and "<IP>" not in row["clean_text"]


def test_stratified_topn_null_stratum_is_own_group(spark):
    from topnotch_spark.operators.curation import stratified_topn

    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None), (4, None)], "doc_id long, lang string"
    )
    out = stratified_topn(df, "doc_id", "lang", 2).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang[None]) == 2 and by_lang["en"] == [1]


def test_normalize_text_cleanup_and_flag(spark):
    from topnotch_spark.operators.curation import normalize_text

    rows = [
        (1, "Hello\tWorld\x00!"),     # tab + NUL -> collapsed space
        (2, "already clean"),          # unchanged
        (3, "  MiXeD   Case  "),       # trim + collapse + lower
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df, "doc_id", "text").collect()}
    assert out[1]["norm_text"] == "hello world !"
    assert out[1]["changed"] is True
    assert out[2]["norm_text"] == "already clean"
    assert out[2]["changed"] is False
    assert out[3]["norm_text"] == "mixed case"
    assert out[3]["n_chars_raw"] == 16 and out[3]["n_chars_norm"] == 10


def test_winsorize_grouped_bounds_and_clip(spark):
    from topnotch_spark.operators.curation import winsorize

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 101)],
        "id int, grp string, v double",
    )
    out = winsorize(df, "v", ["grp"], lower_p=0.05, upper_p=0.95).collect()
    # percentile over 1..100: p05 = 1 + 0.05*99 = 5.95, p95 = 95.05
    lo, hi = out[0]["lo"], out[0]["hi"]
    assert lo == 5.95 and hi == 95.05
    clipped = {r["id"]: r["v_clipped"] for r in out}
    assert clipped[1] == 5.95 and clipped[100] == 95.05 and clipped[50] == 50.0


def test_winsorize_ungrouped_approx_path(spark):
    from topnotch_spark.operators.curation import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id int, v double"
    )
    out = winsorize(df, "v", None, exact=False).collect()
    assert all(r["lo"] <= r["v_clipped"] <= r["hi"] for r in out)


def test_hash_split_deterministic_and_stable(spark):
    from topnotch_spark.operators.curation import hash_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r["id"]: r["split"] for r in hash_split(df, "id", fr).collect()}
    out2 = {r["id"]: r["split"] for r in hash_split(df, "id", fr).collect()}
    assert out == out2  # deterministic
    counts = {s: 0 for s in fr}
    for s in out.values():
        counts[s] += 1
    assert 700 < counts["train"] < 900  # ~80% of 1000
    # growth stability: the same ids keep their split in a superset
    bigger = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    out3 = {r["id"]: r["split"] for r in hash_split(bigger, "id", fr).collect()}
    assert all(out3[i] == out[i] for i in out)


def test_hash_split_empty_fractions_raises(spark):
    import pytest

    from topnotch_spark.operators.curation import hash_split

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        hash_split(df, "id", {})


def test_source_mix_weights_alpha(spark):
    from topnotch_spark.operators.curation import source_mix_weights

    # s1 has 9x the tokens of s2; alpha=0.5 compresses the ratio to 3x
    df = spark.createDataFrame(
        [("s1", "t " * 90), ("s2", "t " * 10)], "source string, text string"
    )
    out = {r["source"]: r for r in
           source_mix_weights(df, "source", "text", alpha=0.5).collect()}
    assert out["s1"]["token_share"] == 0.9
    assert out["s2"]["token_share"] == 0.1
    assert abs(out["s1"]["mix_weight"] / out["s2"]["mix_weight"] - 3.0) < 1e-4
    assert abs(out["s1"]["mix_weight"] + out["s2"]["mix_weight"] - 1.0) < 1e-5


def test_pack_token_shards_requires_explicit_global(spark):
    # the single-partition global window is opt-in at 100 TB scale
    import pytest

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="global_ordering=True"):
        pack_token_shards(df, "doc_id", "text", budget=6)


# ---- cross-document line dedup -------------------------------------------

def test_dedup_lines_strips_shared_boilerplate(spark):
    from topnotch_spark.operators.curation import dedup_lines

    df = _docs(spark, [
        (1, "unique alpha\nCOOKIE BANNER\nbody one"),
        (2, "unique beta\nCOOKIE BANNER\nbody two"),
        (3, "unique gamma\nbody three"),
    ])
    out = {r["id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    assert out[1]["text"] == "unique alpha\nbody one"
    assert out[2]["text"] == "unique beta\nbody two"
    assert out[3]["text"] == "unique gamma\nbody three"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 1)
    assert (out[3]["n_lines"], out[3]["n_removed"]) == (2, 0)


def test_dedup_lines_fully_boilerplate_doc_stays_empty(spark):
    from topnotch_spark.operators.curation import dedup_lines

    df = _docs(spark, [(1, "SAME"), (2, "SAME"), (3, "other")])
    out = {r["id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    # both copies removed everywhere, docs stay in the output
    assert out[1]["text"] == "" and out[1]["n_removed"] == 1
    assert out[2]["text"] == "" and out[2]["n_removed"] == 1
    assert out[3]["text"] == "other" and out[3]["n_removed"] == 0


def test_dedup_lines_short_lines_exempt(spark):
    from topnotch_spark.operators.curation import dedup_lines

    # blank separator lines repeat across docs but must survive
    df = _docs(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    out = {r["id"]: r["text"]
           for r in dedup_lines(df, "doc_id", "text").collect()}
    assert out == {1: "a\n\nb", 2: "c\n\nd"}


def test_dedup_lines_df_counts_documents_not_occurrences(spark):
    from topnotch_spark.operators.curation import dedup_lines

    # the repeated line appears twice WITHIN one doc only: document
    # frequency is 1, so it must be kept
    df = _docs(spark, [(1, "x\nx\ny")])
    out = dedup_lines(df, "doc_id", "text").collect()[0]
    assert out["text"] == "x\nx\ny" and out["n_removed"] == 0


def test_dedup_lines_custom_separator_and_cap(spark):
    from topnotch_spark.operators.curation import dedup_lines

    df = _docs(spark, [(1, "p|q"), (2, "p|r"), (3, "p|s")])
    keep2 = {r["id"]: r["text"] for r in
             dedup_lines(df, "doc_id", "text", sep="|", max_line_df=2).collect()}
    assert keep2 == {1: "q", 2: "r", 3: "s"}  # p in 3 docs > cap 2
    keep3 = {r["id"]: r["text"] for r in
             dedup_lines(df, "doc_id", "text", sep="|", max_line_df=3).collect()}
    assert keep3 == {1: "p|q", 2: "p|r", 3: "p|s"}


# ---- weighted deterministic sampling -------------------------------------

def test_weighted_sample_extremes_and_null(spark):
    from topnotch_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in [(1, 1.0), (2, 0.0), (3, None), (4, 5.0), (5, -2.0)]],
        "doc_id long, w double",
    )
    kept = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w").collect()}
    assert 1 in kept          # weight 1 always keeps
    assert 2 not in kept      # weight 0 always drops
    assert 3 not in kept      # NULL weight drops
    assert 4 in kept          # clamped to 1
    assert 5 not in kept      # clamped to 0


def test_weighted_sample_monotone_and_deterministic(spark):
    from pyspark.sql import functions as F
    from topnotch_spark.operators.curation import weighted_sample

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    k3 = {r["doc_id"] for r in
          weighted_sample(df, "doc_id", F.lit(0.3)).collect()}
    k7 = {r["doc_id"] for r in
          weighted_sample(df.repartition(7), "doc_id", F.lit(0.7)).collect()}
    assert k3 <= k7                       # same salt: keep sets nest
    assert abs(len(k3) / 2000 - 0.3) < 0.05
    assert abs(len(k7) / 2000 - 0.7) < 0.05
    again = {r["doc_id"] for r in
             weighted_sample(df.repartition(13), "doc_id", F.lit(0.3)).collect()}
    assert again == k3                    # partitioning-independent


def test_dedup_lines_and_weighted_sample_empty_input(spark):
    from topnotch_spark.operators.curation import dedup_lines, weighted_sample

    empty = spark.createDataFrame([], "doc_id long, text string, w double")
    assert dedup_lines(empty, "doc_id", "text").count() == 0
    assert weighted_sample(empty, "doc_id", "w").count() == 0


def test_dedup_lines_null_text_rows_survive(spark):
    from topnotch_spark.operators.curation import dedup_lines

    # a NULL text splits to NULL lines — the doc must not vanish, and
    # must come back with empty text and zero counted lines
    df = spark.createDataFrame(
        [(1, None), (2, "keep me")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert out[2]["text"] == "keep me"
    assert out[1]["text"] == "" and out[1]["n_removed"] == 0


def test_sample_to_token_budget_fills_targets(spark):
    from topnotch_spark.operators.curation import sample_to_token_budget
    from topnotch_spark.operators.dedup import dedup_scope

    rows = [(i, "tok " * (10 + i % 5), f"g{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with dedup_scope():
        out = sample_to_token_budget(
            df, "doc_id", "text", "source", budget_tokens=200, alpha=0.5
        ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], []).append(r)
    assert set(by_group) == {"g0", "g1"}
    for g, rs in by_group.items():
        sel = [r for r in rs if r["selected"]]
        target = rs[0]["target_tokens"]
        got = sum(r["n_tokens"] for r in sel)
        # target met (enough data), overshoot bounded by one doc
        assert got >= target
        assert got - max(r["n_tokens"] for r in sel) < target
        # selection is a prefix of the hash order: cum of any selected row
        # is <= cum of any unselected row
        max_sel = max(r["cum_tokens"] for r in sel)
        unsel = [r["cum_tokens"] for r in rs if not r["selected"]]
        assert not unsel or max_sel < min(unsel)


def test_sample_to_token_budget_deterministic(spark):
    from topnotch_spark.operators.curation import sample_to_token_budget
    from topnotch_spark.operators.dedup import dedup_scope

    rows = [(i, "w " * (5 + i % 7), "s") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with dedup_scope():
        a = {
            r["doc_id"]: r["selected"]
            for r in sample_to_token_budget(
                df, "doc_id", "text", "source", 50
            ).collect()
        }
    with dedup_scope():
        b = {
            r["doc_id"]: r["selected"]
            for r in sample_to_token_budget(
                df.repartition(7), "doc_id", "text", "source", 50
            ).collect()
        }
    assert a == b  # membership independent of physical layout


def test_weighted_topn_exact_count_and_bias(spark):
    """A-Res returns exactly n rows, and heavy weights dominate: with
    weights 1000:1 the top quartile of ids (weight 1000) should fill
    nearly every slot."""
    from pyspark.sql import functions as F

    from topnotch_spark.operators.curation import weighted_sample_topn

    df = spark.range(400).select(
        F.col("id"),
        F.when(F.col("id") < 100, 1000.0).otherwise(1.0).alias("w"),
    )
    out = weighted_sample_topn(df, "id", "w", n=50).collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r["id"] < 100)
    assert heavy >= 45  # overwhelming weight ratio -> near-total capture


def test_weighted_topn_null_and_zero_weights_excluded(spark):
    from topnotch_spark.operators.curation import weighted_sample_topn

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 0.0), (4, -1.0), (5, 2.0)],
        "id long, w double",
    )
    out = {r["id"] for r in weighted_sample_topn(df, "id", "w", n=10).collect()}
    assert out == {1, 5}


def test_weighted_topn_deterministic_across_partitioning(spark):
    from pyspark.sql import functions as F

    from topnotch_spark.operators.curation import weighted_sample_topn

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    a = {r["id"] for r in weighted_sample_topn(df, "id", "w", 40).collect()}
    b = {
        r["id"]
        for r in weighted_sample_topn(df.repartition(13), "id", "w", 40).collect()
    }
    assert a == b


def test_weighted_topn_rejects_bad_n(spark):
    import pytest as _pytest

    from topnotch_spark.operators.curation import weighted_sample_topn

    df = spark.range(5).selectExpr("id", "1.0 AS w")
    with _pytest.raises(ValueError):
        weighted_sample_topn(df, "id", "w", 0)
