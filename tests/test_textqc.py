"""Text-analysis and similarity operator unit tests (known answers)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from topnotch_spark.functions.text import simhash, tokens
from topnotch_spark.functions.vectors import plane_signs
from topnotch_spark.operators.similarity import brute_force_topk, srp_ann_topk
from topnotch_spark.operators.textqc import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox and the lazy dog"),
        (2, "aaa aaa aaa aaa"),
        (3, ""),
        (4, "der hund und die katze ist nicht da"),
        (5, "12345 67890 !!!"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_token_stats_values(spark, docs):
    out = {r["doc_id"]: r for r in token_stats(docs, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 8
    assert out[1]["n_distinct_tokens"] == 7          # 'the' twice (lowercased)
    assert out[2]["n_tokens"] == 4 and out[2]["n_distinct_tokens"] == 1
    assert out[2]["type_token_ratio"] == 0.25
    assert out[3]["n_tokens"] == 0 and out[3]["avg_token_len"] == 0.0
    # doc2: all tokens length 3
    assert out[2]["avg_token_len"] == 3.0


def test_quality_scores_bounds_and_signal(spark, docs):
    out = {r["doc_id"]: r for r in quality_scores(docs, "doc_id", "text").collect()}
    for r in out.values():
        assert 0.0 <= r["quality_score"] <= 1.0
    assert out[1]["quality_score"] > out[5]["quality_score"]  # prose > digits
    assert out[2]["distinct_ratio"] == 0.25                   # repetition penalty
    assert out[3]["quality_score"] == 0.0                     # empty text


def test_language_id(spark, docs):
    out = {r["doc_id"]: r for r in language_id(docs, "doc_id", "text").collect()}
    assert out[1]["predicted_lang"] == "en"
    assert out[4]["predicted_lang"] == "de"
    # CJK override
    zh = spark.createDataFrame([(9, "你好世界")], "doc_id int, text string")
    assert language_id(zh, "doc_id", "text").collect()[0]["predicted_lang"] == "zh"


def test_fingerprints_simhash_reference(spark):
    """simhash must equal a pure-Python reimplementation of the spec."""
    text = "alpha beta gamma delta"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    got = fingerprints(df, "doc_id", "text").collect()[0]["simhash32"]

    toks = []
    for t in text.lower().split():
        if t and t not in toks:
            toks.append(t)
    votes = [0] * 32
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for b in range(32):
            votes[b] += 1 if (h >> (31 - b)) & 1 else -1
    expect = "".join("1" if v > 0 else "0" for v in votes)
    assert got == expect


def test_fingerprints_exact_md5(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id int, text string")
    r = fingerprints(df, "doc_id", "text").collect()[0]
    assert r["exact_md5"] == hashlib.md5(b"hello world").hexdigest()


def test_plane_signs_match_sql_formula(spark):
    """Driver-side literal planes == executor-side md5 derivation."""
    for p in range(3):
        signs = plane_signs(p, 8)
        for i, s in enumerate(signs):
            nib = int(hashlib.md5(f"p{p}_d{i}".encode()).hexdigest()[0], 16)
            assert s == (1.0 if nib >= 8 else -1.0)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
        (4, [0.8, 0.2, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_brute_force_topk_ranking(spark, vectors):
    q = vectors.filter("vec_id = 0")
    out = brute_force_topk(vectors, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 4, 2]   # by cosine desc
    assert out[0]["cos_sim"] > out[1]["cos_sim"] > out[2]["cos_sim"]
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_brute_force_excludes_self(spark, vectors):
    q = vectors.filter("vec_id = 0")
    out = brute_force_topk(vectors, q, k=10).collect()
    assert all(r["neighbor_id"] != 0 for r in out)


def test_ann_results_subset_of_exact(spark, vectors):
    q = vectors.filter("vec_id = 0")
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in brute_force_topk(vectors, q, k=10).collect()
    }
    ann = srp_ann_topk(vectors, q, k=10, n_planes=2, dim=3).collect()
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact and exact[key] == r["cos_sim"]


def test_ivf_full_probe_equals_brute_force(spark, vectors):
    """Probing every list makes IVF exact — candidates = whole corpus."""
    from topnotch_spark.operators.similarity import ivf_topk

    q = vectors.filter("vec_id = 0")
    exact = [
        (r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in brute_force_topk(vectors, q, k=4).orderBy("rank").collect()
    ]
    ivf = [
        (r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in ivf_topk(
            vectors, q, k=4, n_centroids=3, n_probe=3
        ).orderBy("rank").collect()
    ]
    assert ivf == exact


def test_ivf_partial_probe_subset_of_exact(spark, vectors):
    from topnotch_spark.operators.similarity import ivf_topk

    q = vectors.filter("vec_id = 0")
    exact = {
        r["neighbor_id"]: r["cos_sim"]
        for r in brute_force_topk(vectors, q, k=10).collect()
    }
    for r in ivf_topk(vectors, q, k=10, n_centroids=3, n_probe=1).collect():
        assert exact[r["neighbor_id"]] == r["cos_sim"]


def test_bpe_ish_token_count_known_string(spark):
    from topnotch_spark.functions.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(1, " Hello world, it's 2024!! foo_bar"), (2, ""), (3, "abc")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", bpe_ish_token_count("text").alias("n")).collect()
    }
    # pieces: ' Hello', ' world', ',', ' it', "'s", ' 2024', '!!', ' foo', '_', 'bar'
    assert out == {1: 10, 2: 0, 3: 1}


def test_repetition_stats_fractions(spark):
    from topnotch_spark.operators.textqc import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 9 tokens/3 distinct; 7 shingles/3 distinct
            (2, "w x y z"),             # no repetition
            (3, "q"),                   # too short for shingles
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 9 and r1["n_shingles"] == 7
    assert r1["dup_token_frac"] == round(1 - 3 / 9, 6)
    assert r1["dup_shingle_frac"] == round(1 - 3 / 7, 6)
    assert out[2]["dup_token_frac"] == 0.0 and out[2]["dup_shingle_frac"] == 0.0
    assert out[3]["n_shingles"] == 0


def test_tfidf_keywords_ranking(spark):
    import math

    from topnotch_spark.operators.textqc import tfidf_keywords

    df = spark.createDataFrame(
        [
            (1, "apple apple banana shared"),
            (2, "cherry shared"),
            (3, "durian shared shared"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["rank"]): r for r in tfidf_keywords(df, "doc_id", "text", k=2).collect()}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=1 -> ln(3); shared df=3 -> 0
    assert out[(1, 1)]["token"] == "apple"
    assert out[(1, 1)]["tfidf"] == round(2 * math.log(3.0), 6)
    assert out[(1, 2)]["token"] == "banana"
    # 'shared' scores ln(3/3)=0 everywhere -> never rank 1
    assert all(
        r["token"] != "shared" or r["tfidf"] == 0.0 for r in out.values()
    )


def test_quality_bands_partitioned(spark):
    from topnotch_spark.operators.textqc import quality_bands

    df = spark.createDataFrame(
        [(i, "s1" if i <= 8 else "s2", i * 10) for i in range(1, 13)],
        "doc_id int, source string, n_chars int",
    )
    out = {
        r["doc_id"]: r["band"]
        for r in quality_bands(df, "doc_id", "n_chars", "source", 4).collect()
    }
    # s1 has 8 docs -> 2 per band in order of n_chars
    assert [out[i] for i in range(1, 9)] == [1, 1, 2, 2, 3, 3, 4, 4]
    # s2 has 4 docs -> 1 per band
    assert [out[i] for i in range(9, 13)] == [1, 2, 3, 4]


def test_token_length_histogram_buckets(spark):
    from topnotch_spark.operators.textqc import token_length_histogram

    df = spark.createDataFrame(
        [("",), ("one",), ("a b",), ("a b c d e",)], "text string"
    )
    out = {
        r["log2_bucket"]: (r["n_docs"], r["min_tokens"], r["max_tokens"])
        for r in token_length_histogram(df, "text").collect()
    }
    assert out[-1] == (1, 0, 0)   # empty doc
    assert out[0] == (1, 1, 1)    # 1 token -> log2 = 0
    assert out[1] == (1, 2, 2)    # 2 tokens -> log2 = 1
    assert out[2] == (1, 5, 5)    # 5 tokens -> floor(log2 5) = 2


def test_unigram_logprob_uniform_corpus(spark):
    import math

    from topnotch_spark.operators.textqc import unigram_logprob

    # 4 tokens total, each appearing once -> p = 1/4 for every token
    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "")], "doc_id int, text string"
    )
    out = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"])
           for r in unigram_logprob(df, "doc_id", "text").collect()}
    expect = round(-math.log(0.25), 4)
    assert out[1] == (2, expect) and out[2] == (2, expect)
    assert out[3] == (0, None)  # empty doc survives with NULL score


def test_unigram_logprob_rare_token_scores_higher(spark):
    from topnotch_spark.operators.textqc import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyzzyva")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["avg_neg_logprob"]
           for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert out[2] > out[1]


def test_lang_mix_shares(spark):
    from topnotch_spark.operators.textqc import lang_mix

    df = spark.createDataFrame(
        [
            (1, "the cat of the house", "s1"),
            (2, "the dog and the bird", "s1"),
            (3, "der hund ist nicht das", "s1"),
            (4, "el que los las es y", "s2"),
        ],
        "doc_id int, text string, source string",
    )
    out = {
        (r["source"], r["predicted_lang"]): (r["n_docs"], r["share"])
        for r in lang_mix(df, "doc_id", "text", "source").collect()
    }
    assert out[("s1", "en")] == (2, round(2 / 3, 6))
    assert out[("s1", "de")] == (1, round(1 / 3, 6))
    assert out[("s2", "es")] == (1, 1.0)


def test_quality_bands_requires_explicit_global(spark):
    # the single-partition global sort is opt-in at 100 TB scale
    import pytest

    from topnotch_spark.operators.textqc import quality_bands

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_chars long")
    with pytest.raises(ValueError, match="global_ordering=True"):
        quality_bands(df, "doc_id", "n_chars")
    got = quality_bands(
        df, "doc_id", "n_chars", n_bands=2, global_ordering=True
    ).collect()
    assert [r["band"] for r in got] == [1]


def test_bigram_logprob_closed_form(spark):
    from math import log

    from topnotch_spark.operators.textqc import bigram_logprob

    # corpus = one doc "a b a b": bigrams ab, ba, ab; c(ab)=2, c(ba)=1;
    # unigrams a=2, b=2; V=2; add-1: P(b|a)=(2+1)/(2+2), P(a|b)=(1+1)/(2+2)
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    row = bigram_logprob(df, "doc_id", "text").collect()[0]
    expect = -(log(3 / 4) + log(2 / 4) + log(3 / 4)) / 3
    assert row["n_bigrams"] == 3
    assert row["avg_neg_logprob"] == round(expect, 4)


def test_bigram_logprob_scores_word_order(spark):
    """The point of the bigram model: a shuffled-word doc keeps a perfect
    unigram profile but must score WORSE than in-order text."""
    from topnotch_spark.operators.textqc import bigram_logprob

    fluent = "the quick fox jumps over the lazy dog"
    rows = [(i, fluent) for i in range(8)]
    rows.append((99, "dog the over quick lazy jumps fox the"))  # same words
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_neg_logprob"]
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert got[99] > got[0]


def test_bigram_logprob_short_docs_null(spark):
    from topnotch_spark.operators.textqc import bigram_logprob

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"])
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    assert got[1] == (0, None) and got[2] == (0, None)
    assert got[3][0] == 1 and got[3][1] is not None


def test_gopher_rules_flags(spark):
    from topnotch_spark.operators.textqc import gopher_rules

    good = ("the cat and the dog have fun with all of that stuff " * 5).strip()
    bullets = "- one\n- two\n- three"
    dots = "first line...\nsecond line...\nthird..."
    symbols = "the " + "# " * 40 + "of and that have with be to"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, dots), (4, symbols), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_rules(df, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["r_word_count"] and out[1]["r_stopwords"]
    assert not out[2]["r_bullet"] and out[2]["bullet_ratio"] == 1.0
    assert not out[3]["r_ellipsis"] and out[3]["ellipsis_ratio"] == 1.0
    assert not out[4]["r_symbol"] and not out[4]["r_alpha"]
    assert out[5]["n_words"] == 0 and not out[5]["keep"]


def test_gopher_rules_custom_stopwords(spark):
    from topnotch_spark.operators.textqc import gopher_rules

    text = ("alpha beta gamma delta epsilon " * 20).strip()
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    base = gopher_rules(df, "doc_id", "text").first()
    assert not base["r_stopwords"]
    custom = gopher_rules(
        df, "doc_id", "text", stopwords=["alpha", "beta"], min_stop_hits=2
    ).first()
    assert custom["r_stopwords"] and custom["stop_hits"] == 2
