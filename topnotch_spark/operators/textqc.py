"""Text-analysis operators: token statistics, quality scoring,
language identification, document fingerprinting, repetition stats,
vocabulary top-k, TF-IDF keywords.

All pure-`pyspark.sql.functions` projections (single pass, codegen'd, no
shuffle except where a groupBy is the point of the query). Designed so a
quality/language column can feed directly into an assertion command, e.g.
``{"query": "quality_score >= 0.5", ...}`` over the profiled output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from topnotch_spark.functions.text import (
    alpha_ratio,
    bpe_ish_token_count,
    simhash,
    sorted_token_fingerprint,
    stopword_ratio,
    tokens,
)

# tiny marker lexicons for the language-ID heuristic (n-gram/stopword
# scoring); deliberately small + deterministic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht", "das"],
    "fr": ["le", "la", "et", "est", "les", "des"],
    "es": ["el", "los", "las", "es", "y", "que"],
}


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nd.alias("n_distinct_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.when(n > 0, F.round(total_len / n, 4)).otherwise(F.lit(0.0)).alias(
            "avg_token_len"
        ),
        F.when(n > 0, F.round(nd / n, 4)).otherwise(F.lit(0.0)).alias(
            "type_token_ratio"
        ),
    )


def quality_scores(
    df: DataFrame, id_col: str, text_col: str, stopwords: list[str] | None = None
) -> DataFrame:
    """Composite quality score in [0,1]: length norm (saturates at 200
    tokens), alpha-char ratio, stopword presence, repetition penalty."""
    sw = stopwords if stopwords is not None else LANG_MARKERS["en"]
    toks = tokens(text_col)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    alpha = alpha_ratio(text_col)
    sw_ratio = stopword_ratio(text_col, sw)
    rep = F.when(n > 0, nd / n).otherwise(F.lit(0.0))  # 1 = no repetition
    score = F.round(
        length_score * 0.25 + alpha * 0.25 + F.least(sw_ratio * 5, F.lit(1.0)) * 0.2
        + rep * 0.3,
        6,
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(rep, 6).alias("distinct_ratio"),
        score.alias("quality_score"),
        (score >= 0.5).alias("passes_quality"),
    )


def _lang_score(text_col: str, markers: list[str]) -> Column:
    toks = tokens(text_col)
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def language_id(
    df: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Stopword-marker language ID with a CJK-character override.
    Deterministic argmax with fixed language order tiebreak.
    ``extra_cols`` pass through unchanged (so consumers like
    :func:`langid_accuracy` stay single-scan instead of self-joining).

    Staged in two selects so each marker score is computed ONCE as a
    column and the argmax/tiebreak reference cheap attributes — a single
    flat select would duplicate the tokenize+filter expression into every
    comparison (~4x the work; Catalyst only de-dups cheap expressions).
    """
    scores = {lang: _lang_score(text_col, m) for lang, m in LANG_MARKERS.items()}
    # \x{...} escapes parse identically in Java regex (Spark) and RE2 (DuckDB)
    has_cjk = F.col(text_col).rlike("[\\x{4e00}-\\x{9fff}]")
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in (extra_cols or [])],
        has_cjk.alias("__cjk__"),
        *[scores[lang].alias(f"__s_{lang}__") for lang in LANG_MARKERS],
    )
    best_score = F.greatest(*[F.col(f"__s_{lang}__") for lang in LANG_MARKERS])
    pred = F.when(F.col("__cjk__"), F.lit("zh"))
    for lang in LANG_MARKERS:  # insertion order = tiebreak priority
        pred = pred.when(F.col(f"__s_{lang}__") == best_score, F.lit(lang))
    cols = [F.col(id_col)]
    cols += [F.col(c) for c in (extra_cols or [])]
    cols += [
        F.round(F.col(f"__s_{lang}__"), 6).alias(f"score_{lang}")
        for lang in LANG_MARKERS
    ]
    cols += [
        pred.alias("predicted_lang"),
        F.round(best_score, 6).alias("lang_confidence"),
    ]
    return staged.select(*cols)


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """Within-document repetition signals (Gopher/C4-style quality
    filters): duplicate-token and duplicate-n-gram fractions. A document
    whose n-grams are mostly repeats is boilerplate/template spam even
    when its token mix looks fine. Pure projection, zero shuffle; one
    compiled-regex pass extracts the overlapping shingles (same
    formulation as dedup.shingle_arrays, NOT de-duplicated — the
    multiplicity is the signal here)."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    nd_tok = F.size(F.array_distinct(toks))
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    pat = r"(?<=^|\s)(?=((?:\S+ ){" + str(shingle_n - 1) + r"}\S+))"
    shs = F.regexp_extract_all(norm, F.lit(pat), 1)
    n_sh = F.size(shs)
    nd_sh = F.size(F.array_distinct(shs))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.round(1 - nd_tok / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        n_sh.alias("n_shingles"),
        F.when(n_sh > 0, F.round(1 - nd_sh / n_sh, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_shingle_frac"),
    )


def vocab_topk(df: DataFrame, id_col: str, text_col: str, k: int = 50) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by term frequency with
    document frequency alongside (token, n_total, n_docs).

    Execution shape: explode → ONE groupBy(token) with map-side partial
    aggregation (counts combine before the shuffle, so shuffle volume is
    the distinct-vocab size per partition, not the token stream), then a
    global top-k — Spark plans orderBy+limit as TakeOrderedAndProject
    (per-partition heaps, k rows to the driver), not a full sort.
    Deterministic total order: (n_total desc, token asc). The
    count_distinct(doc) rewrites to a two-phase agg on (token, id) —
    fine at any scale since that pair set is ≤ the exploded stream."""
    tok = df.select(
        F.col(id_col).alias("__id__"), F.explode(tokens(text_col)).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("__id__").alias("n_docs"),
        )
        .orderBy(F.desc("n_total"), F.asc("token"))
        .limit(k)
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document fingerprints: exact md5, order-insensitive token
    fingerprint, and 32-bit simhash bit-string. The per-row simhash
    (32 md5s per token) is CPU-bound narrow work — spread_cpu runs it
    cores-wide when the scan is parallelism-starved (measured 1.5s →
    0.44s at sf0.1 on the single-row-group bench layout; no-op at
    scale)."""
    from topnotch_spark.operators.dedup import spread_cpu

    return spread_cpu(df, id_col).select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("exact_md5"),
        sorted_token_fingerprint(text_col).alias("token_fingerprint"),
        simhash(text_col, 32).alias("simhash32"),
    )


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF keywords per document: tf(token, doc) × ln(N/df).

    Execution shape: explode → ONE groupBy(id, token) for tf (map-side
    partial), a vocab-sized groupBy(token) for document frequency, a
    token-keyed join (the df table is vocab-sized — broadcastable at any
    realistic vocab), then a per-doc top-k window. N is a single count
    scalar (1 driver value, computed once). Deterministic tiebreak
    (score desc, token asc)."""
    n_docs = df.count()
    tok = df.select(
        F.col(id_col).alias("__id__"), F.explode(tokens(text_col)).alias("token")
    )
    tf = tok.groupBy("__id__", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_t"))
    scored = tf.join(F.broadcast(dfreq), "token").select(
        "__id__",
        "token",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_t")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("__id__").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("__id__").alias(f"{id_col}"), "token", "tfidf", "rank")
    )


def quality_bands(
    df: DataFrame,
    id_col: str,
    order_col: str,
    partition_col: str | None = None,
    n_bands: int = 4,
    global_ordering: bool = False,
) -> DataFrame:
    """Equal-count quality banding: ntile(n) over (order_col, id) within
    each partition — "quartile by length per source" style stratification
    used to mix training batches across quality strata. The id tiebreak
    makes band edges deterministic when order values collide.

    One row_number-class window pass (shuffle on the partition column).
    Banding a full corpus globally is a single-partition sort by
    construction, so it requires an explicit ``global_ordering=True``
    opt-in; the default path partitions (per source / per shard), which
    is also the semantics training mixes want."""
    if partition_col is None and not global_ordering:
        raise ValueError(
            "quality_bands without partition_col builds a single-partition "
            "global sort; pass partition_col=<col> for the parallel path or "
            "global_ordering=True to opt in to corpus-global bands"
        )
    part = (
        Window.partitionBy(partition_col) if partition_col else Window.partitionBy()
    )
    w = part.orderBy(F.col(order_col).asc(), F.col(id_col).asc())
    return df.select(
        F.col(id_col),
        *([F.col(partition_col)] if partition_col else []),
        F.col(order_col),
        F.ntile(n_bands).over(w).alias("band"),
    )


def token_length_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus-level histogram of document token counts in power-of-two
    buckets (bucket = floor(log2(n_tokens)), -1 for empty docs) — the
    one-glance length profile of a training corpus (truncation planning,
    packing-budget choice).

    log2 is computed in integer space as length(bin(n)) - 1, so bucket
    edges carry no float rounding. One projection + one groupBy over
    ~60 possible buckets: partial aggregation makes the shuffle a few
    rows per task at any corpus size."""
    n = F.size(tokens(text_col)).cast("long")
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        (F.length(F.bin(n)) - 1).cast("int")
    )
    return (
        df.select(n.alias("n_tokens"), bucket.alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 4
) -> DataFrame:
    """Per-document average negative log-probability under the corpus's
    own unigram language model — the cheap perplexity-style fluency
    screen (high avg_neg_logprob = rare-token-heavy doc: gibberish,
    boilerplate IDs, wrong-language fragments).

    Execution shape: the corpus is tokenized ONCE into a persisted
    (id, token-array) frame that feeds the model build, the per-doc
    scoring pass, and the final id spine (4 source scans without it —
    consume inside ``dedup_scope()`` / ``unpersist_intermediates()`` to
    release it). From it: explode -> ONE vocab-sized groupBy(token) for
    counts (also persisted: it feeds the total and the per-token table),
    total tokens as a 1-row broadcast, per-token ln p joined back (vocab
    table broadcastable at any realistic size), ONE groupBy(doc) for the
    mean, left-joined to the id spine so empty docs survive with NULL
    score. Two shuffles (vocab, doc) over exploded tokens — the same
    shape as TF-IDF, scan-bound at corpus scale."""
    from topnotch_spark.operators.dedup import _persist

    arr = _persist(
        df.select(F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__"))
    )
    tok = arr.select("__id__", F.explode("__toks__").alias("token"))
    vocab = _persist(tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")))
    total = vocab.agg(F.sum("c").alias("total"))
    logp = vocab.crossJoin(F.broadcast(total)).select(
        "token", F.log(F.col("c") / F.col("total")).alias("__lp__")
    )
    per_doc = (
        tok.join(F.broadcast(logp), "token")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.col("__lp__")), round_digits).alias(
                "avg_neg_logprob"
            ),
        )
    )
    return arr.select("__id__").join(per_doc, "__id__", "left").select(
        F.col("__id__").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "avg_neg_logprob",
    )


def lang_mix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Language composition per corpus slice: language_id's predicted
    language rolled up to (group, lang, n_docs, share) — the
    contamination/coverage report a multilingual corpus needs per
    source before mixing.

    Execution shape: the langid projection is zero-shuffle; ONE
    groupBy(group, lang) over it (map-side combined), then the share
    normalizes via a window over the rollup frame itself —
    |groups| x |langs| rows, so the window input is bounded regardless
    of corpus size."""
    lang = language_id(df, id_col, text_col).select(
        F.col(id_col), F.col("predicted_lang")
    )
    per = (
        lang.join(df.select(F.col(id_col), F.col(group_col)), id_col)
        .groupBy(group_col, "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy(group_col)
    return per.select(
        group_col,
        "predicted_lang",
        "n_docs",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(w), round_digits
        ).alias("share"),
    )


def vocab_overlap(
    df: DataFrame,
    text_col: str,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise vocabulary overlap between corpus slices: for every
    unordered pair of groups (sources, langs, snapshots), the distinct
    vocabulary sizes, the shared-token count, and the Jaccard similarity
    of the two vocabularies — the cheap "are these two sources the same
    kind of text" screen before corpus mixing or dedup across sources.

    Execution shape: explode tokens, ONE distinct on (group, token) (the
    big reduction: corpus → per-group vocab), per-group sizes as a
    bounded |groups|-row aggregate (broadcast back twice), and the
    intersection via a token equi-join of the distinct table with itself
    restricted to group_a < group_b — never an all-pairs cross join; the
    join fan-out per token is bounded by |groups|. Jaccard =
    inter / (|A| + |B| − inter), exact-integer until one final rounded
    division.

    The distinct (group, token) vocab table is registered in the dedup
    persist registry — it feeds the size aggregate and both join sides
    (4 source scans without it); consume inside ``dedup_scope()`` or
    call ``unpersist_intermediates()`` to release the storage."""
    from topnotch_spark.operators.dedup import _persist

    vocab = _persist(
        df.select(
            F.col(group_col).alias("g"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("g").agg(F.count(F.lit(1)).alias("vocab_size"))
    a = vocab.select(F.col("g").alias("group_a"), "token")
    b = vocab.select(F.col("g").alias("group_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("shared_tokens"))
    )
    sa = F.broadcast(
        sizes.select(
            F.col("g").alias("group_a"), F.col("vocab_size").alias("vocab_a")
        )
    )
    sb = F.broadcast(
        sizes.select(
            F.col("g").alias("group_b"), F.col("vocab_size").alias("vocab_b")
        )
    )
    union_sz = F.col("vocab_a") + F.col("vocab_b") - F.col("shared_tokens")
    return (
        inter.join(sa, "group_a")
        .join(sb, "group_b")
        .select(
            "group_a",
            "group_b",
            "vocab_a",
            "vocab_b",
            "shared_tokens",
            F.round(
                F.col("shared_tokens").cast("double") / union_sz.cast("double"),
                round_digits,
            ).alias("jaccard"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 1.0,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document average negative log-probability under the corpus's
    own BIGRAM language model with add-k smoothing — the step up from
    ``unigram_logprob`` that unigram statistics cannot make: it scores
    word ORDER, so shuffled-word salads and wrong-collocation text
    (which keep a perfect unigram profile) surface as high
    ``avg_neg_logprob``. P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V),
    V = distinct unigrams; per-doc score = mean of −ln P over the doc's
    bigrams. Emits (id, n_bigrams, avg_neg_logprob); docs with < 2
    tokens survive with NULL score.

    Execution shape: the corpus is tokenized ONCE into a persisted
    (id, token-array) frame; unigrams explode from it and bigrams are
    the zip of each array with its own 1-shifted slice (identical to
    the one-regex-pass window extraction over normalized text, since
    tokens are exactly the \\S+ runs in order). The frame feeds the
    bigram pass, the unigram pass, the scoring pass, and the final id
    spine — 5 source scans without it; consume inside ``dedup_scope()``
    / ``unpersist_intermediates()`` to release it. ONE groupBy(bigram)
    and ONE groupBy(token) build the model (map-side partial aggs; the
    unigram table is persisted too — it feeds V and the join), the
    model join-back is per-bigram (broadcast when the bigram table
    fits, shuffle join at corpus scale — vocab² bounded by observed
    bigrams), then ONE groupBy(doc) for the mean. Same two-shuffle
    shape and determinism contract as unigram_logprob (ln over
    identical IEEE doubles on both engines)."""
    from topnotch_spark.operators.dedup import _persist

    arr = _persist(
        df.select(F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__"))
    )
    n = F.size("__toks__")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("__toks__", 1, n - 1),
            F.slice("__toks__", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = arr.select("__id__", F.explode(bigrams).alias("bg"))
    tok = arr.select(F.explode("__toks__").alias("token"))
    uni = _persist(tok.groupBy("token").agg(F.count(F.lit(1)).alias("c1")))
    vsize = uni.agg(F.count(F.lit(1)).alias("v"))
    bg_counts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    lp = (
        bg_counts.withColumn("token", F.substring_index("bg", " ", 1))
        .join(uni, "token")
        .crossJoin(F.broadcast(vsize))
        .select(
            "bg",
            F.log(
                (F.col("c2") + F.lit(float(k)))
                / (F.col("c1") + F.lit(float(k)) * F.col("v"))
            ).alias("__lp__"),
        )
    )
    per_doc = (
        big.join(lp, "bg")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.col("__lp__")), round_digits).alias(
                "avg_neg_logprob"
            ),
        )
    )
    return arr.select("__id__").join(per_doc, "__id__", "left").select(
        F.col("__id__").alias(id_col),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_neg_logprob",
    )


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher",
# arXiv:2112.11446 Appendix A1.1) — the published heuristic filter set
# used by most large-scale web-corpus pipelines since.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: list[str] | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document Gopher rule evaluation: every rule emitted as its own
    boolean (so a pipeline can tune/ablate rules without recomputing) plus
    the conjunctive ``keep``. Thresholds default to the published values.

    Rules: word count in [min,max]; mean word length in [3,10]; '#'/'...'
    symbol-to-word ratio <= 0.1; <= 90% of lines bullet-led; <= 30% of
    lines ellipsis-terminated; >= 80% of words containing a letter;
    >= 2 distinct English stopwords present.

    Execution shape: one narrow projection — every rule is a JVM
    column expression over the token/line arrays (no shuffle, no UDF,
    no driver data; at 100 TB this is a streaming map). All ratios are
    rounded before threshold comparison so any ANSI engine reproduces
    the exact keep decision at rule boundaries. NULL text is treated as
    empty (repo convention, same as dedup_lines). ``stopwords`` defaults
    to the paper's English set; pass corpus-appropriate markers for
    other domains/languages."""
    sw_list = stopwords if stopwords is not None else GOPHER_STOPWORDS
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokens(txt)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    mean_len = F.when(
        n_words > 0, F.round(sum_len / n_words, round_digits)
    ).otherwise(F.lit(0.0))
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#")))
    n_ell = F.floor(
        (
            F.length(txt)
            - F.length(F.replace(txt, F.lit("...")))
        )
        / 3
    ) + (
        F.length(txt)
        - F.length(F.replace(txt, F.lit("…")))
    )
    symbol_ratio = F.when(
        n_words > 0, F.round((n_hash + n_ell) / n_words, round_digits)
    ).otherwise(F.lit(0.0))
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("-")
            | F.trim(ln).startswith("*")
            | F.trim(ln).startswith("•"),
        )
    )
    n_ell_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).endswith("...")
            | F.trim(ln).endswith("…"),
        )
    )
    bullet_ratio = F.round(n_bullet / n_lines, round_digits)
    ellipsis_ratio = F.round(n_ell_lines / n_lines, round_digits)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_ratio = F.when(
        n_words > 0, F.round(n_alpha / n_words, round_digits)
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in sw_list]),
        )
    )
    out = df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_hits.cast("int").alias("stop_hits"),
    )
    return out.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias(
            "r_word_count"
        ),
        (
            (F.col("mean_word_len") >= min_mean_len)
            & (F.col("mean_word_len") <= max_mean_len)
        ).alias("r_mean_len"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("r_symbol"),
        (F.col("bullet_ratio") <= max_bullet_ratio).alias("r_bullet"),
        (F.col("ellipsis_ratio") <= max_ellipsis_ratio).alias("r_ellipsis"),
        (F.col("alpha_ratio") >= min_alpha_ratio).alias("r_alpha"),
        (F.col("stop_hits") >= min_stop_hits).alias("r_stopwords"),
    ).select(
        "*",
        (
            F.col("r_word_count")
            & F.col("r_mean_len")
            & F.col("r_symbol")
            & F.col("r_bullet")
            & F.col("r_ellipsis")
            & F.col("r_alpha")
            & F.col("r_stopwords")
        ).alias("keep"),
    )


def token_entropy(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 6
) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (bits) plus
    the [0,1]-normalized form (entropy / log2(n_distinct)) — the standard
    gibberish/boilerplate signal: near-0 means one token dominates
    (repeated boilerplate), near-1 means maximally mixed vocabulary.

    Zero-shuffle: a single codegen'd projection per row, O(n log n) in
    the row's own token count. Entropy comes from the identity
    H = log2(n) - (Σ c·log2 c)/n where c are the per-token counts,
    computed as ONE run-length fold over the SORTED token array — never
    the naive Σ p·log2 p over distinct tokens, whose inner
    count-filter makes the projection O(distinct × n) and re-evaluates
    the tokenizer per distinct token (measured 20×+ slower at sf0.1).
    greatest(·, 0) clamps the ±1-ulp negatives of the subtraction so
    single-run docs are exactly 0.0 in both engines."""
    toks = tokens(text_col)
    n = F.size(toks)
    st = F.array_sort(toks)
    nd = F.size(F.array_distinct(toks))
    # fold state: (prev token, current run length, Σ c·log2 c so far)
    c_log2_c = (
        lambda c: c.cast("double") * F.log2(c.cast("double"))  # noqa: E731
    )
    acc = F.aggregate(
        st,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("tot"),
        ),
        lambda a, t: F.struct(
            t.alias("prev"),
            F.when(t == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias(
                "run"
            ),
            (
                a["tot"]
                + F.when(
                    (a["run"] > 0) & (t != a["prev"]), c_log2_c(a["run"])
                ).otherwise(F.lit(0.0))
            ).alias("tot"),
        ),
        lambda a: a["tot"]
        + F.when(a["run"] > 0, c_log2_c(a["run"])).otherwise(F.lit(0.0)),
    )
    ent = F.when(
        n > 0,
        F.greatest(F.log2(n.cast("double")) - acc / n.cast("double"), F.lit(0.0)),
    ).otherwise(F.lit(0.0))
    norm = F.when(nd > 1, ent / F.log2(nd.cast("double"))).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        n.cast("int").alias("n_tokens"),
        nd.cast("int").alias("n_distinct_tokens"),
        F.round(ent, round_digits).alias("token_entropy"),
        F.round(norm, round_digits).alias("norm_entropy"),
    )


def readability(
    df: DataFrame, id_col: str, text_col: str, round_digits: int = 4
) -> DataFrame:
    """Flesch-reading-ease-style readability score from three regex
    counts (words, sentence breaks, vowel-group syllable proxy) — the
    cheap fluency screen for filtering OCR junk / minified text out of a
    training corpus. Pure projection, zero shuffle, both regexes are
    RE2-compatible so the DuckDB oracle shares them verbatim.

    flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words),
    with sentences floored at 1; empty docs -> NULL score, band 'empty'."""
    n_words = F.size(tokens(text_col))
    n_sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syllables = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[aeiouy]+"), 0)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sentences.cast("double"))
        - F.lit(84.6) * (n_syllables / n_words.cast("double"))
    )
    flesch = F.when(n_words > 0, F.round(flesch, round_digits))
    band = (
        F.when(n_words == 0, F.lit("empty"))
        .when(flesch >= 90, F.lit("very_easy"))
        .when(flesch >= 60, F.lit("standard"))
        .when(flesch >= 30, F.lit("difficult"))
        .otherwise(F.lit("very_difficult"))
    )
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        n_sentences.cast("int").alias("n_sentences"),
        n_syllables.cast("int").alias("n_syllables"),
        flesch.alias("flesch_score"),
        band.alias("readability_band"),
    )


def quality_rank_calibrate(
    df: DataFrame,
    id_col: str,
    order_col: str,
    partition_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-source quality calibration: percent_rank of ``order_col``
    within each source — maps raw, source-incomparable quality scores
    onto a common [0, 1] scale so a single corpus-wide threshold means
    the same thing for every source (the fix for "source A's scorer
    runs hot"). The (order, id) total order pins ranks under ties.

    One window pass partitioned by source (parallel across sources,
    never a global sort); zero joins."""
    w = Window.partitionBy(partition_col).orderBy(
        F.col(order_col).asc(), F.col(id_col).asc()
    )
    return df.select(
        F.col(id_col),
        F.col(partition_col),
        F.col(order_col),
        F.round(F.percent_rank().over(w), round_digits).alias("q_calibrated"),
    )


def vocab_oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    vocab_k: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer-vocabulary coverage per group: build the corpus top-k
    token vocabulary, then report each group's out-of-vocabulary token
    rate — the pre-training check that a fixed vocab (or tokenizer
    merge table) actually covers every source ("source X is 40% OOV"
    means garbage tokenization downstream).

    Returns (group, n_tokens, n_oov, oov_rate), ordered semantics:
    vocabulary = top ``vocab_k`` tokens by corpus frequency with the
    (count desc, token asc) tiebreak, so membership is deterministic.

    Execution shape: one explode feeds BOTH the vocab top-k
    (TakeOrderedAndProject — per-partition heaps, k rows) and the
    per-group token stream; membership is a broadcast left join against
    the k-row vocab; one groupBy(group) ends it. Two scans of the token
    stream, no self-joins."""
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(text_col)).alias("token"),
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_total"))
        .orderBy(F.desc("n_total"), F.asc("token"))
        .limit(vocab_k)
        .select("token", F.lit(1).alias("__in_vocab__"))
    )
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab__").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), round_digits).alias(
                "oov_rate"
            ),
        )
    )


def bpe_top_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
) -> DataFrame:
    """The first BPE merge iteration, as a corpus statistic: frequency
    of every ADJACENT character pair, weighted by word frequency and
    counting overlapping positions ("aaa" holds two "aa" pairs) —
    exactly the quantity byte-pair-encoding tokenizer training
    maximizes each round (Sennrich et al. 2016). Returns the top-k
    candidate merges (pair, n_occurrences, rank) with the
    (count desc, pair asc) tiebreak.

    Execution shape: the corpus reduces to its VOCABULARY first (one
    map-side-combined groupBy(token) — sublinear by Heaps' law, the
    same reduction the token-drift operators ride), then pair explosion
    runs over vocab rows × word length, never corpus tokens; one more
    bounded groupBy(pair) and a TakeOrdered(k) end it. A full BPE
    trainer is this operator in a loop with a merge-apply step between
    rounds; the per-round counting — the expensive part at corpus
    scale — is what this distributes. ``id_col`` is unused (kept for
    the uniform text-operator signature the plan command dispatches
    on)."""
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # length-1 words hold no pair; filter BEFORE sequence() — Spark's
    # sequence(1, 0) infers step -1 and would emit positions [1, 0]
    pairs = vocab.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("n_occurrences").desc(), F.col("pair").asc()
                )
            ),
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT word n-grams that appear in no other document — the
    complement of duplication, and the standard diversity/boilerplate
    signal when composing a training mix ("this source is 95% phrases
    the corpus already has"). Dedup asks "which docs repeat each
    other"; novelty asks "how much does each doc add".

    Returns (id, n_shingles, n_novel, novelty_rate) for every document
    with at least one n-gram (fewer than ``shingle_n`` tokens ⇒ no row,
    the shingle convention shared with the dedup family).

    Execution shape: the exploded shingle stream is built once and
    persisted (registered in the dedup intermediate registry — consume
    inside ``dedup_scope()`` or call ``unpersist_intermediates()``),
    then aggregated to per-shingle document frequency (map-side
    combined) and equi-joined back on the shingle key — same key both
    sides, so AQE plans a co-partitioned join with no extra exchange on
    the large side. One groupBy(id) ends it. No self-pair join and no
    hot-key valve needed: viral shingles only ever contribute a single
    counter row, never a pair blow-up, so the plan is skew-safe at any
    corpus size."""
    from topnotch_spark.operators.dedup import (
        _persist,
        shingle_rows,
        spread_cpu,
    )

    # full-corpus shingle entry: spread the fused scan→shingle map
    # stage onto the cores (guide §2/§6, the pair-mining discipline)
    sh = _persist(shingle_rows(spread_cpu(df, id_col), id_col, text_col, shingle_n))
    dfc = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df__"))
    return (
        sh.join(dfc, "sh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("__df__") == 1, 1)).alias("n_novel"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_shingles"), round_digits
            ).alias("novelty_rate"),
        )
    )


def linear_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, int],
    bias_milli: int = 0,
) -> DataFrame:
    """Apply a pretrained LINEAR text classifier (fastText- /
    logistic-regression-style) to every document: ``logit_milli =
    bias + Σ_token tf(token)·w(token)`` with integer milli-unit
    weights, ``keep = logit_milli > 0``.

    This is the model-based quality-filtering stage of a training-data
    pipeline (CCNet / DCLM-style: train a small classifier offline on
    curated-vs-crawl labels, then score the whole crawl with it). The
    weights arrive as a ``token -> integer milli-weight`` dict — the
    standard reproducible-inference quantization: all arithmetic is
    BIGINT-exact, so any engine reproduces every logit bit-for-bit (no
    float dot products, no sigmoid — thresholding the logit at 0 IS
    thresholding the probability at 0.5).

    Execution shape (100 TB): tokenization is a per-row projection;
    the model join is explode → BROADCAST hash join against the
    |vocab|-row weight table (a real model's 10⁵ rows is still a
    trivially broadcastable dimension) → one map-side-combined
    groupBy(id). Documents with no in-vocabulary token keep
    ``logit = bias`` via the left join-back — a doc must never vanish
    from a filtering report because the model had nothing to say.
    Output: (id, n_tokens, logit_milli, keep).
    """
    spark = df.sparkSession
    w = spark.createDataFrame(
        [(t, int(m)) for t, m in sorted(weights.items())],
        "token string, w_milli long",
    )
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("__t__")
    )
    per_doc = toked.select(
        id_col, F.size("__t__").alias("n_tokens")
    )
    scored = (
        toked.select(id_col, F.explode("__t__").alias("token"))
        .join(F.broadcast(w), "token")
        .groupBy(id_col)
        .agg(F.sum("w_milli").alias("__dot__"))
    )
    return per_doc.join(scored, id_col, "left").select(
        id_col,
        "n_tokens",
        (F.coalesce(F.col("__dot__"), F.lit(0)) + F.lit(bias_milli)).alias(
            "logit_milli"
        ),
        (
            F.coalesce(F.col("__dot__"), F.lit(0)) + F.lit(bias_milli)
            > 0
        ).alias("keep"),
    )


def bpe_merge_sequence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 8,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """The full BPE trainer loop (Sennrich et al. 2016), ``n_merges``
    rounds of count → merge → recount: each round counts every adjacent
    symbol pair across the corpus (weighted by word frequency), takes
    the most frequent pair (count desc, pair asc tiebreak — exact
    integers), applies it as a greedy non-overlapping left-to-right
    merge to every word, and repeats on the merged symbols.
    :func:`bpe_top_merges` is round 1 of this loop as a standalone
    statistic; this operator is the tokenizer-construction audit —
    "what vocabulary would BPE actually build on this corpus".

    Returns one row per realized merge round:
    (merge_rank 1-based, lhs, rhs, merged = lhs||rhs, n_occurrences),
    ordered by merge_rank. A corpus that runs out of adjacent pairs
    before ``n_merges`` rounds yields fewer rows.

    Determinism contract (shared with the DuckDB oracle): symbols are
    whitespace-free (words come from the whitespace tokenizer), so a
    word's symbol sequence round-trips through a DOUBLED-SPACE string
    (``'  h  e  y  '``) and the greedy merge is one codegen'd
    ``replace(s, ' lhs  rhs ', ' lhsrhs ')`` — replace() scans left to
    right and continues after each replacement, which IS the greedy
    non-overlap rule, and the doubled gaps keep adjacent occurrences
    from sharing a boundary space. Pair counting is overlap-inclusive
    ("aaa" holds two "aa" pairs), exactly the quantity BPE maximizes.

    Execution shape (100 TB): the corpus reduces to its VOCABULARY once
    (one map-side-combined groupBy(word) — sublinear by Heaps' law);
    every round after that is vocab-sized: one explode over symbols, one
    groupBy(pair), a 1-row top-1, and one broadcast-crossJoin'd
    projection applying the merge. Round lineage is truncated with the
    connected-components checkpoint helper, so plan depth stays constant
    in ``n_merges``. Nothing in the loop ever touches corpus-sized data
    again, and no driver-side collect happens anywhere."""
    if n_merges < 1:
        raise ValueError("bpe_merge_sequence: n_merges must be >= 1")
    # ``vocab`` optionally supplies a precomputed :func:`bpe_corpus_vocab`
    # (word, s, wc) frame so a train→apply pipeline reduces the corpus once
    bests, _, ckpt = _bpe_rounds(
        vocab if vocab is not None else _bpe_vocab(df, text_col),
        n_merges,
        apply_last=False,
    )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    result = (
        out.filter(F.col("n_occurrences") >= 1)  # drop exhaustion sentinel
        .select(
            "merge_rank",
            F.expr("split(pair, ' ')[0]").alias("lhs"),
            F.expr("split(pair, ' ')[1]").alias("rhs"),
            F.expr("concat(split(pair, ' ')[0], split(pair, ' ')[1])").alias(
                "merged"
            ),
            "n_occurrences",
        )
        .orderBy("merge_rank")
    )
    if ckpt is not None:
        from topnotch_spark.operators import dedup as _d

        _d._PERSISTED.append(result)
        _d._CHECKPOINTED[id(result)] = ckpt
    return result


def word_counts(
    df: DataFrame, text_col: str, max_word_len: int | None = None
) -> DataFrame:
    """Persisted corpus word-frequency reduction ``(word, wc)`` — the
    shared train/apply input of the unigram-LM and WordPiece tokenizer
    lifecycles. Train (:func:`unigram_lm_vocab` / :func:`wordpiece_vocab`)
    and apply (:func:`unigram_segment` / :func:`wordpiece_segment`) each
    reduce the corpus to this exact frame; computing it once and passing
    it to both halves of a train→apply pipeline saves a full corpus
    scan + word shuffle per consumer (the graph ``basket_items`` /
    DSIR ``target_pred`` sharing pattern). ``max_word_len`` must match
    the consumers' trainer contract."""
    from topnotch_spark.operators.dedup import _persist

    w = df.select(F.explode(tokens(text_col)).alias("word"))
    if max_word_len is not None:
        w = w.filter(F.length("word") <= max_word_len)
    return _persist(w.groupBy("word").agg(F.count(F.lit(1)).alias("wc")))


def bpe_corpus_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """Persisted ``(word, s, wc)`` corpus vocabulary in the BPE trainer's
    doubled-space symbol representation — the shared train/apply input of
    the BPE lifecycle (pass to :func:`bpe_merge_sequence` via ``vocab``
    and to :func:`bpe_segment` via ``words`` so a train→apply pipeline
    reduces the corpus exactly once)."""
    from topnotch_spark.operators.dedup import _persist

    return _persist(_bpe_vocab(df, text_col))


_BPE_SYMS = "filter(split(s, '  '), x -> x <> '')"
# when no pair exists anywhere (fully merged corpus), the sentinel pair
# wins the top-1 with count -1; its merge-apply pattern ' \x01  \x01 '
# can only occur where two adjacent '\x01' SYMBOLS exist — impossible in
# a pairless round — so it is an identity rewrite, and result surfaces
# filter it out on n_occurrences >= 1
_BPE_SENTINEL = "\x01 \x01"


def _bpe_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, s, wc): corpus vocabulary with each word as a
    DOUBLED-SPACE character-symbol string (``'  h  e  y  '``) — the
    representation whose greedy BPE merge is one ``replace()``."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .select(
            "word",
            F.concat(
                F.lit(" "),
                F.regexp_replace("word", "(.)", " $1 "),
                F.lit(" "),
            ).alias("s"),
            "wc",
        )
    )


def _bpe_rounds(
    state0: DataFrame, n_merges: int, apply_last: bool
) -> tuple[list[DataFrame], DataFrame, str | None]:
    """``n_merges`` BPE rounds over a (word, s, wc) state frame:
    pair-count → top-1 (sentinel-padded so an exhausted corpus keeps an
    identity state instead of an empty one) → greedy merge-apply.
    Returns (per-round 1-row best frames, final state, checkpoint path).
    ``apply_last=False`` skips the merge-apply of the final round for
    callers that only consume the merge sequence. Round lineage is
    truncated per round (connected-components checkpoint helper); every
    frame in the loop is vocab-sized."""
    from topnotch_spark.operators.cluster import _truncate_round

    state, ckpt = _truncate_round(state0, None)
    spark = state0.sparkSession
    pair_list = (
        f"transform(sequence(1, size({_BPE_SYMS}) - 1), "
        f"i -> concat(element_at({_BPE_SYMS}, i), ' ', "
        f"element_at({_BPE_SYMS}, i + 1)))"
    )
    sentinel = spark.range(1).select(
        F.lit(_BPE_SENTINEL).alias("pair"),
        F.lit(-1).cast("long").alias("n_occurrences"),
    )
    bests: list[DataFrame] = []
    for r in range(1, n_merges + 1):
        counts = (
            state.filter(F.expr(f"size({_BPE_SYMS}) >= 2"))
            .select(F.explode(F.expr(pair_list)).alias("pair"), "wc")
            .groupBy("pair")
            .agg(F.sum("wc").alias("n_occurrences"))
        )
        best = (
            counts.unionByName(sentinel)
            .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
            .limit(1)
            .select(F.lit(r).alias("merge_rank"), "pair", "n_occurrences")
            # 1-row frame consumed by BOTH the output union and the next
            # round's merge-apply: checkpoint once so neither consumer
            # recomputes the round's pair count
            .localCheckpoint(eager=False)
        )
        bests.append(best)
        if r < n_merges or apply_last:
            state, ckpt = _truncate_round(
                state.crossJoin(F.broadcast(best.select("pair"))).select(
                    "word",
                    F.expr(
                        "replace(s, "
                        "concat(' ', split(pair, ' ')[0], '  ', "
                        "split(pair, ' ')[1], ' '), "
                        "concat(' ', split(pair, ' ')[0], "
                        "split(pair, ' ')[1], ' '))"
                    ).alias("s"),
                    "wc",
                ),
                ckpt,
            )
    return bests, state, ckpt


def bpe_fertility_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n_merges: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer fit per corpus slice: train ``n_merges`` BPE merges on
    the WHOLE corpus (:func:`bpe_merge_sequence`'s loop), apply them,
    and report per ``group_col`` how the trained subword inventory
    segments that slice — ``fertility`` = subwords per whitespace token
    (the standard tokenizer-quality metric: a slice the merges fit well
    needs fewer subwords per word) and ``chars_per_subword`` (its
    compression view). A multilingual mix trained mostly on one
    language shows its fertility skew here — the audit a training-data
    pipeline runs before committing to a tokenizer.

    Output: (group_col, n_tokens, n_subwords, fertility,
    chars_per_subword), one row per group, both ratios rounded to
    ``round_digits`` from exact integer sums.

    Execution shape (100 TB): the trainer loop is vocab-sized
    (:func:`bpe_merge_sequence` notes); the apply step never rewrites
    the corpus — each DISTINCT word's post-merge subword COUNT comes
    from the final vocab state, and one corpus-tokens → vocab equi-join
    + map-side-combined groupBy(group) aggregates the per-slice sums.
    ``id_col`` is unused (uniform text-operator signature)."""
    if n_merges < 1:
        raise ValueError("bpe_fertility_by_group: n_merges must be >= 1")
    _, final, ckpt = _bpe_rounds(
        _bpe_vocab(df, text_col), n_merges, apply_last=True
    )
    word_sub = final.select(
        "word",
        F.expr(f"size({_BPE_SYMS})").cast("long").alias("__nsub__"),
        F.length("word").cast("long").alias("__nchr__"),
    )
    tok = df.select(
        F.col(group_col).alias("__grp__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    result = (
        tok.join(word_sub, "word")
        .groupBy("__grp__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
            F.sum("__nchr__").alias("__chars__"),
        )
        .select(
            F.col("__grp__").alias(group_col),
            "n_tokens",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_tokens"), round_digits
            ).alias("fertility"),
            F.round(
                F.col("__chars__") / F.col("n_subwords"), round_digits
            ).alias("chars_per_subword"),
        )
    )
    if ckpt is not None:
        from topnotch_spark.operators import dedup as _d

        _d._PERSISTED.append(result)
        _d._CHECKPOINTED[id(result)] = ckpt
    return result


def bpe_segment(
    target: DataFrame,
    merges: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
    words: DataFrame | None = None,
) -> DataFrame:
    """APPLY a trained BPE merge sequence to new data — the encode twin
    of :func:`unigram_segment`, completing the BPE half of the
    tokenizer lifecycle (train: :func:`bpe_merge_sequence` → audit:
    :func:`bpe_fertility_by_group` → apply: this). ``merges`` is any
    frame with (merge_rank, lhs, rhs) columns — typically the trainer's
    output read back from a mounted table or the plan registry, so a
    tokenizer trained once encodes every future batch identically.

    Per target document: (id, n_tokens, n_subwords, fertility). Unlike
    the unigram apply, BPE segments EVERY word (unmatched words fall
    back to characters — the open-vocabulary property that motivated
    BPE in the first place, Sennrich et al. 2016 §3), so no token is
    ever excluded; documents with no tokens survive with 0/0 and NULL
    fertility.

    Determinism contract: the trainer's doubled-space representation
    and greedy ``replace()`` merge are replayed verbatim, folded over
    the merge list in merge_rank order — applying a trained sequence to
    its own training corpus reproduces the trainer's final state
    bit-for-bit (property-tested), and sentinel/identity rounds the
    trainer filtered out are simply absent from the list.

    Execution shape (100 TB): the merge list aggregates to ONE
    rank-sorted array row (model-sized, broadcast — never collected to
    the driver) and the fold is a single codegen'd ``aggregate()``
    projection over the TARGET's distinct words (Heaps-sublinear);
    one corpus-tokens → word equi-join + map-side-combined groupBy(doc)
    rolls the counts up. No per-merge join, no corpus rewrite, no
    Python in the loop."""
    from topnotch_spark.operators.dedup import _persist

    mrow = F.broadcast(
        merges.select(
            F.struct(
                F.col("merge_rank").cast("long").alias("merge_rank"),
                F.col("lhs").cast("string").alias("lhs"),
                F.col("rhs").cast("string").alias("rhs"),
            ).alias("__m__")
        ).agg(F.array_sort(F.collect_list("__m__")).alias("__merges__"))
    )
    # ``words`` optionally supplies a precomputed :func:`bpe_corpus_vocab`
    # frame — its (word, s) projection is exactly this distinct set, so a
    # train→apply pipeline skips a second corpus scan + word shuffle
    if words is not None:
        words = words.select("word", "s")
    else:
        words = _persist(
            target.select(F.explode(tokens(text_col)).alias("word"))
            .distinct()
            .select(
                "word",
                F.concat(
                    F.lit(" "),
                    F.regexp_replace("word", "(.)", " $1 "),
                    F.lit(" "),
                ).alias("s"),
            )
        )
    segmented = words.crossJoin(mrow).select(
        "word",
        F.expr(
            "aggregate(__merges__, s, (acc, m) -> "
            "replace(acc, concat(' ', m.lhs, '  ', m.rhs, ' '), "
            "concat(' ', m.lhs, m.rhs, ' ')))"
        ).alias("s"),
    )
    word_sub = segmented.select(
        "word", F.expr(f"size({_BPE_SYMS})").cast("long").alias("__nsub__")
    )
    tok = target.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    per_doc = (
        tok.join(word_sub, "word")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
        )
    )
    return (
        target.select(F.col(id_col).alias("__id__"))
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_subwords", F.lit(0).cast("long")).alias(
                "n_subwords"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_subwords") / F.col("n_tokens"),
                        round_digits),
            ).alias("fertility"),
        )
    )


def collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k PMI collocations: adjacent word pairs that co-occur far
    more than their unigram frequencies predict — the corpus-analysis
    staple for multiword-expression discovery, tokenizer-vocab
    candidates, and boilerplate fingerprints ("click here", "all
    rights reserved" float straight to the top of a crawl).

    ``pmi = ln(n_pair · N_tokens² / (N_bigrams · n_left · n_right))``
    — pointwise mutual information with bigram probability
    n_pair/N_bigrams and unigram probabilities n/N_tokens. ``min_count``
    filters the classic PMI pathology (hapax pairs of hapax words score
    highest); output is the top ``k`` by (pmi desc, pair asc) — the
    rounded pmi plus all four raw integers, so ties on the rounded
    value stay deterministic via the pair tiebreak.

    Determinism: counts are exact integers; the single ln runs on an
    exact integer ratio (identical IEEE inputs on any engine), rounded
    to ``round_digits``.

    Execution shape (100 TB): the corpus tokenizes once into a
    persisted (id, tokens) frame feeding both the unigram and bigram
    passes (one map-side-combined groupBy each); the model join is
    bigram-table-sized; TakeOrdered(k) before the rank window."""
    from topnotch_spark.operators.dedup import _persist

    toked = _persist(
        df.select(tokens(text_col).alias("__t__")).filter(
            F.size("__t__") >= 1
        )
    )
    uni = toked.select(F.explode("__t__").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("n_w")
    )
    bi = (
        toked.filter(F.size("__t__") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t__) - 1), "
                    "i -> struct(element_at(__t__, i) AS l, "
                    "element_at(__t__, i + 1) AS r))"
                )
            ).alias("p")
        )
        .select(F.col("p.l").alias("left_token"), F.col("p.r").alias("right_token"))
        .groupBy("left_token", "right_token")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    totals = F.broadcast(
        toked.select(
            F.sum(F.size("__t__")).alias("__nt__"),
            F.sum(F.greatest(F.size("__t__") - 1, F.lit(0))).alias("__nb__"),
        )
    )
    scored = (
        bi.join(
            uni.select(
                F.col("w").alias("left_token"), F.col("n_w").alias("n_left")
            ),
            "left_token",
        )
        .join(
            uni.select(
                F.col("w").alias("right_token"), F.col("n_w").alias("n_right")
            ),
            "right_token",
        )
        .crossJoin(totals)
        .select(
            "left_token",
            "right_token",
            "n_pair",
            "n_left",
            "n_right",
            F.round(
                F.log(
                    (
                        F.col("n_pair").cast("double")
                        * F.col("__nt__")
                        * F.col("__nt__")
                    )
                    / (
                        F.col("__nb__").cast("double")
                        * F.col("n_left")
                        * F.col("n_right")
                    )
                ),
                round_digits,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(
            F.col("pmi").desc(),
            F.col("left_token").asc(),
            F.col("right_token").asc(),
        )
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("pmi").desc(),
                    F.col("left_token").asc(),
                    F.col("right_token").asc(),
                )
            ),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer trainer (Kudo 2018 / SentencePiece counterpart of the
# BPE loop above)
# ---------------------------------------------------------------------------

# fixed-point log: milli-nats of an integer count. round() on the double
# ln keeps both engines identical except at half-milli boundaries (the
# repo-wide micro/milli-rounding convention — see cluster_silhouette).
_UNI_ILOG = "CAST(round(ln(CAST({x} AS DOUBLE)) * 1000) AS BIGINT)"
# unreachable-cost sentinel for pieces missing from the vocab map; never
# accumulated (single-char coverage keeps every DP position reachable),
# only compared away by array_max
_UNI_MINF = -(10**15)


def _unigram_lp(vocab: DataFrame) -> DataFrame:
    """(piece, freq, lp_milli) from a (piece, freq) vocab frame:
    ``lp = ilog(max(freq,1)) - ilog(T)`` with ``T = Σ max(freq,1)`` —
    the max(,1) smooths always-kept single chars whose usage dropped to
    0 so ln stays finite (Kudo keeps them for coverage). The 1-row
    total rides in via a broadcast cross join, never a collect."""
    fr = vocab.select(
        "piece",
        "freq",
        F.expr("greatest(freq, CAST(1 AS BIGINT))").alias("__f__"),
    )
    tot = fr.agg(F.sum("__f__").alias("__T__"))
    return fr.crossJoin(F.broadcast(tot)).select(
        "piece",
        "freq",
        (
            F.expr(_UNI_ILOG.format(x="__f__"))
            - F.expr(_UNI_ILOG.format(x="__T__"))
        ).alias("lp_milli"),
    )


def _unigram_viterbi_bounds(
    words: DataFrame, lp: DataFrame, max_piece_len: int
) -> DataFrame:
    """(word, wc, __bd__): each word's Viterbi segmentation boundaries
    under the current vocab log-probs, entirely in codegen'd
    higher-order functions (zero Python rows).

    DP over word positions: ``dp[i] = max over j in [i-P, i) of
    dp[j].c + lp(word[j..i])``; candidates are structs (cost, -j) so
    ``array_max`` implements (max cost, then MIN predecessor j) — ties
    therefore resolve to the segmentation whose reversed interior
    boundary list is lexicographically smallest, the contract the
    DuckDB oracle reproduces by enumerating all segmentations and
    sorting (cost DESC, list_reverse(interior bounds) ASC). The vocab
    rides in as ONE broadcast map column (bounded by |vocab| entries —
    the bounded-collect_list pattern of cluster_silhouette)."""
    P = int(max_piece_len)
    dp_expr = f"""
      aggregate(
        sequence(1, length(word)),
        array(named_struct('c', CAST(0 AS BIGINT), 'nj', 0)),
        (acc, i) -> concat(acc, array(
          array_max(transform(
            sequence(greatest(i - {P}, 0), i - 1),
            j -> named_struct(
              'c', element_at(acc, j + 1).c + coalesce(
                     try_element_at(__vm__, substring(word, j + 1, i - j)),
                     CAST({_UNI_MINF} AS BIGINT)),
              'nj', -j))))))
    """
    walk_expr = """
      aggregate(
        sequence(1, length(word)),
        array(CAST(length(word) AS INT)),
        (acc, x) -> IF(element_at(acc, 1) > 0,
                       concat(array(-element_at(__dp__,
                                element_at(acc, 1) + 1).nj), acc),
                       acc))
    """
    vmap = lp.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.col("lp_milli")))
        ).alias("__vm__")
    )
    return (
        words.crossJoin(F.broadcast(vmap))
        .select("word", "wc", F.expr(dp_expr).alias("__dp__"))
        .select(
            "word",
            "wc",
            F.expr(walk_expr).alias("__bd__"),
            # final DP cost: a word the vocab cannot fully segment has
            # at least one _UNI_MINF term — consumers that must match
            # the oracle's complete-path-only enumeration (e.g.
            # unigram_segment over an arbitrary vocab) filter on it
            F.expr(
                "element_at(__dp__, length(word) + 1).c"
            ).alias("__cost__"),
        )
    )


_UNI_PIECES_EXPR = """
  transform(sequence(1, size(__bd__) - 1),
    k -> substring(word, element_at(__bd__, k) + 1,
                   element_at(__bd__, k + 1) - element_at(__bd__, k)))
"""


def _unigram_viterbi_pieces(
    words: DataFrame, lp: DataFrame, max_piece_len: int
) -> DataFrame:
    """(piece, wc) exploded from each word's Viterbi segmentation —
    the E-step's usage-count input."""
    return _unigram_viterbi_bounds(words, lp, max_piece_len).select(
        F.explode(F.expr(_UNI_PIECES_EXPR)).alias("piece"), "wc"
    )


def unigram_lm_vocab(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_size: int = 64,
    vocab_size: int = 48,
    n_rounds: int = 2,
    words: DataFrame | None = None,
) -> DataFrame:
    """Unigram-LM tokenizer trainer (Kudo 2018, the SentencePiece
    algorithm; the subword-regularization counterpart of
    :func:`bpe_merge_sequence`): seed a piece vocabulary from frequent
    substrings, then run ``n_rounds`` EM rounds — E: Viterbi-segment
    the corpus vocabulary under the current piece log-probs; M:
    re-estimate probs from realized piece usage and prune to the
    ``vocab_size`` best pieces (single characters are never pruned, so
    every word stays segmentable — Kudo's coverage constraint).

    Deterministic contract (shared with the DuckDB oracle and the
    pure-Python property replay): words = whitespace tokens with
    ``length ≤ max_word_len``; seed = the ``seed_size`` most frequent
    multi-char substrings of length ≤ ``max_piece_len`` (count desc,
    piece asc — counts weighted by word frequency, one per occurrence
    position) plus every corpus character; piece log-probs are
    FIXED-POINT MILLI-NATS ``ilog(freq) - ilog(T)`` with
    ``ilog(x) = round(1000·ln x)`` as BIGINT; Viterbi maximizes the
    lp sum with ties broken toward the minimal predecessor position
    (equivalently: lexicographically smallest reversed interior
    boundary list); pruning keeps the top ``vocab_size`` multi-char
    pieces by (usage desc, piece asc) plus all single chars.

    Returns the final vocabulary: (rank, piece, freq, lp_milli)
    ordered by rank = row_number over (freq desc, piece asc) — freq is
    the last E-step's realized usage (0 possible only for kept-for-
    coverage chars).

    Execution shape (100 TB): the corpus reduces to its VOCABULARY once
    (one map-side-combined groupBy(word), sublinear by Heaps' law,
    materialized via the dedup-family persist so every EM round reuses
    it); each round is then vocab-sized — one broadcast map of ≤
    |vocab| entries, one linear-time DP per distinct word inside
    whole-stage codegen, one groupBy(piece). Round lineage is truncated
    with the connected-components checkpoint helper, so plan depth
    stays constant in ``n_rounds``. No driver-side collect anywhere.
    The final global rank window runs on a ≤ (vocab_size + |alphabet|)-
    row frame."""
    words, lp, ckpt = _unigram_train(
        df, text_col, max_word_len, max_piece_len, seed_size, vocab_size,
        n_rounds, words=words,
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("piece").asc())
    result = lp.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "piece",
        "freq",
        "lp_milli",
    ).orderBy("rank")
    if ckpt is not None:
        from topnotch_spark.operators import dedup as _d

        _d._PERSISTED.append(result)
        _d._CHECKPOINTED[id(result)] = ckpt
    return result


def _unigram_train(
    df: DataFrame,
    text_col: str,
    max_word_len: int,
    max_piece_len: int,
    seed_size: int,
    vocab_size: int,
    n_rounds: int,
    words: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, str | None]:
    """The unigram-LM EM loop shared by :func:`unigram_lm_vocab` and
    :func:`unigram_fertility_by_group`: returns (words, final lp frame,
    checkpoint path). ``words`` is persisted in the dedup registry;
    ``lp`` is checkpoint-truncated per round."""
    from topnotch_spark.operators.cluster import _truncate_round
    from topnotch_spark.operators.dedup import _persist

    if n_rounds < 1:
        raise ValueError("unigram_lm_vocab: n_rounds must be >= 1")
    if max_piece_len < 2:
        raise ValueError("unigram_lm_vocab: max_piece_len must be >= 2")
    P = int(max_piece_len)

    # ``words`` optionally supplies a precomputed :func:`word_counts`
    # (word, wc) frame (already persisted, same max_word_len contract)
    if words is None:
        words = _persist(
            df.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.length("word") <= max_word_len)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
    # every substring occurrence of length 1..P, weighted by word freq
    subs = words.select(
        F.explode(
            F.expr(
                f"""
                flatten(transform(
                  sequence(1, least({P}, length(word))),
                  l -> transform(sequence(1, length(word) - l + 1),
                                 i -> substring(word, i, l))))
                """
            )
        ).alias("piece"),
        "wc",
    ).groupBy("piece").agg(F.sum("wc").alias("freq"))
    seed_multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    chars = subs.filter(F.length("piece") == 1)
    lp, ckpt = _truncate_round(
        _unigram_lp(seed_multi.unionByName(chars)), None
    )
    for _ in range(n_rounds):
        usage = (
            _unigram_viterbi_pieces(words, lp, P)
            .groupBy("piece")
            .agg(F.sum("wc").alias("freq"))
        )
        top = (
            usage.filter(F.length("piece") >= 2)
            .orderBy(F.col("freq").desc(), F.col("piece").asc())
            .limit(vocab_size)
        )
        # single chars are recovered from the CURRENT vocab (they are
        # always rows in it) — no separate lineage chain to checkpoint
        kept_chars = (
            lp.filter(F.length("piece") == 1)
            .select("piece")
            .join(usage, "piece", "left")
            .select(
                "piece",
                F.coalesce(F.col("freq"), F.lit(0).cast("long")).alias(
                    "freq"
                ),
            )
        )
        lp, ckpt = _truncate_round(
            _unigram_lp(top.unionByName(kept_chars)), ckpt
        )
    return words, lp, ckpt


def unigram_fertility_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    max_word_len: int = 12,
    max_piece_len: int = 4,
    seed_size: int = 64,
    vocab_size: int = 48,
    n_rounds: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer fit per corpus slice under the TRAINED unigram-LM
    vocab — the Kudo-trainer twin of :func:`bpe_fertility_by_group`:
    train on the whole corpus (:func:`unigram_lm_vocab`'s EM loop),
    Viterbi-segment each distinct word once more under the final piece
    probs, and report per ``group_col`` fertility = subwords per
    whitespace token and chars_per_subword. Comparing this table with
    the BPE one is the tokenizer-selection audit (which algorithm's
    inventory compresses each slice better).

    Output: (group_col, n_tokens, n_subwords, fertility,
    chars_per_subword) — ratios rounded from exact integer sums.
    Tokens longer than ``max_word_len`` are outside the trained corpus
    and excluded from the sums (deterministic; mirrored by the oracle).

    Execution shape (100 TB): trainer loop is vocab-sized (see
    unigram_lm_vocab); the apply step segments only DISTINCT words and
    joins the per-word subword count back to one corpus-tokens
    projection — the corpus is never rewritten (the
    bpe_fertility_by_group shape). ``id_col`` unused (uniform text-op
    signature)."""
    words, lp, ckpt = _unigram_train(
        df, text_col, max_word_len, max_piece_len, seed_size, vocab_size,
        n_rounds,
    )
    word_sub = _unigram_viterbi_bounds(words, lp, max_piece_len).select(
        "word",
        (F.size("__bd__") - 1).cast("long").alias("__nsub__"),
        F.length("word").cast("long").alias("__nchr__"),
    )
    tok = df.select(
        F.col(group_col).alias("__grp__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    result = (
        tok.join(word_sub, "word")
        .groupBy("__grp__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
            F.sum("__nchr__").alias("__chars__"),
        )
        .select(
            F.col("__grp__").alias(group_col),
            "n_tokens",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_tokens"), round_digits
            ).alias("fertility"),
            F.round(
                F.col("__chars__") / F.col("n_subwords"), round_digits
            ).alias("chars_per_subword"),
        )
    )
    if ckpt is not None:
        from topnotch_spark.operators import dedup as _d

        _d._PERSISTED.append(result)
        _d._CHECKPOINTED[id(result)] = ckpt
    return result


def langid_accuracy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    true_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Accuracy audit of the marker-heuristic language classifier
    (:func:`language_id`) against a trusted label column — the honesty
    deliverable for a lexicon-based langid: per language,
    (n_true, n_pred, n_correct, precision, recall, f1), so users see
    exactly where the tiny marker lexicons (LANG_MARKERS) break down
    (e.g. marker-free short docs falling to the 'en' tiebreak) before
    trusting the predictions in a filter.

    Rows: every language appearing as a true label OR a prediction.
    precision = n_correct / n_pred (NULL when never predicted),
    recall = n_correct / n_true (NULL when never true), f1 harmonic
    (NULL when precision + recall is 0 or either is NULL); all rounded
    to ``round_digits``.

    Single corpus scan: the true label rides through language_id's
    passthrough (no self-join), the (true, predicted) confusion matrix
    is one map-side-combined groupBy on a ≤|langs|² frame, and the
    per-role stats explode that tiny frame — never the corpus."""
    base = language_id(df, id_col, text_col, extra_cols=[true_col])
    conf = (
        base.select(
            F.col(true_col).alias("__t__"), F.col("predicted_lang").alias("__p__")
        )
        .groupBy("__t__", "__p__")
        .agg(F.count(F.lit(1)).alias("__n__"))
    )
    # one pass over the tiny confusion frame: each cell contributes a
    # true-role row (n_true, n_correct) and a pred-role row (n_pred)
    roles = conf.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__t__").alias("lang"),
                    F.col("__n__").alias("n_true"),
                    F.lit(0).cast("long").alias("n_pred"),
                    F.when(F.col("__t__") == F.col("__p__"), F.col("__n__"))
                    .otherwise(F.lit(0).cast("long"))
                    .alias("n_correct"),
                ),
                F.struct(
                    F.col("__p__").alias("lang"),
                    F.lit(0).cast("long").alias("n_true"),
                    F.col("__n__").alias("n_pred"),
                    F.lit(0).cast("long").alias("n_correct"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    agg = roles.groupBy("lang").agg(
        F.sum("n_true").alias("n_true"),
        F.sum("n_pred").alias("n_pred"),
        F.sum("n_correct").alias("n_correct"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("n_correct") / F.col("n_pred")
    )
    rec = F.when(
        F.col("n_true") > 0, F.col("n_correct") / F.col("n_true")
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        F.lit(2.0) * prec * rec / (prec + rec),
    )
    return agg.select(
        "lang",
        "n_true",
        "n_pred",
        "n_correct",
        F.round(prec, round_digits).alias("precision"),
        F.round(rec, round_digits).alias("recall"),
        F.round(f1, round_digits).alias("f1"),
    ).orderBy("lang")


def cross_perplexity(
    target: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 1.0,
    round_digits: int = 4,
) -> DataFrame:
    """CCNet-style cross-corpus language-model filter: train an add-k
    unigram LM on the REFERENCE corpus (the curated/clean slice) and
    score every TARGET document against it — the key difference from
    :func:`unigram_logprob` (self-corpus fluency) is that the model and
    the scored text are DIFFERENT corpora, so documents that diverge
    from the reference distribution (other-domain boilerplate,
    wrong-language text, spam vocabularies) surface with high
    ``avg_neg_logprob`` even when internally fluent.

    P(w) = (c_ref(w) + k) / (T_ref + k·(V_ref + 1)) — add-k smoothing
    with one shared unseen type, so out-of-vocabulary tokens score
    −ln(k / (T + k·(V+1))) instead of blowing up. Emits per target doc:
    (id, n_tokens, n_oov, oov_rate, avg_neg_logprob); empty docs
    survive with NULL score (the unigram_logprob contract — mean of
    IEEE doubles, round ``round_digits``).

    Execution shape (100 TB): reference reduces to its vocab in ONE
    map-side-combined groupBy (persisted — it feeds the totals and the
    score join); the target tokenizes once into a persisted (id, toks)
    spine; scoring is a LEFT join of exploded target tokens onto the
    broadcastable vocab-lp table (OOV = null → coalesce to the constant
    OOV lp riding in via the 1-row totals broadcast) + one
    groupBy(doc). Two shuffles over exploded tokens, same shape as
    unigram_logprob."""
    from topnotch_spark.operators.dedup import _persist

    if k <= 0:
        raise ValueError("cross_perplexity: k must be > 0")
    vocab = _persist(
        reference.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = vocab.agg(
        F.sum("c").alias("__T__"), F.count(F.lit(1)).alias("__V__")
    )
    denom = F.col("__T__") + F.lit(k) * (F.col("__V__") + 1)
    arr = _persist(
        target.select(
            F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__")
        )
    )
    tok = arr.select("__id__", F.explode("__toks__").alias("token"))
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "__id__",
            F.col("c").isNull().cast("long").alias("__oov__"),
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k)) / denom
                )
            ).alias("__nlp__"),
        )
    )
    per_doc = scored.groupBy("__id__").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__oov__").alias("n_oov"),
        F.round(F.avg("__nlp__"), round_digits).alias("avg_neg_logprob"),
    )
    return (
        arr.select("__id__")
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 6),
            ).alias("oov_rate"),
            "avg_neg_logprob",
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str,
    max_log2_k: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Vocabulary coverage curve: for k = 1, 2, 4, …, 2^max_log2_k, the
    fraction of ALL corpus tokens covered by the top-k vocabulary —
    (k, vocab_available, covered_tokens, total_tokens, coverage). The
    direct answer to "what vocab size covers 99% of my corpus", the
    empirical table behind the Zipf/Heaps fits and the first input to
    BPE/unigram vocab-size selection. ``vocab_available`` is
    min(k, |vocab|) — the curve flattens exactly there.

    Exact integers end to end (counts, cumulative sums, one rounded
    division). Execution shape: ONE map-side-combined token groupBy,
    TakeOrdered(2^max_log2_k), a rank window + cumulative sum over that
    bounded frame, and a ≤(max_log2_k+1)-row join against the powers
    spine. Scan-bound at any scale."""
    if max_log2_k < 0:
        raise ValueError(
            f"vocab_coverage: max_log2_k must be >= 0, got {max_log2_k}"
        )
    from pyspark.sql import Window as W

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(
        F.sum("cnt").alias("__total__"), F.count(F.lit(1)).alias("__V__")
    )
    order = [F.col("cnt").desc(), F.col("token").asc()]
    top = (
        counts.orderBy(*order)
        .limit(2 ** max_log2_k)
        .withColumn("rank", F.row_number().over(W.orderBy(*order)))
        .withColumn(
            "cum",
            F.sum("cnt").over(
                W.orderBy("rank").rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
    )
    spark = df.sparkSession
    powers = spark.createDataFrame(
        [(2 ** i,) for i in range(max_log2_k + 1)], "k long"
    )
    picked = powers.crossJoin(F.broadcast(total)).join(
        F.broadcast(top),
        F.col("rank") == F.least(F.col("k"), F.col("__V__")),
    )
    return picked.select(
        "k",
        F.least(F.col("k"), F.col("__V__")).alias("vocab_available"),
        F.col("cum").alias("covered_tokens"),
        F.col("__total__").alias("total_tokens"),
        F.round(
            F.col("cum").cast("double") / F.col("__total__").cast("double"),
            round_digits,
        ).alias("coverage"),
    )


C4_TERMINAL_PUNCT = (".", "!", "?", '"')


def c4_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
    Transfer Learning…", §2.2) — the published heuristic set behind the
    C4 corpus, as per-document diagnostics plus the conjunctive keep:
    lines are retained only when they end in terminal punctuation
    (. ! ? \"), carry at least ``min_line_words`` words, and do not
    mention "javascript"; pages are dropped when they contain "lorem
    ipsum" (any case) or a curly brace (code), or keep fewer than
    ``min_sentences`` sentences. The third published filter bundle next
    to [gopher_rules] and the quality_filter chain — each rule emitted
    as its own column so pipelines can ablate rules without recomputing
    (the gopher_rules contract). The paper's remaining rule —
    three-sentence-span dedup — is the separate
    dedup.duplicate_spans operator.

    Sentences are counted as terminal-punctuation marks in the KEPT
    lines. Execution shape: one pure-projection pass — line split, one
    higher-order filter, scalar flags — zero shuffles, zero Python."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    trimmed = lambda l: F.trim(l)  # noqa: E731
    words = lambda l: F.size(  # noqa: E731
        F.filter(
            F.split(F.trim(l), r"\s+"), lambda w: w != F.lit("")
        )
    )
    last = lambda l: F.substring(F.trim(l), -1, 1)  # noqa: E731
    line_ok = lambda l: (  # noqa: E731
        last(l).isin(*C4_TERMINAL_PUNCT)
        & (words(l) >= min_line_words)
        & ~F.lower(trimmed(l)).contains("javascript")
    )
    kept = F.filter(lines, line_ok)
    kept_text = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(kept_text, F.lit(r"[.!?]"), 0)
    ).cast("long")
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        (
            (n_sentences >= min_sentences)
            & ~has_lorem
            & ~has_brace
        ).alias("keep"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str,
    vocab_k: int = 200,
    scale: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: least-squares
    line through (ln rank, ln frequency) over the top ``vocab_k`` tokens
    — 1 row (n_vocab, slope, alpha, intercept, r2). Natural language
    sits near alpha ≈ 1 (slope −1); a corpus that deviates hard is
    machine-generated, templated, or spam-dominated — the cheap
    distribution-shape screen next to token_entropy (which summarizes
    concentration but not the rank-frequency SHAPE).

    Determinism: ln(rank) and ln(count) are frozen to fixed-point
    milli-nats, so every regression sum (Σx, Σy, Σxy, Σxx, Σyy) is an
    exact BIGINT and the closed-form slope/intercept/r² are single
    double divisions of identical integers on any engine — no float
    summation order anywhere. The milli quantization is far below the
    fit's own noise.

    Execution shape: ONE map-side-combined token groupBy (the corpus
    reduction), TakeOrdered(vocab_k), a rank window over the bounded
    top-k frame, and a 1-row aggregate. Scan-bound at any scale."""
    if vocab_k < 2:
        raise ValueError(f"zipf_fit: vocab_k must be >= 2, got {vocab_k}")
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = [F.col("cnt").desc(), F.col("token").asc()]
    from pyspark.sql import Window as W

    ranked = (
        counts.orderBy(*order)
        .limit(vocab_k)
        .withColumn("rank", F.row_number().over(W.orderBy(*order)))
    )
    sc = float(scale)
    xm = F.round(F.log(F.col("rank").cast("double")) * F.lit(sc), 0).cast(
        "long"
    )
    ym = F.round(F.log(F.col("cnt").cast("double")) * F.lit(sc), 0).cast(
        "long"
    )
    sums = ranked.select(xm.alias("x"), ym.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / F.lit(sc)
    )
    r2 = (num.cast("double") * num.cast("double")) / (
        den.cast("double") * deny.cast("double")
    )
    return sums.select(
        F.col("n").alias("n_vocab"),
        F.when(den > 0, F.round(slope, round_digits)).alias("slope"),
        F.when(den > 0, F.round(-slope, round_digits)).alias("alpha"),
        F.when(den > 0, F.round(intercept, round_digits)).alias(
            "intercept"
        ),
        F.when(
            (den > 0) & (deny > 0), F.round(r2, round_digits)
        ).alias("r2"),
    )


def heaps_fit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_checkpoints: int = 10,
    scale: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(N) ≈ K·N^β over corpus
    prefixes — 1 row (n_points, beta, k_coef, r2). Natural corpora grow
    vocabulary at β ≈ 0.4-0.6; β near 1 means near-disjoint documents
    (ids, hashes, boilerplate noise), β near 0 a closed templated
    vocabulary — the growth-shape companion to [zipf_fit]'s static
    rank-frequency shape, and the planning curve behind tokenizer
    vocab sizing (the bpe/unigram trainers' corpus→vocab reduction
    assumes sublinear growth).

    Prefixes are deterministic by construction: ``n_checkpoints``
    equal-width cells over the [min, max] id range (the histogram-grid
    convention — no global row ranking); checkpoint j's corpus is every
    doc whose id falls in cells 0..j. N_j (total tokens) and V_j
    (distinct tokens, via each token's FIRST-occurrence cell) are exact
    integers from one cumulative window over the n_checkpoints-row cell
    rollup; the (ln N, ln V) regression runs in milli-nat fixed point —
    exact BIGINT sums, single double divisions (the zipf_fit
    machinery).

    Execution shape: one per-doc token-count projection + one
    groupBy(token) min-id (the corpus reductions), two n_checkpoints-row
    rollups, a bounded cumulative window, a 1-row aggregate."""
    if n_checkpoints < 2:
        raise ValueError(
            f"heaps_fit: n_checkpoints must be >= 2, got {n_checkpoints}"
        )
    from pyspark.sql import Window as W

    from topnotch_spark.operators.dedup import _persist

    toked = _persist(
        df.select(
            F.col(id_col).cast("double").alias("__id__"),
            tokens(text_col).alias("__toks__"),
        )
    )
    mn, mx = toked.agg(F.min("__id__"), F.max("__id__")).collect()[0]
    if mn is None or mx == mn:
        raise ValueError(
            "heaps_fit: need at least two distinct ids to build prefixes"
        )
    mn, mx = float(mn), float(mx)
    width = (mx - mn) / n_checkpoints

    def cell(col):
        return F.least(
            F.greatest(
                F.floor((col - F.lit(mn)) / F.lit(width)).cast("int"),
                F.lit(0),
            ),
            F.lit(n_checkpoints - 1),
        )

    per_doc = toked.select(
        cell(F.col("__id__")).alias("cell"),
        F.size("__toks__").cast("long").alias("n_tok"),
    ).groupBy("cell").agg(F.sum("n_tok").alias("tok_in_cell"))
    first_seen = (
        toked.select("__id__", F.explode("__toks__").alias("token"))
        .groupBy("token")
        .agg(F.min("__id__").alias("first_id"))
        .select(cell(F.col("first_id")).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("new_in_cell"))
    )
    spine = toked.sparkSession.range(n_checkpoints).select(
        F.col("id").cast("int").alias("cell")
    )
    cum = W.orderBy("cell").rowsBetween(W.unboundedPreceding, W.currentRow)
    pts = (
        spine.join(F.broadcast(per_doc), "cell", "left")
        .join(F.broadcast(first_seen), "cell", "left")
        .select(
            "cell",
            F.sum(F.coalesce("tok_in_cell", F.lit(0))).over(cum).alias("N"),
            F.sum(F.coalesce("new_in_cell", F.lit(0))).over(cum).alias("V"),
        )
        .filter((F.col("N") > 0) & (F.col("V") > 0))
    )
    sc = float(scale)
    xm = F.round(F.log(F.col("N").cast("double")) * F.lit(sc), 0).cast("long")
    ym = F.round(F.log(F.col("V").cast("double")) * F.lit(sc), 0).cast("long")
    sums = pts.select(xm.alias("x"), ym.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / F.col("n").cast("double")
        / F.lit(sc)
    )
    r2 = (num.cast("double") * num.cast("double")) / (
        den.cast("double") * deny.cast("double")
    )
    return sums.select(
        F.col("n").alias("n_points"),
        F.when(den > 0, F.round(slope, round_digits)).alias("beta"),
        F.when(den > 0, F.round(F.exp(intercept), round_digits)).alias(
            "k_coef"
        ),
        F.when((den > 0) & (deny > 0), F.round(r2, round_digits)).alias(
            "r2"
        ),
    )


def nb_token_weights(
    df: DataFrame,
    text_col: str,
    label_col: str,
    scale: int = 1000,
) -> DataFrame:
    """TRAIN a multinomial Naive Bayes text classifier from a labeled
    corpus — the counts-based trainer that pairs with the repo's linear
    classifier APPLIER (classifier_score's integer milli-weights): NB
    training is pure token counting, so it is the one classical text
    classifier whose training parallelizes embarrassingly at 100 TB
    (McCallum & Nigam 1998) and whose weights are engine-replayable.

    Per token: ``weight_milli = round(scale · (ln((c_pos+1)/(N_pos+V))
    − ln((c_neg+1)/(N_neg+V))))`` — the add-1-smoothed log-likelihood
    ratio in fixed-point milli-nats. A document's NB decision is then
    ``bias_milli + Σ weight_milli(token) > 0`` (multinomial NB with term
    frequency), i.e. exactly the linear-scorer form. Rows with a NULL
    label are excluded (unlabeled, not negative).

    Returns (token, c_pos, c_neg, weight_milli). Execution shape: ONE
    explode + map-side-combined groupBy(token) builds both class counts
    together; the totals ride back in via a 1-row broadcast crossJoin.
    Output is vocabulary-sized."""
    lab = df.filter(F.col(label_col).isNotNull()).select(
        F.col(label_col).cast("boolean").alias("__y__"),
        tokens(text_col).alias("__toks__"),
    )
    tok = lab.select("__y__", F.explode("__toks__").alias("token"))
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("__y__"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__y__"), 0).otherwise(1)).alias("c_neg"),
    )
    tot = counts.agg(
        F.sum("c_pos").alias("__N1__"),
        F.sum("c_neg").alias("__N0__"),
        F.count(F.lit(1)).alias("__V__"),
    )
    w = (
        F.log((F.col("c_pos") + 1) / (F.col("__N1__") + F.col("__V__")))
        - F.log((F.col("c_neg") + 1) / (F.col("__N0__") + F.col("__V__")))
    ) * F.lit(float(scale))
    return counts.crossJoin(F.broadcast(tot)).select(
        "token",
        "c_pos",
        "c_neg",
        F.round(w, 0).cast("long").alias("weight_milli"),
    )


def nb_train_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Train the Naive Bayes model on the labeled frame and score every
    row with it — the classifier-bootstrap audit: per document
    (id, label_positive, n_tokens, score_milli, predicted_positive,
    correct). ``score_milli = bias_milli + Σ weight_milli`` over the
    doc's tokens (term frequency); ``bias_milli`` is the milli-nat class
    prior log-odds from document counts; prediction is score > 0.
    Aggregating ``correct`` gives training-set accuracy — the honesty
    floor before deploying the weights on unlabeled data (the
    langid_accuracy policy: measure the boundary, don't assume it).

    Execution shape: the tokenized labeled frame is persisted once and
    feeds training, the doc-count priors, scoring, and the output spine;
    training is one groupBy(token); scoring is one equi-join of exploded
    tokens onto the vocabulary-sized weight table (broadcast when it
    fits) + one groupBy(doc). Integer milli arithmetic end-to-end after
    the weight table — partitioning-independent.

    Raises if either class has no documents (priors undefined)."""
    from topnotch_spark.operators.dedup import _persist

    lab = _persist(
        df.filter(F.col(label_col).isNotNull()).select(
            F.col(id_col).alias("__id__"),
            F.col(label_col).cast("boolean").alias("__y__"),
            tokens(text_col).alias("__toks__"),
        )
    )
    n_pos, n_neg = (
        lab.agg(
            F.sum(F.when(F.col("__y__"), 1).otherwise(0)),
            F.sum(F.when(F.col("__y__"), 0).otherwise(1)),
        ).collect()[0]
    )
    if not n_pos or not n_neg:
        raise ValueError(
            "nb_train_score: both classes must be non-empty "
            f"(n_pos={n_pos}, n_neg={n_neg})"
        )
    tok = lab.select("__y__", F.explode("__toks__").alias("token"))
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("__y__"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__y__"), 0).otherwise(1)).alias("c_neg"),
    )
    tot = counts.agg(
        F.sum("c_pos").alias("__N1__"),
        F.sum("c_neg").alias("__N0__"),
        F.count(F.lit(1)).alias("__V__"),
    )
    wexpr = (
        F.log((F.col("c_pos") + 1) / (F.col("__N1__") + F.col("__V__")))
        - F.log((F.col("c_neg") + 1) / (F.col("__N0__") + F.col("__V__")))
    ) * F.lit(float(scale))
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "token", F.round(wexpr, 0).cast("long").alias("__wm__")
    )
    import math as _math

    # half-away-from-zero, matching SQL round() (python round() is
    # banker's — a knife-edge mismatch against the oracle)
    raw = (_math.log(float(n_pos)) - _math.log(float(n_neg))) * scale
    bias_milli = int(_math.copysign(_math.floor(abs(raw) + 0.5), raw))
    per_doc = (
        lab.select("__id__", F.explode("__toks__").alias("token"))
        .join(weights, "token")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__wm__").alias("__sw__"),
        )
    )
    score = F.lit(bias_milli).cast("long") + F.coalesce(
        F.col("__sw__"), F.lit(0)
    )
    return (
        lab.select("__id__", "__y__")
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.col("__y__").alias("label_positive"),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            score.alias("score_milli"),
            (score > 0).alias("predicted_positive"),
            ((score > 0) == F.col("__y__")).alias("correct"),
        )
    )


def stupid_backoff(
    target: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
    round_digits: int = 4,
) -> DataFrame:
    """Cross-corpus TRIGRAM language-model filter with stupid backoff
    (Brants et al., EMNLP 2007, "Large Language Models in Machine
    Translation") — the distributed-counts n-gram scorer that made
    web-scale LMs practical: no discounting, no normalization, just
    relative frequencies with a fixed backoff penalty, which is exactly
    what survives a count-table-sharded 100 TB corpus.

    Score of each target trigram position (w1 w2 w3) against the
    REFERENCE corpus counts::

        S = c(w1 w2 w3) / c(w1 w2)          if the trigram was seen
          = α  · c(w2 w3) / c(w2)           elif the bigram was seen
          = α² · c(w3) / N                  elif the unigram was seen
          = α² · 1 / N                      else (count-1 pseudo-unigram)

    (a seen trigram implies its prefix bigram was seen in the same
    corpus, so the first ratio is always defined; likewise c(w2) for a
    seen (w2 w3)). Emits per target doc: n_trigrams, the per-backoff-
    level hit counts (n_tri_hit / n_bi_backoff / n_uni_backoff /
    n_unseen — integer-exact diagnostics of HOW the doc diverges), and
    ``avg_neg_logscore`` = mean of −ln S (S is a score, not a
    probability — Brants' point — so this is a ranking signal, not a
    perplexity). Docs with < 3 tokens survive with 0 counts and NULL
    score. The trigram order is the step past :func:`cross_perplexity`
    (unigram add-k): word-salad with an in-domain vocabulary keeps a
    good unigram score but backs off constantly here.

    Execution shape (100 TB): reference tokenizes ONCE into a persisted
    array frame feeding the three count tables (ONE map-side-combined
    groupBy each — these are the sharded count tables of the paper,
    persisted); target tokenizes once into a persisted spine; scoring
    is four LEFT equi-joins of the exploded target trigrams onto the
    count tables (broadcast when they fit, hash join on the n-gram key
    at corpus scale — Brants' hash-by-ngram distribution) + one
    groupBy(doc)."""
    from topnotch_spark.operators.dedup import _persist

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"stupid_backoff: alpha must be in (0, 1], got {alpha}")
    a2 = alpha * alpha

    def grams(col, n_grams: int):
        n = F.size(col)
        take = n - (n_grams - 1)
        parts = [F.slice(col, i + 1, take) for i in range(n_grams)]
        zipped = parts[0]
        for p in parts[1:]:
            zipped = F.zip_with(
                zipped, p, lambda a, b: F.concat(a, F.lit(" "), b)
            )
        return F.when(n >= n_grams, zipped).otherwise(
            F.array().cast("array<string>")
        )

    ref_arr = _persist(reference.select(tokens(text_col).alias("__toks__")))
    uni = _persist(
        ref_arr.select(F.explode("__toks__").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    nn = uni.agg(F.sum("c1").alias("__N__"))
    bi = _persist(
        ref_arr.select(F.explode(grams(F.col("__toks__"), 2)).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    tri = (
        ref_arr.select(F.explode(grams(F.col("__toks__"), 3)).alias("tg"))
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c3"))
    )
    arr = _persist(
        target.select(
            F.col(id_col).alias("__id__"), tokens(text_col).alias("__toks__")
        )
    )
    pos = arr.select("__id__", F.explode(grams(F.col("__toks__"), 3)).alias("tg"))
    # context keys derived from the trigram string (tokens contain no
    # whitespace by construction of tokens())
    pos = pos.select(
        "__id__",
        "tg",
        F.substring_index("tg", " ", 2).alias("__bi_pre__"),
        F.substring_index("tg", " ", -2).alias("__bi_suf__"),
        F.substring_index(
            F.substring_index("tg", " ", 2), " ", -1
        ).alias("__w2__"),
        F.substring_index("tg", " ", -1).alias("__w3__"),
    )
    c2_of_w2 = uni.select(
        F.col("w").alias("__w2__"), F.col("c1").alias("c_w2")
    )
    c1_of_w3 = uni.select(
        F.col("w").alias("__w3__"), F.col("c1").alias("c_w3")
    )
    joined = (
        pos.join(tri, "tg", "left")
        .join(
            bi.select(F.col("bg").alias("__bi_pre__"), F.col("c2").alias("c_pre")),
            "__bi_pre__",
            "left",
        )
        .join(
            bi.select(F.col("bg").alias("__bi_suf__"), F.col("c2").alias("c_suf")),
            "__bi_suf__",
            "left",
        )
        .join(c2_of_w2, "__w2__", "left")
        .join(c1_of_w3, "__w3__", "left")
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("__N__").cast("double")
    s = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c_pre").cast("double"),
        )
        .when(
            F.col("c_suf").isNotNull(),
            F.lit(alpha) * F.col("c_suf").cast("double")
            / F.col("c_w2").cast("double"),
        )
        .when(
            F.col("c_w3").isNotNull(),
            F.lit(a2) * F.col("c_w3").cast("double") / nd,
        )
        .otherwise(F.lit(a2) / nd)
    )
    lvl = (
        F.when(F.col("c3").isNotNull(), F.lit(0))
        .when(F.col("c_suf").isNotNull(), F.lit(1))
        .when(F.col("c_w3").isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    per_doc = joined.select(
        "__id__", (-F.log(s)).alias("__nls__"), lvl.alias("__lvl__")
    ).groupBy("__id__").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum((F.col("__lvl__") == 0).cast("long")).alias("n_tri_hit"),
        F.sum((F.col("__lvl__") == 1).cast("long")).alias("n_bi_backoff"),
        F.sum((F.col("__lvl__") == 2).cast("long")).alias("n_uni_backoff"),
        F.sum((F.col("__lvl__") == 3).cast("long")).alias("n_unseen"),
        F.round(F.avg("__nls__"), round_digits).alias("avg_neg_logscore"),
    )
    zero = F.lit(0).cast("long")
    return (
        arr.select("__id__")
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_trigrams", zero).alias("n_trigrams"),
            F.coalesce("n_tri_hit", zero).alias("n_tri_hit"),
            F.coalesce("n_bi_backoff", zero).alias("n_bi_backoff"),
            F.coalesce("n_uni_backoff", zero).alias("n_uni_backoff"),
            F.coalesce("n_unseen", zero).alias("n_unseen"),
            "avg_neg_logscore",
        )
    )


def unigram_segment(
    target: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    round_digits: int = 6,
    words: DataFrame | None = None,
) -> DataFrame:
    """APPLY a trained unigram-LM piece vocabulary to new data — the
    deployment step of the tokenizer lifecycle (train:
    :func:`unigram_lm_vocab` → audit: :func:`unigram_fertility_by_group`
    → apply: this). ``vocab`` is any frame with (piece, lp_milli)
    columns — typically the trainer's output read back from a mounted
    table or the plan registry, so a tokenizer trained once can segment
    every future batch identically.

    Per target document: (id, n_tokens, n_subwords, fertility) — token
    and Viterbi-subword counts over the words the vocab can segment:
    length ≤ max_word_len (the trainer's corpus contract) AND fully
    coverable by vocab pieces — a word containing a character no piece
    covers is excluded on BOTH engines (the oracle enumerates complete
    paths only; the Spark DP filters on the final cost). Documents with
    no scorable tokens survive with 0/0 and NULL fertility.

    Execution shape (100 TB): the vocab is a broadcast map (≤ vocab
    rows); the TARGET reduces to its distinct words for the Viterbi
    pass (Heaps-sublinear, persisted) and one corpus-tokens → word
    equi-join + groupBy(doc) rolls the counts up — the
    bpe/unigram-fertility shape with a per-doc instead of per-group
    tail."""
    from topnotch_spark.operators.dedup import _persist

    lp = vocab.select("piece", "lp_milli")
    # ``words`` optionally supplies a precomputed :func:`word_counts`
    # frame (same max_word_len contract) so a train→apply pipeline
    # reduces the corpus exactly once
    if words is None:
        words = _persist(
            target.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.length("word") <= max_word_len)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
    # words the vocab cannot FULLY segment (a character no piece covers)
    # are excluded exactly like the oracle's complete-path enumeration —
    # any unreachable piece drags the DP cost below _UNI_MINF / 2
    word_sub = (
        _unigram_viterbi_bounds(words, lp, max_piece_len)
        .filter(F.col("__cost__") > _UNI_MINF // 2)
        .select(
            "word",
            (F.size("__bd__") - 1).cast("long").alias("__nsub__"),
        )
    )
    tok = target.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    per_doc = (
        tok.join(word_sub, "word")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
        )
    )
    return (
        target.select(F.col(id_col).alias("__id__"))
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_subwords", F.lit(0).cast("long")).alias(
                "n_subwords"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_subwords") / F.col("n_tokens"),
                        round_digits),
            ).alias("fertility"),
        )
    )


def wordpiece_vocab(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_piece_len: int = 4,
    vocab_size: int = 48,
    max_word_len: int = 12,
    words: DataFrame | None = None,
) -> DataFrame:
    """Frequency-seeded WordPiece-style piece vocabulary — the third
    tokenizer family next to [bpe_merge_sequence] (merge-based) and
    [unigram_lm_vocab] (likelihood-based): every corpus CHARACTER
    (the coverage floor real WordPiece also guarantees) plus the
    ``vocab_size`` most frequent multi-char substrings of length
    ≤ ``max_piece_len`` (count desc, piece asc tiebreak; counts are
    occurrence-position counts weighted by word frequency —
    overlap-inclusive, exact integers). The greedy longest-match-first
    segmenter :func:`wordpiece_segment` consumes the piece column.

    Emits (rank, piece, piece_len, n_occurrences) ordered by rank =
    row_number over (n_occurrences desc, piece asc) across the whole
    vocabulary. Training words are whitespace tokens with
    ``length ≤ max_word_len`` — the unigram trainer's corpus contract,
    which also bounds the oracle's candidate enumeration.

    Execution shape (100 TB): the corpus reduces to its vocabulary once
    (map-side-combined groupBy(word), Heaps-sublinear); candidates are
    a bounded ≤ word_len × max_piece_len explode of that frame; one
    groupBy(piece) and one (vocab_size + alphabet)-row rank window."""
    if max_piece_len < 2:
        raise ValueError(
            f"wordpiece_vocab: max_piece_len must be >= 2, got {max_piece_len}"
        )
    if vocab_size < 0:
        raise ValueError(
            f"wordpiece_vocab: vocab_size must be >= 0, got {vocab_size}"
        )
    # ``words`` optionally supplies a precomputed :func:`word_counts`
    # frame (same max_word_len contract)
    if words is not None:
        wc = words
    else:
        from topnotch_spark.operators.dedup import _persist

        wc = _persist(
            df.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.length("word") <= max_word_len)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("wc"))
        )
    # all substrings of length 1..P at every position, never past the
    # word end: (pos, L) pairs with pos + L <= len + 1 (1-based substr)
    cand = wc.select(
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)), p -> "
                f"transform(sequence(1, least({max_piece_len}, "
                f"length(word) - p + 1)), "
                f"l -> substring(word, p, l))))"
            )
        ).alias("piece"),
        "wc",
    ).groupBy("piece").agg(F.sum("wc").alias("n_occurrences"))
    chars = cand.filter(F.length("piece") == 1)
    # top-N as a DISTRIBUTED TakeOrderedAndProject (orderBy + limit:
    # per-partition heaps, no single-partition sort exchange), not a
    # global row_number window over every candidate — the candidate
    # frame is alphabet-bounded so the window survived scale-up, but
    # the limit shape is strictly better and silences the "No Partition
    # Defined for Window" planning warning (VERDICT r11 #4). Only the
    # winners (≤ vocab_size + alphabet rows) see a rank window below.
    multi = (
        cand.filter(F.length("piece") >= 2)
        .orderBy(F.col("n_occurrences").desc(), F.col("piece").asc())
        .limit(vocab_size)
    )
    out = chars.unionByName(multi)
    return out.select(
        F.row_number()
        .over(
            Window.orderBy(F.col("n_occurrences").desc(), F.col("piece").asc())
        )
        .alias("rank"),
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "n_occurrences",
    )


def _wordpiece_walk(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int,
    max_word_len: int,
):
    """Greedy longest-match-first walk over a DISTINCT-words frame —
    the shared core of :func:`wordpiece_segment` (per-document apply)
    and :func:`wordpiece_fertility_by_group` (per-slice audit).
    Returns ``(word_sub, checkpoints)``: one row per fully-walkable
    word — (word, __nsub__ subword count, __nchr__ char count) — plus
    the checkpoint paths the caller must register on its output frame
    for release-time deletion. Unsegmentable words (stuck at a
    character the vocab lacks) never reach pos == len and are excluded,
    identically on both engines. See :func:`wordpiece_segment` for the
    plan-size discipline notes (eager truncation of the longest-match
    table, per-round coalesce, cadence-3 lazy truncation)."""
    from topnotch_spark.operators.cluster import _truncate_round

    pieces = F.broadcast(vocab.select("piece").distinct())
    # longest-match table: step(word, pos) = max piece length matching
    # at 0-based pos, candidates never reading past the word end.
    # EAGERLY truncated (not just persisted): every one of the walk's
    # lazy checkpoints below re-plans its full upstream, and this
    # lambda-heavy subtree (nested HOFs + the vocab windows behind the
    # broadcast) costs ~3 s PER PLANNING in Catalyst — truncating it to
    # an RDD scan once cut segment construction 12 s → ~2 s
    lmatch, lm_ckpt = _truncate_round(
        words.select(
            "word",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, length(word)), p -> "
                    f"transform(sequence(1, least({max_piece_len}, "
                    f"length(word) - p + 1)), "
                    f"l -> struct(p - 1 AS pos, l AS len, "
                    f"substring(word, p, l) AS sub))))"
                )
            ).alias("c"),
        )
        .select("word", F.col("c.pos").alias("pos"), F.col("c.len").alias("len"),
                F.col("c.sub").alias("piece"))
        .join(pieces, "piece")
        .groupBy("word", "pos")
        .agg(F.max("len").alias("step")),
        None,
    )
    # Greedy pointer-chasing walk. Each round references the previous
    # state TWICE (finished passthrough + advance join), so without
    # per-round lineage truncation the logical plan doubles per round
    # (2^max_word_len nodes); _truncate_round caps it at one round's
    # shape. eager=False keeps the whole walk ONE job (each lazy
    # checkpoint materializes once and both same-round references share
    # it — the pagerank fixed-iteration convention; measured: 12 eager
    # rounds cost ~30 s of scheduled jobs at sf0.01, lazy ~2 s). The
    # prev-path handoff is valid on the parquet path (each state
    # supersedes the last once materialized); the FINAL path backs
    # word_sub through the output, so the caller registers it for
    # release-time deletion.
    state, ckpt = _truncate_round(
        words.select(
            "word",
            F.lit(0).alias("pos"),
            F.lit(0).alias("n"),
            F.length("word").alias("__len__"),
        ),
        None,
        eager=False,
    )
    n_parts = words.sparkSession.sparkContext.defaultParallelism
    for r in range(1, max_word_len + 1):
        # string predicates/projections (r13): the Column forms cost
        # ~45 py4j construction round trips per round × 12 rounds;
        # the parsed forms are the same expressions
        advanced = (
            state.filter("pos < __len__")
            .join(lmatch, ["word", "pos"])
            .selectExpr(
                "word", "pos + step AS pos", "n + 1 AS n", "__len__"
            )
        )
        # coalesce BEFORE the checkpoint: the union concatenates the
        # passthrough and advance sides' partitions, so without it the
        # state doubles its partition count per round — 2^max_word_len
        # empty tasks by the end (measured: rounds went 0.4 s → 32 s
        # before the cap; flat ~0.4 s after). Truncation every 3rd
        # round (and on the last): between truncations the plan grows
        # ≤ 2³ copies of one round's small subtree, vs 12 per-round
        # physical plannings at ~1 s each (measured 12.6 s → ~4 s)
        state = state.filter("pos >= __len__").unionByName(
            advanced
        ).coalesce(n_parts)
        if r % 3 == 0 or r == max_word_len:
            state, ckpt = _truncate_round(state, ckpt, eager=False)
    word_sub = state.filter(F.col("pos") == F.col("__len__")).select(
        "word",
        F.col("n").cast("long").alias("__nsub__"),
        F.col("__len__").cast("long").alias("__nchr__"),
    )
    return word_sub, [lm_ckpt, ckpt]


def wordpiece_segment(
    target: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    round_digits: int = 6,
    words: DataFrame | None = None,
) -> DataFrame:
    """APPLY a WordPiece-style vocabulary with GREEDY
    LONGEST-MATCH-FIRST segmentation (the WordPiece/BERT runtime
    algorithm — Devlin et al. 2019 use exactly this left-to-right
    longest-prefix walk): at each position take the longest vocab piece
    matching there and advance; a word stuck at any position (a
    character the vocab lacks) is unsegmentable and excluded on BOTH
    engines, like :func:`unigram_segment`'s uncoverable words.
    ``vocab`` is any frame with a ``piece`` column — typically
    :func:`wordpiece_vocab` output read back from a mounted table or
    the plan registry.

    Per target document: (id, n_tokens, n_subwords, fertility) over the
    scorable words (length ≤ ``max_word_len``, fully walkable);
    documents with no scorable tokens survive with 0/0 and NULL
    fertility — the [unigram_segment] output contract, so the three
    tokenizer families' apply steps are drop-in comparable.

    Execution shape (100 TB): the TARGET reduces to its distinct words
    (Heaps-sublinear, persisted); the longest-match table is one
    bounded ≤ word_len × max_piece_len explode joined against the
    broadcast vocab and reduced by groupBy(word, pos) max, then
    eagerly lineage-truncated — after which the greedy walk is
    ``max_word_len`` rounds of one equi-join each against that table
    (deterministic pointer-chasing, constant partition width, lazy
    cadence-3 truncation); one corpus-tokens → word equi-join +
    groupBy(doc) rolls the counts up."""
    from topnotch_spark.operators.dedup import (
        _persist,
        _register_checkpoints,
    )

    if max_word_len < 1:
        raise ValueError(
            f"wordpiece_segment: max_word_len must be >= 1, got {max_word_len}"
        )
    # ``words`` optionally supplies a precomputed :func:`word_counts`
    # frame (same max_word_len contract) — its word column is exactly
    # this distinct set
    if words is not None:
        words = words.select("word")
    else:
        words = _persist(
            target.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.length("word") <= max_word_len)
            .distinct()
        )
    word_sub, ckpts = _wordpiece_walk(
        words, vocab, max_piece_len, max_word_len
    )
    tok = target.select(
        F.col(id_col).alias("__id__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    per_doc = (
        tok.join(word_sub, "word")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
        )
    )
    out = (
        target.select(F.col(id_col).alias("__id__"))
        .join(per_doc, "__id__", "left")
        .select(
            F.col("__id__").alias(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("n_subwords", F.lit(0).cast("long")).alias(
                "n_subwords"
            ),
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_subwords") / F.col("n_tokens"),
                        round_digits),
            ).alias("fertility"),
        )
    )
    _register_checkpoints(out, ckpts)
    return out


def wordpiece_fertility_by_group(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    max_piece_len: int = 4,
    vocab_size: int = 48,
    max_word_len: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer fit per corpus slice under the TRAINED WordPiece-style
    vocabulary — the third member of the per-slice selection table next
    to :func:`bpe_fertility_by_group` (merge-based) and
    :func:`unigram_fertility_by_group` (likelihood-based), making the
    three tokenizer families drop-in comparable end-to-end (train →
    audit → apply for all three): train :func:`wordpiece_vocab` on the
    whole corpus, greedy-longest-match-walk each distinct word once
    (:func:`_wordpiece_walk`), and report per ``group_col`` fertility =
    subwords per whitespace token and chars_per_subword.

    Output: (group_col, n_tokens, n_subwords, fertility,
    chars_per_subword), one row per group, ratios rounded to
    ``round_digits`` from exact integer sums. Tokens longer than
    ``max_word_len`` or unsegmentable under the vocab (impossible when
    training corpus == audited corpus — the char floor covers every
    trained word) are excluded from the sums, mirroring
    :func:`wordpiece_segment`'s scorable-word contract.

    Execution shape (100 TB): trainer reduces the corpus to its
    vocabulary once (Heaps-sublinear); the walk touches only DISTINCT
    words; one corpus-tokens → word equi-join + map-side-combined
    groupBy(group) rolls the slice sums up — the corpus is never
    rewritten (the bpe/unigram fertility shape). ``id_col`` unused
    (uniform text-op signature)."""
    from topnotch_spark.operators.dedup import (
        _persist,
        _register_checkpoints,
    )

    vocab = wordpiece_vocab(
        df, id_col, text_col, max_piece_len, vocab_size, max_word_len
    )
    words = _persist(
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .distinct()
    )
    word_sub, ckpts = _wordpiece_walk(
        words, vocab, max_piece_len, max_word_len
    )
    tok = df.select(
        F.col(group_col).alias("__grp__"),
        F.explode(tokens(text_col)).alias("word"),
    )
    result = (
        tok.join(word_sub, "word")
        .groupBy("__grp__")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__nsub__").alias("n_subwords"),
            F.sum("__nchr__").alias("__chars__"),
        )
        .select(
            F.col("__grp__").alias(group_col),
            "n_tokens",
            "n_subwords",
            F.round(
                F.col("n_subwords") / F.col("n_tokens"), round_digits
            ).alias("fertility"),
            F.round(
                F.col("__chars__") / F.col("n_subwords"), round_digits
            ).alias("chars_per_subword"),
        )
    )
    _register_checkpoints(result, ckpts)
    return result
