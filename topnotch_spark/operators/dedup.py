"""Deduplication operators for large-scale text/embedding corpora.

Five strategies, all shuffle-aware (SURVEY.md §7 phase E; these are
extensions beyond the reference surface):

- exact:        hash-groupBy on md5(text) — one shuffle on the hash key.
- fingerprint:  hash-groupBy on the sorted-distinct-token fingerprint —
                catches word-order-shuffled duplicates.
- minhash LSH:  shingle → k minhashes → b bands; candidate pairs share a
                band bucket (equi-join on the bucket key — blocking keeps
                the join linear-ish instead of O(n²)); candidates verified
                with exact shingle Jaccard.
- simhash:      32-bit simhash, banded into chunks for candidate
                generation; Hamming-distance verification.
- embedding:    sign-random-projection bucket blocking + cosine
                verification on ``array<float>`` embedding columns.

Scale notes: every strategy is expressed as project → (explode) →
shuffle-on-key join → filter. No driver-side collection, no UDFs; AQE
handles skewed buckets (a hot shingle/bucket is split by skew-join).
For 100 TB corpora the band/bucket keys are the partitioning keys; tune
``num_minhashes``/``bands``/``n_planes`` to trade candidate recall vs
join fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from topnotch_spark.functions.text import (
    shingles_from_tokens,
    sorted_token_fingerprint,
    tokens,
    word_shingles,
)


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingles) with tokens materialized first — see
    shingles_from_tokens for why the two-step projection matters."""
    return (
        df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks__"))
        .select("id", shingles_from_tokens(F.col("__toks__"), n).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
from topnotch_spark.functions.vectors import cosine, srp_bucket

MINHASH_INIT = "f" * 16  # > any md5-prefix value


def keyed_dedup(
    df: DataFrame, id_col: str, key: Column, key_name: str = "dup_key"
) -> DataFrame:
    """Generic hash-dedup: key each row, keep the min-id row per key.

    Returns id, key, group_size and keep flag — callers either filter
    ``keep`` (dedup) or ``group_size > 1`` (duplicate report). One shuffle
    on the key; partial aggregation map-side.
    """
    keyed = df.select(F.col(id_col), key.alias(key_name))
    groups = keyed.groupBy(key_name).agg(
        F.min(id_col).alias("__keep_id__"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        keyed.join(groups, key_name)
        .select(
            id_col,
            key_name,
            "group_size",
            (F.col(id_col) == F.col("__keep_id__")).alias("keep"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return keyed_dedup(df, id_col, F.md5(F.col(text_col)), "dup_key")


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return keyed_dedup(df, id_col, sorted_token_fingerprint(text_col), "dup_key")


def minhash_signature_col(text_col: str, num_hashes: int, shingle_n: int = 3) -> Column:
    """Array of ``num_hashes`` minhash components. Component h = min over
    shingles of the 16-hex-char prefix of md5('h<h>_' || shingle) — string
    min equals numeric min on fixed-width hex, and is engine-portable."""
    shingles = word_shingles(text_col, shingle_n)
    def one(h: int) -> Column:
        return F.aggregate(
            shingles,
            F.lit(MINHASH_INIT),
            lambda acc, s: F.least(
                acc, F.substring(F.md5(F.concat(F.lit(f"h{h}_"), s)), 1, 16)
            ),
        )
    return F.array(*[one(h) for h in range(num_hashes)])


def jaccard_pairs_from_candidates(
    shingled: DataFrame, candidates: DataFrame, threshold: float
) -> DataFrame:
    """Verify candidate (id_1, id_2) pairs with exact shingle Jaccard.
    ``shingled``: (id, shingles array). Output: id_1, id_2, jaccard."""
    s1 = shingled.select(
        F.col("id").alias("id_1"), F.col("shingles").alias("__sh1__")
    )
    s2 = shingled.select(
        F.col("id").alias("id_2"), F.col("shingles").alias("__sh2__")
    )
    inter = F.size(F.array_intersect(F.col("__sh1__"), F.col("__sh2__")))
    union = F.size(F.array_union(F.col("__sh1__"), F.col("__sh2__")))
    return (
        candidates.join(s1, "id_1")
        .join(s2, "id_2")
        .select(
            "id_1",
            "id_2",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: banding for candidates, exact Jaccard
    for verification. Returns (id_1, id_2, jaccard) with id_1 < id_2.

    Execution shape (the 100 TB path): shingles are exploded ONCE; each
    shingle's md5 is computed once per hash seed inside a single groupBy(id)
    with ``num_hashes`` min-aggregates (map-side partial agg → one shuffle
    on id). Candidates come from an equi-join on (band, bucket); exact
    Jaccard verification reuses the same exploded table restricted to
    candidate pairs — no O(n²) stage anywhere."""
    rows_per_band = num_hashes // bands
    shingled = _shingled(df, id_col, text_col, shingle_n)
    exploded = shingled.select("id", F.explode("shingles").alias("sh"))

    sigs = exploded.groupBy("id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"h{h}_"), F.col("sh"))), 1, 16)
            ).alias(f"sig_{h}")
            for h in range(num_hashes)
        ]
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("id", *band_cols)
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(bands))
    buckets = banded.selectExpr(
        "id", f"stack({bands}, {stack_expr}) as (band_idx, bucket)"
    )
    left = buckets.select(F.col("id").alias("id_1"), "band_idx", "bucket")
    right = buckets.select(F.col("id").alias("id_2"), "band_idx", "bucket")
    candidates = (
        left.join(right, ["band_idx", "bucket"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    # exact-Jaccard verify on candidates via the exploded shingle table
    sizes = shingled.select("id", F.size("shingles").alias("n_sh"))
    a = exploded.select(F.col("id").alias("id_1"), F.col("sh").alias("sh"))
    b = exploded.select(F.col("id").alias("id_2"), F.col("sh").alias("sh"))
    common = (
        candidates.join(a, "id_1")
        .join(b, ["id_2", "sh"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_1", "n_sh": "n_1"}), "id_1")
        .join(sizes.withColumnsRenamed({"id": "id_2", "n_sh": "n_2"}), "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("n_common")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.3,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram-Jaccard duplicate pairs, blocked on shared shingles:
    explode → self-equi-join on shingle → count common → Jaccard.
    Returns (id_1, id_2, jaccard) with id_1 < id_2.

    The shingle is the blocking key — pairs sharing no shingle are never
    materialized, so the join is |pairs sharing ≥1 shingle|, not O(n²)."""
    base = _shingled(df, id_col, text_col, shingle_n)
    sizes = base.select("id", F.size("shingles").alias("n_sh"))
    exploded = base.select("id", F.explode("shingles").alias("shingle"))
    common = (
        exploded.alias("a")
        .join(exploded.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_1"), F.col("b.id").alias("id_2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_1", "n_sh": "n_1"}), "id_1")
        .join(sizes.withColumnsRenamed({"id": "id_2", "n_sh": "n_2"}), "id_2")
        .select(
            "id_1",
            "id_2",
            (
                F.col("n_common")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs over word-shingle features (Charikar-style
    web dedup): band the bit-string for candidates (pigeonhole: hamming ≤
    bands-1 guarantees a shared band), verify by exact Hamming distance.
    Returns (id_1, id_2, hamming).

    Shingle features (not single tokens) keep unrelated documents'
    simhashes near-random even over a small vocabulary, so band buckets
    stay selective and the candidate join stays small.

    Execution shape: distinct shingles are exploded once, each shingle's
    md5 is computed ONCE, and all ``bits`` per-bit ±1 votes are summed in a
    single groupBy(id) — map-side combine, one shuffle — instead of
    re-hashing every feature per bit."""
    from topnotch_spark.functions.text import md5_bit

    n_bands = bits // band_bits
    tok = _shingled(df, id_col, text_col, shingle_n).select(
        "id", F.explode("shingles").alias("t")
    ).withColumn("__h__", F.md5("t"))
    votes = tok.groupBy("id").agg(
        *[
            F.sum(md5_bit(F.col("__h__"), b) * 2 - 1).alias(f"v_{b}")
            for b in range(bits)
        ]
    )
    sh_col = F.concat(
        *[
            F.when(F.col(f"v_{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(bits)
        ]
    )
    base = votes.select("id", sh_col.alias("sh"))
    band_cols = [
        F.substring("sh", b * band_bits + 1, band_bits).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    banded = base.select("id", "sh", *band_cols)
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    buckets = banded.selectExpr(
        "id", "sh", f"stack({n_bands}, {stack_expr}) as (band_idx, bucket)"
    )
    left = buckets.select(F.col("id").alias("id_1"), F.col("sh").alias("sh_1"), "band_idx", "bucket")
    right = buckets.select(F.col("id").alias("id_2"), F.col("sh").alias("sh_2"), "band_idx", "bucket")
    hamming = F.aggregate(
        F.sequence(F.lit(1), F.lit(bits)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            F.substring(F.col("sh_1"), i.cast("int"), 1) != F.substring(F.col("sh_2"), i.cast("int"), 1), 1
        ).otherwise(0),
    )
    return (
        left.join(right, ["band_idx", "bucket"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "sh_1", "sh_2")
        .distinct()
        .select("id_1", "id_2", hamming.cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with SRP-bucket blocking.
    Returns (id_1, id_2, cos_sim) with id_1 < id_2. Bucketing bounds the
    candidate join (same-bucket only); cosine verifies."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        srp_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    left = base.select(
        F.col("id").alias("id_1"), F.col("vec").alias("__v1__"), "bucket"
    )
    right = base.select(
        F.col("id").alias("id_2"), F.col("vec").alias("__v2__"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(cosine(F.col("__v1__"), F.col("__v2__")), round_digits).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
