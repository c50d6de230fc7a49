"""Mergeable distinct-count sketches (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``).

The 100 TB pattern for "distinct users per <any slice>": computing
exact COUNT(DISTINCT) per slice re-shuffles the raw data for EVERY
grouping the analyst asks for. Sketches make distinct counts
PRE-AGGREGATABLE: build one small binary sketch per detail cell once
(daily × source, say), persist that dimension-sized table, and any
coarser rollup (weekly, per-source, global) is a cheap union of
sketches — no second pass over the raw 100 TB, and sketch tables
compose across incremental loads (yesterday's sketches never need
rebuilding).

Estimates are approximate (~1.6%/sqrt(2^lg_k) relative standard error
— the DataSketches HLL bound; lg_k=12 ⇒ ~2.5%) and the sketch binary
is engine-specific, so this family is deliberately NOT oracle-twinned:
correctness is gated by pytest bounds against exact counts and by the
merge-consistency property (union-of-parts ≈ sketch-of-whole), the
same policy as `profile_lineitem_approx`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "__hll_sketch__"


def build_distinct_sketches(
    df: DataFrame,
    detail_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per detail cell: (detail_cols..., sketch binary).
    ONE map-side-combined groupBy; output is dimension-sized (a few KB
    per cell), the table you persist and re-union forever after."""
    if not detail_cols:
        raise ValueError("build_distinct_sketches: detail_cols required")
    return df.groupBy(*detail_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(SKETCH_COL)
    )


def rollup_distinct(
    sketches: DataFrame,
    rollup_cols: list[str],
) -> DataFrame:
    """Union the detail sketches up to ``rollup_cols`` and estimate:
    (rollup_cols..., n_distinct_est). Input is the sketch table — the
    raw data is never touched again. Pass ``[]`` for a single global
    row (grouped on a constant, so the aggregation stays map-side
    combined rather than single-partition)."""
    est = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(SKETCH_COL))
    ).alias("n_distinct_est")
    if rollup_cols:
        return sketches.groupBy(*rollup_cols).agg(est)
    return sketches.groupBy(F.lit(1).alias("__g__")).agg(est).drop("__g__")


def distinct_rollup(
    df: DataFrame,
    detail_cols: list[str],
    rollup_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Convenience: build detail sketches and roll them up in one call.
    ``rollup_cols`` must be a subset of ``detail_cols`` (that is what
    makes the rollup a pure sketch union)."""
    extra = set(rollup_cols) - set(detail_cols)
    if extra:
        raise ValueError(
            f"distinct_rollup: rollup_cols {sorted(extra)} not in "
            f"detail_cols {detail_cols}"
        )
    return rollup_distinct(
        build_distinct_sketches(df, detail_cols, value_col, lg_k),
        rollup_cols,
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (frequency estimation)
# ---------------------------------------------------------------------------
#
# The heavy-hitter companion to the HLL distinct sketch and the Bloom
# seen-set: a depth x width grid of counters answering "about how many
# times has key k appeared" with one-sided error (never UNDER-estimates;
# over-estimate bounded by ~N/width per row, min over depth rows).
# Unlike the HLL binary, every cell is a plain integer derived from the
# same md5 double hashing as operators/membership.py, so the whole
# sketch — and every estimate — is bit-exact reproducible in any ANSI
# engine and the catalog query carries a full DuckDB oracle.
#
# Mergeability: cells add — union parts and sum per (row_idx, col_idx).
# The 100 TB pattern mirrors the HLL one: build per ingest batch, keep
# the (depth x width)-row cell table, merge forever after; frequency
# questions never re-read the raw corpus.


def cms_build(
    df: DataFrame,
    key,
    width: int = 1024,
    depth: int = 4,
    prehashed: bool = False,
) -> DataFrame:
    """Build the sketch: (row_idx, col_idx, cnt) cells, only non-zero
    cells present (≤ depth·width rows regardless of corpus size). One
    posexplode (depth rows per input row) + ONE map-side-combined
    groupBy. Positions are Kirsch-Mitzenmacher double hashes of
    md5(key) — row j probes col (h1 + j·h2) mod width."""
    from topnotch_spark.operators.membership import _positions

    keyc = F.col(key) if isinstance(key, str) else key
    pos = df.select(
        F.posexplode(_positions(keyc, width, depth, prehashed)).alias(
            "row_idx", "col_idx"
        )
    )
    return pos.groupBy("row_idx", "col_idx").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(parts: list[DataFrame]) -> DataFrame:
    """Merge sketches built with the SAME (width, depth): cells add."""
    if not parts:
        raise ValueError("cms_merge: parts must be non-empty")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("row_idx", "col_idx").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_query(
    df: DataFrame,
    id_col: str,
    key,
    cms: DataFrame,
    width: int = 1024,
    depth: int = 4,
    prehashed: bool = False,
) -> DataFrame:
    """Estimate each row's key frequency: (id, est_count) with
    est_count = min over the depth rows of the probed cell (0 when a
    cell is absent — the key was never seen). ``width``/``depth`` MUST
    match the build. The sketch broadcasts (≤ depth·width rows); the
    query side streams — same never-reshuffle-the-corpus shape as the
    Bloom probe."""
    from topnotch_spark.operators.membership import _positions

    keyc = F.col(key) if isinstance(key, str) else key
    pos = df.select(
        F.col(id_col),
        F.posexplode(_positions(keyc, width, depth, prehashed)).alias(
            "row_idx", "col_idx"
        ),
    )
    return (
        pos.join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
        .groupBy(id_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
        )
    )
