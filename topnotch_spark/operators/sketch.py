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
