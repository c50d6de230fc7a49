"""Spatial within-radius join (beyond-reference extension, SURVEY.md
§7E): all (left, right) pairs within a Euclidean radius — the
store-vs-customer / sensor-vs-event proximity primitive, and the 2-D
generalization of the interval lookup join.

A naive theta-join on the distance predicate is a broadcast nested loop
(O(|L| x |R|) distance evaluations). ``within_radius_join`` blocks on a
grid of radius-sized cells instead: the RIGHT side maps to its single
home cell, the LEFT side explodes to the 3x3 neighborhood of its home
cell (any pair within r is in adjacent cells by construction since the
cell edge is r), and the match becomes an EQUI-join on the cell id
followed by the exact distance filter. Fan-out is a flat 9x on the left
side; per-cell density caps the quadratic term, exactly like LSH bucket
size does for near-dup — and dense hot cells (a city-center cell at
planet scale) are AQE skew-split like any hot join key.

Distances compare SQUARED (``dist_sq <= r²``): no sqrt in the hot path,
and with integer coordinates the predicate and output are exact
integers — engine-portable with no floating-point boundary, which is
what makes the operator oracle-checkable by value hash. Callers wanting
the metric distance take sqrt on the (small) result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def within_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    left_xy: tuple[str, str] = ("x", "y"),
    right_xy: tuple[str, str] = ("x", "y"),
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """All (left row, right row) pairs with squared Euclidean distance
    <= radius². Output carries every column of both sides (collisions
    suffixed) plus ``dist_sq``.

    One equi-join on the grid cell; left explodes 9x (the 3x3 cell
    neighborhood), right maps to its home cell once — put the smaller
    or replicable side LEFT if 9x matters at your scale.
    """
    if radius <= 0:
        raise ValueError(f"within_radius_join: radius must be > 0, got {radius}")
    r = float(radius)
    lx, ly = left_xy
    rx, ry = right_xy
    overlap = (set(left.columns) & set(right.columns)) | {lx, ly, rx, ry}
    sl, sr = suffixes

    def prep(df: DataFrame, suffix: str) -> DataFrame:
        cols = [
            F.col(c).alias(f"{c}{suffix}" if c in overlap else c)
            for c in df.columns
        ]
        return df.select(*cols)

    cell = lambda c: F.floor(F.col(c) / F.lit(r)).cast("bigint")  # noqa: E731
    l = prep(left, sl).select(
        "*",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dx: F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dy: F.struct(
                            (cell(f"{lx}{sl}") + dx).alias("cx"),
                            (cell(f"{ly}{sl}") + dy).alias("cy"),
                        ),
                    ),
                )
            )
        ).alias("__cell__"),
    )
    rgt = prep(right, sr).select(
        "*",
        F.struct(
            cell(f"{rx}{sr}").alias("cx"), cell(f"{ry}{sr}").alias("cy")
        ).alias("__cell__"),
    )
    dx = F.col(f"{lx}{sl}") - F.col(f"{rx}{sr}")
    dy = F.col(f"{ly}{sl}") - F.col(f"{ry}{sr}")
    dist_sq = dx * dx + dy * dy
    return (
        l.join(rgt, "__cell__")
        .filter(dist_sq <= F.lit(r) * F.lit(r))
        .drop("__cell__")
        .withColumn("dist_sq", dist_sq)
    )
