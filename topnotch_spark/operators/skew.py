"""Skew mitigation: salted joins for pathologically hot keys.

AQE's skew-join splitting handles most skew at runtime, but it only
splits the PROBE side of a sort-merge join — a build/replicated-side fix
is still needed when one key owns a double-digit percentage of the rows
and the other side cannot be broadcast. ``salted_join`` is that fix:

- the big (skewed) side gets a DETERMINISTIC salt derived from the whole
  row (``xxhash64 mod n``) — no RNG, so retries/speculative tasks and
  re-runs produce identical results;
- the other side is replicated once per salt value (n-fold — keep the
  replicated side the smaller one);
- the join key becomes (keys..., salt), spreading each hot key over n
  partitions.

Result is row-for-row identical to the unsalted join (tests prove it);
only the partitioning changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__tn_salt__"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``skewed`` (hot-keyed, salted) with ``other`` (replicated
    ``salt`` times). Supported how: inner / left / left_outer — shapes
    where replicating ``other`` cannot duplicate or drop matches."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins; for right/full joins "
            "salt the other side or fall back to AQE skew handling"
        )
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)),
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)
