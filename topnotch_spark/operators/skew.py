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


def salt_plan(
    df: DataFrame,
    keys: list[str],
    target_rows_per_task: int = 1_000_000,
    max_salt: int = 256,
    round_digits: int = 6,
) -> DataFrame:
    """Salting PLAN for a skewed join: for every key whose row count
    exceeds ``target_rows_per_task``, the salt factor that splits it
    into ≤-target slices — (keys..., n_rows, frac, salt_factor) — the
    prescription step between [key_skew_topk] (detects the hot keys)
    and [salted_join] (applies a uniform factor): feed the max emitted
    salt_factor to salted_join, or use the per-key table to build a
    targeted salt map. ``salt_factor = min(ceil(n_rows / target),
    max_salt)`` — the cap bounds build-side replication (salted_join
    replicates the other side salt_factor-fold).

    Exact integers end to end (ceil on BIGINTs via (n + t − 1) div t —
    no float boundary); only violating keys are emitted (compliant keys
    are the bulk and carry no action — the k_anonymity risky_only
    convention). Execution shape: one map-side-combined groupBy + a
    1-row total broadcast; output is at most one row per hot key.
    """
    if target_rows_per_task < 1:
        raise ValueError(
            "salt_plan: target_rows_per_task must be >= 1, got "
            f"{target_rows_per_task}"
        )
    if max_salt < 1:
        raise ValueError(f"salt_plan: max_salt must be >= 1, got {max_salt}")
    kcols = [F.col(c) for c in keys]
    counts = df.groupBy(*kcols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total__"))
    t = int(target_rows_per_task)
    factor = F.least(
        F.expr(f"(n_rows + {t - 1}) div {t}"), F.lit(max_salt).cast("long")
    )
    return (
        counts.filter(F.col("n_rows") > t)
        .crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("__total__").cast("double"),
                round_digits,
            ).alias("frac"),
            factor.alias("salt_factor"),
        )
    )


def key_skew_topk(df: DataFrame, keys: list[str], k: int = 10) -> DataFrame:
    """Join-key skew profile: the k heaviest key values with their row
    counts and share of the table — the measurement that decides whether
    a join needs ``salted_join``/AQE skew handling BEFORE it blows up,
    and the partner diagnostic to the fixes above.

    Returns (keys..., n_rows, frac, rank), rank 1 = hottest; total order
    (count desc, keys asc) so ties are deterministic.

    Execution shape: one map-side-combined groupBy over the keys, a
    1-row total, then orderBy+limit — which Spark plans as
    TakeOrderedAndProject (per-partition top-k, k-row merge on the
    driver), NOT a global sort; the rank window runs over the k
    surviving rows only. Nothing here is proportional to key
    cardinality except the groupBy itself."""
    from pyspark.sql import Window

    kcols = [F.col(c) for c in keys]
    counts = df.groupBy(*kcols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total__"))
    top = counts.orderBy(F.col("n_rows").desc(), *[c.asc() for c in kcols]).limit(k)
    w = Window.partitionBy().orderBy(
        F.col("n_rows").desc(), *[F.col(c).asc() for c in keys]
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total__"), 6).alias("frac"),
        )
        .select("*", F.row_number().over(w).alias("rank"))
    )
