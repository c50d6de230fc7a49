"""Column profiling: per-column statistics in one aggregation pass.

A QC staple the reference lacks (its users run ad-hoc view queries for
this): count / nulls / distinct / min / max / avg / stddev per column,
computed in a SINGLE aggregation job — all expressions ride one
map-side-combined agg; the only "shuffle" is the final one-row reduce
plus Spark's expand for exact distinct counts.

Scale notes: exact ``count(distinct)`` over many columns multiplies scan
rows via EXPAND — fine into the tens of columns; pass ``exact=False``
at 100 TB to switch to ``approx_count_distinct`` (HLL, no expand) AND
``approx_percentile`` (Greenwald-Khanna sketch, bounded memory instead of
a full sort buffer). The approx path additionally fuses percentiles into
the SAME single aggregation job (the exact path must split them: a sort
buffer inside the EXPAND re-buffers every expanded copy — measured 20x).
The unpivot to one-row-per-column happens AFTER aggregation on a single
row, so it costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    round_digits: int = 6,
    percentile_accuracy: int = 10_000,
) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_value, max_value, avg_value,
    stddev_value, p25, p50, p75, p95). Non-numeric columns get null
    avg/stddev and min/max of their cast-to-double (null for strings);
    restrict ``columns`` to numerics when min/max matter cross-engine
    (float formatting of casts differs between engines).

    ``exact=False`` is the 100 TB path: HLL distinct counts (relative
    error ~1.6%) and sketched percentiles (rank error ≤ n /
    ``percentile_accuracy``), one fused aggregation job, no EXPAND, no
    sort buffer."""
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    cols = columns if columns is not None else [
        f.name for f in df.schema.fields
    ]
    distinct_fn = F.count_distinct if exact else F.approx_count_distinct

    aggs = []
    pct_aggs = []
    for c in cols:
        col = F.col(c)
        num = col.cast("double") if c in numeric else F.lit(None).cast("double")
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct_fn(col).alias(f"__nd_{c}"),
            F.min(num).alias(f"__min_{c}"),
            F.max(num).alias(f"__max_{c}"),
            F.round(F.avg(num), round_digits).alias(f"__avg_{c}"),
            F.round(F.stddev(num), round_digits).alias(f"__std_{c}"),
        ]
        pcts = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
        if exact:
            # exact interpolated percentiles — bit-identical to DuckDB's
            # quantile_cont (same type-7 definition). KEPT IN A SEPARATE
            # AGGREGATION: exact count_distinct rewrites its agg into an
            # EXPAND (one row copy per distinct-column), and a sort-based
            # percentile buffer inside that agg would re-buffer every
            # expanded copy — measured 20x slower fused than split. The
            # two one-row results cross-join for free.
            pct_aggs.append(F.percentile(num, pcts).alias(f"__pct_{c}"))
        else:
            # sketch percentiles ride the SAME agg: no EXPAND in the HLL
            # plan, so fusing costs nothing and saves a job. Cast to
            # double: approx_percentile returns the input type.
            aggs.append(
                F.expr(
                    f"transform(approx_percentile(CAST({c} AS DOUBLE), "
                    f"array(0.25D, 0.5D, 0.75D, 0.95D), "
                    f"{percentile_accuracy}), x -> CAST(x AS DOUBLE))"
                ).alias(f"__pct_{c}")
                if c in numeric
                else F.lit(None)
                .cast("array<double>")
                .alias(f"__pct_{c}")
            )
    one = df.agg(*aggs)
    if pct_aggs:
        one = one.crossJoin(df.agg(*pct_aggs))
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __min_{c}, __max_{c}, "
        f"__avg_{c}, __std_{c}, "
        f"element_at(__pct_{c}, 1), element_at(__pct_{c}, 2), "
        f"element_at(__pct_{c}, 3), element_at(__pct_{c}, 4)"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n, n_null, n_distinct, min_value, max_value, "
        "avg_value, stddev_value, p25, p50, p75, p95)"
    )


def profile_accuracy(
    df: DataFrame,
    columns: list[str],
    distinct_rel_err: float = 0.05,
    distinct_rsd: float = 0.01,
    pct_rank_eps: float = 0.001,
    percentile_accuracy: int = 10_000,
) -> DataFrame:
    """Deterministic verdict frame for the approx (100 TB) profile path:
    one row per column — ``(column, n, n_null, distinct_ok, pct_ok)``.

    ``n``/``n_null`` are exact (both engines agree bit-for-bit).
    ``distinct_ok`` states that the HLL estimate (built at relative
    standard deviation ``distinct_rsd``) is within ``distinct_rel_err``
    of the exact distinct count — a 5σ bound at the defaults, so a red
    verdict means a broken sketch, not sampling noise; ``pct_ok`` that
    every sketched percentile (p25/p50/p75/p95) lands within
    ``pct_rank_eps`` *rank* error of its target quantile — the sketch's
    own published guarantee (1/accuracy), with slack. The exact sides of
    both comparisons are computed in Spark, so the booleans are a real
    measured check of the sketches, while the ORACLE for this frame is
    the plain exact SQL (counts + literal TRUEs): the oracle hash goes
    red exactly when a sketch breaks its bound.

    Plan shape: job 1 is the fused approx aggregation (HLL + percentile
    sketches, no EXPAND, no sort buffer — the scan you'd run at 100 TB);
    job 2 broadcasts that 1-row frame back over ``df`` and fuses the
    exact distincts and the ≤/<-rank counts of the sketched percentile
    values into one aggregation. 2 scans total, no driver-side loops.
    """
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    bad = [c for c in columns if c not in numeric]
    if bad:
        raise ValueError(f"profile_accuracy needs numeric columns, got {bad}")

    qs = [0.25, 0.5, 0.75, 0.95]
    approx_aggs = []
    for c in columns:
        approx_aggs.append(
            F.approx_count_distinct(c, distinct_rsd).alias(f"__and_{c}")
        )
        approx_aggs.append(
            F.expr(
                f"transform(approx_percentile(CAST({c} AS DOUBLE), "
                f"array(0.25D, 0.5D, 0.75D, 0.95D), "
                f"{percentile_accuracy}), x -> CAST(x AS DOUBLE))"
            ).alias(f"__apct_{c}")
        )
    approx = df.agg(*approx_aggs)

    joined = df.crossJoin(F.broadcast(approx))
    exact_aggs = []
    for c in columns:
        col = F.col(c)
        num = col.cast("double")
        exact_aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.first(F.col(f"__and_{c}")).alias(f"__and_{c}"),
        ]
        for i in range(len(qs)):
            v = F.element_at(F.col(f"__apct_{c}"), i + 1)
            exact_aggs.append(
                F.sum(F.when(num <= v, 1).otherwise(0)).alias(f"__le{i}_{c}")
            )
            exact_aggs.append(
                F.sum(F.when(num < v, 1).otherwise(0)).alias(f"__lt{i}_{c}")
            )
    one = joined.agg(*exact_aggs)

    rows = []
    for c in columns:
        nn = f"(__n_{c} - __nn_{c})"  # non-null count = rank denominator
        pct_checks = " AND ".join(
            f"(__le{i}_{c} >= ({q} - {pct_rank_eps}) * {nn} "
            f"AND __lt{i}_{c} <= ({q} + {pct_rank_eps}) * {nn})"
            for i, q in enumerate(qs)
        )
        rows.append(
            f"'{c}', __n_{c}, __nn_{c}, "
            f"CAST(abs(__and_{c} - __nd_{c}) "
            f"<= {distinct_rel_err} * __nd_{c} AS BOOLEAN), "
            f"CAST(({pct_checks}) AS BOOLEAN)"
        )
    return one.selectExpr(
        f"stack({len(columns)}, {', '.join(rows)}) as "
        "(column, n, n_null, distinct_ok, pct_ok)"
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
    round_digits: int = 6,
) -> DataFrame:
    """Flag rows whose value is > k sample-standard-deviations from the
    (per-group) mean. Grouped: one window pass over the group
    partitioning (2 doubles of state per group). Ungrouped: a 1-row
    scalar aggregate broadcast-joined back to the rows — NOT an
    unpartitioned window, which would funnel the whole dataset through a
    single task. No driver collection either way. The classic first-line
    QC screen for numeric columns."""
    if group_cols:
        part = Window.partitionBy(*group_cols)
        mean = F.mean(F.col(value_col)).over(part)
        std = F.stddev_samp(F.col(value_col)).over(part)
        z = F.when(std > 0, (F.col(value_col) - mean) / std).otherwise(F.lit(0.0))
        base = df
    else:
        # collision-proof temp names (the input may already carry __m__)
        m_col, s_col = "__m__", "__s__"
        while m_col in df.columns or s_col in df.columns:
            m_col, s_col = m_col + "_", s_col + "_"
        stats = df.agg(
            F.mean(F.col(value_col)).alias(m_col),
            F.stddev_samp(F.col(value_col)).alias(s_col),
        )
        base = df.crossJoin(F.broadcast(stats))
        z = F.when(
            F.col(s_col) > 0, (F.col(value_col) - F.col(m_col)) / F.col(s_col)
        ).otherwise(F.lit(0.0))
    out = base.select(
        *[F.col(c) for c in df.columns],
        F.round(z, round_digits).alias("zscore"),
        (F.abs(F.round(z, round_digits)) > k).alias("is_outlier"),
    )
    return out


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.5,
    round_digits: int = 6,
) -> DataFrame:
    """Robust (median/MAD) outlier flagging: |0.6745*(x - median)/MAD| > k
    — the screen that survives the heavy-tailed columns where mean/stddev
    z-scores drown (a single 1e9 row inflates stddev until nothing else
    flags). 0.6745 is the standard normal-consistency constant.

    Execution shape: two grouped exact-median aggregates (Spark
    `median`, an exact percentile — matches DuckDB's interpolating
    `median`), each a groupBy over the group columns with the per-group
    result broadcast-joined back to the rows. Group cardinality is
    assumed dimension-like (priorities, sources, shards); for an
    ungrouped call the aggregates are 1-row scalars. MAD == 0 (constant
    group) yields NULL score, never a division blow-up.

    The input is registered in the dedup persist registry (it feeds the
    median pass, the MAD pass, and the final projection — 4 source scans
    without it); consume inside ``dedup_scope()`` or call
    ``unpersist_intermediates()`` to release the storage."""
    from topnotch_spark.operators.dedup import _persist

    df = _persist(df)
    gcols = list(group_cols or [])
    med_col, mad_col = "__med__", "__mad__"
    while med_col in df.columns or mad_col in df.columns:
        med_col, mad_col = med_col + "_", mad_col + "_"
    if gcols:
        med = df.groupBy(*gcols).agg(F.median(value_col).alias(med_col))
        with_med = df.join(F.broadcast(med), gcols)
        mad = (
            with_med.groupBy(*gcols)
            .agg(
                F.median(F.abs(F.col(value_col) - F.col(med_col))).alias(mad_col)
            )
        )
        base = with_med.join(F.broadcast(mad), gcols)
    else:
        med = df.agg(F.median(value_col).alias(med_col))
        with_med = df.crossJoin(F.broadcast(med))
        mad = with_med.agg(
            F.median(F.abs(F.col(value_col) - F.col(med_col))).alias(mad_col)
        )
        base = with_med.crossJoin(F.broadcast(mad))
    score = F.when(
        F.col(mad_col) > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col(med_col)) / F.col(mad_col),
    )
    return base.select(
        *[F.col(c) for c in df.columns],
        F.round(F.col(med_col), round_digits).alias("group_median"),
        F.round(F.col(mad_col), round_digits).alias("group_mad"),
        F.round(score, round_digits).alias("robust_z"),
        F.coalesce(F.abs(F.round(score, round_digits)) > k, F.lit(False)).alias(
            "is_outlier"
        ),
    )


def pivot_counts(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    pivot_values: list[str],
    value_col: str | None = None,
    round_digits: int = 2,
) -> DataFrame:
    """Cross-tab rollup via Spark's native pivot: one row per group, one
    `<value>_cnt` (and optionally `<value>_sum`) column per pivoted
    category. `pivot_values` is REQUIRED (not discovered) — passing the
    explicit domain keeps this a single aggregation job; omitting it
    would make Spark run a distinct-scan first and would break schema
    stability whenever a category is absent from a slice.

    One groupBy shuffle with map-side partial aggregation; output width
    is |pivot_values| × aggs, rows = |groups| — a dimension-sized frame
    at any corpus scale. Cells with no rows are NULL (count cells 0)."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), round_digits).alias("sum"))
    out = df.groupBy(group_col).pivot(pivot_col, pivot_values).agg(*aggs)
    # count cells: absent combination -> 0, not NULL (count semantics)
    for v in pivot_values:
        cnt_name = f"{v}_cnt" if value_col is not None else str(v)
        if cnt_name in out.columns:
            out = out.withColumn(
                cnt_name, F.coalesce(F.col(f"`{cnt_name}`"), F.lit(0))
            )
    return out


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    exact: bool = True,
    round_digits: int = 6,
    percentile_accuracy: int = 10_000,
) -> DataFrame:
    """Equi-depth (equal-count) histogram: bucket boundaries at the
    i/n_buckets exact interpolated percentiles, then one distributed
    groupBy over the bucket index — the data-skew-proof histogram
    (equal-WIDTH histograms collapse onto one bar under heavy tails).

    Two jobs: a 1-row boundary aggregate (exact `percentile`, the same
    type-7 definition as DuckDB's quantile_cont; ``exact=False`` swaps
    in the t-digest sketch for the 100 TB path) broadcast to the rows,
    then a bucket groupBy with map-side partial aggregation (≤ n_buckets
    rows shuffle). Ties land in the LOWER bucket (bucket = count of
    boundaries strictly below the value); NULLs are excluded."""
    probs = F.array(
        *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
    )
    src = df.filter(F.col(value_col).isNotNull())
    num = F.col(value_col).cast("double")
    if exact:
        bounds = src.agg(F.percentile(num, probs).alias("__bounds__"))
    else:
        plist = ", ".join(
            f"{i / n_buckets}D" for i in range(1, n_buckets)
        )
        bounds = src.agg(
            F.expr(
                f"transform(approx_percentile(CAST({value_col} AS DOUBLE), "
                f"array({plist}), {percentile_accuracy}), x -> CAST(x AS DOUBLE))"
            ).alias("__bounds__")
        )
    base = src.crossJoin(F.broadcast(bounds))
    bucket = F.size(F.filter(F.col("__bounds__"), lambda b: b < num))
    return (
        base.select(
            bucket.alias("bucket"),
            num.alias("__v__"),
            F.col("__bounds__"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("__v__"), round_digits).alias("min_value"),
            F.round(F.max("__v__"), round_digits).alias("max_value"),
            F.round(F.avg("__v__"), round_digits).alias("avg_value"),
            F.round(
                F.when(
                    F.col("bucket") > 0,
                    F.element_at(F.first("__bounds__"), F.col("bucket")),
                ),
                round_digits,
            ).alias("lo_bound"),
            F.round(
                F.when(
                    F.col("bucket") < n_buckets - 1,
                    F.element_at(F.first("__bounds__"), F.col("bucket") + 1),
                ),
                round_digits,
            ).alias("hi_bound"),
        )
    )


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot/melt — the inverse of [pivot_counts]: one wide row with N
    measure columns becomes N long rows (id columns, metric name, value).
    The reshaping step every per-metric profiler/plotter needs before a
    groupBy(metric) rollup.

    Built on Spark's native ``unpivot`` (an EXPAND node: each input row
    is emitted N times map-side — zero shuffle, zero UDFs, streams at
    scan speed at any scale). Values are cast to double up front so
    heterogeneous numeric measure columns share one value column, same
    as the ANSI UNION ALL formulation an oracle runs."""
    if not value_cols:
        raise ValueError("melt: value_cols must be non-empty")
    casted = df.select(
        *[F.col(c) for c in id_cols],
        *[F.col(c).cast("double").alias(c) for c in value_cols],
    )
    return casted.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def corr_matrix(
    df: DataFrame,
    cols: list[str],
    decimals: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation over ``cols`` in ONE scan — the
    numeric-relationship profile (feature redundancy, leakage screens)
    computed the engine-exact way: every input is scaled to an integer
    (``decimals``) and every sum (Σx, Σx², Σxy) is carried in
    decimal(38,0) — EXACT, so the correlation assembled from them is
    one fixed double expression with no float-summation drift (Spark's
    built-in ``corr`` and an oracle's differ in the last ulps; this
    never does). Scaling does not change Pearson r (affine invariance).

    Overflow budget: |x_int| ≤ 10⁸ ⇒ Σxy ≤ n·10¹⁶ — decimal(38,0)
    holds it to n ≈ 10²² rows.

    Execution shape: ONE map-side-combined global aggregate carrying
    2k + k(k−1)/2 sums (k = len(cols)), then a k²-sized literal
    projection — the scan dominates at any scale. Output: one row per
    unordered pair (col_a, col_b, n, corr); NULL corr for a
    zero-variance side. Rows with a NULL in ANY profiled column are
    excluded (pairwise-complete would need k² scans or null-tagged
    sums; listwise is the standard single-pass trade)."""
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    scale = 10 ** decimals
    base = df.na.drop(subset=cols).select(
        *[
            F.round(F.col(c) * scale)
            .cast("decimal(38,0)")
            .alias(f"__{c}__")
            for c in cols
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(f"__{c}__")).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(f"__{c}__") * F.col(f"__{c}__")).alias(f"ss_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(f"__{a}__") * F.col(f"__{b}__")).alias(
                    f"sp_{a}_{b}"
                )
            )
    g = base.agg(*aggs)

    # One projection over the 1-row aggregate: the pair rows come out of
    # a single explode(array(structs)) — a per-pair union of selects
    # would re-run the whole scan once per pair.
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            n = F.col("n").cast("decimal(38,0)")
            cov = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            var_a = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
            var_b = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
            corr = F.when(
                (var_a > 0) & (var_b > 0),
                F.round(
                    cov.cast("double")
                    / (
                        F.sqrt(var_a.cast("double"))
                        * F.sqrt(var_b.cast("double"))
                    ),
                    round_digits,
                ),
            )
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    return g.select(
        F.col("n").cast("bigint").alias("n"),
        F.explode(F.array(*pair_structs)).alias("__p__"),
    ).select(
        F.col("__p__.col_a").alias("col_a"),
        F.col("__p__.col_b").alias("col_b"),
        "n",
        F.col("__p__.corr").alias("corr"),
    )
