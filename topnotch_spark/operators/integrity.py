"""Cross-table referential-integrity checks.

The reference's assertion command validates rows against predicates on
ONE table (tnassertion/TnAssertionRunner.scala:49-68); real QC also asks
the cross-table question "does every child row point at a parent that
exists". This module answers it as a 1-row-per-relation summary that can
feed a plan assertion (``orphan_frac <= t``) — the FK complement to the
single-table rule surface, same spirit as operators/diff.py's
two-dataset compare.

Semantics:
- a NULL foreign key is NOT an orphan (SQL FK convention: NULL opts out
  of the constraint) — it is counted separately as ``n_null_fk`` so a
  quietly-nulling FK column is still visible;
- an orphan is a child row whose (fully non-null) FK tuple matches no
  parent PK tuple.

Execution shape per relation: ONE pass over the child — a left join of
the child's FK projection against the parent's distinct-PK projection
(Catalyst broadcasts the parent side when it is small; at 100 TB the
join shuffles on the key — unavoidable, and AQE handles skew) feeding a
single 1-row aggregate that counts rows, null FKs, and orphans
together; nothing driver-side. Each side of each relation is scanned
exactly once (the r7 shape — a separate totals aggregate + anti join —
scanned the child twice).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk: list[str],
    pk: list[str],
    relation: str,
) -> DataFrame:
    """1-row summary (relation, n_child, n_null_fk, n_orphans,
    orphan_frac) for one child→parent relation."""
    if len(fk) != len(pk) or not fk:
        raise ValueError("fk and pk must be non-empty and same length")
    fk_nn = reduce(
        lambda a, b: a & b, [F.col(p).isNotNull() for p in pk]
    )
    keyed = child.select(*[F.col(c).alias(p) for c, p in zip(fk, pk)])
    hits = parent.select(*pk).dropDuplicates(pk).withColumn(
        "__hit__", F.lit(1)
    )
    # NULL FK tuples never equi-match, so they land with __hit__ NULL and
    # are classified by fk_nn — one join + one aggregate covers all three
    # counts in a single child scan.
    joined = keyed.join(hits, pk, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.coalesce(
            F.sum(F.when(~fk_nn, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_null_fk"),
        F.coalesce(
            F.sum(F.when(fk_nn & F.col("__hit__").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("n_orphans"),
    ).select(
        F.lit(relation).alias("relation"),
        "n_child",
        "n_null_fk",
        "n_orphans",
        F.round(
            F.when(
                F.col("n_child") > 0, F.col("n_orphans") / F.col("n_child")
            ),
            6,
        ).alias("orphan_frac"),
    )


def referential_integrity_suite(
    relations: list[tuple[str, DataFrame, list[str], DataFrame, list[str]]],
) -> DataFrame:
    """Union of ``referential_integrity`` summaries: one row per
    (name, child, fk, parent, pk) relation, in input order by name."""
    out = None
    for name, child, fk, parent, pk in relations:
        one = referential_integrity(child, parent, fk, pk, name)
        out = one if out is None else out.unionByName(one)
    if out is None:
        raise ValueError("relations must be non-empty")
    return out


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    risky_only: bool = True,
) -> DataFrame:
    """K-anonymity audit over quasi-identifier columns — the privacy QC
    gate for training-data release: a combination of quasi-identifiers
    shared by fewer than ``k`` rows re-identifies those rows.

    Returns one row per quasi-identifier combination: the quasi columns,
    ``group_size``, and ``meets_k``; with ``risky_only`` (default) only
    the violating groups (< k) are returned — at corpus scale the
    compliant groups are the bulk of the output and carry no action.
    NULL is treated as a value (SQL GROUP BY semantics): an all-NULL
    quasi tuple of size 1 is still re-identifiable.

    Execution shape: ONE map-side-combined groupBy on the quasi columns
    + a filter — scan-bound; the result is at most one row per distinct
    quasi tuple and the risky subset is usually tiny.
    """
    if k < 1:
        raise ValueError(f"k_anonymity: k must be >= 1, got {k}")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    out = g.select(
        *quasi_cols,
        "group_size",
        (F.col("group_size") >= k).alias("meets_k"),
    )
    return out.filter(~F.col("meets_k")) if risky_only else out


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    risky_only: bool = True,
) -> DataFrame:
    """L-diversity audit — the companion gate to [k_anonymity]: a
    quasi-identifier group can satisfy k-anonymity yet still leak the
    sensitive attribute if every row in the group SHARES it (homogeneity
    attack). A group is l-diverse when its rows span at least ``l``
    distinct sensitive values.

    Returns one row per quasi-identifier combination: the quasi columns,
    ``group_size``, ``distinct_sensitive``, ``meets_l``; with
    ``risky_only`` (default) only the violating groups. NULL sensitive
    values count as one distinct value of their own (a group that is
    all-NULL still exposes "the attribute is unknown for these people"
    — distinct_sensitive counts it, matching COUNT(DISTINCT) over a
    NULL-coalesced sentinel, not SQL's null-dropping COUNT(DISTINCT)).

    Execution shape: ONE groupBy on the quasi columns with a
    count-distinct over the sensitive column — Spark plans this as a
    two-phase expand/aggregate with partial aggregation; output is at
    most one row per distinct quasi tuple. Scan-bound at any scale.
    """
    if l < 1:
        raise ValueError(f"l_diversity: l must be >= 1, got {l}")
    sens = F.coalesce(
        F.col(sensitive_col).cast("string"), F.lit("__NULL__")
    )
    g = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct(sens).alias("distinct_sensitive"),
    )
    out = g.select(
        *quasi_cols,
        "group_size",
        "distinct_sensitive",
        (F.col("distinct_sensitive") >= l).alias("meets_l"),
    )
    return out.filter(~F.col("meets_l")) if risky_only else out
