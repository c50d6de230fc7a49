"""Assertion operator: rule-based validity checks over a DataFrame.

Semantics rebuilt from the reference (tnassertion/TnAssertionRunner.scala,
tnassertion/TnAssertionCmd.scala — see SURVEY.md §2.1 O8-O11):

- A rule is a SQL predicate (``query``) naming the VALID rows, plus a
  ``description`` and a failure ``threshold`` (max tolerated fraction of
  invalid rows).
- Per rule: optional ``user_defined_features`` (name → scalar SQL expr,
  projected BEFORE the filter so a query may reference its own features,
  reference :50-55), optional ``user_defined_summary_expr`` (name →
  aggregate SQL expr computed over the invalid rows), optional window
  context for the sampled invalid rows.
- ``fraction_invalid = num_invalid / total`` (0 on empty input, :65);
  rule fails iff ``fraction_invalid > threshold`` (:37-38).
- Invalid-rows output: one pass over all rules, each contributing
  ``when(query, null).otherwise(description)``, merged with
  ``concat_ws(" &&& ")`` into ``__REASON_INVALID__`` and filtered non-empty
  (:120-137). Features accumulate across rules in order, so rule *i* may
  use features declared by earlier rules (:121-133).
- Sample of ≤20 invalid rows per rule (SAMPLE_NUM, :145).

Scale design (the reference's shape is its hot spot, BASELINE.md):
- The reference runs 1 + N count jobs per command. We fuse the total count,
  every rule's invalid count, AND every rule's summary statistics into ONE
  aggregation job using conditional aggregation / SQL ``FILTER (WHERE …)``
  — map-side partial aggregation, no shuffle beyond a single 1-row
  reduce. Falls back to per-rule jobs only if a user summary expression
  can't accept a FILTER clause (multi-aggregate arithmetic), or if a
  feature name is defined differently by two rules / shadows an input
  column (fusing would change which definition a rule sees — per-rule
  metrics use input + ONLY that rule's own features, checkAssertion
  :50-55, while the invalid-row union applies features cumulatively,
  :121-133).
- Sample windows are computed with a broadcast semi-join (≤20 key rows)
  instead of the reference's collect-the-world join (:95). Only rows
  belonging to sampled windows ever reach the driver.

Null semantics preserved exactly: the invalid COUNT uses
``NOT(query)`` (a NULL predicate row counts as valid, :55-56) while the
invalid-row OUTPUT uses ``when(query, null).otherwise(desc)`` (a NULL
predicate row is tagged invalid, :131). The reference is inconsistent here
and we faithfully reproduce both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

SAMPLE_NUM = 20
INVALID_COL_NAME = "__REASON_INVALID__"
REASON_JOINER = " &&& "


@dataclass(frozen=True)
class SampleWindowParams:
    """Partition/order spec for invalid-sample context windows
    (reference: tnassertion/TnAssertionCmd.scala:52-55)."""

    ids_for_window_partitioning: tuple[str, ...]
    order_each_window_by: tuple[str, ...]

    @classmethod
    def from_json(cls, obj: dict) -> "SampleWindowParams":
        return cls(
            tuple(obj.get("idsForWindowPartitioning", [])),
            tuple(obj.get("orderEachWindowBy", [])),
        )


@dataclass(frozen=True)
class AssertionRule:
    """One assertion (reference: tnassertion/TnAssertionCmd.scala:40-47)."""

    query: str
    description: str
    threshold: float
    user_defined_summary_expr: dict[str, str] | None = None
    user_defined_features: dict[str, str] | None = None
    sample_window_params: SampleWindowParams | None = None

    @classmethod
    def from_json(cls, obj: dict) -> "AssertionRule":
        swp = obj.get("sampleWindowParams")
        return cls(
            query=obj["query"],
            description=obj["description"],
            threshold=float(obj["threshold"]),
            user_defined_summary_expr=obj.get("userDefinedSummaryExpr"),
            user_defined_features=obj.get("userDefinedFeatures"),
            sample_window_params=SampleWindowParams.from_json(swp) if swp else None,
        )


@dataclass
class SampleWindowReport:
    params: SampleWindowParams
    # windows[i] = ordered list of Rows forming the context window of the
    # i-th sampled invalid row (reference pairing contract,
    # TnAssertionReport.scala:51-54).
    windows: list[list[Row]]


@dataclass
class AssertionReport:
    query: str
    description: str
    threshold: float
    fraction_invalid: float
    num_invalid: int
    sample_invalid: list[Row] = field(default_factory=list)
    sample_window_report: SampleWindowReport | None = None
    user_summary_statistics: dict[str, Any] = field(default_factory=dict)
    user_defined_features: tuple[str, ...] = ()

    @property
    def failed(self) -> bool:
        return self.fraction_invalid > self.threshold


@dataclass
class AssertionResult:
    df: DataFrame  # invalid rows + __REASON_INVALID__
    num_failed: int
    reports: list[AssertionReport]


def _feature_exprs(features: dict[str, str] | None) -> list[str]:
    # "expr as name" — reference nameExprPairToSelectExpr (:158)
    return [f"{expr} as {name}" for name, expr in (features or {}).items()]


def _featured_frames(input_df: DataFrame, rules: list[AssertionRule]) -> list[DataFrame]:
    """frames[i] = input with features of rules 0..i applied cumulatively.

    Mirrors the reference's fold in identifyInvalidRows (:121-133): rule i's
    query may reference features of any earlier rule plus its own. This
    cumulative view applies ONLY to the invalid-row output — per-rule
    metrics use :func:`_own_frame` (reference checkAssertion :50-55).
    """
    frames: list[DataFrame] = []
    df = input_df
    for rule in rules:
        feats = _feature_exprs(rule.user_defined_features)
        if feats:
            df = df.selectExpr("*", *feats)
        frames.append(df)
    return frames


def _own_frame(input_df: DataFrame, rule: AssertionRule) -> DataFrame:
    """Input plus ONLY this rule's features — the frame checkAssertion
    evaluates a rule's count/summary/samples against (reference
    TnAssertionRunner.scala:50-55). A query referencing another rule's
    feature fails analysis here, exactly as it does in the reference."""
    feats = _feature_exprs(rule.user_defined_features)
    return input_df.selectExpr("*", *feats) if feats else input_df


def identify_invalid_rows(input_df: DataFrame, rules: list[AssertionRule]) -> DataFrame:
    """One-pass union of invalid rows with all their failure reasons
    (reference: tnassertion/TnAssertionRunner.scala:120-137)."""
    frames = _featured_frames(input_df, rules)
    reason_cols: list[Column] = [
        F.when(F.expr(rule.query), F.lit(None)).otherwise(F.lit(rule.description))
        for rule in rules
    ]
    final_df = frames[-1] if frames else input_df
    return final_df.withColumn(
        INVALID_COL_NAME, F.concat_ws(REASON_JOINER, *reason_cols)
    ).filter(F.col(INVALID_COL_NAME) != "")


# Aggregates that safely accept a trailing FILTER (WHERE ...) clause when the
# user summary expression is a single top-level call. Anything else (e.g.
# `max(a) - min(b)`) would bind FILTER to the last call only — silently wrong —
# so those fall back to a dedicated per-rule job.
_FUSABLE_AGGS = {
    "max", "min", "avg", "mean", "sum", "count", "count_if", "stddev",
    "stddev_pop", "stddev_samp", "variance", "var_pop", "var_samp",
    "approx_count_distinct", "percentile_approx", "percentile", "median",
    "first", "last", "any_value", "skewness", "kurtosis", "corr",
    "covar_pop", "covar_samp", "bool_and", "bool_or", "collect_set",
}

_SINGLE_AGG_RE = None


def _is_single_agg_call(expr: str) -> bool:
    """True iff ``expr`` is one call of a known aggregate, e.g. ``max(a+b)``
    or ``avg(length(s))`` — the shapes that can take a FILTER clause."""
    import re

    global _SINGLE_AGG_RE
    if _SINGLE_AGG_RE is None:
        _SINGLE_AGG_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*$", re.S)
    m = _SINGLE_AGG_RE.match(expr)
    if not m or m.group(1).lower() not in _FUSABLE_AGGS:
        return False
    # the parens matched must enclose the whole tail: reject `max(a) - min(b)`
    depth = 0
    body = m.group(2)
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0


def _per_rule_metrics(
    input_df: DataFrame, own_frames: list[DataFrame], rules: list[AssertionRule]
) -> tuple[int, list[int], list[dict[str, Any] | None]]:
    """Reference-shaped 1 + N jobs, used when fusing is unsound (a feature
    name is defined differently by two rules, or shadows an input column):
    one total count plus one aggregation per rule over input + that rule's
    own features. Each rule's invalid count and fusable summary stats still
    share the rule's single job."""
    total = input_df.count()
    invalid_counts: list[int] = []
    summaries: list[dict[str, Any] | None] = []
    for i, rule in enumerate(rules):
        invalid_pred = f"NOT({rule.query})"
        aggs: list[Column] = [
            F.sum(F.when(F.expr(invalid_pred), 1).otherwise(0)).alias("__inv__")
        ]
        fused = True
        if rule.user_defined_summary_expr:
            rule_aggs: list[Column] = []
            try:
                for name, expr in rule.user_defined_summary_expr.items():
                    if not _is_single_agg_call(expr):
                        raise ValueError("not a single aggregate call")
                    rule_aggs.append(
                        F.expr(f"{expr} FILTER (WHERE {invalid_pred})").alias(
                            f"__sum__{name}"
                        )
                    )
            except Exception:
                fused = False
            if fused:
                aggs.extend(rule_aggs)
        row = own_frames[i].agg(*aggs).collect()[0]
        invalid_counts.append(int(row["__inv__"] or 0))
        if not rule.user_defined_summary_expr:
            summaries.append({})
        elif fused:
            summaries.append(
                {name: row[f"__sum__{name}"] for name in rule.user_defined_summary_expr}
            )
        else:
            summaries.append(None)
    return total, invalid_counts, summaries


def _fused_metrics(
    input_df: DataFrame, own_frames: list[DataFrame], rules: list[AssertionRule]
) -> tuple[int, list[int], list[dict[str, Any] | None]]:
    """ONE aggregation job: total count + per-rule invalid counts + per-rule
    summary stats (vs the reference's 1 + N + N jobs).

    Per-rule semantics are the reference's checkAssertion (:50-55): each
    rule sees input + ONLY its own features. Fusing evaluates every rule
    against one frame holding the union of all rules' features applied to
    the input, which is equivalent exactly when feature names are globally
    unique and shadow no input column — otherwise this falls back to
    :func:`_per_rule_metrics` (reference 1 + N shape) so each rule sees its
    own definition.

    Returns (total, invalid_counts, summaries) where summaries[i] is None if
    rule i's summary stats could not be fused (computed separately later).
    """
    input_cols = {c.lower() for c in input_df.columns}
    all_feats: dict[str, str] = {}  # lowercase name -> expr, insertion order
    for rule in rules:
        for name, expr in (rule.user_defined_features or {}).items():
            ln = name.lower()
            if ln in input_cols or all_feats.get(ln, expr) != expr:
                return _per_rule_metrics(input_df, own_frames, rules)
            all_feats.setdefault(ln, expr)
    final_df = (
        input_df.selectExpr(
            "*", *[f"{e} as {n}" for n, e in all_feats.items()]
        )
        if all_feats
        else input_df
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total__")]
    fused_summary: list[bool] = []
    for i, rule in enumerate(rules):
        invalid_pred = f"NOT({rule.query})"
        aggs.append(
            F.sum(F.when(F.expr(invalid_pred), 1).otherwise(0)).alias(f"__inv_{i}__")
        )
        ok = True
        if rule.user_defined_summary_expr:
            rule_aggs: list[Column] = []
            try:
                for name, expr in rule.user_defined_summary_expr.items():
                    if not _is_single_agg_call(expr):
                        raise ValueError("not a single aggregate call")
                    rule_aggs.append(
                        F.expr(f"{expr} FILTER (WHERE {invalid_pred})").alias(
                            f"__sum_{i}__{name}"
                        )
                    )
            except Exception:
                ok = False
            if ok:
                aggs.extend(rule_aggs)
        fused_summary.append(ok)
    row = final_df.agg(*aggs).collect()[0]
    total = row["__total__"] or 0
    invalid_counts = [int(row[f"__inv_{i}__"] or 0) for i in range(len(rules))]
    summaries: list[dict[str, Any] | None] = []
    for i, rule in enumerate(rules):
        if not rule.user_defined_summary_expr:
            summaries.append({})
        elif fused_summary[i]:
            summaries.append(
                {name: row[f"__sum_{i}__{name}"] for name in rule.user_defined_summary_expr}
            )
        else:
            summaries.append(None)
    return total, invalid_counts, summaries


def _sample_windows(
    sample_rows: list[Row],
    all_df: DataFrame,
    params: SampleWindowParams | None,
) -> SampleWindowReport | None:
    """Context windows for sampled invalid rows (reference :83-110).

    Scale rewrite: the ≤20 distinct partition keys are broadcast-joined
    against the full data, sorted distributedly, and only the matching
    window rows are collected — never the whole input (the reference
    collects the entire join, :95 — BASELINE.md flags this).
    """
    if params is None:
        return None
    keys = list(params.ids_for_window_partitioning)
    order = list(params.order_each_window_by)
    if not keys or not order:
        return None
    if not sample_rows:
        return SampleWindowReport(params, [])

    spark = all_df.sparkSession
    lower_map = {c.lower(): c for c in sample_rows[0].asDict()}
    key_tuples = [tuple(r[lower_map[k.lower()]] for k in keys) for r in sample_rows]
    distinct_keys = list(dict.fromkeys(key_tuples))
    keys_df = spark.createDataFrame(
        distinct_keys, schema=all_df.select(*keys).schema
    )
    window_rows = (
        all_df.join(F.broadcast(keys_df), on=keys, how="inner")
        .orderBy(*[F.col(c) for c in keys + order])
        .collect()
    )
    by_key: dict[tuple, list[Row]] = {}
    if window_rows:
        row_lower = {c.lower(): c for c in window_rows[0].asDict()}
        for r in window_rows:
            by_key.setdefault(tuple(r[row_lower[k.lower()]] for k in keys), []).append(r)
    # i-th window corresponds to the i-th sample (reference pairing contract)
    return SampleWindowReport(params, [by_key.get(kt, []) for kt in key_tuples])


def run_assertions(
    input_df: DataFrame,
    report_key: str,
    rules: list[AssertionRule],
    with_samples: bool = True,
) -> AssertionResult:
    """Run all rules; return invalid-row DF, failed-rule count and reports
    (reference: tnassertion/TnAssertionRunner.scala:32-39)."""
    if not rules:
        return AssertionResult(identify_invalid_rows(input_df, []), 0, [])

    own_frames = [_own_frame(input_df, rule) for rule in rules]
    # Build the per-rule filters eagerly: analysis runs now (no job), so a
    # query referencing another rule's feature raises here — matching the
    # reference's checkAssertion crash — even when with_samples=False.
    invalid_dfs = [
        own_frames[i].filter(f"NOT({rule.query})") for i, rule in enumerate(rules)
    ]
    total, invalid_counts, summaries = _fused_metrics(input_df, own_frames, rules)

    reports: list[AssertionReport] = []
    for i, rule in enumerate(rules):
        invalid_df = invalid_dfs[i]
        summary = summaries[i]
        if summary is None:  # non-fusable summary exprs: dedicated job
            srow = invalid_df.selectExpr(
                *[f"{e} as {n}" for n, e in rule.user_defined_summary_expr.items()]
            ).collect()[0]
            summary = srow.asDict()
        sample_rows: list[Row] = []
        window_report = None
        if with_samples:
            sample_rows = invalid_df.limit(SAMPLE_NUM).collect()
            # windows come from the ORIGINAL input, without features
            # (reference getSampleWindows(invalidSamplesDF, df, ...) :66)
            window_report = _sample_windows(
                sample_rows, input_df, rule.sample_window_params
            )
        fraction = (invalid_counts[i] / total) if total > 0 else 0.0
        reports.append(
            AssertionReport(
                query=rule.query,
                description=rule.description,
                threshold=rule.threshold,
                fraction_invalid=fraction,
                num_invalid=invalid_counts[i],
                sample_invalid=sample_rows,
                sample_window_report=window_report,
                user_summary_statistics=summary,
                user_defined_features=tuple((rule.user_defined_features or {}).keys()),
            )
        )

    num_failed = sum(1 for r in reports if r.failed)
    return AssertionResult(identify_invalid_rows(input_df, rules), num_failed, reports)
