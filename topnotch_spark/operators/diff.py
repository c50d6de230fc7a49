"""Diff operator: keyed two-dataset comparison.

Semantics rebuilt from the reference (tndiff/TnDiffCreator.scala,
tndiff/TnDiffCmd.scala — SURVEY.md §2.1 O12-O16):

- Both inputs' join+diff columns are renamed ``<name>_<col>`` (dots in
  nested paths become underscores, :106-112), then FULL OUTER joined on the
  pairwise equality of the zipped join columns (:34-40).
- For each diff pair, the output carries both value columns plus a status
  column ``<a>__equals__<b>`` ∈ {both null, only first null, only second
  null, different types, equal, both not null, same type, not equal}
  (:123-160, constants :192-199). Numeric pairs of the SAME type are equal
  iff ``abs(a-b) <= ε``; any type mismatch (incl. mixed numerics) is
  ``different types``, decided after null checks (:129-132).
- Numeric×numeric pairs additionally get ``<a>__minus__<b>`` = ``a-b`` when
  ``abs(a-b) >= ε``, else 0 cast to the left type; null when either side is
  null (:151-157). Mixed numeric types still get a minus column even though
  their status is ``different types`` (test :274-275).
- ``filter_equal_rows`` drops rows where every pair is equal:
  keep iff any pair has ``NOT(a <=> b)`` (non-numeric) or ``NOT(a <=> b) OR
  (both not null AND abs(a-b) >= ε)`` (numeric) (:165-184).
- ``thresholds[i]`` overrides the command threshold per pair; default 1e-6
  (TnDiffCmd.scala:6).
- Zero diff columns ⇒ join-column projection limited to 0 rows (:67).
- Validation: equal-length non-empty join lists, equal-length diff lists,
  unique non-null join keys per side (:74-96).

Scale design: the reference burns 4 full-scan actions on validation
(2× dropDuplicates().count + 2× null count, then join). We fuse each side's
validation into ONE aggregation job (count, countDistinct over key struct,
null-key count in a single pass) — BASELINE.md's actions-per-diff target.
The join itself is a plain equi-join on the key columns, so Catalyst/AQE
pick broadcast/sort-merge and handle skew.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, NumericType, StructField

DEFAULT_DIFF_THRESHOLD = 1e-6

# Status strings — exact values from the reference (TnDiffCreator.scala:192-199)
BOTH_NULL = "both null"
FIRST_NULL = "only first null"
SECOND_NULL = "only second null"
DIFF_TYPES = "different types"
EQUAL = "equal"
NOT_EQUAL = "both not null, same type, not equal"
COL_JOIN = "_"


def equality_col_name(a: str, b: str) -> str:
    return f"{a}__equals__{b}"


def minus_col_name(a: str, b: str) -> str:
    return f"{a}__minus__{b}"


@dataclass(frozen=True)
class DiffSide:
    """Join/diff column lists for one input (tndiff/TnDiffCmd.scala:56-62)."""

    join_columns: tuple[str, ...]
    diff_columns: tuple[str, ...]

    @classmethod
    def from_json(cls, obj: dict) -> "DiffSide":
        return cls(tuple(obj["joinColumns"]), tuple(obj.get("diffColumns", [])))


@dataclass(frozen=True)
class DiffParams:
    input1_columns: DiffSide
    input2_columns: DiffSide
    thresholds: tuple[float, ...] | None = None

    @classmethod
    def from_json(cls, obj: dict) -> "DiffParams":
        th = obj.get("thresholds")
        return cls(
            DiffSide.from_json(obj["input1Columns"]),
            DiffSide.from_json(obj["input2Columns"]),
            tuple(float(t) for t in th) if th else None,
        )


def _prefixed(name: str, table: str) -> str:
    # dots in nested paths flattened to underscores (reference :109)
    return f"{table}{COL_JOIN}{name.replace('.', '_')}"


def _rename_select(df: DataFrame, side: DiffSide, table: str) -> DataFrame:
    cols = [
        F.col(c).alias(_prefixed(c, table))
        for c in list(side.join_columns) + list(side.diff_columns)
    ]
    return df.select(*cols)


def _validate_side(df: DataFrame, side: DiffSide, name: str) -> None:
    """Key uniqueness + no-null keys in ONE aggregation pass
    (reference does 3 full scans per side, :84-95)."""
    keys = list(side.join_columns)
    null_pred = None
    for k in keys:
        p = F.col(k).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.struct(*[F.col(k) for k in keys])).alias("nd"),
        F.sum(F.when(null_pred, 1).otherwise(0)).alias("nn"),
    ).collect()[0]
    if int(row["nn"] or 0) > 0:
        raise ValueError(f"The join columns for table {name} contain nulls.")
    # count_distinct skips all-null tuples, but we've already established
    # there are none, so nd == n ⟺ keys unique.
    if int(row["nd"]) != int(row["n"]):
        raise ValueError(
            f"The join columns for table {name} do not provide a unique key for every row."
        )


def _diff_pair_cols(
    c1: str, f1: StructField, c2: str, f2: StructField, eps: float
) -> list[Column]:
    """Status (+ minus) columns for one diff pair (reference :123-160)."""
    col1, col2 = F.col(c1), F.col(c2)
    t1: DataType = f1.dataType
    t2: DataType = f2.dataType

    null_check = (
        F.when(col1.isNull() & col2.isNull(), BOTH_NULL)
        .when(col1.isNull(), FIRST_NULL)
        .when(col2.isNull(), SECOND_NULL)
    )
    if t1 != t2:
        status = null_check.otherwise(DIFF_TYPES)
    elif isinstance(t1, NumericType):
        status = null_check.otherwise(
            F.when(F.abs(col1 - col2) <= F.lit(eps), EQUAL).otherwise(NOT_EQUAL)
        )
    else:
        status = null_check.when(col1 == col2, EQUAL).otherwise(NOT_EQUAL)
    status = status.alias(equality_col_name(c1, c2))

    if isinstance(t1, NumericType) and isinstance(t2, NumericType):
        minus = (
            F.when(
                col1.isNotNull() & col2.isNotNull(),
                F.when(F.abs(col1 - col2) >= F.lit(eps), col1 - col2).otherwise(
                    F.lit(0).cast(t1)
                ),
            )
            .otherwise(F.lit(None))
            .alias(minus_col_name(c1, c2))
        )
        return [minus, status]
    return [status]


def _keep_row_pred(
    pairs: list[tuple[str, str]],
    types: dict[str, DataType],
    thresholds: list[float],
) -> Column:
    """Predicate keeping rows where ≥1 pair differs (reference :165-184)."""
    pred: Column | None = None
    for (c1, c2), eps in zip(pairs, thresholds):
        col1, col2 = F.col(c1), F.col(c2)
        if isinstance(types[c1], NumericType) and isinstance(types[c2], NumericType):
            p = (~col1.eqNullSafe(col2)) | (
                col1.isNotNull() & col2.isNotNull() & (F.abs(col1 - col2) >= F.lit(eps))
            )
        else:
            p = ~col1.eqNullSafe(col2)
        pred = p if pred is None else (pred | p)
    return pred


def create_diff(
    df1: DataFrame,
    name1: str,
    df2: DataFrame,
    name2: str,
    params: DiffParams,
    numeric_threshold: float = DEFAULT_DIFF_THRESHOLD,
    filter_equal_rows: bool = False,
    validate: bool = True,
) -> DataFrame:
    """Keyed diff of two DataFrames (reference: TnDiffCreator.scala:23-69)."""
    s1, s2 = params.input1_columns, params.input2_columns
    if len(s1.join_columns) != len(s2.join_columns):
        raise ValueError("joinColumns must be of the same length for both data sets")
    if len(s1.diff_columns) != len(s2.diff_columns):
        raise ValueError("diffColumns must be of the same length for both data sets")
    if len(s1.join_columns) == 0:
        raise ValueError(
            "There must be columns to join on. joinColumns is empty for both data sets."
        )
    if validate:
        _validate_side(df1, s1, name1)
        _validate_side(df2, s2, name2)

    r1 = _rename_select(df1, s1, name1)
    r2 = _rename_select(df2, s2, name2)

    jcols1 = [_prefixed(c, name1) for c in s1.join_columns]
    jcols2 = [_prefixed(c, name2) for c in s2.join_columns]
    cond: Column | None = None
    for a, b in zip(jcols1, jcols2):
        p = r1[a] == r2[b]
        cond = p if cond is None else (cond & p)
    joined = r1.join(r2, cond, "outer")

    if not s1.diff_columns:
        return joined.select(*jcols1, *jcols2).limit(0)

    thresholds = (
        list(params.thresholds)
        if params.thresholds
        else [numeric_threshold] * len(s1.diff_columns)
    )
    dcols1 = [_prefixed(c, name1) for c in s1.diff_columns]
    dcols2 = [_prefixed(c, name2) for c in s2.diff_columns]
    fields = {f.name: f for f in joined.schema.fields}

    out_cols: list[Column] = [F.col(c) for c in jcols1 + jcols2]
    for c1, c2, eps in zip(dcols1, dcols2, thresholds):
        out_cols.append(F.col(c1))
        out_cols.append(F.col(c2))
        out_cols.extend(_diff_pair_cols(c1, fields[c1], c2, fields[c2], eps))
    result = joined.select(*out_cols)

    if filter_equal_rows:
        types = {f.name: f.dataType for f in result.schema.fields}
        result = result.where(
            _keep_row_pred(list(zip(dcols1, dcols2)), types, thresholds)
        )
    return result


def schema_diff(df1, df2, name1: str = "first", name2: str = "second"):
    """Schema-level compare (the metadata complement to the row-level
    diff): one row per column that exists in either frame, with its type
    on each side and a status — 'added' (only second), 'removed' (only
    first), 'type_changed', or 'same'. Case-insensitive names, like the
    row diff's column matching. Pure driver-side metadata (schemas are
    already local); the result is a tiny createDataFrame, no jobs run.

    The standard pre-flight for pipeline upgrades: run schema_diff
    before a row diff so a renamed/retyped column is reported as such
    instead of surfacing as a million spurious row mismatches."""
    s1 = {f.name.lower(): f.dataType.simpleString() for f in df1.schema.fields}
    s2 = {f.name.lower(): f.dataType.simpleString() for f in df2.schema.fields}
    rows = []
    for col in sorted(s1.keys() | s2.keys()):
        t1, t2 = s1.get(col), s2.get(col)
        if t1 is None:
            status = "added"
        elif t2 is None:
            status = "removed"
        elif t1 != t2:
            status = "type_changed"
        else:
            status = "same"
        rows.append((col, status, t1, t2))
    spark = df1.sparkSession
    return spark.createDataFrame(
        rows,
        f"column string, status string, type_{name1} string, "
        f"type_{name2} string",
    )
