"""Golden-report parity: serialize AssertionReport objects built to match
the reference's TnAssertionReportTest.scala:30-112 cases and compare
against the reference's own golden JSON fixtures, read IN PLACE
(read-only) from /root/reference — the same pattern as
test_reference_example.py. Comparison is parsed-JSON equality (byte-level
modulo key order), which pins the column-harvest edge cases the regex
harvester must match Hive's parser on.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row

from topnotch_spark.operators.assertions import (
    AssertionReport,
    SampleWindowParams,
    SampleWindowReport,
)
from topnotch_spark.reports.model import (
    assertion_report_to_json,
    harvest_identifiers,
    report_columns,
)

GOLDEN_DIR = "/root/reference/src/test/resources/com/bfm/topnotch/tnassertion"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference repo not present"
)


def golden(name: str) -> dict:
    with open(os.path.join(GOLDEN_DIR, name), encoding="utf-8") as f:
        return json.load(f)


def _report(query, sample_rows, *, windows=None, window_params=None,
            summary=None, features=()):
    """Mirror the Scala test's TnAssertionReport(query, "Description",
    0.1|0.5, 2.0, 0, failureDF, ...) constructor calls."""
    wr = None
    if windows is not None:
        wr = SampleWindowReport(window_params, windows)
    return AssertionReport(
        query=query,
        description="Description",
        threshold=0.5 if windows is not None else 0.1,
        fraction_invalid=2.0,
        num_invalid=0,
        sample_invalid=sample_rows,
        sample_window_report=wr,
        user_summary_statistics=summary or {},
        user_defined_features=tuple(features),
    )


# failureDF analogs of the reference's sampleWithValuesDF selections
INTS_1 = [Row(Ints=1)]
INTS_LT4 = [Row(Ints=1), Row(Ints=3)]


def test_no_bad_rows(spark):
    rep = _report("Ints != -7", [])
    assert assertion_report_to_json(rep, spark) == golden("TnReportNoBadRows.json")


def test_one_bad_row(spark):
    rep = _report("Ints = 1", INTS_1)
    assert assertion_report_to_json(rep, spark) == golden("TnReportOneBadRow.json")


def test_case_insensitive_column_names(spark):
    rep = _report("iNTs = 1", INTS_1)
    assert assertion_report_to_json(rep, spark) == golden(
        "TnReportOneBadRowWeirdCasing.json"
    )


def test_two_bad_rows(spark):
    rep = _report("Ints < 4", INTS_LT4)
    assert assertion_report_to_json(rep, spark) == golden("TnReportTwoBadRows.json")


def test_two_part_where(spark):
    rows = [Row(Ints=1, Strings="Failure1"), Row(Ints=3, Strings="Failure2")]
    rep = _report('Ints < 4 and Strings like "Failure%"', rows)
    assert assertion_report_to_json(rep, spark) == golden("TnReportTwoPartWhere.json")


def test_user_defined_summary_statistics(spark):
    rep = _report("Ints < 4", INTS_LT4, summary={"intAvg": 2})
    assert assertion_report_to_json(rep, spark) == golden(
        "TnReportUserDefinedSummaryStatistics.json"
    )


def test_user_defined_features_in_sample(spark):
    rows = [Row(Ints=1, intsMinus1=0), Row(Ints=3, intsMinus1=2)]
    rep = _report("Ints < 4", rows, features=("intsMinus1",))
    assert assertion_report_to_json(rep, spark) == golden(
        "TnReportUserDefinedFeatures.json"
    )


def test_window_one_column(spark):
    # windowsDF.filter("Success = false").orderBy("Order1")
    #          .select("Window1", "Order1", "Success")
    wrows = [
        Row(Window1=1, Order1=2.0, Success=False),
        Row(Window1=1, Order1=4.0, Success=False),
        Row(Window1=1, Order1=6.0, Success=False),
    ]
    rep = _report(
        "Success = true",
        wrows,
        windows=[wrows, wrows, wrows],
        window_params=SampleWindowParams(("Window1",), ("Order1",)),
    )
    assert assertion_report_to_json(rep, spark) == golden(
        "TnReportWindowOneColumn.json"
    )


def test_window_only_some_order_columns(spark):
    # sampleWithWindowsDF rows with Success=false, ordered by Order1:
    # Order1 2.0 carries NotForOrdering 3, 4.0 -> 1, 6.0 -> 2
    wrows = [
        Row(Window1=1, NotForOrdering=3, Order1=2.0, Success=False),
        Row(Window1=1, NotForOrdering=1, Order1=4.0, Success=False),
        Row(Window1=1, NotForOrdering=2, Order1=6.0, Success=False),
    ]
    rep = _report(
        "Success = true and NotForOrdering <= 0",
        wrows,
        windows=[wrows, wrows, wrows],
        window_params=SampleWindowParams(("Window1",), ("Order1",)),
    )
    assert assertion_report_to_json(rep, spark) == golden(
        "TnReportWindowOnlySomeOrderColumns.json"
    )


# ---- harvester edge cases the goldens don't cover ------------------------


def test_backquoted_identifier_kept_whole(spark):
    """Hive treats `weird col` as one token; the regex harvester must not
    split it on whitespace (divergence flagged in round 1)."""
    assert "weird col" in harvest_identifiers("`weird col` = 1")
    rep = _report("`weird col` = 1", [Row(**{"weird col": 1, "other": 2})])
    out = assertion_report_to_json(rep, spark)
    assert out["sampleInvalid"] == [{"weird col": 1}]


def test_dotted_path_contributes_both_parts(spark):
    """struct1.int: the reference's AST walk yields the table token
    (struct1); over-broad harvesting plus sample-column intersection gives
    the same net columns for flat samples named after either part."""
    ids = harvest_identifiers("struct1.int > 0")
    assert "struct1" in ids and "int" in ids
    rep = _report("struct1.int > 0", [Row(struct1=Row(int=1), unrelated=9)])
    out = assertion_report_to_json(rep, spark)
    assert out["sampleInvalid"] == [{"struct1": {"int": 1}}]


def test_unparsable_query_yields_no_columns(spark):
    rep = _report("this is ~~ not sql", [Row(Ints=1)])
    out = assertion_report_to_json(rep, spark)
    assert out["sampleInvalid"] == [{}]
