"""Compatibility: the reference repo's own example plan parses and runs
on this engine unmodified (read in place from /root/reference — the only
change at execution time is redirecting the output path, because the
reference checkout is read-only).

Expected numbers derive from the example input (4 rows):
  rule "Ints > 1"        -> invalid = {Ints=1}            -> 1/4 = 0.25 > 0.01  FAIL
  rule "Booleans = true" -> invalid = {rows 1,3 (False)}  -> 2/4 = 0.50 > 0.10  FAIL
"""

from __future__ import annotations

import dataclasses
import os

import pytest

from topnotch_spark.engine import TnEngine
from topnotch_spark.plans.model import AssertionCmd
from topnotch_spark.plans.parser import parse_commands
from topnotch_spark.plans.readers import FileReader

REF_EXAMPLE = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLE), reason="reference checkout not present"
)


@pytest.fixture()
def parsed_cmd(spark):
    """Parse the reference plan exactly as the reference CLI would:
    externalParamsFile resolves relative to the plan file; the input path
    is CWD-relative, so parse from the reference root."""
    cwd = os.getcwd()
    os.chdir(os.path.dirname(REF_EXAMPLE))
    try:
        reader = FileReader()
        root = reader.read_configuration(f"{REF_EXAMPLE}/plan.json")
        cmds = parse_commands(root, reader, spark=spark)
    finally:
        os.chdir(cwd)
    return cmds


def test_reference_plan_parses(parsed_cmd):
    (cmd,) = parsed_cmd
    assert isinstance(cmd, AssertionCmd)
    assert cmd.output_key == "exampleAssertionReport"
    # externalParamsFile merged under params
    assert [r.query for r in cmd.rules] == ["Ints > 1", "Booleans = true"]
    assert [r.threshold for r in cmd.rules] == [0.01, 0.1]


def test_reference_plan_executes(spark, parsed_cmd, tmp_path):
    (cmd,) = parsed_cmd
    cmd = dataclasses.replace(
        cmd,
        input=dataclasses.replace(
            cmd.input, ref=f"{REF_EXAMPLE}/exampleAssertionInput.parquet"
        ),
        output_path=str(tmp_path / "out.parquet"),
    )
    engine = TnEngine(spark)
    num_failed = engine.run_command(cmd)
    assert num_failed == 2  # both rules exceed their thresholds

    invalid = engine.registry["exampleAssertionReport"]
    rows = {r["Ints"]: r["__REASON_INVALID__"] for r in invalid.collect()}
    assert rows == {
        1: "Ints must be greater than 1 &&& Booleans must be true",
        5: "Booleans must be true",
    }
    out = spark.read.parquet(str(tmp_path / "out.parquet"))
    assert out.count() == 2
