"""CLI entry point.

Mirrors the reference CLI (tnengine/TnEngine.scala:54-92 +
bin/TopNotchRunner.sh): ``--planPath`` (required), ``--planServerURL``,
``--reportKey`` (defaults to the plan filename), ``--haltIfPotentialErrors``,
``--variableDictionary k=v,...``. Exit codes: 0 success, 3 if any assertion
failed, 4 invalid arguments.
"""

from __future__ import annotations

import argparse
import sys

from topnotch_spark.engine import (
    ASSERTIONS_FAILED_EXIT_CODE,
    INVALID_ARGUMENTS_EXIT_CODE,
    SUCCESS_EXIT_CODE,
    TnEngine,
)
from topnotch_spark.session import get_spark


def parse_variable_dictionary(s: str) -> dict[str, str]:
    out: dict[str, str] = {}
    if not s:
        return out
    for pair in s.split(","):
        if "=" not in pair:
            raise ValueError(f"Bad variable assignment: {pair!r}")
        k, v = pair.split("=", 1)
        out[k.strip()] = v
    return out


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="topnotch-spark")
    parser.add_argument("-l", "--planPath", required=True)
    parser.add_argument("-s", "--planServerURL", default=None)
    parser.add_argument("-k", "--reportKey", default=None)
    parser.add_argument("-c", "--haltIfPotentialErrors", action="store_true")
    parser.add_argument("-d", "--variableDictionary", default="")
    try:
        args = parser.parse_args(argv)
        variables = parse_variable_dictionary(args.variableDictionary)
    except SystemExit:
        return INVALID_ARGUMENTS_EXIT_CODE
    except ValueError:
        return INVALID_ARGUMENTS_EXIT_CODE

    spark = get_spark("TopNotch")
    engine = TnEngine(spark)
    failed = engine.run(
        plan_path=args.planPath,
        plan_server_url=args.planServerURL,
        report_key=args.reportKey,
        halt_if_potential_errors=args.haltIfPotentialErrors,
        variables=variables,
    )
    return ASSERTIONS_FAILED_EXIT_CODE if failed > 0 else SUCCESS_EXIT_CODE


if __name__ == "__main__":
    sys.exit(main())
