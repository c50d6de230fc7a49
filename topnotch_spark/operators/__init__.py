from topnotch_spark.operators.assertions import (  # noqa: F401
    AssertionResult,
    AssertionReport,
    AssertionRule,
    SampleWindowParams,
    identify_invalid_rows,
    run_assertions,
    INVALID_COL_NAME,
    REASON_JOINER,
    SAMPLE_NUM,
)
from topnotch_spark.operators.diff import (  # noqa: F401
    DiffParams,
    DiffSide,
    create_diff,
    DEFAULT_DIFF_THRESHOLD,
)
from topnotch_spark.operators.view import create_view  # noqa: F401
