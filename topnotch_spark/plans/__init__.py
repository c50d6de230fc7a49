from topnotch_spark.plans.model import (  # noqa: F401
    AssertionCmd,
    Command,
    DiffCmd,
    ErrorCmd,
    ViewCmd,
)
from topnotch_spark.plans.parser import parse_commands, collect_errors  # noqa: F401
from topnotch_spark.plans.readers import FileReader, RESTReader  # noqa: F401
