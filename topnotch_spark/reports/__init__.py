from topnotch_spark.reports.model import assertion_group_to_json, report_columns  # noqa: F401
from topnotch_spark.reports.writers import FileWriter, RESTWriter, get_writer  # noqa: F401
