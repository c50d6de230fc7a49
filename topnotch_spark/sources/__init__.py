from topnotch_spark.sources.inputs import Input, load_input  # noqa: F401
from topnotch_spark.sources.outputs import store_output  # noqa: F401
