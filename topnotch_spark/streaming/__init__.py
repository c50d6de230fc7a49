from topnotch_spark.streaming.ops import (
    StreamingAssertionSummary,
    run_stream_to_table,
    run_streaming_assertions,
    stream_from_parquet,
    windowed_event_metrics,
)
from topnotch_spark.streaming.stateful import (
    anomaly_stream,
    ewma_stream,
    sessionize_stream,
    transitions_stream,
)

__all__ = [
    "StreamingAssertionSummary",
    "run_stream_to_table",
    "run_streaming_assertions",
    "stream_from_parquet",
    "windowed_event_metrics",
    "anomaly_stream",
    "ewma_stream",
    "sessionize_stream",
    "transitions_stream",
]
