"""Command-output persistence: registry + optional Parquet write + table mount.

Reference semantics (tnengine/TnEngine.scala:214-229): every command's
result is registered under its outputKey; ``cache`` pins it; ``outputPath``
overwrite-writes Parquet; ``tableName`` mounts the written Parquet as an
external table. We use MEMORY_AND_DISK persistence (safer than the
reference's MEMORY_ONLY default at scale) and the modern
``spark.catalog.createTable`` (Spark 2.x ``createExternalTable`` is gone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


_SINK_FORMATS = ("parquet", "orc", "csv", "json")


def store_output(
    spark: SparkSession,
    df: DataFrame,
    output_key: str,
    registry: dict[str, DataFrame],
    cache: bool = False,
    output_path: str | None = None,
    table_name: str | None = None,
    partition_by: list[str] | None = None,
    output_format: str = "parquet",
    sort_by: list[str] | None = None,
    sort_partitions: int | None = None,
) -> DataFrame:
    """``sort_by`` writes a DATA-SKIPPING layout: rows are range-
    repartitioned on the sort columns and sorted within each partition,
    so every output file covers a disjoint range and parquet/ORC
    row-group min/max stats prune whole files for range predicates on
    those columns — the poor-man's Z-order, and the right layout for a
    100 TB table that is usually filtered on one column (date, id
    range). Costs ONE range-exchange (sampled boundaries) at write time;
    reads get `PushedFilters` + file skipping for free afterwards.
    ``sort_partitions`` fixes the output file count (defaults to the
    session shuffle parallelism)."""
    if output_format not in _SINK_FORMATS:
        raise ValueError(
            f"Unsupported output format: {output_format!r} "
            f"(supported: {', '.join(_SINK_FORMATS)})"
        )
    if cache:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    registry[output_key] = df
    if output_path:
        out_df = df
        if sort_by:
            cols = [F.col(c) for c in sort_by]
            if sort_partitions is not None:
                out_df = df.repartitionByRange(sort_partitions, *cols)
            else:
                out_df = df.repartitionByRange(*cols)
            out_df = out_df.sortWithinPartitions(*cols)
        writer = out_df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if output_format == "csv":
            writer = writer.option("header", "true")
        writer.format(output_format).save(output_path)
        if table_name:
            spark.sql(f"DROP TABLE IF EXISTS {table_name}")
            # Mount options must mirror the writer options, else a csv
            # mount would re-read its own header row as data with an
            # all-string schema.
            mount_opts: dict[str, str] = {}
            if output_format == "csv":
                mount_opts = {"header": "true", "inferSchema": "true"}
            spark.catalog.createTable(
                table_name, path=output_path, source=output_format, **mount_opts
            )
    return df
