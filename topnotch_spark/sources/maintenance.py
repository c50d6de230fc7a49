"""Table-maintenance operations: small-file compaction.

At 100 TB the classic failure mode of a continuously-landing dataset is
millions of small files — every downstream scan pays per-file open/seek
cost and the driver pays listing cost. ``compact_table`` rewrites a
parquet directory to a target file size: it lists the source through
the Hadoop FileSystem API (portable to HDFS/S3A/local — NOT os.walk),
sizes the output as ceil(total_bytes / target), rewrites with a single
round-robin repartition, and returns a one-row stats DataFrame so a
plan can assert on the result (e.g. files_after <= N).

The rewrite is one shuffle by design: ``coalesce`` alone cannot SPLIT
oversized partitions and can silently collapse upstream parallelism
into the narrowed stage; a round-robin repartition reads with full
parallelism and writes evenly-sized files. Sorted layouts should use
the range-sorted sink (``sortBy`` on the output envelope,
sources/outputs.py) instead — compaction here preserves no order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` via the Hadoop FS API."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, metadata, hidden
        n += 1
        total += st.getLen()
    return n, total


def compact_table(
    spark: SparkSession,
    source: str,
    dest: str,
    target_file_mb: int = 128,
    output_format: str = "parquet",
) -> DataFrame:
    """Rewrite ``source`` (parquet dir) into ``dest`` with files sized
    toward ``target_file_mb``. Returns a one-row DataFrame:
    (files_before, bytes_before, files_after, bytes_after, n_rows,
    target_file_mb).

    File count is computed from the SOURCE's compressed bytes — the
    honest proxy available without writing twice; actual output files
    land within the parquet re-encoding delta of the target.
    """
    if target_file_mb <= 0:
        raise ValueError("compact_table: target_file_mb must be > 0")
    files_before, bytes_before = _list_files(spark, source)
    if files_before == 0:
        raise ValueError(f"compact_table: no data files under {source}")
    n_out = max(1, math.ceil(bytes_before / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(source)
    n_rows = df.count()
    (
        df.repartition(n_out)
        .write.mode("overwrite")
        .format(output_format)
        .save(dest)
    )
    files_after, bytes_after = _list_files(spark, dest)
    return spark.range(1).select(
        F.lit(files_before).alias("files_before"),
        F.lit(bytes_before).alias("bytes_before"),
        F.lit(files_after).alias("files_after"),
        F.lit(bytes_after).alias("bytes_after"),
        F.lit(n_rows).alias("n_rows"),
        F.lit(target_file_mb).alias("target_file_mb"),
    )
