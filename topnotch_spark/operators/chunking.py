"""Document chunking: split long documents into fixed-size overlapping
windows — the standard pre-tokenization step for LLM training and for
embedding long docs (context-window-bounded models).

Pure JVM formulation, zero shuffle: ``sequence(0, length-1, step)``
builds the chunk-start array, ``posexplode`` fans it out (the generator
runs inside whole-stage codegen — no Python), ``substr`` slices. Output
row count is floor(max(len−overlap−1, 0)/step)+1 per doc (≈ len/step,
minus a suppressed ≤-overlap tail), so the scan stays narrow and the
operator scales linearly with corpus bytes; at 100 TB the only knob that
matters is keeping downstream partition sizes sane after the ~len/step×
row fan-out (``spark.sql.files.maxPartitionBytes`` already bounds the
per-task input, and AQE re-coalesces after any later shuffle).

(The reference engine has no chunking stage; LLM-pipeline extension.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 400,
    overlap: int = 100,
) -> DataFrame:
    """One row per (doc, chunk): overlapping char windows of ``size``
    advancing by ``size - overlap``. Empty docs yield no chunks; the
    final chunk may be shorter than ``size``. All counters are BIGINT to
    match ANSI-SQL engines bit-for-bit.

    A start is emitted only while ``start < len − overlap`` (plus start
    0): a later start would produce a chunk of ≤ ``overlap`` chars that
    is a strict substring of the previous chunk — systematically
    duplicated text in a training corpus. Every character is still
    covered exactly once by the non-overlap portions.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    step = size - overlap
    txt = F.col(text_col)
    n = F.length(txt)
    starts = F.sequence(F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step))
    exploded = (
        df.filter(n > 0)
        .select(
            F.col(id_col),
            txt.alias("__text__"),
            n.alias("__n__"),
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
    )
    chunk = F.col("__text__").substr(F.col("chunk_start") + 1, F.lit(size))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
        (
            F.floor(F.greatest(F.col("__n__") - overlap - 1, F.lit(0)) / step) + 1
        ).cast("long").alias("n_chunks"),
    )
