"""Input loading: on-disk files or registry references.

Semantics from the reference (tnengine/TnEngine.scala:173-191): an
``Input`` is either a prior command's output key (``on_disk=False``) or a
path (``on_disk=True``). On-disk inputs with a ``delimiter`` are delimited
text with header + schema inference; otherwise Parquet. We extend the
format surface with explicit ``format`` (parquet/csv/json/orc) while
keeping the reference's JSON shape valid.

Scale note: inferSchema on CSV is a full extra pass over the data — fine
for QC-plan inputs (the reference's contract), but plans can pass
``schema`` (a DDL string) to skip it for 100 TB inputs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Input:
    """One input of a command.

    ref: registry key (on_disk=False) or filesystem path (on_disk=True).
    delimiter: if set and on_disk, read delimited text w/ header+inference
               (reference: tnengine/TnEngine.scala:179-184).
    format: optional explicit reader format (extension).
    schema: optional DDL schema string to skip inference (extension).
    """

    ref: str
    on_disk: bool = True
    delimiter: str | None = None
    format: str | None = None
    schema: str | None = None
    wholetext: bool = False

    @classmethod
    def from_json(cls, obj: dict) -> "Input":
        return cls(
            ref=obj["ref"],
            on_disk=obj.get("onDisk", obj.get("on_disk", True)),
            delimiter=obj.get("delimiter"),
            format=obj.get("format"),
            schema=obj.get("schema"),
            wholetext=bool(obj.get("wholetext", False)),
        )


def load_input(
    spark: SparkSession, inp: Input, registry: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Resolve an Input to a DataFrame (reference: TnEngine.scala:173-191)."""
    if not inp.on_disk:
        if registry is None or inp.ref not in registry:
            raise KeyError(
                f"Input key '{inp.ref}' not found in registry; "
                f"known keys: {sorted(registry) if registry else []}"
            )
        return registry[inp.ref]

    fmt = inp.format
    if fmt is None:
        fmt = "csv" if inp.delimiter is not None else "parquet"

    reader = spark.read
    if inp.schema:
        reader = reader.schema(inp.schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option(
            "delimiter", inp.delimiter or ","
        )
        if not inp.schema:
            reader = reader.option("inferSchema", "true")
        return reader.csv(inp.ref)
    if fmt == "json":
        return reader.json(inp.ref)
    if fmt == "orc":
        return reader.orc(inp.ref)
    if fmt == "parquet":
        return reader.parquet(inp.ref)
    if fmt == "text":
        # Raw text corpora (the LLM-ingest shape): one row per LINE by
        # default, or one row per FILE with {"wholetext": true}. Columns:
        # (doc_path, line_no?, text) — doc_path/line_no give dedup/text
        # commands a deterministic id without a pre-processing step.
        # Scale: spark.read.text is a splittable scan in line mode;
        # wholetext makes each file one record (bound file sizes — a
        # 10 GB file becomes one task's row).
        from pyspark.sql import functions as F

        df = spark.read.text(inp.ref, wholetext=inp.wholetext)
        df = df.withColumn("doc_path", F.input_file_name())
        if not inp.wholetext:
            from pyspark.sql import Window

            # line_no = true in-file line order. A file bigger than one
            # split becomes several partitions, and FileSourceScanExec
            # packs splits sorted by LENGTH (not offset), so partition
            # index — the high bits of monotonically_increasing_id —
            # does not follow byte order within a file. The per-file
            # window therefore sorts by the split's BYTE OFFSET first
            # (input_file_block_start(), constant per split) and only
            # uses monotonically_increasing_id to order lines inside a
            # split, where scan order is the file order.
            df = df.withColumn("__mid__", F.monotonically_increasing_id())
            df = df.withColumn(
                "__blk__", F.expr("input_file_block_start()")
            )
            df = df.withColumn(
                "line_no",
                F.row_number().over(
                    Window.partitionBy("doc_path").orderBy("__blk__", "__mid__")
                ),
            ).drop("__mid__", "__blk__")
        return df.withColumnRenamed("value", "text")
    if fmt == "table":
        # Catalog table (ref = table name). The 100 TB path for repeated
        # keyed commands: a table written bucketed+sorted on the diff/join
        # keys (sources/bucketing.write_bucketed) feeds sort-merge join
        # with ZERO per-run Exchange — both snapshot shuffles are paid
        # once at write time (tests/test_bucketing.py asserts the
        # no-Exchange diff plan).
        return spark.table(inp.ref)
    raise ValueError(f"Unsupported input format: {fmt!r}")
