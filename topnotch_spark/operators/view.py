"""View operator: arbitrary Spark SQL over named inputs.

Reference semantics (tnview/TnViewCreator.scala:20-26): register each input
DataFrame as a temp view under its alias, run one SQL statement, return the
result. Catalyst handles everything downstream — predicate pushdown, column
pruning, join selection, AQE.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ViewParams:
    table_aliases: tuple[str, ...]
    query: str

    @classmethod
    def from_json(cls, obj: dict) -> "ViewParams":
        return cls(tuple(obj["tableAliases"]), obj["query"])


def create_view(
    spark: SparkSession, inputs: list[DataFrame], params: ViewParams
) -> DataFrame:
    if len(inputs) != len(params.table_aliases):
        raise ValueError(
            f"view needs one alias per input: {len(inputs)} inputs, "
            f"{len(params.table_aliases)} aliases"
        )
    for df, alias in zip(inputs, params.table_aliases):
        df.createOrReplaceTempView(alias)
    return spark.sql(params.query)
