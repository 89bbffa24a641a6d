"""Helpers to assert optimizer behavior from tests (SURVEY.md §4.2):
predicate pushdown reached the parquet scan, column pruning excluded the
heavy columns, small dimensions broadcast, whole-stage codegen spans the
hot expressions.  These are the guardrails that keep the 100-TB plan
shape from regressing silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names that actually reach the parquet scan (ReadSchema)."""
    import re

    text = explain_str(df, "formatted")
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols.extend(
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        )
    return cols


def pushed_filters(df: DataFrame) -> str:
    import re

    text = explain_str(df, "formatted")
    return " | ".join(m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text))


def has_broadcast_join(df: DataFrame) -> bool:
    return "Broadcast" in explain_str(df, "simple")


def codegen_stage_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("WholeStageCodegen")
