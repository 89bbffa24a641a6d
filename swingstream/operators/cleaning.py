"""Row-completeness operators (SURVEY.md §2.2 P2).

The reference drops NaN rows at load [ref: Swing/Swing.py::__init__
raw_data.dropna() ~L?] (reconstructed; mount empty).  Spark twin:
``DataFrame.na.drop`` — a plain Catalyst Filter(IsNotNull...), fully
pushdown-able when applied before wider transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def drop_incomplete(
    df: DataFrame, subset: list[str] | None = None, how: str = "any"
) -> DataFrame:
    """P2: drop rows with nulls in ``subset`` (all columns when None).

    `how='any'` matches pandas dropna() default — the reference's load
    semantics.  Compiles to IsNotNull filters, so when applied directly
    over a parquet scan the predicate reaches PushedFilters.
    """
    return df.na.drop(how=how, subset=subset)
