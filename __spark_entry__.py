"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship SWING ranked-edges query on
/root/testdata/sf0.001-scale fixtures; ``queries()`` /``oracle_sql()``
expose the operator catalog in swingstream/contract.py (one entry per
implemented SURVEY.md §2 operator family; DuckDB-verifiable ones carry
an oracle, hash/stateful ones are rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch SWING pipeline — pages fixture -> per-host bucket
    features -> lagged design -> Lasso scoring -> ranked adjacency list."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from swingstream.config import SwingParams
    from swingstream.fixtures import PagesSpec, gen_pages
    from swingstream.pipeline import pages_pipeline
    from swingstream.sources.pages import pages_from_pandas

    pages = pages_from_pandas(
        spark, gen_pages(PagesSpec(n_hosts=4, n_buckets=24, base_docs_per_bucket=3))
    )
    params = SwingParams(
        window_width=8, step_size=1, min_lag=1, max_lag=2, method="lasso", alpha=0.05
    )
    return pages_pipeline(pages, params, salted=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from swingstream.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from swingstream.contract import ORACLES

    return dict(ORACLES)
