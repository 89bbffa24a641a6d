"""Edge ranking + lag-weighted mean-rank aggregation (SURVEY.md §2.4 A4,
§2.5 W1, §2.6 O1).

Reference chain [ref: Swing/Window.py::rank_results ~L?] →
[ref: Swing/Swing.py::compile_roller_edges, average_rank, make_sort_df ~L?]:
rank edge hypotheses within each window by importance, then aggregate a
mean rank per (parent, child) across windows — the tRDTools
rank-aggregation of BASELINE.json.  The reference's exact lag collapse
is uncertain (§2.4 A4); PINNED semantics (documented, golden-tested):

  1. lag collapse: per (group, window, parent, child), importance =
     max over lags of importance * lag_weight(lag);
  2. per-window rank over the G·(G-1) pairs, descending importance,
     with TIE-AVERAGED ranks (pandas rank(method='average') semantics —
     zero-importance hypotheses share one rank instead of picking up
     arbitrary order);
  3. mean rank per (parent, child) across (group, window);
  4. total-order output sort (mean_rank asc, parent, child) —
     byte-stable rows (§4.3 determinism pin).

All four steps are plain relational ops: two hash aggregations + one
window function — partial aggregation and AQE apply; nothing here
touches Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from swingstream.config import SwingParams


def collapse_lags(edges: DataFrame, params: SwingParams) -> DataFrame:
    """Step 1: best-lag importance per (group, window, parent, child)."""
    imp = F.col("importance")
    if params.lag_weights:
        w = F.lit(None).cast("double")
        for k in params.lags:
            w = F.when(F.col("lag") == k, F.lit(params.lag_weight(k))).otherwise(w)
        imp = imp * w
    return edges.groupBy("group_key", "win_start", "parent", "child").agg(
        F.max(imp).alias("importance"),
        F.min("win_start_ts").alias("win_start_ts"),
    )


def rank_within_windows(pair_edges: DataFrame, params: SwingParams) -> DataFrame:
    """Step 2: tie-averaged descending rank per (group, window).

    avg(row_number) over equal-importance rows == pandas
    rank(method='average'); the row_number tie-break (parent, child) is
    only an internal determinism aid — it cancels in the average.
    """
    order = Window.partitionBy("group_key", "win_start").orderBy(
        F.desc("importance"), F.asc("parent"), F.asc("child")
    )
    ties = Window.partitionBy("group_key", "win_start", "importance")
    return pair_edges.withColumn("rn", F.row_number().over(order)).withColumn(
        "rank", F.avg("rn").over(ties)
    ).drop("rn")


def aggregate_ranks(ranked: DataFrame) -> DataFrame:
    """Steps 3+4: mean rank per (parent, child), total-ordered."""
    return (
        ranked.groupBy("parent", "child")
        .agg(
            F.avg("rank").alias("mean_rank"),
            F.avg("importance").alias("mean_importance"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .orderBy(F.asc("mean_rank"), F.asc("parent"), F.asc("child"))
    )


def rank_edges(edges: DataFrame, params: SwingParams) -> DataFrame:
    return aggregate_ranks(rank_within_windows(collapse_lags(edges, params), params))
