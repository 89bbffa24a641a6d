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


def rank_edges_sparse(
    edges: DataFrame,
    params: SwingParams,
    feature_names: tuple[str, ...] | None = None,
) -> DataFrame:
    """A4 over SPARSELY-emitted edges (emit_zero_edges=False): identical
    output to ``rank_edges`` over the dense table, reconstructed in
    closed form.

    With zeros strictly below every positive importance, the dense
    tie-averaged rank of a zero hypothesis in a window with n_nz nonzero
    pairs is zrank = (n_nz + 1 + H) / 2, H = G·(G-1).  So

      mean_rank(pair) = [ Σ_present rank  +  (T_zrank − Σ_present zrank) ] / N

    where T_zrank = Σ over ALL windows of zrank and N = total window
    count — both tiny aggregates.  At 10^12 scale this is the only sane
    form: ~90% of hypotheses are zeros that never need materializing.
    All-zero windows ride along via the scorer's sentinel rows.
    """
    from swingstream.operators.scoring import WINDOW_SENTINEL

    G = params.n_features
    H = G * (G - 1) if not params.self_edges else G * G
    pairs = collapse_lags(
        edges.where(F.col("parent") != WINDOW_SENTINEL), params
    ).where(F.col("importance") > 0)
    sentinels = (
        edges.where(F.col("parent") == WINDOW_SENTINEL)
        .select("group_key", "win_start")
        .distinct()
    )
    win_stats = (
        pairs.groupBy("group_key", "win_start")
        .agg(F.count(F.lit(1)).alias("n_nz"))
        .unionByName(sentinels.withColumn("n_nz", F.lit(0).cast("long")))
        .withColumn("zrank", (F.col("n_nz") + 1 + F.lit(H)) / 2.0)
    )
    totals = win_stats.agg(
        F.sum("zrank").alias("t_zrank"), F.count(F.lit(1)).alias("n_windows")
    )
    ranked = rank_within_windows(pairs, params).join(
        win_stats.select("group_key", "win_start", "zrank"),
        ["group_key", "win_start"],
    )
    per_pair = ranked.groupBy("parent", "child").agg(
        F.sum("rank").alias("s_rank"),
        F.sum("zrank").alias("s_zrank_present"),
        F.avg("importance").alias("mean_importance_present"),
        F.count(F.lit(1)).alias("n_windows_present"),
    )
    # pair universe (J3: make_possible_edge_list twin) — pairs that were
    # never nonzero still carry the all-implicit-zero mean rank
    spark = edges.sparkSession
    names_df = spark.createDataFrame(
        [(n,) for n in (feature_names or params.feature_names)], ["name"]
    )
    universe = (
        names_df.select(F.col("name").alias("parent"))
        .crossJoin(names_df.select(F.col("name").alias("child")))
    )
    if not params.self_edges:
        universe = universe.where(F.col("parent") != F.col("child"))
    per_pair = universe.join(per_pair, ["parent", "child"], "left").na.fill(
        {"s_rank": 0.0, "s_zrank_present": 0.0, "n_windows_present": 0}
    )
    return (
        per_pair.crossJoin(F.broadcast(totals))
        .select(
            "parent",
            "child",
            (
                (F.col("s_rank") + F.col("t_zrank") - F.col("s_zrank_present"))
                / F.col("n_windows")
            ).alias("mean_rank"),
            "mean_importance_present",
            "n_windows_present",
        )
        .orderBy(F.asc("mean_rank"), F.asc("parent"), F.asc("child"))
    )
