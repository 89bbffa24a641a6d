"""AUROC / AUPR evaluation against a gold-standard edge list.

Reference: [ref: Swing/util/Evaluator.py::calc_roc, calc_pr ~L?]
(SURVEY.md §2.4 A7, §2.3 J2) — walk the ranked edge list, accumulate
TP/FP, trapezoid the ROC and PR curves.

Spark form: broadcast-join the (tiny) gold list onto the ranked edges,
then cumulative sums via the DISTRIBUTED range-partitioned prefix sum
(cumulative_counts_scalable) — the default eval path, exact at any
edge-list size.  Only the final trapezoid walks an ordered window, over
already-aggregated curve points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_edges(ranked: DataFrame, gold: DataFrame) -> DataFrame:
    """J2: left broadcast join; unlisted pairs are negatives (label 0)."""
    g = F.broadcast(gold.select("parent", "child", F.col("label").cast("int").alias("label")))
    return ranked.join(g, ["parent", "child"], "left").withColumn(
        "label", F.coalesce(F.col("label"), F.lit(0))
    )


def roc_pr_points(labeled: DataFrame, n_parts: int = 64) -> DataFrame:
    """Cumulative TP/FP/TPR/FPR/precision/recall down the ranked list (W3).

    DEFAULT path is the distributed prefix-sum
    (cumulative_counts_scalable): range-partitioned per-partition
    cumsums plus a broadcast offset join — exact integer tp/fp at any
    list size, so the eval path itself survives a 100× scale-up instead
    of routing through a single-task ``Window.orderBy``.  The only
    collect here is the 1-row P/N totals aggregate."""
    totals = labeled.agg(
        F.sum("label").alias("P"), F.sum(1 - F.col("label")).alias("N")
    ).collect()[0]
    P, N = max(totals["P"] or 0, 1), max(totals["N"] or 0, 1)
    cum = cumulative_counts_scalable(
        labeled,
        [F.asc("mean_rank"), F.asc("parent"), F.asc("child")],
        n_parts=n_parts,
    )
    return (
        cum.withColumn("tpr", F.col("tp") / P)
        .withColumn("fpr", F.col("fp") / N)
        .withColumn("precision", F.col("tp") / (F.col("tp") + F.col("fp")))
        .withColumn("recall", F.col("tp") / P)
    )


def cumulative_counts_scalable(
    labeled: DataFrame,
    order_cols: list,
    label_col: str = "label",
    n_parts: int = 64,
) -> DataFrame:
    """Distributed cumulative TP/FP over a TOTAL order — the scale form
    of the single-task `Window.orderBy` prefix sum (W3 at any size).

    Classic distributed prefix-sum: range-repartition on the order key,
    cumsum WITHIN each range partition (parallel window, partitioned by
    the range id), then add each partition's prefix offset — the offsets
    come from a 64-row aggregate windowed on the range id (driver never
    sees data rows).  Correct for any boundary placement because the
    order is total; AQE does not coalesce an explicit repartitionByRange
    with a fixed partition count.
    """
    d = labeled.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    pid_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("_pid")
        .agg(
            F.sum(label_col).alias("_p"),
            F.sum(1 - F.col(label_col)).alias("_n"),
        )
        .select(
            "_pid",
            F.coalesce(F.sum("_p").over(pid_w), F.lit(0)).alias("_p_off"),
            F.coalesce(F.sum("_n").over(pid_w), F.lit(0)).alias("_n_off"),
        )
    )
    within = Window.partitionBy("_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        d.withColumn("_tp_local", F.sum(label_col).over(within))
        .withColumn("_fp_local", F.sum(1 - F.col(label_col)).over(within))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("tp", F.col("_tp_local") + F.col("_p_off"))
        .withColumn("fp", F.col("_fp_local") + F.col("_n_off"))
        .drop("_pid", "_tp_local", "_fp_local", "_p_off", "_n_off")
    )


def _trapezoid(
    points: DataFrame,
    x: str,
    y: str,
    order_cols: tuple = ("mean_rank", "parent", "child"),
    n_parts: int = 64,
) -> float:
    """Distributed trapezoid area under the (x, y) curve walked in
    ``order_cols`` order, starting from the implicit point (0, 0).

    Scale form (round-5; the prior shape was a single-task global
    ``Window.orderBy`` + lag over EVERY curve point — the same
    scale-killer retired from the cumulative-counts path in round 3):
    range-repartition on the total order, compute each partition's
    INTERIOR area with a parallel per-partition lag window, and reduce
    partitions to one (first, last, interior) row each.  The driver
    stitches the ≤``n_parts`` aggregate rows — boundary segments between
    consecutive partitions plus the (0,0)→first segment — so no data-
    sized ordered window exists anywhere and the only collect is the
    ``n_parts``-row aggregate (same class as the P/N totals collect).

    repartitionByRange assigns ranges to partition ids in sort order and
    the order is total, so stitching by ``_pid`` is exact for any
    boundary placement; empty range partitions simply produce no
    aggregate row.
    """
    order = [F.asc(c) for c in order_cols]
    d = points.repartitionByRange(n_parts, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    within = Window.partitionBy("_pid").orderBy(*order)
    stepped = d.select(
        "_pid",
        *order_cols,
        F.col(x).alias("_x"),
        F.col(y).alias("_y"),
        F.lag(x).over(within).alias("_x0"),
        F.lag(y).over(within).alias("_y0"),
    )
    ordk = F.struct(*[F.col(c) for c in order_cols])
    pt = lambda: F.struct(F.col("_x").alias("x"), F.col("_y").alias("y"))
    parts = stepped.groupBy("_pid").agg(
        F.sum(
            F.when(
                F.col("_x0").isNotNull(),
                (F.col("_x") - F.col("_x0")) * (F.col("_y") + F.col("_y0")) / 2.0,
            ).otherwise(F.lit(0.0))
        ).alias("interior"),
        F.min_by(pt(), ordk).alias("first"),
        F.max_by(pt(), ordk).alias("last"),
    )
    area, px, py = 0.0, 0.0, 0.0
    for r in sorted(parts.collect(), key=lambda r: r["_pid"]):
        area += (r["interior"] or 0.0)
        area += (r["first"]["x"] - px) * (r["first"]["y"] + py) / 2.0
        px, py = r["last"]["x"], r["last"]["y"]
    return float(area)


def auroc(ranked: DataFrame, gold: DataFrame) -> float:
    return _trapezoid(roc_pr_points(label_edges(ranked, gold)), "fpr", "tpr")


def aupr(ranked: DataFrame, gold: DataFrame) -> float:
    pts = roc_pr_points(label_edges(ranked, gold))
    return _trapezoid(pts, "recall", "precision")
