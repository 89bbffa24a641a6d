"""Periodic dedup compaction of a streaming corpus table.

An LLM-data pipeline appends cleaned documents continuously and
periodically REWRITES the corpus to drop near-duplicate losers — the
streaming wiring of operators.dedup.dedup_survivors.  The compaction is
a batch job orchestrated BETWEEN stream triggers from the foreachBatch
sink (the standard Iceberg maintenance pattern: streaming appends +
background rewrite sharing one snapshot ledger):

  * the corpus lives in an IcebergLiteTable; every micro-batch is one
    append commit keyed by the stream's batch_id (exactly-once);
  * every ``every`` commits, ``compact_dedup`` reads the table's ACTIVE
    snapshot, computes survivor rows with the pluggable pair function,
    and commits them as a REPLACE snapshot: one manifest carrying
    ``operation: "dedup-compaction"`` and ``replaces: [input batch
    ids]``.  Visibility flips atomically on that single manifest write;
    replaced manifests remain on disk as lineage/history;
  * the compaction's commit id is derived deterministically from the
    triggering stream batch (``compact-<batch_id>``), so a foreachBatch
    retry replays into a ledger no-op and a crash between data publish
    and manifest write is healed by the sink's adoption path — the
    same exactly-once machinery as appends (SURVEY.md §2.8 T9).

Scale shape: each compaction is pair-discovery (banded LSH / digest
join — never O(n²)) plus CC labels on the pair graph (≪ corpus) plus
ONE left-anti join filtering the corpus; the corpus side is never
collected or sorted.  At 10^12 rows the rewrite would be partitioned
(rewrite only data files whose partitions contain losers — Iceberg's
rewrite_data_files granularity); the ledger semantics here are exactly
that contract with whole-snapshot granularity.

Incremental-vs-one-shot parity: compacting as data arrives keeps, per
duplicate component, the min-id member seen so far; min() is
associative, so the final state equals the one-shot batch
dedup_survivors over the full corpus WHENEVER removing a loser cannot
disconnect a component — i.e. components are CLIQUES (exact-content
equality, transitively closed; or tight near-dup thresholds where all
cluster members are pairwise similar).  For chain-shaped similarity
graphs (A~B~C, A≁C) incremental compaction is the standard documented
approximation: a bridge doc removed early can leave both endpoints
alive.  test_streaming.py pins the exact-dup parity.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from swingstream.operators.dedup import dedup_survivors, exact_dup_pairs
from swingstream.sources.catalog import IcebergLiteTable


def compact_dedup(
    spark: SparkSession,
    table: IcebergLiteTable,
    pair_fn: Callable[[DataFrame], DataFrame],
    id_col: str = "doc_id",
    compaction_id: str | None = None,
) -> dict | None:
    """One dedup-compaction pass over ``table``'s active snapshot.

    ``pair_fn(docs) -> (id_a, id_b)`` is the pluggable discovery stage
    (exact_dup_pairs, minhash_lsh_pairs, simhash_neardup_pairs, ...).
    Returns the REPLACE manifest, or None when this compaction_id is
    already in the ledger (replay no-op) or the table is empty.
    """
    active = table.active_manifests()
    if not active:
        return None
    if len(active) == 1 and active[0].get("operation") == "dedup-compaction":
        return None  # snapshot is already a single compacted rewrite
    cid = compaction_id or f"compact-adhoc-{len(table.manifests())}"
    if table.committed(cid):
        return None
    docs = table.read(spark)
    pairs = pair_fn(docs).select("id_a", "id_b")
    survivors = dedup_survivors(docs, pairs, id_col)
    rows_in = sum(m["metrics"]["rows"] for m in active)
    return table.commit(
        cid,
        survivors,
        operation="dedup-compaction",
        replaces=[m["batch_id"] for m in active],
        extra_metrics={"rows_in": rows_in, "input_commits": len(active)},
    )


def run_corpus_stream_with_compaction(
    spark: SparkSession,
    docs_stream: DataFrame,
    out_root: str,
    checkpoint: str,
    *,
    pair_fn: Callable[[DataFrame], DataFrame] | None = None,
    id_col: str = "url",
    every: int = 4,
    final_compaction: bool = True,
) -> IcebergLiteTable:
    """Append a streaming document DataFrame to an IcebergLite corpus
    with a dedup compaction every ``every`` commits (plus one final pass
    when the stream drains, so the end state is fully deduplicated).

    foreachBatch runs batches serially, so the between-trigger batch
    compaction never races an append; its commit id is pinned to the
    triggering batch_id for exactly-once under retries.
    """
    table = IcebergLiteTable(out_root)
    pf = pair_fn if pair_fn is not None else (
        lambda d: exact_dup_pairs(d, id_col=id_col)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.commit(batch_id, batch_df)
        if every > 0 and (batch_id + 1) % every == 0:
            compact_dedup(spark, table, pf, id_col=id_col,
                          compaction_id=f"compact-{batch_id}")

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if final_compaction:
        compact_dedup(spark, table, pf, id_col=id_col,
                      compaction_id="compact-final")
    return table
