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

Incremental-vs-one-shot parity: an INCREMENTAL (``scope="active"``)
pass keeps, per duplicate component, the min-id member seen so far;
min() is associative, so the final state equals the one-shot batch
dedup_survivors over the full corpus WHENEVER removing a loser cannot
disconnect a component — i.e. components are CLIQUES (exact-content
equality, transitively closed; or tight near-dup thresholds where all
cluster members are pairwise similar).  For chain-shaped similarity
graphs (A~B~C, A≁C) — exactly what the near-dup ``pair_fn`` variants
produce on template-drift corpora — an incrementally removed bridge
can leave both endpoints alive.  The ``scope="full-history"`` pass
(the DEFAULT for the drain-time final compaction) closes that gap
exactly: pair discovery runs over the union of the ORIGINAL append
commits (replaced manifests stay on disk as lineage, so the full
history remains readable), and the anti-join filters the active
snapshot.  The global min of every component always survives
incremental passes (any discovered subgraph containing it has it as
its min), so active ∩ full-graph-survivors == the one-shot result on
ANY pair-graph shape; the cost is re-scanning the appended history
once — the same scan the one-shot job would do, paid once at drain
instead of the periodic cadence.  test_streaming.py pins the exact-dup
parity, the chain-fixture approximation delta, and the full-history
restoration through the streaming path with a minhash pair_fn.
"""

from __future__ import annotations

import json
import os
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
    scope: str = "active",
) -> dict | None:
    """One dedup-compaction pass over ``table``'s active snapshot.

    ``pair_fn(docs) -> (id_a, id_b)`` is the pluggable discovery stage
    (exact_dup_pairs, minhash_lsh_pairs, simhash_neardup_pairs, ...).
    ``scope="active"`` discovers pairs over the active snapshot only
    (the cheap periodic maintenance pass); ``scope="full-history"``
    discovers over every original append commit and so restores exact
    one-shot parity on chain-shaped duplicate graphs (module docstring).
    Returns the REPLACE manifest, or None when this compaction_id is
    already in the ledger (replay no-op) or the table is empty.

    Crash/retry safety: the batch_ids this pass will REPLACE are
    recorded in an ``.intent`` sidecar BEFORE any data is published.  A
    retry that finds a crash-orphaned published dir verifies the
    CURRENT active set still equals the recorded one and fails loudly
    otherwise — an append landing between crash and retry would
    otherwise be marked replaced without its rows existing in the
    adopted files (silent row loss; r4 advice).
    """
    active = table.active_manifests()
    if not active:
        return None
    if len(active) == 1 and active[0].get("operation") == "dedup-compaction":
        # already a single compacted rewrite: an "active"-scope pass has
        # nothing to merge, and a full-history pass over a snapshot that
        # was ITSELF produced full-history is a fixpoint — but a chain
        # endpoint left by incremental passes still needs the
        # full-history pass, so only skip in those two cases
        if scope == "active" or active[0]["metrics"].get("scope") == "full-history":
            return None
    cid = compaction_id or f"compact-adhoc-{len(table.manifests())}"
    if table.committed(cid):
        return None
    replaces = [m["batch_id"] for m in active]

    intent_path = table._manifest_path(cid) + ".intent"
    orphan_dir = os.path.join(table.data_dir, f"batch-{cid}")
    if os.path.isdir(orphan_dir):
        # published data exists from a crashed attempt; the commit below
        # will ADOPT it, so its input snapshot must still be current
        if not os.path.exists(intent_path):
            raise RuntimeError(
                f"orphaned compaction dir {orphan_dir} has no intent "
                f"record — cannot verify which snapshot it was computed "
                f"from; remove the dir to recompute"
            )
        with open(intent_path) as fh:
            recorded = json.load(fh)["replaces"]
        if [str(b) for b in recorded] != [str(b) for b in replaces]:
            raise RuntimeError(
                f"compaction {cid} retry: active snapshot changed since "
                f"the crashed attempt published its files (recorded "
                f"{recorded}, now {replaces}) — adopting would mark the "
                f"new commits replaced without their rows; remove "
                f"{orphan_dir} to recompute from the current snapshot"
            )
    else:
        tmp = intent_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"replaces": replaces, "scope": scope}, fh, default=str)
        os.replace(tmp, intent_path)

    docs = table.read(spark)
    basis = table.read_history(spark) if scope == "full-history" else docs
    pairs = pair_fn(basis).select("id_a", "id_b")
    survivors = dedup_survivors(docs, pairs, id_col)
    rows_in = sum(m["metrics"]["rows"] for m in active)
    manifest = table.commit(
        cid,
        survivors,
        operation="dedup-compaction",
        replaces=replaces,
        extra_metrics={
            "rows_in": rows_in,
            "input_commits": len(active),
            "scope": scope,
        },
    )
    if manifest is not None:
        try:
            os.remove(intent_path)
        except OSError:
            pass
    return manifest


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
    final_scope: str = "full-history",
) -> IcebergLiteTable:
    """Append a streaming document DataFrame to an IcebergLite corpus
    with a dedup compaction every ``every`` commits (plus one final pass
    when the stream drains, so the end state is fully deduplicated).

    The periodic passes are incremental (``scope="active"``); the final
    pass defaults to ``scope="full-history"`` so the drained table
    equals the one-shot batch dedup for ANY pair-graph shape, including
    similarity chains whose bridge doc a periodic pass removed early
    (module docstring).  Pass ``final_scope="active"`` to keep the
    cheaper incremental approximation when the pair graph is known to
    be clique-shaped (exact-content dedup).

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
                      compaction_id="compact-final", scope=final_scope)
    return table
