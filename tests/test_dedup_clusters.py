"""Connected-component cluster canonicalization over near-dup pairs."""

from __future__ import annotations


def test_dedup_clusters_chain_and_islands(spark):
    """A 5-node chain, a 2-clique, and an untouched pair graph all
    collapse to their min-id labels within the iteration budget."""
    from swingstream.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),   # chain: min-label must hop 4x
         (10, 11),                          # island
         (20, 22), (22, 21)],               # small chain, unordered ids
        "id_a long, id_b long",
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
