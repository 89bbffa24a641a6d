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


def test_dedup_clusters_long_chain_converges_in_log_rounds(spark):
    """A 64-node path (diameter 63 — the template-spam-chain shape that
    breaks diameter-bound propagation) must fully collapse well inside a
    logarithmic round budget: large-star/small-star needs ~log2(63)+c
    rounds, so max_iters=12 is ample for 64 nodes — and the operator
    must RAISE rather than silently return partial labels if it cannot
    converge (max_iters=2 below)."""
    import pytest

    from swingstream.operators.dedup import dedup_clusters

    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"]
           for r in dedup_clusters(pairs, max_iters=12).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}

    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(pairs, max_iters=2)


def test_simhash_multiband_recall(spark):
    """Multi-band OR-of-bands candidate generation vs the exact
    all-pairs bit_count(xor) ground truth on the realistic Zipf corpus.
    The DEFAULT banding (max_hamming + 1 = 9 blocks) must reach recall
    exactly 1.0 — the pigeonhole guarantee (8 corrupted blocks of 9
    leave one clean).  The wide-band throughput opt-in (4×16 bits) is
    only probabilistic: measured ~0.68 here, asserted as a floor so the
    tradeoff stays documented.  The retired single-prefix form
    structurally missed any pair differing inside its one 16-bit
    prefix."""
    from pyspark.sql import functions as F

    from swingstream.fixtures import gen_documents
    from swingstream.operators.dedup import (
        simhash_pairs_from_sigs,
        simhash_sig_table,
    )

    pdf = gen_documents(n_docs=800, neardup_frac=0.08, dup_frac=0.02)
    docs = spark.createDataFrame(pdf).repartition(16)
    sigs = simhash_sig_table(docs).persist()

    a, b = sigs.alias("a"), sigs.alias("b")
    exact = {
        (r["id_a"], r["id_b"])
        for r in (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .where(F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= 8)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .collect()
        )
    }
    assert len(exact) >= 10, "fixture must plant enough true near-dup pairs"

    for bands, floor in ((None, 1.0), (4, 0.6)):
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs_from_sigs(sigs, max_hamming=8, bands=bands)
            .collect()
        }
        assert got <= exact  # verify stage is exact: no false positives
        recall = len(got & exact) / len(exact)
        assert recall >= floor, f"bands={bands}: recall {recall:.3f} < {floor}"
    sigs.unpersist()
