"""Per-domain cap (operators/domains.py): survivor-rule hand values,
pandas oracle parity, salted==unsalted exactness, fast-path plan shape."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from swingstream.operators.domains import host_cap, host_counts


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "host", "score"])
    )


FIX = [
    # host a: 5 docs (over a cap of 2), host b: 2 (at cap), host c: 1
    (1, "a", 0.9),
    (2, "a", 0.1),
    (3, "a", 0.5),
    (4, "a", 0.7),
    (5, "a", 0.3),
    (6, "b", 0.2),
    (7, "b", 0.8),
    (8, "c", 0.6),
]


def _md5_order_survivors(rows, cap):
    by_host: dict[str, list] = {}
    for doc_id, host, _ in rows:
        by_host.setdefault(host, []).append(doc_id)
    keep = []
    for host, ids in by_host.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep.extend(ids[:cap])
    return sorted(keep)


def test_host_cap_hand_values_hash_order(spark):
    docs = _docs(spark, FIX)
    out = host_cap(docs, cap=2, host_col="host")
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == _md5_order_survivors(FIX, 2)
    # every host at most 2, under-cap hosts untouched
    sizes = {
        r["host"]: r["n"]
        for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"a": 2, "b": 2, "c": 1}


def test_host_cap_score_order_keeps_best(spark):
    docs = _docs(spark, FIX)
    out = host_cap(docs, cap=2, host_col="host", order_col="score")
    kept_a = sorted(
        r["doc_id"] for r in out.where(F.col("host") == "a").collect()
    )
    # top-2 scores in host a: doc 1 (0.9) and doc 4 (0.7)
    assert kept_a == [1, 4]
    assert out.count() == 5


def test_host_cap_noop_when_cap_covers_everything(spark):
    docs = _docs(spark, FIX)
    out = host_cap(docs, cap=10, host_col="host")
    assert sorted(r["doc_id"] for r in out.collect()) == [r[0] for r in FIX]


def test_host_cap_salted_matches_unsalted(spark):
    # 40 docs over 3 hosts, one deliberately hot (30 docs)
    rows = [(i, "hot" if i % 4 else f"h{i % 8}", float(i % 7)) for i in range(40)]
    docs = _docs(spark, rows)
    plain = host_cap(docs, cap=3, host_col="host")
    for parts in (2, 7):
        salted = host_cap(docs, cap=3, host_col="host", salt_parts=parts)
        assert sorted(r["doc_id"] for r in salted.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )
    # score-ordered variant too
    plain_s = host_cap(docs, cap=3, host_col="host", order_col="score")
    salted_s = host_cap(
        docs, cap=3, host_col="host", order_col="score", salt_parts=5
    )
    assert sorted(r["doc_id"] for r in salted_s.collect()) == sorted(
        r["doc_id"] for r in plain_s.collect()
    )


def test_host_cap_deterministic_under_input_shuffle(spark):
    rows = [(i, f"h{i % 3}", float(i)) for i in range(30)]
    a = host_cap(_docs(spark, rows), cap=4, host_col="host")
    b = host_cap(
        _docs(spark, list(reversed(rows))).repartition(7), cap=4, host_col="host"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_host_cap_plan_fast_path(spark):
    """Under-cap rows bypass the window: the plan's window stage sits
    under the semi-join branch only, and the over-list join broadcasts."""
    docs = _docs(spark, FIX)
    plan = host_cap(docs, cap=2, host_col="host")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window [") == 1  # single rank stage, not one per path
    # Spark's WindowGroupLimit prunes to <= cap rows per host on the MAP
    # side, before the exchange — the skew mitigation is in the plan
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_host_cap_validates_params(spark):
    docs = _docs(spark, FIX)
    with pytest.raises(ValueError):
        host_cap(docs, cap=0, host_col="host")
    with pytest.raises(ValueError):
        host_cap(docs, cap=2, host_col="host", salt_parts=0)


def test_host_counts(spark):
    docs = _docs(spark, FIX)
    got = {r["host"]: r["n_host"] for r in host_counts(docs, "host").collect()}
    assert got == {"a": 5, "b": 2, "c": 1}
