"""Physical-plan guardrails (SURVEY.md §4.2): pushdown, pruning,
broadcast joins, codegen — the properties that make the plan survive a
100x scale-up, asserted so they can't regress silently."""

from __future__ import annotations

import os

import pytest

from swingstream.config import SwingParams
from swingstream.plans.explain import (
    codegen_stage_count,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

SF = os.environ.get("SWINGSTREAM_SF_DIR", "/root/testdata/sf0.001")


def test_q01_pushdown_and_pruning(spark):
    from swingstream.contract import q01_pricing_summary

    df = q01_pricing_summary(spark, SF)
    assert "l_shipdate" in pushed_filters(df), "shipdate filter must reach the scan"
    cols = read_schema_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols, (
        f"unused columns not pruned: {cols}"
    )
    # whole pipeline stays JVM-side: no Python eval nodes in the plan
    from swingstream.plans.explain import explain_str

    assert "Python" not in explain_str(df, "simple")


def test_q05_broadcasts_dimensions(spark):
    from swingstream.contract import q05_region_volume

    assert has_broadcast_join(q05_region_volume(spark, SF))


def test_feature_scan_prunes_html(spark, tmp_path, pages_df):
    """§4.3 pin #4: the html binary must never reach the feature scan
    when text is already materialized (batch path reads text, not html)."""
    from swingstream.operators.features import host_bucket_features
    from swingstream.sources.pages import read_pages

    p = str(tmp_path / "pages")
    pages_df.drop(columns=["arrival_idx"]).to_parquet(p + ".parquet", index=False)
    os.makedirs(p)
    os.replace(p + ".parquet", p + "/part-0.parquet")
    pages = read_pages(spark, p)
    feats = host_bucket_features(pages, SwingParams())
    cols = read_schema_columns(feats)
    assert "html" not in cols, f"html must be pruned from the scan: {cols}"


def test_textquality_prunes_and_stays_jvm_side(spark):
    """r5 corpus-quality ops: the documents scan must read only
    (doc_id, text) — never lang/source/n_chars — and the whole plan must
    stay JVM-side (no Python eval nodes): these run over the full corpus
    at 100-TB scale, where an unpruned column or an Arrow crossing is the
    difference between a word-count-shaped job and a slow one."""
    from swingstream.contract import q_docs_boilerplate, q_docs_textquality
    from swingstream.plans.explain import explain_str

    for q in (q_docs_textquality, q_docs_boilerplate):
        df = q(spark, SF)
        cols = set(read_schema_columns(df))
        assert cols <= {"doc_id", "text"}, f"{q.__name__}: unpruned scan {cols}"
        assert "Python" not in explain_str(df, "simple"), q.__name__


def test_gold_join_broadcasts(spark):
    from swingstream.fixtures import gen_series, plant_network
    from swingstream.operators.evaluate import label_edges
    from swingstream.pipeline import series_from_wide, swing_batch

    net = plant_network(n_features=4, n_edges=3, seed=5)
    wide, _ = gen_series(n_features=4, n_buckets=12, n_replicates=2, seed=5, net=net)
    names = [f"g{i}" for i in range(1, 5)]
    ranked = swing_batch(
        spark.createDataFrame(wide).transform(
            lambda d: __import__("swingstream.pipeline", fromlist=["x"]).series_from_wide(d, names)
        ),
        SwingParams(window_width=6, min_lag=1, max_lag=2, alpha=0.1),
        feature_names=tuple(names),
    )
    gold = spark.createDataFrame(net.gold_edges(names))
    assert has_broadcast_join(label_edges(ranked, gold))


def test_lineitem_projection_prunes(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_quantity")
    cols = read_schema_columns(df)
    assert cols == ["l_quantity"], cols


def test_minhash_banding_is_equi_join(spark):
    """The LSH candidate join must plan as a hash/sort-merge EQUI-join on
    (band_idx, band_hash) — a nested-loop/cartesian plan would mean the
    banding key got lost and the operator degraded to O(n²) pair search."""
    from swingstream.fixtures import gen_documents
    from swingstream.operators.dedup import (
        minhash_lsh_pairs_from_sigs,
        minhash_sig_table,
    )

    docs = spark.createDataFrame(gen_documents(n_docs=60, vocab_size=500, seed=5))
    sigs = minhash_sig_table(docs)
    plan = minhash_lsh_pairs_from_sigs(sigs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_streaming_extract_path_has_no_python_nodes(spark, pages_df):
    """The html→text extraction hot path must stay JVM-side
    (extract_col, round 3): no ArrowEvalPython / BatchEvalPython node in
    the streaming projection's plan — every html byte crossing Arrow to
    a Python worker was ~25% of query-1 wall."""
    from pyspark.sql import functions as F

    from swingstream.extract import extract_col
    from swingstream.functions.textfns import host_of
    from swingstream.operators.features import _row_features
    from swingstream.sources.pages import pages_from_pandas

    pages = pages_from_pandas(spark, pages_df)
    # the projection shape feature_partials_stream builds: extract, then
    # per-row features over the extracted text
    d = pages.select(
        "url",
        "warc_ts",
        host_of(F.col("url")).alias("host"),
        extract_col(F.col("html")).alias("text"),
        "lang",
    ).select("url", "warc_ts", "host",
             *[c.alias(k) for k, c in _row_features().items()])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan[:2000]


def test_no_payload_columns_past_projection(spark, pages_df):
    """Pin #4 (extended): neither html nor text may survive the narrow
    scan-side projection — the dedup/agg exchanges shuffle numerics only."""
    from swingstream.config import SwingParams
    from swingstream.operators.features import host_bucket_features, pages_to_bucketed
    from swingstream.sources.pages import pages_from_pandas

    pages = pages_from_pandas(spark, pages_df)
    params = SwingParams()
    cols = set(pages_to_bucketed(pages, params).columns)
    assert not ({"html", "text"} & cols), cols
    # and the full plan's exchanges never materialize the payload: the
    # only mention of text/html is in the scan-side projection
    plan = (
        host_bucket_features(pages, params, salted=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
    # payload columns appear below (scan side of) every exchange, never
    # as exchange outputs: check the Exchange node lines themselves
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line and "html#" not in line, line
