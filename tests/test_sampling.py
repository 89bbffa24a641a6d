"""Unit tests for swingstream/operators/sampling.py — deterministic
stratified and token-budget sampling.  The contract query q_docs_sample
hash-verifies the staged-residue replay against DuckDB; these tests pin
determinism, rate accuracy, monotonicity, and the integer threshold
arithmetic on controlled data."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from swingstream.operators.sampling import (
    SAMPLE_K,
    stratified_sample,
    token_budget_sample,
    token_budget_thresholds,
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(4000),
            "lang": [("en", "de", "fr", "zh")[i % 4] for i in range(4000)],
            "n_tok": [50 + (i * 37) % 100 for i in range(4000)],
        }
    )
    return spark.createDataFrame(pdf)


def test_stratified_sample_deterministic_and_rate_accurate(corpus):
    s1 = stratified_sample(corpus, ["lang"], {"en": 0.5, "de": 0.1}, key_col="doc_id")
    s2 = stratified_sample(corpus, ["lang"], {"en": 0.5, "de": 0.1}, key_col="doc_id")
    p1 = s1.toPandas().sort_values("doc_id").reset_index(drop=True)
    p2 = s2.toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(p1, p2)  # bit-identical across runs
    by_lang = p1.groupby("lang").size()
    # 1000 docs per stratum; binomial 3-sigma bands
    assert 450 <= by_lang.get("en", 0) <= 550
    assert 70 <= by_lang.get("de", 0) <= 130
    # unnamed strata are dropped: an explicit recipe keeps what it names
    assert "fr" not in by_lang.index and "zh" not in by_lang.index


def test_stratified_sample_monotone_in_rate(corpus):
    """Raising a rate only ADDS docs — supersampling never churns."""
    lo = set(stratified_sample(corpus, ["lang"], 0.2).toPandas()["doc_id"])
    hi = set(stratified_sample(corpus, ["lang"], 0.6).toPandas()["doc_id"])
    assert lo <= hi
    # a different salt decorrelates: overlap ≈ rate product, not nesting
    other = set(
        stratified_sample(corpus, ["lang"], 0.2, salt="v2").toPandas()["doc_id"]
    )
    assert other != lo
    assert len(lo & other) < len(lo)


def test_token_budget_thresholds_integer_arithmetic(corpus):
    th = (
        token_budget_thresholds(corpus, ["lang"], "n_tok", budget_per_stratum=10_000)
        .toPandas()
        .set_index("lang")
    )
    pdf = corpus.toPandas()
    for lang, grp in pdf.groupby("lang"):
        tokens = int(grp["n_tok"].sum())
        expected = min(SAMPLE_K, (10_000 * SAMPLE_K) // tokens)
        assert th.loc[lang, "stratum_tokens"] == tokens
        assert th.loc[lang, "threshold_k"] == expected
    # a stratum already under budget keeps everything
    th_all = (
        token_budget_thresholds(corpus, ["lang"], "n_tok",
                                budget_per_stratum=10**9)
        .toPandas()
    )
    assert (th_all["threshold_k"] == SAMPLE_K).all()


def test_token_budget_sample_hits_budget(corpus):
    budget = 10_000
    got = token_budget_sample(corpus, ["lang"], "n_tok", budget).toPandas()
    by_lang = got.groupby("lang")["n_tok"].sum()
    for lang in ("en", "de", "fr", "zh"):
        # expected sampled tokens ≈ budget; 1000 docs/stratum ->
        # sampling noise ~ budget/sqrt(n_sampled); allow ±40%
        assert 0.6 * budget <= by_lang[lang] <= 1.4 * budget, by_lang
    assert "threshold_k" in got.columns


def test_fixed_rate_sample_is_shuffle_free(corpus):
    """The fixed-rate form must be a pure filter: no Exchange in the
    plan — at 100 TB this is a single scan-and-keep pass."""
    from swingstream.plans.explain import explain_str

    plan = explain_str(stratified_sample(corpus, ["lang"], 0.5), "simple")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_token_budget_sample_broadcasts_thresholds(corpus):
    from swingstream.plans.explain import explain_str, has_broadcast_join

    df = token_budget_sample(corpus, ["lang"], "n_tok", 10_000)
    assert has_broadcast_join(df)
    assert "Python" not in explain_str(df, "simple")
