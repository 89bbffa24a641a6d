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


def test_mixture_thresholds_integer_exact(corpus):
    """Hand-checkable BIGINT arithmetic: each stratum holds 1000 docs;
    token mass per stratum = sum of its n_tok values."""
    from swingstream.operators.sampling import mixture_thresholds

    th = mixture_thresholds(
        corpus, ["lang"], "n_tok", {"en": 0.6, "de": 0.4},
        total_budget=30_000,
    ).toPandas().set_index("lang")
    tok = corpus.groupBy("lang").agg(
        F.sum("n_tok").alias("t")).toPandas().set_index("lang")["t"]
    for lang, p_ppm in [("en", 600_000), ("de", 400_000)]:
        target = 30_000 * p_ppm // 1_000_000
        want = min(SAMPLE_K, target * SAMPLE_K // int(tok[lang]))
        assert th.loc[lang, "target_tokens"] == target
        assert th.loc[lang, "threshold_k"] == want
    # strata absent from the recipe: threshold 0 (dropped)
    assert th.loc["fr", "threshold_k"] == 0
    assert th.loc["zh", "threshold_k"] == 0


def test_mixture_sample_hits_proportions_and_caps(corpus):
    from swingstream.operators.sampling import mixture_sample

    got = mixture_sample(
        corpus, ["lang"], "n_tok", {"en": 0.7, "de": 0.3},
        total_budget=60_000,
    ).toPandas()
    by = got.groupby("lang")["n_tok"].sum()
    assert set(by.index) <= {"en", "de"}
    # achieved token mass ~ targets (binomial noise; each stratum has
    # ~1000 docs of ~100 tokens -> 3 sigma ~ 12%)
    assert abs(by["en"] - 42_000) < 0.15 * 42_000
    assert abs(by["de"] - 18_000) < 0.2 * 18_000
    # a share larger than the stratum caps at keep-everything
    capped = mixture_sample(
        corpus, ["lang"], "n_tok", {"zh": 1.0},
        total_budget=10_000_000,
    ).toPandas()
    assert len(capped) == 1000  # all zh docs kept, nothing invented
    # determinism
    g2 = mixture_sample(
        corpus, ["lang"], "n_tok", {"en": 0.7, "de": 0.3},
        total_budget=60_000,
    ).toPandas()
    assert sorted(g2["doc_id"]) == sorted(got["doc_id"])


def test_mixture_rejects_bad_proportions(corpus):
    from swingstream.operators.sampling import mixture_thresholds

    with pytest.raises(ValueError, match="not in"):
        mixture_thresholds(corpus, ["lang"], "n_tok", {"en": 1.2}, 1000)
