"""DSIR-style importance-weighted data selection — choose corpus
documents whose hashed n-gram distribution looks like a TARGET corpus
(the "make CommonCrawl look like Wikipedia+books" stage of an LLM data
pipeline).

No reference-repo twin exists (mount empty; the reference is a network-
inference tool) — the semantics follow the published method (Xie,
Santurkar, Ma & Liang, "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023):

* features: bag of unigrams+bigrams hashed into ``n_buckets`` (DSIR's
  hashed n-gram parameterization);
* two smoothed bag-of-words models over the buckets — p̂ from the
  target corpus, q̂ from the raw corpus — each
  ``(count_b + λ) / (total + λ·B)``;
* per-doc log importance weight ``log w = Σ_b c_b·(log p̂_b − log q̂_b)``;
* selection: top-k by weight (deterministic twin, oracle-verified) or
  Gumbel-top-k resampling (the paper's sampling-without-replacement
  trick) with noise derived from ``xxhash64(id)`` so reruns are
  bit-identical.

100-TB shape: the corpus is feature-hashed ONCE (one bounded
higher-order transform + explode + hash-agg — word-count shape, uniform
keys, no Python in the plan); the two bucket-model tables are ≤
``n_buckets`` rows each and the log-ratio table broadcasts back for a
map-side join; selection is a top-k (TakeOrderedAndProject — no global
sort ever materializes).  Nothing is collected to the driver.

Integer-exact oracle discipline: ``ratio_micro`` (the per-bucket log
ratio in rounded micro-nats, BIGINT) makes the per-doc weight an
integer sum — order-independent, so Spark and the DuckDB oracle agree
bit-for-bit regardless of aggregation order (contract.py q_docs_dsir).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gumbel-noise quantization grid: residues of xxhash64 mod 2^20 map to
# (0,1) uniforms at ~1e-6 resolution — plenty for tie-free noise.
_GUMBEL_K = 1 << 20


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: F.length(t) > 0
    )


def hashed_gram_counts(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed unigram(+bigram) counts.

    One bounded transform builds the gram array (unigrams plus the
    len-1 bigram windows), one explode, one hash-agg on the uniform
    (id, bucket) key — the corpus is touched exactly once and no string
    survives past the xxhash64.

    Plan discipline (measured 6-30x on the 5k bench corpus, round 7):
    the TOKEN array is materialized as a column (interpreted HOF lambdas
    re-evaluate captured subexpressions per element — an inline token
    expression re-tokenizes the doc once per element_at), the GRAM
    expression is exploded inline over that attribute (never projected:
    an inferred generate filter would alias-substitute through the
    projection and rebuild everything per row below the exchange), and
    swingstream sessions exclude InferFiltersFromGenerate outright
    (session.py / contract._prep)."""
    toks = F.col("_toks")
    grams = toks
    if bigrams:
        # guard: sequence(1, 0) DESCENDS in Spark, so a 0/1-token doc
        # would index past the array — short docs get no bigrams
        bi = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(toks, bi)
    return (
        docs.select(
            F.col(id_col).alias("id"),
            _tokens(F.col(text_col)).alias("_toks"),
        )
        .select("id", F.explode(grams).alias("gram"))
        .select(
            "id",
            F.pmod(F.xxhash64("gram", F.lit(salt)), F.lit(n_buckets))
            .alias("bucket"),
        )
        .groupBy("id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def bucket_totals(counts: DataFrame) -> DataFrame:
    """(bucket, tot): global gram mass per bucket — ≤ n_buckets rows."""
    return counts.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("tot")
    )


def bucket_logratio(
    target_totals: DataFrame,
    raw_totals: DataFrame,
    n_buckets: int,
    smoothing: float = 1.0,
) -> DataFrame:
    """(bucket, logratio, ratio_micro): per-bucket
    ``log p̂ − log q̂`` under add-λ smoothing, plus the rounded
    micro-nat BIGINT twin (``floor(x·1e6 + 0.5)``) that keeps per-doc
    weight sums integer-exact.  Both model tables are tiny (≤ B rows);
    the scalar totals ride in on 1-row broadcast cross joins."""
    lam = float(smoothing)
    t = target_totals.select("bucket", F.col("tot").alias("t_cnt"))
    r = raw_totals.select("bucket", F.col("tot").alias("r_cnt"))
    t_sum = t.agg(F.sum("t_cnt").cast("double").alias("t_sum"))
    r_sum = r.agg(F.sum("r_cnt").cast("double").alias("r_sum"))
    joined = (
        r.join(t, "bucket", "full_outer")
        .crossJoin(F.broadcast(t_sum))
        .crossJoin(F.broadcast(r_sum))
    )
    logratio = F.log(
        (F.coalesce(F.col("t_cnt"), F.lit(0)).cast("double") + F.lit(lam))
        / (F.col("t_sum") + F.lit(lam * n_buckets))
    ) - F.log(
        (F.coalesce(F.col("r_cnt"), F.lit(0)).cast("double") + F.lit(lam))
        / (F.col("r_sum") + F.lit(lam * n_buckets))
    )
    return joined.select(
        "bucket",
        logratio.alias("logratio"),
        F.floor(logratio * 1e6 + F.lit(0.5)).cast("long").alias("ratio_micro"),
    )


def dsir_logweights(
    doc_counts: DataFrame,
    logratio: DataFrame,
    ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, logw_micro): per-document importance weight in micro-nats —
    ``Σ_b c_b · ratio_micro_b``, a pure BIGINT sum (order-independent).
    The log-ratio table broadcasts (≤ n_buckets rows), so the corpus
    side never re-shuffles beyond its own (id) hash-agg.  Docs with no
    grams (empty text) score 0 when an ``ids`` universe is supplied."""
    w = (
        doc_counts.join(
            F.broadcast(logratio.select("bucket", "ratio_micro")), "bucket"
        )
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("ratio_micro")).alias("logw_micro"))
    )
    if ids is None:
        return w
    return (
        ids.select(F.col(id_col).alias("id"))
        .join(w, "id", "left")
        .select(
            "id",
            F.coalesce("logw_micro", F.lit(0)).cast("long").alias("logw_micro"),
        )
    )


def _gumbel_micro(id_expr: Column, salt: str) -> Column:
    """Deterministic Gumbel(0,1) noise in micro-nats from the id hash:
    u = (residue + 0.5) / K  →  g = −ln(−ln u), scaled ×1e6 and floored
    — reruns are bit-identical, distinct salts decorrelate draws."""
    u = (
        F.pmod(F.xxhash64(id_expr.cast("string"), F.lit(salt)),
               F.lit(_GUMBEL_K)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_GUMBEL_K))
    return F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")


def dsir_select(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int = 4096,
    smoothing: float = 1.0,
    mode: str = "gumbel",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    threshold_micro: int | None = None,
) -> DataFrame:
    """The selected corpus slice, all columns unchanged.

    ``mode="gumbel"`` (the paper's resampling: top-k of
    ``logw + Gumbel noise``, deterministic here because the noise
    derives from the id hash) or ``mode="topk"`` (pure argmax of the
    weight — the deterministic twin the driver oracle verifies).
    Ties break on the id so the pick is total-ordered.

    Scale note: top-k compiles to TakeOrderedAndProject, which holds
    ``k`` (id, score) pairs per partition and at the driver — right for
    k up to ~1e6.  Selecting a large FRACTION of a 100-TB corpus should
    instead pass ``threshold_micro`` (pick it from a quantile of the
    weights): selection is then a pure filter on the score — no
    ordering, no driver state, ``k`` ignored."""
    if mode not in ("gumbel", "topk"):
        raise ValueError(f"mode must be 'gumbel' or 'topk': {mode!r}")
    raw_counts = hashed_gram_counts(
        docs, n_buckets, text_col=text_col, id_col=id_col, salt=salt
    )
    tgt_counts = hashed_gram_counts(
        target_docs, n_buckets, text_col=text_col, id_col=id_col, salt=salt
    )
    ratio = bucket_logratio(
        bucket_totals(tgt_counts), bucket_totals(raw_counts),
        n_buckets, smoothing,
    )
    w = dsir_logweights(raw_counts, ratio, ids=docs, id_col=id_col)
    score = F.col("logw_micro")
    if mode == "gumbel":
        score = score + _gumbel_micro(F.col("id"), salt + "-gumbel")
    scored = w.select("id", score.alias("_score"))
    if threshold_micro is not None:
        picked = scored.where(
            F.col("_score") >= F.lit(int(threshold_micro))
        ).select("id")
        # the picked side can be a large corpus fraction — equi-join on
        # the id, let AQE pick the strategy (no forced broadcast)
        return docs.join(picked.withColumnRenamed("id", id_col), id_col)
    picked = (
        scored.orderBy(F.desc("_score"), F.asc("id"))
        .limit(int(k))
        .select("id")
    )
    return docs.join(
        F.broadcast(picked.withColumnRenamed("id", id_col)), id_col
    )
