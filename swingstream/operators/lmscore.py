"""Unigram language-model perplexity scoring — the CCNet-style "how
fluent is this page" filter: train a smoothed unigram LM on a trusted
reference slice, score every corpus document by its average per-token
negative log-likelihood, and cut the corpus into head/middle/tail
quality buckets.

No reference-repo twin exists (mount empty) — the semantics follow the
published pipeline (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020: a KenLM scores
each paragraph and the corpus is split at the 33/66 perplexity
percentiles into head/middle/tail).  A 5-gram KenLM is out of scope for
a from-scratch engine; the unigram tier keeps the pipeline shape (train
→ score → bucket) with a model that is itself a Catalyst plan:

* **train** — token counts over the reference slice are the word-count
  shape (one bounded split + explode + hash-agg, uniform keys); add-one
  smoothing ``p(t) = (cnt+1)/(total+V+1)`` with the +1 mass reserved
  for out-of-vocabulary tokens; an optional ``max_vocab`` cap keeps the
  top-V tokens and folds the tail into OOV (at web scale the vocab is
  ~10^8 — cap it so the model table stays broadcastable);
* **score** — each document's tokens join the model table map-side
  (broadcast — the model is ≤V rows) and aggregate per doc: ONE shuffle
  on doc_id, the text column never shuffles, no Python anywhere;
* **integer-exact oracle discipline** (same as operators/dsir.py):
  per-token NLL is quantized to micro-nats
  (``FLOOR(-ln(p)·1e6 + 0.5)`` as BIGINT) so the per-doc sum is an
  integer — order-independent, and the driver's DuckDB oracle replays
  it bit-for-bit regardless of aggregation order;
* **bucket** — ``exact=True`` ranks with ``ntile(n)`` under the total
  order (avg_nll_micro, doc_id): deterministic, oracle-replayable, but
  a single-partition global sort — the CORRECTNESS twin.  At scale use
  ``exact=False``: bucket edges from ``approx_percentile`` broadcast
  back as a pure column comparison — no global sort, corpus scanned
  once more (the standard approx-quantile cut; edges are approximate,
  membership given the edges is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NLL_MICRO = 1_000_000  # micro-nat quantization grid (matches dsir.py)


def _tokens(text: Column) -> Column:
    # the repo-wide whitespace tokenizer (textfns/dsir): lower, split on
    # \s+, drop empties — DuckDB mirror is
    # string_split_regex(TRIM(LOWER(text)), '\s+')
    return F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: F.length(t) > 0
    )


def _nll_micro(p: Column) -> Column:
    return F.floor(-F.ln(p) * NLL_MICRO + F.lit(0.5)).cast("long")


def unigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the smoothed unigram model on a reference slice.

    Returns ``(model, consts)``: ``model`` is (token, nll_micro BIGINT)
    — per-token negative log-likelihood in micro-nats under add-one
    smoothing — and ``consts`` is one row (total BIGINT, vocab BIGINT,
    oov_nll_micro BIGINT) carrying the OOV cost.  ``max_vocab`` keeps
    the top-V tokens (count desc, token asc — deterministic) and folds
    the tail's mass into OOV by simply dropping the rows: the smoothing
    denominator uses the CAPPED vocab + capped total so probabilities
    still sum to ≤1.

    Scale note: the deterministic cap ranks the vocab with a global
    row_number — a single-partition window over |vocab| rows, fine to
    ~10^7 distinct tokens.  At web-scale vocab (~10^8+) swap the rank
    for a count threshold (``cnt >= approx Vth largest``, one
    approx-quantile pass) — approximate at the boundary, no global sort.
    """
    counts = (
        ref_docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    if max_vocab is not None:
        from pyspark.sql.window import Window

        counts = (
            counts.withColumn(
                "_rk",
                F.row_number().over(
                    Window.orderBy(F.desc("cnt"), F.asc("token"))
                ),
            )
            .where(F.col("_rk") <= max_vocab)
            .drop("_rk")
        )
    consts = counts.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    ).withColumn(
        "oov_nll_micro",
        _nll_micro(
            F.lit(1.0) / (F.col("total") + F.col("vocab") + F.lit(1)).cast("double")
        ),
    )
    model = counts.crossJoin(F.broadcast(consts.select("total", "vocab"))).select(
        "token",
        _nll_micro(
            (F.col("cnt") + F.lit(1)).cast("double")
            / (F.col("total") + F.col("vocab") + F.lit(1)).cast("double")
        ).alias("nll_micro"),
    )
    return model, consts


def lm_score(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int | None = None,
) -> DataFrame:
    """Per-document LM score: (id, n_tokens, nll_micro_sum,
    avg_nll_micro) — all BIGINT, lower avg = more like the reference.
    Empty docs score NULL (no tokens to average).

    Raises on a token-free reference (an over-aggressive slice filter
    would otherwise silently score the whole corpus NULL).  The 1-row
    consts collect that powers the check also embeds the OOV cost as a
    literal — one fewer broadcast subtree re-evaluating the reference
    counts."""
    model, consts = unigram_lm(ref_docs, text_col=text_col, max_vocab=max_vocab)
    c = consts.collect()[0]
    if not c.total:
        raise ValueError(
            "lm_score: the reference slice contains no tokens — every "
            "corpus doc would silently score NULL; fix the reference "
            "filter (or the text column) instead"
        )
    toks = docs.select(
        F.col(id_col).alias("_lm_id"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    scored = (
        toks.join(F.broadcast(model), "token", "left")
        .select(
            "_lm_id",
            F.coalesce(
                "nll_micro", F.lit(int(c.oov_nll_micro)).cast("long")
            ).alias("tok_nll"),
        )
        .groupBy("_lm_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("tok_nll").cast("long").alias("nll_micro_sum"),
        )
        .withColumn(
            "avg_nll_micro",
            F.floor(
                F.col("nll_micro_sum").cast("double") / F.col("n_tokens")
            ).cast("long"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(scored, docs[id_col] == scored["_lm_id"], "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "nll_micro_sum",
            "avg_nll_micro",
        )
    )


def lm_perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    id_col: str = "doc_id",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Add ``ppl_bucket`` (1=head … n=tail, CCNet convention: bucket 1
    is the lowest — most reference-like — average NLL).  NULL-scored
    (empty) docs land in the tail bucket.

    ``exact=True`` is the oracle-replayable twin: ``ntile(n)`` under the
    total order (avg_nll_micro, id) — a single-partition window, fine up
    to ~10^8 rows of SCORES (the text is long gone by now).  At 10^12
    docs use ``exact=False``: bucket edges from one approx-percentile
    aggregate broadcast back as a column comparison — no global sort.
    """
    filled = scored.withColumn(
        "_lm_key",
        F.coalesce(F.col("avg_nll_micro"), F.lit(1 << 62)).cast("long"),
    )
    if exact:
        from pyspark.sql.window import Window

        out = filled.withColumn(
            "ppl_bucket",
            F.ntile(n_buckets)
            .over(Window.orderBy(F.asc("_lm_key"), F.asc(id_col)))
            .cast("long"),
        )
        return out.drop("_lm_key")
    edges = filled.agg(
        F.percentile_approx(
            "_lm_key",
            [i / n_buckets for i in range(1, n_buckets)],
            accuracy,
        ).alias("edges")
    )
    out = (
        filled.crossJoin(F.broadcast(edges))
        .withColumn(
            "ppl_bucket",
            # r8 (r7 ADVICE): NULL-scored docs get the tail bucket
            # EXPLICITLY — when >= 1/n_buckets of docs are NULL-scored
            # the top approx-percentile edge equals the 1<<62 sentinel
            # and the strict > comparison would drop them out of the
            # tail, contradicting the documented invariant.
            F.when(
                F.col("avg_nll_micro").isNull(),
                F.lit(int(n_buckets)).cast("long"),
            ).otherwise(
                F.aggregate(
                    "edges",
                    F.lit(1).cast("long"),
                    lambda acc, e: acc
                    + (F.col("_lm_key") > e).cast("long"),
                ).cast("long")
            ),
        )
        .drop("edges")
    )
    return out.drop("_lm_key")
