"""Corpus-quality operators a 100-TB training-data pipeline runs after
dedup: intra-document repetition signals, corpus-level boilerplate
phrase mining, and PII detection/masking.

No reference-repo twin exists for these (mount empty; the reference is
a network-inference tool) — they are the standard web-text curation
stages published in the Gopher (Rae et al. 2021, §A1.1 repetition
filters) and CCNet/RefinedWeb pipelines, re-expressed as Catalyst
plans:

* ``repetition_stats`` — per-document duplicate-token/bigram fractions
  (the Gopher "repetition" quality gates).  Explode-based: tokens are
  exploded once, aggregated by (doc_id[, token]) — uniform shuffle
  keys, no per-row quadratic HOFs, window only WITHIN a document
  (bounded partitions), so the shape survives 100× scale-up.
* ``boilerplate_ngrams`` — corpus-wide template-phrase profile: token
  n-grams ranked by document frequency.  One explode + one hash
  aggregate on the n-gram string; top-k compiles to TakeOrderedAndProject
  (no global sort materialization).
* ``pii_scrub`` — email/phone counts + masked text as pure JVM-side
  regexp expressions (whole-stage codegen; no Python in the path).
  The regexes deliberately use the RE2-compatible subset that Java
  regex and DuckDB RE2 evaluate identically, so the oracle can replay
  the masking byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# RE2-compatible subset only (no backrefs/lookarounds): identical
# semantics under Java regex (Spark) and RE2 (DuckDB oracle).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def _tokens(text: Column) -> Column:
    """Whitespace tokens; empty/blank text yields an empty array (the
    split('') -> [''] artifact is filtered so counts are true zeros)."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: F.length(t) > 0
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (Gopher §A1.1 quality gates):

    * ``n_tokens`` — whitespace token count;
    * ``top_token_frac`` — occurrences of the most frequent token /
      n_tokens (0.0 for empty docs);
    * ``dup_bigram_frac`` — 1 − distinct_bigrams / total_bigrams
      (0.0 when fewer than 2 tokens).

    Shape: one explode, aggregates keyed on (doc_id[, token]) — both
    uniform — and a lag window PARTITIONED by doc_id (documents bound
    the partition, never the corpus).  A template-farm corpus skews
    the token key only per-document, not globally.
    """
    toks = docs.select(
        id_col, F.posexplode(_tokens(F.col(text_col))).alias("pos", "tok")
    )
    per_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    top = per_tok.groupBy(id_col).agg(
        F.max("c").alias("max_c"), F.sum("c").alias("n_tokens")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (
        toks.withColumn("nxt", F.lead("tok").over(w))
        .where(F.col("nxt").isNotNull())
        .select(id_col, F.concat_ws(" ", "tok", "nxt").alias("bigram"))
    )
    big = bigrams.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.count_distinct("bigram").alias("n_distinct_bigrams"),
    )
    return (
        docs.select(id_col)
        .join(top, id_col, "left")
        .join(big, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.col("max_c") / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_token_frac"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                1.0 - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate phrase mining: token ``n``-grams that
    appear in at least ``min_docs`` DISTINCT documents, ranked by
    document frequency — the profile a CCNet-style pipeline uses to
    strip template/navigation phrases.  Returns the top ``k`` as
    (ngram, n_docs, n_occurrences), deterministically ordered by
    (n_docs desc, n_occurrences desc, ngram).

    Shape: the n-gram array is built per-row with one bounded HOF over
    the token array (n string concats per token), exploded once, then
    ONE hash aggregate keyed on the n-gram — the same uniform-shuffle
    profile as a word-count; top-k compiles to TakeOrderedAndProject,
    so no global sort ever materializes.
    """
    # materialized tokens + inline gram explode (see dsir's plan
    # discipline note: an inline token expression re-tokenizes per
    # element inside the interpreted gram lambda; a projected gram
    # array trips the inferred generate filter — both measured 2-30x)
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(id_col, _tokens(F.col(text_col)).alias("_toks"))
        .select(id_col, F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(
            F.count_distinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), F.asc("ngram")
        )
        .limit(k)
    )


# Schema-metadata key pinning the thresholds a reject_reason column was
# produced under — quality_annotate's idempotence check reads it back.
_QUALITY_PARAMS_KEY = "swingstream.quality_annotate.params"


def quality_annotate(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_top_token_frac: float = 0.5,
    max_dup_bigram_frac: float = 0.5,
) -> DataFrame:
    """Annotate every document with a ``reject_reason`` column: the FIRST
    Gopher-style repetition gate it trips, in the fixed precedence
    (too_few_tokens, top_token_frac, dup_bigram_frac), or NULL when
    admitted.  Shape: ``repetition_stats`` (uniform per-doc aggregation)
    joined back on ``id_col`` — no collect, no skewed keys, identical
    profile per micro-batch and per batch.

    Idempotent on pre-annotated input: a frame already carrying a
    ``reject_reason`` column THAT THIS FUNCTION PRODUCED UNDER THE SAME
    THRESHOLDS passes through unchanged, so a gated ingest can annotate
    each micro-batch ONCE (and persist it) and feed the same frame to
    both ``quality_gate`` and ``quality_rejections`` without paying the
    explode + aggregations twice (r5 advice).  The thresholds are
    pinned in the column's schema metadata (survives persist/parquet
    round trips); a frame annotated under DIFFERENT thresholds, or
    source data that coincidentally carries a ``reject_reason`` column,
    raises instead of silently gating on stale or foreign verdicts
    (r6 advice)."""
    params = {
        "min_tokens": int(min_tokens),
        "max_top_token_frac": float(max_top_token_frac),
        "max_dup_bigram_frac": float(max_dup_bigram_frac),
    }
    if "reject_reason" in docs.columns:
        meta = docs.schema["reject_reason"].metadata or {}
        prior = meta.get(_QUALITY_PARAMS_KEY)
        if prior is None:
            raise ValueError(
                "input already carries a 'reject_reason' column that "
                "quality_annotate did not produce (no threshold metadata) "
                "— rename or drop it before annotating"
            )
        if prior != params:
            raise ValueError(
                "input was annotated under different thresholds: "
                f"existing {prior} vs requested {params} — re-annotate "
                "from the raw frame (drop 'reject_reason') or call with "
                "the original thresholds"
            )
        return docs
    rep = repetition_stats(docs, text_col=text_col, id_col=id_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_few_tokens"))
        .when(
            F.col("top_token_frac") > max_top_token_frac,
            F.lit("top_token_frac"),
        )
        .when(
            F.col("dup_bigram_frac") > max_dup_bigram_frac,
            F.lit("dup_bigram_frac"),
        )
    )
    return docs.join(
        rep.select(
            id_col,
            reason.alias(
                "reject_reason", metadata={_QUALITY_PARAMS_KEY: params}
            ),
        ),
        [id_col],
        "inner",
    )


def quality_gate(
    docs: DataFrame,
    *,
    mask_pii: bool = True,
    mask_patterns: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    **annotate_kw,
) -> DataFrame:
    """Corpus admission gate: drop documents failing the
    ``quality_annotate`` thresholds and mask PII in the survivors' text.
    All other columns pass through unchanged.

    ``mask_patterns`` overrides the masked (pattern, placeholder) chain;
    the default stays the legacy email/phone pair (golden-pinned).  Pass
    e.g. ``[(p, ph) for _, p, ph in pii.PII_PATTERNS]`` to mask the full
    canonical set (adds IPv4) at the gate."""
    from swingstream.operators.pii import redact

    ann = quality_annotate(docs, text_col=text_col, **annotate_kw)
    out = ann.where(F.col("reject_reason").isNull()).drop("reject_reason")
    if mask_pii:
        # r8 (r7 ADVICE): test None, not truthiness — an explicit empty
        # list means "mask nothing", not "fall back to the legacy chain"
        reps = (
            [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>")]
            if mask_patterns is None
            else mask_patterns
        )
        out = out.withColumn(text_col, redact(F.col(text_col), reps))
    return out


def quality_rejections(docs: DataFrame, **kw) -> DataFrame:
    """The rejected complement of ``quality_gate`` with its
    ``reject_reason`` — what an audited curation pipeline quarantines
    instead of silently dropping."""
    ann = quality_annotate(docs, **kw)
    return ann.where(F.col("reject_reason").isNotNull())


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + masking: per document, the count of email and
    phone-number matches and the text with both replaced by
    ``<EMAIL>`` / ``<PHONE>`` placeholders (emails masked first; the
    oracle replays the same order).  Pure regexp column expressions —
    JVM-side, whole-stage codegen, embarrassingly parallel; the RE2
    subset keeps Spark and the DuckDB oracle byte-identical.

    Legacy gate-embedded form, schema pinned by the q_docs_textquality
    oracle; the regex engine lives in operators/pii.py (the canonical
    standalone surface with IPv4 + stats is ``pii.pii_redact``)."""
    from swingstream.operators.pii import count_matches, redact

    t = F.col(text_col)
    return docs.select(
        id_col,
        count_matches(t, EMAIL_RE).alias("n_emails"),
        count_matches(t, PHONE_RE).alias("n_phones"),
        redact(
            t, [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>")]
        ).alias("text_masked"),
    )


# ---------------------------------------------------------------------------
# URL / domain blocklist filtering — the admission stage that runs
# BEFORE any text is even extracted (RefinedWeb §3.1 runs a 4.6M-domain
# blocklist + URL word-score first; it is the cheapest reject in the
# pipeline).  Composes into run_corpus_stream_with_compaction(gate_fn=)
# like the other admission transforms; per-doc predicate => commutes
# with micro-batching by construction.
# ---------------------------------------------------------------------------


def host_suffixes(host: Column) -> Column:
    """All dot-suffix chains of a hostname: a.b.example.com →
    [a.b.example.com, b.example.com, example.com, com].  Blocking
    "example.com" must also block its subdomains; matching by suffix
    EXPLODE + equi-join keeps the probe a uniform hash join at any
    blocklist size (an endswith condition against N patterns would be
    a broadcast nested-loop — O(rows × N)).  Bounded by the label
    count (≤ ~10 on real hostnames).  Userinfo and port are stripped
    first — a blocklisted domain must match example.com:8080 and
    user@example.com too."""
    bare = F.substring_index(F.substring_index(host, "@", -1), ":", 1)
    labels = F.split(F.lower(bare), r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n), "."),
    )


def url_gate(
    docs: DataFrame,
    blocked_hosts: DataFrame | None = None,
    blocked_url_re: str | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Admission filter on the URL alone: a doc is rejected when any
    dot-suffix of its hostname appears in ``blocked_hosts`` (one-column
    ``host`` frame; subdomains of a blocked domain are blocked) or when
    the url matches ``blocked_url_re`` (RE2-compatible subset, like
    every other cross-engine regex here).  Shape: one suffix explode
    (≤ ~10 rows/doc) + one broadcast-sized equi anti-join on the
    blocklist + one JVM regexp filter — no text is touched, so the
    reject costs nothing downstream.

    At a 4.6M-domain blocklist the broadcast still fits (~100 MB of
    short strings); beyond that drop the broadcast hint and let the
    suffix equi-join shuffle on its uniform key.
    """
    from swingstream.functions.textfns import host_of

    out = docs
    if blocked_hosts is not None:
        bl = blocked_hosts.select(F.lower("host").alias("_ug_sfx")).distinct()
        hits = (
            docs.select(
                F.col(url_col),
                F.explode(
                    host_suffixes(host_of(F.col(url_col)))
                ).alias("_ug_sfx"),
            )
            .join(F.broadcast(bl), "_ug_sfx", "left_semi")
            .select(url_col)
            .distinct()
        )
        out = out.join(hits, url_col, "left_anti")
    if blocked_url_re is not None:
        out = out.where(~F.lower(F.col(url_col)).rlike(blocked_url_re))
    return out


def url_rejections(
    docs: DataFrame,
    blocked_hosts: DataFrame | None = None,
    blocked_url_re: str | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Quarantine complement of ``url_gate`` (same inputs), tagged with
    the first rule that tripped — blocked_host outranks blocked_url,
    mirroring quality_annotate's fixed precedence."""
    reason = F.lit(None).cast("string")
    if blocked_url_re is not None:
        reason = F.when(
            F.lower(F.col(url_col)).rlike(blocked_url_re),
            F.lit("blocked_url"),
        ).otherwise(reason)
    from swingstream.functions.textfns import host_of

    if blocked_hosts is not None:
        bl = blocked_hosts.select(F.lower("host").alias("_ug_sfx")).distinct()
        hosts_hit = (
            docs.select(
                F.col(url_col).alias("_ug_url"),
                F.explode(
                    host_suffixes(host_of(F.col(url_col)))
                ).alias("_ug_sfx"),
            )
            .join(F.broadcast(bl), "_ug_sfx", "left_semi")
            .select("_ug_url")
            .distinct()
            .withColumn("_ug_hosthit", F.lit(True))
        )
        docs = docs.join(
            hosts_hit, docs[url_col] == hosts_hit["_ug_url"], "left"
        ).drop("_ug_url")
        reason = F.when(F.col("_ug_hosthit"), F.lit("blocked_host")).otherwise(
            reason
        )
        return (
            docs.withColumn("reject_reason", reason)
            .where(F.col("reject_reason").isNotNull())
            .drop("_ug_hosthit")
        )
    return docs.withColumn("reject_reason", reason).where(
        F.col("reject_reason").isNotNull()
    )
