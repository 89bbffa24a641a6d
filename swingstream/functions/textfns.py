"""Text-analysis column expressions: host/lang derivation, token counting,
quality scoring, language ID — all built-in-function compositions (no
Python in the plan), each mirrored by ANSI SQL in the driver oracles.

SURVEY.md §2.2 P7, §2.7 F1 plus the training-data-pipeline text ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small + pinned so the DuckDB oracle can carry
# the identical lists inline.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "over"],
    "de": ["der", "die", "das", "und", "ist", "den", "von", "mit", "ueber"],
    "fr": ["le", "la", "les", "et", "est", "des", "dans", "par", "sur"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "sobre", "por"],
}


def host_of(url: Column) -> Column:
    """Hostname from a url — regexp, not parse_url, so DuckDB SQL matches."""
    return F.regexp_extract(url, r"^https?://([^/]+)", 1)


def tokens_of(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text => empty array."""
    return F.when(
        F.length(F.trim(text)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens_of(text))


# GPT-2-style pre-tokenizer pattern, restricted to the RE2-compatible
# subset (no lookarounds, ASCII classes) so Java regex (Spark) and RE2
# (DuckDB oracle) produce identical counts: contraction suffixes, a
# word/number/punct run with one optional leading space, or a
# whitespace run.  Alternation is leftmost-first in both engines, so
# a single space fuses into the following word exactly like the GPT-2
# " ?\p{L}+" branch; multi-space runs fall through to \s+ (same token
# COUNT as the GPT-2 "\s+(?!\S)" split, different boundary).
BPE_TOKEN_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: # matches of the GPT-2-style pre-tokenizer
    regex — the cheap LLM-budget estimator a training-data pipeline runs
    per document (whitespace token_count underestimates punctuation-heavy
    text)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def char_class_count(text: Column, char_class: str) -> Column:
    """# chars matching a regex class, via length-difference (JVM-side)."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


def digit_ratio(text: Column) -> Column:
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        char_class_count(text, "[0-9]") / F.length(text)
    )


def punct_ratio(text: Column) -> Column:
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        char_class_count(text, r"[!-/:-@\[-`{-~]") / F.length(text)
    )


def stopword_count(text: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    toks = tokens_of(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(text, lang) / n)


def quality_score(text: Column) -> Column:
    """Pinned quality heuristic: length, punctuation, digit, stopword mix.

    score = 0.4*min(len,500)/500 + 0.3*stop_en - 0.2*punct - 0.1*digit
    (clamped to [0,1]); formula duplicated verbatim in the SQL oracle.
    """
    raw = (
        0.4 * F.least(F.length(text), F.lit(500)) / 500.0
        + 0.3 * stopword_ratio(text, "en")
        - 0.2 * punct_ratio(text)
        - 0.1 * digit_ratio(text)
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID; ties broken by en>de>fr>es; no vote => zz."""
    scores = {lg: stopword_count(text, lg) for lg in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("zz")
    # reversed so earlier langs win ties (en checked last => wins equals)
    for lg in reversed(list(STOPWORDS)):
        out = F.when((best > 0) & (scores[lg] == best), F.lit(lg)).otherwise(out)
    return out


def shingle_digests(text: Column, n: int = 3) -> Column:
    """md5 digests of word n-gram shingles (rolling window over the
    whitespace tokenization; one whole-doc shingle when shorter than n).

    md5, not xxhash64, so the digest is directly SQL-oracle-able; the
    throughput path for near-dup discovery is operators.dedup's Arrow
    rolling-hash kernel — this is the FINGERPRINT form (stable content
    ids for lineage / incremental dedup)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))


def doc_fingerprint(text: Column, n: int = 3) -> Column:
    """Document fingerprint = lexicographic min shingle digest — the
    1-permutation MinHash over md5; equal fingerprints are near-dup
    candidates, stable under small edits away from the minimum."""
    return F.array_min(shingle_digests(text, n))


# Tracking params stripped by canonical_url — the standard analytics /
# click-id query keys that make otherwise-identical crawl URLs unique
# (each pattern anchored over the full "key=value" string; RE2 subset).
# Deliberately NOT stripped: bare "ref" (a functional routing/referral
# param on many sites — e.g. source listings, package registries —
# where distinct values are distinct pages); pass a wider pattern via
# canonical_url(strip_params_re=...) for corpora where it is known to
# be tracking-only.  "ref_src" stays: it is Twitter's share-widget
# attribution key (ref_src=twsrc%5E...), never a router.
TRACKING_PARAM_RE = (
    r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref_src|igshid)="
)


def canonical_url(url: Column, strip_params_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form of a crawl URL for url-keyed dedup: lowercased
    scheme + host, fragment dropped, tracking query params
    (``strip_params_re``, default TRACKING_PARAM_RE) removed, remaining
    params sorted, trailing '?' dropped — so the same page reached via
    different campaign links collapses to ONE dedup key.  Pure built-in
    composition (split/filter/array_sort/concat) — JVM-side, no
    shuffle, usable as the dedup key expression or in the admission
    gate.

    Parse is regex-based (scheme://host, then path, ?query, #fragment)
    to stay in whole-stage codegen; a url without a recognized
    http(s)://host prefix passes through with only fragment/tracking
    cleanup.  Case-folding is scheme + HOST only: path bytes and any
    userinfo (user:pass@) are case-sensitive per RFC 3986 and pass
    through verbatim.
    """
    no_frag = F.split(F.trim(url), "#").getItem(0)
    base = F.split(no_frag, r"\?").getItem(0)
    # everything after the FIRST '?' (minus the fragment already cut)
    query = F.when(
        F.length(no_frag) > F.length(base),
        F.substring(no_frag, F.length(base) + 2, F.length(no_frag)),
    ).otherwise(F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(strip_params_re),
        )
    )
    canon_query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept))
    ).otherwise(F.lit(""))
    scheme_host = F.regexp_extract(base, r"^((?i:https?)://[^/]+)", 1)
    # authority = scheme_host minus "scheme://"; lowercase only the part
    # after the LAST '@' (the host) — userinfo stays verbatim.  Greedy
    # "(.*@)" anchors the split at the last '@'; both patterns are in
    # the RE2-compatible subset (no lookarounds).
    scheme = F.regexp_extract(scheme_host, r"^((?i:https?)://)", 1)
    authority = F.substring(
        scheme_host, F.length(scheme) + 1, F.length(scheme_host)
    )
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    host = F.regexp_extract(authority, r"([^@]*)$", 1)
    canon_base = F.when(
        F.length(scheme_host) > 0,
        F.concat(
            F.lower(scheme),
            userinfo,
            F.lower(host),
            F.substring(base, F.length(scheme_host) + 1, F.length(base)),
        ),
    ).otherwise(base)
    return F.concat(canon_base, canon_query)
