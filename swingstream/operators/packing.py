"""Deterministic sequence packing — the last stage of a training-data
pipeline: lay the sampled corpus out as fixed-size token blocks
(GPT-style concat-then-chunk), assigning every document its byte/token
span in a reproducible global order so any worker can materialize any
block independently.

No reference-repo twin exists (mount empty) — the semantics are the
standard packing layout (documents concatenated in a deterministic
order, block boundaries cut every ``block_tokens``), re-expressed as a
Catalyst plan:

* documents are sharded by ``pmod(xxhash64(id, salt), n_shards)`` —
  shards are the unit of parallel packing (each shard's layout is
  independent), sized so one shard's token mass fits one writer task;
  at 100 TB you raise ``n_shards``, never the per-task state;
* within a shard the order is ``(xxhash64(id, salt||'-order'), id)`` —
  a deterministic pseudo-random interleave (adjacent crawl pages land
  in different neighborhoods, the standard shuffle-before-pack), and
  the exclusive prefix-sum of token counts gives each doc its
  ``start_tok`` offset;
* block ids are pure integer arithmetic (``start div block_tokens``),
  so the whole layout — offsets, first/last block per doc — replays
  bit-for-bit in the DuckDB oracle from the staged key table.

Shape: one narrow projection, ONE shuffle keyed on the uniform shard
column, a per-shard window prefix-sum (shard-bounded partitions), no
collect, no Python.  The layout table is metadata (id, shard, offsets)
— the text itself is only touched by the writer that materializes
blocks, reading each doc once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text):
    """Whitespace tokens, blank-safe — the ONE tokenization both the
    layout (token counts) and the materializer (slices) must share, or
    offsets and text would disagree."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: F.length(t) > 0
    )


def with_pack_keys(
    docs: DataFrame,
    n_shards: int = 64,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """(id_col, shard, order_key, n_tokens): the deterministic packing
    keys.  ``token_col`` supplies a precomputed token count (e.g. from
    the quality-annotation pass); otherwise whitespace tokens are
    counted here.  Pure column expressions — no shuffle yet."""
    if token_col is not None:
        n_tokens = F.col(token_col).cast("long")
    else:
        n_tokens = F.size(_tokens(F.col(text_col))).cast("long")
    sid = F.col(id_col).cast("string")
    return docs.select(
        id_col,
        F.pmod(F.xxhash64(sid, F.lit(salt)), F.lit(n_shards)).alias("shard"),
        F.xxhash64(sid, F.lit(salt + "-order")).alias("order_key"),
        n_tokens.alias("n_tokens"),
    )


def pack_blocks_from_keys(
    keys: DataFrame,
    block_tokens: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Everything downstream of the hashing: per-shard exclusive
    prefix-sum over the deterministic order, then integer block
    arithmetic.  Split out so the driver's staged-key oracle
    (contract.py q_docs_pack) hash-verifies exactly this relational
    remainder.  Returns per doc: shard, n_tokens, ``start_tok`` (offset
    of the doc's first token in its shard's concatenation),
    ``first_block``/``last_block`` (the block range the doc spans —
    a doc straddles a boundary iff first != last; an empty doc spans
    just the block at its offset)."""
    w = (
        Window.partitionBy("shard")
        .orderBy("order_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    b = int(block_tokens)
    return (
        keys.select(id_col, "shard", "n_tokens", start)
        .select(
            id_col,
            "shard",
            "n_tokens",
            "start_tok",
            F.expr(f"start_tok div {b}").alias("first_block"),
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(start_tok + n_tokens - 1) div {b}"),
            )
            .otherwise(F.expr(f"start_tok div {b}"))
            .alias("last_block"),
        )
    )


def pack_blocks(
    docs: DataFrame,
    block_tokens: int = 2048,
    n_shards: int = 64,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Deterministic packing layout for the corpus: every document's
    shard, token offset, and block span under GPT-style
    concat-then-chunk packing at ``block_tokens`` per block."""
    keys = with_pack_keys(
        docs, n_shards=n_shards, token_col=token_col,
        text_col=text_col, id_col=id_col, salt=salt,
    )
    return pack_blocks_from_keys(keys, block_tokens, id_col=id_col)


def materialize_blocks(
    docs: DataFrame,
    block_tokens: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
    keys: DataFrame | None = None,
) -> DataFrame:
    """Materialize the packed blocks themselves: (shard, block_id,
    n_tokens, text) where every block carries exactly ``block_tokens``
    whitespace tokens of the shard's concatenation except the last
    block of each shard.  The layout (``pack_blocks``) tells each
    document which blocks it spans; documents straddling a boundary
    contribute a token-array SLICE to each side, so no block ever
    exceeds its budget.

    Shape: layout join (id-keyed equi-join), one explode bounded by
    blocks-per-doc (≤ n_tokens/block_tokens + 1 — a doc's own length,
    never the corpus), one shuffle keyed on the uniform (shard,
    block_id), and a per-block bounded ordered reassembly — the same
    collect_list/array_sort profile as line_dedup's per-doc rebuild.
    Each doc's text is read once; no collect, no Python.

    ``keys`` overrides the packing-key frame (id, shard, order_key,
    n_tokens) — the driver's staged-key oracle (contract.py
    q_docs_pack_blocks) injects the staged table here so both engines
    derive the layout from identical hashes.
    """
    b = int(block_tokens)
    if keys is None:
        keys = with_pack_keys(
            docs, n_shards=n_shards, text_col=text_col,
            id_col=id_col, salt=salt,
        )
    layout = pack_blocks_from_keys(keys, b, id_col=id_col)
    toked = docs.select(id_col, _tokens(F.col(text_col)).alias("_toks"))
    frags = (
        toked.join(layout, id_col)
        .where(F.col("n_tokens") > 0)
        .select(
            "shard",
            "start_tok",
            "_toks",
            "n_tokens",
            F.explode(
                F.sequence("first_block", "last_block")
            ).alias("block_id"),
        )
        .select(
            "shard",
            "block_id",
            "start_tok",
            # the doc-local token span falling inside this block:
            # [max(0, block_id*b - start), min(n, (block_id+1)*b - start))
            F.slice(
                "_toks",
                F.greatest(
                    F.lit(1),
                    (F.col("block_id") * b - F.col("start_tok") + 1)
                    .cast("int"),
                ),
                (
                    F.least(
                        F.col("n_tokens"),
                        (F.col("block_id") + 1) * b - F.col("start_tok"),
                    )
                    - F.greatest(
                        F.lit(0), F.col("block_id") * b - F.col("start_tok")
                    )
                ).cast("int"),
            ).alias("_frag"),
        )
    )
    return (
        frags.groupBy("shard", "block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("start_tok", "_frag"))),
                    lambda s: s["_frag"],
                )
            ).alias("_block_toks")
        )
        .select(
            "shard",
            "block_id",
            F.size("_block_toks").cast("long").alias("n_tokens"),
            F.array_join("_block_toks", " ").alias("text"),
        )
    )
