#!/usr/bin/env python
"""swingstream bench harness (SURVEY.md §7 M6).

Runs the headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the streaming
SWING pipeline (watermarked salted feature agg -> stateful per-host
regression scoring) over a deterministic synthetic pages stream, and
prints ONE JSON line:

  {"metric": ..., "value": <total wall sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "streaming": {docs, wall_sec, docs_per_sec}}

followed by a compact summary line carrying the same contract keys —
the LAST line of output, so a tail-truncating consumer (the driver
keeps 2,000 bytes) always sees the headline value, per-query walls,
streaming docs/s, the host-contention calibration, and the latest
scaling-gate row.

Scaling-efficiency evidence (local[8] vs local[32] per the driver
instruction — no real cluster in sandbox) is produced by
BENCH/scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_orders",
    "q05_region_volume",
    "q_rollup_customers",
    "q_topk_parts_per_brand",
    "q_moving_avg",
    "q_sessions",
    "q_tumbling_events",
    "q_sliding_events",
    "q_json_props",
    "q_docs_quality",
    "q_docs_langid",
    "q_emb_topk",
]


def _realistic_docs_path(n_docs: int = 5000) -> str:
    """Cached realistic Zipf-vocabulary corpus (fixtures.gen_documents).

    The driver's synthetic documents table draws from a ~15-word
    vocabulary — every doc is a near-dup of every other and LSH banding
    degenerates to O(n²) candidates, benching the fixture rather than
    the operator.  Dedup/similarity throughput is measured here on a
    realistic corpus; correctness on the driver tables stays oracle-
    checked at sf0.01.
    """
    from swingstream.fixtures import gen_documents

    path = os.path.join(tempfile.gettempdir(), f"swingstream-docs-real-{n_docs}.parquet")
    if not os.path.exists(path):
        gen_documents(n_docs=n_docs).to_parquet(path, index=False)
    return path


def _dedup_similarity(spark, sf):
    """Full-size dedup/near-dup operators — no row-count slices.

    Returns BUILDER thunks, one per query: the discovery ops run their
    eager candidate-bound guard at construction, so building the whole
    dict per timing would charge every op's guard to whichever query is
    being timed."""
    from swingstream.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs_lsh,
        simhash_neardup_pairs,
    )
    from swingstream.operators.similarity import neardup_pairs_blas

    # the fixture is one small parquet file => one input partition; fan
    # out so the signature kernels use every core (real corpora arrive
    # pre-partitioned — this shuffle is a fixture artifact, measured in)
    def docs():
        return spark.read.parquet(_realistic_docs_path()).repartition(64)

    return {
        "q_docs_minhash_lsh_5k":
            lambda: minhash_lsh_pairs(docs(), jaccard_threshold=0.5),
        # r4: scale-safe discovery default (max_hamming=3, 4x16-bit Manku
        # bands + candidate guard) — earlier rounds benched the retired
        # hamming<=8 / 9x7-band config, so walls are not like-for-like
        "q_docs_simhash_5k": lambda: simhash_neardup_pairs(docs()),
        "q_docs_ngram_jaccard_lsh_5k":
            lambda: ngram_jaccard_pairs_lsh(docs(), threshold=0.8),
        "q_emb_neardup_blas": lambda: neardup_pairs_blas(
            spark.read.parquet(f"{sf}/embeddings.parquet"), threshold=0.3),
    }

def _textquality_extras(spark):
    """Round-5 corpus-quality ops, benched on the same realistic 5k
    Zipf corpus as the dedup ops.  Recorded under `queries_extra` —
    EXCLUDED from the round-comparable `value` sum (the headline set is
    frozen at the round-3 protocol; extras get walls without breaking
    round-over-round comparability)."""
    from swingstream.operators.textquality import (
        boilerplate_ngrams,
        pii_scrub,
        repetition_stats,
    )

    def docs():
        return spark.read.parquet(_realistic_docs_path()).repartition(64)

    return {
        "q_docs_repetition_5k": lambda: repetition_stats(docs()),
        "q_docs_boilerplate_5k": lambda: boilerplate_ngrams(docs()),
        "q_docs_pii_5k": lambda: pii_scrub(docs()),
    }


def _curation_extras(spark):
    """Round-6 curation ops on the same realistic 5k Zipf corpus —
    recorded under `queries_extra` (headline set frozen at round 3)."""
    from pyspark.sql import functions as F

    from swingstream.operators.decontam import decontaminate
    from swingstream.operators.dedup import line_dedup, window_dedup
    from swingstream.operators.domains import host_cap
    from swingstream.operators.dsir import dsir_select
    from swingstream.operators.lmscore import lm_perplexity_buckets, lm_score
    from swingstream.operators.packing import materialize_blocks, pack_blocks
    from swingstream.operators.quality_clf import (
        quality_clf_scores,
        train_quality_classifier,
    )
    from swingstream.operators.sampling import token_budget_sample

    def docs():
        return spark.read.parquet(_realistic_docs_path()).repartition(64)

    _qclf_cache: dict = {}

    def _qclf_model():
        if "m" not in _qclf_cache:
            dd = docs()
            _qclf_cache["m"] = train_quality_classifier(
                dd.where(F.col("doc_id") % 5 == 0),
                dd.where(F.col("doc_id") % 5 != 0),
                n_buckets=4096, max_train_docs=500, n_iter=100,
            )
        return _qclf_cache["m"]

    def docs_with_lines():
        # the Zipf corpus is single-line; plant a boilerplate line on
        # every 3rd doc so the strip path does real work
        return docs().withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 3 == 0,
                       F.lit("\nsubscribe to our newsletter today"))
                .otherwise(F.lit("")),
            ),
        )

    return {
        "q_docs_decontam_5k": lambda: decontaminate(
            docs(), docs().where(F.col("doc_id") % 10 == 0), n=8),
        "q_docs_sample_5k": lambda: token_budget_sample(
            docs(), ["lang"], "n_chars", budget_per_stratum=100_000),
        "q_docs_line_dedup_5k": lambda: line_dedup(
            docs_with_lines(), max_docs_per_line=4),
        # r7: the packing stage's wall is tracked round-over-round like
        # the other curation extras (r6 VERDICT #4)
        "q_docs_pack_5k": lambda: pack_blocks(
            docs(), block_tokens=2048, n_shards=64),
        "q_docs_pack_blocks_5k": lambda: materialize_blocks(
            docs(), block_tokens=2048, n_shards=64),
        # r7: DSIR importance-weighted selection (target = every 5th doc)
        "q_docs_dsir_5k": lambda: dsir_select(
            docs(), docs().where(F.col("doc_id") % 5 == 0),
            k=1000, n_buckets=4096, mode="gumbel"),
        # r7: trained-classifier scoring — the model is fit ONCE (cached
        # closure: training is the bounded-sample stage, the timed wall
        # is the corpus-wide scoring pass, the part that scales)
        "q_docs_quality_clf_5k": lambda: quality_clf_scores(
            docs(), _qclf_model()),
        # r7: ExactSubstr-style token-window dedup (keep-first, mod-4
        # sampled windows — the scale configuration)
        "q_docs_window_dedup_5k": lambda: window_dedup(
            docs(), k=8, sample_p=4),
        # r7: per-domain cap — hash-order survivors, 60 docs per lang
        # host (the Zipf corpus has 5 langs, all over-cap ⇒ the rank
        # path does real work; the broadcast fast path is plan-tested)
        "q_docs_host_cap_5k": lambda: host_cap(
            docs(), cap=60, host_col="lang"),
        # r7: unigram LM perplexity — train on every 5th doc, score all,
        # approx-percentile head/middle/tail cut (the scale path; the
        # exact ntile twin is the oracle's)
        "q_docs_lm_ppl_5k": lambda: lm_perplexity_buckets(
            lm_score(docs(), docs().where(F.col("doc_id") % 5 == 0)),
            3, exact=False),
    }


# Sized so the pipeline is CPU-bound rather than micro-batch-overhead
# bound at local[32] AND so parallel work dominates the ~15 s of per-run
# fixed cost at the local[2] scaling level (efficiency >= 0.8 needs
# parallel core-seconds >= ~22x fixed): ~4.8M docs => ~1.2M docs per
# 16-file trigger, 128 hosts => >=32-way parallel stateful scoring
BENCH_STREAM_SPEC = dict(
    n_hosts=128, n_buckets=360, base_docs_per_bucket=96, hot_factor=8
)


def _bench_stream_dir() -> tuple[str, int]:
    """Deterministic pages stream fixture, cached under /tmp."""
    from swingstream.fixtures import PagesSpec, gen_pages, write_pages_stream_dir

    spec = PagesSpec(**BENCH_STREAM_SPEC)
    key = "-".join(f"{k}{v}" for k, v in sorted(BENCH_STREAM_SPEC.items()))
    root = os.path.join(tempfile.gettempdir(), f"swingstream-bench-{key}")
    meta = root + ".meta.json"  # sibling — a non-parquet file inside the
    # dir would be picked up by the file-stream source
    if os.path.exists(meta):
        with open(meta) as fh:
            return root, json.load(fh)["n_docs"]
    if os.path.exists(root):
        shutil.rmtree(root)
    df = gen_pages(spec)
    write_pages_stream_dir(df, root, n_files=64)
    with open(meta, "w") as fh:
        json.dump({"n_docs": len(df)}, fh)
    return root, len(df)


def _host_calibration() -> dict:
    """Contention audit stamped into the bench output (r4 VERDICT #1: a
    contended driver run was indistinguishable from a code regression in
    BENCH_rN.json — the scaling runs carried calibrations, the
    per-query/streaming sections did not).

    r6 (r5 VERDICT #1): stamped TWICE — before the per-query section and
    after the streaming section — because one stamp is a single point in
    time: a contention burst landing mid-run (the r5 run-A failure mode,
    streaming repeats 41.9/118.1 s around a clean-looking stamp) is
    invisible to it, but lands BETWEEN two readings.  A run whose pre
    and post stamps are both ~1.0 is cleanly comparable; one whose
    stamps disagree localizes the burst to its own window.

    Reuses BENCH/scaling.py's burns: raw-CPU hash throughput at 1 and 4
    workers (their ratio/4 = the host's own parallel ceiling, ~1.0 quiet,
    0.90 observed under co-tenant load in r4) plus one 4-worker
    streaming-memcpy bandwidth sample.  ~15 s per stamp.
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "BENCH"))
    from scaling import bandwidth_calibration, cpu_calibration

    cpu = cpu_calibration([1, 4])
    bw = bandwidth_calibration([4])
    return {
        "cpu_hash_ops_per_sec": cpu,
        "hardware_scaling_efficiency_1_4": round(cpu[4] / cpu[1] / 4, 3),
        "bandwidth_gb_per_sec_4w": bw[4],
    }


def _ingest_stream_dir() -> tuple[str, int]:
    """Cached corpus-ingest stream fixture: 8 batches × the realistic
    5k Zipf corpus with fresh ids; from batch 1 on, 10% of each batch
    re-crawls batch-0 text byte-exactly (the digest index's job) and a
    disjoint 10% re-crawls it with a two-token edit (jaccard ≈ 0.97 —
    the minhash index's job; the rewrites repeat across batches but
    their originals were never admitted, so every copy is rejected by
    the MINHASH probe, not the digest).  Returns (dir, total_docs)."""
    from swingstream.fixtures import gen_documents

    n, n_batches = 5000, 8
    # v2 in the cache key = the generation recipe version: a stale dir
    # written by a DIFFERENT recipe under the same name would silently
    # change what the sidecar measures (bump on any fixture change)
    root = os.path.join(tempfile.gettempdir(),
                        f"swingstream-ingest-v2-{n_batches}x{n // 1000}k")
    meta = root + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as fh:
            return root, json.load(fh)["total"]
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    # FRESH text per batch (a copied corpus with new ids would be 100%
    # digest-rejected); internal dup/neardup_frac planted by the
    # generator stay in, measured as within-corpus rejections
    full = gen_documents(n_docs=n * n_batches)[["doc_id", "text"]]
    base = full.iloc[:n].reset_index(drop=True)
    now = time.time()
    for i in range(n_batches):
        b = full.iloc[i * n:(i + 1) * n].reset_index(drop=True)
        if i > 0:
            exact = b.index % 10 == 0
            near = b.index % 10 == 1
            b.loc[exact, "text"] = base.loc[exact, "text"].values
            b.loc[near, "text"] = base.loc[near, "text"].values + " edit marker"
        p = os.path.join(root, f"batch-{i:04d}.parquet")
        b.to_parquet(p, index=False)
        os.utime(p, (now + 10 * i, now + 10 * i))
    with open(meta, "w") as fh:
        json.dump({"total": n * n_batches}, fh)
    return root, n * n_batches


def run_ingest_bench(spark) -> dict:
    """Streaming corpus-ingest throughput through the FULL admission
    topology: within-batch exact survivor → history-wide digest index →
    history-wide MinHash index → exactly-once IcebergLite append.
    Sidecar (new in r7) — not part of the frozen headline value."""
    from swingstream.streaming.compaction import (
        run_corpus_stream_with_compaction,
    )

    stream_dir, total = _ingest_stream_dir()
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="swingstream-ingest-", dir=shm)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    # 5k-doc micro-batches are task-overhead-bound at the session's
    # shuffle width; the admission path's many small per-batch stages
    # (survivor window, two index probes, commit counts) want a few
    # fat partitions here — restored after the run
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t0 = time.time()
    try:
        table = run_corpus_stream_with_compaction(
            spark, stream, os.path.join(work, "corpus"),
            os.path.join(work, "ck"), id_col="doc_id",
            every=0, final_compaction=False,
            digest_index_root=os.path.join(work, "digest_idx"),
            # 16 buckets ≈ one fat probe task each at this scale; the
            # periodic index bin-pack stays OFF — at 8 commits it costs
            # more than the file growth it prevents (it pays on LONG
            # streams; wired + tested via index_compact_every)
            index_buckets=16,
            minhash_index_root=os.path.join(work, "minhash_idx"),
            minhash_index_params={"n_buckets": 16},
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    wall = time.time() - t0
    manifests = table.manifests()
    out = {
        "docs_offered": total,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(total / wall, 1),
        "rows_admitted": table.total_rows(),
        "rows_rejected_exact": sum(
            m["metrics"].get("rows_rejected_index", 0) for m in manifests),
        "rows_rejected_neardup": sum(
            m["metrics"].get("rows_rejected_neardup_index", 0)
            for m in manifests),
        "ts_start": round(t0, 3),
        "ts_end": round(t0 + wall, 3),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def run_streaming_bench(spark, params, fft: int | None = None,
                        q2_mft: int | None = None) -> dict:
    from swingstream.streaming.state import run_pipeline_concurrent

    stream_dir, n_docs = _bench_stream_dir()
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="swingstream-bench-run-", dir=shm)
    # explicit args beat env (r4 advice: the tuned-trigger sidecar's env
    # mutation could leak into later runs on an exception)
    if fft is None:
        fft = int(os.environ.get("SWINGSTREAM_BENCH_FFT", "16"))
    if q2_mft is None:
        q2_mft = int(os.environ.get("SWINGSTREAM_BENCH_Q2_MFT", "4"))
    t0 = time.time()
    feat_table, edges_table = run_pipeline_concurrent(
        spark, stream_dir, work, params, list(params.feature_names),
        feature_files_per_trigger=fft, q2_files_per_trigger=q2_mft,
    )
    wall = time.time() - t0
    out = {
        "docs": n_docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "feature_rows": feat_table.total_rows(),
        "edge_rows": edges_table.total_rows(),
        # per-run wall-clock stamps: two byte-identical repeats in
        # BENCH_r06 were uninterpretable (recording oddity vs real) —
        # distinct ts_start values make any recurrence self-explaining
        "ts_start": round(t0, 3),
        "ts_end": round(t0 + wall, 3),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from swingstream.config import SwingParams
    from swingstream.contract import QUERIES
    from swingstream.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="swingstream-bench", extra_conf={
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
})
    t_all = time.time()
    # Best-of-N warm repeats per query (N=2): round-over-round per-query
    # deltas on this noise-contended host (ambient wall swings ~2x) were
    # dominated by which repeat the noise hit, not by code.  The cache is
    # cleared between repeats — Spark's CacheManager matches canonicalized
    # plans, so a re-built identical query would otherwise silently reuse
    # the first repeat's persisted signature tables.
    repeats = int(os.environ.get("SWINGSTREAM_BENCH_REPEATS", "2"))
    queries: dict[str, float] = {}
    queries_median: dict[str, float] = {}
    query_repeats: dict[str, list[float]] = {}

    queries_extra: dict[str, float] = {}
    queries_extra_median: dict[str, float] = {}

    # pre-run host stamp: brackets the per-query section from the front
    # (r5 VERDICT: a mid-run burst must land BETWEEN two readings)
    calibration_pre = _host_calibration()

    def timed(name: str, build, dest=None, dest_median=None) -> None:
        walls = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t = time.time()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t, 3))
        (queries if dest is None else dest)[name] = min(walls)
        (queries_median if dest_median is None else dest_median)[name] = round(
            statistics.median(walls), 3)
        query_repeats[name] = walls

    # headline names resolve from the registry OR the contract module:
    # r6 merged q_moving_avg into the registered q_window_frames, but
    # the standalone fn stays defined so this frozen set keeps its
    # round-comparable per-query walls
    import swingstream.contract as contract_mod

    def q_fn(n):
        return QUERIES.get(n) or getattr(contract_mod, n)

    for name in HEADLINE:
        timed(name, lambda n=name: q_fn(n)(spark, sf_dir))
    for name, build in _dedup_similarity(spark, sf_dir).items():
        timed(name, build)
    for name, build in _textquality_extras(spark).items():
        timed(name, build, dest=queries_extra, dest_median=queries_extra_median)
    for name, build in _curation_extras(spark).items():
        timed(name, build, dest=queries_extra, dest_median=queries_extra_median)

    params = SwingParams(
        window_width=8, step_size=1, min_lag=1, max_lag=3,
        method="lasso", alpha=0.05, watermark="5 minutes", n_salts=8,
        emit_zero_edges=False, solver_max_iter=150,
    )
    # mid-run host stamp immediately before the streaming section —
    # the measurement the r4 driver run showed 3.5x slow on a host whose
    # scaling calibration read 0.906; with this stamp a contended run is
    # self-evident in BENCH_rN.json instead of a he-said-she-said
    calibration = _host_calibration()
    streaming_runs = [run_streaming_bench(spark, params) for _ in range(repeats)]
    # tuned-trigger variant (round-4 sweep: larger triggers amortize
    # per-trigger fixed cost — +~35% docs/s at local[32]; recorded as a
    # sidecar so the headline stays protocol-comparable at fft=16)
    tuned = None
    if "SWINGSTREAM_BENCH_FFT" not in os.environ:
        tuned = run_streaming_bench(spark, params, fft=64, q2_mft=16)
        tuned["trigger_config"] = {"feature_files_per_trigger": 64,
                                   "q2_files_per_trigger": 16}
    # corpus-ingest admission topology sidecar (r7: digest + minhash
    # admission indexes) — inside the calibration bracket
    ingest = run_ingest_bench(spark)
    # post-run host stamp after the streaming section closes the bracket
    calibration_post = _host_calibration()
    streaming = max(streaming_runs, key=lambda s: s["docs_per_sec"])
    streaming["wall_sec_repeats"] = sorted(s["wall_sec"] for s in streaming_runs)
    # per-run (wall, ts) detail — r6 VERDICT #3: two byte-identical
    # repeat walls were uninterpretable without independent timestamps
    streaming["repeats_detail"] = [
        {"wall_sec": s["wall_sec"], "ts_start": s["ts_start"],
         "ts_end": s["ts_end"]}
        for s in streaming_runs
    ]
    queries["streaming_swing_pipeline"] = streaming["wall_sec"]
    queries_median["streaming_swing_pipeline"] = round(
        statistics.median(streaming["wall_sec_repeats"]), 3)
    query_repeats["streaming_swing_pipeline"] = streaming["wall_sec_repeats"]

    out = {
        "metric": "swingstream headline-query + streaming SWING pipeline wall time",
        # Estimator stamp (see protocol below): "value" is the sum of
        # best-of-N warm per-query walls. Rounds 1-2 recorded single-run
        # walls under the same key — cross-round comparisons against rows
        # without a "protocol" field are NOT like-for-like (best-of-N
        # minima are biased low vs single runs). value_median is the
        # robust companion estimator at zero extra runtime.
        "value": round(sum(queries.values()), 3),
        "value_best_of_n": round(sum(queries.values()), 3),
        "value_median": round(sum(queries_median.values()), 3),
        "protocol": {
            "estimator": f"sum of best-of-{repeats} warm per-query walls",
            "since_round": 3,
            "cache_cleared_between_repeats": True,
        },
        "total_wall_sec": round(time.time() - t_all, 3),
        "unit": "sec",
        "queries": queries,
        "queries_median": queries_median,
        # extras: benched but NOT in `value` (headline set frozen, round 3)
        "queries_extra": queries_extra,
        "queries_extra_median": queries_extra_median,
        "query_repeats": query_repeats,
        "sf": sf,
        "cpus": int(cpus),
        # three stamps bracket the run: _pre (before per-query), the
        # mid stamp (before streaming; kept under the r5 key for
        # round-comparability), _post (after streaming + tuned sidecar)
        "host_calibration_pre": calibration_pre,
        "host_calibration": calibration,
        "host_calibration_post": calibration_post,
        "streaming": streaming,
        "streaming_tuned_trigger": tuned,
        "streaming_ingest": ingest,
        "scaling_gate": _scaling_gate_summary(),
    }
    print(json.dumps(out))
    # The driver keeps only the TAIL of the bench output (r4: 2,000 bytes
    # — which ate every per-query wall and the headline `value`).  Emit a
    # compact-but-complete summary as the LAST line so truncation can
    # never eat the headline; it repeats the driver-contract keys so it
    # parses standalone.
    gate = out["scaling_gate"] or {}
    print(json.dumps({
        "metric": out["metric"],
        "value": out["value"],
        "value_median": out["value_median"],
        "unit": "sec",
        "sf": sf,
        "cpus": int(cpus),
        "queries": queries,
        "streaming": {k: streaming[k] for k in
                      ("docs", "wall_sec", "docs_per_sec", "wall_sec_repeats")},
        "tuned_docs_per_sec": tuned["docs_per_sec"] if tuned else None,
        "host_calibration_pre": calibration_pre,
        "host_calibration": calibration,
        "host_calibration_post": calibration_post,
        "scaling_latest": {
            k: (gate.get("latest") or {}).get(k)
            for k in ("pair", "scaling_efficiency",
                      "hardware_scaling_efficiency", "pass")
        } if gate else None,
        "protocol": out["protocol"],
    }))


def _scaling_gate_summary() -> dict | None:
    """Latest N->4N scaling-gate evidence from BENCH/results.jsonl, embedded
    here so the driver's bench readout and the gate evidence can't drift."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "results.jsonl")
    try:
        rows = [json.loads(line) for line in open(path) if line.strip()]
    except OSError:
        return None
    # headline gate rows only: full protocol (>=3 requested pairs), >=3
    # guard-VALID pairs actually produced at every level (r4 advice: a
    # crashed child emitting 1-2 pairs must not qualify), and untagged —
    # tagged rows are exploratory sweeps (r4-sweep-*), never the gate
    # evidence
    gates = [
        r for r in rows
        if "scaling_efficiency" in r and "tag" not in r
        and r.get("protocol", {}).get("repeats_requested", 0) >= 3
        and all(lv.get("n_pairs_valid", 0) >= 3
                for lv in r.get("levels", {}).values())
    ]
    if not gates:
        return None

    def row(g: dict) -> dict:
        levels = sorted(int(k) for k in g.get("levels", {}))
        lv = {str(k): g["levels"][str(k)] for k in levels}
        hw = g.get("hardware_scaling_efficiency")
        eff = g.get("scaling_efficiency")
        return {
            "metric": g.get("metric"),
            "pair": f"local[{levels[0]}] -> local[{levels[-1]}]" if levels else None,
            "scaling_efficiency": eff,
            "scaling_efficiency_wall": g.get("scaling_efficiency_wall"),
            "target": g.get("target"),
            "pass": g.get("pass"),
            "n_pairs_valid": {k: v.get("n_pairs_valid") for k, v in lv.items()},
            # contention audit: a perfectly-parallel CPU burn's own
            # scaling on this host at measurement time — raw efficiency
            # is only comparable across rounds at similar ceilings
            "hardware_scaling_efficiency": hw,
            "bandwidth_scaling_efficiency": g.get("bandwidth_scaling_efficiency"),
            "efficiency_vs_hw_ceiling": (
                round(eff / hw, 3) if (eff and hw) else None),
            "ts": g.get("ts"),
        }

    return {"latest": row(gates[-1]),
            "history": [row(g) for g in gates[-4:-1]]}


if __name__ == "__main__":
    sys.exit(main())
