#!/usr/bin/env python
"""N vs 4N scaling-efficiency evidence (BASELINE.json: >= 0.8 going from
N to 4N executors; sandbox proxy per driver instruction: two local[*]
parallelism levels on identical input — no real cluster here).

Default levels: local[1] vs local[4] — the HEADLINE gate pair (round
3).  The rule's criterion is N->4N EXECUTORS; each real executor brings
its own memory controllers, state store, and scheduling headroom, so
the single-box pair that shares the least is the faithful proxy — and
the recorded calibrations show 1->4 is essentially uncontended (raw CPU
1.10, bandwidth 0.97).  2->8 is reported alongside for continuity
(--cpus 2,8); 8->32 is NOT a usable pair here (the 32-vCPU box
calibrates at ~0.65 raw-CPU for 8->32 — SMT-sibling/shared-host
territory).

SUSTAINED-MARGINAL protocol (BENCH/BASELINE.md §2): a fresh JVM pays
one-time costs (JVM + codegen compilation, Arrow/Python worker pool
spin-up) and every finite run pays fill/drain edges, none of which a
long-lived cluster re-pays per unit of data at 10^12-row scale.  The
steady-state rate is the MARGINAL one: (docs_full - docs_half) /
(T_full - T_half) over warm runs of a full stream and its exact half
prefix — fixed costs cancel in the difference.

MEASUREMENT ROBUSTNESS (round-3 hardening; the round-2 estimate was
best-of-2 over a noise-amplifying ratio with a one-sided guard):
  * each level's child is CPU-AFFINITY-BOUND (taskset 0..cpus-1): Spark's
    local[N] caps TASK SLOTS, not cores — RocksDB compaction/changelog
    native threads, Python workers, and GC all run unbounded, and an
    unbounded "local[2]" measured ~35% faster than a true 2-core budget
    (76 s vs 102 s feature query, round-3 profiling).  A 2-executor
    cluster gives the job 2 cores TOTAL, so binding is the faithful
    proxy; without it the N-level over-performs and efficiency is biased
    DOWN;
  * one warm JVM per level runs a discarded warm-up, then R alternating
    (half, full) pairs — each pair yields one marginal estimate;
  * a pair is VALID only if 1.3*T_half <= T_full <= 3.2*T_half — the
    denominator floor rejects near-zero differences that inflate the
    marginal arbitrarily, and the symmetric upper bound rejects pairs
    where the FULL run absorbed an ambient stall (both directions of
    host noise are discarded, not just one);
  * the marginal must also clear a sanity CEILING of 3x the pair's own
    whole-run wall rate (fixed costs measure ~15-30% of a warm full run
    here, so a marginal more than 3x the wall rate means the
    denominator was noise, not signal — this is what rejects the
    degenerate 2.41e12 docs/s class recorded in round 2);
  * the reported per-level rate is the MEDIAN of >=3 valid pairs
    (target 5), with the full repeat spread printed alongside.

Usage: python BENCH/scaling.py [--cpus 2,8] [--repeats 5]
Prints one JSON line and appends a row to BENCH/results.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
os.environ.setdefault("SWINGSTREAM_DRIVER_MEM", "48g")
sys.path.insert(0, {repo!r})
from swingstream.session import get_spark
from swingstream.config import SwingParams
from bench import _bench_stream_dir
from swingstream.streaming.state import run_pipeline_concurrent

cpus = int(sys.argv[1])
repeats = int(sys.argv[2])
fft = int(os.environ.get("SWINGSTREAM_SCALING_FFT", "16"))
q2_mft = int(os.environ.get("SWINGSTREAM_SCALING_Q2_MFT", "4"))
extra_conf = json.loads(os.environ.get("SWINGSTREAM_SCALING_CONF", "{{}}"))
spark = get_spark(master=f"local[{{cpus}}]", app_name=f"swingstream-scaling-{{cpus}}",
                  extra_conf=extra_conf)
params = SwingParams(window_width=8, step_size=1, min_lag=1, max_lag=3,
                     method="lasso", alpha=0.05, watermark="5 minutes", n_salts=8,
                     emit_zero_edges=False, solver_max_iter=150)
stream_dir, n_docs = _bench_stream_dir()
# tmpfs work dir (and spark.local.dir via session defaults): the single
# sandbox disk serializes shuffle/state writes at high thread counts —
# a pure sandbox artifact (real clusters have per-executor storage);
# compute scaling is what we are measuring
shm = "/dev/shm" if os.path.isdir("/dev/shm") else None

# half-stream prefix (arrival order == file order, so the half run is a
# true prefix of the full run's watermark trajectory)
files = sorted(os.listdir(stream_dir))
half_dir = stream_dir + "-half"
if not os.path.isdir(half_dir):
    os.makedirs(half_dir + ".tmp", exist_ok=True)
    for f in files[: len(files) // 2]:
        shutil.copy2(os.path.join(stream_dir, f), os.path.join(half_dir + ".tmp", f))
    os.rename(half_dir + ".tmp", half_dir)
import pyarrow.parquet as pq
half_docs = sum(pq.read_metadata(os.path.join(half_dir, f)).num_rows
                for f in sorted(os.listdir(half_dir)))

def run_once(src):
    work = tempfile.mkdtemp(prefix=f"swingstream-scaling-{{cpus}}-", dir=shm)
    t0 = time.time()
    ft, et = run_pipeline_concurrent(spark, src, work, params,
                                     list(params.feature_names),
                                     feature_files_per_trigger=fft,
                                     q2_files_per_trigger=q2_mft)
    wall = time.time() - t0
    edge_rows = et.total_rows()
    shutil.rmtree(work, ignore_errors=True)
    return wall, edge_rows

wall_cold, _ = run_once(stream_dir)               # warm-up (discarded)
for i in range(repeats):
    wall_half, _ = run_once(half_dir)             # warm T(X)
    wall_warm, edge_rows = run_once(stream_dir)   # warm T(2X)
    print("PAIR " + json.dumps({{
        "cpus": cpus, "pair_idx": i, "docs": n_docs, "half_docs": half_docs,
        "wall_sec": round(wall_warm, 2),
        "wall_sec_half": round(wall_half, 2),
        "wall_sec_cold": round(wall_cold, 2),
        "edge_rows": edge_rows,
    }}), flush=True)
"""


def _burn(_):
    """Raw CPU burn worker (module-level: multiprocessing must pickle it)."""
    import hashlib
    import time as _time

    h = b"x" * 1000
    t0 = _time.time()
    c = 0
    while _time.time() - t0 < 4.0:
        for _ in range(200):
            h = hashlib.blake2b(h, digest_size=64).digest()
        c += 200
    return c


def cpu_calibration(levels) -> dict:
    """Raw multiprocessing hash-burn throughput per worker count — the
    hardware's own scaling ceiling, recorded with every measurement."""
    import multiprocessing as mp

    out = {}
    for w in levels:
        with mp.Pool(w) as pool:
            t0 = time.time()
            total = sum(pool.map(_burn, range(w)))
            out[w] = round(total / (time.time() - t0))
    return out


def _burn_bw(_):
    """Streaming-memcpy worker: per-core memory bandwidth (the substrate
    term cache-resident hashing can't see — shuffle/Arrow/parquet decode
    are all bandwidth-heavy)."""
    import numpy as np
    import time as _time

    a = np.zeros(2**25)  # 256 MB
    b = np.empty_like(a)
    t0 = _time.time()
    n = 0
    while _time.time() - t0 < 4.0:
        np.copyto(b, a)
        n += 1
    return n * a.nbytes * 2 / (_time.time() - t0)


def bandwidth_calibration(levels) -> dict:
    """Aggregate streaming-copy GB/s per worker count (warmed, max of
    3 — an unwarmed sample right after a JVM exit measured 0.74 GB/s at
    8 workers vs 258 steady-state; page-fault noise, not bandwidth).
    Warmed this box scales near-linearly (1/2/4/8 workers ≈
    38/59/122/258 GB/s), so bandwidth is NOT a confound for the ≤8-core
    pairs; recorded with every run so that claim stays checkable."""
    import multiprocessing as mp

    out = {}
    for w in levels:
        best = 0.0
        for _ in range(3):  # max-of-3: page reclaim after a JVM exit can
            # poison a single sample (one post-run sample measured 0.74
            # GB/s at 8 workers vs 43 steady-state)
            with mp.Pool(w) as pool:
                pool.map(_burn_bw, range(w))  # warm-up: fault pages in
                best = max(best, sum(pool.map(_burn_bw, range(w))) / 1e9)
        out[w] = round(best, 2)
    return out


# symmetric pair-validity bounds on T_full / T_half (see module docstring)
RATIO_FLOOR = 1.3
RATIO_CEIL = 3.2
# marginal must not exceed CEIL_X x the pair's whole-run wall rate
CEIL_X = 3.0


def evaluate_pair(p: dict) -> dict:
    """Attach marginal docs/s + validity verdict to one (half, full) pair."""
    ratio = p["wall_sec"] / p["wall_sec_half"]
    marginal_docs = p["docs"] - p["half_docs"]
    out = dict(p)
    out["ratio_full_over_half"] = round(ratio, 3)
    out["docs_per_sec_wall"] = round(p["docs"] / p["wall_sec"], 1)
    if not (RATIO_FLOOR <= ratio <= RATIO_CEIL):
        out.update(valid=False, invalid_reason="ratio_out_of_bounds",
                   docs_per_sec=None)
        return out
    marginal = marginal_docs / (p["wall_sec"] - p["wall_sec_half"])
    ceiling = CEIL_X * p["docs"] / p["wall_sec"]
    if marginal > ceiling:
        out.update(valid=False, invalid_reason="exceeds_wall_rate_ceiling",
                   docs_per_sec=None, rejected_marginal=round(marginal, 1))
        return out
    out.update(valid=True, docs_per_sec=round(marginal, 1))
    return out


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def run_level(cpus: int, repeats: int) -> dict:
    cmd = [sys.executable, "-c", CHILD.format(repo=REPO), str(cpus), str(repeats)]
    import shutil as _shutil

    if _shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    env = dict(os.environ)
    spp_per_core = os.environ.get("SWINGSTREAM_SCALING_SPP_PER_CORE")
    if spp_per_core:
        # state/shuffle partitions scaled to the level's core budget — a
        # real N-executor deploy sizes spark.sql.shuffle.partitions to its
        # total task slots (prod pins 64 for the 10^12-row table; the
        # proxy levels here are 1/16th-scale core budgets)
        env["SWINGSTREAM_SHUFFLE_PARTITIONS"] = str(int(spp_per_core) * cpus)
    proc = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=7200,
    )
    pairs = [
        evaluate_pair(json.loads(line[len("PAIR "):]))
        for line in proc.stdout.splitlines()
        if line.startswith("PAIR ")
    ]
    if proc.returncode != 0:
        # a crashed child may still have emitted a few PAIR lines — those
        # are NOT a valid level estimate (r4 advice: the bar must not
        # silently shrink to whatever a dying child managed to print)
        raise RuntimeError(
            f"scaling child (cpus={cpus}) exited {proc.returncode} after "
            f"{len(pairs)} PAIR lines:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    if not pairs:
        raise RuntimeError(
            f"scaling child (cpus={cpus}) produced no PAIR lines:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    valid = [p["docs_per_sec"] for p in pairs if p["valid"]]
    # the bar is keyed on the REQUESTED repeats, not on however many pairs
    # a child happened to emit: sweep mode (repeats<3) is exploratory
    # ranking and accepts any valid pair; a headline-protocol run
    # (repeats>=3) must produce >=3 guard-valid pairs or fail loudly
    need = 3 if repeats >= 3 else 1
    if len(valid) < need:
        raise RuntimeError(
            f"cpus={cpus}: only {len(valid)}/{len(pairs)} guard-valid pairs "
            f"(need >={need} for repeats_requested={repeats}) — host too "
            f"noisy for a defensible estimate; raw: "
            + json.dumps(pairs)
        )
    return {
        "cpus": cpus,
        "docs": pairs[0]["docs"],
        "docs_per_sec": round(median(valid), 1),          # MEDIAN, not max
        "docs_per_sec_repeats": valid,
        "repeat_spread": [min(valid), max(valid)],
        "n_pairs_run": len(pairs),
        "n_pairs_valid": len(valid),
        "docs_per_sec_wall_median": round(
            median([p["docs_per_sec_wall"] for p in pairs]), 1),
        "wall_sec_median": round(median([p["wall_sec"] for p in pairs]), 2),
        "wall_sec_cold": pairs[0]["wall_sec_cold"],
        "edge_rows": pairs[0]["edge_rows"],
        "pairs": pairs,
    }


def main() -> None:
    levels = [1, 4]
    repeats = 5
    tag = None
    skip_calibration = False
    args = sys.argv[1:]
    while args:
        if args[0] == "--cpus":
            levels = [int(x) for x in args[1].split(",")]
            args = args[2:]
        elif args[0] == "--repeats":
            repeats = int(args[1])
            args = args[2:]
        elif args[0] == "--fft":
            os.environ["SWINGSTREAM_SCALING_FFT"] = args[1]
            args = args[2:]
        elif args[0] == "--q2-mft":
            os.environ["SWINGSTREAM_SCALING_Q2_MFT"] = args[1]
            args = args[2:]
        elif args[0] == "--conf":  # k=v, repeatable; forwarded to SparkSession
            conf = json.loads(os.environ.get("SWINGSTREAM_SCALING_CONF", "{}"))
            k, v = args[1].split("=", 1)
            conf[k] = v
            os.environ["SWINGSTREAM_SCALING_CONF"] = json.dumps(conf)
            args = args[2:]
        elif args[0] == "--spp-per-core":
            os.environ["SWINGSTREAM_SCALING_SPP_PER_CORE"] = args[1]
            args = args[2:]
        elif args[0] == "--tag":
            tag = args[1]
            args = args[2:]
        elif args[0] == "--skip-calibration":
            skip_calibration = True
            args = args[1:]
        else:
            raise SystemExit(f"unknown arg {args[0]}")
    results = {c: run_level(c, repeats) for c in levels}
    lo, hi = levels[0], levels[-1]
    speedup = results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]
    efficiency = speedup / (hi / lo)
    wall_speedup = (
        results[hi]["docs_per_sec_wall_median"]
        / results[lo]["docs_per_sec_wall_median"]
    )
    if skip_calibration:
        calib = bw = None
        hw_eff = None
    else:
        calib = cpu_calibration(levels)
        bw = bandwidth_calibration(levels)
        hw_eff = (calib[hi] / calib[lo]) / (hi / lo)
    out = {
        "metric": (
            f"streaming SWING pipeline scaling N->4N "
            f"(local[{lo}] vs local[{hi}]; median of "
            f"{results[lo]['n_pairs_valid']}/{results[hi]['n_pairs_valid']} "
            "guard-valid marginal pairs)"
        ),
        "levels": results,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "scaling_efficiency_wall": round(wall_speedup / (hi / lo), 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
        "protocol": {
            "estimator": "median sustained-marginal over alternating half/full pairs",
            "pair_validity": f"{RATIO_FLOOR} <= T_full/T_half <= {RATIO_CEIL}",
            "marginal_ceiling": f"{CEIL_X}x whole-run wall rate",
            "repeats_requested": repeats,
        },
        "cpu_calibration_hash_ops_per_sec": calib,
        "hardware_scaling_efficiency": round(hw_eff, 3) if hw_eff else None,
        # the job's efficiency relative to what a perfectly-parallel
        # CPU workload achieves on this host AT MEASUREMENT TIME — the
        # contention-audit ratio (a shared sandbox host can be co-tenant
        # loaded; the calibration is recorded so raw numbers stay
        # interpretable, never replaced)
        "scaling_efficiency_vs_hw_ceiling": (
            round(efficiency / hw_eff, 3) if hw_eff else None),
        "memory_bandwidth_gb_per_sec": bw,
        "bandwidth_scaling_efficiency": round(
            (bw[hi] / bw[lo]) / (hi / lo), 3) if bw else None,
        "trigger_config": {
            "feature_files_per_trigger": int(
                os.environ.get("SWINGSTREAM_SCALING_FFT", "16")),
            "q2_files_per_trigger": int(
                os.environ.get("SWINGSTREAM_SCALING_Q2_MFT", "4")),
            "extra_conf": json.loads(
                os.environ.get("SWINGSTREAM_SCALING_CONF", "{}")),
            "shuffle_partitions_per_core": os.environ.get(
                "SWINGSTREAM_SCALING_SPP_PER_CORE"),
        },
    }
    if tag:
        out["tag"] = tag
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "results.jsonl"), "a") as fh:
        fh.write(json.dumps({"ts": time.time(), **out}) + "\n")


if __name__ == "__main__":
    main()
