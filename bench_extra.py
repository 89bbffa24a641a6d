#!/usr/bin/env python
"""Round-8 optimization measurement sidecar (guide §1.1/§1.4/§1.5).

NOT part of the frozen driver bench (bench.py is measurement-frozen) —
this harness isolates individual queries with the noop sink, captures
``.explain("formatted")`` for the plan evidence in plans/r08/, and dumps
streaming micro-batch progress so per-trigger fixed cost is visible.

Usage:
  python bench_extra.py queries [name ...]      # time + plan per query
  python bench_extra.py plans <tag> [name ...]  # only write plans/r08/<q>_<tag>.txt
  python bench_extra.py streaming [fft] [q2mft] # streaming bench + progress dump
  python bench_extra.py ingest                  # ingest sidecar + per-batch walls
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")


def get_session():
    from swingstream.session import get_spark

    return get_spark(
        master=f"local[{CPUS}]",
        app_name="swingstream-bench-extra",
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
        },
    )


def all_builders(spark):
    """name -> builder for every bench-timed query (headline + dedup +
    extras), mirroring bench.py's construction exactly."""
    import bench as B
    from swingstream.contract import QUERIES
    import swingstream.contract as contract_mod

    def q_fn(n):
        return QUERIES.get(n) or getattr(contract_mod, n)

    out = {}
    for name in B.HEADLINE:
        out[name] = (lambda n=name: q_fn(n)(spark, SF_DIR))
    out.update(B._dedup_similarity(spark, SF_DIR))
    out.update(B._textquality_extras(spark))
    out.update(B._curation_extras(spark))
    return out


def time_queries(names=None, repeats=2, write_plans_tag=None):
    spark = get_session()
    builders = all_builders(spark)
    names = names or list(builders)
    walls = {}
    for name in names:
        build = builders[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if write_plans_tag:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = build()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{write_plans_tag}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        rs = []
        for _ in range(repeats):
            spark.catalog.clearCache()
            t = time.time()
            build().write.format("noop").mode("overwrite").save()
            rs.append(round(time.time() - t, 3))
        walls[name] = {"min": min(rs), "all": rs}
        print(json.dumps({"query": name, **walls[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "walls": {k: v["min"] for k, v in walls.items()},
                      "sum": round(sum(v["min"] for v in walls.values()), 3)}))


def plans_only(tag, names=None):
    spark = get_session()
    builders = all_builders(spark)
    names = names or list(builders)
    os.makedirs(PLANS_DIR, exist_ok=True)
    for name in names:
        df = builders[name]()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt")


def streaming(fft=16, q2mft=4, dump_progress=True):
    import bench as B
    from swingstream.config import SwingParams

    spark = get_session()
    params = SwingParams(
        window_width=8, step_size=1, min_lag=1, max_lag=3,
        method="lasso", alpha=0.05, watermark="5 minutes", n_salts=8,
        emit_zero_edges=False, solver_max_iter=150,
    )
    out = B.run_streaming_bench(spark, params, fft=fft, q2_mft=q2mft)
    print(json.dumps(out))
    if dump_progress:
        # run once more with instrumented queries to dump per-batch durations
        from swingstream.streaming.state import run_pipeline_concurrent
        import tempfile, shutil

        stream_dir, n_docs = B._bench_stream_dir()
        shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
        work = tempfile.mkdtemp(prefix="swingstream-profile-", dir=shm)
        t0 = time.time()
        feat, edges = run_pipeline_concurrent(
            spark, stream_dir, work, params, list(params.feature_names),
            feature_files_per_trigger=fft, q2_files_per_trigger=q2mft,
        )
        print(json.dumps({"profiled_wall": round(time.time() - t0, 3)}))
        shutil.rmtree(work, ignore_errors=True)


def ingest():
    import bench as B

    spark = get_session()
    t0 = time.time()
    out = B.run_ingest_bench(spark)
    print(json.dumps(out))
    print(json.dumps({"total_wall": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        time_queries(sys.argv[2:] or None)
    elif cmd == "plans":
        plans_only(sys.argv[2], sys.argv[3:] or None)
    elif cmd == "streaming":
        fft = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        q2 = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        streaming(fft, q2)
    elif cmd == "ingest":
        ingest()
    else:
        raise SystemExit(f"unknown command {cmd}")
