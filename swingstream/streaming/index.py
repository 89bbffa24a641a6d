"""Persistent content-digest index — ingest-time exact dedup against the
ENTIRE corpus history (not just the watermark window).

``dropDuplicatesWithinWatermark`` (T8) removes transport redeliveries
inside the watermark horizon, and ``compact_dedup`` rewrites already-
committed duplicates after the fact.  Neither stops a page that was
ingested last month from being committed again today: at 10^12-doc
crawl scale, re-crawled unchanged pages are a large admission-time
waste (GPT-3 appendix A / RefinedWeb both dedup across snapshots).
``DigestIndex`` closes that gap: a bucket-partitioned parquet index of
every admitted content digest, probed per micro-batch with a
partition-pruned anti-join, and updated in the SAME exactly-once ledger
discipline as the corpus table.

Scale shape (the design constraint is a 10^12-row index):

* **Bucket partitioning** — every digest lives in bucket
  ``pmod(xxhash64(digest), n_buckets)``; commits write one parquet
  directory per touched bucket.  A probe reads ONLY the buckets present
  in the incoming batch: cost is ``index_bytes × touched/n_buckets``,
  not a full index scan.  Size ``n_buckets`` so one bucket ≈ one task
  (2^16 buckets at 10^12 rows ≈ 15M digests/bucket ≈ 500 MB — readable
  by one executor core; this module defaults to 64 for test corpora).
* **Anti-join, digest-keyed** — md5 avalanche makes the shuffle key
  uniform; the batch side is one micro-batch, the index side is the
  pruned bucket subset.  No driver-side membership structures: the only
  ``collect`` is the batch's distinct bucket ids (≤ ``n_buckets`` ints).
* **Bounded file count** — every commit adds ≤ touched-buckets files, so
  a long-running stream accumulates files linearly; ``compact`` rewrites
  the whole index to one file per bucket under a REPLACE manifest
  (same maintenance loop as ``compact_small_files`` on the corpus).

Exactly-once protocol (with a corpus ``IcebergLiteTable``): the sink
must commit the CORPUS first, the index second, both under the same
``batch_id``.  A crash between the two replays into a corpus-commit
no-op followed by the missing index commit; committing the index first
would instead let the replayed anti-join filter the batch's own rows
out and lose them.  ``run_corpus_stream_with_compaction`` wires this
order (streaming/compaction.py).

Unlike the corpus table there is no crash-orphan ADOPTION path: the
index is only ever read inside the serial foreachBatch sink (no
concurrent streaming file reader holds its paths), so an orphaned data
dir without a manifest is simply removed and rewritten.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["DigestIndex", "digest_bucket"]


def digest_bucket(digest: Column, n_buckets: int) -> Column:
    """Index bucket of a digest — pinned here so writers and probes can
    never disagree (xxhash64 is seed-stable across Spark sessions)."""
    return F.pmod(F.xxhash64(digest), F.lit(n_buckets)).cast("int")


class DigestIndex:
    """Bucket-partitioned digest index with an idempotent manifest ledger.

    Layout::

        root/
          data/batch-<label>/bucket=<b>/part-*.parquet   (digest: string)
          manifests/<batch_id>.json
          _tmp/

    Manifests carry per-file lineage (bucket, rows) and REPLACE
    semantics for compaction, mirroring IcebergLiteTable; visibility
    flips on the single manifest write.
    """

    def __init__(self, root: str, n_buckets: int = 64):
        self.root = root
        self.n_buckets = int(n_buckets)
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifests")
        self.tmp_dir = os.path.join(root, "_tmp")
        for d in (self.data_dir, self.manifest_dir, self.tmp_dir):
            os.makedirs(d, exist_ok=True)
        meta_path = os.path.join(root, "index-meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            if int(meta["n_buckets"]) != self.n_buckets:
                raise ValueError(
                    f"digest index at {root} was built with "
                    f"n_buckets={meta['n_buckets']}, opened with "
                    f"{self.n_buckets} — bucket routing would diverge"
                )
        else:
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump({"n_buckets": self.n_buckets}, fh)
            os.replace(tmp, meta_path)

    # -- ledger ------------------------------------------------------------

    def _manifest_path(self, batch_id) -> str:
        return os.path.join(self.manifest_dir, f"{batch_id}.json")

    def committed(self, batch_id) -> bool:
        return os.path.exists(self._manifest_path(batch_id))

    def manifests(self) -> list[dict]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.endswith(".json"):
                with open(os.path.join(self.manifest_dir, f)) as fh:
                    out.append(json.load(fh))
        out.sort(key=lambda m: m["seq"])
        return out

    def active_manifests(self) -> list[dict]:
        """Ledger replay: REPLACE manifests hide the ids they replace."""
        ms = self.manifests()
        replaced: set[str] = set()
        for m in ms:
            for r in m.get("replaces") or []:
                replaced.add(str(r))
        return [m for m in ms if str(m["batch_id"]) not in replaced]

    def _next_seq(self) -> int:
        ms = [m["seq"] for m in self.manifests()]
        return (max(ms) + 1) if ms else 0

    # -- write path ----------------------------------------------------------

    def commit(
        self,
        batch_id: int | str,
        digests: DataFrame,
        *,
        operation: str = "append",
        replaces: list | None = None,
    ) -> dict | None:
        """Idempotent commit of one batch's digests (column ``digest``).

        Digests are distinct-ed and routed to ``bucket`` here, written
        one parquet dir per touched bucket, published with one atomic
        dir rename; the manifest write flips visibility.  Returns None
        on replay of an already-committed batch_id.
        """
        if self.committed(batch_id):
            return None
        import pyarrow.parquet as pq

        label = (
            f"{int(batch_id):010d}" if str(batch_id).isdigit() else str(batch_id)
        )
        final_dir = os.path.join(self.data_dir, f"batch-{label}")
        if os.path.isdir(final_dir):
            # crash orphan: no manifest ever landed and nothing else
            # reads index data paths (serial sink only), so recompute —
            # see module docstring for why no adoption path is needed
            shutil.rmtree(final_dir)

        routed = (
            digests.select(F.col("digest").cast("string").alias("digest"))
            .where(F.col("digest").isNotNull())
            .distinct()
            .withColumn("bucket", digest_bucket(F.col("digest"), self.n_buckets))
        )
        stage = os.path.join(self.tmp_dir, f"stage-{label}-{uuid.uuid4().hex}")
        # repartition by bucket first: each written bucket dir then holds
        # O(1) part files instead of one per upstream task
        routed.repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(stage)

        pub = os.path.join(self.tmp_dir, f"publish-{label}")
        os.makedirs(pub, exist_ok=True)
        lineage = []
        for bdir in sorted(os.listdir(stage)):
            if not bdir.startswith("bucket="):
                continue
            bucket = int(bdir.split("=", 1)[1])
            os.makedirs(os.path.join(pub, bdir), exist_ok=True)
            for f in sorted(os.listdir(os.path.join(stage, bdir))):
                if not f.endswith(".parquet"):
                    continue
                src = os.path.join(stage, bdir, f)
                rows = pq.read_metadata(src).num_rows
                lineage.append(
                    {
                        "file": f"batch-{label}/{bdir}/{f}",
                        "bucket": bucket,
                        "rows": rows,
                    }
                )
                os.replace(src, os.path.join(pub, bdir, f))
        os.replace(pub, final_dir)  # atomic publish
        shutil.rmtree(stage, ignore_errors=True)

        manifest = {
            "batch_id": batch_id,
            "seq": self._next_seq(),
            "operation": operation,
            "replaces": replaces or [],
            "files": lineage,
            "rows": sum(e["rows"] for e in lineage),
            "buckets": sorted({e["bucket"] for e in lineage}),
        }
        tmp = self._manifest_path(batch_id) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._manifest_path(batch_id))
        return manifest

    # -- read path -----------------------------------------------------------

    def files_for_buckets(self, buckets) -> list[str]:
        """Active index files restricted to ``buckets`` — the partition
        pruning that keeps a probe at touched/total of the index."""
        want = set(int(b) for b in buckets)
        out = []
        for m in self.active_manifests():
            for e in m["files"]:
                if e["bucket"] in want:
                    out.append(os.path.join(self.data_dir, e["file"]))
        return out

    def total_rows(self) -> int:
        return sum(m["rows"] for m in self.active_manifests())

    def probe(self, spark: SparkSession, buckets) -> DataFrame:
        """Known digests in ``buckets`` (deduplicated across commits)."""
        files = self.files_for_buckets(buckets)
        if not files:
            return spark.createDataFrame([], "digest string")
        return spark.read.schema("digest string").parquet(*files).distinct()

    def filter_new(
        self, batch: DataFrame, digest_col: str = "digest"
    ) -> DataFrame:
        """Rows of ``batch`` whose digest is NOT in the index.

        One bounded collect (distinct bucket ids of the batch, ≤
        n_buckets ints) prunes the index read; then one digest-keyed
        left-anti hash join.  The batch frame is evaluated twice (bucket
        ids + the join) — persist it in the caller when the upstream is
        expensive, as the streaming sink does.
        """
        spark = batch.sparkSession
        bucket_rows = (
            batch.select(
                digest_bucket(F.col(digest_col), self.n_buckets).alias("b")
            )
            .distinct()
            .collect()
        )
        known = self.probe(spark, [r["b"] for r in bucket_rows])
        return batch.join(
            known,
            batch[digest_col] == known["digest"],
            "left_anti",
        )

    # -- maintenance -----------------------------------------------------

    def compact(self, spark: SparkSession, compaction_id: str) -> dict | None:
        """Rewrite the whole active index to ≤1 file per bucket under a
        REPLACE manifest — the file-count maintenance loop (a stream of
        k commits otherwise leaves O(k × touched-buckets) files).
        Idempotent on ``compaction_id``; a replay is a no-op."""
        if self.committed(compaction_id):
            return None
        active = self.active_manifests()
        if not active:
            return None
        files = [
            os.path.join(self.data_dir, e["file"])
            for m in active
            for e in m["files"]
        ]
        all_digests = spark.read.schema("digest string").parquet(*files)
        return self.commit(
            compaction_id,
            all_digests,
            operation="binpack",
            replaces=[m["batch_id"] for m in active],
        )
