"""Sub-document (line-level) dedup — operators/dedup.line_dedup and its
compaction-time wiring (streaming/compaction.compact_strip_lines).
Hand-checkable semantics, a DuckDB replay (md5 is DuckDB-expressible,
so the whole op is cross-engine pinned — the promotion candidate if the
driver window ever grows), plan guards, and the streamed-vs-one-shot
parity that justifies running it at compaction time."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from swingstream.operators.dedup import boilerplate_line_digests, line_dedup

BOILER = "subscribe to our newsletter"


def _corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "text": [
                f"unique alpha content\n{BOILER}\nmore alpha",
                f"{BOILER}\nunique beta content",
                f"unique gamma\n\n{BOILER}",          # blank line preserved
                f"unique delta\n{BOILER}",
                f"unique epsilon\n{BOILER}",           # 5 docs share BOILER
                BOILER,                                # only the boilerplate
                "rare line shared\nunique zeta",
                "rare line shared\nunique eta",        # 2 docs share: kept
            ],
        }
    )
    return spark.createDataFrame(pdf)


def test_line_dedup_hand_values(spark):
    docs = _corpus(spark)
    out = (
        line_dedup(docs, max_docs_per_line=4)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "text"] == "unique alpha content\nmore alpha"
    assert out.loc[1, "text"] == "unique beta content"
    # blank line survives (structure, exempt from frequency counting)
    assert out.loc[2, "text"] == "unique gamma\n"
    assert out.loc[3, "text"] == "unique delta"
    # a doc losing every line keeps an empty string (id lineage kept;
    # the quality gate downstream is what drops empties)
    assert out.loc[5, "text"] == ""
    # a line in only 2 docs stays (2 <= max_docs_per_line)
    assert out.loc[6, "text"] == "rare line shared\nunique zeta"
    assert len(out) == 8 and list(out.columns) == ["text"]


def test_line_dedup_preserves_order_and_other_columns(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            "lang": list("abcdef"),
            "text": [f"first {i}\nCOMMON\nlast {i}" for i in range(6)],
        }
    )
    docs = spark.createDataFrame(pdf)
    out = line_dedup(docs, max_docs_per_line=4).orderBy("doc_id").toPandas()
    assert list(out.columns) == ["doc_id", "lang", "text"]
    assert (out["text"] == [f"first {i}\nlast {i}" for i in range(6)]).all()
    assert list(out["lang"]) == list("abcdef")


def test_line_dedup_matches_duckdb_replay(spark):
    """Cross-engine pin: the digest/frequency/filter/reassembly chain
    replayed in DuckDB SQL over the same rows — the oracle this op
    would ship with if a driver-window slot opens."""
    docs = _corpus(spark)
    got = line_dedup(docs, max_docs_per_line=4).orderBy("doc_id").toPandas()
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute("""
        WITH split AS (
          SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
        lines AS (
          SELECT doc_id, i AS pos, ls[i] AS line
          FROM split, UNNEST(range(1, len(ls) + 1)) AS u(i)),
        bp AS (
          SELECT md5(line) AS digest
          FROM lines WHERE LENGTH(TRIM(line)) > 0
          GROUP BY md5(line) HAVING COUNT(DISTINCT doc_id) > 4),
        kept AS (
          SELECT * FROM lines
          WHERE md5(line) NOT IN (SELECT digest FROM bp))
        SELECT d.doc_id,
               COALESCE(k.t, '') AS text
        FROM docs d LEFT JOIN (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t
          FROM kept GROUP BY doc_id) k USING (doc_id)
        ORDER BY d.doc_id
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def test_line_dedup_plan_stays_jvm_side(spark):
    from swingstream.plans.explain import explain_str

    plan = explain_str(line_dedup(_corpus(spark)), "simple")
    assert "Python" not in plan, plan


def test_boilerplate_profile_exempts_blank_lines(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(10),
                      "text": ["x\n\n  \ncontent %d" % i for i in range(10)]})
    )
    bp = boilerplate_line_digests(docs, max_docs_per_line=2).toPandas()
    # "x" appears in 10 docs -> profiled; blank/whitespace lines never
    assert len(bp) == 1


def test_compact_strip_lines_targeted_rewrite(spark, tmp_path):
    """The maintenance pass rewrites ONLY commits containing a
    boilerplate line, feeds line_dedup the snapshot-global profile, and
    a strip-nothing profile commits nothing."""
    from swingstream.sources.catalog import IcebergLiteTable
    from swingstream.streaming.compaction import compact_strip_lines

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    t = IcebergLiteTable(str(tmp_path / "tbl"))
    # BOILER appears once per commit 0-4 (5 docs > max 4); commit 5 clean
    for b in range(5):
        t.commit(b, df([(b * 10, f"keep {b}\n{BOILER}")]))
    t.commit(5, df([(50, "totally clean\nno template here")]))

    m = compact_strip_lines(spark, t, max_docs_per_line=4,
                            compaction_id="strip-0")
    assert m is not None and m["operation"] == "line-dedup-compaction"
    assert sorted(str(b) for b in m["replaces"]) == ["0", "1", "2", "3", "4"]
    got = t.read(spark).orderBy("doc_id").toPandas()
    assert list(got["text"]) == [f"keep {b}" for b in range(5)] + [
        "totally clean\nno template here"
    ]
    # clean commit's append manifest is still the active one
    assert "5" in {str(a["batch_id"]) for a in t.active_manifests()}

    # a second pass finds nothing above threshold -> exact no-op
    n = len(t.manifests())
    assert compact_strip_lines(spark, t, max_docs_per_line=4,
                               compaction_id="strip-1") is None
    assert len(t.manifests()) == n
    import os
    assert not os.path.exists(t._manifest_path("strip-1") + ".intent")


def test_streamed_strip_lines_matches_one_shot_batch(spark, tmp_path):
    """End-state parity: streamed ingest + drain-time dedup + final
    strip-lines pass == one-shot batch dedup_survivors -> line_dedup.
    Line document-frequency is per-corpus (doesn't commute with
    micro-batching), which is exactly why the strip runs once at drain
    over the deduplicated snapshot."""
    from swingstream.fixtures import PagesSpec, gen_pages, write_pages_stream_dir
    from swingstream.operators.dedup import dedup_survivors, exact_dup_pairs
    from swingstream.sources.pages import pages_from_pandas, read_pages_stream
    from swingstream.streaming.compaction import run_corpus_stream_with_compaction

    spec = PagesSpec(n_hosts=3, n_buckets=16, base_docs_per_bucket=4,
                     content_dup_frac=0.2, late_frac=0.0)
    pdf = gen_pages(spec)
    # implant a boilerplate line into a deterministic subset of docs
    import hashlib
    key = pdf["url"] + "@" + pdf["warc_ts"].astype("int64").astype(str)
    h = key.map(lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16))
    mark = h % 3 == 0
    pdf.loc[mark, "text"] = BOILER + "\n" + pdf.loc[mark, "text"]
    assert mark.sum() > 5
    d = tmp_path / "stripstream"
    write_pages_stream_dir(pdf, str(d), n_files=5)

    def with_uid(df):
        return df.withColumn(
            "row_uid",
            F.concat_ws("@", "url", F.unix_micros(
                F.col("warc_ts").cast("timestamp")).cast("string")),
        )

    stream = with_uid(
        read_pages_stream(spark, str(d), max_files_per_trigger=1)
        .withWatermark("warc_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["url", "warc_ts"])
    )
    table = run_corpus_stream_with_compaction(
        spark, stream, str(tmp_path / "strip_corpus"), str(tmp_path / "strip_ck"),
        id_col="row_uid", every=2, final_strip_lines_max_docs=4,
    )

    all_pages = with_uid(
        pages_from_pandas(spark, pdf).dropDuplicates(["url", "warc_ts"])
    )
    deduped = dedup_survivors(
        all_pages, exact_dup_pairs(all_pages, id_col="row_uid"), "row_uid"
    )
    expected = (
        line_dedup(deduped, max_docs_per_line=4, id_col="row_uid")
        .select("row_uid", "text").toPandas()
        .sort_values("row_uid").reset_index(drop=True)
    )
    got = (
        table.read(spark).select("row_uid", "text").toPandas()
        .sort_values("row_uid").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected)
    # the strip actually fired and the boilerplate is gone
    assert any(m.get("operation") == "line-dedup-compaction"
               for m in table.manifests())
    assert not got["text"].str.contains(BOILER, regex=False).any()
    assert (expected["text"].str.len() < 1).sum() == 0  # originals nonempty


def test_compact_strip_lines_crash_retry(spark, tmp_path):
    """compact_strip_lines shares the intent-sidecar machinery; pin it
    END-TO-END for this pass too: crash between data publish and
    manifest write -> identical-parameter retry adopts the published
    dir; an append landing in between makes the retry refuse loudly."""
    import os
    import shutil

    import pytest

    from swingstream.sources.catalog import IcebergLiteTable
    from swingstream.streaming.compaction import compact_strip_lines

    def df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    t = IcebergLiteTable(str(tmp_path / "tbl"))
    for b in range(5):
        t.commit(b, df([(b * 10, f"keep {b}\n{BOILER}")]))

    orig = IcebergLiteTable._write_manifest

    def boom(self, batch_id, *a, **k):
        if str(batch_id) == "strip-0":
            raise RuntimeError("injected crash before manifest write")
        return orig(self, batch_id, *a, **k)

    IcebergLiteTable._write_manifest = boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            compact_strip_lines(spark, t, max_docs_per_line=4,
                                compaction_id="strip-0")
    finally:
        IcebergLiteTable._write_manifest = orig
    assert os.path.isdir(os.path.join(t.data_dir, "batch-strip-0"))
    assert not t.committed("strip-0")

    # an append lands before the retry -> stale-snapshot refusal
    t.commit(9, df([(90, "late arrival")]))
    with pytest.raises(RuntimeError, match="active snapshot changed"):
        compact_strip_lines(spark, t, max_docs_per_line=4,
                            compaction_id="strip-0")
    # heal: drop the orphan, recompute over the current snapshot
    shutil.rmtree(os.path.join(t.data_dir, "batch-strip-0"))
    m = compact_strip_lines(spark, t, max_docs_per_line=4,
                            compaction_id="strip-0")
    assert m is not None and m["operation"] == "line-dedup-compaction"
    got = t.read(spark).orderBy("doc_id").toPandas()
    assert list(got["text"]) == [f"keep {b}" for b in range(5)] + [
        "late arrival"]
    assert not os.path.exists(t._manifest_path("strip-0") + ".intent")
