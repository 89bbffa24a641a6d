"""Structured Streaming pipelines (SURVEY.md §2.8, §3.4).

Two chained queries (Spark restricts stacking many stateful operators in
one query — SURVEY.md §3.4):

  query 1 (features):  pages file-stream → watermark → exactly-once
      dedup-within-watermark → SALTED event-time tumbling-window feature
      aggregation (hot-host skew: state shuffle keyed by url-hash salt)
      → foreachBatch salt-combine + idempotent Iceberg-style commit to
      the staging features table;
  query 2 (scoring):   staging table file-stream → per-host rolling
      buffer in applyInPandasWithState → SWING lagged-design regression
      per complete window (same numpy core as batch — byte-identical
      rows) → idempotent commit to the edges table.

Path A (the stateful stream-stream lagged self-join of BASELINE.json)
is its own pipeline in streaming/join.py.
"""
