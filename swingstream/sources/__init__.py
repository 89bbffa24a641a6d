"""Sources & sinks (SURVEY.md §2.1): pages table readers (batch + stream)
and the Iceberg-style partitioned-parquet catalog with manifest commits."""
