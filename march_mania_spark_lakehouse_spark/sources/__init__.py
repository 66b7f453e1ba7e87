"""Sources & sinks: CSV/Parquet/JSON readers, partitioned parquet sink,
single-file CSV export, driver-side artifacts (SURVEY.md §2.1 S1–S10)."""
