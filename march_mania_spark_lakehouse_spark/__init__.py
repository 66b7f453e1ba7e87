"""march_mania_spark_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark engine with the query and data-processing
capabilities of the reference lakehouse pipeline (see SURVEY.md), built on
DataFrame/SQL/Catalyst primitives and extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, event-time processing),
designed for 100 TB scale: declarative plans, broadcast-able dimension
joins, partial aggregation, pushed-down scans, and Arrow-batched pandas
UDFs only where relational operators genuinely cannot express the
semantics.
"""

__version__ = "0.1.0"
