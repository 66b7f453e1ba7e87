"""Query plans: the engine's named query surface.

Each query is a (PySpark plan builder, ANSI-SQL oracle) pair registered in
``plans.registry``; the driver and the local test-suite run both against
the same parquet and compare row-count + schema + order-insensitive value
hashes. Non-SQL-expressible operators register without an oracle
(rows-only check) and carry dedicated unit tests instead.
"""

from march_mania_spark_lakehouse_spark.plans.registry import QuerySpec, all_queries, query

__all__ = ["QuerySpec", "all_queries", "query"]
