"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (and
the E1–E6 extensions) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query (same column names — the comparator sorts columns
by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from march_mania_spark_lakehouse_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_queries()
    return specs["q02_star_join_revenue"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query (SURVEY.md §2)."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; non-relational
    ops (Elo fold, MLlib, LSH signatures) are intentionally omitted →
    rows-only checks. ``__SF_DIR__`` (oracles that must read files rather
    than the pre-registered views, e.g. filename-grouped stats) is pinned
    to the driver's sf0.01 compare scale."""
    return {
        name: spec.oracle.replace("__SF_DIR__", "/root/testdata/sf0.01")
        for name, spec in all_queries().items()
        if spec.oracle
    }
