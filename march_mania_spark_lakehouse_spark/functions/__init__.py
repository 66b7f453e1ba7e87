"""Scalar/aggregate function helpers shared by the operator library."""

from march_mania_spark_lakehouse_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg"]
