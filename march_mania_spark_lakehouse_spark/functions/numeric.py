"""Order-independent numeric aggregation helpers.

Floating-point SUM/AVG over doubles is order-dependent, and Spark's
parallel partial aggregation visits rows in a different order than any
single-threaded oracle — so a bit-exact correctness gate needs an
order-*independent* formulation (SURVEY.md §7, risk #3).

The trick: cast each double to DECIMAL before summing. The per-row cast is
deterministic, decimal addition is exact and associative, and casting the
exact decimal total back to double is deterministic — so Spark (any
parallelism, any AQE plan) and a serial SQL engine produce bit-identical
doubles. AVG is expressed as exact-decimal-sum divided by count for the
same reason (engines disagree on AVG-over-decimal result types).

This is also the right 100 TB posture: the decimal cast adds no shuffle
and keeps the aggregate inside whole-stage codegen with partial (map-side)
aggregation intact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default exact-sum accumulator type: wide enough for 1e14-scale totals at
#: 1e-6 precision; Spark widens the SUM result to decimal(38,6) internally.
DEC = "decimal(28,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, alias: str, dec: str = DEC) -> Column:
    """Exact, order-independent SUM over a double expression → double."""
    return F.sum(_col(c).cast(dec)).cast("double").alias(alias)


def davg(c: Column | str, alias: str, dec: str = DEC) -> Column:
    """Order-independent AVG: exact decimal sum / count → double."""
    col = _col(c)
    return (F.sum(col.cast(dec)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str, dec: str = DEC) -> str:
    """ANSI-SQL rendering of :func:`dsum` (DuckDB oracle side)."""
    return f"CAST(SUM(CAST(({expr}) AS {dec.upper()})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, dec: str = DEC) -> str:
    """ANSI-SQL rendering of :func:`davg` (DuckDB oracle side)."""
    return (
        f"CAST(SUM(CAST(({expr}) AS {dec.upper()})) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
