"""Registry of named queries: spark plan builder + optional DuckDB oracle."""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_QUERY_MODULES = (
    "march_mania_spark_lakehouse_spark.plans.queries_core",
    "march_mania_spark_lakehouse_spark.plans.queries_core2",
    "march_mania_spark_lakehouse_spark.plans.queries_core3",
    "march_mania_spark_lakehouse_spark.plans.queries_core4",
    "march_mania_spark_lakehouse_spark.plans.queries_core5",
    "march_mania_spark_lakehouse_spark.plans.queries_core6",
    "march_mania_spark_lakehouse_spark.plans.queries_core7",
    "march_mania_spark_lakehouse_spark.plans.queries_lake",
    "march_mania_spark_lakehouse_spark.plans.queries_lake2",
    "march_mania_spark_lakehouse_spark.plans.queries_media",
    "march_mania_spark_lakehouse_spark.plans.queries_ext",
    "march_mania_spark_lakehouse_spark.plans.queries_ext2",
    "march_mania_spark_lakehouse_spark.plans.queries_ext3",
    "march_mania_spark_lakehouse_spark.plans.queries_ext4",
    "march_mania_spark_lakehouse_spark.plans.queries_ext5",
    "march_mania_spark_lakehouse_spark.plans.queries_ext6",
    "march_mania_spark_lakehouse_spark.plans.queries_ext7",
    "march_mania_spark_lakehouse_spark.plans.queries_ext8",
    "march_mania_spark_lakehouse_spark.plans.queries_fold",
    "march_mania_spark_lakehouse_spark.plans.queries_pipeline",
    "march_mania_spark_lakehouse_spark.plans.queries_ml",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = True
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: register a (spark, sf_dir) -> DataFrame plan builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            doc=(fn.__doc__ or "").strip(),
            fn=fn,
            oracle=oracle,
            bench=bench,
            tags=tuple(tags),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
