"""Salted aggregation/join must be result-identical to the unsalted ops
(salting only reshapes the shuffle key space)."""

from __future__ import annotations

import pyspark.sql.functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import skew


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    li = catalog.load(spark, "lineitem", sf_dir)
    salted = skew.salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("l_quantity", "count"),
            "total_qty": ("l_quantity", "sum"),
            "max_qty": ("l_quantity", "max"),
            "min_price": ("l_extendedprice", "min"),
        },
        n_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        F.sum("l_quantity").alias("total_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = catalog.load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = catalog.load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    right = cust.withColumnRenamed("c_custkey", "o_custkey")
    salted = skew.salted_join(orders, right, on=["o_custkey"], n_salts=4)
    plain = orders.join(right, on=["o_custkey"])
    assert _sorted_rows(salted.select("o_orderkey", "o_custkey", "c_name")) == \
        _sorted_rows(plain.select("o_orderkey", "o_custkey", "c_name"))


def test_salted_agg_spreads_hot_key(spark):
    """A 100%-hot key must fan out over all salt values (AQE may still
    coalesce tiny test partitions, so assert on the key space — at scale
    distinct shuffle keys are what spread reducers)."""
    df = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    salts = skew.with_salt(df, 8).select(skew.SALT_COL).distinct().collect()
    assert len(salts) == 8


def test_salted_join_rejects_right_preserving_joins(spark, sf_dir):
    import pytest

    orders = catalog.load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = catalog.load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey")
    )
    with pytest.raises(ValueError, match="left-preserving"):
        skew.salted_join(orders, cust, on=["o_custkey"], how="full")


def test_salted_count_distinct_matches_plain(spark, sf_dir):
    orders = catalog.load(spark, "orders", sf_dir)
    salted = skew.salted_count_distinct(
        orders, ["o_orderstatus"], "o_custkey", alias="n", n_salts=8
    )
    plain = orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n")
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_count_distinct_exact_on_pure_hot_key(spark):
    """One key, many distinct + repeated values: value-derived salts must
    partition the distinct set (no double counting across salts)."""
    df = (
        spark.range(20_000)
        .select(F.lit("hot").alias("k"), (F.col("id") % 7_000).alias("v"))
    )
    out = skew.salted_count_distinct(df, ["k"], "v", alias="n", n_salts=16)
    assert out.collect()[0]["n"] == 7_000
