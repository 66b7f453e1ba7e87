"""Bucketed-table co-location: a join between two tables bucketed on the
join key must plan with no Exchange on either side — the property that
makes repeated fact⋈fact joins affordable at 100 TB."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.sources import writers


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = catalog.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = catalog.load(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    writers.write_bucketed_table(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    writers.write_bucketed_table(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    t_orders, t_li = bucketed_tables
    joined = spark.table(t_li).join(
        spark.table(t_orders),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # Disable broadcast so the co-location (not a broadcast) is what
    # avoids the shuffle — mirroring a fact⋈fact join too big to broadcast.
    with _no_broadcast(spark):
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    t_orders, t_li = bucketed_tables
    bucketed = (
        spark.table(t_li)
        .join(spark.table(t_orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = catalog.load(spark, "orders", sf_dir)
    li = catalog.load(spark, "lineitem", sf_dir)
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_write_table_falls_back_to_parquet(spark, sf_dir, tmp_path):
    """Delta/Iceberg connectors are absent here — write_table must fall
    back to parquet and report it (call sites stay cluster-portable)."""
    nation = catalog.load(spark, "nation", sf_dir)
    used = writers.write_table(nation, str(tmp_path / "t"), fmt="delta")
    assert used == "parquet"
    assert spark.read.parquet(str(tmp_path / "t")).count() == nation.count()
