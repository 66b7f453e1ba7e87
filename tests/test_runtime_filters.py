"""Runtime data-skipping at the plan level: dynamic partition pruning
(DPP) and injected bloom-filter joins — the two Spark mechanisms that
turn a selective dimension filter into a fact-side scan reduction
WITHOUT touching the query text. At 100 TB these are the difference
between scanning a partition and scanning a lake."""

from __future__ import annotations

import pyspark.sql.functions as F

from march_mania_spark_lakehouse_spark import catalog


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A join between a date-partitioned fact table and a filtered dim
    must inject a DynamicPruning subquery on the fact scan: only the
    partitions whose keys survive the dim filter are read. This is the
    runtime analogue of static partition pruning — essential when the
    pruning predicate is only known after filtering the dimension."""
    fact_path = str(tmp_path / "orders_by_status")
    catalog.load(spark, "orders", sf_dir).write.partitionBy(
        "o_orderstatus"
    ).parquet(fact_path)
    fact = spark.read.parquet(fact_path)

    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "status string, label string",
    ).filter(F.col("label") == "finished")

    joined = fact.join(dim, fact.o_orderstatus == dim.status).groupBy(
        "label"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruned execution still returns exactly the F partition
    [row] = joined.collect()
    exact = (
        catalog.load(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert row.n == exact


def test_bloom_filter_join_reduction(spark, sf_dir):
    """With runtime bloom filters enabled, a selective non-partition
    join key must inject bloom_filter_agg / BloomFilterMightContain on
    the large side — a semi-join reduction that drops non-matching fact
    rows BEFORE the shuffle instead of after it."""
    conf = spark.conf
    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtimeFilter.number.threshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        # force a shuffle join (broadcast would bypass the bloom filter)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        # default 10GB: the big side must look big enough to bother —
        # irrelevant to the plan-shape assertion at test scale
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = catalog.load(spark, "lineitem", sf_dir)
        sel = (
            catalog.load(spark, "orders", sf_dir)
            .filter(F.col("o_totalprice") > 400000)
            .select("o_orderkey")
        )
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(joined)
        assert "bloomfilter" in plan.lower().replace("_", ""), plan
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    conf.unset(k)
                except Exception:
                    pass
            else:
                conf.set(k, v)
