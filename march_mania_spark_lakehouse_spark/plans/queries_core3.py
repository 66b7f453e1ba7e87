"""Third core batch — the remaining reference idioms as named queries:
label-symmetric matchup building (U3), opponent-stats join + aggregation
(J2/A2, the SOS shape), and latest-per-group → consensus chaining (W2+A3,
the Massey shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import davg, sql_davg
from march_mania_spark_lakehouse_spark.operators import setops
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# U3 — label-symmetric matchups: ordered pairs ⊎ mirrored pairs.
# Parity: `jobs/03_build_gold_training_set.py:39-60`.
# --------------------------------------------------------------------------

_Q48_SQL = """
WITH seq AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
),
pairs AS (
    SELECT a.o_custkey AS entity,
           a.o_orderkey AS first_key, b.o_orderkey AS second_key,
           a.o_totalprice AS first_price, b.o_totalprice AS second_price
    FROM seq a JOIN seq b
      ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
)
SELECT entity, first_key AS key1, second_key AS key2,
       CASE WHEN first_price > second_price THEN 1 ELSE 0 END AS label
FROM pairs
UNION ALL
SELECT entity, second_key AS key1, first_key AS key2,
       CASE WHEN first_price > second_price THEN 0 ELSE 1 END AS label
FROM pairs
"""


@query("q48_labeled_matchups", oracle=_Q48_SQL, tags=("union", "window"))
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-symmetric matchup grid (U3): each consecutive-order pair
    emitted twice with mirrored keys and complementary labels — the
    training-set symmetry trick. Property: label sums to 1 per pair."""
    o = catalog.load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
    )
    a = seq.alias("a")
    b = seq.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("b.rn") == F.col("a.rn") + 1),
    ).select(
        F.col("a.o_custkey").alias("entity"),
        F.col("a.o_orderkey").alias("first_key"),
        F.col("b.o_orderkey").alias("second_key"),
        F.col("a.o_totalprice").alias("first_price"),
        F.col("b.o_totalprice").alias("second_price"),
    )
    label = (F.col("first_price") > F.col("second_price")).cast("int")
    return setops.union_by_name(
        [
            pairs.select(
                "entity",
                F.col("first_key").alias("key1"),
                F.col("second_key").alias("key2"),
                label.alias("label"),
            ),
            pairs.select(
                "entity",
                F.col("second_key").alias("key1"),
                F.col("first_key").alias("key2"),
                (1 - label).alias("label"),
            ),
        ]
    )


# --------------------------------------------------------------------------
# J2/A2 — strength-of-schedule shape: join opponent stats, aggregate.
# Parity: `src/features/sos.py:19-60`.
# --------------------------------------------------------------------------

_Q49_SQL = f"""
SELECT l_suppkey,
       COUNT(DISTINCT l_partkey) AS n_parts,
       {sql_davg("p_retailprice", "sos_part_price")},
       {sql_davg("p_size", "sos_part_size")}
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY l_suppkey
"""


@query("q49_supplier_sos", oracle=_Q49_SQL, tags=("join", "agg"))
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOS aggregation shape (J2/A2): attach each 'opponent''s stats via a
    broadcast join on the opponent key, then average per entity."""
    from march_mania_spark_lakehouse_spark.operators.core import rebalance_scan

    # fact side of a broadcast join over a single-file scan: one task
    # runs the probe AND the (suppkey, partkey) partial aggregate;
    # rebalance restores parallelism, identity at scale (optimization
    # round 13, guide §2.5). Measured 2.1-2.9 -> 1.7-1.9 s back-to-back.
    li = rebalance_scan(
        catalog.load(spark, "lineitem", sf_dir).select("l_suppkey", "l_partkey")
    )
    part = catalog.load(spark, "part", sf_dir).select(
        "p_partkey", "p_retailprice", "p_size"
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        davg("p_retailprice", "sos_part_price"),
        davg(F.col("p_size").cast("double"), "sos_part_size"),
    )


# --------------------------------------------------------------------------
# W2 + A3 — latest-per-group feeding a consensus aggregate.
# Parity: Massey `src/features/massey.py:53-71`.
# --------------------------------------------------------------------------

_Q50_SQL = f"""
WITH latest AS (
    SELECT user_id, event_type, value
    FROM (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
)
SELECT user_id,
       {sql_davg("value", "mean_latest_value")},
       CAST(median(value) AS DOUBLE) AS median_latest_value,
       COUNT(*) AS n_systems
FROM latest
GROUP BY user_id
"""


@query("q50_latest_consensus", oracle=_Q50_SQL, tags=("window", "agg"))
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Massey-consensus shape: latest observation per (entity, system) via
    row_number desc, then mean/median/count consensus per entity."""
    from march_mania_spark_lakehouse_spark.operators import core as ops

    ev = catalog.load(spark, "events", sf_dir)
    latest = ops.latest_per_group(
        ev.select("user_id", "event_type", "value", "ts", "event_id"),
        ["user_id", "event_type"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    )
    return latest.groupBy("user_id").agg(
        davg("value", "mean_latest_value"),
        F.median("value").cast("double").alias("median_latest_value"),
        F.count(F.lit(1)).alias("n_systems"),
    )
