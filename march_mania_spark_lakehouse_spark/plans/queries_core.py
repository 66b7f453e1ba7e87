"""Core relational queries (SURVEY.md §2.1–§2.8 parity).

Every query here is a (DataFrame plan, DuckDB oracle SQL) pair. Float
aggregates use the order-independent decimal-sum formulation
(functions/numeric.py) so Spark's parallel plans are bit-identical to the
serial oracle. All divisions are guarded (ANSI-mode safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from march_mania_spark_lakehouse_spark.operators import core as ops
from march_mania_spark_lakehouse_spark.operators import joins, setops
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# A1/P2/P4 — pricing summary: filter → hash agg with partial aggregation.
# Parity: team-season stats `src/features/basketball_features.py:63-76`.
# --------------------------------------------------------------------------

_Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum("l_quantity", "sum_qty")},
       {sql_dsum("l_extendedprice", "sum_base_price")},
       {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_davg("l_quantity", "avg_qty")},
       {sql_davg("l_extendedprice", "avg_price")},
       {sql_davg("l_discount", "avg_disc")},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=_Q01_SQL, tags=("agg", "filter"))
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + groupBy + sum/avg/count (A1, P2, P4): scan-predicate
    pushdown feeds a single-shuffle hash aggregate."""
    li = catalog.load(spark, "lineitem", sf_dir)
    return (
        # No rebalance here (optimization round 14): the downstream is a
        # plain partial aggregate over few columns — round-robin
        # exchanging the full fact table to parallelize it cost more
        # than the one-core work it spread (driver bench 1.45 → 1.83 s
        # in round 13); heavier probes (q37/q49) keep theirs.
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# J1/J4 — star join: fact ⋈ broadcast dims, agg per nation/region.
# Parity: matchup ⋈ feature dims `src/features/basketball_features_plus.py:91-99`.
# --------------------------------------------------------------------------

_Q02_SQL = f"""
SELECT r_name, n_name,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY r_name, n_name
"""


@query("q02_star_join_revenue", oracle=_Q02_SQL, tags=("join", "agg"))
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (J1): lineitem⋈orders⋈customer⋈nation⋈region with the
    dimension sides broadcast — the fact never shuffles for the joins;
    the one shuffle is the final aggregation."""
    # No rebalance (optimization round 14): the broadcast-join probe +
    # partial agg are cheap enough that the added round-robin exchange
    # of the fact table cost more than it bought (driver bench
    # 1.03 → 1.74 s in round 13)
    li = catalog.load(spark, "lineitem", sf_dir)
    orders = catalog.load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = catalog.load(spark, "customer", sf_dir)
    nation = catalog.load(spark, "nation", sf_dir)
    region = catalog.load(spark, "region", sf_dir)
    joined = joins.star_join(
        li,
        [
            (orders, F.col("l_orderkey") == F.col("o_orderkey")),
            (cust, F.col("o_custkey") == F.col("c_custkey")),
            (nation, F.col("c_nationkey") == F.col("n_nationkey")),
            (region, F.col("n_regionkey") == F.col("r_regionkey")),
        ],
    )
    return joined.groupBy("r_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# U1/U2 — long-table explosion: two projections ⊎ → per-party stats.
# Parity: winners⊎losers long game table `src/features/rolling.py:20-55`.
# --------------------------------------------------------------------------

_Q03_SQL = f"""
WITH long_t AS (
    SELECT 'supplier' AS role, l_suppkey AS party,
           l_extendedprice AS amount, l_quantity AS qty
    FROM lineitem
    UNION ALL
    SELECT 'part' AS role, l_partkey AS party,
           l_extendedprice AS amount, l_quantity AS qty
    FROM lineitem
)
SELECT role, party, COUNT(*) AS n_rows,
       {sql_dsum("amount", "sum_amount")},
       {sql_davg("qty", "avg_qty")}
FROM long_t
GROUP BY role, party
"""


@query("q03_long_union_stats", oracle=_Q03_SQL, tags=("union", "agg"))
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-table idiom (U1/U2): explode each row into per-role rows via
    unionByName (zero-shuffle), then one hash agg."""
    li = catalog.load(spark, "lineitem", sf_dir)
    long_t = setops.explode_roles(
        li,
        [
            [
                F.lit("supplier").alias("role"),
                F.col("l_suppkey").alias("party"),
                F.col("l_extendedprice").alias("amount"),
                F.col("l_quantity").alias("qty"),
            ],
            [
                F.lit("part").alias("role"),
                F.col("l_partkey").alias("party"),
                F.col("l_extendedprice").alias("amount"),
                F.col("l_quantity").alias("qty"),
            ],
        ],
    )
    return long_t.groupBy("role", "party").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("amount", "sum_amount"),
        davg("qty", "avg_qty"),
    )


# --------------------------------------------------------------------------
# W2/W3/P5/P8 — latest-per-group.
# Parity: `src/features/massey.py:53-59`, `jobs/06:51-57`.
# --------------------------------------------------------------------------

_Q04_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
           ) AS rn
    FROM orders
)
WHERE rn = 1
"""


@query("q04_latest_order_per_customer", oracle=_Q04_SQL, tags=("window",))
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-group (W2): row_number desc + keep rn==1, with a unique
    tiebreaker for total ordering."""
    orders = catalog.load(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return ops.latest_per_group(
        orders,
        keys=["o_custkey"],
        order_by=[F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )


# --------------------------------------------------------------------------
# W1 — causal rolling frame (-n, -1), excludes current row.
# Parity: `src/features/rolling.py:80-93`.
# --------------------------------------------------------------------------

_Q05_SQL = """
SELECT event_id, user_id, value,
       CASE WHEN COUNT(value) OVER w > 0
            THEN CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 / COUNT(value) OVER w
       END AS roll_avg_value
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
)
"""


@query("q05_rolling_user_value", oracle=_Q05_SQL, tags=("window",))
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal rolling average (W1): frame (-10, -1) excludes the current
    row → null on each user's first event (anti-leakage semantics)."""
    ev = catalog.load(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "value"
    )
    out = ops.causal_rolling_avg(
        ev,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        value_col="value",
        last_n=10,
        out_col="roll_avg_value",
    )
    return out.select("event_id", "user_id", "value", "roll_avg_value")


# --------------------------------------------------------------------------
# A3 — consensus aggregate with exact median.
# Parity: Massey consensus `src/features/massey.py:63-71` (the reference
# uses percentile_approx; we use exact median so the oracle matches —
# SURVEY.md §7 phase-2 caution).
# --------------------------------------------------------------------------

_Q06_SQL = f"""
SELECT l_returnflag,
       {sql_davg("l_quantity", "avg_qty")},
       CAST(median(l_quantity) AS DOUBLE) AS median_qty,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


@query("q06_median_consensus", oracle=_Q06_SQL, tags=("agg",))
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean + exact median + count per group (A3)."""
    li = catalog.load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        davg("l_quantity", "avg_qty"),
        F.median("l_quantity").cast("double").alias("median_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# F1/F7/P2 — regexp_extract parse + conditional bucket.
# Parity: seed parse `src/features/seeds.py:21,49-50`.
# --------------------------------------------------------------------------

_Q07_SQL = """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
       p_type,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END AS size_bucket
FROM part
"""


@query("q07_regex_parse", oracle=_Q07_SQL, tags=("scalar",))
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex parse (F1) + CASE bucketing: 'Brand#13' → 13, size → bucket."""
    part = catalog.load(spark, "part", sf_dir)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        "p_type",
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_bucket"),
    )


# --------------------------------------------------------------------------
# F2 — split + getItem key parse.
# Parity: submission ID parse `jobs/04_train_and_export_submission.py:84-90`.
# --------------------------------------------------------------------------

_Q08_SQL = """
SELECT c_custkey,
       CAST(string_split(c_name, '#')[2] AS BIGINT) AS name_seq,
       c_mktsegment
FROM customer
"""


@query("q08_split_key_parse", oracle=_Q08_SQL, tags=("scalar",))
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split+getItem (F2): 'Customer#000000042' → 42."""
    cust = catalog.load(spark, "customer", sf_dir)
    return cust.select(
        "c_custkey",
        F.split(F.col("c_name"), "#").getItem(1).cast("long").alias("name_seq"),
        "c_mktsegment",
    )


# --------------------------------------------------------------------------
# P7 — distinct projection. Parity: `jobs/04:64`.
# --------------------------------------------------------------------------


@query(
    "q09_distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    tags=("distinct",),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (P7): map-side partial distinct then one narrow shuffle."""
    return ops.distinct_values(catalog.load(spark, "customer", sf_dir), ["c_mktsegment"])


# --------------------------------------------------------------------------
# P3/P6 — derived nullable column + dropna.
# Parity: optional features `jobs/feature_helpers.py:36` + dropna `jobs/03:82`.
# --------------------------------------------------------------------------

_Q10_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_rows, {sql_dsum("big_disc_price", "sum_big_disc")}
FROM (
    SELECT l_returnflag,
           CASE WHEN l_discount > 0.02
                THEN l_extendedprice * (1 - l_discount) END AS big_disc_price
    FROM lineitem
)
WHERE big_disc_price IS NOT NULL
GROUP BY l_returnflag
"""


@query("q10_nullable_dropna", oracle=_Q10_SQL, tags=("filter", "agg"))
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-null derived column (P3) + dropna (P6) + agg."""
    li = catalog.load(spark, "lineitem", sf_dir)
    derived = li.withColumn(
        "big_disc_price",
        F.when(
            F.col("l_discount") > 0.02,
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ),
    )
    return (
        ops.drop_null_rows(derived, ["big_disc_price"])
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("big_disc_price", "sum_big_disc"))
    )


# --------------------------------------------------------------------------
# §2.6 — top-k per group and global sort+limit (engine additions).
# --------------------------------------------------------------------------

_Q11_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS rk
    FROM orders
)
WHERE rk <= 3
"""


@query("q11_topk_orders_per_customer", oracle=_Q11_SQL, tags=("window",))
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number ≤ k — one shuffle, no global sort."""
    orders = catalog.load(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return ops.topk_per_group(
        orders,
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rk",
    )


_Q12_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@query("q12_global_topk", oracle=_Q12_SQL, tags=("sort",))
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort+limit: Spark's TakeOrderedAndProject does per-partition
    top-k + single merge — no full sort materialized at any scale."""
    orders = catalog.load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return ops.global_topk(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 20
    )


# --------------------------------------------------------------------------
# Semi/anti joins (engine additions over J*).
# --------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
)
"""


@query("q13_semi_join", oracle=_Q13_SQL, tags=("join",))
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): never widens the left side."""
    cust = catalog.load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    fo = (
        catalog.load(spark, "orders", sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.semi_join(cust, fo, on=["c_custkey"])


_Q14_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_totalprice > 450000
)
"""


@query("q14_anti_join", oracle=_Q14_SQL, tags=("join",))
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no high-value order."""
    cust = catalog.load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    o = (
        catalog.load(spark, "orders", sf_dir)
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.anti_join(cust, o, on=["c_custkey"])


# --------------------------------------------------------------------------
# F4/F5/F6 — least/greatest clipping + log, aggregated.
# Parity: probability clipping + cross-entropy `src/ml/modeling.py:126-130`.
# --------------------------------------------------------------------------

_Q15_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {sql_dsum("ROUND(LN(GREATEST(LEAST(o_totalprice / 1000.0, 500.0), 1.0)), 6)", "sum_log_margin")}
FROM orders
GROUP BY o_orderpriority
"""


@query("q15_clipped_log_margin", oracle=_Q15_SQL, tags=("scalar", "agg"))
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """least/greatest clipping (F5) + natural log (F6), summed exactly.
    The per-row log is rounded to 6 digits before the exact sum so 1-ulp
    libm differences between engines cannot surface."""
    orders = catalog.load(spark, "orders", sf_dir)
    clipped = F.greatest(F.least(F.col("o_totalprice") / 1000.0, F.lit(500.0)), F.lit(1.0))
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.round(F.log(clipped), 6), "sum_log_margin"),
    )


# --------------------------------------------------------------------------
# Date extraction + conditional aggregation (season-split analog, M8/P4).
# --------------------------------------------------------------------------

_Q16_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
       o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
FROM orders
GROUP BY 1, 2
"""


@query("q16_yearly_status_counts", oracle=_Q16_SQL, tags=("scalar", "agg"))
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + conditional count — the season-split idiom
    (`jobs/04:67-68`) expressed as one aggregation."""
    orders = catalog.load(spark, "orders", sf_dir)
    return orders.groupBy(
        F.year("o_orderdate").alias("o_year"), F.col("o_orderstatus")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).cast("long")
        ).alias("n_urgent"),
    )
