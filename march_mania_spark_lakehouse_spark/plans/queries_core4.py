"""Fourth relational batch: grouping sets, ranking-window extras,
approximate distinct counting, conditional aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# GROUPING SETS — the general form behind rollup (q36) / cube (q37).
# Identical SQL text runs on both engines.
# --------------------------------------------------------------------------

_Q59_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("q59_grouping_sets", oracle=_Q59_SQL, tags=("agg", "sql"))
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via spark.sql — one scan, Expand node fans rows to
    each grouping, then a single partial→final hash agg (not one job per
    grouping)."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(_Q59_SQL)


# --------------------------------------------------------------------------
# Ranking-window extras beyond q35: ntile / percent_rank / cume_dist.
# --------------------------------------------------------------------------

_Q60_SQL = """
SELECT o_orderkey,
       o_custkey,
       NTILE(4) OVER w AS price_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
       ROUND(CUME_DIST() OVER w, 6) AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


@query("q60_rank_distribution", oracle=_Q60_SQL, tags=("window",))
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a totally-ordered window (the
    o_orderkey tiebreaker makes ranks deterministic). One shuffle keyed
    on the partition column."""
    orders = catalog.load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# --------------------------------------------------------------------------
# Approximate distinct counting — the 100 TB cardinality tool. HLL is
# engine-specific (not oracle-matchable); the error bound is the test.
# --------------------------------------------------------------------------


@query("q61_approx_distinct", oracle=None, tags=("agg", "approx"))
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count per
    group. At 100 TB the exact form shuffles every distinct value; the
    sketch is constant-size per group and mergeable. rsd=0.02 → ±2%
    (error bound unit-tested)."""
    li = catalog.load(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --------------------------------------------------------------------------
# Conditional aggregation — CASE-based, dialect-common.
# --------------------------------------------------------------------------

_Q62_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
       CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree,
       CAST(SUM(CASE WHEN l_discount > 0.05
                     THEN CAST(l_extendedprice AS DECIMAL(20, 4))
                     ELSE 0 END) AS DOUBLE) AS discounted_value
FROM lineitem
GROUP BY l_returnflag
"""


@query("q62_conditional_agg", oracle=_Q62_SQL, tags=("agg",))
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (CASE inside SUM): many metrics in one
    scan + one shuffle instead of one filtered job per metric."""
    li = catalog.load(spark, "lineitem", sf_dir)
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(disc, 1).otherwise(0)).alias("n_discounted"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).alias("n_taxfree"),
        F.sum(
            F.when(disc, F.col("l_extendedprice").cast("decimal(20,4)")).otherwise(
                F.lit(0).cast("decimal(20,4)")
            )
        )
        .cast("double")
        .alias("discounted_value"),
    )


# --------------------------------------------------------------------------
# Native session windows — same 30-min-gap semantics as the relational
# sessionization (q43), but via Spark's built-in session_window operator
# (which also runs unchanged under Structured Streaming with a watermark).
# The oracle derives sessions relationally (lag → flag → running sum).
# --------------------------------------------------------------------------

_Q63_SQL = """
WITH flagged AS (
    SELECT user_id, ts, value,
           -- strict > : session_window MERGES an event at exactly
           -- last_ts+gap (verified by the boundary test in test_plans) —
           -- a new session needs the gap strictly exceeded.
           CASE WHEN ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
                  OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20, 6))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@query("q63_session_window_native", oracle=_Q63_SQL, tags=("window", "events"))
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min gap): one shuffle keyed on
    (user, merged session). Streaming-ready — the identical groupBy runs
    under a watermark with state eviction. Oracle = the relational
    lag+cumsum derivation, proving both formulations agree."""
    ev = catalog.load(spark, "events", sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


# --------------------------------------------------------------------------
# Array functions over the tokenized documents (Spark array_* ↔ DuckDB
# list_* — same semantics, different names).
# --------------------------------------------------------------------------

_Q65_SQL = """
SELECT doc_id,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       list_contains(string_split(text, ' '), 'the') AS has_the,
       list_sort(list_distinct(string_split(text, ' ')))[1] AS first_token,
       -- DuckDB list slices are INCLUSIVE: [1:4] = 4 elements, matching
       -- Spark's slice(toks, 1, 4).
       len(string_split(text, ' ')[1:4]) AS head_len
FROM documents
WHERE doc_id < 1000
"""


@query("q65_array_functions", oracle=_Q65_SQL, tags=("scalar", "array"))
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: split → distinct/contains/sort/slice, all JVM
    built-ins over the token array (no shuffle, pure projection)."""
    docs = catalog.load(spark, "documents", sf_dir).filter(F.col("doc_id") < 1000)
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.sort_array(F.array_distinct(toks)).getItem(0).alias("first_token"),
        F.size(F.slice(toks, 1, 4)).alias("head_len"),
    )


# --------------------------------------------------------------------------
# Multiset set ops — the ALL variants keep duplicates (q39/q40 are the
# distinct forms).
# --------------------------------------------------------------------------

_Q66_SQL = """
SELECT o_custkey FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@query("q66_intersect_all", oracle=_Q66_SQL, tags=("setop",))
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — min of per-side multiplicity,
    which plain intersect's dedup would lose)."""
    orders = catalog.load(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


# --------------------------------------------------------------------------
# q151 — DYNAMIC-gap session windows: each event proposes its own
# inactivity window (purchases hold a session open 60 min, anything
# else 15), and Spark's session_window merges overlapping proposals.
# The oracle derives the same union-of-intervals relationally: a new
# session starts iff the event's ts strictly exceeds the prefix-MAX of
# previous events' (ts + own gap) — prefix max, not lag, because a
# long-gap event deep in the session can out-reach every later one.
# --------------------------------------------------------------------------

_Q151_SQL = """
WITH gapped AS (
    SELECT user_id, ts, value,
           ts + CASE WHEN event_type = 'purchase'
                     THEN INTERVAL 3600 SECOND
                     ELSE INTERVAL 900 SECOND END AS reach
    FROM events
),
flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN MAX(reach) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) IS NULL
                  OR ts > MAX(reach) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS is_new
    FROM gapped
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(20, 6))) AS DOUBLE) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


@query("q151_session_window_dynamic_gap", oracle=_Q151_SQL, tags=("window", "events"))
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window with a per-event gap Column (purchase 60 min,
    else 15): the engagement-aware sessionization real products run —
    high-intent events keep sessions alive longer. Same single-shuffle
    plan and streaming-readiness as the constant-gap form; the oracle's
    prefix-max interval-union derivation proves the merge semantics."""
    ev = catalog.load(spark, "events", sf_dir)
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("15 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )
