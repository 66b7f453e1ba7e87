"""Fifth relational batch: statistical moments, unpivot/melt, full-outer
join, correlated EXISTS, array lambdas, deterministic mode, cross-join
grid fill, mixture upsampling, stratified hash sampling, and date-spine
gap-fill with last-observation-carried-forward.

Everything here is pure built-in DataFrame API (no Python in the hot
path) and every query is DuckDB-oracled. Float outputs derive from
exact decimal sums (``functions/numeric.py`` policy) so parallel Spark
plans hash-match the serial oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators.sampling import (
    hash_bucket,
    sql_hash_bucket,
)
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q71 — second-moment statistics (variance / stddev / correlation) from
# exact decimal sums. Spark's stddev/corr built-ins are order-dependent
# float folds (non-reproducible under re-partitioning); deriving the
# moments from decimal-exact Σx, Σx², Σxy keeps the result identical on
# any cluster layout AND hash-matchable against a serial oracle. Same
# single partial→final shuffle as the built-ins.
# --------------------------------------------------------------------------

_Q71_SQL = """
WITH sums AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 6))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19, 6))
                         * CAST(l_quantity AS DECIMAL(19, 6))
                         AS DECIMAL(38, 12))) AS DOUBLE) AS sxx,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19, 6))
                         * CAST(l_extendedprice AS DECIMAL(19, 6))
                         AS DECIMAL(38, 12))) AS DOUBLE) AS syy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19, 6))
                         * CAST(l_extendedprice AS DECIMAL(19, 6))
                         AS DECIMAL(38, 12))) AS DOUBLE) AS sxy
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND(sx / CAST(n AS DOUBLE), 6) AS mean_qty,
       ROUND(CASE WHEN n > 1
            THEN (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
       END, 6) AS var_qty,
       ROUND(CASE WHEN n > 1
            THEN SQRT((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
       END, 6) AS stddev_qty,
       ROUND(CASE WHEN n > 1
            THEN (sxy - sx * sy / CAST(n AS DOUBLE))
                 / SQRT((sxx - sx * sx / CAST(n AS DOUBLE))
                        * (syy - sy * sy / CAST(n AS DOUBLE)))
       END, 9) AS corr_qty_price
FROM sums
"""


@query("q71_stat_moments", oracle=_Q71_SQL, tags=("agg", "stats"))
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev/correlation per group from exact decimal moment
    sums (Σx, Σx², Σxy) — order-independent, so the distributed plan is
    bit-reproducible (unlike the built-in stddev/corr float folds).
    One scan, one partial→final hash agg."""
    li = catalog.load(spark, "lineitem", sf_dir)
    x = F.col("l_quantity").cast("decimal(18,6)")
    y = F.col("l_extendedprice").cast("decimal(18,6)")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(38,12)")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    n1 = (F.col("n") - 1).cast("double")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in ("sx", "sy", "sxx", "syy", "sxy"))
    var_x = (sxx - sx * sx / n) / n1
    many = F.col("n") > 1
    # ROUND absorbs the last-ulp drift of huge-decimal → double casts
    # (the scaled Σx² integers exceed 2^53, where the two engines'
    # conversion rounding can differ by one ulp) — same policy as q60.
    return sums.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 6).alias("mean_qty"),
        F.round(F.when(many, var_x), 6).alias("var_qty"),
        F.round(F.when(many, F.sqrt(var_x)), 6).alias("stddev_qty"),
        F.round(
            F.when(
                many,
                (sxy - sx * sy / n)
                / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            ),
            9,
        ).alias("corr_qty_price"),
    )


# --------------------------------------------------------------------------
# q72 — unpivot / melt: wide metric columns → long (metric, value) rows.
# The inverse of q38's pivot. Narrow-format is what a metrics sink or a
# per-metric quantile job wants; at scale this is a zero-shuffle
# row-expansion (Expand node), never a driver loop.
# --------------------------------------------------------------------------

_Q72_SQL = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
FROM part
"""


@query("q72_unpivot_melt", oracle=_Q72_SQL, tags=("setop", "reshape"))
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.unpivot`` (melt): one scan fans each row into one row per
    metric via an Expand node — equivalent to a UNION ALL of per-metric
    projections but with a single pass over the input."""
    part = catalog.load(spark, "part", sf_dir).select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# q73 — full-outer join with key coalescing and zero-fill: union of two
# aggregated perspectives where either side may be missing.
# --------------------------------------------------------------------------

_Q73_SQL = """
WITH c AS (
    SELECT c_nationkey AS nk, COUNT(*) AS n_cust
    FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
),
s AS (
    SELECT s_nationkey AS nk, COUNT(*) AS n_supp
    FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@query("q73_full_outer_join", oracle=_Q73_SQL, tags=("join",))
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides + COALESCE key/zero
    fill. Aggregating *before* the join keeps the outer join's shuffle
    at |distinct keys|, not |rows| — the scale-safe order."""
    cust = (
        catalog.load(spark, "customer", sf_dir)
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        catalog.load(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = cust.alias("c").join(
        supp.alias("s"), F.col("c.nk") == F.col("s.nk"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("c.nk"), F.col("s.nk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0).cast("long")).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0).cast("long")).alias("n_supp"),
    )


# --------------------------------------------------------------------------
# q74 — correlated EXISTS / NOT EXISTS subqueries. Catalyst decorrelates
# these to a left-semi + left-anti join pair (no per-row subquery
# execution) — the declarative form scales because the rewrite does.
# Identical SQL text runs on both engines.
# --------------------------------------------------------------------------

_Q74_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey
          AND o2.o_orderstatus = 'F'
      )
"""


@query("q74_exists_subqueries", oracle=_Q74_SQL, tags=("join", "sql"))
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS via spark.sql. Catalyst
    decorrelates to LeftSemi ⨝ then LeftAnti ⨝ on o_custkey — two
    key-shuffles (or broadcasts under AQE), never nested-loop
    re-execution per outer row."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(_Q74_SQL)


# --------------------------------------------------------------------------
# q75 — higher-order array lambdas (filter / transform / aggregate /
# exists) over the token array. Integer accumulators keep the fold
# order-independent. All lambda evaluation is JVM-side (no Python).
# --------------------------------------------------------------------------

_Q75_SQL = """
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> len(x) > 3)) AS n_long,
       CAST(COALESCE(list_sum(list_transform(
                list_filter(string_split(text, ' '), x -> len(x) > 3),
                x -> len(x))), 0) AS BIGINT) AS long_chars,
       len(list_filter(string_split(text, ' '), x -> x = 'the')) > 0 AS has_the
FROM documents
WHERE doc_id < 2000
"""


@query("q75_array_lambdas", oracle=_Q75_SQL, tags=("scalar", "array"))
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions with lambdas: filter / aggregate / exists
    over the split-token array. Pure projection (zero shuffle); the
    integer accumulator makes the aggregate fold order-independent."""
    docs = catalog.load(spark, "documents", sf_dir).filter(F.col("doc_id") < 2000)
    toks = F.split(F.col("text"), " ")
    long_toks = F.filter(toks, lambda x: F.length(x) > 3)
    return docs.select(
        "doc_id",
        F.size(long_toks).alias("n_long"),
        F.aggregate(long_toks, F.lit(0), lambda acc, x: acc + F.length(x))
        .cast("bigint")
        .alias("long_chars"),
        F.exists(toks, lambda x: x == F.lit("the")).alias("has_the"),
    )


# --------------------------------------------------------------------------
# q76 — deterministic mode (most frequent value per group). The built-in
# ``mode()`` breaks frequency ties arbitrarily; count + row_number with a
# total order makes the answer stable across engines and partitionings.
# --------------------------------------------------------------------------

_Q76_SQL = """
WITH cnt AS (
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus, o_orderpriority
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
    ) AS rn
    FROM cnt
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
FROM ranked WHERE rn = 1
"""


@query("q76_mode_deterministic", oracle=_Q76_SQL, tags=("agg", "window"))
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: count → row_number with an explicit
    tiebreak. Two shuffles, both on small key spaces (the count output
    is |distinct pairs|, not |rows|)."""
    orders = catalog.load(spark, "orders", sf_dir)
    cnt = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


# --------------------------------------------------------------------------
# q77 — cross-join dimension grid + zero-fill: report every (region,
# status) cell including empty ones. The grid is tiny (dims only), so
# the cross join is broadcast; the fact-side agg happens FIRST so the
# left join is |cells| × |aggregated rows|, never |cells| × |facts|.
# --------------------------------------------------------------------------

_Q77_SQL = """
WITH statuses AS (SELECT DISTINCT o_orderstatus AS os FROM orders),
combos AS (SELECT r_name, os FROM region CROSS JOIN statuses),
agg AS (
    SELECT r_name, o_orderstatus AS os, COUNT(*) AS n
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, o_orderstatus
)
SELECT c.r_name, c.os AS o_orderstatus, COALESCE(a.n, 0) AS n_orders
FROM combos c
LEFT JOIN agg a ON c.r_name = a.r_name AND c.os = a.os
"""


@query("q77_grid_zero_fill", oracle=_Q77_SQL, tags=("join", "agg"))
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense dimension grid via cross join of tiny dims, left-joined to
    the pre-aggregated fact counts with zero-fill — the 'report every
    cell' pattern without ever cross-joining the fact table."""
    orders = catalog.load(spark, "orders", sf_dir)
    customer = catalog.load(spark, "customer", sf_dir)
    nation = catalog.load(spark, "nation", sf_dir)
    region = catalog.load(spark, "region", sf_dir)
    statuses = orders.select(F.col("o_orderstatus").alias("os")).distinct()
    combos = region.select("r_name").crossJoin(F.broadcast(statuses))
    agg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", F.col("o_orderstatus").alias("os"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        combos.alias("c")
        .join(
            agg.alias("a"),
            (F.col("c.r_name") == F.col("a.r_name")) & (F.col("c.os") == F.col("a.os")),
            "left",
        )
        .select(
            F.col("c.r_name").alias("r_name"),
            F.col("c.os").alias("o_orderstatus"),
            F.coalesce(F.col("a.n"), F.lit(0).cast("long")).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# q78 — mixture upsampling (epoch expansion): repeat each document
# according to its mixture weight by exploding a generated sequence.
# This is how a training pipeline materializes "3 epochs of zh, 2 of
# everything else, 1 of en" deterministically — no RNG, no driver loop,
# and the expansion is partition-local (zero shuffle).
# --------------------------------------------------------------------------

_Q78_SQL = """
SELECT doc_id, lang, CAST(copy_idx AS BIGINT) AS copy_idx
FROM (
    SELECT doc_id, lang,
           unnest(generate_series(1,
               CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 3 ELSE 2 END
           )) AS copy_idx
    FROM documents
)
"""


@query("q78_mixture_upsample", oracle=_Q78_SQL, tags=("sampling", "pipeline"))
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture upsampling: per-language epoch weight →
    explode(sequence(1, w)). Row multiplication happens inside the scan
    stage (no shuffle, no RNG state); downstream shuffles see the
    already-weighted stream."""
    docs = catalog.load(spark, "documents", sf_dir)
    w = (
        F.when(F.col("lang") == "en", 1)
        .when(F.col("lang") == "zh", 3)
        .otherwise(2)
    )
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), w)).alias("copy_idx"),
    ).withColumn("copy_idx", F.col("copy_idx").cast("long"))


# --------------------------------------------------------------------------
# q79 — stratified hash sampling: per-stratum keep-rates driven by the
# same engine-neutral multiplicative hash as the q68 split. Membership
# is a pure function of doc_id, so the sample is reproducible across
# engines, runs, and partitionings — unlike sample()/TABLESAMPLE whose
# RNG is engine- and partitioning-specific.
# --------------------------------------------------------------------------

_Q79_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_hash_bucket('doc_id')} <
      CASE lang WHEN 'zh' THEN 100 WHEN 'en' THEN 50 ELSE 25 END
"""


@query("q79_stratified_hash_sample", oracle=_Q79_SQL, tags=("sampling", "pipeline"))
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling (zh 100%, en 50%, rest 25%) via
    the deterministic hash bucket — a pure filter (pushdown-friendly,
    zero shuffle, no RNG)."""
    docs = catalog.load(spark, "documents", sf_dir)
    rate = (
        F.when(F.col("lang") == "zh", 100)
        .when(F.col("lang") == "en", 50)
        .otherwise(25)
    )
    return docs.filter(hash_bucket("doc_id") < rate).select(
        "doc_id", "lang", "source"
    )


# --------------------------------------------------------------------------
# q80 — date-spine gap-fill + LOCF (last observation carried forward):
# the standard time-series densification. Spine = users × calendar days
# (generated, not scanned); missing days take the most recent prior
# day's value via an IGNORE NULLS running window.
# --------------------------------------------------------------------------

_Q80_SQL = """
WITH daily AS (
    SELECT user_id, date_trunc('day', ts) AS day, MAX(value) AS day_max
    FROM events WHERE user_id < 50
    GROUP BY user_id, date_trunc('day', ts)
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
spine AS (
    SELECT u.user_id, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
    FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN bounds b
)
SELECT s.user_id, s.day,
       LAST_VALUE(d.day_max IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled
FROM spine s
LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@query("q80_gapfill_locf", oracle=_Q80_SQL, tags=("window", "events", "temporal"))
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap-fill with LOCF: generate the dense (user, day)
    grid with sequence+explode (the spine is computed, not scanned),
    left-join the observed daily aggregate, then one ordered window pass
    carries the last non-null value forward. MAX (not SUM) keeps the
    daily aggregate float-exact. At scale the window partitions by user,
    so state is bounded by days-per-user, and the spine explode is
    partition-local."""
    ev = catalog.load(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max("value").alias("day_max"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_max", ignorenulls=True).over(w).alias("filled"),
        )
    )
