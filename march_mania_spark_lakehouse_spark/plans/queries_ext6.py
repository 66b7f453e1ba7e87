"""Sixth extension batch: behavioral analytics (cohort retention,
conversion funnel, Markov transitions, interval concurrency), blocked
fuzzy matching, deterministic weighted sampling, YoY window growth,
null-safe joins, z-score outliers, top-k order revenue, array
ordinality, and incremental view maintenance via mergeable partial
aggregate state.

Every query is DuckDB-oracled. Determinism policy: float outputs come
from exact decimal sums (`functions/numeric.py`), single IEEE ops on
deterministic inputs (long/long division, subtraction), or explicit
rounding where a huge-decimal→double cast can drift an ulp between
engines (q71 policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import dsum, sql_dsum
from march_mania_spark_lakehouse_spark.operators import behavior, fuzzy, ivm
from march_mania_spark_lakehouse_spark.operators.sampling import (
    HASH_ADD,
    HASH_MOD,
    HASH_MULT,
)
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q105 — cohort retention triangle over events.
# Reference shape: per-entity first-activity bucketing is the same
# min-per-group + join-back idiom as the reference's season snapshots
# (src/features/rolling.py:58-93); generalized to calendar cohorts.
# --------------------------------------------------------------------------

_Q105_SQL = """
WITH first_seen AS (
    SELECT user_id,
           CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_period
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS period
    FROM events
)
SELECT cohort_period,
       CAST(date_diff('day', CAST(cohort_period AS DATE), CAST(period AS DATE)) // 7
            AS INT) AS period_offset,
       COUNT(*) AS n_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY 1, 2
"""


@query("q105_cohort_retention", oracle=_Q105_SQL, tags=("behavior", "agg"))
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-activity week, distinct
    activity counted per (cohort, week-offset) cell. Both shuffles are on
    `user_id` with map-side combine (`operators/behavior.py`)."""
    ev = catalog.load(spark, "events", sf_dir)
    return behavior.cohort_retention(ev, grain="week")


# --------------------------------------------------------------------------
# q106 — ordered conversion funnel view → click → purchase.
# --------------------------------------------------------------------------

_Q106_SQL = """
WITH s0 AS (
    SELECT user_id, MIN(ts) AS stage_ts FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s1 AS (
    SELECT e.user_id, MIN(e.ts) AS stage_ts
    FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.stage_ts
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS stage_ts
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.stage_ts
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(0 AS INT) AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s0
UNION ALL
SELECT CAST(1 AS INT), 'click', COUNT(*) FROM s1
UNION ALL
SELECT CAST(2 AS INT), 'purchase', COUNT(*) FROM s2
"""


@query("q106_funnel_conversion", oracle=_Q106_SQL, tags=("behavior", "join"))
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: stage i requires an event strictly after the
    user's stage i−1 time. One lazy plan; every intermediate is
    user-sized, never event-sized (`operators/behavior.py:funnel`)."""
    ev = catalog.load(spark, "events", sf_dir)
    return behavior.funnel(ev, ("view", "click", "purchase"))


# --------------------------------------------------------------------------
# q107 — first-order event-transition (Markov) matrix.
# --------------------------------------------------------------------------

_Q107_SQL = """
WITH pairs AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type, COUNT(*) AS n
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
           / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM counts
"""


@query("q107_event_transitions", oracle=_Q107_SQL, tags=("behavior", "window"))
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-bigram transition counts + per-source probabilities. The
    lead window is user-partitioned (parallel; state = one user's
    history); the probability window runs over the ≤|types|² matrix."""
    ev = catalog.load(spark, "events", sf_dir)
    return behavior.transition_counts(ev)


# --------------------------------------------------------------------------
# q108 — sweep-line peak concurrency per day (30-minute sessions).
# --------------------------------------------------------------------------

_Q108_SQL = """
WITH pts AS (
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts AS t,
           1 AS delta
    FROM events
    UNION ALL
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           ts + INTERVAL 30 MINUTE AS t, -1 AS delta
    FROM events
),
running AS (
    SELECT day,
           SUM(delta) OVER (
               PARTITION BY day ORDER BY t
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS open_sessions
    FROM pts
)
SELECT day, CAST(MAX(open_sessions) AS BIGINT) AS peak_concurrent
FROM running GROUP BY day
"""


@query("q108_peak_concurrency", oracle=_Q108_SQL, tags=("behavior", "window"))
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap maximum via a day-partitioned sweep line: +1/−1
    deltas, RANGE-frame running sum (tie-deterministic), max per day.
    No global ordered window anywhere — #days independent partitions."""
    ev = catalog.load(spark, "events", sf_dir)
    return behavior.peak_concurrency(ev, duration_minutes=30)


# --------------------------------------------------------------------------
# q109 — blocked fuzzy match (levenshtein ≤ 1 within prefix blocks).
# --------------------------------------------------------------------------

_Q109_SQL = """
WITH pairs AS (
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
    FROM customer a
    JOIN customer b
      ON substring(a.c_name, 1, 16) = substring(b.c_name, 1, 16)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
),
sym AS (
    SELECT id_a AS c_custkey FROM pairs
    UNION ALL
    SELECT id_b FROM pairs
)
SELECT c_custkey, COUNT(*) AS n_similar
FROM sym GROUP BY c_custkey
"""


@query("q109_fuzzy_name_match", oracle=_Q109_SQL, tags=("similarity", "join"))
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-match WITHOUT a cartesian: equi-join on a
    16-char prefix block (complete for radius 1 over the suffix), then
    JVM `levenshtein` on within-block pairs only
    (`operators/fuzzy.py`). Output: near-duplicate degree per customer."""
    cust = catalog.load(spark, "customer", sf_dir)
    pairs = fuzzy.blocked_levenshtein_pairs(
        cust, "c_custkey", "c_name",
        block=F.substring(F.col("c_name"), 1, 16), max_dist=1,
    )
    # ONE pass over the blocked join: the id_a/id_b union branches each
    # re-ran the whole prefix-block join + levenshtein verify
    # (plans/r13/q109_before.txt shows two BroadcastHashJoins doing
    # identical work); exploding both endpoints of each pair emits the
    # identical row multiset from a single join (optimization round 13,
    # guide §2.4).
    sym = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("c_custkey")
    )
    return sym.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n_similar"))


# --------------------------------------------------------------------------
# q110 — deterministic weighted sample (priority sampling, no RNG).
# --------------------------------------------------------------------------

_K_SAMPLE = 64

_Q110_SQL = f"""
SELECT doc_id, n_chars,
       CAST(((doc_id * {HASH_MULT} + {HASH_ADD}) % {HASH_MOD}) + 1 AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {_K_SAMPLE}
"""


@query("q110_weighted_sample", oracle=_Q110_SQL, tags=("sampling",))
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sample: uniform-int hash of the id divided by
    the weight; global bottom-k. Fully deterministic — the same sample
    on any engine, any partitioning, no RNG state to ship. The top-k is
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    The hash and the single IEEE division are bit-identical everywhere
    (`operators/sampling.py` hash constants)."""
    docs = catalog.load(spark, "documents", sf_dir)
    v = (F.col("doc_id") * F.lit(HASH_MULT) + F.lit(HASH_ADD)) % F.lit(HASH_MOD)
    pri = (v + 1).cast("double") / F.col("n_chars").cast("double")
    return (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(_K_SAMPLE)
    )


# --------------------------------------------------------------------------
# q111 — year-over-year revenue growth per nation (lag window).
# --------------------------------------------------------------------------

_Q111_SQL = f"""
WITH yearly AS (
    SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS year,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "measure")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1, 2
)
SELECT n_name, year, measure,
       LAG(measure) OVER w AS prev_measure,
       measure - LAG(measure) OVER w AS yoy_delta,
       (measure - LAG(measure) OVER w) / LAG(measure) OVER w AS yoy_ratio
FROM yearly
WINDOW w AS (PARTITION BY n_name ORDER BY year)
"""


@query("q111_yoy_growth", oracle=_Q111_SQL, tags=("window", "agg"))
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly aggregate + key-partitioned lag: the only event-sized
    shuffle is the aggregation (map-side combined); the window runs over
    nation×year rows. Delta/ratio are single IEEE ops on exact-decimal
    doubles — deterministic without rounding."""
    # No rebalance (optimization round 14): the probe + map-side-
    # combined partial agg are too cheap to justify round-robin
    # exchanging the whole fact table (driver 0.90 → 1.26 s in
    # round 13)
    li = catalog.load(spark, "lineitem", sf_dir)
    orders = catalog.load(spark, "orders", sf_dir)
    cust = catalog.load(spark, "customer", sf_dir)
    nation = catalog.load(spark, "nation", sf_dir)
    fact = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return behavior.yoy_growth(
        fact,
        ["n_name"],
        F.year("o_orderdate").cast("int"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "measure"),
    )


# --------------------------------------------------------------------------
# q112 — null-safe equality join (<=> / IS NOT DISTINCT FROM).
# --------------------------------------------------------------------------

_Q112_SQL = """
WITH keyed AS (
    SELECT nullif(CAST(json_extract_string(props, '$.k') AS INT) % 5, 2) AS k5
    FROM events
),
dim(k5, label) AS (
    VALUES (0, 'zero'), (1, 'one'), (3, 'three'), (4, 'four'),
           (CAST(NULL AS INT), 'missing')
)
SELECT dim.label, COUNT(*) AS n
FROM keyed JOIN dim ON keyed.k5 IS NOT DISTINCT FROM dim.k5
GROUP BY dim.label
"""


@query("q112_null_safe_join", oracle=_Q112_SQL, tags=("join", "json"))
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`eqNullSafe`): NULL matches NULL — the
    contract a dimension join needs when the key is optional (here a
    JSON-extracted field). Still a hash join (null-safe equality is
    hashable); the 5-row dim broadcasts."""
    ev = catalog.load(spark, "events", sf_dir)
    keyed = ev.select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 5, F.lit(2)
        ).alias("k5")
    )
    from march_mania_spark_lakehouse_spark.sources.local_rows import local_df

    dim = local_df(
        spark,
        [(0, "zero"), (1, "one"), (3, "three"), (4, "four"), (None, "missing")],
        "k5 int, label string",
    )
    return (
        keyed.join(F.broadcast(dim), keyed["k5"].eqNullSafe(dim["k5"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# q113 — z-score outlier flagging from exact decimal moments.
# --------------------------------------------------------------------------

_Q113_SQL = """
WITH moments AS (
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18, 6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(CAST(value AS DECIMAL(19, 6))
                         * CAST(value AS DECIMAL(19, 6))
                         AS DECIMAL(38, 12))) AS DOUBLE) AS sxx
    FROM events GROUP BY event_type
),
stats AS (
    SELECT event_type,
           sx / CAST(n AS DOUBLE) AS mean_v,
           SQRT((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
               AS std_v
    FROM moments WHERE n > 1
)
SELECT event_id, e.event_type, value,
       ROUND((value - mean_v) / std_v, 6) AS z
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE ABS((value - mean_v) / std_v) > 2.0
"""


@query("q113_zscore_outliers", oracle=_Q113_SQL, tags=("stats", "dq"))
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score anomaly flags. Moments come from exact decimal
    Σx/Σx² (q71 policy: order-independent, reproducible on any cluster
    layout); the per-row z is computed after a broadcast join of the
    tiny stats dim — one scan, one broadcast, no event-sized shuffle."""
    ev = catalog.load(spark, "events", sf_dir)
    x = F.col("value").cast("decimal(18,6)")
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum((x * x).cast("decimal(38,12)")).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    stats = moments.filter(F.col("n") > 1).select(
        "event_type",
        (F.col("sx") / n).alias("mean_v"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / n)
            / (F.col("n") - 1).cast("double")
        ).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.0)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


# --------------------------------------------------------------------------
# q114 — shipping-priority top-k (TPC-H Q3 shape).
# --------------------------------------------------------------------------

_Q114_SQL = f"""
SELECT o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       o_orderpriority,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("q114_shipping_priority", oracle=_Q114_SQL, tags=("join", "topk"))
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both fact sides pushed to
    the scans, customer-pruned join, per-order revenue, global top-10
    via TakeOrderedAndProject (per-partition heaps — no global sort)."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = catalog.load(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = catalog.load(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = catalog.load(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q115 — array ordinality (posexplode ↔ unnest with position).
# --------------------------------------------------------------------------

_DIMS = 8

_Q115_SQL = f"""
SELECT vec_id, CAST(t.i - 1 AS INT) AS pos,
       CAST(embedding[t.i] AS DOUBLE) AS val
FROM embeddings, generate_series(1, {_DIMS}) AS t(i)
"""


@query("q115_array_ordinality", oracle=_Q115_SQL, tags=("array",))
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-preserving array explode (`posexplode`) over the leading
    embedding dims — the lateral-unnest building block for any
    array-to-long reshape. Row multiplication is partition-local: zero
    shuffle at any scale."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    return emb.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, _DIMS))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col").cast("double").alias("val"),
    )


# --------------------------------------------------------------------------
# q116 — incremental view maintenance: base ⊕ delta == full recompute.
# --------------------------------------------------------------------------

_Q116_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_m,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
           AS avg_m,
       MIN(o_totalprice) AS min_m,
       MAX(o_totalprice) AS max_m
FROM orders GROUP BY o_custkey
"""


@query("q116_incremental_refresh", oracle=_Q116_SQL, tags=("ivm", "agg"))
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: per-customer order stats maintained
    as mergeable partial state (n, decimal Σ, min, max) computed
    SEPARATELY for a base batch and a delta batch, then merged
    (`operators/ivm.py`). The oracle is a full recompute — decimal-exact
    state makes base⊕delta bit-identical to it, which is the whole
    point: at 100 TB only the delta is ever re-aggregated."""
    orders = catalog.load(spark, "orders", sf_dir)
    cutoff = F.lit("1998-01-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    delta = orders.filter(F.col("o_orderdate") >= cutoff)
    merged = ivm.merge_states(
        ivm.agg_state(base, ["o_custkey"], "o_totalprice"),
        ivm.agg_state(delta, ["o_custkey"], "o_totalprice"),
    )
    return ivm.finalize_state(merged)


# --------------------------------------------------------------------------
# q139 — last-touch attribution: each purchase is credited to the most
# recent click/view by the same user within a 24 h lookback ('none' when
# the last touch is older or absent). One user-partitioned window pass —
# state per user is its own history, no self-join, no per-purchase
# probing; the shape survives any number of users because the shuffle
# key is user_id.
# --------------------------------------------------------------------------

_Q139_SQL = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
attributed AS (
    SELECT p.event_id,
           (SELECT t.event_type
            FROM events t
            WHERE t.user_id = p.user_id
              AND t.event_type IN ('click', 'view')
              AND t.ts <= p.ts
              AND t.ts >= p.ts - INTERVAL 24 HOUR
            ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) AS touch_type
    FROM purchases p
)
SELECT COALESCE(touch_type, 'none') AS touch_type,
       COUNT(*) AS n_purchases
FROM attributed
GROUP BY 1
"""


@query("q139_last_touch_attribution", oracle=_Q139_SQL, tags=("behavior", "window"))
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch credit via one ordered window: rows sort by
    (ts, is_purchase, event_id) per user so a purchase sees every touch
    at-or-before its timestamp (same-ts touches first, ties broken by
    event_id exactly like the oracle's ORDER BY ... LIMIT 1), then
    `last(ignorenulls)` carries the latest touch type/ts forward and
    the 24 h lookback reclassifies stale credit as 'none'."""
    from pyspark.sql import Window

    ev = catalog.load(spark, "events", sf_dir)
    is_touch = F.col("event_type").isin("click", "view")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        F.when(is_touch, F.col("event_type")).alias("touch_type_raw"),
        F.when(is_touch, F.col("ts")).alias("touch_ts_raw"),
    ).filter(is_touch | (F.col("is_p") == 1))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = base.select(
        "ts",
        "is_p",
        F.last("touch_type_raw", ignorenulls=True).over(w).alias("lt_type"),
        F.last("touch_ts_raw", ignorenulls=True).over(w).alias("lt_ts"),
    ).filter(F.col("is_p") == 1)
    return (
        carried.select(
            F.when(
                F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS"),
                F.col("lt_type"),
            )
            .otherwise(F.lit("none"))
            .alias("touch_type")
        )
        .groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
