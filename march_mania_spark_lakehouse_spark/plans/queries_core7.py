"""TPC-H completion batch: the seven query topologies (Q2, Q11, Q12,
Q13, Q14, Q20, Q21) not yet in the surface, adapted to the driver
fixture where TPC-H columns are absent (no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate, no o_comment — each adaptation
keeps the *plan topology* that makes the original query a planning
benchmark and documents the substitution).

With these, all 22 TPC-H query shapes have a registered, DuckDB-oracled
counterpart: Q1→q01, Q2→q154, Q3→q114, Q4→q152, Q5→q123, Q6→q146,
Q7→q133, Q8→q140, Q9→q134, Q10→q124, Q11→q155, Q12→q156, Q13→q157,
Q14→q158, Q15→q147, Q16→q153, Q17→q148, Q18→q141, Q19→q149, Q20→q159,
Q21→q160, Q22→q142.

Reference parity: the reference's query surface is small-dim equi-joins
plus aggregation (SURVEY.md §2.3-2.4); these lock in the harder
relational topologies (correlated-min, scalar-subquery HAVING, filtered
outer join, nested semi-joins, exists/not-exists self-joins) that a
general engine must plan well at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import DEC, dsum, sql_dsum
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q154 — TPC-H Q2 shape (minimum-cost supplier): correlated-MIN subquery.
# Fixture adaptation: no partsupp/ps_supplycost, so the candidate set is
# "suppliers that shipped the part" (via lineitem) and the minimized cost
# is s_acctbal (a stored double — MIN involves no arithmetic, so the
# equality join back is exact in any engine).
# --------------------------------------------------------------------------

_Q154_SQL = """
WITH cand AS (
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                    s.s_acctbal, n.n_name AS nation
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'STANDARD' AND p.p_size <= 10 AND r.r_name = 'ASIA'
),
mn AS (SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey)
SELECT c.p_partkey, c.p_name, c.s_suppkey, c.s_name, c.s_acctbal, c.nation
FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey AND c.s_acctbal = mn.min_bal
"""


@query("q154_tpch_q2_min_cost_supplier", oracle=_Q154_SQL, tags=("join", "tpch"))
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) in a
    region achieving the per-part minimum cost — the correlated-scalar-
    subquery topology, planned as aggregate-then-join-back (the grouped
    MIN is dimension-sized, so it broadcasts back onto the candidate
    set; the fact table is touched once). All dims broadcast; the only
    shuffle is the DISTINCT on the candidate projection."""
    li = catalog.load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    p = catalog.load(spark, "part", sf_dir).filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = catalog.load(spark, "supplier", sf_dir)
    n = catalog.load(spark, "nation", sf_dir)
    r = catalog.load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    cand = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
        )
        .distinct()
    )
    mn = (
        cand.groupBy("p_partkey")
        .agg(F.min("s_acctbal").alias("min_bal"))
        .withColumnRenamed("p_partkey", "mn_partkey")
    )
    return cand.join(
        F.broadcast(mn),
        (F.col("p_partkey") == F.col("mn_partkey"))
        & (F.col("s_acctbal") == F.col("min_bal")),
    ).select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "nation")


# --------------------------------------------------------------------------
# q155 — TPC-H Q11 shape (important stock): HAVING against a scalar
# subquery over the same aggregate. Fixture adaptation: "stock value" is
# revenue by part from suppliers of a region's nations (no partsupp).
# Cross-engine exactness: BOTH the per-part value and the grand total are
# exact decimal sums over the base rows (a double total summed from
# per-part doubles would be order-dependent); the 0.001 threshold sits
# ≥0.2% away from every per-part value at the checked scale factors.
# --------------------------------------------------------------------------

_Q155_FRACTION = 0.001

_Q155_SQL = f"""
WITH base AS (
    SELECT l.l_partkey, l.l_extendedprice * (1 - l.l_discount) AS rev
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey IN (0, 1)
),
v AS (SELECT l_partkey, {sql_dsum("rev", "part_value")} FROM base GROUP BY l_partkey),
tot AS (SELECT {sql_dsum("rev", "total_value")} FROM base)
SELECT v.l_partkey, v.part_value
FROM v, tot
WHERE v.part_value > {_Q155_FRACTION} * tot.total_value
"""


@query("q155_tpch_q11_important_parts", oracle=_Q155_SQL, tags=("agg", "tpch"))
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value filtered against a fraction of
    the grand total — the scalar-subquery-in-HAVING topology. The grand
    total is a one-row aggregate cross-joined back (broadcast of one
    row, not a driver collect), so the plan stays fully distributed and
    the base join runs once per branch off a common cached-free scan."""
    li = catalog.load(spark, "lineitem", sf_dir)
    s = catalog.load(spark, "supplier", sf_dir)
    n = catalog.load(spark, "nation", sf_dir).filter(F.col("n_regionkey").isin(0, 1))
    base = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    # ONE pass over the fact join: the grand total re-aggregates the
    # per-part DECIMAL sums instead of re-running the base subtree
    # (guide §2.3/§2.4 — the v/tot branches each carried a full
    # scan+join copy). Exact-decimal addition is associative, so
    # Σ_parts(Σ_rows) ≡ Σ_rows bit-for-bit (the double casts happen
    # only after each exact total, exactly as before). Round 13 pinned
    # the shared aggregate with an eager localCheckpoint, which cost
    # more than the saved pass at bench scale (driver: 0.50 → 0.75 s —
    # a blocking job plus lost broadcast planning below the pin);
    # round 14 drops the pin and lets the two branches share the
    # partial-aggregate EXCHANGE instead: both carry the identical
    # scan→join→partial-agg→Exchange(l_partkey) subtree, which
    # ReuseExchange/AQE stage reuse executes once (verified in
    # plans/r14/q155_after.txt — the tot branch reads a ReusedExchange).
    vdec = base.groupBy("l_partkey").agg(
        F.sum(F.col("rev").cast(DEC)).alias("pv")
    )
    v = vdec.select(
        "l_partkey", F.col("pv").cast("double").alias("part_value")
    )
    tot = vdec.agg(F.sum("pv").cast("double").alias("total_value"))
    return v.join(F.broadcast(tot)).filter(
        F.col("part_value") > F.lit(_Q155_FRACTION) * F.col("total_value")
    ).select("l_partkey", "part_value")


# --------------------------------------------------------------------------
# q156 — TPC-H Q12 shape (shipping modes / late lines): join + dual
# conditional counts by category. Fixture adaptation: no l_shipmode or
# commit/receipt dates, so the category is l_returnflag and "late" is
# shipped >90 days after the order date.
# --------------------------------------------------------------------------

_Q156_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l.l_returnflag
"""


@query("q156_tpch_q12_late_lines_by_flag", oracle=_Q156_SQL, tags=("join", "agg", "tpch"))
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late lineitems classified by order priority,
    aggregated as two conditional counts per category. The shipdate
    range reaches the parquet scan; the join-dependent lateness
    predicate (l_shipdate vs o_orderdate + 90d) filters right at the
    join before the aggregate, so the shuffle carries only survivors."""
    li = catalog.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = catalog.load(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# q157 — TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
# join with a filter in the ON clause (not WHERE — customers with zero
# qualifying orders must survive with count 0), then a two-level
# aggregate (count per customer, then histogram of counts). Fixture
# adaptation: the ON-filter is on o_orderpriority (no o_comment).
# --------------------------------------------------------------------------

_Q157_SQL = """
WITH co AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM co
GROUP BY c_count
"""


@query("q157_tpch_q13_order_count_distribution", oracle=_Q157_SQL, tags=("join", "agg", "tpch"))
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with the predicate in the ON clause
    so empty groups survive as zero, then a histogram of group sizes.
    The second aggregate's key space is tiny (distinct order counts), so
    its shuffle is negligible; the first groups by customer key, which
    the outer join already partitioned by — AQE reuses the exchange."""
    c = catalog.load(spark, "customer", sf_dir).select("c_custkey")
    o = catalog.load(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q158 — TPC-H Q14 shape (promotion effect): single-row conditional
# revenue ratio. p_type = 'PROMO' exists verbatim in the fixture.
# --------------------------------------------------------------------------

_Q158_SQL = """
SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE) /
       CAST(SUM(CAST((l.l_extendedprice * (1 - l.l_discount)) AS DECIMAL(28,6))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-07-01'
"""


@query("q158_tpch_q14_promo_revenue", oracle=_Q158_SQL, tags=("join", "agg", "tpch"))
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts over a
    shipdate window — a conditional aggregate ratio in one pass (no
    second scan for the denominator). Part broadcasts; both numerator
    and denominator are exact decimal sums so the final double division
    is bit-identical to the serial oracle."""
    li = catalog.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = catalog.load(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast("decimal(28,6)")).cast("double")
                / F.sum(rev.cast("decimal(28,6)")).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# q159 — TPC-H Q20 shape (excess inventory suppliers): nested IN
# subqueries planned as a semi-join chain. Fixture adaptation: "excess"
# is total shipped quantity of a PROMO part above a threshold in one
# year (no partsupp.availqty to compare against).
# --------------------------------------------------------------------------

_Q159_SQL = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
WHERE s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(28,6))) > 40
)
AND s.s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
"""


@query("q159_tpch_q20_excess_suppliers", oracle=_Q159_SQL, tags=("join", "tpch"))
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers selected through two nested IN
    subqueries — part-filter semi-join inside a grouped HAVING inside a
    supplier semi-join — planned as leftsemi joins so no subquery result
    is ever materialized wider than its keys. The quantity sum is exact
    decimal so the HAVING cut is engine-independent."""
    s = catalog.load(spark, "supplier", sf_dir)
    li = catalog.load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    promo = catalog.load(spark, "part", sf_dir).filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    nkeys = catalog.load(spark, "nation", sf_dir).filter(
        F.col("n_regionkey").isin(0, 1)
    ).select("n_nationkey")
    excess = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "leftsemi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(excess), s.s_suppkey == excess.l_suppkey, "leftsemi")
        .join(F.broadcast(nkeys), s.s_nationkey == nkeys.n_nationkey, "leftsemi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# --------------------------------------------------------------------------
# q160 — TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS +
# NOT EXISTS self-joins on the fact table. Fixture adaptation: "late" is
# shipped >60 days after the order date (no commit/receipt dates);
# waiting orders are counted once per supplier (COUNT DISTINCT) so the
# result is insensitive to how many late lines a supplier had per order.
# --------------------------------------------------------------------------

_Q160_SQL = """
WITH late AS (
    SELECT DISTINCT l.l_suppkey, l.l_orderkey
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, w.numwait
FROM (
    SELECT l1.l_suppkey, COUNT(DISTINCT l1.l_orderkey) AS numwait
    FROM late l1
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY l1.l_suppkey
) w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
"""


@query("q160_tpch_q21_sole_late_supplier", oracle=_Q160_SQL, tags=("join", "tpch"))
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape, computed as per-order aggregates instead of
    EXISTS/NOT EXISTS self-joins (optimization round 14, guide §2.3 —
    aggregate before you shuffle): a late pair (s, o) survives iff s is
    the ONLY late supplier of o (NOT EXISTS ⇔ the order's distinct late
    supplier count is 1) and o has at least two distinct suppliers
    overall (EXISTS ⇔ min supplier ≠ max supplier per order). That is
    two keyed aggregates plus an order-keyed semi join — no duplicated
    fact⋈orders subtree, no self-joins, no pinned intermediate (the
    round-13 localCheckpoint pin cost 0.99 → 1.35 s on the driver
    bench; every aggregate here is map-side combinable at any scale)."""
    li = catalog.load(spark, "lineitem", sf_dir)
    o = catalog.load(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_suppkey", "l_orderkey")
    )
    # orders with exactly ONE distinct late supplier (min == max over
    # the late rows — a plain min/max aggregate, no distinct-aggregate
    # expand), and that supplier
    sole = (
        late.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_mn"),
            F.max("l_suppkey").alias("supp"),
        )
        .filter(F.col("l_mn") == F.col("supp"))
    )
    # orders where some OTHER supplier participated: ≥ 2 distinct
    # suppliers ⇔ min ≠ max — one plain min/max aggregate instead of a
    # distinct + count-distinct pass
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("mn"), F.max("l_suppkey").alias("mx"))
        .filter(F.col("mn") < F.col("mx"))
        .select("l_orderkey")
    )
    # sole has one row per qualifying order, so the per-supplier count
    # of rows IS the original COUNT(DISTINCT l_orderkey)
    waiting = (
        sole.join(multi, "l_orderkey", "leftsemi")
        .groupBy("supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    s = catalog.load(spark, "supplier", sf_dir)
    return waiting.join(
        F.broadcast(s), waiting.supp == s.s_suppkey
    ).select("s_name", "numwait")
