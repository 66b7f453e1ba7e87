"""Second extension batch: embedding-cosine near-dup (E2), IVF ANN
(E3 scale path), BPE-style regex tokenization (E4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import similarity, skew, text
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# E2 — embedding-cosine near-duplicate pairs.
# --------------------------------------------------------------------------

# list_dot_product over DOUBLE[] folds in index order in double precision
# (same contract as q25) so ROUND(...,4) is bit-identical across engines.
_Q51_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(
               list_dot_product(a.emb, b.emb)
               / (sqrt(list_dot_product(a.emb, a.emb))
                  * sqrt(list_dot_product(b.emb, b.emb))),
               4
           ) AS cosine
    FROM (SELECT * FROM e WHERE vec_id < 100) a
    JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35
"""


@query("q51_embedding_near_dup", oracle=_Q51_SQL, tags=("dedup", "similarity"))
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (E2) in the incremental-dedup shape: a
    100-vector arrival batch scored against the whole corpus (batch
    broadcasts; corpus never shuffles). The all-pairs baseline is unit-
    tested; LSH bucketing (q26) is the same scoring at corpus scale."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    return similarity.embedding_near_dup(
        emb, threshold=0.35, batch=emb.filter(F.col("vec_id") < 100)
    )


# --------------------------------------------------------------------------
# E3 — IVF approximate nearest neighbors (scale path #2 next to sign-LSH).
# --------------------------------------------------------------------------


# bench=False: each call re-fits the KMeans quantizer (training, not query
# execution) — same policy as the MLlib queries q33/q34.
@query("q52_cosine_topk_ivf", oracle=None, bench=False, tags=("similarity", "ml"))
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed cosine top-k (E3): KMeans coarse quantizer; queries
    probe their 8 nearest of 16 cells (recall 0.8 on this *uniform random*
    corpus — the IVF worst case; clustered real embeddings need far fewer
    probes). Approximate → rows-only check; recall is unit-tested."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    return similarity.cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=16, n_probe=8
    )


# --------------------------------------------------------------------------
# E4 — BPE-style regex tokenization.
# --------------------------------------------------------------------------

# Both engines run the same pattern (Java regex / RE2 agree on this
# subset); token counts are exact integers so the hash match is strict.
# The pattern's single quotes must be doubled inside the SQL literal.
_BPE_SQL_PATTERN = text.BPE_TOKEN_PATTERN.replace("'", "''")
_Q53_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       MAX(n_bpe) AS max_bpe_tokens,
       CAST(SUM(CASE WHEN n_bpe = n_ws THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pure_word_docs
FROM (
    SELECT lang,
           len(regexp_extract_all(text, '{_BPE_SQL_PATTERN}', 1)) AS n_bpe,
           len(string_split(text, ' ')) AS n_ws
    FROM documents
)
GROUP BY lang
"""


@query("q53_bpe_token_stats", oracle=_Q53_SQL, tags=("text",))
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (E4) vs whitespace tokenization,
    aggregated per lang — all JVM-side regexp/aggregate built-ins."""
    docs = catalog.load(spark, "documents", sf_dir)
    enriched = docs.select(
        "lang",
        text.bpe_token_count(F.col("text")).alias("n_bpe"),
        F.size(text.tokens(F.col("text"))).alias("n_ws"),
    )
    return enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.max("n_bpe").alias("max_bpe_tokens"),
        F.sum(F.when(F.col("n_bpe") == F.col("n_ws"), 1).otherwise(0)).alias(
            "n_pure_word_docs"
        ),
    )


# --------------------------------------------------------------------------
# Skew mitigation — salted ops are result-identical to their plain forms,
# so the plain SQL is the oracle.
# --------------------------------------------------------------------------

_Q54_SQL = """
SELECT l_returnflag,
       COUNT(l_quantity) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20, 4))) AS DOUBLE) AS total_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@query("q54_salted_agg", oracle=_Q54_SQL, tags=("agg", "skew"))
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over a 3-value (maximally hot) key:
    stage 1 combines per (key, salt) across 8 reducers, stage 2 merges
    the ≤8 partial rows. Result-identical to plain groupBy; decimal-cast
    sum keeps the float total order-independent."""
    li = catalog.load(spark, "lineitem", sf_dir).withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(20,4)")
    )
    out = skew.salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("l_quantity", "count"),
            "total_qty": ("qty_dec", "sum"),
            "max_qty": ("l_quantity", "max"),
        },
        n_salts=8,
    )
    return out.withColumn("total_qty", F.col("total_qty").cast("double"))


_Q55_SQL = """
SELECT o.o_custkey, COUNT(*) AS n_orders, MAX(c.c_acctbal) AS acctbal
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
"""


@query("q55_salted_join", oracle=_Q55_SQL, tags=("join", "skew"))
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-side join: orders get one salt, customers explode to
    all 8 salt values, so a hot customer's orders spread over 8 reducers.
    (Here the dim is broadcastable — the salted path is for when it is
    not; correctness is what this query checks.)"""
    orders = catalog.load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    cust = (
        catalog.load(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("o_custkey"), "c_acctbal")
    )
    joined = skew.salted_join(orders, cust, on=["o_custkey"], n_salts=8)
    return joined.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("c_acctbal").alias("acctbal"),
    )


_Q130_SQL = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_custs,
       COUNT(DISTINCT o_orderpriority) AS n_prios
FROM orders
GROUP BY o_orderstatus
"""


@query("q130_salted_distinct_count", oracle=_Q130_SQL, tags=("agg", "skew"))
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key COUNT DISTINCT via value-derived salting
    (`skew.salted_count_distinct`): the one aggregate family where a hot
    grouping key genuinely hurts — partial aggregation must carry every
    distinct value to one reducer, so salting by hash(value) spreads the
    hot key's distinct set over n_salts disjoint reducers and SUMs the
    exact partial counts. o_orderstatus is a 3-value (maximally hot)
    key; result-identical to plain COUNT(DISTINCT ...)."""
    orders = catalog.load(spark, "orders", sf_dir)
    custs = skew.salted_count_distinct(
        orders, ["o_orderstatus"], "o_custkey", alias="n_custs", n_salts=8
    )
    prios = skew.salted_count_distinct(
        orders, ["o_orderstatus"], "o_orderpriority", alias="n_prios", n_salts=8
    )
    return custs.join(prios, "o_orderstatus")


# --------------------------------------------------------------------------
# Raw SQL surface — spark.sql() over catalog-registered views, running
# the IDENTICAL ANSI text the DuckDB oracle runs (dialect-common subset:
# decimal-cast sums for order independence, no engine-specific functions).
# --------------------------------------------------------------------------

_Q56_SQL = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20, 4))) AS DOUBLE) AS total_value,
       MAX(o.o_orderdate) AS latest_order
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus <> 'F'
GROUP BY n.n_name
"""


@query("q56_sql_surface", oracle=_Q56_SQL, tags=("sql", "join", "agg"))
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() entry point: catalog views + the exact SQL string
    the oracle runs. Catalyst plans it like the DataFrame surface —
    broadcast dims, pushed filter on o_orderstatus, partial aggs."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(_Q56_SQL)


# --------------------------------------------------------------------------
# Temporal joins (operators/temporal.py): as-of and range — operators
# Spark lacks as built-ins, composed from union+window / bucket-join.
# DuckDB has native ASOF JOIN, making both fully oracle-checkable.
# --------------------------------------------------------------------------

_Q57_SQL = """
SELECT a.event_id, a.user_id, a.value AS click_value, b.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'click') a
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id AND b.ts < a.ts
"""


@query("q57_asof_join", oracle=_Q57_SQL, tags=("join", "temporal"))
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the same user's latest strictly-earlier
    purchase value. One shuffle on user_id + one ordered window pass —
    no range explosion (union trick, `operators/temporal.py:asof_join`)."""
    from march_mania_spark_lakehouse_spark.operators import temporal

    ev = catalog.load(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = temporal.asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["value"], strict=True,
    )
    return out.select("event_id", "user_id", "click_value", "asof_value")


_Q58_SQL = """
SELECT a.event_id,
       COUNT(*) AS n_nearby_clicks,
       MAX(b.value) AS max_click_value
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts - INTERVAL 3600 SECOND
 AND b.ts < a.ts
GROUP BY a.event_id
"""


@query("q58_range_join", oracle=_Q58_SQL, tags=("join", "temporal"))
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks in the hour before each same-user error. The
    theta predicate becomes an equi-join on (user, time bucket) with the
    left side exploded to its ~2 candidate buckets, then exact-filtered
    (`operators/temporal.py:range_join`)."""
    from march_mania_spark_lakehouse_spark.operators import temporal

    ev = catalog.load(spark, "events", sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("c_ts"), F.col("value")
    )
    pairs = temporal.range_join(
        errors, clicks, on=["user_id"], left_ts="ts", right_ts="c_ts",
        lower_s=-3600, upper_s=0,
    )
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_nearby_clicks"),
        F.max("value").alias("max_click_value"),
    )


# --------------------------------------------------------------------------
# Multimodal pipeline: payload → resize → frame-sample → per-media stats.
# --------------------------------------------------------------------------


@query("q64_media_pipeline", oracle=None, tags=("multimodal",))
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained multimodal stages (attach → resize → frame-sample →
    aggregate): three Arrow mapInPandas hops with declared schemas, then
    a relational agg — the decode is stubbed (no codecs here) but the
    batch plumbing, schemas and row-multiplying frame stage are real.
    Deterministic → rows-only driver check + unit tests."""
    from march_mania_spark_lakehouse_spark.operators import multimodal

    docs = catalog.load(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    media = multimodal.attach_fake_payload(docs, "doc_id", "text", media_type="video")
    resized = multimodal.resize_media(media, target_w=16, target_h=16)
    frames = multimodal.sample_frames(
        resized.select("media_id", "media_type", "payload"), frame_bytes=32, every_n=2
    )
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame_payload")).alias("total_bytes"),
    )


@query("q67_cosine_topk_vectorized", oracle=None, tags=("similarity",))
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-GEMM top-k (E3 production path): one numpy matmul per
    Arrow batch + tree top-k merge. Same results as q25 (agreement
    unit-tested to 1e-9); BLAS summation order → rows-only driver check."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    return similarity.cosine_topk_vectorized(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )
