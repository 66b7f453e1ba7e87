"""Third extension batch: data-quality expectation report, TF-IDF
keyword extraction, and the Python UDTF surface (lateral table
function).

The reference's only quality mechanism is fail-fast *schema* asserts
(`src/features/basketball_features.py:19-23`); q84 generalizes to data
contracts. TF-IDF (q85) extends the text-analysis family (q21–q24)
with the classic corpus-weighted keyword score. q86 completes the UDF
taxonomy (scalar built-ins → pandas grouped map → mapInPandas → UDTF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators.dq import (
    dq_report,
    fk_orphans,
    violation_counts,
)
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q84 — data-quality expectation report: every check over one table runs
# in a single scan (conditional aggregation); referential integrity is
# an anti-join counting orphans. Output is one row per check.
# --------------------------------------------------------------------------

_Q84_SQL = """
SELECT CAST('lineitem_negative_price' AS VARCHAR) AS check_name,
       CAST((SELECT COUNT(*) FROM lineitem WHERE l_extendedprice < 0) AS BIGINT) AS n_violations,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
UNION ALL
SELECT 'lineitem_qty_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity NOT BETWEEN 1 AND 50 OR l_quantity IS NULL),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'lineitem_discount_range',
       (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_null_custkey',
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'orders_fk_customer',
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)),
       (SELECT COUNT(*) FROM orders)
"""


@query("q84_dq_report", oracle=_Q84_SQL, tags=("dq", "pipeline"))
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report (`operators/dq.py`): range/null checks fold
    into ONE conditional-agg scan per table; the FK check anti-joins
    orders→customer (customer keys broadcast). A 100 TB scan emits a
    KB-size report — only counts cross the shuffle."""
    li = catalog.load(spark, "lineitem", sf_dir)
    orders = catalog.load(spark, "orders", sf_dir)
    customer = catalog.load(spark, "customer", sf_dir)
    li_checks = violation_counts(
        li,
        {
            "lineitem_negative_price": F.col("l_extendedprice") < 0,
            "lineitem_qty_range": ~F.col("l_quantity").between(1, 50)
            | F.col("l_quantity").isNull(),
            "lineitem_discount_range": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1),
        },
    )
    o_checks = violation_counts(
        orders, {"orders_null_custkey": F.col("o_custkey").isNull()}
    )
    fk = fk_orphans(orders, customer, "o_custkey", "c_custkey", "orders_fk_customer")
    return dq_report(li_checks, o_checks, fk)


# --------------------------------------------------------------------------
# q85 — TF-IDF top-3 keywords per document. Two shuffles (tf by
# (doc,token), df by token), then a broadcast of the tiny doc-count and
# one ranking window. Scores round to 6 decimals BEFORE ranking so the
# cross-engine order is identical (ln() differs by ulps between libm
# and the JVM).
# --------------------------------------------------------------------------

_Q85_SQL = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM docs
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok2 GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok2 GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM docs),
scored AS (
    SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
           ROUND(tf.tf * LN((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
    FROM tf JOIN dfreq USING (token) CROSS JOIN n
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, token
    ) AS rn
    FROM scored
)
SELECT doc_id, token, tf, df, tfidf FROM ranked WHERE rn <= 3
"""


@query("q85_tfidf_keywords", oracle=_Q85_SQL, tags=("text",))
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: tf = per-(doc,token) counts, df =
    per-token distinct docs, idf = smoothed ln((N+1)/(df+1)); top-3
    tokens per doc by rounded score with a token tiebreak. All JVM
    built-ins; the doc-count side is a 1-row broadcast."""
    docs = catalog.load(spark, "documents", sf_dir).filter(F.col("doc_id") < 2000)
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# q86 — Python UDTF (table function) via LATERAL join: one input row →
# many output rows with imperative per-row logic. This sentence splitter
# IS expressible relationally (explode(split()) — that's the oracle);
# the UDTF exists to cover the API surface for the cases that aren't
# (per-row parsers, tokenizers with state). Python-evaluated → keep off
# the hot path; the relational form is the production path.
# --------------------------------------------------------------------------

_Q86_SQL = """
WITH exploded AS (
    SELECT doc_id, trim(unnest(string_split(text, '.')), ' ') AS sentence
    FROM documents WHERE doc_id < 500
)
SELECT doc_id, sentence,
       CAST(len(list_filter(string_split(sentence, ' '), x -> x <> '')) AS INTEGER)
           AS n_words
FROM exploded WHERE sentence <> ''
"""


@query("q86_udtf_sentences", oracle=_Q86_SQL, tags=("udf", "text"))
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lateral join: documents × sentence_split(text) →
    (sentence, n_words) rows. Arrow-optimized (``useArrow=True``), so
    rows cross the Python boundary in Arrow batches, not one by one —
    the plan shows ArrowEvalPython, never BatchEvalPython (linted for
    every query by `tests/test_plans.py:test_no_query_uses_cartesian_or_
    row_python`). The oracle derives the same rows relationally (unnest
    + trim + filter), proving the UDTF against a declarative spec."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence string, n_words int", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for raw in text.split("."):
                s = raw.strip(" ")
                if s:
                    yield s, len([w for w in s.split(" ") if w])

    catalog.register_views(spark, sf_dir)
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.n_words
        FROM documents d, LATERAL sentence_split(d.text) AS s
        WHERE d.doc_id < 500
        """
    )
