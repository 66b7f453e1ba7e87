"""Training-data pipeline batch: deterministic splits, quota sampling,
sequence packing (the mixture-construction surface next to dedup E1/E2
and similarity E3 — reference parity: the data-prep stages around
`/root/reference` feature builds, re-expressed as set operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import davg, sql_davg
from march_mania_spark_lakehouse_spark.operators import sampling, text
from march_mania_spark_lakehouse_spark.plans.registry import query

_TOK = "string_split(text, ' ')"

# --------------------------------------------------------------------------
# Deterministic train/val/test hash split.
# --------------------------------------------------------------------------

_Q68_SQL = f"""
WITH b AS (
    SELECT n_chars, {sampling.sql_hash_bucket('doc_id')} AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 98 THEN 'train'
            WHEN bucket < 99 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       {sql_davg('CAST(n_chars AS DOUBLE)', 'avg_chars')}
FROM b
GROUP BY 1
"""


@query("q68_hash_split", oracle=_Q68_SQL, tags=("pipeline", "sampling"))
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: engine-neutral multiplicative
    hash bucket of doc_id (stable across runs/engines/partitionings — a
    split that must be reproducible anywhere the corpus goes cannot use
    engine-private hashes). One map-side pass + tiny aggregate."""
    docs = catalog.load(spark, "documents", sf_dir)
    split = sampling.hash_split(docs, "doc_id")
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg(F.col("n_chars").cast("double"), "avg_chars"),
    )


# --------------------------------------------------------------------------
# Per-(lang, source) quota sample by quality.
# --------------------------------------------------------------------------

_QUALITY_SQL = (
    f"ROUND(LEAST(LN(CAST(len({_TOK}) AS DOUBLE) + 1.0) / 5.0, 1.0)"
    f" * (CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK})), 6)"
)

_Q69_SQL = f"""
WITH scored AS (
    SELECT lang, source, doc_id, {_QUALITY_SQL} AS quality
    FROM documents
)
SELECT lang, source, doc_id, quality
FROM (
    SELECT lang, source, doc_id, quality,
           ROW_NUMBER() OVER (PARTITION BY lang, source
                              ORDER BY quality DESC, doc_id) AS rn
    FROM scored
)
WHERE rn <= 20
"""


@query("q69_quota_sample", oracle=_Q69_SQL, tags=("pipeline", "sampling"))
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling for mixture construction: top-20 docs per
    (lang, source) cell under the quality score with a deterministic
    doc_id tiebreak — one shuffle on the cell key."""
    docs = catalog.load(spark, "documents", sf_dir)
    scored = docs.select(
        "lang", "source", "doc_id", text.quality_score("text").alias("quality")
    )
    return sampling.quota_sample(
        scored,
        ["lang", "source"],
        [F.col("quality").desc(), F.col("doc_id").asc()],
        20,
    )


# --------------------------------------------------------------------------
# Sequence packing: concat-then-chunk token bins per shard.
# --------------------------------------------------------------------------

_Q70_SQL = f"""
WITH t AS (
    SELECT doc_id, doc_id // 1000 AS shard, len({_TOK}) AS n_tok
    FROM documents
),
c AS (
    SELECT shard, doc_id, n_tok,
           COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS excl
    FROM t
)
SELECT shard,
       CAST(FLOOR(excl / 2048.0) AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS first_doc
FROM c
GROUP BY shard, bin
"""


@query("q70_pack_bins", oracle=_Q70_SQL, tags=("pipeline", "packing"))
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (context-window binning): shard by id range so
    window partitions stay bounded (a global ORDER BY would serialize at
    corpus scale), exclusive prefix-sum token counts, chunk every 2048
    tokens; per-bin stats. Integer sums → order-independent, no decimal
    trick needed."""
    docs = catalog.load(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", text.token_count("text").cast("long").alias("n_tok")
    )
    packed = sampling.pack_bins(toks, "doc_id", "n_tok", budget=2048, shard_size=1000)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )
