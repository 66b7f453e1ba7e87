"""Second extension batch: embedding-cosine near-dup (E2), IVF ANN
(E3 scale path), BPE-style regex tokenization (E4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import similarity, text
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
    FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.35
"""


@query("q51_embedding_near_dup", oracle=_Q51_SQL, tags=("dedup", "similarity"))
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (E2): exact all-pairs baseline;
    the LSH bucket join (q26) is the same scoring at corpus scale."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    return similarity.embedding_near_dup(emb, threshold=0.35)


# --------------------------------------------------------------------------
# E3 — IVF approximate nearest neighbors (scale path #2 next to sign-LSH).
# --------------------------------------------------------------------------


@query("q52_cosine_topk_ivf", oracle=None, bench=True, tags=("similarity",))
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
_Q53_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       SUM(n_bpe) AS total_bpe_tokens,
       MAX(n_bpe) AS max_bpe_tokens,
       SUM(CASE WHEN n_bpe = n_ws THEN 1 ELSE 0 END) AS n_pure_word_docs
FROM (
    SELECT lang,
           len(regexp_extract_all(text, '{text.BPE_TOKEN_PATTERN}', 1)) AS n_bpe,
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
