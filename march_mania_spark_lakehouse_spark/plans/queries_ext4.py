"""Fourth extension batch — corpus-curation operators a training-data
pipeline runs between raw ingest and tokenization:

- q87 eval-set decontamination (n-gram leakage vs a held-out split)
- q88 repetition signals (dup-bigram fraction, top-token share)
- q89 overlapping document chunking (context-window splitter)
- q90 deterministic corpus shuffle (hash order, engine-reproducible)
- q91 vocabulary heavy hitters (global top-k tokens)
- q92 token-count histogram (corpus length profile)

The reference has no corpus layer (its "documents" are Kaggle CSVs,
`src/common/datasets.py:20-91`); these extend the E4 text family the
same way q20–q29 extend dedup. Every query is pure built-ins and
oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import dedup
from march_mania_spark_lakehouse_spark.operators.sampling import (
    hash_bucket,
    sql_hash_bucket,
)
from march_mania_spark_lakehouse_spark.operators.text import (
    chunk_text,
    token_count,
    tokens,
    with_repetition_signals,
)
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q87 — decontamination: which training docs leak eval-set n-grams.
# --------------------------------------------------------------------------

_SHINGLES3 = (
    "list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))"
)

_Q87_SQL = f"""
WITH b AS (
    SELECT doc_id, text, {sql_hash_bucket('doc_id')} AS bkt FROM documents
),
trs AS (
    SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM b WHERE bkt >= 10
),
evs AS (
    SELECT DISTINCT unnest({_SHINGLES3}) AS shingle FROM b WHERE bkt < 10
),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM trs GROUP BY doc_id),
hits AS (
    SELECT doc_id, COUNT(*) AS n_contaminated
    FROM trs WHERE shingle IN (SELECT shingle FROM evs)
    GROUP BY doc_id
)
SELECT s.doc_id,
       s.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       ROUND(CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE) / s.n_shingles,
             6) AS contamination
FROM sizes s LEFT JOIN hits h USING (doc_id)
"""


@query("q87_decontamination", oracle=_Q87_SQL, tags=("dedup", "pipeline"))
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (`operators/dedup.py:decontaminate`):
    the eval split (deterministic 10% hash bucket) contributes a small
    DISTINCT shingle set that broadcasts; the 90% train side streams
    through one explode + a semi-join + two doc-keyed aggregates. At
    100 TB the corpus is never shuffled on text — only (id, count) rows
    cross the wire."""
    docs = catalog.load(spark, "documents", sf_dir)
    bkt = hash_bucket("doc_id")
    return dedup.decontaminate(
        docs.filter(bkt >= 10), docs.filter(bkt < 10), "doc_id", "text", n=3
    )


# --------------------------------------------------------------------------
# q88 — repetition / quality signals per document.
# --------------------------------------------------------------------------

_Q88_SQL = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
base AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) >= 2 THEN ROUND(
               1.0 - CAST(len(list_distinct(
                   list_transform(range(1, len(toks)),
                                  i -> array_to_string(toks[i:i+1], ' '))
               )) AS DOUBLE) / (len(toks) - 1), 6)
           ELSE 0.0 END AS dup_bigram_frac
    FROM t
),
cnt AS (
    SELECT doc_id, tok, COUNT(*) AS n
    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    GROUP BY doc_id, tok
),
top AS (SELECT doc_id, MAX(n) AS top_n FROM cnt GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.dup_bigram_frac,
       ROUND(CAST(COALESCE(t2.top_n, 0) AS DOUBLE) / b.n_tokens, 6)
           AS top_token_frac
FROM base b LEFT JOIN top t2 USING (doc_id)
"""


@query("q88_repetition_signals", oracle=_Q88_SQL, tags=("text", "pipeline"))
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (`operators/text.py:
    with_repetition_signals`): dup-bigram fraction AND top-token share
    are pure array expressions (top-token = max run length over the
    sorted token array), so the whole query is map-only — zero shuffles,
    one row out per document. The filter pass of a quality pipeline
    reads these signals and never touches text again."""
    docs = catalog.load(spark, "documents", sf_dir)
    return with_repetition_signals(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# q89 — overlapping fixed-width chunking.
# --------------------------------------------------------------------------

_CHUNK, _STRIDE = 120, 90

_Q89_SQL = f"""
WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
n AS (
    SELECT doc_id, text,
           1 + CAST(FLOOR((GREATEST(L - {_CHUNK}, 0) + {_STRIDE - 1})
                          / {_STRIDE}.0) AS INT) AS n_chunks
    FROM d
),
ch AS (
    SELECT doc_id, text, unnest(range(0, n_chunks)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id,
       substr(text, CAST(chunk_id * {_STRIDE} + 1 AS INT), {_CHUNK})
           AS chunk_text,
       length(substr(text, CAST(chunk_id * {_STRIDE} + 1 AS INT), {_CHUNK}))
           AS chunk_len
FROM ch
"""


@query("q89_document_chunks", oracle=_Q89_SQL, tags=("text", "pipeline"))
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (`operators/text.py:chunk_text`): chunk i
    spans [1 + i·stride, +chunk_size); the last chunk always reaches the
    end of the text. The explode multiplies rows partition-locally — no
    shuffle — so a downstream tokenizer runs where the bytes already
    live, the property that matters when the input is 100 TB."""
    docs = catalog.load(spark, "documents", sf_dir)
    return chunk_text(docs, "doc_id", "text", chunk_size=_CHUNK, stride=_STRIDE)


# --------------------------------------------------------------------------
# q90 — deterministic corpus shuffle order.
# --------------------------------------------------------------------------

_Q90_SQL = """
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
       ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS shuffle_rank
FROM documents
"""


@query("q90_corpus_shuffle", oracle=_Q90_SQL, tags=("sampling", "pipeline"))
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: order = md5(id) — stable
    across runs, engines, and partitionings, with no RNG state to ship.

    The global rank is computed WITHOUT a single-partition window:
    the first two hex chars of the key give 256 fixed buckets that are
    prefix-aligned with the sort order, so rank = per-bucket
    ``row_number`` (parallel window) + the count of rows in earlier
    buckets (a 256-row cumulative that broadcasts back). Every stage is
    bucket-parallel; at 100 TB the writer would skip materializing the
    rank entirely and make order a layout property via
    ``repartitionByRange(shuffle_key).sortWithinPartitions(...)``."""
    docs = catalog.load(spark, "documents", sf_dir)
    key = F.md5(F.col("doc_id").cast("string"))
    keyed = docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.substring(key, 1, 2).alias("__bkt"),
    )
    counts = keyed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__bkt",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__off"),
    )
    local_rn = F.row_number().over(
        Window.partitionBy("__bkt").orderBy("shuffle_key", "doc_id")
    )
    return (
        keyed.join(F.broadcast(offsets), "__bkt")
        .select(
            "doc_id",
            "shuffle_key",
            (F.col("__off") + local_rn).alias("shuffle_rank"),
        )
    )


# --------------------------------------------------------------------------
# q91 — vocabulary heavy hitters.
# --------------------------------------------------------------------------

_Q91_SQL = """
SELECT tok AS token, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
ORDER BY n DESC, token
LIMIT 20
"""


@query("q91_vocab_heavy_hitters", oracle=_Q91_SQL, tags=("text",))
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k vocabulary: explode → hash-aggregate (partial
    map-side combine carries one row per (partition, token), so the
    shuffle is vocabulary-sized, not corpus-sized) → TakeOrderedAndProject
    for the top-k (per-partition heaps, never a global sort).
    Deterministic tiebreak on the token itself."""
    docs = catalog.load(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q92 — token-count histogram (corpus length profile).
# --------------------------------------------------------------------------

_Q92_SQL = """
WITH t AS (
    SELECT (len(string_split(text, ' ')) // 10) * 10 AS bucket,
           len(string_split(text, ' ')) AS n_tokens
    FROM documents
)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
FROM t
GROUP BY bucket
"""


@query("q92_token_histogram", oracle=_Q92_SQL, tags=("text", "pipeline"))
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: decade-bucketed token counts → one
    hash-aggregate. Integer sum/count are exact, so the derived average
    is order-independent — the histogram hashes identically at any
    parallelism."""
    docs = catalog.load(spark, "documents", sf_dir)
    n = token_count("text")
    return (
        docs.select(
            (F.floor(n / 10) * 10).alias("bucket"), n.alias("n_tokens")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_tokens"),
        )
    )
