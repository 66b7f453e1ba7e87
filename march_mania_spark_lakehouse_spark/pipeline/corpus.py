"""Corpus-curation pipeline — the medallion layers of a TRAINING-DATA
lakehouse, composed from the operator library the same way
`pipeline/jobs.py` composes the reference's analytics jobs.

Bronze (raw docs) → Silver (scored, deduped, decontaminated) → Gold
(chunked, packed, split, shuffle-ordered) — the sequence an LLM data
pipeline runs between ingest and tokenization:

1. **score** — quality + repetition signals, one map-only pass
   (`operators/text.py`); rows carry their signals so every later
   filter is a predicate, not a recompute.
2. **filter** — drop low-quality / degenerate-repetition docs.
3. **exact dedup** — first occurrence per content hash (32-byte
   shuffle).
4. **near dedup** — MinHash→Jaccard→components→survivors
   (`operators/dedup.py:near_dup_dedup`).
5. **decontaminate** — drop docs leaking eval-split n-grams above a
   threshold (`operators/dedup.py:decontaminate`).
6. **chunk + pack** — context-window chunking, then token-budget bin
   packing per shard (`operators/text.py:chunk_text`,
   `operators/sampling.py:pack_bins`).
7. **split + order** — deterministic hash train/val/test split and
   md5 shuffle order (`operators/sampling.py:hash_split`) — both
   engine-reproducible, no RNG state.

Every stage is a DataFrame→DataFrame function; `curate` wires them with
materialization points at each layer so a failed stage restarts from
the previous layer, exactly like the numbered analytics jobs.

At 100 TB: stages 1-2 are map-only; 3 shuffles hashes; 4 shuffles
shingle/band keys (never text); 5 broadcasts the eval shingle set; 6 is
partition-local; 7 is a pure filter + range partitioning. The corpus
text crosses the wire only at the explicit layer writes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import dedup
from march_mania_spark_lakehouse_spark.operators.sampling import hash_bucket, hash_split
from march_mania_spark_lakehouse_spark.operators.text import (
    chunk_text,
    quality_score,
    with_repetition_signals,
)
from march_mania_spark_lakehouse_spark.pipeline.paths import LakePaths
from march_mania_spark_lakehouse_spark.sources import writers


@dataclass(frozen=True)
class CurationConfig:
    sf_dir: str = "/root/testdata/sf0.001"
    min_quality: float = 0.2
    max_dup_bigram: float = 0.5
    max_top_token: float = 0.5
    near_dup_threshold: float = 0.5
    contamination_max: float = 0.2
    eval_buckets: int = 10  # doc_id hash buckets < this → eval split
    chunk_size: int = 400
    chunk_stride: int = 350


def score_documents(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 1: attach quality + repetition signals (map-only)."""
    scored = with_repetition_signals(docs, "doc_id", "text")
    return docs.join(scored.drop("n_tokens"), "doc_id").withColumn(
        "quality", quality_score("text")
    )


def filter_documents(scored: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 2: quality/repetition predicates (no recompute — signals
    are columns)."""
    return scored.filter(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("dup_bigram_frac") <= cfg.max_dup_bigram)
        & (F.col("top_token_frac") <= cfg.max_top_token)
    )


def dedup_documents(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stages 3+4: exact first-occurrence dedup, then near-dup survivor
    selection."""
    exact = dedup.dedup_keep_first(docs, ["text"], "doc_id")
    return dedup.near_dup_dedup(
        exact, "doc_id", "text", threshold=cfg.near_dup_threshold
    )


def decontaminate_documents(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 5: drop training docs leaking eval n-grams above the
    contamination threshold; the eval split itself never enters
    training."""
    bkt = hash_bucket("doc_id")
    train = docs.filter(bkt >= cfg.eval_buckets)
    eval_df = docs.filter(bkt < cfg.eval_buckets)
    report = dedup.decontaminate(train, eval_df, "doc_id", "text", n=3)
    dirty = report.filter(
        F.col("contamination") > cfg.contamination_max
    ).select("doc_id")
    return train.join(dirty, "doc_id", "left_anti")


def chunk_documents(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 6a: context-window chunking (partition-local explode)."""
    return chunk_text(
        docs, "doc_id", "text", chunk_size=cfg.chunk_size, stride=cfg.chunk_stride
    )


def split_documents(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Stage 7: deterministic split + md5 shuffle key; ordering becomes
    a layout property at write (`repartitionByRange` on the key)."""
    out = hash_split(docs, "doc_id")
    return out.withColumn(
        "shuffle_key", F.md5(F.col("doc_id").cast("string"))
    )


def curate(
    spark: SparkSession, cfg: CurationConfig, paths: LakePaths
) -> dict[str, int]:
    """Run the full curation pipeline with a materialization point per
    layer; returns per-stage surviving-row counts (the funnel a data
    team actually monitors)."""
    docs = catalog.load(spark, "documents", cfg.sf_dir)
    writers.write_parquet(docs, paths.bronze("corpus_raw"))
    funnel = {"raw": docs.count()}

    scored = score_documents(spark.read.parquet(paths.bronze("corpus_raw")), cfg)
    kept = filter_documents(scored, cfg)
    deduped = dedup_documents(kept, cfg)
    writers.write_parquet(deduped, paths.silver("corpus_deduped"))
    funnel["quality_filtered"] = kept.count()
    funnel["deduped"] = spark.read.parquet(paths.silver("corpus_deduped")).count()

    clean = decontaminate_documents(
        spark.read.parquet(paths.silver("corpus_deduped")), cfg
    )
    writers.write_parquet(clean, paths.silver("corpus_train_clean"))
    funnel["decontaminated"] = spark.read.parquet(
        paths.silver("corpus_train_clean")
    ).count()

    chunks = chunk_documents(
        spark.read.parquet(paths.silver("corpus_train_clean")), cfg
    )
    final = split_documents(chunks, cfg)
    writers.write_parquet(final, paths.gold("corpus_chunks"), partition_by=["split"])
    funnel["chunks"] = spark.read.parquet(paths.gold("corpus_chunks")).count()
    return funnel
