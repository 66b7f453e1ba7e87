"""End-to-end corpus-curation pipeline test (pipeline/corpus.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.pipeline.corpus import (
    CurationConfig,
    curate,
    filter_documents,
    score_documents,
)
from march_mania_spark_lakehouse_spark.pipeline.paths import LakePaths


def test_curation_funnel(spark, sf_dir, tmp_path):
    cfg = CurationConfig(sf_dir=sf_dir)
    paths = LakePaths(root=str(tmp_path / "corpus_lake"))
    funnel = curate(spark, cfg, paths)

    # the funnel only ever narrows, and nothing vanishes silently
    assert funnel["raw"] >= funnel["quality_filtered"] >= funnel["deduped"]
    assert funnel["deduped"] >= funnel["decontaminated"] > 0
    assert funnel["chunks"] > 0

    gold = spark.read.parquet(str(tmp_path / "corpus_lake" / "gold" / "corpus_chunks"))
    # chunks carry split + shuffle key; split is partition-pruned
    assert {"split", "shuffle_key", "chunk_id", "chunk_text"} <= set(gold.columns)
    splits = {r.split for r in gold.select("split").distinct().collect()}
    assert "train" in splits
    # the eval hash buckets never reach gold (decontaminate removes them
    # from training BEFORE chunking)
    from march_mania_spark_lakehouse_spark.operators.sampling import hash_bucket

    leaked = gold.select("doc_id").distinct().filter(
        hash_bucket("doc_id") < cfg.eval_buckets
    )
    assert leaked.count() == 0

    # every chunk's parent survived curation
    clean_ids = {
        r.doc_id
        for r in spark.read.parquet(
            str(tmp_path / "corpus_lake" / "silver" / "corpus_train_clean")
        ).select("doc_id").collect()
    }
    assert {r.doc_id for r in gold.select("doc_id").distinct().collect()} <= clean_ids


def test_quality_filter_drops_planted_garbage(spark, sf_dir):
    cfg = CurationConfig(sf_dir=sf_dir)
    garbage = spark.createDataFrame(
        [(900001, "spam spam spam spam spam spam spam spam", "en", "x", 40)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    from march_mania_spark_lakehouse_spark import catalog

    docs = catalog.load(spark, "documents", sf_dir).unionByName(garbage)
    kept = filter_documents(score_documents(docs, cfg), cfg)
    assert kept.filter(F.col("doc_id") == 900001).count() == 0
