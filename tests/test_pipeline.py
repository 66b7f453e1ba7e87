"""End-to-end medallion pipeline test: bronze→silver→gold→ML on sf0.001
into a temp lake; asserts layer contents and artifact exports."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.pipeline.config import PipelineConfig
from march_mania_spark_lakehouse_spark.pipeline.paths import LakePaths
from march_mania_spark_lakehouse_spark.pipeline.runner import run_pipeline


def test_full_pipeline(spark, sf_dir, tmp_path):
    cfg = PipelineConfig(sf_dir=sf_dir)
    paths = LakePaths(root=str(tmp_path / "lake"))
    timings = run_pipeline(spark, cfg, paths)
    assert [t[0] for t in timings] == list(range(1, 13))

    # bronze landed every registered table
    assert spark.read.parquet(paths.bronze("lineitem")).count() == 6000
    # silver party stats: one row per (role, party)
    stats = spark.read.parquet(paths.silver("party_stats"))
    assert stats.groupBy("role", "party").count().filter(F.col("count") > 1).count() == 0
    # silver elo conserves rating mass per season
    elo = spark.read.parquet(paths.silver("elo_ratings"))
    chk = elo.groupBy("season").agg(F.avg("elo").alias("m"))
    for r in chk.collect():
        assert abs(r["m"] - 1500.0) < 1e-6
    # gold is partitioned by year and ML-ready
    gold = spark.read.parquet(paths.gold("training_orders"))
    assert gold.filter(F.col("label").isNull()).count() == 0
    assert "cust_roll_value" in gold.columns
    # artifacts: submission + backtest metrics
    sub = paths.artifact("submission.csv")
    assert os.path.isfile(sub)
    with open(sub) as f:
        rows = list(csv.DictReader(f))
    assert rows and set(rows[0]) == {"ID", "Pred"}
    assert all(0.0 <= float(r["Pred"]) <= 1.0 for r in rows)
    with open(paths.artifact("backtest_metrics.csv")) as f:
        metrics = list(csv.DictReader(f))
    assert metrics and all(0.0 <= float(m["auc"]) <= 1.0 for m in metrics)

    # jobs 08-10: parsed priority, consensus, SOS silver tables
    prio = spark.read.parquet(paths.silver("order_priority"))
    assert prio.filter(F.col("prio_rank").isNull()).count() == 0
    assert spark.read.parquet(paths.silver("consensus")).count() > 0
    sos = spark.read.parquet(paths.silver("supplier_sos"))
    assert sos.groupBy("l_suppkey").count().filter(F.col("count") > 1).count() == 0

    # jobs 11-12: HPO params JSON round-trips into the ensemble export
    import json

    with open(paths.artifact("best_params.json")) as f:
        best = json.load(f)
    assert set(best) == {"lr", "gbt"} and "regParam" in best["lr"]
    with open(paths.artifact("ensemble_submission.csv")) as f:
        ens = list(csv.DictReader(f))
    assert ens and all(0.0 <= float(r["Pred"]) <= 1.0 for r in ens)


def test_gold_degrades_without_silver(spark, sf_dir, tmp_path):
    """Optional-feature attachment: gold builds even when the silver
    rolling snapshot is missing (typed-null columns instead of failure)."""
    cfg = PipelineConfig(sf_dir=sf_dir)
    paths = LakePaths(root=str(tmp_path / "lake2"))
    run_pipeline(spark, cfg, paths, first=1, last=1)  # bronze only
    run_pipeline(spark, cfg, paths, first=5, last=5)  # gold without silver
    gold = spark.read.parquet(paths.gold("training_orders"))
    assert gold.count() > 0
    assert gold.filter(F.col("cust_roll_value").isNotNull()).count() == 0


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "pipeline.yml"
    p.write_text("blend_alpha: 0.5\nrolling_last_n: 5\ncustom_knob: 7\n")
    cfg = PipelineConfig.from_yaml(str(p))
    assert cfg.blend_alpha == 0.5
    assert cfg.rolling_last_n == 5
    assert cfg.extras == {"custom_knob": 7}
