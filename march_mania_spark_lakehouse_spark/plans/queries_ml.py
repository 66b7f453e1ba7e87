"""ML-surface queries (M1–M9). MLlib vector types have no DuckDB
equivalent, and fitted coefficients depend on partition-order float
association → rows-only checks here; metric-sanity bounds are asserted in
tests/test_ml.py.

Feature/label construction: predict whether an order's priority is
'1-URGENT'/'2-HIGH' from line-level aggregates — deterministic labels from
the testdata, no leakage (features exclude the priority column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.functions.numeric import davg, dsum
from march_mania_spark_lakehouse_spark.ml import modeling
from march_mania_spark_lakehouse_spark.plans.registry import query

FEATURE_COLS = (
    "n_items",
    "sum_qty",
    "avg_price",
    "avg_discount",
    "o_totalprice",
)


def training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-style training table: per-order line aggregates + label.

    Mirrors the reference's gold build (`jobs/03_build_gold_training_set.py`):
    fact aggregation → dimension join → typed features + binary label.
    """
    li = catalog.load(spark, "lineitem", sf_dir)
    orders = catalog.load(spark, "orders", sf_dir)
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_items"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_discount"),
    )
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "inner")
        .withColumn(
            "label",
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
        )
        .withColumn("o_year", F.year("o_orderdate"))
        .select("o_orderkey", "o_year", "label", "o_totalprice", *FEATURE_COLS[:4])
    )


@query("q33_ml_lr_metrics", oracle=None, bench=False, tags=("ml",))
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2/M4/M5/M8: assemble→LR on a season holdout; returns one row of
    metrics (auc, logloss, counts) — the backtest metric shape
    (`jobs/07:101-104`) kept in Spark."""
    gold = training_frame(spark, sf_dir).cache()
    years = [r[0] for r in gold.select("o_year").distinct().collect()]
    holdout = max(years)
    train, test = modeling.season_holdout(gold, "o_year", holdout)
    model = modeling.build_lr_pipeline(FEATURE_COLS, max_iter=20).fit(train)
    scored = model.transform(test)
    metrics = [
        (
            int(holdout),
            float(modeling.auc(scored)),
            float(modeling.logloss(scored)),
            int(train.count()),
            int(test.count()),
        )
    ]
    from march_mania_spark_lakehouse_spark.sources.local_rows import local_df

    return local_df(
        spark, metrics,
        "holdout_year int, auc double, logloss double, n_train long, n_test long",
    )


@query("q34_ml_blend_predictions", oracle=None, bench=False, tags=("ml",))
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/M7/F9: GBT + LR fits blended α·p_gbt + (1−α)·p_lr on the id join
    (`jobs/12:149-153`); returns per-label prediction summary."""
    gold = training_frame(spark, sf_dir).cache()
    years = [r[0] for r in gold.select("o_year").distinct().collect()]
    train, test = modeling.season_holdout(gold, "o_year", max(years))
    lr_scored = modeling.build_lr_pipeline(FEATURE_COLS, max_iter=20).fit(train).transform(test)
    gbt_scored = (
        modeling.build_gbt_pipeline(FEATURE_COLS, max_iter=10, max_depth=4)
        .fit(train)
        .transform(test)
    )
    blended = modeling.blend(gbt_scored, lr_scored, id_cols=["o_orderkey"], alpha=0.65)
    labeled = blended.join(test.select("o_orderkey", "label"), "o_orderkey")
    return labeled.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("pred"), 4).alias("avg_pred"),
    )
