"""ML operator surface — reference parity `src/ml/modeling.py`, `src/ml/tuning.py`,
`jobs/07`, `jobs/11`, `jobs/12` (M1–M9), re-expressed as a small library.

Everything heavy stays on the cluster: fits are MLlib JVM jobs, metrics
are DataFrame aggregations; only scalar metrics cross to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier, LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPS = 1e-15


def assemble_features(feature_cols: Sequence[str]) -> VectorAssembler:
    """M1: VectorAssembler(handleInvalid='keep') — nulls become 0-vectors
    downstream exactly as the reference does (`src/ml/modeling.py:68-72`)."""
    return VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="keep"
    )


def build_lr_pipeline(
    feature_cols: Sequence[str],
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.05,
    elastic_net: float = 0.0,
) -> Pipeline:
    """M2: 2-stage assemble→LogisticRegression pipeline (`modeling.py:73-82`)."""
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net,
    )
    return Pipeline(stages=[assemble_features(feature_cols), lr])


def build_gbt_pipeline(
    feature_cols: Sequence[str],
    label_col: str = "label",
    max_iter: int = 40,
    max_depth: int = 5,
    subsample: float = 1.0,
    seed: int = 42,
) -> Pipeline:
    """M3: assemble→GBTClassifier (`src/ml/tuning.py:119-124`)."""
    gbt = GBTClassifier(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        subsamplingRate=subsample,
        seed=seed,
    )
    return Pipeline(stages=[assemble_features(feature_cols), gbt])


def p1_column(scored: DataFrame, out_col: str = "p1") -> DataFrame:
    """F9: P(label=1) extracted from the MLlib probability vector."""
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    )


def auc(scored: DataFrame, label_col: str = "label") -> float:
    """M4: area under ROC via the JVM evaluator (`modeling.py:113-118`)."""
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol=label_col, metricName="areaUnderROC"
    )
    return float(ev.evaluate(scored))


def logloss(scored: DataFrame, label_col: str = "label") -> float:
    """M5: clipped cross-entropy as a DataFrame aggregation
    (`modeling.py:123-135`): p clipped to [ε, 1−ε], −avg(y·ln p + (1−y)·ln(1−p))."""
    with_p = p1_column(scored)
    p = F.least(F.greatest(F.col("p1"), F.lit(EPS)), F.lit(1 - EPS))
    y = F.col(label_col).cast("double")
    ll = -(y * F.log(p) + (1 - y) * F.log(1 - p))
    return float(with_p.agg(F.avg(ll).alias("ll")).collect()[0]["ll"])


def season_holdout(
    df: DataFrame, season_col: str, holdout: int
) -> tuple[DataFrame, DataFrame]:
    """M8: train on season < holdout, validate on == holdout (`jobs/04:62-68`)."""
    return (
        df.filter(F.col(season_col) < holdout),
        df.filter(F.col(season_col) == holdout),
    )


@dataclass
class BacktestResult:
    season: int
    auc: float
    logloss: float
    n_train: int
    n_test: int


def rolling_backtest(
    df: DataFrame,
    pipeline_builder,
    season_col: str,
    seasons: Sequence[int],
    label_col: str = "label",
) -> list[BacktestResult]:
    """M9: for each season s fit on <s, evaluate on ==s (`jobs/07:88-99`).

    ``df`` should be cached by the caller — the loop re-reads it per
    season (plan reuse, reference parity `jobs/07:81`).
    """
    results: list[BacktestResult] = []
    for s in seasons:
        train, test = season_holdout(df, season_col, s)
        n_train, n_test = train.count(), test.count()
        if n_train == 0 or n_test == 0:
            continue
        model: PipelineModel = pipeline_builder().fit(train)
        scored = model.transform(test)
        results.append(
            BacktestResult(
                season=s,
                auc=auc(scored, label_col),
                logloss=logloss(scored, label_col),
                n_train=n_train,
                n_test=n_test,
            )
        )
    return results


def blend(
    scored_a: DataFrame,
    scored_b: DataFrame,
    id_cols: Sequence[str],
    alpha: float = 0.65,
) -> DataFrame:
    """M7: probability blend Pred = α·P_a + (1−α)·P_b over an inner join
    on the id columns (`jobs/12:107,149-153`)."""
    a = p1_column(scored_a, "p_a").select(*id_cols, "p_a")
    b = p1_column(scored_b, "p_b").select(*id_cols, "p_b")
    return a.join(b, on=list(id_cols), how="inner").withColumn(
        "pred", F.lit(alpha) * F.col("p_a") + F.lit(1 - alpha) * F.col("p_b")
    )


def tvs_hpo_lr(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    train_ratio: float = 0.8,
    parallelism: int = 2,
    seed: int = 42,
):
    """M6: TrainValidationSplit over a small LR grid (`src/ml/tuning.py:71-93`).

    Returns (best_model, best_params_dict).
    """
    pipe = build_lr_pipeline(feature_cols, label_col)
    lr = pipe.getStages()[1]
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.01, 0.05, 0.1, 0.5])
        .addGrid(lr.elasticNetParam, [0.0, 0.5])
        .build()
    )
    tvs = TrainValidationSplit(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(
            rawPredictionCol="rawPrediction", labelCol=label_col
        ),
        trainRatio=train_ratio,
        parallelism=parallelism,
        seed=seed,
    )
    model = tvs.fit(train)
    best_lr = model.bestModel.stages[1]
    best_params = {
        "regParam": best_lr.getRegParam(),
        "elasticNetParam": best_lr.getElasticNetParam(),
    }
    return model.bestModel, best_params


def tvs_hpo_gbt(
    train: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    train_ratio: float = 0.8,
    parallelism: int = 2,
    seed: int = 42,
    max_iter: int = 20,
):
    """M6 (GBT side): TrainValidationSplit over the reference's GBT grid
    shape — maxDepth × subsamplingRate (`src/ml/tuning.py:127-150`).

    Returns (best_model, best_params_dict).
    """
    pipe = build_gbt_pipeline(feature_cols, label_col, max_iter=max_iter)
    gbt = pipe.getStages()[1]
    grid = (
        ParamGridBuilder()
        .addGrid(gbt.maxDepth, [3, 5])
        .addGrid(gbt.subsamplingRate, [0.8, 1.0])
        .build()
    )
    tvs = TrainValidationSplit(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=BinaryClassificationEvaluator(
            rawPredictionCol="rawPrediction", labelCol=label_col
        ),
        trainRatio=train_ratio,
        parallelism=parallelism,
        seed=seed,
    )
    model = tvs.fit(train)
    best_gbt = model.bestModel.stages[1]
    best_params = {
        "maxDepth": best_gbt.getMaxDepth(),
        "subsamplingRate": best_gbt.getSubsamplingRate(),
    }
    return model.bestModel, best_params
