"""ML-surface sanity tests (M1–M9): metric bounds on separable synthetic
data, blend arithmetic, holdout split disjointness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.ml import modeling


@pytest.fixture(scope="module")
def separable(spark):
    """Linearly separable-ish: label = x1 + x2 > 1 with slight noise-free
    margin; seasons 2000-2003."""
    rows = []
    rng_vals = [(i * 37 % 100) / 100.0 for i in range(400)]
    for i in range(400):
        x1 = rng_vals[i]
        x2 = rng_vals[(i + 13) % 400]
        label = 1 if x1 + x2 > 1.0 else 0
        season = 2000 + (i % 4)
        rows.append((i, season, float(x1), float(x2), label))
    return spark.createDataFrame(
        rows, "id long, season int, x1 double, x2 double, label int"
    ).cache()


def test_lr_auc_and_logloss_bounds(separable):
    train, test = modeling.season_holdout(separable, "season", 2003)
    model = modeling.build_lr_pipeline(["x1", "x2"], max_iter=30).fit(train)
    scored = model.transform(test)
    auc = modeling.auc(scored)
    ll = modeling.logloss(scored)
    assert 0.95 <= auc <= 1.0
    assert 0.0 < ll < 0.4


def test_holdout_split_is_disjoint_and_complete(separable):
    train, test = modeling.season_holdout(separable, "season", 2003)
    assert train.count() + test.count() == separable.count()
    assert train.filter(F.col("season") >= 2003).count() == 0
    assert test.filter(F.col("season") != 2003).count() == 0


def test_blend_is_convex_combination(separable):
    train, test = modeling.season_holdout(separable, "season", 2003)
    lr = modeling.build_lr_pipeline(["x1", "x2"], max_iter=30).fit(train)
    a = lr.transform(test)
    blended = modeling.blend(a, a, id_cols=["id"], alpha=0.65)
    # blend of a model with itself must reproduce its own probability
    chk = blended.withColumn("diff", F.abs(F.col("pred") - F.col("p_a")))
    assert chk.agg(F.max("diff")).collect()[0][0] < 1e-12
    assert blended.filter((F.col("pred") < 0) | (F.col("pred") > 1)).count() == 0


def test_rolling_backtest_shapes(separable):
    results = modeling.rolling_backtest(
        separable,
        lambda: modeling.build_lr_pipeline(["x1", "x2"], max_iter=20),
        "season",
        [2001, 2002, 2003],
    )
    assert [r.season for r in results] == [2001, 2002, 2003]
    for r in results:
        assert 0.5 <= r.auc <= 1.0
        assert r.n_train > 0 and r.n_test > 0


def test_tvs_hpo_selects_valid_params(separable):
    train, _ = modeling.season_holdout(separable, "season", 2003)
    model, best = modeling.tvs_hpo_lr(train, ["x1", "x2"], parallelism=2)
    assert best["regParam"] in (0.01, 0.05, 0.1, 0.5)
    assert best["elasticNetParam"] in (0.0, 0.5)
    assert model.transform(train).count() == train.count()


def test_matchup_labels_are_symmetric(spark, sf_dir):
    """U3 property: every pair appears twice with labels summing to 1."""
    from march_mania_spark_lakehouse_spark.plans.queries_core3 import q48

    m = q48(spark, sf_dir)
    per_pair = m.withColumn(
        "lo", F.least("key1", "key2")
    ).withColumn("hi", F.greatest("key1", "key2")).groupBy("entity", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("s")
    )
    assert per_pair.filter((F.col("n") != 2) | (F.col("s") != 1)).count() == 0


def test_vector_assembler_keeps_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0, None, 1), (2, 0.5, 2.0, 0)], "id long, x1 double, x2 double, label int"
    )
    out = modeling.assemble_features(["x1", "x2"]).transform(df)
    assert out.count() == 2  # handleInvalid="keep" → no row loss


def test_tvs_hpo_gbt_selects_valid_params(separable):
    model, params = modeling.tvs_hpo_gbt(
        separable, ["x1", "x2"], max_iter=5, parallelism=2
    )
    assert params["maxDepth"] in (3, 5)
    assert params["subsamplingRate"] in (0.8, 1.0)
    assert modeling.auc(model.transform(separable)) > 0.8
