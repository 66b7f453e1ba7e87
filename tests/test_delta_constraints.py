"""Delta CHECK constraints + NOT NULL invariants: declarative write-time
data quality (protocol `delta.constraints.*` configuration + schema
nullability). Enforcement is one probe over the BATCH; a violating
write must leave zero trace — no commit, no stray data files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.sources import delta_log


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, cat string, val double")


def test_check_constraint_blocks_bad_append_atomically(spark, tmp_path):
    t = str(tmp_path / "con1")
    delta_log.create(_df(spark, [(1, "a", 1.0)]), t)
    v = delta_log.add_constraint(spark, t, "val_positive", "val > 0")
    n_files = len(
        [f for f in os.listdir(t) if f.endswith(".parquet")]
    )
    with pytest.raises(delta_log.DeltaConstraintViolationError, match="val > 0"):
        delta_log.append(_df(spark, [(2, "b", -5.0)]), t)
    # zero trace: version unchanged, no stray data files
    assert delta_log.latest_version(t) == v
    assert len([f for f in os.listdir(t) if f.endswith(".parquet")]) == n_files
    # a clean batch still lands
    delta_log.append(_df(spark, [(3, "c", 3.0)]), t)
    assert delta_log.read_delta(spark, t).count() == 2


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = str(tmp_path / "con2")
    delta_log.create(_df(spark, [(1, "a", -1.0)]), t)
    with pytest.raises(delta_log.DeltaConstraintViolationError, match="existing"):
        delta_log.add_constraint(spark, t, "val_positive", "val > 0")
    # nothing recorded
    meta = delta_log._latest_metadata(t, delta_log.latest_version(t))
    assert not any(
        k.startswith("delta.constraints.") for k in meta["configuration"]
    )


def test_drop_constraint_reopens_writes(spark, tmp_path):
    t = str(tmp_path / "con3")
    delta_log.create(_df(spark, [(1, "a", 1.0)]), t)
    delta_log.add_constraint(spark, t, "small_id", "id < 100")
    with pytest.raises(delta_log.DeltaConstraintViolationError):
        delta_log.append(_df(spark, [(500, "z", 1.0)]), t)
    delta_log.drop_constraint(t, "small_id")
    delta_log.append(_df(spark, [(500, "z", 1.0)]), t)
    assert delta_log.read_delta(spark, t).count() == 2
    with pytest.raises(KeyError):
        delta_log.drop_constraint(t, "small_id")


def test_not_null_invariant_including_missing_column_batch(spark, tmp_path):
    t = str(tmp_path / "con4")
    delta_log.create(_df(spark, [(1, "a", 1.0)]), t)
    delta_log.set_not_null(spark, t, "cat")
    with pytest.raises(delta_log.DeltaConstraintViolationError, match="IS NOT NULL"):
        delta_log.append(_df(spark, [(2, None, 2.0)]), t)
    # a batch that OMITS the column entirely reads back as null → reject
    with pytest.raises(delta_log.DeltaConstraintViolationError, match="IS NOT NULL"):
        delta_log.append(
            spark.createDataFrame([(3, 3.0)], "id long, val double"), t
        )
    delta_log.append(_df(spark, [(4, "d", 4.0)]), t)
    assert delta_log.read_delta(spark, t).count() == 2


def test_constraints_enforced_on_merge_and_update(spark, tmp_path):
    t = str(tmp_path / "con5")
    delta_log.create(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    delta_log.add_constraint(spark, t, "val_positive", "val > 0")
    with pytest.raises(delta_log.DeltaConstraintViolationError):
        delta_log.merge(_df(spark, [(1, "a", -9.0)]), t, keys=["id"])
    with pytest.raises(delta_log.DeltaConstraintViolationError):
        delta_log.update_where(spark, t, "id = 2", {"val": F.lit(-1.0)})
    # table unchanged by both failed writes
    assert sorted(tuple(r) for r in delta_log.read_delta(spark, t).collect()) == [
        (1, "a", 1.0), (2, "b", 2.0)
    ]
