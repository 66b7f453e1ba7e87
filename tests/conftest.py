"""Shared fixtures: one SparkSession per test run, a DuckDB connection
with the testdata registered as views, and a frame comparator that mimics
the driver's oracle check (sort columns by name, order-insensitive rows,
exact value equality)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

from march_mania_spark_lakehouse_spark.catalog import TABLE_NAMES  # noqa: E402
from march_mania_spark_lakehouse_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def normalize_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize temporal dtypes, sort rows."""
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[ns]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def assert_frames_equal(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    a, b = normalize_frame(spark_pdf), normalize_frame(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        if str(a[c].dtype).startswith("float") or str(b[c].dtype).startswith("float"):
            sa, sb = a[c].astype("float64"), b[c].astype("float64")
            mism = ~((sa == sb) | (sa.isna() & sb.isna()))
        else:
            sa, sb = a[c], b[c]
            if str(sa.dtype) != str(sb.dtype):
                sa, sb = sa.astype(str), sb.astype(str)
            mism = ~((sa == sb) | (sa.isna() & sb.isna()))
        if mism.any():
            idx = mism[mism].index[:5]
            raise AssertionError(
                f"{name}: column {c} mismatches at rows {list(idx)}: "
                f"spark={sa.loc[idx].tolist()} oracle={sb.loc[idx].tolist()}"
            )
