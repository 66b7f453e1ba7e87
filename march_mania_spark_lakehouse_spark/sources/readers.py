"""Readers (S1–S3, S8): CSV with declared-or-inferred schema, Parquet,
JSON — plus registry-routed ingestion with a misc fallback.

Reference parity: `jobs/01_ingest_bronze.py:43-63` (CSV ingest + trim +
registry routing), `src/common/datasets.py:94-96` (lookup-with-fallback).
We prefer declared schemas (`schema=`) over ``inferSchema`` for
determinism (SURVEY.md §1.3) but keep the inference path for unknown
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
) -> DataFrame:
    """CSV scan. With ``schema`` the read is deterministic and prunable;
    ``infer=True`` reproduces the reference's bronze behavior (S1)."""
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """Parquet scan (S3); declared schema pins ReadSchema for pruning."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same vectorized columnar path + predicate pushdown as
    parquet (Spark's OrcFileFormat); interchange format for Hive-era
    lakes."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file scan (`binaryFile` format): one row per file with
    ``(path, modificationTime, length, content binary)`` — the ingest
    edge for multimodal corpora (images/audio/video land as opaque
    payloads + typed metadata; `operators/multimodal.py` featurizes).

    Scale posture: files are split units, not rows — a directory of a
    billion objects parallelizes by file; pair with
    ``spark.sql.files.maxPartitionBytes`` and a manifest table when file
    counts dwarf listing throughput.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_text(
    spark: SparkSession, path: str, whole: bool = False
) -> DataFrame:
    """Text scan: one row per line (``value string``), or one row per
    file with ``wholetext`` — the raw-corpus ingest edge before
    documents get ids and metadata.

    NB: must go through the ``text()`` keyword — a prior
    ``.option("wholetext", ...)`` is overwritten by the method
    parameter's default."""
    return spark.read.text(path, wholetext=whole)


def trim_string_columns(df: DataFrame) -> DataFrame:
    """Trim every string column — ingest cleanup (P9, `jobs/01:55-57`)."""
    return df.select(
        *[
            F.trim(F.col(name)).alias(name) if dtype == "string" else F.col(name)
            for name, dtype in df.dtypes
        ]
    )


def read_parquet_evolved(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan across schema VERSIONS (`mergeSchema`): files written
    before a column existed read as typed NULL for it — the ingestion
    reality of a long-lived 100 TB table where producers add fields over
    time.

    With an explicit ``schema`` the scan pins to that contract instead
    (faster — no footer merge pass — and immune to a producer's
    incompatible surprise column); use mergeSchema for discovery,
    declared schemas for production, same policy as `catalog.py`.
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", True).parquet(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML scan (built into Spark 4): one row per ``row_tag`` element,
    attributes as ``_attr`` columns. Same schema policy as every other
    edge format: inferred for discovery, declared for production. For
    XML embedded in a string COLUMN, use ``F.from_xml`` /
    ``F.schema_of_xml`` instead of this file-level reader."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
