"""Dataset catalog: declared schemas + path provider + view registration.

Parity with the reference's registry (`src/common/datasets.py:20-96`,
`src/common/paths.py:23-55`) but with *declared* StructType schemas instead
of ``inferSchema`` (determinism — SURVEY.md §1.3), registered as Spark SQL
temp views so every operator is reachable from both the DataFrame and SQL
surfaces.

At 100 TB these tables would be partitioned/bucketed lake tables; the
catalog keeps the logical name → path/schema mapping independent of the
storage root, so swapping the local testdata root for an s3a:// lake URI is
a one-line env change (reference: `local_overrides/src/common/paths.py`).
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class DatasetSpec:
    """Logical dataset: name, declared physical schema, and layout hints.

    ``partition_hint`` documents the 100 TB layout (what the table would be
    partitioned/bucketed by on a real lake); unused on local parquet.
    ``post`` normalizes physical quirks right after the scan (e.g. the
    events table stores nanosecond timestamps, which Spark reads as long).
    """

    name: str
    schema: T.StructType
    partition_hint: tuple[str, ...] = field(default_factory=tuple)
    post: object = None

    def path(self, sf_dir: str) -> str:
        return f"{sf_dir.rstrip('/')}/{self.name}.parquet"


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


_I, _L, _D, _S, _TS = (
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
    T.StringType(),
    T.TimestampType(),
)

REGISTRY: dict[str, DatasetSpec] = {
    spec.name: spec
    for spec in [
        DatasetSpec("region", _s(("r_regionkey", _I), ("r_name", _S))),
        DatasetSpec("nation", _s(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I))),
        DatasetSpec(
            "customer",
            _s(
                ("c_custkey", _L),
                ("c_name", _S),
                ("c_nationkey", _I),
                ("c_acctbal", _D),
                ("c_mktsegment", _S),
            ),
        ),
        DatasetSpec(
            "supplier",
            _s(("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D)),
        ),
        DatasetSpec(
            "part",
            _s(
                ("p_partkey", _L),
                ("p_name", _S),
                ("p_brand", _S),
                ("p_type", _S),
                ("p_size", _I),
                ("p_retailprice", _D),
            ),
        ),
        DatasetSpec(
            "orders",
            _s(
                ("o_orderkey", _L),
                ("o_custkey", _L),
                ("o_orderstatus", _S),
                ("o_totalprice", _D),
                ("o_orderdate", _TS),
                ("o_orderpriority", _S),
            ),
            partition_hint=("o_orderdate",),
        ),
        DatasetSpec(
            "lineitem",
            _s(
                ("l_orderkey", _L),
                ("l_partkey", _L),
                ("l_suppkey", _L),
                ("l_linenumber", _I),
                ("l_quantity", _D),
                ("l_extendedprice", _D),
                ("l_discount", _D),
                ("l_tax", _D),
                ("l_returnflag", _S),
                ("l_linestatus", _S),
                ("l_shipdate", _TS),
            ),
            partition_hint=("l_shipdate",),
        ),
        # events.ts unit varies by fixture vintage (timestamp[ns] or [us]);
        # the loader sniffs the parquet footer and normalizes to a µs
        # TimestampType (exactly what DuckDB's TIMESTAMP does) — see
        # `_load_events`.
        DatasetSpec(
            "events",
            _s(
                ("event_id", _L),
                ("ts", _TS),
                ("user_id", _L),
                ("event_type", _S),
                ("value", _D),
                ("props", _S),
            ),
            partition_hint=("ts",),
        ),
        DatasetSpec(
            "documents",
            _s(
                ("doc_id", _L),
                ("text", _S),
                ("lang", _S),
                ("source", _S),
                ("n_chars", _L),
            ),
            partition_hint=("source",),
        ),
        DatasetSpec(
            "embeddings",
            _s(
                ("vec_id", _L),
                ("embedding", T.ArrayType(T.FloatType())),
                ("label", _I),
            ),
        ),
    ]
}

TABLE_NAMES = tuple(REGISTRY)


def assert_cols(df: DataFrame, required: list[str] | tuple[str, ...], ctx: str = "") -> None:
    """Fail-fast schema contract (reference: `src/features/basketball_features.py:19-23`)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"{ctx or 'dataset'}: missing required columns {missing}")


def _parquet_ts_unit(path: str, col: str) -> str:
    """Sniff a timestamp column's physical unit from the parquet footer.

    Footer-only metadata read (cheap even on a 100 TB lake — one file's
    footer). Falls back to 'us' with a loud warning when the footer can't
    be read — a silent fallback on an ns-unit file would load every
    timestamp 1000× too large. ImportError (pyarrow genuinely absent)
    propagates: this module already hard-depends on the sniff for events
    correctness, so a missing dep should fail the job, not skew the data.
    """
    import pyarrow.parquet as pq  # hard dep: silent absence would corrupt ts

    p = path
    if os.path.isdir(p):
        parts = sorted(
            f for f in os.listdir(p) if f.endswith(".parquet") and not f.startswith("_")
        )
        if not parts:
            return "us"
        p = os.path.join(p, parts[0])
    try:
        t = pq.read_schema(p).field(col).type
        return getattr(t, "unit", "us") or "us"
    except (OSError, KeyError, ValueError) as exc:  # unreadable footer / missing col
        warnings.warn(
            f"could not sniff timestamp unit for {p!r} ({exc}); assuming 'us' — "
            "verify the fixture if events timestamps look off by 1000x",
            stacklevel=2,
        )
        return "us"


def _load_events(spark: SparkSession, spec: DatasetSpec, sf_dir: str) -> DataFrame:
    """Events scan, normalizing `ts` to µs TimestampType whatever the file unit.

    - timestamp[us]/[ms] (no tz): declared TimestampType — the vectorized
      reader takes the stored naive value as a UTC instant, matching
      DuckDB's `epoch(ts)` semantics.
    - timestamp[ns]: Spark has no nano timestamps, so scan the raw int64
      as long and truncate nanos → micros in a post-projection.
    """
    path = spec.path(sf_dir)
    unit = _parquet_ts_unit(path, "ts")
    if unit == "ns":
        fields = [
            T.StructField(f.name, _L if f.name == "ts" else f.dataType, True)
            for f in spec.schema.fields
        ]
        df = spark.read.schema(T.StructType(fields)).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(spec.schema).parquet(path)


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one registered dataset with its declared schema.

    Declared schemas (not inferSchema) keep correctness checks
    deterministic and let Catalyst prune/push down against a stable
    ReadSchema.
    """
    spec = REGISTRY[name]
    if name == "events":
        return _load_events(spark, spec, sf_dir)
    df = spark.read.schema(spec.schema).parquet(spec.path(sf_dir))
    return spec.post(df) if spec.post is not None else df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load(spark, name, sf_dir) for name in REGISTRY}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every dataset as a temp view (SQL surface parity)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
