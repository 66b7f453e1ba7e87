"""Simulate the round driver against __spark_entry__.py.

Runs entry() on a VANILLA SparkSession (driver-default configs, not our
tuned factory), then every queries() entry at sf0.01 compared against
oracle_sql() via DuckDB (row count + sorted-column value comparison),
mirroring CORRECTNESS_r{N}.json. Exit code 0 iff everything matches.

Usage: python tools/driver_sim.py [sf_dir] [--only q1,q2,...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[ns]")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


def frames_match(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    """Strict compare emulating the driver's value-hash: pandas dtypes must
    agree (int64 vs float64 is a FAIL — e.g. DuckDB HUGEINT sums arrive as
    float64 while Spark bigints arrive as int64, and a repr-level hash
    diverges even when the numbers are equal), then values must be exactly
    equal (floats: bitwise, via float64 compare with NaN==NaN)."""
    a, b = normalize(a), normalize(b)
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        sa, sb = a[c], b[c]
        # Integer widths (int32 vs int64) repr identically and hash-match on
        # the real driver (q11/q35/q60 passed r1); int-vs-float does NOT
        # (q62 failed r1: DuckDB HUGEINT sum -> float64 vs Spark int64).
        ka = "int" if sa.dtype.kind in "iu" else str(sa.dtype)
        kb = "int" if sb.dtype.kind in "iu" else str(sb.dtype)
        if ka != kb:
            return False, f"dtype differs in column {c}: spark={sa.dtype} oracle={sb.dtype}"
        try:
            sa64, sb64 = sa.astype("float64"), sb.astype("float64")
            ok = ((sa64 == sb64) | (sa64.isna() & sb64.isna())).all()
        except (ValueError, TypeError):
            ok = ((sa.astype(str) == sb.astype(str))).all()
        if not ok:
            return False, f"values differ in column {c}"
    return True, ""


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    flagship = entrymod.entry(spark)
    rows = flagship.collect()
    print(f"entry(): {len(rows)} rows, schema={flagship.columns} "
          f"({time.perf_counter()-t0:.1f}s)")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    # oracle_sql() pins file-reading oracles to the driver's sf0.01
    # compare scale; when simulating at another scale, rebind them to
    # the requested dir so both engines read the same files.
    oracles = {
        k: v.replace("/root/testdata/sf0.01", sf_dir) for k, v in oracles.items()
    }
    if only is not None:
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {str(e)[:150]}")
            continue
        dt = time.perf_counter() - t0
        if name in oracles:
            odf = con.sql(oracles[name]).df()
            ok, why = frames_match(spdf, odf)
            status = "match" if ok else f"MISMATCH ({why})"
            if not ok:
                failures.append(name)
            print(f"{'ok   ' if ok else 'FAIL '}{name}: {len(spdf)} rows, {status}, {dt:.1f}s")
        else:
            ok = len(spdf) > 0
            if not ok:
                failures.append(name)
            print(f"{'ok   ' if ok else 'FAIL '}{name}: rows-only, {len(spdf)} rows, {dt:.1f}s")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK")
    if failures:
        print("failures:", failures)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
