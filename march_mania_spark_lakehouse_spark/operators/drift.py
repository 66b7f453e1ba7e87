"""Distribution-drift monitoring — the check a training pipeline runs
between two corpus snapshots / splits before trusting a model refresh.

Population Stability Index per bucket: with p = reference share and
q = current share, PSI = Σ_buckets (p − q)·ln(p/q). Rule of thumb:
< 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.

Pure relational: one conditional aggregate per bucket over a single
scan (the same single-pass shape as `operators/dq.py`), so the check
costs one map-side-combinable aggregate at any corpus size. Zero
buckets are epsilon-smoothed so the logarithm is total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def psi_report(
    df: DataFrame,
    feature: Column | str,
    is_reference: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
    eps: float = 1e-6,
    round_digits: int = 6,
) -> DataFrame:
    """Per-bucket PSI contributions of ``feature`` between the reference
    split (``is_reference`` true) and the current split (false).

    Buckets are fixed-width over [lo, hi] (caller-supplied bounds — a
    data-derived range would need a second pass and make the report
    depend on outliers); values outside clamp to the edge buckets, so
    every row lands somewhere. Output: one row per bucket with both
    shares and the PSI contribution, plus the scalar total under
    ``bucket = -1`` — the single number a drift monitor alerts on.
    """
    c = F.col(feature) if isinstance(feature, str) else feature
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((c - F.lit(lo)) / F.lit(width))),
    ).cast("int")

    counts = df.select(
        bucket.alias("bucket"), is_reference.alias("__ref")
    ).groupBy("bucket").agg(
        F.count_if(F.col("__ref")).alias("__n_ref"),
        F.count_if(~F.col("__ref")).alias("__n_cur"),
    )
    tot = counts.agg(
        F.sum("__n_ref").alias("__t_ref"), F.sum("__n_cur").alias("__t_cur")
    )
    # ANSI-safe: an empty split (total 0) degrades to the epsilon floor
    # instead of a divide-by-zero error.
    def _share(n: str, t: str) -> Column:
        return (
            F.when(F.col(t) > 0, F.col(n) / F.col(t)).otherwise(F.lit(0.0))
            + eps
        )

    shares = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        _share("__n_ref", "__t_ref").alias("p"),
        _share("__n_cur", "__t_cur").alias("q"),
    )
    per_bucket = shares.select(
        "bucket",
        F.round("p", round_digits).alias("p"),
        F.round("q", round_digits).alias("q"),
        F.round(
            (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")),
            round_digits,
        ).alias("psi"),
    )
    total = per_bucket.agg(F.round(F.sum("psi"), round_digits).alias("psi")).select(
        F.lit(-1).alias("bucket"),
        F.lit(None).cast("double").alias("p"),
        F.lit(None).cast("double").alias("q"),
        "psi",
    )
    return per_bucket.unionByName(total)
