"""Embedding quantization — the memory lever of a 100 TB vector corpus.

Symmetric per-dimension int8 quantization: codes = round(v_d / s_d · 127)
with s_d = max |v_d| over the corpus. 4× smaller than float32 (16× vs
float64), which is the difference between an ANN index that fits in
executor memory and one that doesn't; recall loss is the tested, bounded
reconstruction error.

Everything is relational: the scale vector is a dim-sized aggregate
(64 doubles — driver-collected exactly like the IVF centroids in
`operators/similarity.py:cosine_topk_ivf`), and encode/decode are
``transform`` lambdas over the array column — no shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_scales(df: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension max-abs over the corpus: posexplode → max(abs) per
    position. The shuffle carries (dim × partitions) partial maxima —
    constant in corpus size after map-side combine."""
    rows = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("s"))
        .orderBy("pos")
        .collect()
    )
    return [max(r.s, 1e-12) for r in rows]


def quantize_int8(vec: Column | str, scales: list[float]) -> Column:
    """Encode: code_d = clamp(round(v_d / s_d · 127), −127, 127) as int.
    The scale vector is a literal array, so the lambda stays JVM-side."""
    v = F.col(vec) if isinstance(vec, str) else vec
    s = F.array(*[F.lit(float(x)) for x in scales])

    def _enc(x: Column, i: Column) -> Column:
        code = F.round(x.cast("double") / F.element_at(s, i + 1) * 127, 0)
        return F.least(F.lit(127.0), F.greatest(F.lit(-127.0), code)).cast("int")

    return F.transform(v, _enc)


def dequantize_int8(codes: Column | str, scales: list[float]) -> Column:
    """Decode: v̂_d = code_d / 127 · s_d (double)."""
    c = F.col(codes) if isinstance(codes, str) else codes
    s = F.array(*[F.lit(float(x)) for x in scales])
    return F.transform(
        c, lambda x, i: x.cast("double") / 127 * F.element_at(s, i + 1)
    )


def with_int8_codes(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "codes",
    scales: list[float] | None = None,
) -> DataFrame:
    """Attach int8 codes for every vector (two passes total: one
    dim-sized aggregate for the scales, one map-only encode)."""
    s = scales if scales is not None else dim_scales(df, vec_col)
    return df.withColumn(out_col, quantize_int8(vec_col, s))
