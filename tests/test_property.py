"""Hypothesis property tests: generated inputs against serial models.

The seeded-random tests elsewhere pin behavior on the shipped corpus;
these search the input space (empty strings, repeated separators, id
extremes, adversarial token counts) for contract violations the fixed
corpus can't surface. Each property runs a handful of examples — every
example is a Spark round-trip, so example counts are deliberately small
and deadlines disabled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from march_mania_spark_lakehouse_spark.operators import dedup, sampling

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Texts that stress the single-space tokenizer: empty, leading/trailing/
# repeated spaces, unicode, single chars.
_texts = st.text(
    alphabet=st.sampled_from(list("ab xyζ")), min_size=0, max_size=40
)
# Ids up to the engine-neutral hash overflow bound (~3.4e9 keeps every
# intermediate < 2^63).
_ids = st.integers(min_value=0, max_value=3_400_000_000)


@_SETTINGS
@given(st.lists(_ids, min_size=1, max_size=50, unique=True))
def test_hash_bucket_matches_serial_formula_and_range(spark, ids):
    """Spark's hash_bucket must equal the pure-integer serial formula for
    any id in the supported range (engine-neutrality is the whole point),
    and land in [0, 100)."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["b"]
        for r in df.select("id", sampling.hash_bucket("id").alias("b")).collect()
    }
    for i in ids:
        expect = ((i * sampling.HASH_MULT + sampling.HASH_ADD) % sampling.HASH_MOD) % 100
        assert got[i] == expect
        assert 0 <= got[i] < 100


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 5_000)),
        min_size=1,
        max_size=60,
    )
)
def test_pack_bins_matches_serial_model_on_generated_loads(spark, rows):
    """Concat-then-chunk binning equals the serial per-shard exclusive
    prefix-sum model for arbitrary (id, token-count) loads — including
    zero-token docs and docs larger than the whole budget."""
    uniq = {i: t for i, t in rows}  # last write wins; ids unique
    df = spark.createDataFrame(list(uniq.items()), "doc_id long, n_tok long")
    packed = {
        r["doc_id"]: (r["shard"], r["bin"])
        for r in sampling.pack_bins(df, "doc_id", "n_tok", budget=100, shard_size=50).collect()
    }
    shards: dict = {}
    for doc_id in sorted(uniq):
        shards.setdefault(doc_id // 50, []).append(doc_id)
    for shard, members in shards.items():
        cum = 0
        for doc_id in members:
            assert packed[doc_id] == (shard, cum // 100), (doc_id, uniq[doc_id])
            cum += uniq[doc_id]


@_SETTINGS
@given(st.lists(_texts, min_size=1, max_size=30))
def test_simhash_forms_agree_on_generated_texts(spark, texts):
    """Column-fold and explode-aggregate SimHash must stay bit-identical
    on adversarial texts (empty, repeated/leading spaces, unicode)."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    col_ver = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", dedup.simhash("text").alias("s")).collect()
    }
    rel_ver = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_relational(df, "doc_id").collect()
    }
    assert col_ver == rel_ver


@_SETTINGS
@given(st.lists(_texts, min_size=1, max_size=30))
def test_exact_dedup_partition_invariants(spark, texts):
    """exact_dedup_groups: copy counts sum to the input row count, every
    representative is the minimum id of its class, and keep-first
    survivors are exactly the representatives."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    groups = dedup.exact_dedup_groups(df, ["text"], "doc_id").collect()
    assert sum(r["n_copies"] for r in groups) == len(texts)
    by_text: dict = {}
    for i, t in enumerate(texts):
        by_text.setdefault(t, []).append(i)
    assert len(groups) == len(by_text)
    for r in groups:
        assert r["keep_doc_id"] == min(by_text[r["text"]])
        assert r["n_copies"] == len(by_text[r["text"]])
    survivors = sorted(
        r["doc_id"] for r in dedup.dedup_keep_first(df, ["text"], "doc_id").collect()
    )
    assert survivors == sorted(min(v) for v in by_text.values())


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.floats(min_value=-50, max_value=150), st.booleans()),
        min_size=2,
        max_size=60,
    ).filter(lambda xs: any(r for _, r in xs) and any(not r for _, r in xs))
)
def test_psi_total_is_nonnegative(spark, rows):
    """PSI is a sum of (p−q)·ln(p/q) terms, each ≥ 0 for any pair of
    distributions — the total must never go (more than rounding-epsilon)
    negative, whatever the split looks like."""
    from march_mania_spark_lakehouse_spark.operators.drift import psi_report

    df = spark.createDataFrame(rows, "x double, ref boolean")
    out = {r.bucket: r.psi for r in psi_report(
        df, "x", F.col("ref"), lo=0.0, hi=100.0
    ).collect()}
    assert out[-1] >= -1e-5


@_SETTINGS
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=30,
    ).filter(lambda vs: any(any(abs(x) > 1e-6 for x in v) for v in vs))
)
def test_quantize_roundtrip_error_bounded_by_half_step(spark, vecs):
    """Per element: |v − dequant(quant(v))| ≤ s_d/254 + ulp for in-range
    values (half a quantization step of the per-dim scale)."""
    from march_mania_spark_lakehouse_spark.operators import quantize

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    scales = quantize.dim_scales(df, "embedding")
    out = df.select(
        "embedding",
        quantize.dequantize_int8(
            quantize.quantize_int8("embedding", scales), scales
        ).alias("back"),
    ).collect()
    for r in out:
        for d, (orig, back) in enumerate(zip(r.embedding, r.back)):
            assert abs(orig - back) <= scales[d] / 254 + 1e-9


@_SETTINGS
@given(
    st.lists(st.tuples(_ids, st.integers(0, 5)), min_size=1, max_size=80)
)
def test_bitmap_distinct_equals_count_distinct(spark, rows):
    """Bitmap-bucket distinct must equal COUNT(DISTINCT) for any key
    distribution and grouping."""
    from march_mania_spark_lakehouse_spark.operators import sketch

    df = spark.createDataFrame(rows, "k long, g int")
    got = {
        r.g: r.n
        for r in sketch.bitmap_exact_distinct(df, ["g"], "k", "n").collect()
    }
    exact = {
        r.g: r.n for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    assert got == exact


@_SETTINGS
@given(st.lists(st.tuples(st.integers(0, 1 << 15), st.integers(0, 1 << 15)), min_size=1, max_size=40))
def test_zorder_key_roundtrips_both_dimensions(spark, pairs):
    """De-interleaving the Morton key must recover both inputs exactly
    (bits=16 covers the generated range)."""
    from march_mania_spark_lakehouse_spark.operators import sketch

    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", sketch.zorder_key(["x", "y"], bits=16).alias("z")
    )
    for r in df.collect():
        x = sum(((r.z >> (2 * b)) & 1) << b for b in range(16))
        y = sum(((r.z >> (2 * b + 1)) & 1) << b for b in range(16))
        assert (x, y) == (r.x, r.y)


def _segment_dedup_model(rows, k, max_docs):
    """Serial model of segment_dedup: same rule in plain Python."""
    segs = []  # (doc_id, seg_idx, seg)
    for doc_id, text in rows:
        words = text.split(" ")
        for i in range(0, len(words), k):
            segs.append((doc_id, i // k, " ".join(words[i:i + k])))
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for d, i, s in segs:
        by_seg.setdefault(s, []).append((d, i))
    hot = {s: min(occ) for s, occ in by_seg.items()
           if len({d for d, _ in occ}) > max_docs}
    out: dict[int, list[tuple[int, str]]] = {}
    for d, i, s in segs:
        if s not in hot or (d, i) == hot[s]:
            out.setdefault(d, []).append((i, s))
    return {d: " ".join(s for _, s in sorted(parts))
            for d, parts in out.items()}


@_SETTINGS
@given(
    st.lists(
        st.text(alphabet=st.sampled_from(list("abc ")), min_size=0, max_size=30),
        min_size=1, max_size=8,
    )
)
def test_segment_dedup_matches_serial_model(spark, texts):
    """segment_dedup must equal the plain-Python rule on arbitrary texts
    (repeated separators, empty strings, sub-K tails, heavy repeats)."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup.segment_dedup(df, "doc_id", "text", k=3, max_docs=1).collect()
    }
    assert got == _segment_dedup_model(rows, k=3, max_docs=1)


@_SETTINGS
@given(
    st.lists(
        st.floats(min_value=-50.0, max_value=150.0, allow_nan=False),
        min_size=1, max_size=60,
    )
)
def test_histogram_quantiles_match_serial_model(spark, values):
    """Histogram-sketch quantiles must equal the same binning +
    interpolation computed serially — including out-of-range clamping
    and sparse (missing) bins."""
    from march_mania_spark_lakehouse_spark.operators import sketch

    lo, hi, bins = 0.0, 100.0, 16
    width = (hi - lo) / bins
    df = spark.createDataFrame([(v,) for v in values], "v double")
    h = sketch.histogram_sketch(df, "v", [], lo, hi, bins)
    got = {
        r["q"]: r["est"]
        for r in sketch.quantiles_from_histogram(
            h, [], (0.5, 0.9), lo, hi, bins
        ).collect()
    }
    # serial model
    counts: dict[int, int] = {}
    for v in values:
        b = min(max(int((v - lo) // width), 0), bins - 1)
        counts[b] = counts.get(b, 0) + 1
    total = len(values)
    expected = {}
    for q in (0.5, 0.9):
        target = q * total
        cum = 0
        for b in sorted(counts):
            n = counts[b]
            if cum + n >= target and cum < target:
                expected[q] = lo + width * (b + (target - cum) / n)
                break
            cum += n
    assert set(got) == set(expected)
    for q in expected:
        assert abs(got[q] - expected[q]) < 1e-9, (q, got[q], expected[q])
