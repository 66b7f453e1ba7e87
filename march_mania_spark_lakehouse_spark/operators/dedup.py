"""Deduplication operators (north-star E1/E2): exact hash dedup, n-gram
Jaccard, MinHash+LSH banding, SimHash.

Scale design:
- Exact dedup groups on a 256-bit content hash, not the content itself —
  at 100 TB the shuffle carries 32-byte keys instead of documents.
- MinHash/LSH: shingle → K minhashes → B bands; candidate pairs come from
  an equi-join on (band, band-hash), so cost is Σ bucket² not n².
- SimHash: one 64-bit signature per document from token hashes; near-dups
  share signatures (or differ in few bits).

Band-width sizing rule (applies to EVERY banded family here): the number
of distinct bucket keys must satisfy ``keys ≥ n² / target_pairs``, because
with n docs spread over k keys the candidate self-join generates
Σ bucket² ≈ n²/k pairs per band even under a uniform hash. A 32-bit
SimHash split into 4 bands has only 4·2⁸ = 1,024 keys — quadratic the
moment the corpus outgrows thousands of documents — whereas 64 bits /
4×16-bit bands gives 4·65,536 keys, the same sizing the image-pHash dedup
(q209) uses. MinHash band hashes take values mod a ~10⁹ prime, so their
key space is corpus-bounded, not width-bounded.

On top of the width rule, every candidate-pair operator defaults
``max_bucket`` to a size-derived cap (:func:`_auto_max_bucket`) so no
caller silently inherits unguarded Σ bucket² when real data has a
degenerate hot bucket (boilerplate corpora). Oracle-exact callers pass
``max_bucket=None`` explicitly.

All signatures use ``F.hash``/``F.xxhash64`` (JVM Murmur3/XXH64 —
deterministic, seedable, codegen'd); no Python in the hot path.
"""

from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.operators.core import rebalance_scan
from march_mania_spark_lakehouse_spark.operators.text import tokens


def content_hash(cols: Sequence[Column | str], num_bits: int = 256) -> Column:
    """SHA-2 content hash over the concatenated dedup key columns."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("", *cs), num_bits)


def exact_dedup_groups(
    df: DataFrame,
    key_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """One row per distinct content: representative id (min) + copy count.

    Groups on the content hash (narrow shuffle key at scale); carries the
    key columns through with ``first`` — safe because equal hash ⇒ equal
    content (SHA-256 collision ≈ 0).
    """
    return (
        df.withColumn("_chash", content_hash(key_cols))
        .groupBy("_chash")
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_copies"),
            *[F.first(c).alias(c) for c in key_cols],
        )
        .drop("_chash")
    )


def dedup_keep_first(df: DataFrame, key_cols: Sequence[str], id_col: str) -> DataFrame:
    """Return the surviving rows only (lowest id per duplicate class)."""
    from pyspark.sql import Window

    w = Window.partitionBy(content_hash(key_cols)).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def ngram_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-gram token shingles as an array<string>."""
    t = tokens(text)
    # Guard: F.sequence(1, 0) would produce a *descending* [1, 0] sequence,
    # so short texts must map to an explicitly empty shingle list.
    idx = F.when(
        F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    return F.array_distinct(grams)


def shingle_table(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) long table — the join surface for Jaccard/MinHash."""
    df = rebalance_scan(df)
    return df.select(
        F.col(id_col), F.explode(ngram_shingles(text_col, n)).alias("shingle")
    )


def drop_hot_shingles(
    sh: DataFrame, id_col: str, max_df: float
) -> DataFrame:
    """Drop "stop shingles" whose document frequency exceeds
    ``max_df`` (fraction of distinct documents) from a (id, shingle)
    table — standard MinHash practice.

    Why this matters at 100 TB: a single corpus-wide shingle ("in the
    of ") puts every document in one join bucket, and the candidate
    self-join cost is Σ bucket² — one bucket holding 30% of N documents
    costs 0.09·N², i.e. the all-pairs blowup LSH exists to avoid. The
    hot set itself is tiny by definition (few shingles can exceed X% of
    docs), so it broadcasts and the guard is a map-side anti-join — no
    extra shuffle on the corpus-sized table.

    Semantics: downstream Jaccard is computed over the *filtered*
    shingle universe (both intersections and set sizes), the same
    approximation every production near-dup pipeline makes. Pass
    ``max_df=None`` upstream to keep exact semantics.
    """
    n_docs = sh.agg(
        F.count_distinct(F.col(id_col)).alias("__n_docs")
    )
    hot = (
        sh.groupBy("shingle")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .join(F.broadcast(n_docs))
        .filter(F.col("__df") > F.col("__n_docs") * F.lit(max_df))
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), on="shingle", how="left_anti")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.0,
    max_df: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    |A∩B| from a self-equi-join on shingle; |A∪B| = |A|+|B|−|A∩B|.
    Output: (id_a, id_b, jaccard) with id_a < id_b, rounded to 6 digits.
    At scale, run *after* LSH banding (minhash_candidates) to bound pairs,
    and set ``max_df`` (e.g. 0.5) so a corpus-wide stop-shingle can't
    recreate the all-pairs join this operator exists to avoid — see
    :func:`drop_hot_shingles`. Default ``None`` keeps exact semantics.
    """
    sh = shingle_table(df, id_col, text_col, n)
    if max_df is not None:
        sh = drop_hot_shingles(sh, id_col, max_df)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return out.filter(F.col("jaccard") >= threshold) if threshold > 0 else out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """K-minhash signature per document: mh_s = min over shingles of
    murmur3(shingle, seed=s). One narrow aggregation, no UDFs."""
    sh = shingle_table(df, id_col, text_col, n)
    aggs = [
        F.min(F.hash(F.col("shingle"), F.lit(s))).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


#: Modulus for the portable (engine-arithmetic) hash family: large prime
#: < 2^30, so a*h+b stays far inside int64 for the affine parameters used.
PORTABLE_MOD = 1_000_000_007


def _portable_shingle_hash(shingle: Column) -> Column:
    """Deterministic polynomial hash of a shingle from pure int64
    arithmetic — identical in any engine (unlike murmur3/xxhash, which
    are Spark-specific): h ← (31·h + ascii(tok) + len(tok)) mod p folded
    left-to-right over the shingle's tokens.

    BMP/ASCII-corpus assumption: ``ascii(tok)`` is only cross-engine
    portable for tokens whose first char is in the Basic Multilingual
    Plane — Spark's ``ascii`` returns the first UTF-16 *code unit* while
    DuckDB's returns the Unicode *codepoint*, so astral-plane leading
    chars (emoji, 𝄞 → 55348 vs 119070) diverge. The fixture corpus is
    ASCII; for a non-ASCII corpus use :func:`minhash_signatures`
    (murmur3 family, recall-tested) instead — this portable family
    exists purely so the oracle can value-check the MinHash math.
    """
    per_tok = F.transform(
        F.split(shingle, " "), lambda t: (F.ascii(t) + F.length(t)).cast("long")
    )
    return F.aggregate(
        per_tok,
        F.lit(0).cast("long"),
        lambda h, x: (h * F.lit(31) + x) % F.lit(PORTABLE_MOD),
    )


def minhash_signatures_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signatures from the portable hash family:
    mh_s = min over shingles of (a_s·h + b_s) mod p with a_s = 2s+1,
    b_s = 997s+13 — exactly reproducible in any SQL engine, so unlike
    :func:`minhash_signatures` (JVM murmur3, recall-tested) this variant
    is value-verifiable against a DuckDB oracle.

    Shape advantage: the whole signature is computed from the document's
    own shingle array — map-only, zero shuffle, no shingle explosion; at
    100 TB signatures stream out of the scan. The cost is interpreted
    higher-order-function eval per row (outside codegen), which is why
    the murmur3 + explode form remains the default production path.
    """
    shingles = ngram_shingles(text_col, n)
    hashes = F.transform(shingles, _portable_shingle_hash)
    cols = [
        F.array_min(
            F.transform(
                hashes,
                lambda h: (h * F.lit(2 * s + 1) + F.lit(997 * s + 13))
                % F.lit(PORTABLE_MOD),
            )
        ).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return rebalance_scan(df).select(F.col(id_col), *cols)


def minhash_signatures_portable_relational(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """Same values as :func:`minhash_signatures_portable`, different
    physical shape: explode shingles → ONE codegen'd polynomial hash
    per shingle row (the n-token fold unrolled into nested arithmetic —
    no higher-order functions) → per-doc min of the affine family in a
    single hash aggregate.

    The q132 projection-collapse lesson applies to MinHash too: the
    map-only form re-inlines the interpreted shingle-hash fold into all
    ``num_hashes`` array_min columns. Measured at sf0.1: 0.38 s vs
    1.04 s (2.75×), bit-identical output. The trade is one shuffle on
    the doc id — free inside :func:`minhash_candidates_portable`, whose
    banding shuffles anyway; keep the map-only form when signatures
    stream out of a scan with no downstream shuffle. (Docs with zero
    shingles get NULL signatures there and NO row here; banding drops
    both the same way, since NULL band keys never equi-join.)
    """
    sh = shingle_table(df, id_col, text_col, n)
    toks = F.split(F.col("shingle"), " ")
    h = F.lit(0).cast("long")
    for i in range(n):
        t = toks.getItem(i)
        h = (h * F.lit(31) + (F.ascii(t) + F.length(t)).cast("long")) % F.lit(
            PORTABLE_MOD
        )
    hashed = sh.select(id_col, h.alias("__h"))
    aggs = [
        F.min(
            (F.col("__h") * F.lit(2 * s + 1) + F.lit(997 * s + 13))
            % F.lit(PORTABLE_MOD)
        ).alias(f"mh{s}")
        for s in range(num_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def _portable_token_hash(token: Column) -> Column:
    """Character-level polynomial hash of one token — pure int64
    arithmetic, identical in any engine: h ← (131·h + ascii(c)) mod p
    folded over the token's characters. Unlike the per-shingle hash
    (first-char + length per token), this mixes every character, which
    SimHash needs: each token must cast ~independent votes on 32 bits.
    Same BMP/ASCII-corpus assumption as :func:`_portable_shingle_hash`
    (Spark ``ascii`` = first UTF-16 code unit, DuckDB's = codepoint)."""
    codes = F.transform(F.split(token, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda h, x: (h * F.lit(131) + x) % F.lit(PORTABLE_MOD),
    )


def simhash_portable(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Engine-portable SimHash: per token, 32 derived hashes
    g_b = ((2b+3)·h + 101b+29) mod p vote ±1 by parity; bit b of the
    signature is 1 iff the vote sum is positive. The value-verifiable
    counterpart of :func:`simhash_relational` (JVM murmur3,
    bit-equality-tested against the column form) — exists so a DuckDB
    oracle can check the SimHash *math* end-to-end, same role q125's
    portable MinHash plays for q28.

    Same explode → per-bit-sums → sign-pack shape as
    ``simhash_relational`` (one shuffle on the doc id): the interpreted
    char-fold runs ONCE per token row, and the 32 vote sums are plain
    codegen arithmetic in a single hash aggregate. (The map-only
    formulation — 32 ``F.aggregate`` folds over a per-row hash array —
    re-inlines the char fold into every vote expression because
    projection collapse defeats common-subexpression reuse across
    aggregate lambdas: measured 30× slower. Materialize-once via explode
    IS the scalable form.) Output: (id_col, simhash long)."""
    toks = rebalance_scan(df).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    )
    hashed = toks.withColumn("__h", _portable_token_hash(F.col("__tok")))
    # expression trees built as SQL strings (one py4j call per column,
    # not one per operator): at bits=64 the Column-builder form spent
    # ~2.5 s of DRIVER time per plan construction on py4j round trips —
    # measured, and it dominated q29's bench number. Semantics
    # identical; Catalyst parses the same tree either way.
    bit_sums = [
        F.expr(
            f"sum(((__h * {2 * b + 3} + {101 * b + 29}) % {PORTABLE_MOD}) "
            f"% 2 * 2 - 1)"
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_sums)
    sig = " + ".join(
        f"shiftleft(CAST(__b{b} > 0 AS LONG), {b})" for b in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(sig).alias("simhash"))


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs colliding in any
    band are candidate near-duplicates. Output: (id_a, id_b) distinct,
    id_a < id_b.

    ``max_bucket`` caps membership of a single (band, hash) bucket:
    pair-generation cost is Σ bucket², so one mega-bucket (boilerplate
    corpora where a band of minhashes is corpus-constant) detonates even
    though the *average* bucket is tiny. Buckets over the cap are
    dropped — their members still pair through their other (bands−1)
    buckets, which is the standard banded-LSH degradation. The over-cap
    bucket list is tiny by construction, so the guard broadcasts.
    Defaults to ``"auto"`` (size-derived, :func:`_auto_max_bucket`);
    pass ``None`` for the exact unguarded candidate set.
    """
    max_bucket = _resolve_max_bucket(df, max_bucket)
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_cols = []
    for b in range(bands):
        members = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.hash(*members).alias("bh"))
        )
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    return _bucket_pairs(buckets, id_col, max_bucket)


#: floor for the size-derived bucket cap — generous at test scale (no
#: fixture bucket comes near it), tight enough to stop a mega-bucket.
MAX_BUCKET_FLOOR = 256


def _auto_max_bucket(n_docs: int) -> int:
    """Size-derived bucket cap: ``max(256, 4·⌈√n⌉)``. With cap c the
    banded self-join emits at most ``bands · n · c / 2`` pairs (each of
    the ≤ n·bands bucket rows pairs with at most c−1 bucket-mates), so
    the default bounds candidate generation at O(n^1.5) instead of the
    unguarded worst-case O(n²). Recall caveat: a pair is lost only if
    EVERY band it collides in is over-cap — genuine near-dup clusters are
    tiny next to √n, so planted-dup recall is unaffected; what the cap
    drops is boilerplate mega-buckets whose pairings are noise anyway."""
    return max(MAX_BUCKET_FLOOR, 4 * math.isqrt(max(n_docs, 0)))


def _resolve_max_bucket(df: DataFrame, max_bucket: int | str | None) -> int | None:
    """Resolve the ``max_bucket`` argument: ``"auto"`` (the default
    everywhere) derives the cap from the corpus size via
    :func:`_auto_max_bucket` — one column-pruned count over ``df``;
    ``None`` means exact/unguarded (oracle-parity callers); an int is
    used as-is."""
    if max_bucket == "auto":
        return _auto_max_bucket(df.count())
    return max_bucket  # type: ignore[return-value]


def _bucket_pairs(
    buckets: DataFrame, id_col: str, max_bucket: int | None
) -> DataFrame:
    """(id, band, bh) bucket table → distinct candidate pairs (id_a <
    id_b) via a self-equi-join on the bucket key — the shared tail of
    every banded-LSH family (murmur3 MinHash, portable MinHash, SimHash
    bands). Pair-generation cost is Σ bucket²; ``max_bucket`` drops
    mega-buckets (the over-cap list is tiny by construction → broadcast
    anti-join, no extra shuffle on the corpus-sized table)."""
    if max_bucket is not None:
        over = (
            buckets.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("band", "bh")
        )
        buckets = buckets.join(
            F.broadcast(over), on=["band", "bh"], how="left_anti"
        )
    l = buckets.select(F.col(id_col).alias("id_a"), "band", "bh")
    r = buckets.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        l.join(r, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_candidates_portable(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """LSH banding over the *portable* MinHash family
    (:func:`minhash_signatures_portable`) — same Σ bucket² candidate
    shape as :func:`minhash_candidates`, but every hash is pure int64
    arithmetic, so the full candidate set is value-verifiable against a
    DuckDB oracle. The band hash is itself portable: a polynomial fold
    bh ← (10007·bh + mh) mod p over the band's signature members (all
    intermediates < p·10007 ≈ 10^13, far inside int64).

    Production path remains :func:`minhash_candidates` (murmur3 — no
    BMP/ASCII corpus assumption); this variant exists so the oracle can
    check the banding *math* end-to-end, same role q125's portable
    signatures play for q28's murmur3 ones.
    """
    max_bucket = _resolve_max_bucket(df, max_bucket)
    buckets = minhash_band_index(df, id_col, text_col, n, num_hashes, bands)
    return _bucket_pairs(buckets, id_col, max_bucket)


def minhash_band_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """The PERSISTED-INDEX form of portable MinHash banding:
    (id, band, bh) — bands × docs rows of pure int64, the state an
    incremental dedup pipeline keeps between batches. Write it as a
    lake table partitioned/bucketed on (band, bh) and the
    batch-vs-corpus probe becomes a co-located equi-join."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures_portable_relational(
        df, id_col, text_col, n, num_hashes
    )
    band_cols = []
    for b in range(bands):
        bh = F.lit(0).cast("long")
        for r in range(rows_per_band):
            bh = (bh * F.lit(10007) + F.col(f"mh{b * rows_per_band + r}")) % F.lit(
                PORTABLE_MOD
            )
        band_cols.append(F.struct(F.lit(b).alias("band"), bh.alias("bh")))
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))


def incremental_minhash_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    new_idx: "DataFrame | None" = None,
) -> "tuple[DataFrame, DataFrame]":
    """Dedup an incoming batch against an EXISTING corpus without ever
    re-comparing corpus × corpus — the production shape at 100 TB,
    where each day's crawl dedups against all history:

    - a new doc DROPS if any of its band buckets collides with the
      persisted ``index`` (:func:`minhash_band_index` rows of the
      corpus so far), or with a SMALLER-id doc of its own batch
      (deterministic within-batch survivor rule);
    - returns ``(survivors, index_delta)`` — append ``index_delta``
      (the survivors' band rows) to the index table and the loop is
      closed: per-batch cost is O(batch × corpus-collisions), the
      corpus text is never touched again, and the index grows by
      O(survivors).

    Both joins are equi-joins on (band, bh): the corpus side ships
    only (band, hash, id) tuples — never documents — and a bucketed
    index table makes the probe co-located (zero corpus shuffle).
    Entirely portable int64 arithmetic → DuckDB-oracled end-to-end
    (q199)."""
    # the batch's band table feeds FOUR consumers (corpus probe, both
    # sides of the intra-batch probe, the index delta); lazily
    # checkpoint so the shingle hashing runs once, not four times.
    # Callers that already materialized it (the streaming loop, which
    # also collects its touched partition keys to prune the corpus-index
    # scan) pass it in as ``new_idx``.
    if new_idx is None:
        new_idx = minhash_band_index(
            new_docs, id_col, text_col, n, num_hashes, bands
        ).localCheckpoint(eager=False)
    else:
        new_idx = new_idx.select(id_col, "band", "bh")
    hit_corpus = (
        new_idx.join(index, ["band", "bh"], "left_semi")
        .select(id_col)
        .distinct()
    )
    a, b = new_idx.alias("a"), new_idx.alias("b")
    hit_batch = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
            "left_semi",
        )
        .select(f"a.{id_col}")
        .distinct()
    )
    dropped = hit_corpus.unionByName(hit_batch).distinct()
    survivors = new_docs.join(dropped, id_col, "left_anti")
    index_delta = new_idx.join(dropped, id_col, "left_anti")
    return survivors, index_delta


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 64,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """SimHash near-duplicate *pairs*: banded candidate generation +
    exact Hamming verification — the operator a SimHash dedup actually
    runs (the signature queries only produce the fingerprints).

    1. signatures — :func:`simhash_portable` (char-polynomial token
       hash → parity votes → sign-packed ``bits``-bit signature);
    2. candidates — split each signature into ``bands`` contiguous
       bit-bands; docs agreeing exactly on ≥1 band collide in an
       equi-join bucket. Pigeonhole guarantee: any pair with Hamming
       distance < ``bands`` MUST agree on at least one band, so recall
       is 100% for distance ≤ bands−1 and the join is Σ bucket², never
       n²;
    3. verify — Hamming distance via ``bit_count(sig_a XOR sig_b)``
       (one codegen'd expression per candidate), keep ≤ ``max_hamming``.

    Band-width sizing (module docstring rule, ``keys ≥ n²/target_pairs``):
    the bucket-key space is ``bands · 2^(bits/bands)``, so ``bits`` must
    be wide enough that even a uniform corpus doesn't flood the buckets.
    The default 64 bits / 4×16-bit bands = 262,144 keys (the q209 pHash
    sizing); 32/4 would give 1,024 keys — Σ bucket² ≈ n²/256, quadratic
    the moment the corpus outgrows thousands of docs. Bit 63 lands in the
    long's sign bit; band extraction uses an unsigned shift and the
    Hamming XOR is bit-pattern arithmetic, so the signed representation
    is harmless (and matches the DuckDB oracle's two's-complement BIGINT).

    Output: (id_a, id_b, hamming), id_a < id_b. Entirely portable int64
    arithmetic → DuckDB-oracled end-to-end (q29).
    """
    if bits % bands:
        raise ValueError("bits must be divisible by bands")
    max_bucket = _resolve_max_bucket(df, max_bucket)
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash_portable(df, id_col, text_col, bits)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    cand = _bucket_pairs(buckets, id_col, max_bucket)
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Train/eval n-gram decontamination: for every training document,
    how many of its distinct ``n``-gram shingles appear anywhere in the
    eval set (the classic held-out-benchmark leakage check).

    Output: ``(id_col, n_shingles, n_contaminated, contamination)`` with
    contamination = n_contaminated / n_shingles rounded to 6 digits, one
    row per train doc that has at least one shingle.

    Scale shape: the eval shingle set is the small side (benchmarks are
    MBs, corpora are TBs) → distinct-project it and let AQE broadcast;
    the train side streams through one explode + one hash-aggregate on
    the doc id. The corpus is never shuffled on text, only on (id,
    shingle-hit counts).
    """
    train_sh = shingle_table(train, id_col, text_col, n)
    eval_sh = (
        shingle_table(eval_df, id_col, text_col, n).select("shingle").distinct()
    )
    per_doc = train_sh.join(F.broadcast(eval_sh), on="shingle", how="left_semi")
    hits = per_doc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
    sizes = train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        sizes.join(hits, on=id_col, how="left")
        .withColumn(
            "n_contaminated", F.coalesce(F.col("n_contaminated"), F.lit(0))
        )
        .withColumn(
            "contamination",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6
            ),
        )
    )


def exact_substring_decontaminate(
    train: DataFrame,
    eval_snippets: DataFrame,
    id_col: str,
    text_col: str = "text",
    snippet_col: str = "snippet",
    broadcast_limit: int | None = 100_000,
    anchor_tokens: int = 8,
) -> DataFrame:
    """Exact-substring train/eval decontamination: for every training
    document, how many eval snippets appear verbatim inside it.

    The n-gram form (:func:`decontaminate`) catches paraphrase-level
    overlap; this is the strict complement — literal benchmark strings
    (answer keys, canary strings, GSM8K-style questions) embedded in a
    crawl. Output: ``(id_col, n_eval_hits, contaminated)`` for every
    training row.

    Scale shape, two regimes guarded by ``broadcast_limit``:

    - **≤ limit snippets** (the normal case — benchmarks are thousands
      of rows, never corpus-sized): broadcast nested-loop join with a
      JVM ``instr`` predicate; the corpus streams through one scan and
      the per-doc aggregate shuffles (id, count) only. No index, so
      substring match cannot miss at ANY character position — the
      contract a canary check needs.
    - **> limit snippets** (an eval union too big to broadcast — BNLJ
      would replicate it to every task and scan cost would go
      |corpus|·|snippets|): anchor-shingle pre-filter. Each snippet's
      first ``anchor_tokens`` whitespace tokens form its anchor; the
      corpus explodes into same-length token shingles once per distinct
      anchor length (≤ anchor_tokens plans), candidates come from the
      hash-partitioned equi-join on the anchor — Σ bucket² bounded like
      every other inverted-index join here — and ``instr`` verifies the
      full snippet on candidate pairs only. Both sides normalize
      whitespace identically, so the only matches this path can miss
      relative to BNLJ are NON-token-aligned ones (a snippet starting
      mid-word) — acceptable for benchmark text, and the reason the
      broadcast form stays the default contract.
    """
    # Multiplicity matters: a snippet listed twice in the eval set
    # counts twice (the q117 oracle's row semantics) — so the fallback
    # weights each distinct snippet value by its row count instead of
    # silently deduplicating.
    snips = eval_snippets.select(snippet_col)
    use_broadcast = broadcast_limit is None or snips.count() <= broadcast_limit
    if use_broadcast:
        hits = (
            train.select(id_col, text_col)
            .join(
                F.broadcast(snips),
                F.instr(F.col(text_col), F.col(snippet_col)) > 0,
                "inner",
            )
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_eval_hits"))
        )
    else:
        hits = _anchored_substring_hits(
            train, snips, id_col, text_col, snippet_col, anchor_tokens
        )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_eval_hits"), F.lit(0)).alias("n_eval_hits"),
            (F.coalesce(F.col("n_eval_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _anchored_substring_hits(
    train: DataFrame,
    snips: DataFrame,
    id_col: str,
    text_col: str,
    snippet_col: str,
    anchor_tokens: int,
) -> DataFrame:
    """Shuffle-join fallback for :func:`exact_substring_decontaminate`
    (see its docstring): anchor equi-join → candidate pairs → exact
    ``instr`` verification. Never broadcasts the snippet set and never
    replicates the corpus. Duplicate snippet rows carry a weight so the
    hit counts match the broadcast path's row semantics."""
    weights = snips.groupBy(snippet_col).agg(F.count(F.lit(1)).alias("__w"))
    anchored = (
        weights.withColumn("__toks", F.split(F.col(snippet_col), r"\s+"))
        .withColumn("__alen", F.least(F.size("__toks"), F.lit(anchor_tokens)))
        .withColumn(
            "__anchor",
            F.array_join(F.slice("__toks", F.lit(1), F.col("__alen")), " "),
        )
        .select(snippet_col, "__w", "__alen", "__anchor")
    )
    # distinct anchor lengths: ≤ anchor_tokens values, a legitimate
    # driver boundary (same class as the year lists, SURVEY §2.12)
    lengths = [r["__alen"] for r in anchored.select("__alen").distinct().collect()]
    toks = F.split(F.col(text_col), r"\s+")
    cands = None
    for j in sorted(lengths):
        doc_sh = (
            train.select(F.col(id_col), toks.alias("__toks"))
            .filter(F.size("__toks") >= j)
            .select(
                id_col,
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__toks") - F.lit(j - 1)),
                        _slice_join_lambda(j),
                    )
                ).alias("__anchor"),
            )
            .distinct()
        )
        c = doc_sh.join(
            anchored.filter(F.col("__alen") == j).select(
                snippet_col, "__w", "__anchor"
            ),
            "__anchor",
        ).select(id_col, snippet_col, "__w")
        cands = c if cands is None else cands.unionByName(c)
    return (
        cands.join(train.select(id_col, text_col), id_col)
        .filter(F.instr(F.col(text_col), F.col(snippet_col)) > 0)
        .groupBy(id_col)
        .agg(F.sum("__w").cast("long").alias("n_eval_hits"))
    )


def _slice_join_lambda(j: int):
    # closure factory: the HOF lambda must have exactly one parameter
    # (PySpark derives lambda arity from the python signature)
    return lambda i: F.array_join(F.slice(F.col("__toks"), i, j), " ")


def _sim_token_hash(col: Column, bits: int) -> Column:
    """Token hash for the murmur3/xxhash SimHash family: 32-bit murmur3
    (``F.hash``) provides only 32 usable bits — sign-extension makes bits
    32–63 copies of bit 31 — so signatures wider than 32 bits switch to
    ``F.xxhash64``. Both are JVM built-ins, codegen'd."""
    return F.xxhash64(col) if bits > 32 else F.hash(col).cast("long")


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash signature: bit b = sign(Σ_tokens (2·bit_b(h(tok)) − 1)).

    Built entirely from array expressions over the token list — stays in
    codegen, no shuffle, no UDF. Token hash: murmur3 for bits ≤ 32,
    xxhash64 beyond (:func:`_sim_token_hash`).
    """
    hashes = F.transform(tokens(text), lambda x: _sim_token_hash(x, bits))

    def _bit_merge(bit: int):
        # NB: the merge lambda must take exactly (acc, h) — PySpark counts
        # the python signature's parameters to build the HOF lambda.
        return lambda acc, h: acc + (
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) * 2 - 1
        )

    sig = F.lit(0).cast("long")
    for b in range(bits):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), _bit_merge(b))
        sig = sig + F.shiftleft((contrib > 0).cast("long"), b)
    return sig


def simhash_relational(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash via explode → per-bit conditional sums → sign-pack: the
    whole-stage-codegen formulation of ``simhash`` (bit-identical output,
    same token hash, same sign rule).

    Shape: one explode (no shuffle) + one hash-aggregate on the doc id —
    every expression is a JVM built-in, so unlike the column version
    (32 interpreted ``F.aggregate`` folds per row) this vectorizes and is
    the form to use corpus-wide. Output: (id_col, simhash long).

    NULL text matches the column form exactly: ``explode_outer`` keeps the
    row, the guarded hash keeps ``__h`` NULL (a bare ``F.hash(NULL)``
    would return the seed, not NULL), the NULL bit-sums propagate, and the
    signature comes out NULL — same as folding over a NULL token array.
    """
    toks = rebalance_scan(df).select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("__tok")
    ).withColumn(
        "__h",
        F.when(
            F.col("__tok").isNotNull(), _sim_token_hash(F.col("__tok"), bits)
        ),
    )
    # SQL-string expressions for the same reason as simhash_portable:
    # per-operator py4j round trips dominate plan-build time at 64 bits
    bit_sums = [
        F.expr(f"sum((shiftright(__h, {b}) & 1) * 2 - 1)").alias(f"__b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    sig = " + ".join(
        f"shiftleft(CAST(__b{b} > 0 AS LONG), {b})" for b in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(sig).alias("simhash"))


def near_dup_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int | str | None = "auto",
    family: str = "murmur3",
) -> DataFrame:
    """The complete near-duplicate removal pipeline in one operator —
    what an LLM corpus actually runs before training:

    1. **candidates** — MinHash LSH banding (`minhash_candidates`):
       pairs collide in ≥1 band bucket, so pair generation is
       bucket-local (Σ bucket², never n²);
    2. **verify** — exact n-gram Jaccard computed ONLY for candidate
       pairs: the candidate list joins the shingle table per side, so
       intersection counting touches candidate pairs' shingles, not the
       all-pairs shingle self-join (`jaccard_pairs` is the baseline
       form of that);
    3. **group** — verified edges (jaccard ≥ threshold) →
       `graph.connected_components` (transitive closure: A≈B≈C collapse
       together even if A,C never collided);
    4. **survive** — keep the min-id document per duplicate group.

    Returns ``df`` filtered to survivors, original columns unchanged.

    ``family`` selects the candidate signature family: ``"murmur3"``
    (default production path — JVM hashes, no corpus assumptions) or
    ``"portable"`` (:func:`minhash_candidates_portable` — pure int64
    arithmetic so the ENTIRE pipeline, candidates through survivors, is
    value-verifiable against a DuckDB oracle; q101). Verification,
    grouping and survivorship are family-independent: exact Jaccard is
    computed on the true shingle sets either way.
    """
    from march_mania_spark_lakehouse_spark.operators.graph import (
        connected_components,
    )

    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_sh"))
    cand_fn = (
        minhash_candidates_portable if family == "portable" else minhash_candidates
    )
    cand = cand_fn(
        df, id_col, text_col, n, num_hashes, bands, max_bucket=max_bucket
    )
    a_sh = cand.join(
        sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
    )
    inter = (
        a_sh.join(
            sh.select(F.col(id_col).alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__n_inter"))
    )
    edges = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("__n_sh").alias("__n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("__n_sh").alias("__n_b")),
            "id_b",
        )
        .withColumn(
            "__j",
            F.col("__n_inter").cast("double")
            / (F.col("__n_a") + F.col("__n_b") - F.col("__n_inter")),
        )
        .filter(F.col("__j") >= threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    comp = connected_components(edges)
    # survivor = min node per component; min-label components already
    # carry that as the component id, so survivors are nodes whose label
    # is their own id — plus every document not in any duplicate pair.
    dup_losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(dup_losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# Cross-document segment-level dedup (C4 / RefinedWeb line dedup, adapted
# to the fixture's single-line documents: the dedup unit is a K-word
# non-overlapping segment instead of a newline-delimited line).
# --------------------------------------------------------------------------

def segment_table(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, seg_idx, seg): non-overlapping K-word segments per document,
    built with array ops (sequence → slice → array_join) so segmentation
    is partition-local — no shuffle, no Python. The trailing segment may
    be shorter than K."""
    toks = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    return df.select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    ).withColumn("seg_idx", F.col("seg_idx").cast("long"))


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    max_docs: int = 2,
) -> DataFrame:
    """C4-style cross-document duplicate-segment removal: any K-word
    segment occurring in more than ``max_docs`` distinct documents is
    dropped from every document except its canonical first occurrence
    (smallest ``(doc_id, seg_idx)``), then documents are reassembled in
    segment order. Documents whose every segment was removed disappear
    (standard filter-pipeline semantics). Returns (id, text).

    Scale posture: the segment-stats aggregate shuffles segment text
    once (like the shingle table — at corpus scale, hash the segment and
    aggregate 8-byte keys instead); the hot-segment set is by
    construction small (df > max_docs survivors only) so the eligibility
    join broadcasts, and reassembly is the only full-text shuffle. The
    same rule can run text-shuffle-free as a broadcast-set filter inside
    ``mapInPandas`` when documents must stay partition-local.
    """
    segs = segment_table(rebalance_scan(df), id_col, text_col, k)
    # Canonical first occurrence = lexicographic min over the
    # (doc_id, seg_idx) struct — no packed-integer key, so any doc-id
    # domain (negative, beyond 1e6 segments) picks the right survivor.
    hot = (
        segs.groupBy("seg")
        .agg(
            F.countDistinct(id_col).alias("__nd"),
            F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("__min_occ"),
        )
        .filter(F.col("__nd") > max_docs)
        .select("seg", "__min_occ")
    )
    kept = segs.join(F.broadcast(hot), on="seg", how="left").filter(
        F.col("__min_occ").isNull()
        | (
            (F.col(id_col) == F.col("__min_occ").getField(id_col))
            & (F.col("seg_idx") == F.col("__min_occ").getField("seg_idx"))
        )
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias(text_col)
        )
    )
