"""Operator-level property tests (SURVEY.md §5 strategy): invariants the
oracle can't see — group cardinality, frame edge cases, signature
determinism, candidate-set containment."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import core, dedup, joins, setops, similarity
from march_mania_spark_lakehouse_spark.operators import text as text_ops


def test_explode_roles_doubles_rows(spark, sf_dir):
    """Long-table explosion yields exactly 2 rows per input row (U1)."""
    li = catalog.load(spark, "lineitem", sf_dir)
    long_t = setops.explode_roles(
        li,
        [
            [F.col("l_suppkey").alias("party"), F.lit("s").alias("role")],
            [F.col("l_partkey").alias("party"), F.lit("p").alias("role")],
        ],
    )
    assert long_t.count() == 2 * li.count()


def test_latest_per_group_is_unique_per_key(spark, sf_dir):
    orders = catalog.load(spark, "orders", sf_dir)
    latest = core.latest_per_group(
        orders, ["o_custkey"], [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()]
    )
    dup = latest.groupBy("o_custkey").count().filter(F.col("count") > 1).count()
    assert dup == 0
    assert latest.count() == orders.select("o_custkey").distinct().count()


def test_causal_rolling_first_row_is_null(spark, sf_dir):
    """Frame (-n, -1) excludes the current row → first row per group null."""
    ev = catalog.load(spark, "events", sf_dir)
    rolled = core.causal_rolling_avg(
        ev, ["user_id"], ["ts", "event_id"], "value", 10, "roll"
    )
    firsts = core.latest_per_group(
        rolled, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()]
    )
    assert firsts.filter(F.col("roll").isNotNull()).count() == 0


def test_topk_bounded_and_ordered(spark, sf_dir):
    orders = catalog.load(spark, "orders", sf_dir)
    top3 = core.topk_per_group(
        orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )
    over = top3.groupBy("o_custkey").count().filter(F.col("count") > 3).count()
    assert over == 0


def test_semi_plus_anti_partition_left(spark, sf_dir):
    """semi(L, R) ∪ anti(L, R) == L, disjointly."""
    cust = catalog.load(spark, "customer", sf_dir)
    hi = catalog.load(spark, "orders", sf_dir).filter(
        F.col("o_totalprice") > 450000
    ).select(F.col("o_custkey").alias("c_custkey"))
    n_semi = joins.semi_join(cust, hi, ["c_custkey"]).count()
    n_anti = joins.anti_join(cust, hi, ["c_custkey"]).count()
    assert n_semi + n_anti == cust.count()


def test_exact_dedup_finds_planted_duplicates(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "unrelated text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup.exact_dedup_groups(df, ["text"], "doc_id")
    dup = {r["text"]: (r["keep_doc_id"], r["n_copies"]) for r in groups.collect()}
    assert dup["alpha beta gamma"] == (1, 2)
    assert dup["unrelated text here"] == (3, 1)
    survivors = dedup.dedup_keep_first(df, ["text"], "doc_id")
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 3]


def test_ngram_shingles_short_text_is_empty(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "a b c d")], "id long, text string")
    sh = df.select("id", dedup.ngram_shingles("text", 3).alias("sh")).collect()
    by_id = {r["id"]: r["sh"] for r in sh}
    assert by_id[1] == []
    assert by_id[2] == ["a b c", "b c d"]


def test_minhash_candidates_contain_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base + " ok"), (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidates(df, "doc_id", num_hashes=16, bands=8).collect()
    }
    assert (1, 2) in cands


def test_hot_shingle_max_df_bounds_jaccard_candidates(spark):
    """A corpus-wide boilerplate sentence ("stop shingles") pairs every
    doc with every other in the unguarded shingle self-join (~n²/2);
    max_df drops the hot shingles, keeping only genuinely-similar pairs."""
    boiler = "terms of service apply to all users of this site always"
    rows = [
        (i, f"{boiler} unique{i} content{i} token{i} body{i} words{i}")
        for i in range(40)
    ]
    rows[1] = (1, rows[0][1] + " tiny")  # doc1 = doc0 + suffix: true near-dup
    df = spark.createDataFrame(rows, "doc_id long, text string")

    unguarded = dedup.jaccard_pairs(df, "doc_id", n=3).count()
    assert unguarded >= 40 * 39 / 2  # every pair collides via boilerplate

    guarded = dedup.jaccard_pairs(df, "doc_id", n=3, max_df=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in guarded.collect()}
    assert set(got) == {(0, 1)}  # candidates bounded: only the planted pair
    assert got[(0, 1)] > 0.5  # and it survives with high similarity


def test_max_bucket_caps_lsh_mega_buckets(spark):
    """30 identical docs put 30 members in every band bucket (Σ bucket²
    blowup); max_bucket drops those buckets while an under-cap 5-copy
    group still pairs normally."""
    rows = [(i, "common boilerplate text repeated across the whole corpus") for i in range(30)]
    rows += [(100 + i, "a small cluster of five near identical documents here") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    free = dedup.minhash_candidates(df, "doc_id", num_hashes=16, bands=4)
    assert free.count() == 30 * 29 / 2 + 5 * 4 / 2  # all-pairs in each clone group

    capped = dedup.minhash_candidates(
        df, "doc_id", num_hashes=16, bands=4, max_bucket=10
    )
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert pairs == {
        (100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)
    }  # mega-bucket dropped, small bucket intact


def test_minhash_candidates_portable_planted_near_dup(spark):
    """The portable int64 banding family finds the same planted near-dup
    the murmur3 family does (q28's oracled path)."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base + " ok"), (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_candidates_portable(
            df, "doc_id", num_hashes=16, bands=8
        ).collect()
    }
    assert (1, 2) in cands


def test_simhash_candidates_recall_guarantee(spark):
    """Pigeonhole property of the banded SimHash join: EVERY pair with
    Hamming distance ≤ bands−1 must surface as a candidate (they agree
    exactly on ≥1 band), and every emitted pair's hamming is the true
    bit_count(xor) of the portable signatures."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} tail{i} more{i} words{i}") for i in range(20)]
    rows += [(100, base + " shared suffix here"), (101, base + " shared suffix here"),
             (102, base + " shared suffix there")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_portable(df, "doc_id", bits=32).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidates(
            df, "doc_id", bits=32, bands=4, max_hamming=3
        ).collect()
    }
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sigs[a] ^ sigs[b]).count("1")
            if d <= 3:  # bands−1 ⇒ guaranteed recall; ≤ max_hamming ⇒ kept
                assert got[(a, b)] == d, (a, b, d)
    for (a, b), h in got.items():
        assert h == bin(sigs[a] ^ sigs[b]).count("1") and h <= 3


def test_near_dup_dedup_portable_collapses_transitive_chain(spark):
    """family="portable" (q101's oracled path) collapses a planted
    transitive A≈B≈C chain to the min-id survivor, like the murmur3
    default."""
    base = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, base + " alpha beta"),
        (2, base + " alpha gamma"),   # ≈1
        (3, base + " delta gamma"),   # ≈2, transitively ≈1
        (9, "totally unrelated content with distinct vocabulary throughout"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in dedup.near_dup_dedup(
            df, "doc_id", threshold=0.5, num_hashes=8, bands=4,
            family="portable",
        ).collect()
    }
    assert kept == {1, 9}


def test_simhash_deterministic_and_close_for_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base + " ok"), (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = df.select("doc_id", dedup.simhash("text").alias("s"))
    a = {r["doc_id"]: r["s"] for r in sig.collect()}
    b = {r["doc_id"]: r["s"] for r in sig.collect()}
    assert a == b  # deterministic

    def hamming(x: int, y: int) -> int:
        return bin(x ^ y).count("1")

    assert hamming(a[1], a[2]) < hamming(a[1], a[3])


def test_simhash_portable_64bit_matches_python_reference(spark):
    """Pin the 64-bit sign-pack (bit 63 lands in the long's SIGN bit —
    the q29 default after the 32→64 band-width fix): simhash_portable at
    bits=64 must equal a character-level pure-Python reimplementation,
    interpreted as two's-complement int64."""
    p = dedup.PORTABLE_MOD

    def py_simhash(text: str, bits: int = 64) -> int:
        votes = [0] * bits
        for tok in text.split(" "):
            h = 0
            for c in tok:
                h = (h * 131 + ord(c)) % p
            for b in range(bits):
                g = (h * (2 * b + 3) + (101 * b + 29)) % p
                votes[b] += 1 if g % 2 else -1
        sig = sum(1 << b for b in range(bits) if votes[b] > 0)
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
        (4, "zz zy zx zw zv zu zt zs zr zq zp zo"),  # many short tokens
        (5, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_portable(df, "doc_id", bits=64).collect()
    }
    assert got == {i: py_simhash(t) for i, t in rows}
    # the corpus must actually exercise the sign bit, or this test pins
    # nothing new over the 32-bit one
    assert any(v < 0 for v in got.values())


def test_simhash_candidates_64bit_default_and_bands(spark):
    """The 64-bit default (4×16-bit bands): planted near-dups still
    surface, and emitted hammings are true bit_count(xor) of the 64-bit
    signatures — including pairs whose signatures differ in sign."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"{base} tail{i} extra{i}") for i in range(10)]
    rows += [(100, base + " shared suffix here"), (101, base + " shared suffix here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_portable(df, "doc_id", bits=64).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidates(df, "doc_id", max_hamming=8).collect()
    }
    assert (100, 101) in got and got[(100, 101)] == 0
    for (a, b), h in got.items():
        assert h == bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        assert h <= 8


def test_auto_max_bucket_sizing():
    """The size-derived cap: floor of 256 at test scale, 4·√n beyond."""
    assert dedup._auto_max_bucket(0) == 256
    assert dedup._auto_max_bucket(4096) == 256
    assert dedup._auto_max_bucket(10**9) == 4 * 31622
    assert dedup._auto_max_bucket(10**12) == 4 * 10**6


def test_lsh_topk_recall_against_bruteforce(spark, sf_dir):
    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_bruteforce(emb, q, k=5)
    approx = similarity.cosine_topk_lsh(emb, q, k=5, n_planes=3, n_tables=8)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"
    # approx scores, where present, must equal the exact scores
    es = {(r["q_id"], r["c_id"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["q_id"], r["c_id"])
        if key in es:
            assert es[key] == pytest.approx(r["cosine"], abs=1e-9)


def test_ivf_topk_recall_against_bruteforce(spark, sf_dir):
    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_bruteforce(emb, q, k=5)
    approx = similarity.cosine_topk_ivf(emb, q, k=5, n_cells=16, n_probe=8)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_embedding_near_dup_finds_planted_pair(spark):
    v = [1.0] * 8
    near = [1.0] * 7 + [0.9]
    far = [1.0, -1.0] * 4
    df = spark.createDataFrame(
        [(1, v), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup(df, threshold=0.9).collect()
    }
    assert (1, 2) in pairs and all(3 not in p for p in pairs)


def test_bpe_tokens_split_punctuation_and_digits(spark):
    df = spark.createDataFrame([(1, "don't stop, it's 42 laps!")], "i long, text string")
    row = df.select(text_ops.bpe_tokens("text").alias("t")).first()
    assert row["t"] == ["don", "'t", "stop", ",", "it", "'s", "42", "laps", "!"]


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    from march_mania_spark_lakehouse_spark.plans import all_queries

    rows = all_queries()["q61_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"]
        assert rel_err < 0.1, f"{r['l_returnflag']}: {rel_err}"


def test_embedding_near_dup_batch_with_high_ids(spark):
    """Regression: new arrivals carry the HIGHEST ids — batch mode must
    still pair them with older (smaller-id) corpus rows."""
    v = [1.0] * 8
    near = [1.0] * 7 + [0.9]
    corpus = spark.createDataFrame(
        [(1, v), (2, [1.0, -1.0] * 4), (1000, near)],
        "vec_id long, embedding array<float>",
    )
    batch = corpus.filter(F.col("vec_id") == 1000)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_near_dup(
            corpus, threshold=0.9, batch=batch
        ).collect()
    }
    assert (1, 1000) in pairs


def test_vectorized_topk_matches_exact_baseline(spark, sf_dir):
    """The BLAS-scored path must return the same top-k pairs as the
    bit-exact interpreted baseline (scores agree to rounding)."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_bruteforce(emb, q, k=5)
    fast = similarity.cosine_topk_vectorized(emb, q, k=5)
    e = {(r["q_id"], r["c_id"]): r["cosine"] for r in exact.collect()}
    f = {(r["q_id"], r["c_id"]): r["cosine"] for r in fast.collect()}
    assert set(e) == set(f)
    for key in e:
        assert abs(e[key] - f[key]) < 1e-9, key


def test_simhash_relational_matches_column_version(spark, sf_dir):
    """The codegen (explode+agg) SimHash must be bit-identical to the
    higher-order-function column version — including NULL and empty
    text, where both forms must agree (NULL sig / empty-token sig)."""
    docs = (
        catalog.load(spark, "documents", sf_dir)
        .limit(200)
        .select("doc_id", "text")
        .unionAll(
            spark.createDataFrame(
                [(10_000_001, None), (10_000_002, ""), (10_000_003, "  ")],
                "doc_id long, text string",
            )
        )
    )
    col_ver = {
        r["doc_id"]: r["s"]
        for r in docs.select("doc_id", dedup.simhash("text").alias("s")).collect()
    }
    rel_ver = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_relational(docs, "doc_id").collect()
    }
    assert col_ver == rel_ver
    assert len(rel_ver) == 203  # NULL-text row survives explode_outer

    # 64-bit family (xxhash64 token hash): same bit-identity, and the
    # upper 32 bits must actually carry signal (not a sign-extension of
    # bit 31, the failure mode _sim_token_hash exists to prevent)
    col64 = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", dedup.simhash("text", bits=64).alias("s")
        ).collect()
    }
    rel64 = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_relational(docs, "doc_id", bits=64).collect()
    }
    assert col64 == rel64
    uppers = {
        (v >> 32) & 0xFFFFFFFF for v in rel64.values() if v is not None
    }
    assert len(uppers) > 100  # degenerate sign-extension would give ≤2


def test_hash_split_deterministic_disjoint_exhaustive(spark, sf_dir):
    """Split labels are a pure function of doc_id: stable across runs,
    every row labeled, proportions near the 98/1/1 weights."""
    from march_mania_spark_lakehouse_spark.operators import sampling

    docs = catalog.load(spark, "documents", sf_dir).select("doc_id")
    a = {r["doc_id"]: r["split"] for r in sampling.hash_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.hash_split(docs, "doc_id").collect()}
    assert a == b
    assert None not in a.values()  # exhaustive: every bucket < 100 labeled
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.9 * n <= train <= n  # 98% weight, small-sample tolerance


def test_quota_sample_cardinality_and_membership(spark, sf_dir):
    """≤ n rows per group, and the selected rows are exactly the top-n
    under the (quality desc, doc_id) order."""
    from march_mania_spark_lakehouse_spark.operators import sampling

    docs = catalog.load(spark, "documents", sf_dir)
    scored = docs.select(
        "lang", "doc_id", text_ops.quality_score("text").alias("q")
    )
    sample = sampling.quota_sample(
        scored, ["lang"], [F.col("q").desc(), F.col("doc_id").asc()], 5
    ).collect()
    by_lang: dict = {}
    for r in sample:
        by_lang.setdefault(r["lang"], []).append((r["q"], r["doc_id"]))
    full = scored.collect()
    expect: dict = {}
    for r in full:
        expect.setdefault(r["lang"], []).append((r["q"], r["doc_id"]))
    for lang, rows in expect.items():
        top = sorted(rows, key=lambda t: (-t[0], t[1]))[:5]
        assert sorted(by_lang[lang]) == sorted(top), lang
        assert len(by_lang[lang]) <= 5


def test_pack_bins_matches_serial_recompute(spark, sf_dir):
    """Bin assignment equals a serial per-shard exclusive-prefix-sum
    recompute (concat-then-chunk semantics, first doc in bin 0)."""
    from march_mania_spark_lakehouse_spark.operators import sampling

    docs = catalog.load(spark, "documents", sf_dir)
    toks = docs.select("doc_id", text_ops.token_count("text").cast("long").alias("n_tok"))
    packed = {
        r["doc_id"]: (r["shard"], r["bin"])
        for r in sampling.pack_bins(toks, "doc_id", "n_tok", 2048, 1000).collect()
    }
    rows = sorted((r["doc_id"], r["n_tok"]) for r in toks.collect())
    shards: dict = {}
    for doc_id, n_tok in rows:
        shards.setdefault(doc_id // 1000, []).append((doc_id, n_tok))
    for shard, members in shards.items():
        cum = 0
        for doc_id, n_tok in members:  # already id-sorted
            assert packed[doc_id] == (shard, cum // 2048), doc_id
            cum += n_tok


def test_vectorized_similarity_survives_empty_partitions(spark):
    """A corpus smaller than the partition count produces empty Arrow
    batches; the vectorized bucket/score UDFs must not crash on them."""
    from march_mania_spark_lakehouse_spark.operators import similarity

    rows = [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(8)]) for i in range(6)]
    tiny = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(32)
    out = similarity.cosine_topk_lsh(
        tiny, tiny.filter("vec_id < 2"), k=2, dim=8, n_planes=2, n_tables=4
    )
    assert out.count() >= 0  # forces execution through every partition
    vec = similarity.cosine_topk_vectorized(tiny, tiny.filter("vec_id < 2"), k=2)
    assert vec.count() >= 0


def test_pq_topk_recall_and_exact_rerank_scores(spark, sf_dir):
    """PQ-ADC + exact re-rank: recall vs brute force stays high and —
    because the shortlist is re-scored exactly — every returned score
    equals the brute-force score bit-for-bit. Codes must be m bytes of
    information (int in [0, k))."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = similarity.cosine_topk_bruteforce(emb, q, k=5)
    approx = similarity.cosine_topk_pq(emb, q, k=5, m=16, n_centroids=32)
    e = {(r["q_id"], r["c_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["c_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"PQ recall collapsed: {recall}"
    es = {(r["q_id"], r["c_id"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["q_id"], r["c_id"])
        if key in es:
            assert es[key] == pytest.approx(r["cosine"], abs=1e-9)

    books = similarity.pq_train(emb, m=16, k=32)
    codes = similarity.pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 16 for r in codes)
    assert all(0 <= c < 32 for r in codes for c in r["codes"])
    # determinism: same codebooks -> same codes
    again = similarity.pq_encode(emb, books).collect()
    assert {r["vec_id"]: list(r["codes"]) for r in codes} == {
        r["vec_id"]: list(r["codes"]) for r in again
    }


def test_segment_dedup_drops_hot_segment_keeps_canonical(spark):
    """A 5-word segment planted in 3 documents (max_docs=2) must vanish
    from all but its smallest-(doc_id, seg_idx) occurrence; unique
    segments and under-threshold repeats survive untouched; a document
    that was entirely the hot segment disappears."""
    hot = "aa bb cc dd ee"
    rows = [
        (1, hot + " one two three four five"),
        (2, "x y z w v " + hot),
        (3, hot),
        (4, "solo words only here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in dedup.segment_dedup(df, "doc_id", "text", k=5, max_docs=2).collect()
    }
    assert out[1] == hot + " one two three four five"  # canonical keeps it
    assert out[2] == "x y z w v"  # hot tail removed
    assert 3 not in out  # fully-hot doc vanishes
    assert out[4] == "solo words only here now"


def test_segment_dedup_negative_and_huge_doc_ids(spark):
    """Canonical pick is the lexicographic min over (doc_id, seg_idx) —
    ids outside the old packed-key envelope (negative, > 1e6-segment
    scale) must still keep exactly the first occurrence (regression:
    the key was once doc_id*1e6+seg_idx, wrong for these domains)."""
    hot = "aa bb cc dd ee"
    rows = [
        (-7, "p q r s t " + hot),       # smallest doc_id: canonical
        (3_000_000_000, hot + " z y x w v"),
        (5, hot),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in dedup.segment_dedup(df, "doc_id", "text", k=5, max_docs=2).collect()
    }
    assert out[-7] == "p q r s t " + hot  # canonical occurrence kept
    assert out[3_000_000_000] == "z y x w v"
    assert 5 not in out


def test_segment_dedup_identity_when_under_threshold(spark):
    """With max_docs >= corpus size nothing is hot, so reassembly must
    be byte-identical to the input (the reassemble path itself cannot
    reorder or mangle segments)."""
    rows = [(i, f"w{i} a b c d e f g h i j k l") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.segment_dedup(df, "doc_id", "text", k=5, max_docs=10)
    assert {(r["doc_id"], r["text"]) for r in out.collect()} == set(rows)


def test_semantic_dedup_drops_planted_near_duplicate(spark):
    """Two near-identical vectors in the same sign cell: the higher id
    is dropped, the lower survives; an orthogonal cell-mate and a
    different-cell vector survive."""
    rows = [
        (10, [1.0, 1.0, 1.0, 1.0, 0.0, 0.0]),
        (20, [1.0, 1.0, 1.0, 0.9, 0.01, 0.0]),  # cos ≈ 0.99 with id 10
        (30, [0.0, 0.0, 0.0, 0.0, 1.0, 1.0]),   # same cell, orthogonal
        (40, [-1.0, 1.0, 1.0, 1.0, 0.0, 0.0]),  # different sign cell
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.semantic_dedup(
        df, "vec_id", "embedding", sign_dims=4, threshold=0.35
    )
    kept = {r["vec_id"]: r["cell"] for r in out.collect()}
    assert set(kept) == {10, 30, 40}
    assert kept[10] == kept[30] == 0b1111
    assert kept[40] == 0b0111
