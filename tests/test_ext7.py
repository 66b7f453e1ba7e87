"""Unit tests for the seventh extension batch: exact-substring
decontamination, vocabulary Jaccard, bigram-LM scoring, OOV coverage.
Planted-case tests on tiny frames — the oracle parity lives in
tools/driver_sim.py / tests/test_oracle_parity.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.operators import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_decontam_hits_and_misses(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "the CANARY STRING hides here"),
            (3, "clean document nothing to see"),
            (4, "prefix CANARY STRING suffix and another needle too"),
        ],
    )
    snippets = spark.createDataFrame(
        [("CANARY STRING",), ("another needle",)], "snippet string"
    )
    out = {
        r.doc_id: (r.n_eval_hits, r.contaminated)
        for r in dedup.exact_substring_decontaminate(
            train, snippets, "doc_id"
        ).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    assert out[3] == (0, False)
    assert out[4] == (2, True)  # both snippets present
    assert len(out) == 4  # every training row reported


def test_exact_substring_fallback_matches_broadcast(spark):
    """broadcast_limit=0 forces the anchor-shingle shuffle-join path;
    on token-aligned contamination (the benchmark case) it must agree
    exactly with the broadcast nested-loop form — including multi-hit
    docs, snippets shorter than anchor_tokens, and clean docs."""
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "the CANARY STRING hides here among many other words indeed"),
            (3, "clean document nothing to see move along now"),
            (4, "prefix CANARY STRING suffix and another needle too"),
            (5, "short hit"),
        ],
    )
    snippets = spark.createDataFrame(
        [
            ("CANARY STRING",),            # 2 tokens < anchor_tokens
            ("CANARY STRING",),            # duplicate: counts TWICE (row semantics)
            ("another needle",),
            ("short hit",),                # whole-document match
            ("gamma delta epsilon zeta eta theta iota kappa",),  # 8 = anchor len
        ],
        "snippet string",
    )
    want = sorted(
        tuple(r)
        for r in dedup.exact_substring_decontaminate(
            train, snippets, "doc_id"
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in dedup.exact_substring_decontaminate(
            train, snippets, "doc_id", broadcast_limit=0
        ).collect()
    )
    assert got == want
    # and the planted expectations hold through the fallback path
    m = {t[0]: (t[1], t[2]) for t in got}
    assert m[1] == (1, True) and m[2] == (2, True)
    assert m[3] == (0, False) and m[4] == (3, True) and m[5] == (1, True)


def test_vocab_jaccard_known_overlap(spark):
    df = spark.createDataFrame(
        [
            ("s1", "a b c d"),
            ("s2", "c d e f"),
            ("s3", "x y"),
        ],
        "source string, text string",
    )
    out = {
        (r.group_a, r.group_b): (r.n_inter, r.jaccard)
        for r in text.vocab_jaccard(df, "source").collect()
    }
    # |{a b c d} ∩ {c d e f}| = 2, union = 6
    assert out[("s1", "s2")] == (2, round(2 / 6, 6))
    # disjoint vocabularies never produce a pair row (inner join on token)
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b", "a b", "a c" → c(a·)=3, P(b|a)=2/3, P(c|a)=1/3
    df = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in text.bigram_logprob_scores(df, "doc_id").collect()
    }
    assert out[1] == (1, round(round(math.log(2 / 3), 10), 6))
    assert out[3] == (1, round(round(math.log(1 / 3), 10), 6))


def test_bigram_logprob_skips_short_docs(spark):
    df = _docs(spark, [(1, "solo"), (2, "a b")])
    rows = text.bigram_logprob_scores(df, "doc_id").collect()
    assert {r.doc_id for r in rows} == {2}  # 1-token doc has no bigrams


def test_oov_rate_against_topk_vocab(spark):
    # token counts: a×4, b×2, c×1, z×1 → top-2 vocab (count desc, token
    # asc tiebreak) = {a, b}; c and z are OOV
    df = _docs(spark, [(1, "a a b c"), (2, "a a b z")])
    out = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
        for r in text.oov_stats(df, "doc_id", k=2).collect()
    }
    assert out[1] == (4, 1, 0.25)
    assert out[2] == (4, 1, 0.25)


def test_top_vocab_deterministic_tiebreak(spark):
    # equal counts break by token ascending
    df = _docs(spark, [(1, "b a"), (2, "a b"), (3, "c c c")])
    vocab = [r.token for r in text.top_vocab(df, "doc_id", k=2).collect()]
    assert vocab == ["c", "a"]


def test_exact_substring_scan_has_no_python_workers(spark):
    """The contamination predicate must stay JVM-side (instr in a
    BroadcastNestedLoopJoin), never a Python eval node."""
    train = _docs(spark, [(1, "x y z")])
    snippets = spark.createDataFrame([("y",)], "snippet string")
    plan = (
        dedup.exact_substring_decontaminate(train, snippets, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_portable_minhash_detects_planted_dups(spark):
    """Identical texts must produce identical signatures; a near-dup
    (one token changed) must agree on most components; an unrelated doc
    must not."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("lazy", "busy")
    other = "completely different content about spark shuffles and parquet files"
    df = _docs(spark, [(1, base), (2, base), (3, near), (4, other)])
    sig = {
        r.doc_id: [r[f"mh{s}"] for s in range(8)]
        for r in dedup.minhash_signatures_portable(
            df, "doc_id", num_hashes=8
        ).collect()
    }
    assert sig[1] == sig[2]
    agree_near = sum(a == b for a, b in zip(sig[1], sig[3]))
    agree_other = sum(a == b for a, b in zip(sig[1], sig[4]))
    assert agree_near >= 4  # high Jaccard → most minhashes agree
    assert agree_other == 0


def test_portable_minhash_is_map_only(spark):
    """The portable signature plan must contain no Exchange — signatures
    stream straight out of the scan."""
    df = _docs(spark, [(1, "a b c d e")])
    plan = (
        dedup.minhash_signatures_portable(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_token_entropy_hand_computed(spark):
    """Uniform distribution over k tokens → ln(k); single repeated
    token → 0."""
    import math

    from march_mania_spark_lakehouse_spark.plans import all_queries

    # run the registered query shape on a tiny in-memory table via the
    # operator's own building blocks
    from march_mania_spark_lakehouse_spark.operators import text as t

    df = _docs(spark, [(1, "a b c d"), (2, "x x x x")])
    toks = t.token_table(df, "doc_id")
    cnt = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 10).cast("decimal(24,10)")
    out = {
        r.doc_id: r.e
        for r in cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("e"))
        .collect()
    }
    assert out[1] == round(4 * round(0.25 * math.log(4), 10), 6)
    assert out[2] == 0.0
