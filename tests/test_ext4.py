"""Unit invariants for the corpus-curation batch (q87–q92):
decontamination, repetition signals, chunking, deterministic shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark.operators.dedup import decontaminate
from march_mania_spark_lakehouse_spark.operators.text import (
    chunk_text,
    with_repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDecontaminate:
    def test_self_decontamination_is_total(self, spark):
        """Every shingle of a doc evaluated against itself is leaked."""
        df = _docs(spark, [(1, "a b c d e f"), (2, "g h i j k l")])
        out = decontaminate(df, df, "doc_id", "text", n=3).collect()
        assert len(out) == 2
        for r in out:
            assert r.n_contaminated == r.n_shingles
            assert r.contamination == 1.0

    def test_disjoint_vocab_is_clean(self, spark):
        train = _docs(spark, [(1, "a b c d e")])
        ev = _docs(spark, [(9, "v w x y z")])
        r = decontaminate(train, ev, "doc_id", "text", n=3).collect()[0]
        assert r.n_contaminated == 0 and r.contamination == 0.0

    def test_partial_overlap_counts_shared_shingles(self, spark):
        # train doc shingles: {a b c, b c d}; eval contains "a b c" only.
        train = _docs(spark, [(1, "a b c d")])
        ev = _docs(spark, [(9, "a b c")])
        r = decontaminate(train, ev, "doc_id", "text", n=3).collect()[0]
        assert (r.n_shingles, r.n_contaminated) == (2, 1)
        assert r.contamination == 0.5


class TestRepetitionSignals:
    def test_pure_repetition(self, spark):
        df = _docs(spark, [(1, "a a a a")])
        r = with_repetition_signals(df, "doc_id").collect()[0]
        assert r.n_tokens == 4
        assert r.top_token_frac == 1.0
        # bigrams: [a a, a a, a a] -> 1 distinct of 3
        assert r.dup_bigram_frac == round(1 - 1 / 3, 6)

    def test_all_unique(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        r = with_repetition_signals(df, "doc_id").collect()[0]
        assert r.dup_bigram_frac == 0.0
        assert r.top_token_frac == 0.25

    def test_single_token_doc(self, spark):
        r = with_repetition_signals(_docs(spark, [(1, "a")]), "doc_id").collect()[0]
        assert (r.n_tokens, r.dup_bigram_frac, r.top_token_frac) == (1, 0.0, 1.0)

    def test_max_token_count_matches_explode_plan(self, spark):
        """The array-local max-run-length fold must agree with the naive
        explode → groupBy(doc, token) → max(count) plan, including ties
        and a most-frequent token that sorts first/last."""
        from collections import Counter

        texts = [
            "b a b a b",          # tie-free, winner sorts last
            "a b a b a",          # winner sorts first
            "x y x y",            # exact tie
            "z",                  # singleton
            "m m m m m m",        # all same
            "q w e r t y u i o",  # all distinct
        ]
        df = _docs(spark, list(enumerate(texts)))
        got = {
            r.doc_id: r
            for r in with_repetition_signals(df, "doc_id").collect()
        }
        for i, text in enumerate(texts):
            toks = text.split(" ")
            expect_top = max(Counter(toks).values())
            assert got[i].n_tokens == len(toks)
            assert got[i].top_token_frac == round(expect_top / len(toks), 6)


class TestChunkText:
    def test_covers_text_exactly_with_overlap(self, spark):
        text = "x" * 250
        df = _docs(spark, [(1, text)])
        rows = chunk_text(df, "doc_id", chunk_size=100, stride=80).collect()
        # starts 1, 81, 161 -> 3 chunks; last one reaches char 250.
        assert [r.chunk_id for r in sorted(rows, key=lambda r: r.chunk_id)] == [0, 1, 2]
        last = max(rows, key=lambda r: r.chunk_id)
        assert last.chunk_id * 80 + last.chunk_len == 250

    def test_short_text_single_chunk(self, spark):
        rows = chunk_text(
            _docs(spark, [(1, "hello")]), "doc_id", chunk_size=100, stride=80
        ).collect()
        assert len(rows) == 1
        assert rows[0].chunk_text == "hello" and rows[0].chunk_len == 5

    def test_no_overlap_partitions_text(self, spark):
        text = "abcdefghij" * 7  # 70 chars
        rows = chunk_text(
            _docs(spark, [(1, text)]), "doc_id", chunk_size=30, stride=30
        ).collect()
        rows = sorted(rows, key=lambda r: r.chunk_id)
        assert "".join(r.chunk_text for r in rows) == text
        assert sum(r.chunk_len for r in rows) == 70

    def test_reconstruction_from_strided_prefixes(self, spark):
        text = "the quick brown fox jumps over the lazy dog and runs away fast"
        rows = sorted(
            chunk_text(
                _docs(spark, [(1, text)]), "doc_id", chunk_size=20, stride=15
            ).collect(),
            key=lambda r: r.chunk_id,
        )
        rebuilt = "".join(r.chunk_text[:15] for r in rows[:-1]) + rows[-1].chunk_text
        assert rebuilt == text

    def test_invalid_stride_raises(self, spark):
        with pytest.raises(ValueError):
            chunk_text(_docs(spark, [(1, "x")]), "doc_id", chunk_size=10, stride=11)
        with pytest.raises(ValueError):
            chunk_text(_docs(spark, [(1, "x")]), "doc_id", chunk_size=10, stride=0)


class TestCorpusShuffle:
    def test_rank_is_permutation_and_deterministic(self, spark, sf_dir):
        from march_mania_spark_lakehouse_spark.plans import all_queries

        q = all_queries()["q90_corpus_shuffle"]
        a = q.fn(spark, sf_dir)
        n = a.count()
        assert a.select("shuffle_rank").distinct().count() == n
        assert a.agg(F.min("shuffle_rank"), F.max("shuffle_rank")).first() == (1, n)
        b = {r.doc_id: r.shuffle_rank for r in q.fn(spark, sf_dir).collect()}
        assert {r.doc_id: r.shuffle_rank for r in a.collect()} == b


def test_learn_bpe_merges_golden_and_deterministic(spark):
    """Distributed BPE learning reproduces the textbook merge sequence
    on the classic low/lower/newest corpus, the application operator
    tokenizes accordingly, and re-learning gives identical merges
    (lexicographic tie-break => partitioning-independent)."""
    from march_mania_spark_lakehouse_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower newest"),
            (3, "newest newest newest widest"),
        ],
        "doc_id long, text string",
    )
    merges = T.learn_bpe_merges(df, n_merges=6)
    assert merges[:2] == [("l", "o"), ("lo", "w")]  # 'low'×7 dominates
    assert ("es", "t") in merges and ("ew", "est") in merges
    assert merges == T.learn_bpe_merges(df, n_merges=6)  # deterministic

    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in T.apply_bpe_merges(df, merges).collect()
    }
    assert toks[1] == ["low"] * 5  # fully fused
    assert toks[2][:3] == ["low", "e", "r"]
    assert toks[3].count("ewest") == 3  # 'newest' -> n + ewest

    # min_count floor stops before degenerate singleton merges
    tiny = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert T.learn_bpe_merges(tiny, n_merges=5, min_count=2) == []
