"""Seventh extension batch: corpus-hygiene operators a training-data
pipeline runs beyond near-dup removal — exact-substring (canary)
decontamination, cross-source vocabulary similarity, bigram-LM quality
scoring, and tokenizer OOV coverage.

Every query is DuckDB-oracled. Float policy (q71): single IEEE ops on
engine-identical inputs, exact DECIMAL sums where order could differ,
explicit rounding at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import dedup, text
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q117 — exact-substring decontamination (canary / benchmark-string scan).
# Eval snippets are carved from the corpus itself (every 50th doc's chars
# 5..44) so hits are guaranteed and both engines derive the identical
# snippet set from the same table — no side fixture needed.
# --------------------------------------------------------------------------

_SNIP_EVERY = 50
_SNIP_FROM = 5
_SNIP_LEN = 40

_Q117_SQL = f"""
WITH ev AS (
    SELECT substr(text, {_SNIP_FROM}, {_SNIP_LEN}) AS snippet
    FROM documents WHERE doc_id % {_SNIP_EVERY} = 0
),
hits AS (
    SELECT d.doc_id, COUNT(*) AS n_eval_hits
    FROM documents d JOIN ev ON strpos(d.text, ev.snippet) > 0
    GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
       COALESCE(h.n_eval_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


@query("q117_exact_substring_decontam", oracle=_Q117_SQL, tags=("dedup", "text"))
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal benchmark-string contamination scan: eval snippets
    broadcast against the corpus with a JVM instr predicate — the strict
    complement of q87's n-gram overlap (substring match cannot miss).
    """
    docs = catalog.load(spark, "documents", sf_dir)
    snippets = docs.filter(F.col("doc_id") % _SNIP_EVERY == 0).select(
        F.substring("text", _SNIP_FROM, _SNIP_LEN).alias("snippet")
    )
    return dedup.exact_substring_decontaminate(docs, snippets, "doc_id")


# --------------------------------------------------------------------------
# q118 — cross-source vocabulary Jaccard (corpus-mix diagnostic).
# --------------------------------------------------------------------------

_Q118_SQL = """
WITH vocab AS (
    SELECT DISTINCT source AS grp, tok AS token
    FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
),
sizes AS (SELECT grp, COUNT(*) AS n_vocab FROM vocab GROUP BY grp),
inter AS (
    SELECT a.grp AS group_a, b.grp AS group_b, COUNT(*) AS n_inter
    FROM vocab a JOIN vocab b ON a.token = b.token AND a.grp < b.grp
    GROUP BY 1, 2
)
SELECT i.group_a, i.group_b, i.n_inter,
       ROUND(CAST(i.n_inter AS DOUBLE)
             / (sa.n_vocab + sb.n_vocab - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.grp = i.group_a
JOIN sizes sb ON sb.grp = i.group_b
"""


@query("q118_source_vocab_jaccard", oracle=_Q118_SQL, tags=("text", "join"))
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources: distinct-token sets
    equi-joined on the token (vocab-sized, never a document cross join).
    """
    docs = catalog.load(spark, "documents", sf_dir)
    return text.vocab_jaccard(docs, "source")


# --------------------------------------------------------------------------
# q119 — bigram-LM quality scores (corpus self-model).
# --------------------------------------------------------------------------

_Q119_SQL = """
WITH grams AS (
    -- DuckDB can't lateral-join generate_series on a column; build the
    -- bigram list with the 1-based indexed lambda instead (slices are
    -- INCLUSIVE: t[1:len-1] = first len-1 elements).
    SELECT doc_id,
           unnest(list_transform(t[1:len(t) - 1],
                                 (x, i) -> x || ' ' || t[i + 1])) AS bigram
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
big AS (
    SELECT doc_id, string_split(bigram, ' ')[1] AS w1, bigram FROM grams
),
c_bg AS (SELECT bigram, COUNT(*) AS cbg FROM big GROUP BY bigram),
c_w1 AS (SELECT w1, COUNT(*) AS cw1 FROM big GROUP BY w1)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(CAST(ROUND(ln(CAST(cbg AS DOUBLE) / cw1), 10)
                           AS DECIMAL(24,10))) AS DOUBLE) / COUNT(*), 6)
           AS avg_logprob
FROM big JOIN c_bg USING (bigram) JOIN c_w1 USING (w1)
GROUP BY doc_id
"""


@query("q119_bigram_logprob", oracle=_Q119_SQL, tags=("text", "agg"))
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean log P(w2|w1) per document under the corpus's own bigram
    counts — the no-neural-model LM quality filter. Decimal-exact sum of
    10-digit-rounded logs keeps the parallel plan hash-equal to the
    serial oracle."""
    docs = catalog.load(spark, "documents", sf_dir)
    return text.bigram_logprob_scores(docs, "doc_id")


# --------------------------------------------------------------------------
# q120 — tokenizer OOV coverage against the corpus top-k vocabulary.
# --------------------------------------------------------------------------

_VOCAB_K = 100

_Q120_SQL = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
    SELECT token FROM toks GROUP BY token
    ORDER BY COUNT(*) DESC, token ASC LIMIT {_VOCAB_K}
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
"""


@query("q120_oov_rate", oracle=_Q120_SQL, tags=("text", "agg"))
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate vs the corpus top-100 vocab
    (deterministic count-desc/token-asc tiebreak); vocab broadcast, text
    never shuffled."""
    docs = catalog.load(spark, "documents", sf_dir)
    return text.oov_stats(docs, "doc_id", k=_VOCAB_K)


# --------------------------------------------------------------------------
# q121 — map-type function surface (map_from_entries / transform_values /
# map_filter / map_entries). Maps have no cross-engine literal form, so
# the comparator sees a canonical sorted "k:v" string; the oracle computes
# the same entries relationally (DuckDB needs no MAP type to agree).
# --------------------------------------------------------------------------

_SHARE_MIN = 0.05

_Q121_SQL = f"""
WITH cnt AS (
    SELECT c.c_mktsegment, o.o_orderstatus, COUNT(*) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
tot AS (
    SELECT c_mktsegment, SUM(n) AS total FROM cnt GROUP BY c_mktsegment
),
shares AS (
    SELECT c.c_mktsegment, c.o_orderstatus,
           ROUND(CAST(c.n AS DOUBLE) / t.total, 6) AS share
    FROM cnt c JOIN tot t USING (c_mktsegment)
)
SELECT c_mktsegment,
       CAST(COUNT(*) FILTER (WHERE share >= {_SHARE_MIN}) AS INT)
           AS n_major,
       COALESCE(string_agg(o_orderstatus || ':' || printf('%.6f', share),
                           ',' ORDER BY o_orderstatus)
                    FILTER (WHERE share >= {_SHARE_MIN}), '') AS status_shares
FROM shares
GROUP BY c_mktsegment
"""


@query("q121_map_functions", oracle=_Q121_SQL, tags=("map", "agg"))
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark map-column surface end-to-end: per customer segment, build
    status→count with ``map_from_entries`` (entries pre-sorted for a
    deterministic map order), convert to shares with
    ``transform_values``, drop minor statuses with ``map_filter``, and
    serialize via ``map_entries`` to the canonical string the comparator
    can hash. One aggregation tree — the map ops are all row-local."""
    o = catalog.load(spark, "orders", sf_dir)
    c = catalog.load(spark, "customer", sf_dir)
    cnt = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = (
        cnt.groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("__total"),
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("o_orderstatus", "n"))
                )
            ).alias("__m"),
        )
        .withColumn(
            "__shares",
            F.transform_values(
                "__m",
                lambda _, v: F.round(v.cast("double") / F.col("__total"), 6),
            ),
        )
        .withColumn(
            "__major",
            F.map_filter("__shares", lambda _, v: v >= F.lit(_SHARE_MIN)),
        )
    )
    entries = F.sort_array(F.map_entries("__major"))
    return m.select(
        "c_mktsegment",
        F.size("__major").alias("n_major"),
        F.array_join(
            F.transform(
                entries,
                # fixed %.6f on BOTH sides: a raw double cast diverges
                # cross-engine (Java Double.toString goes scientific
                # outside [1e-3, 1e7); DuckDB prints plain decimals)
                lambda e: F.concat_ws(
                    ":", e["key"], F.format_string("%.6f", e["value"])
                ),
            ),
            ",",
        ).alias("status_shares"),
    )


# --------------------------------------------------------------------------
# q122 — regex masking / PII-style redaction. The fixture has no PII-like
# columns, so both engines first derive identical synthetic contact
# strings from customer keys (printf), then redact — what's under test is
# regexp_replace/extract_all parity (Java regex vs RE2) and the masking
# operator shape, which at 100 TB is a map-only scan.
# --------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"

_Q122_SQL = f"""
WITH raw AS (
    SELECT c_custkey,
           printf('user%d@corp%d.example call +1-555-%04d now',
                  c_custkey, c_nationkey, c_custkey % 10000) AS contact
    FROM customer
)
SELECT c_custkey,
       regexp_replace(regexp_replace(contact, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
       CAST(len(regexp_extract_all(contact, '{_EMAIL_RE}')) AS INT)
           AS n_emails,
       CAST(len(regexp_extract_all(contact, '{_PHONE_RE}')) AS INT)
           AS n_phones
FROM raw
"""


_MH_K = 8
_MH_P = 1_000_000_007

_Q125_MHS = ",\n       ".join(
    f"list_min(list_transform(hv, h -> (h * {2 * s + 1} + {997 * s + 13}) "
    f"% {_MH_P})) AS mh{s}"
    for s in range(_MH_K)
)

_Q125_SQL = f"""
WITH sh AS (
    SELECT doc_id,
           list_distinct(list_transform(t[1:len(t) - 2],
               (x, i) -> x || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shs
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
hs AS (
    SELECT doc_id,
           list_transform(shs, s -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(s, ' '),
                                  w -> CAST(ascii(w) + length(w) AS BIGINT))),
               (h, x) -> (h * 31 + x) % {_MH_P})) AS hv
    FROM sh
)
SELECT doc_id,
       {_Q125_MHS}
FROM hs
"""


@query("q125_minhash_portable", oracle=_Q125_SQL, tags=("dedup", "text"))
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable MinHash signatures (polynomial shingle hash +
    affine family, pure int64 arithmetic) — the value-verifiable
    counterpart of q28's murmur3 signatures, and map-only: the whole
    signature computes from each document's own shingle array with zero
    shuffle."""
    docs = catalog.load(spark, "documents", sf_dir)
    return dedup.minhash_signatures_portable(docs, "doc_id", num_hashes=_MH_K)


_Q128_SQL = """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (
    SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY doc_id, token
),
tot AS (
    SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id
)
SELECT c.doc_id, CAST(t.n AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(CAST(ROUND(-(CAST(c.c AS DOUBLE) / t.n)
                                     * ln(CAST(c.c AS DOUBLE) / t.n), 10)
                           AS DECIMAL(24,10))) AS DOUBLE), 6) AS token_entropy
FROM cnt c JOIN tot t USING (doc_id)
GROUP BY c.doc_id, t.n
"""


@query("q128_token_entropy", oracle=_Q128_SQL, tags=("text", "agg"))
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution — the
    classic repetitiveness/diversity quality filter (near-zero entropy =
    a document repeating a few tokens). Same determinism recipe as q119:
    each −p·ln p term is IEEE ops on engine-identical quotients, rounded
    to 10 digits, summed as exact DECIMAL so any parallel plan matches
    the serial oracle. Two hash aggregates on (doc, token) → (doc);
    text never shuffles."""
    docs = catalog.load(spark, "documents", sf_dir)
    toks = text.token_table(docs, "doc_id")
    cnt = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 10).cast("decimal(24,10)")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("token_entropy"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            "token_entropy",
        )
    )


@query("q122_regex_redaction", oracle=_Q122_SQL, tags=("text", "regex"))
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone masking with counts — the PII-scrub pass every corpus
    release runs. Pure regexp_replace/regexp_extract_all built-ins: map-
    only, codegen'd, zero shuffle at any scale."""
    c = catalog.load(spark, "customer", sf_dir)
    contact = F.format_string(
        "user%d@corp%d.example call +1-555-%04d now",
        F.col("c_custkey"),
        F.col("c_nationkey"),
        F.col("c_custkey") % 10000,
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(contact, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(contact, F.lit(_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(contact, F.lit(_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
    )


# --------------------------------------------------------------------------
# q132 — engine-portable SimHash (value-verifiable counterpart of q29's
# murmur3 form, same role q125 plays for q28's MinHash): char-polynomial
# token hash → 32 derived parity votes → sign-packed signature, pure
# int64 arithmetic reproduced exactly in DuckDB. Map-only at any scale —
# each signature computes from its own row's token array.
# --------------------------------------------------------------------------

_SH_P = 1_000_000_007

_Q132_BITS = " + ".join(
    f"CASE WHEN list_sum(list_transform(hv, h -> "
    f"((h * {2 * b + 3} + {101 * b + 29}) % {_SH_P}) % 2 * 2 - 1)) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
    for b in range(32)
)

_Q132_SQL = f"""
WITH hs AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '), w -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(w, ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
               (h, x) -> (h * 131 + x) % {_SH_P})) AS hv
    FROM documents
)
SELECT doc_id, CAST({_Q132_BITS} AS BIGINT) AS simhash
FROM hs
"""


@query("q132_simhash_portable", oracle=_Q132_SQL, tags=("dedup", "text"))
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable SimHash signatures over the documents corpus — upgrades
    the SimHash family from rows-only+bit-equality checking to a full
    DuckDB value oracle (the hash, the per-bit voting, and the sign-pack
    are all verified numerically)."""
    docs = catalog.load(spark, "documents", sf_dir)
    return dedup.simhash_portable(docs, "doc_id")


# --------------------------------------------------------------------------
# q136 — REAL media decode under an exact SQL oracle. Each document gets
# a deterministic (w, h) from its id; workers ENCODE a real 24-bit BMP
# of that size and DECODE it back (operators/multimodal.py — genuine
# struct parsing, not a stub). The decoded dims must equal the formula
# and the payload length must equal the BMP spec's exact size:
# 54 header bytes + h × (3w padded to 4). The oracle recomputes all of
# it in SQL — so the encoder's byte layout and the decoder's header
# parse are value-verified, no codec library involved.
# --------------------------------------------------------------------------

_Q136_SQL = """
SELECT doc_id,
       CAST(8 + doc_id % 16 AS INT) AS width,
       CAST(8 + (doc_id * 7) % 16 AS INT) AS height,
       CAST(54 + (8 + (doc_id * 7) % 16)
                 * (((8 + doc_id % 16) * 3 + 3) // 4 * 4) AS BIGINT) AS n_bytes
FROM documents
"""


@query("q136_real_bmp_roundtrip", oracle=_Q136_SQL, tags=("multimodal",))
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode real BMPs in Arrow-batched Python workers and
    surface (decoded width, decoded height, payload bytes) — hashed
    against the closed-form BMP size arithmetic. Map-only at any scale;
    the decode is the real `decode_bmp` header/pixel parser."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from march_mania_spark_lakehouse_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    def _roundtrip(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            ws, hs, ns = [], [], []
            for doc_id in pdf["doc_id"]:
                w = int(8 + doc_id % 16)
                h = int(8 + (doc_id * 7) % 16)
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[..., 0] = (np.arange(w, dtype=np.int64)[None, :] * 11 % 256).astype(
                    np.uint8
                )
                px[..., 1] = (np.arange(h, dtype=np.int64)[:, None] * 5 % 256).astype(
                    np.uint8
                )
                payload = encode_bmp(px)
                decoded = decode_bmp(payload)
                if not np.array_equal(decoded, px):  # pixel-exact or fail loudly
                    raise ValueError(f"BMP roundtrip mismatch for doc {doc_id}")
                hs.append(decoded.shape[0])
                ws.append(decoded.shape[1])
                ns.append(len(payload))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs, "n_bytes": ns}
            )

    docs = catalog.load(spark, "documents", sf_dir).select("doc_id")
    return text.rebalance_scan(docs).mapInPandas(
        _roundtrip, schema="doc_id long, width int, height int, n_bytes long"
    )


# --------------------------------------------------------------------------
# q137 — value-oracled Count-Min construction: the sketch MATRIX from a
# portable affine hash family, recomputed bucket-for-bucket in SQL.
# Complements q95 (Spark's JVM CMS blob, error-bound-tested): here the
# mergeable state itself is hash-verified, which is what you trust when
# per-partition sketches union across 1000 executors.
# --------------------------------------------------------------------------

_CMS_P = 1_000_000_007
_CMS_D, _CMS_W = 4, 64

_Q137_SQL = f"""
SELECT CAST(d.d AS INT) AS depth,
       CAST(((e.user_id * (d.d * 2 + 3) + d.d * 101 + 29) % {_CMS_P})
                 % {_CMS_W} AS INT) AS bucket,
       COUNT(*) AS cnt
FROM events e
CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) d
GROUP BY 1, 2
"""


@query("q137_cms_portable", oracle=_Q137_SQL, tags=("sketch",))
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable count-min sketch matrix over events.user_id
    (`operators/sketch.py:cms_portable_sketch`): one map-side depth
    explode + one (depth, bucket) aggregate; result size is
    depth×width regardless of input rows."""
    from march_mania_spark_lakehouse_spark.operators.sketch import (
        cms_portable_sketch,
    )

    ev = catalog.load(spark, "events", sf_dir)
    return cms_portable_sketch(ev, "user_id", depth=_CMS_D, width=_CMS_W)


# --------------------------------------------------------------------------
# q138 — value-oracled HyperLogLog register state (same portable-hash
# pattern as q137): bucket = h mod m, register = max leading-zero rank.
# Complements q61/q93's HLL++ blobs: the union-by-max mergeable state is
# verified numerically, register for register.
# --------------------------------------------------------------------------

_HLL_P = 1_000_000_007
_HLL_M = 64

_Q138_SQL = f"""
WITH h AS (
    SELECT (user_id * 2654435761 + 104729) % {_HLL_P} AS hv FROM events
)
SELECT CAST(hv % {_HLL_M} AS INT) AS bucket,
       CAST(MAX(CASE WHEN hv // {_HLL_M} = 0 THEN 25
                     ELSE 24 - CAST(floor(log2(hv // {_HLL_M})) AS INT)
                END) AS INT) AS register
FROM h
GROUP BY 1
"""


@query("q138_hll_portable", oracle=_Q138_SQL, tags=("sketch",))
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL register state over events.user_id
    (`operators/sketch.py:hll_portable_registers`)."""
    from march_mania_spark_lakehouse_spark.operators.sketch import (
        hll_portable_registers,
    )

    ev = catalog.load(spark, "events", sf_dir)
    return hll_portable_registers(ev, "user_id", m=_HLL_M)


@query("q144_cosine_topk_pq", oracle=None, tags=("similarity", "ann"))
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (`operators/similarity.py:cosine_topk_pq`):
    corpus compressed to m=16 one-byte codes per vector (16× smaller
    than float32), scored by per-query lookup tables, exact re-rank on
    the k×8 shortlist. Recall-tested against the brute-force baseline
    (`tests/test_operators.py`) like the LSH/IVF paths — ANN is a
    sanctioned no-oracle family; returned scores are exact cosine."""
    from march_mania_spark_lakehouse_spark.operators import similarity

    emb = catalog.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk_pq(emb, q, k=5)


# q150's oracle: the FULL iterative BPE induction, unrolled in SQL —
# one (pair-count → argmax → list-fold rewrite) CTE block per merge
# round over the word-frequency table. The fold is the exact DuckDB
# analogue of the Spark-side leftmost-nonoverlap fuse (acc-list
# list_reduce; the list_prepend-init trick from the q29 oracle); the
# argmax tie-breaks (cnt DESC, l, r) like the operator, and an
# impossible sentinel pair (chr(1)) models the min_count early-stop as
# a no-op round. CTEs are MATERIALIZED: each w{k} is referenced by both
# p{k+1} and w{k+1}, and inlining would re-evaluate the whole chain
# 2^rounds times.
_Q150_MERGES, _Q150_MIN_COUNT = 8, 2


def _q150_fold(sym: str, l: str, r: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        f"list_transform({sym}, q -> [q])), "
        f"(acc, y) -> CASE WHEN len(acc) > 0 AND acc[-1] = {l} AND y[1] = {r} "
        f"THEN list_append(acc[1:len(acc)-1], acc[-1] || y[1]) "
        f"ELSE list_append(acc, y[1]) END)"
    )


def _q150_sql() -> str:
    parts = ["""w0 AS MATERIALIZED (
  SELECT word, string_split(word, '') AS s, CAST(cnt AS BIGINT) AS freq
  FROM (SELECT u.tok AS word, COUNT(*) AS cnt
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(tok)
        WHERE u.tok <> '' GROUP BY u.tok))"""]
    for k in range(1, _Q150_MERGES + 1):
        top = (
            f"SELECT {{c}} FROM p{k} WHERE cnt >= {_Q150_MIN_COUNT} "
            f"ORDER BY cnt DESC, l, r LIMIT 1"
        )
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT s[i] AS l, s[i+1] AS r, SUM(freq) AS cnt
  FROM w{k - 1}, UNNEST(range(1, len(s))) AS t(i)
  GROUP BY 1, 2)""")
        parts.append(f"""m{k} AS MATERIALIZED (SELECT
  COALESCE(({top.format(c="l")}), chr(1)) AS l,
  COALESCE(({top.format(c="r")}), chr(1)) AS r)""")
        parts.append(f"""w{k} AS MATERIALIZED (
  SELECT word, {_q150_fold("s", f"m{k}.l", f"m{k}.r")} AS s, freq
  FROM w{k - 1}, m{k})""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
applied AS (
  SELECT d.doc_id, w.s
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(tok)
  JOIN w{_Q150_MERGES} w ON u.tok = w.word),
ex AS (SELECT a.doc_id, v.s2 FROM applied a, UNNEST(a.s) AS v(s2))
SELECT doc_id, CAST(COUNT(*) AS INT) AS n_bpe_tokens,
       CAST(COUNT(DISTINCT s2) AS INT) AS n_distinct_tokens
FROM ex GROUP BY doc_id"""
    )


# bench=False: 8 driver-loop rounds ≈ 13 s at sf0.1 — all fixed
# per-round overhead (vocab table is tiny); benching it would only
# re-measure scheduler latency 8×. Correctness runs in the driver sim.
@query("q150_bpe_vocab_induction", oracle=_q150_sql(), bench=False, tags=("text",))
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-BPE tokenization of the documents corpus: induce 8 merges
    from the corpus itself (`text.learn_bpe_merges` — iterative
    distributed pair-counting over the vocabulary-bounded word table,
    same bounded-driver-loop shape as connected components), then apply
    them map-only and report per-doc token counts. FULLY VALUE-ORACLED
    (formerly rows-only): the DuckDB oracle unrolls all 8 induction
    rounds — pair argmax and leftmost-nonoverlap fuse included — so a
    wrong merge choice, tie-break, or fuse rule anywhere in the loop
    breaks the hash; the textbook golden test (`tests/test_ext4.py`)
    stays as the unit-level pin."""
    docs = catalog.load(spark, "documents", sf_dir)
    merges = text.learn_bpe_merges(docs, n_merges=_Q150_MERGES)
    out = text.apply_bpe_merges(docs, merges)
    return out.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
        F.size(F.array_distinct("bpe_tokens")).alias("n_distinct_tokens"),
    )
