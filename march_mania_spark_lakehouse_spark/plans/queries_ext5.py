"""Fifth extension batch — mergeable sketches, file-stats pruning, and
multi-dimensional clustering keys:

- q93 HLL distinct rollup (per-source + sketch-merged total)
- q94 bitmap exact distinct (oracle = COUNT(DISTINCT))
- q95 count-min-sketch frequency estimates
- q96 per-file min/max manifest (oracle = DuckDB filename stats)
- q97 z-order clustering key (oracle = bit-interleave in SQL)
- q98 PSI feature-drift report between two deterministic splits
- q99 int8 embedding quantization (corpus-derived per-dim scales)
- q100 VARIANT semi-structured extraction (Spark 4 E5 path)

The reference's only approximate aggregate is `percentile_approx`
(`src/features/massey.py:68`); this batch adds the mergeable-summary
family a 100 TB lakehouse leans on: sketch state that unions without
re-scanning (q93), exact distinct whose shuffle is bitmaps instead of
keys (q94), point-frequency estimates without a key shuffle (q95), and
the data-skipping manifest + clustering-key machinery (q96/q97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators import (
    dedup,
    drift,
    quantize,
    sketch,
)
from march_mania_spark_lakehouse_spark.plans.registry import query

# --------------------------------------------------------------------------
# q93 — HLL sketch rollup: per-source distinct users + merged total.
# --------------------------------------------------------------------------


@query("q93_hll_reach", oracle=None, bench=True, tags=("sketch",))
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate user reach per event_type plus an ALL row whose value
    comes from merging the per-type SKETCHES (`operators/sketch.py:
    hll_distinct_rollup`) — one data pass total. Approximate →
    rows-only; the ≤2% relative-error bound vs exact distinct is
    unit-tested (tests/test_ext5.py)."""
    ev = catalog.load(spark, "events", sf_dir)
    return sketch.hll_distinct_rollup(ev, "event_type", "user_id")


# --------------------------------------------------------------------------
# q94 — bitmap exact distinct (oracle-checkable).
# --------------------------------------------------------------------------

_Q94_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderstatus
"""


@query("q94_bitmap_distinct", oracle=_Q94_SQL, tags=("sketch",))
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct customers per order status via roaring-bitmap
    buckets (`operators/sketch.py:bitmap_exact_distinct`): the shuffle
    carries fixed-width bitmaps, not one row per distinct key, and
    states merge by bitwise OR. Exact ⇒ hash-checked against
    COUNT(DISTINCT)."""
    orders = catalog.load(spark, "orders", sf_dir)
    return sketch.bitmap_exact_distinct(
        orders, ["o_orderstatus"], "o_custkey", out_col="n_customers"
    )


# --------------------------------------------------------------------------
# q95 — count-min-sketch frequency estimates.
# --------------------------------------------------------------------------


@query("q95_cms_user_counts", oracle=None, tags=("sketch",))
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch event counts for a fixed user panel: the sketch
    builds in one distributed pass (mergeable per-partition state);
    point lookups read the collected O(eps⁻¹) table. est ≥ true and
    est ≤ true + eps·N w.p. ≥ confidence — both bounds unit-tested."""
    ev = catalog.load(spark, "events", sf_dir)
    return sketch.cms_frequency_estimates(
        ev, "user_id", candidates=range(1, 21), eps=0.001, confidence=0.99
    )


# --------------------------------------------------------------------------
# q96 — per-file min/max manifest (the data-skipping index).
# --------------------------------------------------------------------------

# The filename-grouped oracle must read files, not the pre-registered
# views (views carry no filename column). `__SF_DIR__` is substituted by
# the harness running the oracle: `__spark_entry__.oracle_sql()` pins the
# driver's sf0.01 compare scale; `tests/test_oracle_parity.py` pins its
# own sf_dir.
_Q96_SQL = """
SELECT regexp_extract(filename, '([^/]+)$', 1) AS file,
       COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_o_orderkey,
       MAX(o_orderkey) AS max_o_orderkey,
       MIN(o_orderdate) AS min_o_orderdate,
       MAX(o_orderdate) AS max_o_orderdate
FROM read_parquet('__SF_DIR__/orders.parquet', filename=true)
GROUP BY 1
"""


@query("q96_file_stats_manifest", oracle=_Q96_SQL, tags=("lake",))
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file min/max/count stats in one scan (`operators/sketch.py:
    file_stats_manifest`) — the relational form of Delta/Iceberg data
    skipping: the planner consults #files manifest rows, never the
    data. `prune_files` (tested) turns a range predicate into the
    candidate file set."""
    orders = catalog.load(spark, "orders", sf_dir)
    return sketch.file_stats_manifest(orders, ["o_orderkey", "o_orderdate"])


# --------------------------------------------------------------------------
# q97 — z-order clustering key.
# --------------------------------------------------------------------------

_Q97_BITS = 8

_Q97_SQL_PARTS = " | ".join(
    f"(((o_custkey >> {b}) & 1) << {2 * b}) | "
    f"((((o_orderkey % 256) >> {b}) & 1) << {2 * b + 1})"
    for b in range(_Q97_BITS)
)
_Q97_SQL = f"""
SELECT o_orderkey, ({_Q97_SQL_PARTS}) AS zkey
FROM orders
WHERE o_orderkey < 1000
"""


@query("q97_zorder_key", oracle=_Q97_SQL, tags=("lake",))
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/z-order interleave of (o_custkey, o_orderkey mod 256)
    (`operators/sketch.py:zorder_key`): the clustering key a writer
    sorts by so range predicates on EITHER dimension skip files. Pure
    shift/or bit arithmetic ⇒ oracle-checked bit-for-bit against the
    same interleave written out longhand in SQL."""
    orders = catalog.load(spark, "orders", sf_dir).filter(
        F.col("o_orderkey") < 1000
    )
    return orders.select(
        "o_orderkey",
        sketch.zorder_key(
            [F.col("o_custkey"), F.col("o_orderkey") % 256], bits=_Q97_BITS
        ).alias("zkey"),
    )


# --------------------------------------------------------------------------
# q98 — PSI feature-drift report between two deterministic splits.
# --------------------------------------------------------------------------

_Q98_BINS, _Q98_LO, _Q98_HI, _Q98_EPS = 10, 0.0, 500.0, 1e-6

_Q98_SQL = f"""
WITH b AS (
    SELECT LEAST({_Q98_BINS - 1}, GREATEST(0,
               CAST(FLOOR((value - {_Q98_LO}) / {(_Q98_HI - _Q98_LO) / _Q98_BINS}) AS INT)
           )) AS bucket,
           (user_id % 2 = 0) AS ref
    FROM events
),
c AS (
    SELECT bucket,
           COUNT(*) FILTER (WHERE ref) AS n_ref,
           COUNT(*) FILTER (WHERE NOT ref) AS n_cur
    FROM b GROUP BY bucket
),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM c),
s AS (
    SELECT bucket,
           CAST(n_ref AS DOUBLE) / t_ref + {_Q98_EPS} AS p,
           CAST(n_cur AS DOUBLE) / t_cur + {_Q98_EPS} AS q
    FROM c, t
),
pb AS (
    SELECT bucket, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
           ROUND((p - q) * LN(p / q), 6) AS psi
    FROM s
)
SELECT * FROM pb
UNION ALL
SELECT -1, NULL, NULL, ROUND(SUM(psi), 6) FROM pb
"""


@query("q98_psi_drift", oracle=_Q98_SQL, tags=("dq", "pipeline"))
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability drift between two deterministic user splits
    (`operators/drift.py:psi_report`): one conditional aggregate over a
    single scan at any corpus size; the bucket = -1 row is the scalar a
    monitor alerts on."""
    ev = catalog.load(spark, "events", sf_dir)
    return drift.psi_report(
        ev,
        "value",
        is_reference=F.col("user_id") % 2 == 0,
        lo=_Q98_LO,
        hi=_Q98_HI,
        n_bins=_Q98_BINS,
        eps=_Q98_EPS,
    )


# --------------------------------------------------------------------------
# q99 — int8 embedding quantization (corpus-derived per-dim scales).
# --------------------------------------------------------------------------

# (dim = 64 is pinned by the embeddings fixture, FIXTURES.md; DuckDB has
# no UNNEST WITH ORDINALITY, so the per-dim max uses an index cross join)
_Q99_SQL = """
WITH dims AS (SELECT UNNEST(range(1, 65)) AS i),
mx AS (
    SELECT i, GREATEST(MAX(ABS(CAST(embedding[i] AS DOUBLE))), 1e-12) AS m
    FROM embeddings, dims
    GROUP BY i
),
s AS (SELECT list(m ORDER BY i) AS scales FROM mx)
SELECT vec_id,
       array_to_string(list_transform(
           embedding,
           (x, i) -> CAST(LEAST(127.0, GREATEST(-127.0,
               ROUND(CAST(x AS DOUBLE) / s.scales[i] * 127, 0))) AS INT)
       ), ',') AS codes
FROM embeddings, s
WHERE vec_id < 100
"""


@query("q99_int8_quantize", oracle=_Q99_SQL, tags=("similarity", "pipeline"))
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization with corpus-derived per-dimension
    scales (`operators/quantize.py`): a dim-sized aggregate then a
    map-only encode — 4× memory off every ANN structure. Integer codes
    ⇒ bit-exact oracle; the query serializes the int array to CSV so the
    hash gate compares engine-neutrally (the operator itself returns the
    typed array). Reconstruction-cosine bound is unit-tested."""
    emb = catalog.load(spark, "embeddings", sf_dir)
    scales = quantize.dim_scales(emb, "embedding")
    return (
        emb.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.concat_ws(
                ",", quantize.quantize_int8("embedding", scales)
            ).alias("codes"),
        )
    )


# --------------------------------------------------------------------------
# q100 — VARIANT semi-structured extraction (Spark 4 path for E5).
# --------------------------------------------------------------------------

_Q100_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.missing') AS INT) AS missing
FROM events
WHERE event_id < 2000
"""


@query("q100_variant_extract", oracle=_Q100_SQL, tags=("json",))
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction via VARIANT (Spark 4): ``parse_json``
    once into the binary variant encoding, then ``variant_get`` typed
    paths — at scale this beats per-access ``get_json_object`` (q17)
    because the document parses once and fields shred lazily, and it
    beats ``from_json`` (q42) when the schema is open. Missing paths via
    ``try_variant_get`` → typed NULL, not an error."""
    ev = catalog.load(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.missing", "int").alias("missing"),
    )


# --------------------------------------------------------------------------
# q101 — the composed near-dup dedup pipeline (candidates → verify →
# components → survivors).
# --------------------------------------------------------------------------


# The full-pipeline oracle recomputes every stage from first principles
# in DuckDB: portable MinHash signatures (q125 fragment) → band folds →
# bucket-join candidates → exact-Jaccard verification on the true
# shingle sets → recursive-CTE connected components (the q83 pattern) →
# min-id survivors. One SQL statement re-derives the whole dedup.
_MH_P101 = 1_000_000_007

_Q101_MHS = ",\n       ".join(
    f"list_min(list_transform(hv, h -> (h * {2 * s + 1} + {997 * s + 13}) "
    f"% {_MH_P101})) AS mh{s}"
    for s in range(8)
)

_Q101_BUCKETS = "\nUNION ALL\n".join(
    f"SELECT doc_id, {b} AS band, "
    f"(mh{2 * b} * 10007 + mh{2 * b + 1}) % {_MH_P101} AS bh FROM sig"
    for b in range(4)
)

_Q101_SQL = f"""WITH RECURSIVE
docs AS (SELECT * FROM documents WHERE doc_id < 1000),
sh AS (
    SELECT doc_id,
           list_distinct(list_transform(t[1:len(t) - 2],
               (x, i) -> x || ' ' || t[i + 1] || ' ' || t[i + 2])) AS shs
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM docs)
),
hs AS (
    SELECT doc_id,
           list_transform(shs, s -> list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(s, ' '),
                                  w -> CAST(ascii(w) + length(w) AS BIGINT))),
               (h, x) -> (h * 31 + x) % {_MH_P101})) AS hv
    FROM sh
),
sig AS (SELECT doc_id, {_Q101_MHS} FROM hs),
buckets AS ({_Q101_BUCKETS}),
cand AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM buckets a
    JOIN buckets b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
shl AS (SELECT doc_id, unnest(shs) AS shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shl GROUP BY doc_id),
inter AS (
    SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
    FROM cand c
    JOIN shl a ON a.doc_id = c.id_a
    JOIN shl b ON b.doc_id = c.id_b AND b.shingle = a.shingle
    GROUP BY c.id_a, c.id_b
),
edges AS (
    SELECT id_a AS src, id_b AS dst
    FROM inter
    JOIN sizes na ON id_a = na.doc_id
    JOIN sizes nb ON id_b = nb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= 0.5
),
sym AS (SELECT src AS a, dst AS b FROM edges UNION SELECT dst, src FROM edges),
reach(node, lbl) AS (
    SELECT doc_id, doc_id FROM docs
    UNION
    SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
),
comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
SELECT d.doc_id, d.source, d.n_chars
FROM docs d JOIN comp c ON d.doc_id = c.node
WHERE c.component = d.doc_id
"""


# bench=False: the composition's cost is its pieces, which are benched
# individually (q28 MinHash banding, q83 connected components).
@query("q101_near_dup_dedup", oracle=_Q101_SQL, bench=False, tags=("dedup", "pipeline"))
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus dedup (`operators/dedup.py:near_dup_dedup`):
    MinHash-LSH candidates → exact Jaccard verification restricted to
    candidate pairs → connected components for transitive groups →
    min-id survivor per group. Runs the portable int64 signature family
    (`family="portable"`) so the ENTIRE pipeline — candidates, verify,
    transitive grouping, survivorship — is value-oracled against one
    recursive-CTE DuckDB statement; the murmur3 family stays the
    production default and keeps its planted-duplicate unit test
    (including a transitive A≈B≈C chain)."""
    docs = catalog.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 1000
    )
    kept = dedup.near_dup_dedup(
        # max_bucket=None: oracle checks the exact candidate set (the
        # size-derived default cap would be invisible to the SQL oracle).
        docs, "doc_id", "text", threshold=0.5,
        num_hashes=8, bands=4, family="portable", max_bucket=None,
    )
    return kept.select("doc_id", "source", "n_chars")


# --------------------------------------------------------------------------
# q102 — recursive CTE hierarchy traversal (Spark 4 WITH RECURSIVE).
# --------------------------------------------------------------------------

# A synthetic 10-ary hierarchy over customer keys: parent(k) = k div 10,
# roots are k < 10. Only chains whose every ancestor exists as a node are
# reached — identical fixpoint semantics in both engines.
_Q102_SPARK_SQL = """
WITH RECURSIVE h(node, root, depth) AS (
    SELECT k AS node, k AS root, 0 AS depth FROM cust_nodes WHERE k < 10
    UNION ALL
    SELECT n.k, h.root, h.depth + 1
    FROM cust_nodes n JOIN h ON (n.k div 10) = h.node
    WHERE n.k >= 10
)
SELECT node, root, depth FROM h
"""

_Q102_SQL = """
WITH RECURSIVE nodes AS (
    SELECT DISTINCT o_custkey AS k FROM orders WHERE o_custkey < 10000
),
h(node, root, depth) AS (
    SELECT k AS node, k AS root, 0 AS depth FROM nodes WHERE k < 10
    UNION ALL
    SELECT n.k, h.root, h.depth + 1
    FROM nodes n JOIN h ON (n.k // 10) = h.node
    WHERE n.k >= 10
)
SELECT node, root, depth FROM h
"""


@query("q102_recursive_hierarchy", oracle=_Q102_SQL, tags=("sql", "graph"))
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal with Spark 4's native ``WITH RECURSIVE``:
    root/depth for every customer key reachable through a synthetic
    10-ary parent chain. Each recursion level is one self-join the
    engine plans like any other (broadcast-able, AQE-coalesced), so SQL
    users get transitive closure without the driver loop that
    `operators/graph.py:connected_components` manages explicitly — that
    loop remains the form for UNBOUNDED-depth graphs where per-round
    checkpointing controls lineage."""
    catalog.load(spark, "orders", sf_dir).filter(
        F.col("o_custkey") < 10000
    ).select(F.col("o_custkey").alias("k")).distinct().createOrReplaceTempView(
        "cust_nodes"
    )
    return spark.sql(_Q102_SPARK_SQL)


# --------------------------------------------------------------------------
# q103 — ordered string aggregation (listagg, Spark 4).
# --------------------------------------------------------------------------

_Q103_SQL = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
           AS priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@query("q103_listagg_priorities", oracle=_Q103_SQL, tags=("agg", "sql"))
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``listagg`` WITHIN GROUP, Spark 4):
    distinct priorities per status as one deterministic CSV cell. The
    explicit ORDER BY inside the aggregate is what makes the result
    partition-independent — an unordered listagg is nondeterministic
    under parallelism and would never hash-match a serial oracle."""
    orders = catalog.load(spark, "orders", sf_dir)
    return orders.groupBy("o_orderstatus").agg(
        F.expr(
            "listagg(DISTINCT o_orderpriority, ',') "
            "WITHIN GROUP (ORDER BY o_orderpriority)"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q104 — error-safe typed ingest (try_* family).
# --------------------------------------------------------------------------

_Q104_SQL = """
WITH raw AS (
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_tok,
           n_chars
    FROM documents
)
SELECT COUNT(*) AS n_rows,
       COUNT(TRY_CAST(first_tok AS INT)) AS n_numeric_first,
       CAST(SUM(CASE WHEN TRY_CAST(first_tok AS INT) IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable,
       CAST(SUM(COALESCE(TRY_CAST(first_tok AS INT), 0)) AS BIGINT) AS numeric_sum
FROM raw
"""


@query("q104_try_cast_ingest", oracle=_Q104_SQL, tags=("dq", "sql"))
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe typed ingest (ANSI ``try_cast``): parse a dirty string
    field, count parse failures instead of failing the job — the ingest
    contract under ANSI sessions where a bare CAST of junk is a runtime
    error. At 100 TB one poison row must never kill a scan."""
    docs = catalog.load(spark, "documents", sf_dir)
    first_tok = F.split(F.col("text"), " ").getItem(0)
    parsed = docs.select(first_tok.cast("string").alias("t"))
    tc = F.col("t").try_cast("int")
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(tc).alias("n_numeric_first"),
        F.sum(F.when(tc.isNull(), 1).otherwise(0)).alias("n_unparseable"),
        F.sum(F.coalesce(tc, F.lit(0))).cast("long").alias("numeric_sum"),
    )
