"""Invariants for the lakehouse write-path batch (q81–q83) and the
graph/merge operators behind it."""

from __future__ import annotations

import pyspark.sql.functions as F

from march_mania_spark_lakehouse_spark import catalog
from march_mania_spark_lakehouse_spark.operators.graph import (
    canonical_per_component,
    connected_components,
)
from march_mania_spark_lakehouse_spark.operators.merge import merge_upsert, scd2_apply
from march_mania_spark_lakehouse_spark.plans import all_queries

Q = all_queries()


def test_merge_upsert_semantics(spark):
    """Golden case: update wins on match, tombstone deletes, new key inserts,
    untouched rows pass through."""
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    changes = spark.createDataFrame(
        [(2, "B", 99.0, False), (3, None, 0.0, True), (4, "d", 40.0, False)],
        "k int, v string, x double, deleted boolean",
    )
    out = {r["k"]: r for r in merge_upsert(base, changes, ["k"], "deleted").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1]["v"] == "a"
    assert out[2]["v"] == "B" and out[2]["x"] == 99.0
    assert out[4]["v"] == "d"


def test_scd2_versions_and_noop(spark):
    """Changed key gets closed+opened rows; no-op update versions nothing."""
    dim = spark.createDataFrame(
        [(1, "gold", "2020-01-01", None), (2, "silver", "2020-01-01", None)],
        "k int, seg string, valid_from string, valid_to string",
    ).select(
        "k",
        "seg",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    upd = spark.createDataFrame(
        [(1, "platinum", "2021-06-01"), (2, "silver", "2021-06-01")],
        "k int, seg string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_apply(dim, upd, "k", ["seg"], "ts").collect()
    k1 = sorted(
        [r for r in out if r["k"] == 1], key=lambda r: (r["valid_to"] is None)
    )
    assert len(k1) == 2
    assert k1[0]["seg"] == "gold" and k1[0]["valid_to"] is not None
    assert k1[1]["seg"] == "platinum" and k1[1]["valid_to"] is None
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["seg"] == "silver" and k2[0]["valid_to"] is None


def test_scd2_base_count_invariant(spark, sf_dir):
    """SCD2 output = |dim| + |actually-changed keys| rows; exactly one
    current row per key."""
    out = Q["q82_scd2_history"].fn(spark, sf_dir).cache()
    cust = catalog.load(spark, "customer", sf_dir)
    n_changed = out.filter(F.col("valid_to").isNotNull()).count()
    assert out.count() == cust.count() + n_changed
    per_key_current = (
        out.filter(F.col("valid_to").isNull()).groupBy("k").count()
    )
    assert per_key_current.filter(F.col("count") != 1).count() == 0
    out.unpersist()


def test_connected_components_golden(spark):
    """Two chains + one singleton edge case: labels are min reachable id,
    including across a 5-hop path (exercises >1 propagation round)."""
    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21), (5, 5)],
        "src long, dst long",
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    for n in (10, 11, 12, 13, 14):
        assert comp[n] == 10
    assert comp[20] == 20 and comp[21] == 20
    # self-loop-only node is dropped by the operator (no real edge)
    assert 5 not in comp


def test_canonical_per_component(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "src long, dst long")
    cc = connected_components(edges)
    canon = {
        r["component"]: (r["canonical"], r["n_members"])
        for r in canonical_per_component(cc).collect()
    }
    assert canon[1] == (1, 3)
    assert canon[7] == (7, 2)


def test_q83_components_respect_cells(spark, sf_dir):
    """Every component stays inside one (source, size-bucket) cell and
    labels equal the cell minimum."""
    out = Q["q83_dedup_components"].fn(spark, sf_dir)
    docs = catalog.load(spark, "documents", sf_dir).select(
        "doc_id", "source", F.expr("n_chars div 200").alias("bkt")
    )
    joined = out.join(docs, "doc_id")
    cell_min = joined.groupBy("source", "bkt").agg(F.min("doc_id").alias("mn"))
    bad = (
        joined.join(cell_min, ["source", "bkt"])
        .filter(F.col("component") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_pagerank_matches_float_reference_and_conserves_mass(spark):
    """Fixed-point PageRank vs a serial float reference on a hand graph
    with a dangling node: per-node agreement within the fixed-point
    truncation budget, total mass within n·iters units of 1.0, and the
    dangling node holds exactly the minimum (teleport + share) rank."""
    from march_mania_spark_lakehouse_spark.operators.graph import pagerank

    E = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1)]  # node 4 has no in-links
    iters, n = 8, 4
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: (r["rank_fp"], r["rank"]) for r in
           pagerank(edges, iters=iters, checkpoint_every=3).collect()}

    # serial float reference (same synchronous dangling-redistribution)
    out: dict[int, list[int]] = {}
    for s, d in E:
        out.setdefault(s, []).append(d)
    rank = {v: 1.0 / n for v in (1, 2, 3, 4)}
    for _ in range(iters):
        contrib = {v: 0.0 for v in rank}
        dang = sum(r for v, r in rank.items() if v not in out)
        for v, targets in out.items():
            for t in targets:
                contrib[t] += rank[v] / len(targets)
        rank = {v: 0.15 / n + 0.85 * contrib[v] + 0.85 * dang / n for v in rank}

    assert set(got) == set(rank)
    for v in rank:
        # truncation loses at most ~iters units of 1e-15 per node (the
        # float reference has its own rounding; give 100x headroom)
        assert abs(got[v][1] - rank[v]) < 1e-10, (v, got[v], rank[v])
    total_fp = sum(fp for fp, _ in got.values())
    assert 10**15 - n * iters * 3 <= total_fp <= 10**15
    # node 4 is pointed at by nobody: teleport + dangling share only
    assert got[4][0] == min(fp for fp, _ in got.values())


def test_triangle_count_golden(spark):
    """Hand graph: K4 on {1,2,3,4} (4 triangles, 3 per node) plus a
    pendant node 5 and an isolated edge 6-7 (0 triangles each)."""
    from march_mania_spark_lakehouse_spark.operators.graph import triangle_count

    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}


def test_bfs_distances_golden(spark):
    """Chain 1-2-3-4-5 plus disconnected 9-10; seeds {1, 9}; max_hops 2
    reaches exactly dist(1)=0, dist(2)=1, dist(3)=2, dist(9)=0,
    dist(10)=1 — nodes 4, 5 are beyond the horizon and absent."""
    from march_mania_spark_lakehouse_spark.operators.graph import bfs_distances

    E = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (4, 5), (5, 4),
         (9, 10), (10, 9)]
    edges = spark.createDataFrame(E, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r["node"]: r["dist"] for r in
           bfs_distances(edges, seeds, max_hops=2).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 9: 0, 10: 1}


def test_graph_state_modes_and_sparse_convergence(spark, tmp_path):
    """Every iteration-state mode (memory-local, DISK_ONLY-local,
    reliable checkpoint-dir) and sparse convergence checking
    (check_every>1) must reach the identical fixpoint — CC labels and
    fixed-point PageRank are deterministic, so equality is exact.
    Also pins the auto-detect: with a checkpoint dir set, state=None
    picks the reliable form and actually writes checkpoint files."""
    import os

    from march_mania_spark_lakehouse_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (20, 21), (1, 2)],
        "src long, dst long",
    )
    base_cc = sorted(
        (r["node"], r["component"])
        for r in connected_components(edges, check_every=1, state="local").collect()
    )
    sparse_cc = sorted(
        (r["node"], r["component"])
        for r in connected_components(edges, check_every=3, state="local").collect()
    )
    assert sparse_cc == base_cc
    disk_cc = sorted(
        (r["node"], r["component"])
        for r in connected_components(edges, state="disk").collect()
    )
    assert disk_cc == base_cc

    base_pr = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank(edges, iters=5, state="local").collect()
    )
    disk_pr = sorted(
        (r["node"], r["rank_fp"])
        for r in pagerank(edges, iters=5, state="disk").collect()
    )
    assert disk_pr == base_pr

    jsc = spark.sparkContext._jsc.sc()
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    jsc.setCheckpointDir(ckpt_dir)
    try:
        rel_cc = sorted(
            (r["node"], r["component"])
            for r in connected_components(edges, check_every=2).collect()
        )
        rel_pr = sorted(
            (r["node"], r["rank_fp"])
            for r in pagerank(edges, iters=5, checkpoint_every=2).collect()
        )
        assert rel_cc == base_cc
        assert rel_pr == base_pr  # fixed-point: bit-identical across modes
        # auto-detect really used the dir: RDD checkpoint files landed
        assert any(os.scandir(ckpt_dir))
    finally:
        getattr(jsc, "checkpointDir_$eq")(
            spark.sparkContext._jvm.scala.Option.apply(None)
        )


def test_both_directions_matches_union_swap(spark):
    """_both_directions (optimization r13) must emit the exact union
    multiset of the two directed copies it replaces."""
    from march_mania_spark_lakehouse_spark.operators.graph import _both_directions

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 3), (1, 2)], ["src", "dst"]
    )
    got = sorted(
        (r.a, r.b) for r in _both_directions(edges, "src", "dst").collect()
    )
    want = sorted(
        [(1, 2), (2, 3), (3, 3), (1, 2), (2, 1), (3, 2), (3, 3), (2, 1)]
    )
    assert got == want
