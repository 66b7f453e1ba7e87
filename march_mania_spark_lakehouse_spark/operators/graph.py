"""Connected components over an edge list — the clustering step that
turns near-duplicate *pairs* (MinHash/SimHash/embedding candidates,
`operators/dedup.py`, `operators/similarity.py`) into duplicate *groups*
with one canonical survivor per group.

Algorithm: alternating min-label propagation with path shortening — the
relational form of the "large-star / small-star" map-reduce connected
components (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14). Each iteration is one shuffle (groupBy min) + one
join; label paths halve every round, so convergence is
O(log(diameter)) iterations, not O(diameter). All state is
(node, label) pairs — never materializes a component's member list on
one executor, so the largest component can exceed executor memory.

Determinism: labels are min node ids, so the fixpoint is unique
regardless of partitioning or iteration interleaving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    shorten_hops: int = 1,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough);
    node ids must be numeric (the convergence witness sums labels).
    Iterates star-contraction rounds until the label assignment stops
    changing (checked with one count per round — driver-side loop with
    a bounded number of Spark jobs, reference pattern `jobs/07:89-99`).

    ``shorten_hops`` chains that many label→label pointer jumps per
    round: more hops divide the distance-to-minimum faster (fewer
    rounds) at one extra (node,label) self-join per hop per round.
    Measured at sf0.1 (5k nodes, ~200-long chains): hops=2 saves ~2 of
    8 rounds but the serialized extra join costs more than the saved
    rounds locally (5.5s vs 3.9s), so the default stays 1; the knob
    exists for cluster runs where a round is a cross-executor barrier
    and barrier count, not per-round CPU, is the bill."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    # initial label: min(self, neighbors)
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("lbl"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("lbl")).alias("lbl"),
        )
    )
    # localCheckpoint (not cache): iterative plans double in size every
    # round if lineage is kept — the analyzer, not the data, OOMs. Lineage
    # truncation per round keeps plan size constant; on a cluster with a
    # checkpoint dir, `checkpoint()` gives the fault-tolerant variant.
    labels = labels.localCheckpoint(eager=True)
    # Convergence witness: min-propagation only ever DECREASES labels, so
    # Σ lbl strictly decreases until the fixpoint — one cheap agg over the
    # checkpointed labels replaces a join-based changed-rows check.
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
    for _ in range(max_iter):
        # propagate: candidate label for each node = min over neighbors'
        # labels and its own; plus path-shortening hop (label's label).
        via_edges = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("lbl"))
        )
        candidates = labels.select("node", "lbl").union(via_edges)
        hop = labels.select("node", "lbl")
        for _ in range(max(1, shorten_hops)):
            nxt = labels.select(F.col("node").alias("__n"), F.col("lbl").alias("__l"))
            hop = hop.join(nxt, hop["lbl"] == nxt["__n"]).select(
                hop["node"].alias("node"), nxt["__l"].alias("lbl")
            )
            candidates = candidates.union(hop)
        new_labels = (
            candidates.groupBy("node").agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select("node", F.col("lbl").alias("component"))


def canonical_per_component(components: DataFrame) -> DataFrame:
    """Collapse to one row per component: the canonical survivor (min
    node) plus the component's size — the keep-list a dedup pipeline
    joins back against."""
    return components.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("canonical"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_pct: int = 85,
    iters: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list in **1e-15
    fixed-point integer arithmetic**: (node, rank_fp, rank) after
    ``iters`` synchronous power-iteration steps, dangling (out-degree-0)
    mass redistributed uniformly each step —

        rank'(v) = (1−d)/n + d·Σ_{u→v} rank(u)/deg(u) + d·D/n

    with every division an integer ``DIV`` (truncation; all quantities
    positive). Why fixed point: an iterated float reduction cannot be
    made bit-stable across engines — exact-DECIMAL partial sums fix the
    reduction order, but the decimal↔double casts themselves round
    differently per engine (observed: 1-ulp disagreements at scale 18,
    and grid-tie flips at any post-cast ROUND) and the error compounds
    per iteration. Integer units have no rounding modes at all: any
    engine — Spark at any parallelism, a serial SQL oracle — produces
    the identical BIGINT rank vector, so an iterative numeric fixpoint
    becomes value-oracle-checkable. Truncation loses < n·iters units of
    total mass (units of 1e-15; invariant-tested), far below float
    PageRank's own reduction-order noise. ``damping_pct`` keeps the
    damping factor rational (85 → d = 0.85) so d·x is exact integer
    ``(85·x) DIV 100``; overflow-safe since total mass ≤ 1e15 keeps
    every intermediate < 8.6e16 « 2^63.

    Scale posture: state is one (node, rank) pair per node; each step is
    one join with the edge list + one keyed aggregate (map-side
    combined) + a one-row broadcast for the dangling mass — the same
    shuffle budget per step as one large groupBy. ``localCheckpoint``
    every ``checkpoint_every`` steps keeps lineage/analyzer cost
    constant in the iteration count (the `connected_components`
    pattern); per-step cost is edges-linear with no all-pairs term.
    """
    unit = 1_000_000_000_000_000  # 1e15 rank units
    d_num, d_den = int(damping_pct), 100
    # materialize the edge list once — it feeds every iteration, and an
    # upstream join pipeline would otherwise re-execute per step
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).localCheckpoint()
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # scalar boundary (reference §2.12 pattern)
    deg = (
        e.groupBy(F.col("e_src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    teleport = ((d_den - d_num) * unit) // (d_den * n)  # exact python int
    ranks = nodes.withColumn("rank_fp", F.lit(unit // n).cast("long"))
    for i in range(iters):
        with_deg = ranks.join(deg, on="node", how="left")
        contrib = (
            with_deg.filter(F.col("d").isNotNull())
            .join(e, F.col("node") == F.col("e_src"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.expr("rank_fp DIV d")).alias("contrib"))
        )
        dangling = with_deg.filter(F.col("d").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("long").alias("mass")
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(f"({d_num} * coalesce(contrib, 0L)) DIV {d_den}")
                    + F.expr(f"({d_num} * mass) DIV ({d_den} * {n}L)")
                ).alias("rank_fp"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        "node", "rank_fp", (F.col("rank_fp") / F.lit(float(unit))).alias("rank")
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph: (node,
    triangles). Exact integers — deterministic in any engine.

    Algorithm: degree orientation (Latapy 2008; the MapReduce-standard
    trick) — orient every undirected edge from the endpoint with
    smaller (degree, id) to the larger, so each triangle is enumerated
    exactly once as a→b→c with a→c, and the wedge join fans out from
    each node at most O(arboricity) ways instead of O(max degree):
    a hub of degree d contributes min(d, √m)-bounded oriented
    out-degree, which is what keeps the wedge table from exploding on
    skewed graphs at scale. Two self-joins on the oriented edge list +
    one union-regroup; no state beyond (edge) and (node, count) pairs.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()  # feeds deg + orientation; don't recompute
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("deg"))
    keyed = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    # orient: smaller (deg, id) → larger (deg, id); total order ⇒ acyclic
    oriented = keyed.filter(
        (F.col("da") < F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    ).select("a", "b").localCheckpoint()  # three self-join branches below
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, on="y")
        .join(e3, on=["x", "z"], how="leftsemi")
        .select("x", "y", "z")
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return deg.select("node").join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 4,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source BFS over a directed edge list: (node, dist) = the
    minimum hop count from any seed, for every node reachable within
    ``max_hops``. Synchronous Bellman-Ford relaxation on integer
    distances — exact, so deterministic in any engine at any
    parallelism, and a level-unrolled SQL oracle can value-check it.

    Each level is one join + one MIN aggregate over a node-bounded
    frontier table (never a path table — path enumeration explodes
    combinatorially; min-per-node stays ≤ |V| rows per level). The
    fixed-``max_hops`` form is the value-checkable one; run-to-fixpoint
    is the `connected_components` driver-loop pattern if needed.
    """
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).localCheckpoint()  # reused every level; don't re-run its lineage
    dist = seeds.select(F.col(seed_col).alias("node")).distinct().withColumn(
        "dist", F.lit(0).cast("int")
    )
    for h in range(max_hops):
        step = (
            dist.join(e, dist.node == e.e_src)
            .select(F.col("e_dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
        )
        if (h + 1) % checkpoint_every == 0 and (h + 1) < max_hops:
            dist = dist.localCheckpoint()
    return dist
