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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Iteration-state materialization modes (lineage truncation between
#: driver-loop rounds — iterative plans otherwise double in analyzer
#: size every round):
#:
#: - ``local``    `localCheckpoint()`: blocks in executor storage
#:   memory. Fastest, but in local mode ONE JVM is driver + all 32
#:   executors, so every round's blocks pile into one heap — that is
#:   what pushed the 100× PageRank probe to a 24 GB heap.
#: - ``disk``     `localCheckpoint(storageLevel=DISK_ONLY)`: same single
#:   computation and lineage truncation, blocks on local disk — caps
#:   memory residency with no checkpoint dir and no recompute.
#: - ``reliable`` `checkpoint()`: writes to the SparkContext checkpoint
#:   dir (HDFS/object store on a cluster) — survives executor loss,
#:   the fault-tolerant form for long cluster jobs (costs one extra
#:   computation per checkpoint, Spark's documented reliable-checkpoint
#:   behavior).
_STATE_MODES = ("local", "disk", "reliable")

#: Env override (e.g. the scale probe runs with
#: SPARK_GRAFT_ITER_STATE=disk to fit the 100× graph probes in the
#: default 8 GB local heap).
_STATE_ENV = "SPARK_GRAFT_ITER_STATE"


def _resolve_state_mode(df: DataFrame, state: str | None) -> str:
    """``state=None`` auto-selects: the env override if set, else
    ``reliable`` when the session has a checkpoint dir (a cluster job
    opts in with one `sc.setCheckpointDir` line, no operator plumbing),
    else ``local``."""
    if state is None:
        state = os.environ.get(_STATE_ENV)
    if state is None:
        sc = df.sparkSession.sparkContext
        state = (
            "reliable" if sc._jsc.sc().getCheckpointDir().isDefined() else "local"
        )
    if state not in _STATE_MODES:
        raise ValueError(f"state must be one of {_STATE_MODES}, got {state!r}")
    return state


def _materialize(df: DataFrame, state: str, eager: bool = True) -> DataFrame:
    """Truncate lineage between iteration rounds per ``state`` (see
    `_STATE_MODES`).

    ``eager=False`` truncates the LOGICAL plan immediately (the analyzer
    sees a LogicalRDD either way) but defers the job: the RDD is marked
    persist+truncate and computes with the NEXT action that consumes it
    (optimization round 13, guide §1.2/§2.6 — fewer driver barriers).
    A fixed-iteration loop whose only required actions are its
    convergence checks then runs one job per check instead of one per
    round. ``reliable`` stays eager regardless: deferred reliable
    checkpoints change the fault-tolerance story mid-loop."""
    if state == "reliable":
        return df.checkpoint(eager=True)
    if state == "disk":
        from pyspark.storagelevel import StorageLevel

        return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=eager)


def _both_directions(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(a, b) rows carrying each input edge in both directions, in ONE
    pass: `edges ∪ edges.swap` puts two copies of the (possibly
    expensive) edge-producing subtree into the physical plan — the
    union-branch duplication of guide §2.4 — where an explode of a
    2-element struct array emits the identical row multiset from a
    single traversal."""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    shorten_hops: int = 1,
    check_every: int = 2,
    state: str | None = None,
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
    and barrier count, not per-round CPU, is the bill.

    ``check_every``: run the convergence aggregate (one driver-side job
    per check) only every k rounds instead of every round. Worst case
    runs check_every-1 extra propagation rounds past the fixpoint —
    data-wise no-ops, since min-propagation is idempotent — in exchange
    for 1/k of the convergence jobs; the fixpoint reached is identical.

    ``state`` picks the iteration-state materialization mode (see
    `_STATE_MODES`; None = auto)."""
    # Partition the (big) edge table by the per-round join key ONCE:
    # every propagation round joins `sym.b == labels.node`, and without
    # an established partitioning Spark re-shuffles the full edge list
    # every round — the per-node label state is the side that should
    # move (guide §2.4: operations keyed the same way share one
    # exchange). The explicit repartition lands BEFORE the distinct,
    # which a hash partitioning on `b` already satisfies (subset of the
    # (a,b) clustering), so setup still costs one shuffle; the cached
    # partitioning then serves every round.
    sym = (
        _both_directions(edges, src, dst)
        .filter(F.col("a") != F.col("b"))
        .repartition("b")
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
    state = _resolve_state_mode(edges, state)
    # Checkpoint (not cache): iterative plans double in size every round
    # if lineage is kept — the analyzer, not the data, OOMs. Lineage
    # truncation per round keeps plan size constant; `_materialize`
    # picks memory-resident vs disk-backed. LAZY (eager=False): the
    # convergence aggregate below is the action that computes each
    # checkpointed round — one job per CHECK instead of one
    # materialization job per round plus one agg job per check
    # (optimization round 13, guide §2.6: a round is a driver barrier;
    # check_every=2 now costs 1 job per 2 rounds, 3× fewer barriers).
    labels = _materialize(labels, state, eager=False)
    # Convergence witness: min-propagation only ever DECREASES labels, so
    # Σ lbl strictly decreases until the fixpoint — one cheap agg over the
    # checkpointed labels replaces a join-based changed-rows check.
    prev_sum = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)"))).first()[0]
    check_every = max(1, check_every)
    for it in range(max_iter):
        # propagate: candidate label for each node = min over neighbors'
        # labels and its own; plus path-shortening hop (label's label).
        via_edges = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("lbl"))
        )
        candidates = labels.select("node", "lbl").union(via_edges)
        hop = labels.select("node", "lbl")
        for _ in range(max(0, shorten_hops)):
            nxt = labels.select(F.col("node").alias("__n"), F.col("lbl").alias("__l"))
            hop = hop.join(nxt, hop["lbl"] == nxt["__n"]).select(
                hop["node"].alias("node"), nxt["__l"].alias("lbl")
            )
            candidates = candidates.union(hop)
        new_labels = _materialize(
            candidates.groupBy("node").agg(F.min("lbl").alias("lbl")),
            state,
            eager=False,
        )
        labels = new_labels
        if (it + 1) % check_every == 0 or (it + 1) == max_iter:
            new_sum = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)"))
            ).first()[0]
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
    state: str | None = None,
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
    shuffle budget per step as one large groupBy. Checkpointing every
    ``checkpoint_every`` steps keeps lineage/analyzer cost constant in
    the iteration count (the `connected_components` pattern); per-step
    cost is edges-linear with no all-pairs term. ``state`` picks the
    iteration-state mode (see `_STATE_MODES`; None = auto) — the
    memory-resident default otherwise accumulates every step's blocks
    in one heap in local mode, which is what pushed the 100× probe past
    8 GB (one JVM = driver + all executors' blocks; `disk` caps it).
    """
    unit = 1_000_000_000_000_000  # 1e15 rank units
    d_num, d_den = int(damping_pct), 100
    state = _resolve_state_mode(edges, state)
    # materialize the edge list once — it feeds every iteration, and an
    # upstream join pipeline would otherwise re-execute per step. All
    # three inputs are LAZY checkpoints (plan truncated now, computed by
    # the next consuming action): `nodes.count()` below is the single
    # init job — it computes and persists e + nodes in one pass; deg
    # rides the first iteration's action (optimization round 13, guide
    # §2.6 — one barrier instead of four).
    e = _materialize(
        # partitioned by the per-step join key so each power-iteration
        # step shuffles only the node-sized rank state, never the edge
        # list (guide §2.4); deg's groupBy below reuses the same
        # partitioning shuffle-free
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .repartition("e_src"),
        state,
        eager=False,
    )
    nodes = _materialize(
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct(),
        state,
        eager=False,
    )
    n = nodes.count()  # scalar boundary (reference §2.12 pattern)
    deg = e.groupBy(F.col("e_src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    # Attach the out-degree to each EDGE once, and precompute the
    # dangling node set once (optimization round 13, guide §2.4): the
    # previous loop joined ranks⋈deg per step TWICE (once under contrib,
    # once under dangling), re-running a node-sized join 2·iters times.
    # Both deg computations reuse e's e_src partitioning shuffle-free;
    # per step the only remaining joins are ranks⋈e2 (co-partitioned on
    # the same key) and the node-sized rank update.
    e2 = _materialize(
        e.join(deg.withColumnRenamed("node", "e_src"), "e_src"),
        state,
        eager=False,
    )
    dang = _materialize(
        nodes.join(deg, "node", "left_anti"), state, eager=False
    )
    teleport = ((d_den - d_num) * unit) // (d_den * n)  # exact python int
    ranks = nodes.withColumn("rank_fp", F.lit(unit // n).cast("long"))
    for i in range(iters):
        contrib = (
            ranks.join(e2, F.col("node") == F.col("e_src"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.expr("rank_fp DIV d")).alias("contrib"))
        )
        dangling = ranks.join(dang, "node", "leftsemi").agg(
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
            # lazy: plan truncation is what the loop needs; the caller's
            # terminal action computes every deferred step in one cascade
            ranks = _materialize(ranks, state, eager=False)
    return ranks.select(
        "node", "rank_fp", (F.col("rank_fp") / F.lit(float(unit))).alias("rank")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    state: str | None = None,
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
    state = _resolve_state_mode(edges, state)
    und = _materialize(  # feeds deg + orientation; don't recompute
        _both_directions(edges, src, dst)
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        state,
        eager=False,
    )
    # deg is referenced three times (both sides of the orientation join
    # + the final all-nodes left join) — materialize the node-sized
    # aggregate once instead of re-aggregating the edge list per branch
    # (optimization round 13, guide §2.4/§5)
    deg = _materialize(
        und.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        ),
        state,
        eager=False,
    )
    keyed = (
        und.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    # orient: smaller (deg, id) → larger (deg, id); total order ⇒ acyclic
    oriented = _materialize(  # three self-join branches below
        keyed.filter(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        ).select("a", "b"),
        state,
        eager=False,
    )
    e1 = oriented.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = oriented.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        e1.join(e2, on="y")
        .join(e3, on=["x", "z"], how="leftsemi")
        .select("x", "y", "z")
    )
    # one traversal of the wedge join, not three: the x/y/z union put
    # three copies of the e1⋈e2⋈e3 subtree into the plan (guide §2.4)
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
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
    state: str | None = None,
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
    state = _resolve_state_mode(edges, state)
    e = _materialize(  # reused every level; don't re-run its lineage
        # partitioned by the per-level join key: each relaxation level
        # then shuffles only the frontier, never the edges (guide §2.4)
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .repartition("e_src"),
        state,
        eager=False,
    )
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
            # lazy: no convergence check here (fixed hop count), so the
            # caller's terminal action is the only job — intermediate
            # levels persist as they stream through it
            dist = _materialize(dist, state, eager=False)
    return dist
