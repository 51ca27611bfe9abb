"""Iterative graph algorithms as DataFrame plans.

PageRank is the canonical iterative-join workload (the shape behind
link-analysis corpus weighting and citation-graph quality signals in
training-data curation). The reference has no graph operator (its 20
files are linear pandas ETL); this is a scale extension alongside the
dedup connected-components family in ``operators/dedup.py``.

Determinism contract: floating-point summation order is not
associative, so every iteration's rank is rounded to ``round_dp``
(default 8) decimal places in BOTH this implementation and any SQL
oracle — accumulated double error (~1e-13 relative) sits far below the
rounding granularity, so cross-engine and cross-partitioning runs agree
bit-for-bit on the rounded values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    round_dp: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list ``(src, dst)``.

    r_0(v) = 1/N;  r_i(v) = (1-d)/N + d * sum over in-edges (u, v) of
    r_{i-1}(u) / outdeg(u), each iteration rounded to ``round_dp`` dp.
    Callers wanting the undirected form pass both edge directions (that
    also removes dangling-node rank leakage: every node has outdeg>=1).

    Plan shape: ``links`` (edges joined to out-degrees) is shuffled ONCE
    onto the src key and EAGERLY localCheckpoint'd (a lazy cache would
    never fill before the loop's lazy checkpoints consume it — measured
    5.5s vs 6.2s at sf0.1 after making it eager); each iteration joins
    the current rank
    vector (also keyed by node id) into that partitioning, aggregates
    contributions on dst with map-side combine, and left-joins back onto
    the node set so zero-in-degree nodes keep the (1-d)/N floor. Per
    iteration the shuffle carries (node, rank) pairs — never the edge
    list again. ``localCheckpoint``
    truncates the growing lineage so iteration i's plan does not
    re-derive iterations 0..i-1. At cluster scale the cached links table
    is the bucketed adjacency you'd persist; iteration cost is |edges|
    map work + one (node, double) exchange.

    Returns (node, rank) with rank rounded to ``round_dp``.
    """
    # materialize the edge list once: every downstream consumer (node
    # set, out-degrees, the cached adjacency) re-derives it otherwise —
    # for a derived edge table (join + distinct) that re-derivation
    # dominated the measured cost (tools/ab_pagerank.py: 6.35s -> 4.74s
    # at sf0.1). At cluster scale this is the persisted adjacency table.
    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set (no nodes)")
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # EAGER materialization: a bare .cache() here is ineffective — no
    # action runs inside the loop (rank checkpoints lazily), so the
    # adjacency join/repartition would be re-derived per iteration at
    # action time, and an unpersist before the caller's first action
    # would drop the blocks before they were ever filled (ADVICE r8).
    # localCheckpoint(eager=True) computes the shuffled adjacency NOW,
    # pins the blocks, and truncates lineage; at cluster scale this is
    # the persisted bucketed adjacency table.
    links = e.join(outdeg, "src").repartition("src").localCheckpoint(
        eager=True
    )
    rank = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), round_dp).alias("r")
    )
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        contribs = (
            links.join(rank.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("r") / F.col("od")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # the node-set left join keeps zero-in-degree nodes at the
        # (1-d)/N floor; measured FASTER than precomputing that static
        # set and unioning constant rows (tools/ab_pagerank.py: 3.65s vs
        # 4.75s at sf0.1 — the union's extra checkpoint branch costs
        # more than the small-broadcast join saves)
        rank = nodes.join(
            contribs.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            F.round(
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                round_dp,
            ).alias("r"),
        ).localCheckpoint(eager=False)
    return rank.select("node", F.col("r").alias("rank"))


def pagerank_topk(edges: DataFrame, k: int = 20, **kw) -> DataFrame:
    """Top-k nodes by PageRank, ties broken by node id ascending."""
    r = pagerank(edges, **kw)
    return (
        r.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(k)
    )


def triangle_counts(edges: DataFrame, topk: int | None = None) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED edge list (one row
    per edge, either orientation; self-loops and duplicates removed
    here) — the Suri-Vassilvitskii MR-triangle shape with degree
    orientation: every edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so each wedge is generated at its
    lowest-order apex and each triangle is found exactly once. The
    orientation bounds the wedge-join fanout by O(sqrt(|E|)) per node
    (arboricity), which is what keeps a power-law hub from exploding
    the join at 100 TB — without it, the apex with degree d generates
    d^2 wedges. Measured on the sf0.1 co-purchase graph (a MILD, nearly
    uniform graph): degree orientation generates 44 wedges vs 463 for
    naive id orientation — 10.5x less join input; on a power-law graph
    the gap is the difference between finishing and not.

    Plan shape: degree = one map-combined exchange; orientation = two
    broadcast-or-shuffle equi-joins of the O(|E|) edge list onto the
    O(|V|) degree table; wedges = one self-equi-join on the apex;
    closure = one equi-join of wedges onto oriented edges on the
    (lo, hi) pair. Everything is an equi-join on ids — no cross joins,
    no nested loops. Returns (node, n_triangles) for every node in at
    least one triangle, TakeOrdered-limited when ``topk`` is given.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = canon.union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("a").alias("node"), "d"
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("__db"))
    # orient: lower (degree, id) endpoint -> higher
    oriented = (
        canon.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("__da") < F.col("__db"))
                | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u").alias("apex"), F.col("v").alias("y"))
    wedges = w1.join(w2, "apex").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("apex", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("apex", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    if topk is not None:
        return per_node.orderBy(
            F.desc("n_triangles"), F.asc("node")
        ).limit(topk)
    return per_node


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    weight_col: str | None = None,
    round_dp: int = 8,
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank with optional edge
    weights: the teleport vector concentrates on ``seeds`` (a frame
    with a ``node`` column) instead of the uniform 1/N — r_0(v) =
    I[v in S]/|S|; r_i(v) = (1-d)·I[v in S]/|S| + d·Σ over in-edges
    (u, v) of r_{i-1}(u)·w(u,v)/W(u), W(u) the total outgoing weight.
    The result ranks nodes by proximity to the seed set — the
    recommendation / relevance-propagation form (Haveliwala 2002).

    Weights default to 1 (uniform transition). Rank mass entering a
    node with no out-edges decays (the standard PPR-without-dangling-
    redistribution form) — pass both edge directions for conservation.

    Determinism: per-iteration ``round_dp`` rounding, same contract as
    ``pagerank``; the transition ratio w/W is a ratio of aggregates
    (exact for integer weights), and the contribution is computed as
    (r·w)/W left-to-right so any IEEE engine reproduces it.

    Plan shape mirrors ``pagerank``: the weighted adjacency (edges
    joined to out-weight sums) is shuffled once onto src and eagerly
    localCheckpoint'd; per iteration only (node, rank) pairs exchange
    with map-side combine; the seed-floor frame is precomputed once.
    At cluster scale: persisted adjacency + O(nodes) rank exchanges.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
        w.alias("w"),
    ).localCheckpoint(eager=True)
    sd = (
        seeds.select(F.col("node").cast("string").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    base_mass = (1.0 - damping) / n_seeds
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(sd.select("node"))
        .distinct()
    )
    # the per-node teleport floor, computed once: (1-d)/|S| on seeds,
    # 0 elsewhere (left join against the seed set, broadcast if small)
    base = (
        nodes.join(sd.withColumn("__s", F.lit(1)), "node", "left")
        .select(
            "node",
            F.when(F.col("__s").isNotNull(), F.lit(base_mass))
            .otherwise(F.lit(0.0))
            .alias("base"),
            F.when(F.col("__s").isNotNull(), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("r0"),
        )
        .localCheckpoint(eager=True)
    )
    wsum = e.groupBy("src").agg(F.sum("w").alias("ws"))
    links = e.join(wsum, "src").repartition("src").localCheckpoint(
        eager=True
    )
    rank = base.select("node", F.round(F.col("r0"), round_dp).alias("r"))
    for _ in range(iterations):
        contribs = (
            links.join(rank.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                ((F.col("r") * F.col("w")) / F.col("ws")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = (
            base.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node",
                F.round(
                    F.col("base")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    round_dp,
                )
                .alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return rank.select("node", F.col("r").alias("rank"))


def bfs_levels(
    edges: DataFrame, seeds: DataFrame, max_depth: int = 3
) -> DataFrame:
    """Breadth-first levels from ``seeds`` over a directed edge list
    ``(src, dst)``: each reachable node's minimum hop distance, capped
    at ``max_depth`` (pass both edge directions for undirected graphs).

    Frontier-based expansion — the scale-correct BFS plan: iteration i
    joins ONLY the newly-discovered frontier (never the full visited
    set) against the adjacency, dedups, and anti-joins the visited set
    so each node is labeled exactly once, at its first (= minimum)
    depth. Per iteration the shuffle carries the frontier's (node)
    keys plus its out-edges; the edge list is materialized once up
    front (the persisted-adjacency posture of ``pagerank`` above).
    All-integer levels and set semantics: nothing to round, the result
    is engine- and partitioning-deterministic by construction.

    Returns (node, level) with level in [0, max_depth].
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = edges.select("src", "dst").localCheckpoint()
    levels = seeds.select(
        "node", F.lit(0).cast("int").alias("level")
    ).localCheckpoint()
    frontier = levels.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        # LAZY checkpoints: each round's frame is still materialized
        # once and shared by its consumers (union + next frontier /
        # next anti-join), but inside the caller's single action —
        # eager checkpoints here cost one blocking driver job per
        # round (2 x max_depth sequential jobs before the query's own
        # action even starts)
        new = (
            nxt.join(levels, "node", "left_anti")
            .select("node", F.lit(depth).cast("int").alias("level"))
            .localCheckpoint(eager=False)
        )
        levels = levels.union(new).localCheckpoint(eager=False)
        frontier = new.select("node")
    return levels


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient of an undirected graph (Newman
    2002): the Pearson correlation of endpoint degrees taken over every
    edge counted in BOTH directions (the standard symmetric estimator —
    each undirected edge contributes (d_u, d_v) and (d_v, d_u), which
    makes the statistic exchange-invariant without excess-degree
    bookkeeping). Positive = hubs link hubs (social), negative = hubs
    link leaves (technological/dependency) — a one-number screen for
    whether skew-handling (hub salting, orientation bounds) will matter
    on this graph at scale.

    Plan shape: canonicalize + dedupe edges, one map-combined degree
    aggregate, two broadcast-or-shuffle equi-joins of the edge list onto
    the O(|V|) degree table, one corr aggregate. Degrees are exact
    integers, their pairwise products exact doubles; the only float
    reduction is the final corr, rounded 6 dp (the spearman/engine
    precedent). Returns ONE row: (n_nodes, n_edges, assortativity).
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = canon.union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("a").alias("node"), "d"
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("__db"))
    paired = both.join(da, "a").join(db, "b")
    return (
        paired.agg(
            F.round(
                F.corr(
                    F.col("__da").cast("double"),
                    F.col("__db").cast("double"),
                ),
                6,
            ).alias("assortativity"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
        )
        .join(
            F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        )
        .select("n_nodes", "n_edges", "assortativity")
    )


def clustering_coefficients(
    edges: DataFrame, min_degree: int = 2, topk: int | None = None
) -> DataFrame:
    """Local clustering coefficient per node: ``2 T(v) / (d(v) (d(v) -
    1))`` — the fraction of a node's neighbor pairs that are themselves
    connected (Watts-Strogatz). The community-density screen behind
    "is this co-purchase neighborhood a real bundle or a hub artifact";
    triangle counts come from :func:`triangle_counts` (degree-oriented
    wedges, O(sqrt(|E|)) fanout — the 100 TB-safe census), degrees from
    one map-combined aggregate, and the coefficient is an exact ratio
    of integers. Nodes below ``min_degree`` are excluded (coefficient
    undefined); triangle-free nodes score exact 0 via the left join.

    Returns (node, degree, n_triangles, clustering_coeff), TakeOrdered
    by (coeff desc, node) when ``topk`` is given.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = canon.union(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("a").alias("node"), "degree"
    )
    tri = triangle_counts(canon.select(F.col("a").alias("src"),
                                       F.col("b").alias("dst")))
    out = (
        deg.where(F.col("degree") >= min_degree)
        .join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce("n_triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                6,
            ).alias("clustering_coeff"),
        )
    )
    if topk is not None:
        return out.orderBy(
            F.desc("clustering_coeff"), F.asc("node")
        ).limit(topk)
    return out


def weighted_sssp(
    edges: DataFrame, seeds: DataFrame, rounds: int = 4
) -> DataFrame:
    """Hop-bounded single-source shortest paths over a weighted edge
    list ``(src, dst, w)`` with INTEGER weights: Bellman-Ford
    relaxation, ``rounds`` synchronous rounds (= paths of at most
    ``rounds`` hops; pass both directions for undirected graphs).

    Plan shape mirrors ``bfs_levels``/``pagerank``: the weighted
    adjacency is materialized once up front, and each round exchanges
    only the (node, dist) frontier state — one equi-join on the edge
    source plus a min-combine, both map-side combinable. Distances
    stay exact BIGINT arithmetic end to end (weights are integers by
    contract), so the min() semantics are engine- and partitioning-
    deterministic with nothing to round; lineage is truncated per
    round the way every iterative kernel in this package does it.

    At cluster scale the per-round shuffle is O(|frontier out-edges| +
    |V|) — the textbook distributed Bellman-Ford; ``rounds`` bounds
    work exactly the way the BFS depth cap does.

    Returns (node, dist) for every node reachable within ``rounds``
    hops, dist = exact minimum path weight.
    """
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    e = edges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    ).localCheckpoint()
    dist = seeds.select(
        "node", F.lit(0).cast("long").alias("dist")
    ).localCheckpoint()
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            # lazy: materialized once inside the caller's action and
            # shared by the next round's two consumers — not one
            # blocking driver job per relaxation round
            .localCheckpoint(eager=False)
        )
    return dist


def kcore_peel(
    edges: DataFrame, k: int = 2, rounds: int = 4
) -> DataFrame:
    """Fixed-round k-core peeling over a directed edge list ``(src,
    dst)`` (pass both directions for undirected graphs): each round
    drops every node whose degree WITHIN the surviving set is < k,
    and reports the per-round trajectory.

    A bounded number of synchronous peel rounds is the distributed
    form (Montresor et al., "Distributed k-core decomposition",
    PODC'11 use the same round structure): per round one semi-join of
    the edge list against the survivor set and one map-combined degree
    count — no per-node state beyond membership. ``rounds`` caps work
    exactly like the BFS depth / Bellman-Ford bounds elsewhere in
    this module; a converged peel makes later rounds no-ops, so the
    fixed unrolling is deterministic in both engines. All counts are
    integers — nothing to round.

    The within-survivors degree table is computed ONCE per round and
    reused for both that round's edge count (sum of degrees) and the
    next round's peel — rounds+1 edge passes total, not 2x rounds.
    Per-round summaries union LAZILY: no driver-side counting loop,
    the whole trajectory evaluates as one action.

    Returns (round, n_nodes, n_edges) for round = 1..rounds, where
    n_edges counts DIRECTED survivor-to-survivor edges (2x the
    undirected count when both directions are passed).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = edges.select("src", "dst").localCheckpoint()

    def _deg_within(node_set: DataFrame) -> DataFrame:
        return (
            e.join(node_set, e["src"] == node_set["node"], "left_semi")
            .join(
                node_set.select(F.col("node").alias("__dn")),
                F.col("dst") == F.col("__dn"),
                "left_semi",
            )
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("__d"))
        )

    nodes = e.select(F.col("src").alias("node")).distinct()
    # lazy checkpoints: each round's degree table is materialized once
    # and shared by its three consumers (the peel filter, the round
    # summary, the next round's semi-joins) — inside the caller's
    # single action rather than one blocking driver job per round
    deg = _deg_within(nodes).localCheckpoint(eager=False)
    summaries = []
    for r in range(1, rounds + 1):
        nodes = deg.where(F.col("__d") >= k).select(
            F.col("src").alias("node")
        )
        deg = _deg_within(nodes).localCheckpoint(eager=False)
        summaries.append(
            nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .crossJoin(
                deg.agg(
                    F.coalesce(F.sum("__d"), F.lit(0))
                    .cast("long")
                    .alias("n_edges")
                )
            )
            .select(
                F.lit(r).cast("int").alias("round"), "n_nodes", "n_edges"
            )
        )
    out = summaries[0]
    for sdf in summaries[1:]:
        out = out.union(sdf)
    return out
