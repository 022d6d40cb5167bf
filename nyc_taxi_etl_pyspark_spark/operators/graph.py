"""Iterative graph algorithms on DataFrames (SURVEY.md §2.12 extension).

PageRank here powers TextRank-style keyword ranking over a token
co-occurrence graph, and is the generic template for any fixed-point
computation the engine runs (connected components in
``operators/dedup.py`` is the other instance: same loop shape, monotone
min-label instead of damped averaging).

Scale notes (100 TB): each iteration is one join edges⋈ranks (both
pre-partitioned on the join key after the first iteration — Catalyst
reuses the hash partitioning) plus a bounded-size aggregate to |nodes|
rows. Lineage is truncated with ``localCheckpoint`` every few
iterations, else the plan tree doubles per iteration and the driver
chokes long before the executors do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 4,
    weight: str | None = None,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns one row per node: (token, deg, pr). Deterministic up to
    float summation order — callers round ``pr`` before hashing.
    For an undirected graph, pass both edge directions.

    ``weight=None`` (default) is the classic unweighted walk: ``deg``
    is the out-edge COUNT and each out-edge receives pr/deg mass.
    ``weight="col"`` makes the walk proportional to edge weights
    (e.g. observed transition counts): ``deg`` becomes the out-weight
    SUM (double) and each edge carries pr·w/Σw — frequent paths
    dominate, as a Markov-chain stationary-measure approximation
    should.

    The node set is src ∪ dst, so sink nodes (incoming edges only)
    receive rank like any other node; their out-degree is 0 and they
    contribute no mass (the classic dangling-node simplification — the
    dangling mass is dropped, not redistributed, so ranks are comparable
    within a run rather than a strict probability distribution).
    """
    # Materialize the edge list ONCE (round 12): ``edges`` is typically
    # the tail of an expensive derivation (for TextRank: tokenize →
    # distinct → df-prune → doc self-join), and it is consumed by deg,
    # nodes, n_nodes AND every iteration's contribs join — without
    # this, the derivation re-executes ~(3 + iterations) times and the
    # plan tree snowballs (measured on q_textrank_keywords at sf0.01:
    # ~2,400 stages and 15.4 s warm → 34 stages and ~1.4 s).
    if weight is None:
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        edge_mass = F.col("pr") / F.col("deg")
    else:
        edges = edges.select(
            "src", "dst", F.col(weight).cast("double").alias("__w")
        ).localCheckpoint(eager=True)
        deg = edges.groupBy("src").agg(F.sum("__w").alias("deg"))
        edge_mass = F.col("pr") * F.col("__w") / F.col("deg")
    nodes = (
        edges.select(F.col("src").alias("token"))
        .union(edges.select(F.col("dst").alias("token")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count("*").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "token", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["token"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(edge_mass).alias("mass"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_nodes))
            .join(contribs, nodes["token"] == contribs["dst"], "left")
            .select(
                "token",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return (
        nodes.join(ranks, "token")
        .join(deg.withColumnRenamed("src", "token"), "token", "left")
        .select(
            "token", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"), "pr"
        )
    )
