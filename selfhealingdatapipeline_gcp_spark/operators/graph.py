"""Graph analytics over operator-generated edge sets.

The repo's iterative algorithms (Lloyd's k-means, connected
components) are driver-coordinated loops; PageRank here deliberately
is NOT: a fixed small round count unrolls into one static DataFrame
plan — no driver actions, no lineage checkpoints, Catalyst sees the
whole computation. That is the right Spark shape whenever the
iteration count is a known constant (power iteration for ranking
stabilizes its ORDER long before its values converge).

Determinism: mass moves in integer e6 units — per-edge contribution
floor(mass·d_pct / (out_deg·100)) and integer sums are
order-independent across partial-agg schedules and engines, so the
whole 3-round computation is bit-exact against the unrolled DuckDB
oracle. Dangling-node mass (no out-edges) is dropped each round
(the simplified PageRank variant; documented, mirrored in the
oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from selfhealingdatapipeline_gcp_spark.functions import vectorfn  # noqa: F401
from selfhealingdatapipeline_gcp_spark.operators.similarity import (
    knn_graph_cells)


def pagerank_edges(nodes: DataFrame, edges: DataFrame,
                   rounds: int = 3, damping_pct: int = 85) -> DataFrame:
    """PageRank over an explicit (src, dst) edge relation, unrolled
    ``rounds`` times into a static plan. ``nodes`` is a (node)
    relation covering every vertex (isolated vertices keep the base
    mass). Each round is one fact-shaped equi-join edges⋈mass plus a
    groupBy(dst) with map-side partial integer sums — 2 shuffles per
    round, bounded by |edges| and |nodes|.

    The edge relation materializes ONCE up front (localCheckpoint):
    the unrolled plan references edges in the degree count and in
    every round's join, and without the checkpoint each reference
    re-evaluates the whole edge-GENERATION subtree — for knn edges
    that was six full knn computations per execution (caught by the
    plan test counting FlatMapGroupsInPandas nodes). Edges are
    O(k·|nodes|) slim rows — tiny next to regenerating them."""
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    base = (100 - damping_pct) * 10_000  # (1-d) of 1e6 mass units
    mass = nodes.select("node", F.lit(1_000_000).cast("bigint")
                        .alias("mass"))
    for _ in range(rounds):
        contrib = (
            edges.join(deg, "src")
            .join(mass, edges["src"] == mass["node"])
            .select(
                "dst",
                F.floor(F.col("mass") * damping_pct
                        / (F.col("out_deg") * 100))
                 .cast("bigint").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(
            F.sum("c").alias("in_mass"))
        mass = (
            nodes.join(incoming, nodes["node"] == incoming["dst"], "left")
            .select("node",
                    (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                     .cast("bigint").alias("mass"))
        )
    return mass.select(F.col("node"), F.col("mass").alias("pagerank_e6")) \
               .orderBy("node")


def pagerank_knn(embeddings: DataFrame, k: int = 5,
                 n_centroids: int = 16, rounds: int = 3,
                 damping_pct: int = 85) -> DataFrame:
    """PageRank over the cell-bounded k-NN graph: rank vectors by how
    centrally their neighborhoods point at them — the centrality
    signal for picking canonical representatives out of near-dup
    neighborhoods (keep the highest-ranked member, drop satellites).
    Edges are directed vec→neighbor from knn_graph_cells."""
    edges = (knn_graph_cells(embeddings, k=k, n_centroids=n_centroids)
             .select(F.col("vec_id").alias("src"),
                     F.col("neighbor_id").alias("dst")))
    nodes = embeddings.select(F.col("vec_id").alias("node"))
    return (pagerank_edges(nodes, edges, rounds=rounds,
                           damping_pct=damping_pct)
            .select(F.col("node").alias("vec_id"), "pagerank_e6")
            .orderBy("vec_id"))
