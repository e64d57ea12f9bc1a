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

from pyspark.sql import DataFrame, Window
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


def label_propagation_edges(labels0: DataFrame, edges: DataFrame,
                            rounds: int = 2) -> DataFrame:
    """Synchronous label propagation over an explicit (src, dst) edge
    relation, unrolled ``rounds`` times into one static plan (the
    pagerank_edges shape — a fixed small round count needs no driver
    loop, no checkpoints, and Catalyst sees the whole computation).

    Each round every node takes the MAJORITY label among its
    out-neighbors' current labels (vote count desc, smallest label on
    ties — integer votes, so the argmax is engine-exact); nodes
    without out-edges keep their label (LEFT join + coalesce). Two
    bounded shuffles per round: edges⋈labels on the node key and the
    (node, label) vote count.

    ``labels0`` is (node, label) covering every vertex."""
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    labels = labels0.select("node", "label")
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        w = Window.partitionBy("src").orderBy(
            F.desc("votes"), F.col("label"))
        winner = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("src").alias("node"),
                    F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winner, "node", "left")
            .select("node",
                    F.coalesce(F.col("new_label"), F.col("label"))
                     .alias("label"))
        )
    return labels


def label_propagation_knn(embeddings: DataFrame, k: int = 5,
                          rounds: int = 2) -> DataFrame:
    """Label denoising / semi-supervised smoothing over the
    cell-bounded k-NN graph: each vector's label is re-voted by its
    neighborhood for a fixed ``rounds`` — a changed row is a
    mislabel candidate (the relational cross-check for what
    embedding_outliers scores geometrically: outliers are FAR from
    their label centroid, these DISAGREE with their neighbors).

    The edge relation materializes once inside label_propagation_edges
    (O(k·n) slim rows); the grid auto-sizes with the corpus like every
    cell-family operator, so the oracle's auto-K twin tracks it at any
    replica SF. Output: (vec_id, label_seed, label_prop, changed)."""
    edges = (knn_graph_cells(embeddings, k=k)
             .select(F.col("vec_id").alias("src"),
                     F.col("neighbor_id").alias("dst")))
    labels0 = embeddings.select(
        F.col("vec_id").alias("node"),
        F.col("label").cast("bigint").alias("label"))
    final = (label_propagation_edges(labels0, edges, rounds=rounds)
             .select(F.col("node").alias("f_node"),
                     F.col("label").alias("label_prop")))
    return (
        labels0.join(final, labels0["node"] == final["f_node"])
        .select(F.col("node").alias("vec_id"),
                F.col("label").alias("label_seed"),
                "label_prop",
                (F.col("label") != F.col("label_prop")).alias("changed"))
        .orderBy("vec_id")
    )
