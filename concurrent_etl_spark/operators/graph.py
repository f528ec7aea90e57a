"""Graph operators over (src, dst, w) edge lists.

The engine's graph family: connected components lives with dedup
(``operators/dedup.connected_components`` — cluster formation is its
driving use case), damped-walk centrality is unrolled inline in
``queries_relational4.q_pagerank_bipartite``; this module holds the
reusable community-detection step so property tests can drive it on
arbitrary graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """Deterministic synchronous label propagation.

    ``edges`` is a DIRECTED (src, dst, w) list — callers mirror it
    first if the graph is undirected. Every node starts as its own
    label; each round a node adopts the label with the largest total
    edge weight among its in-neighbors, ties broken toward the
    smaller label (what makes classically order-sensitive LPA fully
    reproducible). Returns (node, lbl) after ``rounds`` rounds.

    Per round: one shuffle keyed on node ids (weight votes) + a
    per-node top-1 window bounded by the node's distinct neighbor
    labels. Label state stays one row per node.
    """
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    rn_w = Window.partitionBy("node").orderBy(F.desc("wt"), F.asc("lbl"))
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(edges.src.alias("vnode"), "lbl")
            .agg(F.sum("w").alias("wt"))
            .withColumnRenamed("vnode", "node")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(rn_w))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels
