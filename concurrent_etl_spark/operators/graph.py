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
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(edges.src.alias("vnode"), "lbl")
            .agg(F.sum("w").alias("wt"))
            .withColumnRenamed("vnode", "node")
        )
        # top-1 per node as a MAX over the unique ordering struct
        # (wt desc, lbl asc == max of (wt, -lbl)): map-side
        # combinable aggregation instead of a row_number window's
        # exchange + per-partition sort. (wt, -lbl) is unique per
        # node because lbl is a group key of `votes`, so the max is
        # deterministic and identical to the window's rn = 1 row.
        top = F.max(F.struct(F.col("wt"), (-F.col("lbl")).alias("nl")))
        labels = votes.groupBy("node").agg((-top["nl"]).alias("lbl"))
    return labels
