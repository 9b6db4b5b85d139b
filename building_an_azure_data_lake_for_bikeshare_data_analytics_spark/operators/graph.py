"""Iterative graph operators on DataFrames.

The engine's dedup surface (operators/dedup.py, plans/extensions.py) emits
near-duplicate *pairs*; turning pairs into duplicate *groups* is a connected
components problem. The reference has nothing iterative (SURVEY.md §2.6 —
its most complex op is a 3-way join), so this is part of the training-data
extension surface.

Algorithm: minimum-label propagation — every node starts labeled with its
own id; each round every node takes the min label among itself and its
neighbors; converges when no label changes. Rounds = graph diameter, which
for near-dup clusters (dense, star-ish blobs around a popular document) is
tiny. For adversarial high-diameter graphs at 100 TB scale, swap in the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which converges in
O(log n) rounds with the same join/groupBy building blocks.

Scale posture: each round is one shuffle-join (edges ⋈ labels on node id)
plus one hash aggregation — both keyed on node id, so AQE reuses the
exchange. ``localCheckpoint`` truncates the lineage every round; without it
the plan doubles per iteration and the driver dies on plan explosion long
before the executors feel anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label every node of an undirected edge list with the minimum node id
    reachable from it.

    Returns ``(id long, comp long)`` — one row per node that appears in at
    least one edge. Deterministic: labels are mins over node ids, and the
    iteration is a fixed point (no dependence on partitioning or order).
    """
    e = edges.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()
    labels = e.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    # Convergence probe: Σcomp strictly decreases while any label improves
    # (labels only ever move down to a smaller reachable id), so one scalar
    # aggregate over the new labels replaces a join-against-previous +
    # count action per round — half the per-iteration shuffles.
    prev_total: int | None = None
    for _ in range(max_iter):
        neighbor_labels = e.join(labels, e.a == labels.id).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        total = new_labels.agg(F.sum("comp")).first()[0]
        labels = new_labels
        if total == prev_total:
            break
        prev_total = total
    return labels
