"""Transitive clustering: iterative DataFrame connected components.

Replaces the reference's in-memory NetworkX Louvain communities
(entity_resolution.py:255-288 in vietexob/name-matching) with a
distributed min-label propagation over DataFrames (the GraphFrames-style
loop).  Design notes:

* At the reference's decision threshold (0.85) the match graph is a sparse
  union of alias groups — near-cliques — so connected components and
  Louvain agree on the fixtures (verified by the golden cluster test), and
  CC is the semantics the north rule names ("transitive clustering").
* Labels are the **min name string** of the component: order-insensitive,
  deterministic across resumes and partitionings (no
  ``monotonically_increasing_id`` anywhere).
* Each iteration propagates the smaller of each edge endpoint's current
  label to the other endpoint and takes a per-node ``min``; alias clusters
  are near-cliques, so convergence is typically 2-3 rounds (O(diameter);
  for adversarially long chains swap in the published large-star/small-star
  alternation — the loop scaffolding here is the same).
* ``localCheckpoint`` per round truncates the lineage so plans don't grow
  exponentially; convergence is detected by counting changed labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(name, component) for every node in ``edges``; ``component`` is the
    lexicographically smallest node name in the connected component."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    # Undirected adjacency, both directions.
    adj = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        e.select(F.col("a").alias("name"))
        .union(e.select(F.col("b").alias("name")))
        .distinct()
        .withColumn("component", F.col("name"))
        .localCheckpoint()
    )
    retired = [e]
    for _ in range(max_iterations):
        # Candidate label for each node: min over neighbors' labels and its own.
        cand = (
            adj.join(labels, adj["a"] == labels["name"])
            .select(F.col("b").alias("name"), "component")
            .union(labels.select("name", "component"))
            .groupBy("name")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            cand.alias("n")
            .join(labels.alias("o"), "name")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # The previous iteration's checkpoint blocks are dead once `cand`
        # is materialized (localCheckpoint is eager) — free them, or the
        # accumulated cache degrades the rest of the session.
        retired.append(labels)
        labels = cand
        if changed == 0:
            break
    for df in retired:
        try:
            df.unpersist()
        except Exception:
            pass
    return labels
