"""Connected components over a candidate-pair graph.

The missing last step of every dedup pipeline: pair relations
(MinHash-LSH candidates, SimHash near-pairs, embedding near-dups) give
EDGES, but the thing a dedup job acts on is the CLUSTER — keep one
document per connected component.  Spark has no built-in; this is the
standard min-label propagation implemented with DataFrames only:

    label(n) ← min(label(n), min over neighbors' labels)

iterated to a fixpoint.  Each round is one shuffle (join + groupBy
min); the number of rounds is bounded by the component DIAMETER, and
near-dup clusters are shallow (a duplicate family collapses in 2-3
hops), so the loop is a handful of rounds even at 10^12 documents.
For pathological long-chain graphs the classic large-star/small-star
variant halves diameters per round; it is not needed for dedup-shaped
inputs and is deliberately not implemented (simpler = auditable).

Deterministic by construction: labels are min document ids — no
randomness, rerun-stable, resume-safe (the same contract as the
engine's partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "a",
    dst_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the node's connected
    component.  Raises if the fixpoint is not reached in ``max_iter``
    rounds (diameter-bound exceeded — a malformed input for the
    dedup-shaped graphs this targets).

    Each iteration: propagate every node's current label to all of its
    neighbors, keep the per-node minimum.  Labels only ever decrease
    and are bounded below by the true component minimum, so the loop
    terminates in ≤ diameter rounds."""
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).filter(F.col("u") != F.col("v"))
    # Symmetric neighbor relation, reused every round.
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    # Lineage MUST be truncated each round: ``labels`` appears twice in
    # every iteration's plan (neighbor join + union), so without a
    # checkpoint the logical plan DOUBLES per round — 2^rounds nodes,
    # driver OOM by iteration ~12.  localCheckpoint materializes to
    # executor-local storage and cuts the plan; a production run on a
    # preemptible cluster would use reliable checkpoint(dir) instead
    # (same call shape, durable storage).
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter):
            # label candidates: own label + every neighbor's label
            candidates = sym.join(
                labels, sym["u"] == labels["node"], "inner"
            ).select(F.col("v").alias("node"), F.col("label"))
            new_labels = (
                candidates.unionByName(labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("node", F.col("label").alias("component"))
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the dedup-shaped bound; raise "
        "max_iter or pre-cluster with large-star/small-star"
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Dedup-flavored wrapper: candidate pairs → (doc_id, cluster_id,
    is_keeper).  ``cluster_id`` is the smallest doc id in the cluster
    and also the document to keep (min-id keep rule, the same rule
    exact_duplicate_groups uses)."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
