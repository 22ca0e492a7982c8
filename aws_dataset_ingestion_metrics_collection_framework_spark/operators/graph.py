"""Distributed connected components for near-duplicate cluster assignment.

A training-data dedup pipeline needs more than the pair list the similarity
joins emit (``dedup.ngram_jaccard_pairs`` / ``minhash_dedup_pairs`` /
``embedding_near_dup_pairs``): to keep one document per duplicate *group* the
pairs must be closed into components (A~B, B~C ⇒ {A,B,C} even when A~C was
never emitted). This module assigns every vertex the minimum id of its
component — the conventional "cluster representative" contract.

Algorithm: hash-to-min label propagation expressed as a DataFrame loop —
each round is one shuffle (explode edges → groupBy min), so Catalyst/AQE
handle skew and partial aggregation. Rounds = graph diameter. Near-dup
graphs are dense small-diameter clusters (quasi-cliques), so 2-3 rounds
converge in practice; ``max_iter`` bounds adversarial chains. Lineage is
truncated per round with ``localCheckpoint`` — without it the iterative plan
doubles every round and the driver dies re-optimizing it long before the
executors break a sweat. For graphs with genuinely long chains at 100 TB
scale, swap the body for alternating large-star/small-star contraction
(O(log n) rounds, same per-round DataFrame shape); the surface here does not
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` where ``component`` is the min vertex id
    reachable from ``id`` over undirected ``edges``.

    ``vertices`` rows absent from every edge come out as singletons
    (``component = id``), so the result is a total assignment over the
    corpus — directly joinable back to keep/drop documents per group.
    """
    comp = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
    sym = sym.localCheckpoint(eager=False)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(comp, sym["src"] == comp["id"])
            .select(F.col("dst").alias("id"), "component")
        )
        new_comp = (
            comp.unionByName(neighbor_min)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("c"), "id")
            .filter(F.col("n.component") != F.col("c.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            break
    return comp


def dedup_keep_per_cluster(
    df: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """Keep exactly the cluster representatives: rows of ``df`` whose id IS
    its component's minimum (one survivor per duplicate group)."""
    reps = components.filter(F.col("id") == F.col("component")).select("id")
    return df.join(reps, df[id_col] == reps["id"], "left_semi")
