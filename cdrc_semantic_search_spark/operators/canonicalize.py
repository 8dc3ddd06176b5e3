"""Canonicalization: connected components over high-similarity pairs.

The reference groups near-identical chunks under one parent id at query
time (/root/reference/src/model.py:20-23); the KG graft generalizes this
to surface-form canonicalization: mention surfaces whose embeddings are
cosine-similar ≥ τ (candidates via LSH buckets, operators/similarity.py)
are one surface cluster; each cluster gets the lexicographically smallest
member as canonical id.

Connected components is iterative **label propagation** on DataFrames —
no GraphFrames dependency (SURVEY §4.3):

    label(v) ← min(label(v), min over neighbors label(u))

repeated to fixpoint, with ``localCheckpoint`` each round to truncate
lineage (iteration count is O(component diameter); similarity clusters
are shallow). The per-iteration cost is two shuffles on the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.operators.similarity import cosine_pairs_lsh


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src, dst) → (id, component) where component = min id reachable.

    Vertices = every id appearing in edges. Deterministic for any input
    order (min is commutative); isolated vertices aren't represented —
    callers left-join and coalesce to the vertex's own id.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    labels = labels.localCheckpoint()
    sym = sym.localCheckpoint()
    for _ in range(max_iter):
        # 1-hop: min over neighbors' labels
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        hop = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("nbr_component", "component")
            ).alias("component"),
        )
        # pointer jump: component ← label(component). Halves the remaining
        # path each round → O(log diameter) iterations instead of O(diameter)
        parent = labels.select(
            F.col("id").alias("component"), F.col("component").alias("grand")
        )
        new_labels = (
            hop.join(parent, "component", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("grand", "component")).alias(
                    "component"
                ),
            )
        )
        new_labels = new_labels.localCheckpoint()
        # convergence probe every other round: the count() action is a full
        # job; with pointer jumping the label path halves per round anyway,
        # so probing at half rate trades ≤1 extra cheap round for halving
        # the number of synchronous driver barriers
        if _ % 2 == 1 or _ == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                break
        labels = new_labels
    return labels


def canonicalize_embedded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """→ (id, canonical_id): cluster rows whose embeddings reach cosine ≥
    threshold through any path; canonical = min id in the component."""
    pairs = cosine_pairs_lsh(df, id_col, vec_col, dim, threshold, seed=seed)
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("canonical_id"))
    )
