"""Graph analytics over materialized KG edge tables.

The pipeline's kg_edges output (plans/kg_pipeline.kg_edges) is a weighted
entity graph; ranking its nodes is the classic downstream consumer
(entity importance for canonicalization tie-breaks, curation boosts).
Connected components lives in operators/canonicalize; this module adds
fixed-iteration PageRank.

100-TB shape per iteration: one equi-join of the (static, persisted)
out-degree-annotated edge list with the current rank vector, one
map-side-combined sum per destination, one broadcast-size rank update —
no all-pairs anything; ``localCheckpoint`` truncates lineage so iteration
N never re-optimizes 1..N-1 (same discipline as connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over an undirected graph → 1 row (n_triangles).

    Edges are normalized to one row per undirected edge, then ORIENTED
    low-(degree, id) → high-(degree, id); each triangle is found exactly
    once as a wedge from its smallest endpoint closed by the directed
    edge between the other two. Degree orientation (not id order) bounds
    every vertex's out-degree by O(√m): a hub with a million neighbors
    points all its edges INWARD, so the wedge self-join fans out from
    the low-degree leaves instead of exploding quadratically on the hub —
    the standard trick that makes distributed triangle counting survive
    power-law graphs. The count itself is orientation-invariant, so the
    SQL oracle (plain a<b ordering) matches bit-for-bit.

    Plan: one degree aggregation, two broadcast-size joins to annotate
    endpoints, one wedge self-join on the source vertex, one closure
    equi-join — no cross product anywhere.
    """
    # persist both shared frames: und feeds the degree union twice plus
    # the orientation join, deg projects into two join branches — Spark
    # does not share subtrees, so without the persists the distinct
    # shuffle and degree aggregation recompute per branch
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = F.struct(F.col("deg_a"), F.col("a")) < F.struct(
        F.col("deg_b"), F.col("b")
    )
    # directed u→v with v's order key carried for the wedge ordering below;
    # persist: three plan branches (two wedge sides + closure) reuse it
    d = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("v_deg"),
        )
        .persist()
    )
    w1 = d.select("u", "v", "v_deg")
    w2 = d.select(F.col("u"), F.col("v").alias("w"), F.col("v_deg").alias("w_deg"))
    wedges = w1.join(w2, "u").filter(
        F.struct(F.col("v_deg"), F.col("v")) < F.struct(F.col("w_deg"), F.col("w"))
    )
    closure = d.select(F.col("u").alias("v"), F.col("v").alias("w"))
    closed = wedges.join(closure, ["v", "w"])
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    weight: str | None = None,
) -> DataFrame:
    """Fixed-iteration simplified PageRank → (id, rank).

    rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u)/outdeg(u)

    With ``weight`` (e.g. kg_edges' ``weight`` column), each edge carries
    w/strength(u) of u's rank instead of 1/outdeg(u) — strength = sum of
    u's outgoing weights. Edges with NULL or non-positive weight are
    DROPPED up front (they carry no mass, and a vertex with only such
    edges leaves the graph entirely) — this also guarantees strength > 0,
    so the division can never hit ANSI DIVIDE_BY_ZERO. Same plan shape;
    only the per-edge fraction changes.

    Simplified = dangling mass leaks (no redistribution term): the update
    is a pure join+sum, identical in any SQL engine, so a DuckDB oracle
    can reproduce it bit-for-bit-modulo-1e-15 (ROUND(,6) absorbs the
    summation-order drift). Fixed iteration count keeps it deterministic;
    production runs to an L1 convergence threshold instead.

    ``N`` (vertex count) is a driver-side scalar — one cheap distinct
    count over ids, the same class of action as IVF's centroid sample.
    """
    if weight:
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("w"),
            )
            .filter(F.col("w") > 0)  # NULL/non-positive weights carry no mass
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))  # duplicate edges sum their weights
        )
    else:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .distinct()
            .withColumn("w", F.lit(1.0))  # duplicate edges collapse to one
        )
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = v.count()
    deg = e.groupBy("src").agg(F.sum("w").alias("strength"))
    # static across iterations: annotate each edge with its source strength once
    fanout = e.join(deg, "src").persist()
    base = (1.0 - damping) / n
    ranks = v.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            fanout.join(ranks, fanout["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") * F.col("w") / F.col("strength")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = v.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
        ranks = ranks.localCheckpoint()
    return ranks


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Unweighted shortest-path distances from a source set over an
    UNDIRECTED graph → (id, dist), dist ∈ [0, max_depth]; unreachable
    vertices are absent.

    Frontier-expansion BFS (the Pregel pattern on DataFrames): each round
    joins the current frontier against the (static, persisted)
    symmetrized edge list, anti-joins the visited set, and checkpoints —
    one key-partitioned join + one anti-join per round, never a full
    transitive closure.  Rounds = graph diameter (bounded by
    ``max_depth``), with early exit when a frontier empties; the same
    shuffle/lineage discipline as connected_components.

    ``sources`` is a one-column DataFrame of start vertex ids named
    ``id``.  Cross-checked by a DuckDB recursive-CTE oracle
    (graph_bfs_distances query).
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    # normalize (one pass over the caller's edge plan) THEN symmetrize
    # from the persisted normal form — a union of two selects of the raw
    # input would execute the caller's plan twice (no subtree sharing)
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    visited = (
        sources.select(F.col("id"), F.lit(0).alias("dist")).distinct().localCheckpoint()
    )
    frontier = visited.select("id")
    try:
        for d in range(1, max_depth + 1):
            nxt = (
                frontier.join(sym, frontier["id"] == sym["u"])
                .select(F.col("v").alias("id"))
                .distinct()
                .join(visited.select("id"), "id", "left_anti")
                .select("id", F.lit(d).alias("dist"))
                .localCheckpoint()
            )
            if nxt.rdd.isEmpty():
                break
            visited = visited.union(nxt).localCheckpoint()
            frontier = nxt.select("id")
    finally:
        und.unpersist()
    return visited
