"""Canonicalization: connected components over high-similarity pairs.

The reference groups near-identical chunks under one parent id at query
time (/root/reference/src/model.py:20-23); the KG graft generalizes this
to surface-form canonicalization: mention surfaces whose embeddings are
cosine-similar ≥ τ (candidates via LSH buckets, operators/similarity.py)
are one surface cluster; each cluster gets the lexicographically smallest
member as canonical id.

Connected components is iterative **component-level min propagation**
(implicit contraction) on DataFrames — no GraphFrames dependency
(SURVEY §4.3). Per round, every edge is relabeled through the CURRENT
labels, so the minimum floods across whole merged blobs — not one hop —
per iteration:

    m(c)     ← min over edges incident to component c of the other
               endpoint's label
    label(v) ← min(label(v), m(label(v)), old-label chain jump)

The old label rides along as a column, the changed-row count is collected
by an ``Observation`` on the SAME ``localCheckpoint`` action — one Spark
job per round, no separate convergence-probe job. Labels are seeded at
min(id, min direct neighbor) — folded into the vertex-set aggregation,
so the head start is free. Measured on the bench graph: 4 rounds /
~1.6 s vs 8 rounds / ~4.5 s for classic 1-hop label propagation with a
join probe (both O(log n) rounds; contraction has the smaller constant
because merged components share discoveries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.operators.similarity import cosine_pairs_lsh


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """edges(src, dst) → (id, component) where component = min id reachable.

    Vertices = every id appearing in edges. Deterministic for any input
    order (min is commutative); isolated vertices aren't represented —
    callers left-join and coalesce to the vertex's own id.

    100-TB shape: per round, two equi-join relabels of the edge list + a
    min groupBy on component (partial agg collapses each partition to one
    row per component — hot-component skew never reaches the shuffle) + a
    broadcast-size label update join. ``localCheckpoint`` truncates lineage
    so round N's plan never re-optimizes rounds 1..N-1.
    """
    import uuid

    if max_iter < 1:
        # zero rounds would return identity labels while bypassing the
        # non-convergence guard below
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    # lazy: materializes (and truncates lineage) inside round 1's job
    # instead of paying a separate blocking job up front; every later
    # round reads the cached partitions either way. Only the per-round
    # checkpoint must stay eager — its Observation feeds the loop exit.
    sym = sym.localCheckpoint(eager=False)
    # seed labels at min(id, min direct neighbor) instead of identity:
    # the vertex set was a distinct() (a groupBy in disguise) anyway, so
    # folding the neighbor-min into that same aggregation costs nothing
    # and starts the loop one propagation step ahead — measured one full
    # round saved (5 -> 4 on the bench graph, ~30% wall). Any label that
    # is the min over a subset of REACHABLE vertices is a valid start.
    labels = (
        sym.groupBy(F.col("a").alias("id"))
        .agg(F.min("b").alias("__nb"))
        .select("id", F.least(F.col("id"), F.col("__nb")).alias("component"))
        .localCheckpoint(eager=False)  # same lazy-seed rationale as sym
    )
    last_changed = 0
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # relabel both edge endpoints through the current labels, then take
        # the min opposing label PER COMPONENT (not per vertex): every vertex
        # of a blob benefits from the best edge anywhere on its frontier
        la = labels.select(F.col("id").alias("a"), F.col("component").alias("ca"))
        lb = labels.select(F.col("id").alias("b"), F.col("component").alias("cb"))
        comp_min = (
            sym.join(la, "a")
            .join(lb, "b")
            .groupBy("ca")
            .agg(F.min("cb").alias("m"))
        )
        upd = labels.join(
            comp_min, labels["component"] == comp_min["ca"], "left"
        ).select(
            "id",
            F.col("component").alias("old_component"),
            F.least(F.col("component"), F.coalesce("m", F.col("component"))).alias(
                "component"
            ),
        )
        # pointer jump through the previous round's labels compresses
        # label→label chains one extra step per round
        parent = labels.select(
            F.col("id").alias("component"), F.col("component").alias("grand")
        )
        jumped = upd.join(parent, "component", "left").select(
            "id",
            "old_component",
            F.least(F.col("component"), F.coalesce("grand", "component")).alias(
                "component"
            ),
        )
        # uuid name: Observation names must be unique per SparkSession, and
        # concurrent connected_components calls may share one session
        obs = Observation(f"__cc_round_{uuid.uuid4().hex}")
        new_labels = (
            jumped.select(
                "id",
                "component",
                (F.col("component") != F.col("old_component")).cast("int").alias("__chg"),
            )
            .observe(obs, F.sum("__chg").alias("chg"))
            .localCheckpoint()
        )
        labels = new_labels.drop("__chg")
        # labels are monotone non-increasing, so zero changed rows is exact
        # convergence; the Observation rode the checkpoint action — the
        # probe costs NO extra job
        last_changed = obs.get["chg"] or 0
        if last_changed == 0:
            break
    if stats is not None:
        # observability for benches/callers: rounds includes the final
        # zero-change confirmation round
        stats.update({"rounds": rounds, "last_changed": int(last_changed)})
    if last_changed != 0:
        # unconverged labels are WRONG (over-split components) — never let
        # that propagate silently into canonical ids
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({last_changed} labels still changing); raise max_iter "
            "(component diameter shrinks ~exponentially per round, so a "
            "few extra rounds cover any realistic graph)"
        )
    return labels


def canonicalize_embedded(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    seed: int = 42,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """→ (id, canonical_id): cluster rows whose embeddings reach cosine ≥
    threshold through any path; canonical = min id in the component.

    SIZE THE BUCKET SPACE TO THE CORPUS: each band hashes to
    2^(n_planes/n_bands) buckets, and candidate generation is quadratic
    IN THE BUCKET. The 16/4 default (16 buckets per band) is right for
    thousands of rows; at N rows pick n_planes/n_bands ≳ log2(N/target)
    so buckets hold ~target (tens) of rows — e.g. 48/4 (4096 buckets)
    at 10^5, 96/4 at 10^8. More planes per band also lowers per-band
    recall for borderline pairs (p^(planes/band)); compensate with more
    bands if the threshold is loose. Measured: 20k near-dup surfaces
    take 125 s to pair at 16/4 and ~5 s at 48/4 (scripts/
    inc_canon_bench.py).
    """
    caches: list = []
    pairs = cosine_pairs_lsh(
        df, id_col, vec_col, dim, threshold, seed=seed,
        n_planes=n_planes, n_bands=n_bands, cache_handle=caches,
    )
    comp = connected_components(pairs)
    # connected_components eagerly checkpointed its edge list, so the LSH
    # candidate cache inside cosine_pairs_lsh is fully consumed — release
    # it rather than pinning executor storage for the session's lifetime
    for cached in caches:
        cached.unpersist()
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("canonical_id"))
    )


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Fold a batch of NEW edges into CONVERGED labels without touching
    the full graph — the canonicalization-maintenance kernel: at 10^12
    mentions the component labels are a materialized table and each new
    micro-batch of high-similarity pairs must update it in time
    proportional to the BATCH, not the graph.

    Exactness: full-rebuild labels assign component = min reachable id.
    Converged labels are already component minima, so contracting every
    new edge through the old labels (unknown endpoints label themselves)
    yields a component-level graph whose CC minima equal the true minima
    over the unioned edge set — ``incremental_components(cc(E1), E2) ≡
    cc(E1 ∪ E2)``, pinned in tests against randomized graphs.

    100-TB shape: the contracted graph has O(|new_edges|) edges —
    :func:`connected_components` runs on that, never on the full graph.
    The label patch is one equi-join of the big labels table against the
    contracted mapping (≤ 2·|new_edges| rows — AQE broadcasts it, so the
    labels table never shuffles); new vertices union in. No stage's cost
    grows with |old graph| except the map-only patch scan itself.

    ``labels`` must be converged (id, component) output of
    :func:`connected_components` / this function — feeding unconverged
    labels breaks the minima-contraction argument.

    Storage boundary between generations: pass ``labels`` read back from
    a TABLE (as the catalog compaction path does), not a chain of
    in-memory localCheckpoints. Spark's localCheckpoint preserves the
    child plan's sizeInBytes into the LogicalRDD, so repeated
    checkpoint→join→checkpoint generations compound Catalyst's BigInt
    size estimate exponentially until query PLANNING (bignum
    multiplication inside the stats visitor) dominates wall time; a
    parquet scan resets the estimate to file size. Measured in
    scripts/inc_canon_bench.py (a 3-generation in-memory chain stalled
    planning for minutes; the table round-trip is flat).
    """
    e = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ca = labels.select(F.col("id").alias("a"), F.col("component").alias("ca"))
    cb = labels.select(F.col("id").alias("b"), F.col("component").alias("cb"))
    rel = (
        e.join(ca, "a", "left")
        .join(cb, "b", "left")
        .select(
            F.coalesce("ca", "a").alias("id_a"),
            F.coalesce("cb", "b").alias("id_b"),
        )
    )
    contracted = rel.filter(F.col("id_a") != F.col("id_b")).distinct()
    # the contracted graph is batch-sized; localCheckpoint inside
    # connected_components cuts its lineage back to this materialization
    mapping = connected_components(
        contracted, max_iter=max_iter, stats=stats
    ).select(F.col("id").alias("old_label"), F.col("component").alias("merged"))

    patched = (
        labels.join(mapping, labels["component"] == mapping["old_label"], "left")
        .select(
            "id",
            F.coalesce("merged", "component").alias("component"),
        )
    )
    new_vertices = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .join(labels.select("id"), "id", "left_anti")
    )
    new_labels = new_vertices.join(
        mapping, new_vertices["id"] == mapping["old_label"], "left"
    ).select(
        "id",
        # a new vertex with only self-loop / intra-batch-redundant edges
        # never reaches the contracted graph: it is its own component
        F.coalesce("merged", "id").alias("component"),
    )
    return patched.unionByName(new_labels)


def clustering_pair_quality(
    df: DataFrame,
    item_col: str = "surface",
    cluster_col: str = "canonical_surface",
    label_col: str = "entity_id",
) -> DataFrame:
    """Pair-counting quality of a clustering against gold labels — the
    canonicalization-evaluation operator behind the north rule's
    "P/R ≥ 0.95 vs reference" framing: given (item, predicted cluster,
    gold label) rows, score how well the clusters reproduce the gold
    partition over the item PAIRS.

        tp_pairs   = pairs sharing BOTH cluster and gold label
        pred_pairs = pairs sharing a cluster
        gold_pairs = pairs sharing a gold label
        precision  = tp/pred, recall = tp/gold (Rand-style pair P/R)

    One row out: (n_items, tp_pairs, pred_pairs, gold_pairs, precision,
    recall). Counts are INTEGER-exact (sums of C(n,2) terms — no float
    accumulation in the hashable core); precision/recall are a single
    IEEE division of those integers, identical on every engine.

    Contract: one row per item (the shape :meth:`KGPipeline.
    surface_clusters` emits); rows with a NULL gold label (unlinked
    surfaces — no gold class) are excluded from the universe.

    100-TB shape: one exchange on (cluster, label) with map-side
    combine; cluster/label marginals re-aggregate the contingency
    counts (already collapsed to the number of DISTINCT (cluster,
    label) cells, ≪ items); the three 1-row totals meet in broadcast
    cross joins. Nothing is ever quadratic in items — C(n,2) is
    arithmetic on counts, never a pair join.

    Reference anchor: the reference evaluates retrieval quality by
    comparing grouped chunk parents against expected groupings
    (/root/reference/src/evaluation.py:29-38); this is that check as a
    distributed operator.
    """
    base = df.filter(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("item"),
        F.col(cluster_col).alias("cluster"),
        F.col(label_col).alias("label"),
    )
    cg = base.groupBy("cluster", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_cg")
    )

    def _pairs(n):
        return (n * (n - F.lit(1))) / F.lit(2)

    tp = cg.agg(
        F.sum(_pairs(F.col("n_cg"))).cast("long").alias("tp_pairs"),
        F.sum("n_cg").cast("long").alias("n_items"),
    )
    pred = (
        cg.groupBy("cluster")
        .agg(F.sum("n_cg").alias("n_c"))
        .agg(F.sum(_pairs(F.col("n_c"))).cast("long").alias("pred_pairs"))
    )
    gold = (
        cg.groupBy("label")
        .agg(F.sum("n_cg").alias("n_g"))
        .agg(F.sum(_pairs(F.col("n_g"))).cast("long").alias("gold_pairs"))
    )
    out = tp.crossJoin(F.broadcast(pred)).crossJoin(F.broadcast(gold))
    return out.select(
        "n_items",
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        F.when(
            F.col("pred_pairs") > 0,
            F.round(F.col("tp_pairs") / F.col("pred_pairs"), 6),
        ).alias("precision"),
        F.when(
            F.col("gold_pairs") > 0,
            F.round(F.col("tp_pairs") / F.col("gold_pairs"), 6),
        ).alias("recall"),
    )
