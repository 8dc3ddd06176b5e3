"""KG schema induction over materialized edge tables.

After canonicalization and graph materialize (the kg_edges rollup the
reference-derived pipeline emits — see plans/kg_pipeline.py), KG curators
mine the edge table itself for schema signal: which predicate
compositions imply other predicates (AMIE-style horn rules — Galárraga
et al., "AMIE: association rule mining under incomplete evidence in
ontological knowledge bases", WWW 2013 — public literature), which
predicates are functional (one object per subject → safe to use as a
canonical attribute), and which predicate pairs are inverses of each
other (candidate ontology merges). These run on the EDGE rollup, never
the raw triple stream: |edges| ≪ |triples| (the kg_edges weight already
folded observation multiplicity), and every aggregate below keys on
predicates or (subject, object) pairs — predicate key spaces are tiny,
the pair joins shuffle only ids.

All operators here are pure DataFrame compositions (no UDFs) and
deterministic; the small-n oracles are plain-dict twins in
plans/value_oracles.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.observe import (
    drop_observation,
    log_dropped_on_first_action,
)


def _typed_edges(edges: DataFrame) -> DataFrame:
    """Distinct (s, p, o) projection — rule semantics are set-based."""
    return edges.select(
        F.col("subj_entity_id").alias("s"),
        F.col("pred").alias("p"),
        F.col("obj_entity_id").alias("o"),
    ).distinct()


#: Hot-midpoint guard default: a midpoint x contributes in(x)·out(x)
#: body paths; 10⁶ bounds one midpoint's fan-out at the same order the
#: dedup family's DEFAULT_MAX_BUCKET allows a bucket (the KG super-hub
#: — "the", a country, a megacorp entity — is exactly the degenerate
#: key class those guards exist for). ``None`` = exact opt-out.
DEFAULT_MAX_MID_PATHS = 1_000_000


def _body_and_support(e: DataFrame, max_mid_paths: int | None = None):
    """Shared composition-rule derivation: (body_pairs, support) frames.
    body_pairs = distinct (p1, p2, a, c) endpoint pairs of a→[p1]→x→[p2]→c
    paths (a ≠ c), deduped BEFORE the head join so path multiplicity never
    reaches the second shuffle; support = per-(p1,p2,p3) count of body
    pairs that also carry a direct p3 edge. Both confidence variants rank
    through here — body semantics live in ONE place.

    ``max_mid_paths``: the scale guard. A super-hub midpoint x produces
    in(x)·out(x) body paths — quadratic in the hub's degree, the same
    blow-up class as a degenerate LSH bucket. Midpoints whose
    fan-in·fan-out exceeds the cap are dropped BEFORE the path join via
    the aggregate + broadcast-mark shape shared with the dedup guards
    (per-midpoint degree aggregates are map-side-partial tiny; only hot
    midpoints build the broadcast side); the dropped-edge count rides
    the caller's first action as an Observation, logged lazily — never
    silent, never an eager job. Rules THROUGH a hub are lost (a curator
    treats hub-mediated compositions as noise anyway); rules whose
    endpoints merely touch the hub survive via other midpoints.
    """
    e1 = e.select(
        F.col("s").alias("a"), F.col("p").alias("p1"), F.col("o").alias("x")
    )
    e2 = e.select(
        F.col("s").alias("x"), F.col("p").alias("p2"), F.col("o").alias("c")
    )
    if max_mid_paths is not None:
        out_deg = e.groupBy(F.col("s").alias("x")).agg(
            F.count(F.lit(1)).alias("_od")
        )
        in_deg = e.groupBy(F.col("o").alias("x")).agg(
            F.count(F.lit(1)).alias("_id")
        )
        hot = (
            in_deg.join(out_deg, "x")
            .filter(F.col("_id") * F.col("_od") > max_mid_paths)
            .select("x")
            .withColumn("_hot", F.lit(True))
        )
        obs = drop_observation("composition_rules")
        e1 = e1.join(F.broadcast(hot), "x", "left").observe(
            obs, F.count_if(F.col("_hot")).alias("dropped")
        )
        log_dropped_on_first_action(
            obs, "composition_rules", max_mid_paths,
            "p1-edges into hot midpoints",
        )
        e1 = e1.filter(F.col("_hot").isNull()).drop("_hot")
        obs2 = drop_observation("composition_rules_out")
        e2 = e2.join(F.broadcast(hot), "x", "left").observe(
            obs2, F.count_if(F.col("_hot")).alias("dropped")
        )
        log_dropped_on_first_action(
            obs2, "composition_rules", max_mid_paths,
            "p2-edges out of hot midpoints",
        )
        e2 = e2.filter(F.col("_hot").isNull()).drop("_hot")
    body_pairs = (
        e1.join(e2, "x")
        .filter(F.col("a") != F.col("c"))
        .select("p1", "p2", "a", "c")
        .dropDuplicates(["p1", "p2", "a", "c"])
    )
    heads = e.select(
        F.col("p").alias("p3"), F.col("s").alias("a"), F.col("o").alias("c")
    )
    support = (
        body_pairs.join(heads, ["a", "c"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return body_pairs, support


def composition_rules(
    edges: DataFrame,
    min_body: int = 1,
    max_mid_paths: int | None = DEFAULT_MAX_MID_PATHS,
) -> DataFrame:
    """AMIE-style composition rules p1(a,x) ∧ p2(x,c) ⇒ p3(a,c) with
    standard confidence.

    For every predicate pair (p1, p2): ``body_pairs`` = the DISTINCT
    (a, c) endpoint pairs connected by some a→[p1]→x→[p2]→c path
    (a ≠ c).  For every head predicate p3: ``support`` = how many of
    those endpoint pairs also carry a direct p3 edge;
    ``confidence`` = support / body_pairs (CWA standard confidence —
    the PCA variant adds a head-functionality filter; standard is the
    baseline both engines can agree on exactly).  Rules with
    support = 0 are not emitted (every (p1,p2) × p3 cross product would
    be |P|³ rows of zeros); body size is still reported so a consumer
    can rank by coverage.

    Scale shape: one midpoint equi-join over the distinct typed edge
    set produces body paths; a dropDuplicates collapses them to
    endpoint pairs BEFORE the head join (path multiplicity never
    reaches the second shuffle); the head join is an equi-join on
    (a, c); both aggregations key on predicate pairs/triples — a key
    space of |P|² / |P|³ with map-side partials, broadcast-small at any
    corpus size.  ``min_body`` prunes rare bodies AFTER the body count
    (a rule over 2 pairs is noise at any scale).
    """
    e = _typed_edges(edges)
    body_pairs, support = _body_and_support(e, max_mid_paths)
    body_n = body_pairs.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_pairs")
    ).filter(F.col("body_pairs") >= min_body)
    return (
        support.join(body_n, ["p1", "p2"])
        .withColumn(
            "confidence",
            F.round(F.col("support") / F.col("body_pairs"), 6),
        )
        .select("p1", "p2", "p3", "support", "body_pairs", "confidence")
    )


def predicate_functionality(edges: DataFrame) -> DataFrame:
    """Per-predicate functionality profile (AMIE §Functionality):
    ``fun(p) = #distinct subjects / #distinct (s,o) facts`` — 1.0 means
    every subject has exactly one object (a safe canonical attribute);
    ``inv_fun`` is the object-side mirror.  One aggregation over the
    distinct typed edge set, keyed on predicate (map-side partials
    collapse each task to |P| rows)."""
    e = _typed_edges(edges)
    return (
        e.groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.count_distinct("s").alias("n_subjects"),
            F.count_distinct("o").alias("n_objects"),
        )
        .withColumn(
            "functionality", F.round(F.col("n_subjects") / F.col("n_facts"), 6)
        )
        .withColumn(
            "inv_functionality",
            F.round(F.col("n_objects") / F.col("n_facts"), 6),
        )
        .select(
            F.col("p").alias("pred"),
            "n_facts", "n_subjects", "n_objects",
            "functionality", "inv_functionality",
        )
    )


def inverse_relations(edges: DataFrame) -> DataFrame:
    """Inverse-predicate candidates: (p1, p2) scored by how much of p1
    is mirrored by p2 — ``overlap`` = #{(a,b) : p1(a,b) ∧ p2(b,a)},
    ``jaccard`` = overlap / |p1 ∪ reversed(p2)| (symmetric, so the
    output is restricted to p1 ≤ p2 — p1 = p2 measures a predicate's
    own symmetry).  Ontology-merge feed: a high-jaccard pair is one
    relation recorded in both directions.

    Scale shape: a single equi-join of the typed edge set against its
    own reversal on the (s, o) pair — ids only, predicates ride along;
    union sizes come from per-predicate fact counts (tiny aggregate)
    joined in by predicate, inclusion–exclusion gives the denominator.
    Zero-overlap pairs are never materialized."""
    e = _typed_edges(edges)
    rev = e.select(
        F.col("o").alias("s"), F.col("p").alias("p2"), F.col("s").alias("o")
    )
    overlap = (
        e.join(rev, ["s", "o"])
        .filter(F.col("p") <= F.col("p2"))
        .groupBy(F.col("p").alias("p1"), F.col("p2"))
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    counts = e.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    n1 = counts.select(F.col("p").alias("p1"), F.col("n").alias("n1"))
    n2 = counts.select(F.col("p").alias("p2"), F.col("n").alias("n2"))
    return (
        overlap.join(n1, "p1")
        .join(n2, "p2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("overlap")
                / (F.col("n1") + F.col("n2") - F.col("overlap")),
                6,
            ),
        )
        .select("p1", "p2", "overlap", "n1", "n2", "jaccard")
    )


def composition_rules_pca(
    edges: DataFrame,
    min_body: int = 1,
    max_mid_paths: int | None = DEFAULT_MAX_MID_PATHS,
) -> DataFrame:
    """Composition rules under the PARTIAL COMPLETENESS ASSUMPTION
    (AMIE's headline confidence): the denominator counts only body
    endpoint pairs (a, c) where subject ``a`` has at least ONE p3 edge
    to ANY object — a KB that lists some of a's p3 facts is assumed
    complete FOR a, while a subject with no p3 facts at all is treated
    as unknown rather than a counterexample.  PCA confidence therefore
    ≥ standard confidence, and ranks rules better on incomplete KGs
    (Galárraga et al. 2013, §4.2).

    Scale shape: identical to :func:`composition_rules` plus one extra
    semi-join-shaped aggregate — the (subject, p3) presence set is a
    DISTINCT projection of the edge table (map-side partials), joined
    to the body pairs on the subject id.
    """
    e = _typed_edges(edges)
    body_pairs, support = _body_and_support(e, max_mid_paths)
    # PCA denominator: body pairs whose subject has ANY p3 edge
    subj_has = e.select(F.col("p").alias("p3"), F.col("s").alias("a")).distinct()
    pca_body = (
        body_pairs.join(subj_has, "a")
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).alias("pca_body"))
        .filter(F.col("pca_body") >= min_body)
    )
    return (
        support.join(pca_body, ["p1", "p2", "p3"])
        .withColumn(
            "pca_confidence",
            F.round(F.col("support") / F.col("pca_body"), 6),
        )
        .select("p1", "p2", "p3", "support", "pca_body", "pca_confidence")
    )
