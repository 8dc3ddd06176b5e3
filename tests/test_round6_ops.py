"""Edge-case pins for the round-6 operators — behaviors the sf0.01
oracle entries can't exercise (guards, degenerate inputs, cache
contracts, estimator sanity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


# ----------------------------------------------------------- rules
def test_composition_rules_tiny_graph_exact(spark):
    """Hand-checkable 3-edge chain: a-[p]->x, x-[q]->c, a-[r]->c ⇒ the
    rule p∘q ⇒ r has support 1, body 1, confidence 1.0; PCA agrees."""
    from cdrc_semantic_search_spark.operators.rules import (
        composition_rules,
        composition_rules_pca,
    )

    e = spark.createDataFrame(
        [("a", "p", "x"), ("x", "q", "c"), ("a", "r", "c")],
        "subj_entity_id string, pred string, obj_entity_id string",
    )
    rows = {
        (r.p1, r.p2, r.p3): (r.support, r.body_pairs, r.confidence)
        for r in composition_rules(e).collect()
    }
    assert rows[("p", "q", "r")] == (1, 1, 1.0)
    pca = {
        (r.p1, r.p2, r.p3): (r.support, r.pca_body, r.pca_confidence)
        for r in composition_rules_pca(e).collect()
    }
    assert pca[("p", "q", "r")] == (1, 1, 1.0)


def test_inverse_relations_symmetry_counts(spark):
    """p recorded in both directions on one pair: overlap counts each
    mirrored fact (2 for the self-pair), jaccard = 2/(2+2-2) = 1.0."""
    from cdrc_semantic_search_spark.operators.rules import inverse_relations

    e = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a")],
        "subj_entity_id string, pred string, obj_entity_id string",
    )
    out = {(r.p1, r.p2): (r.overlap, r.jaccard) for r in inverse_relations(e).collect()}
    assert out[("p", "p")] == (2, 1.0)


# ----------------------------------------------------------- dedup / spans
def test_repeated_spans_short_docs_contribute_nothing(spark):
    """Documents shorter than span_tokens produce no windows — not a
    degenerate whole-doc span (that's the document-level family's job)."""
    from cdrc_semantic_search_spark.operators.dedup import repeated_spans

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, None)],
        "doc_id long, text string",
    )
    assert repeated_spans(df, "doc_id", "text", span_tokens=8).count() == 0


def test_repeated_spans_counts_within_and_across_docs(spark):
    from cdrc_semantic_search_spark.operators.dedup import repeated_spans

    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, span + " x " + span), (2, span + " y")],
        "doc_id long, text string",
    )
    out = {r.span: (r.n_docs, r.n_occurrences)
           for r in repeated_spans(df, "doc_id", "text", span_tokens=8).collect()}
    assert out[span] == (2, 3)  # twice in doc 1, once in doc 2


def test_blocking_quality_cache_handle_releases(spark):
    from cdrc_semantic_search_spark.operators.dedup import blocking_quality

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i}") for i in range(12)]
        + [(100 + i, f"alpha beta gamma delta epsilon {i}") for i in range(4)],
        "doc_id long, text string",
    )
    handle: list = []
    row = blocking_quality(df, "doc_id", "text", cache_handle=handle).collect()[0]
    assert row.n_docs == 16 and row.n_hit <= row.n_truth
    assert 0.0 <= row.pair_completeness <= 1.0
    assert handle, "composed persists must be exposed for release"
    for frame in handle:
        frame.unpersist()


def test_minhash_raw_pairs_mode_schema(spark):
    from cdrc_semantic_search_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "one two three four"), (2, "one two three four")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, "doc_id", "text")
    raw = minhash_lsh_pairs(sigs, "doc_id", min_est_jaccard=None)
    assert raw.columns == ["id_a", "id_b"]
    assert raw.count() == 1


# ----------------------------------------------------------- graph
def test_hyperball_m_guard_raises(spark):
    from cdrc_semantic_search_spark.operators.graph import (
        hyperball_ball_estimates,
        neighborhood_function,
    )

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        hyperball_ball_estimates(e, m=16)
    with pytest.raises(ValueError):
        neighborhood_function(e, m=16)


def test_khop_ball_matches_hand_graph(spark):
    """Path graph 1-2-3-4: 2-hop balls are 2,3,3,2 (self excluded)."""
    from cdrc_semantic_search_spark.operators.graph import khop_ball_sizes

    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    out = {r.id: r.ball_size for r in khop_ball_sizes(e, k=2).collect()}
    assert out == {1: 2, 2: 3, 3: 3, 4: 2}
    with pytest.raises(ValueError):
        khop_ball_sizes(e, k=9)


def test_neighborhood_function_monotone_and_bounded(spark):
    """N(t) is non-decreasing in t, and at t=0 every ball is {v} so the
    estimate sum ≈ |V| (HLL of a 1-element set is near-exact)."""
    from cdrc_semantic_search_spark.operators.graph import neighborhood_function

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    rows = sorted(
        (r.t, r.n_est) for r in neighborhood_function(e, max_t=3).collect()
    )
    ests = [v for _, v in rows]
    assert all(b >= a for a, b in zip(ests, ests[1:]))
    assert abs(ests[0] - 6.0) / 6.0 < 0.2


def test_wl_distinguishes_roles_and_merges_twins(spark):
    """Star 1-(2,3,4) plus isolated edge 5-6: the three star leaves share
    a color distinct from the hub; 5 and 6 share a color."""
    from cdrc_semantic_search_spark.operators.graph import wl_refinement

    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (5, 6)])
    c = {r.id: r.wl_color for r in wl_refinement(e, n_rounds=2).collect()}
    assert c[2] == c[3] == c[4] != c[1]
    assert c[5] == c[6]
    assert c[5] != c[2]  # degree-1 next to a hub ≠ degree-1 next to a leaf


def test_assortativity_star_is_negative(spark):
    """A star is maximally disassortative: r = -1."""
    from cdrc_semantic_search_spark.operators.graph import degree_assortativity

    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    row = degree_assortativity(e).collect()[0]
    assert row.n_edges == 4 and row.assortativity == -1.0


def test_linkpred_auc_perfect_separation(spark):
    """Positives with common neighbors vs negatives with none → AUC 1."""
    from cdrc_semantic_search_spark.operators.graph import linkpred_auc

    # K3 plus pendant 4: pair (1,2) shares neighbor 3; pair (1,9)/(2,9)
    # (9 absent from the graph) scores 0
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    pos = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    neg = spark.createDataFrame([(1, 9), (2, 9)], "a long, b long")
    row = linkpred_auc(e, pos, neg).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 1.0)


# ----------------------------------------------------------- split / psi
def test_distribution_psi_one_sided_category_is_null(spark):
    from cdrc_semantic_search_spark.operators.split import distribution_psi

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "src string")
    b = spark.createDataFrame([("x",), ("x",)], "src string")
    rows = {r.src: r for r in distribution_psi(a, b, "src").collect()}
    assert rows["y"].psi_term is None and rows["y"].n_b == 0
    assert rows["x"].psi_term is not None and rows["x"].psi_term >= 0.0


# ----------------------------------------------------------- alignment
def test_reciprocal_best_match_mutuality(spark):
    """b2 is nearest to BOTH a1 and a2, but its own top-1 is a1 — only
    (a1, b2) survives the reciprocity gate."""
    from cdrc_semantic_search_spark.operators.linking import reciprocal_best_match

    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1])], "vec_id long, embedding array<float>"
    )
    b = spark.createDataFrame(
        [(20, [1.0, 0.05])], "vec_id long, embedding array<float>"
    )
    out = reciprocal_best_match(a, b).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 20)]
