"""The correctness gate (BASELINE.json): triple P/R ≥ 0.95 + per-turn text
equality under stable (conv_id, turn_idx) ordering."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.config import Settings
from cdrc_semantic_search_spark.oracle import oracle_triples, precision_recall
from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

KEY = ["conv_id", "turn_idx", "subj_entity_id", "pred", "obj_entity_id"]


def test_oracle_matches_ground_truth(fixture):
    pred = oracle_triples(fixture.transcripts, fixture.entities, Settings())
    p, r = precision_recall(pred, fixture.truth_triples)
    assert p >= 0.95, f"oracle precision {p:.3f}"
    assert r >= 0.95, f"oracle recall {r:.3f}"


def test_spark_matches_ground_truth(spark, fixture, spark_fixture):
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    got = pipe.triples(tdf).toPandas()
    p, r = precision_recall(got, fixture.truth_triples)
    assert p >= 0.95, f"spark precision {p:.3f}"
    assert r >= 0.95, f"spark recall {r:.3f}"


def test_spark_triples_equal_oracle_exactly(spark, fixture, spark_fixture):
    """Spark and the single-process oracle share extraction + encoder bits;
    their triple sets must be identical, not merely close."""
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    got = pipe.triples(tdf).toPandas()
    want = oracle_triples(fixture.transcripts, fixture.entities, Settings())
    got_set = {tuple(t) for t in got[KEY].itertuples(index=False)}
    want_set = {tuple(t) for t in want[KEY].itertuples(index=False)}
    assert got_set == want_set


def test_spark_equals_oracle_per_mode(spark, fixture, spark_fixture):
    """Spark ≡ oracle for EVERY query_mode of the reference enum
    (utils.py:30) — guards the mode plumbing end-to-end (the round-1 oracle
    silently stayed hybrid; ADVICE.md)."""
    from cdrc_semantic_search_spark.config import RetrievalSettings

    tdf, _ = spark_fixture
    for mode in ("default", "sparse", "hybrid"):
        settings = Settings(retrieval=RetrievalSettings(query_mode=mode))
        pipe = KGPipeline(spark, fixture.entities, settings)
        got = pipe.triples(tdf).toPandas()
        want = oracle_triples(fixture.transcripts, fixture.entities, settings)
        got_set = {tuple(t) for t in got[KEY].itertuples(index=False)}
        want_set = {tuple(t) for t in want[KEY].itertuples(index=False)}
        assert got_set == want_set, f"mode={mode}: spark/oracle triple sets differ"


def test_fused_equals_joined_plan(spark, fixture, spark_fixture):
    """The map-only fused plan and the broadcast-join plan must emit the
    same triple set — the plans differ only physically."""
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    fused = {tuple(r) for r in pipe.triples(tdf).select(*KEY).collect()}
    joined = {tuple(r) for r in pipe.triples_joined(tdf).select(*KEY).collect()}
    assert fused == joined


def test_per_turn_text_equality_under_stable_ordering(spark, fixture, spark_fixture):
    """input_hint invariant: after flowing through the engine's window
    ordering, every (conv_id, turn_idx) carries byte-identical text."""
    tdf, _ = spark_fixture
    from cdrc_semantic_search_spark.operators.assembly import with_turn_order

    out = (
        with_turn_order(tdf)
        .select("conv_id", "turn_idx", "text", "rn")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    src = (
        fixture.transcripts[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["conv_id", "turn_idx", "text"]], src)
    # rn is dense and equals turn_idx + 1 (turn_idx is 0-based dense)
    assert (out["rn"] == out["turn_idx"] + 1).all()


def test_arrow_variant_equals_pandas_fused(spark, fixture, spark_fixture):
    """mapInArrow and mapInPandas fused operators are bit-equal twins
    (measured same-speed at 1.2M turns; kept for the pyarrow-native path)."""
    from cdrc_semantic_search_spark.operators.extraction import (
        extract_linked_triples,
        extract_linked_triples_arrow,
    )

    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    a = extract_linked_triples(tdf, pipe.bc_catalogue, pipe.bc_index, 0.75, 0.0)
    b = extract_linked_triples_arrow(tdf, pipe.bc_catalogue, pipe.bc_index, 0.75, 0.0)
    assert a.select(*KEY).exceptAll(b.select(*KEY)).count() == 0
    assert b.select(*KEY).exceptAll(a.select(*KEY)).count() == 0


def test_parity_at_canonical_fixture_size(spark):
    """The P/R ≥ 0.95 gate at the FIXTURES.md §1 spec size (200
    conversations / 500 entities — harder linking than the small fixture;
    measured ≈ 0.977, α=0.75 optimal across the sweep)."""
    from cdrc_semantic_search_spark import fixtures as fxmod

    fx = fxmod.generate(seed=42, n_conversations=200, n_entities=500)
    tdf, _ = fxmod.to_spark(spark, fx)
    pipe = KGPipeline(spark, fx.entities, Settings())
    got = pipe.triples(tdf).toPandas()
    p, r = precision_recall(got, fx.truth_triples)
    assert p >= 0.95, f"precision {p:.4f}"
    assert r >= 0.95, f"recall {r:.4f}"


def test_triple_scores_bounded(spark, fixture, spark_fixture):
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    got = pipe.triples(tdf).agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()[0]
    assert 0.0 <= got["lo"] <= got["hi"] <= 1.0


def test_entity_cooccurrence_matches_hand_math(spark, fixture, spark_fixture):
    """entity_cooccurrence ≡ hand-computed lift over per-conversation
    distinct entity sets derived from the same mentions frame."""
    from collections import defaultdict

    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline
    from cdrc_semantic_search_spark.config import Settings

    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    mentions = pipe.mentions(tdf)
    rows = mentions.filter("entity_id IS NOT NULL").select(
        "conv_id", "entity_id"
    ).collect()
    sets = defaultdict(set)
    for r in rows:
        sets[r.conv_id].add(r.entity_id)
    n = len(sets)
    df_count = defaultdict(int)
    pair_count = defaultdict(int)
    for ents in sets.values():
        for e in ents:
            df_count[e] += 1
        es = sorted(ents)
        for i in range(len(es)):
            for j in range(i + 1, len(es)):
                pair_count[(es[i], es[j])] += 1
    want = {
        (a, b): (c, c * n / (df_count[a] * df_count[b]))
        for (a, b), c in pair_count.items()
        if c >= 2
    }
    got = {
        (r.token_a, r.token_b): (r.n_ab, r.lift)
        for r in KGPipeline.entity_cooccurrence(mentions).collect()
    }
    assert got == want
    assert len(got) > 0


def test_pipeline_collective_and_communities(spark, fixture):
    """The two new pipeline stages run end-to-end on the fixture: every
    collectively-linked mention resolves to a catalogue entity, flipping
    is bounded to coherence (support never below 1), and
    entity_communities yields one community per entity with the
    modularity gate passing at a permissive floor and raising at an
    impossible one."""
    import pytest as _pytest

    from cdrc_semantic_search_spark import fixtures as fx_mod
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    tdf, _ = fx_mod.to_spark(spark, fixture)
    pipe = KGPipeline(spark, fixture.entities)
    cm = pipe.collective_mentions(tdf).collect()
    assert cm, "fixture has mentions"
    eids = set(fixture.entities.entity_id)
    assert all(r["entity_id"] in eids for r in cm)
    assert all(r["support"] >= 1 for r in cm)

    edges = pipe.kg_edges(pipe.triples(tdf))
    comm = pipe.entity_communities(edges, min_modularity=-1.0)
    rows = comm.collect()
    assert len(rows) == len({r["entity_id"] for r in rows})
    with _pytest.raises(ValueError, match="modularity"):
        pipe.entity_communities(edges, min_modularity=1.0)


def test_edge_diff_statuses(spark):
    """Hand case: edge A only old → removed; B only new → added; C
    weight 2→5 → changed; D equal → stable; weights coalesce to 0 on
    the absent side."""
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    old = spark.createDataFrame(
        [("A", "p", "X", 1), ("C", "p", "X", 2), ("D", "p", "X", 3)],
        "subj_entity_id string, pred string, obj_entity_id string, weight long",
    )
    new = spark.createDataFrame(
        [("B", "p", "X", 4), ("C", "p", "X", 5), ("D", "p", "X", 3)],
        "subj_entity_id string, pred string, obj_entity_id string, weight long",
    )
    got = {
        r["subj_entity_id"]: (r["w_old"], r["w_new"], r["status"])
        for r in KGPipeline.edge_diff(old, new).collect()
    }
    assert got == {
        "A": (1, 0, "removed"),
        "B": (0, 4, "added"),
        "C": (2, 5, "changed"),
        "D": (3, 3, "stable"),
    }
