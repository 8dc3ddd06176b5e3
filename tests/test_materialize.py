from __future__ import annotations

from pyspark.sql import functions as F

from cdrc_semantic_search_spark.config import Settings
from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline
from cdrc_semantic_search_spark.sources.catalog import ParquetTableCatalog


def test_materialize_all_tables(spark, fixture, spark_fixture, tmp_path):
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    cat = ParquetTableCatalog(str(tmp_path / "kg"))
    counts = pipe.materialize(tdf, cat)
    assert counts["triples"] > 0
    assert counts["mentions"] > counts["triples"]
    assert counts["kg_nodes"] == len(fixture.entities)
    assert 0 < counts["kg_edges"] <= counts["triples"]
    assert counts["surface_clusters"] > 0

    # edge weights sum to triple count
    edges = cat.read_table(spark, "kg_edges")
    assert edges.agg(F.sum("weight")).collect()[0][0] == counts["triples"]

    # every canonical surface is a member of its own cluster
    sc = cat.read_table(spark, "surface_clusters").toPandas()
    surfaces = set(sc["surface"])
    assert set(sc["canonical_surface"]) <= surfaces
    # clusters group same-entity variants: canonical surface maps to the
    # same entity for the vast majority of members (embedding clusters of
    # typo variants)
    canon_entity = dict(zip(sc["surface"], sc["entity_id"]))
    agree = sum(
        1 for s, c in zip(sc["surface"], sc["canonical_surface"])
        if canon_entity.get(c) == canon_entity.get(s)
    )
    assert agree / len(sc) > 0.9


def test_pagerank_over_materialized_kg_edges(spark, fixture, spark_fixture):
    """Graph analytics consume the pipeline's own edge table: the highest-
    PageRank entity must be one of the most-connected entities (hub
    entities accrue rank from their many neighbors)."""
    from cdrc_semantic_search_spark.operators.graph import pagerank_fixed

    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    edges = pipe.kg_edges(pipe.triples(tdf))
    pr = pagerank_fixed(
        edges, src="subj_entity_id", dst="obj_entity_id", n_iter=5
    ).toPandas()
    assert len(pr) > 0 and abs(pr["rank"].sum()) <= 1.0 + 1e-9
    top = pr.sort_values(["rank", "id"], ascending=[False, True]).iloc[0]["id"]
    deg = (
        edges.select(F.col("obj_entity_id").alias("id"))
        .groupBy("id").count().toPandas().set_index("id")["count"]
    )
    assert deg.get(top, 0) >= deg.quantile(0.9)  # top-ranked is a hub


def test_surface_clusters_group_typo_variants(spark, fixture, spark_fixture):
    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    sc = pipe.surface_clusters(pipe.mentions(tdf)).toPandas()
    # at least some multi-member clusters exist (typo/case variants of the
    # same canonical name cluster together)
    sizes = sc.groupby("canonical_surface").size()
    assert (sizes > 1).any()


def test_merge_edge_deltas_weights_and_spans(spark):
    """merge(kg_edges(A), kg_edges(B)) ≡ kg_edges(A ∪ B): weights add and
    activity spans extend; one-sided edges survive untouched."""
    from datetime import datetime

    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    def ts(d):
        return datetime(2026, 1, d)

    cols = "subj_entity_id string, pred string, obj_entity_id string, ts timestamp"
    a = spark.createDataFrame(
        [("E1", "p", "E2", ts(1)), ("E1", "p", "E2", ts(3)), ("E3", "q", "E4", ts(5))],
        cols,
    )
    b = spark.createDataFrame(
        [("E1", "p", "E2", ts(2)), ("E5", "r", "E6", ts(9))], cols
    )
    pipe_edges = KGPipeline.merge_edge_deltas  # static
    ea, eb = (
        x.groupBy("subj_entity_id", "pred", "obj_entity_id").agg(
            F.count(F.lit(1)).cast("long").alias("weight"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        for x in (a, b)
    )
    merged = {
        (r.subj_entity_id, r.pred, r.obj_entity_id): (r.weight, r.first_ts, r.last_ts)
        for r in pipe_edges(ea, eb).collect()
    }
    full = {
        (r.subj_entity_id, r.pred, r.obj_entity_id): (r.weight, r.first_ts, r.last_ts)
        for r in a.unionByName(b)
        .groupBy("subj_entity_id", "pred", "obj_entity_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("weight"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert merged == full
    assert merged[("E1", "p", "E2")][0] == 3  # 2 + 1
    assert merged[("E3", "q", "E4")] == (1, ts(5), ts(5))  # A-only edge intact


def test_merge_node_deltas_counts_add_and_dim_survives(spark):
    """merge(kg_nodes(A), kg_nodes(B)): mention counts add; dim attributes
    survive from whichever side has the row; zero-count rows don't vanish."""
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    cols = "entity_id string, canonical_name string, entity_type string, n_mentions long"
    a = spark.createDataFrame(
        [("E1", "Leeds", "place", 5), ("E2", "Python", "tool", 0)], cols
    )
    b = spark.createDataFrame(
        [("E1", "Leeds", "place", 2), ("E3", "Footfall", "dataset", 7)], cols
    )
    got = {
        r.entity_id: (r.canonical_name, r.entity_type, r.n_mentions)
        for r in KGPipeline.merge_node_deltas(a, b).collect()
    }
    assert got == {
        "E1": ("Leeds", "place", 7),
        "E2": ("Python", "tool", 0),
        "E3": ("Footfall", "dataset", 7),
    }
