"""Focused tests for the scale-adaptive parallelism helpers.

fan_out / fan_in are conditional no-ops by design: they may only act on
degenerate partitionings (single-task scans / hundreds of near-empty
partitions) and must leave well-shaped production layouts untouched.
These tests pin the activation conditions and that neither helper ever
changes the row multiset.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.scale import fan_in, fan_out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fan_out_spreads_single_partition(spark):
    df = spark.range(0, 1000).coalesce(1).select(F.col("id"))
    out = fan_out(df)
    assert df.rdd.getNumPartitions() == 1
    assert out.rdd.getNumPartitions() == max(
        2, spark.sparkContext.defaultParallelism // 4
    )
    assert _rows(out) == _rows(df)


def test_fan_out_noop_when_already_wide(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par)
    assert fan_out(df) is df


def test_fan_in_merges_overpartitioned_small_frame(spark):
    par = spark.sparkContext.defaultParallelism
    # tiny frame in 4x more partitions than task slots; localCheckpoint
    # gives the optimizer a known (small) sizeInBytes, as the production
    # callers' materialized inputs do
    df = spark.range(0, 1000).repartition(par * 4).localCheckpoint()
    out = fan_in(df)
    assert out.rdd.getNumPartitions() == par
    assert _rows(out) == _rows(df)


def test_fan_in_noop_at_or_below_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par)
    assert fan_in(df) is df


def test_fan_in_requires_at_least_halving(spark):
    # barely over-partitioned frames (merge would cut < 2x) keep their
    # scan layout: disturbing a near-right partitioning buys nothing
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par + 1).localCheckpoint()
    assert fan_in(df) is df


def test_fan_in_respects_byte_bound(spark):
    # partitions that would merge past the byte bound stay as they are:
    # with max_bytes_per_task=1, the ideal task count >= current count,
    # so the helper must not touch the frame
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par * 4).localCheckpoint()
    assert fan_in(df, max_bytes_per_task=1) is df


def test_fan_in_leaves_non_starved_partitions_alone(spark):
    # partitions at or above the starvation threshold keep their layout
    # even though a merge would satisfy the post-merge byte bound —
    # merging non-starved partitions into long serial python tasks was
    # measured to cost throughput (see fan_in's docstring). Threshold
    # lowered so the small fixture sits above it, exercising the guard.
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(par * 4).localCheckpoint()
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert size // df.rdd.getNumPartitions() >= 1, "fixture has zero estimate"
    assert fan_in(df, starved_partition_bytes=1) is df


def test_fused_extraction_results_unchanged_by_input_partitioning(
    spark, fixture, spark_fixture
):
    # the fan_in inside the fused extraction operator must not change
    # the triple multiset, whatever the input partitioning
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    tdf, _ = spark_fixture
    pipe = KGPipeline(spark, fixture.entities, Settings())
    par = spark.sparkContext.defaultParallelism
    wide = tdf.repartition(par * 4).localCheckpoint()
    a = _rows(pipe.triples(tdf))
    b = _rows(pipe.triples(wide))
    assert a == b
