"""Temporal operators Spark lacks as primitives: as-of join, range join,
hypertable-style cascading time rollups.

These are the time-series idioms a transcript/event pipeline needs around
the KG core (enrich each turn/event with the dimension version that was
current at its timestamp; bucket activity at multiple resolutions). Each
is a COMPOSITION of DataFrame ops — no UDFs — so Catalyst plans and
optimizes them like any other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``right_ts`` <= ``left_ts`` for the same key (backward, inclusive);
    NULL values when no right row precedes.

    NOT implemented as a join at all: both sides union into one stream
    per key, a single window pass carries the latest right payload
    forward (``last(..., ignorenulls)``), then left rows filter back out.
    One shuffle on the key, zero candidate-pair explosion — the classic
    scalable as-of shape (an inequality join would make Catalyst buffer
    every (left, right) key-pair candidate). Right rows sort BEFORE left
    rows at equal timestamps so the match is inclusive.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    uni = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = uni.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    return out


def range_join_count(
    facts: DataFrame,
    ranges: DataFrame,
    fact_ts: str,
    range_start: str,
    range_end: str,
    range_keys: list[str],
) -> DataFrame:
    """Count facts falling inside each [start, end) range → ranges + n_facts.

    Expressed as a conditional join so Catalyst can pick the physical
    strategy: broadcast-nested-loop when the range side is small (typical
    — ranges ≪ facts), or turn on AQE + a bucketed pre-filter for
    range-side blowup. The fact side is scanned once.
    """
    cond = (F.col(fact_ts) >= F.col(range_start)) & (
        F.col(fact_ts) < F.col(range_end)
    )
    joined = facts.join(F.broadcast(ranges), cond, "inner")
    return joined.groupBy(*range_keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_facts")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    agg_col: str,
    levels: tuple[str, ...] = ("1 hour", "1 day"),
) -> DataFrame:
    """Cascading time-bucketed rollup (TimescaleDB continuous-aggregate
    analog): the finest level aggregates the raw rows ONCE; every coarser
    level re-aggregates the level below it (sums of sums), so raw data is
    scanned exactly once no matter how many resolutions are materialized.

    → (level, bucket_start, *group_cols, n_rows, sum_val), all levels
    unioned. Correctness invariant (pinned by the oracle): the cascaded
    coarse levels equal direct aggregation of the raw rows.
    """
    finest = levels[0]
    cur = (
        df.groupBy(
            F.window(ts_col, finest).getField("start").alias("bucket_start"),
            *group_cols,
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(agg_col).cast("decimal(18,4)")).alias("__sum_dec"),
        )
    )
    out = cur.select(
        F.lit(finest).alias("level"), "bucket_start", *group_cols, "n_rows",
        F.col("__sum_dec").cast("double").alias("sum_val"),
    )
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(
                F.window("bucket_start", lvl).getField("start").alias("bucket_start"),
                *group_cols,
            )
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("__sum_dec").alias("__sum_dec"),
            )
        )
        out = out.unionByName(
            cur.select(
                F.lit(lvl).alias("level"), "bucket_start", *group_cols, "n_rows",
                F.col("__sum_dec").cast("double").alias("sum_val"),
            )
        )
    return out
