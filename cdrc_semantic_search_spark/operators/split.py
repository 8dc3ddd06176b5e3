"""Deterministic dataset splitting for training pipelines.

``df.randomSample``/``randomSplit`` are seed-dependent AND
partitioning-dependent — rerunning after a repartition reassigns rows,
which silently leaks validation data into training. The splitter here is
a pure function of the KEY: md5-bucket the key, threshold the buckets by
the requested fractions. Same row → same split, forever, on any engine
(md5 is portable, unlike xxhash64) — so the assignment is auditable in
DuckDB/Trino/pandas and stable across reprocessing runs at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, 10000): first 8 hex chars of md5(salt|key)."""
    digest = F.md5(F.concat_ws("|", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % _BUCKETS


def deterministic_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Attach ``out_col`` ∈ fractions.keys(), keyed purely on ``key_col``.

    Fractions must sum to 1 (±1e-9); assignment boundaries are cumulative
    bucket thresholds, so fractions hold in expectation (exact to 1/10000).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must not be empty")
    names = list(fractions)
    bounds = []
    acc = 0.0
    for name in names:
        acc += fractions[name]
        bounds.append(int(round(acc * _BUCKETS)))
    bucket = split_bucket(F.col(key_col), salt)
    col = F.lit(names[-1])
    for name, bound in reversed(list(zip(names[:-1], bounds[:-1]))):
        col = F.when(bucket < bound, F.lit(name)).otherwise(col)
    return df.withColumn(out_col, col)
