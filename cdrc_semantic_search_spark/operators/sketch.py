"""Mergeable sketches with DETERMINISTIC hashing.

Spark's built-in sketches (approx_count_distinct / HLL) return
engine-internal estimates that no external oracle can reproduce — fine
for monitoring, useless for a hash-pinned correctness gate. This module
implements the other workhorse sketch, count-min, from its public
definition (Cormode & Muthukrishnan 2005) with crc32-derived hash rows,
so the SAME counters fall out of any engine, any partitioning, any
cluster size — and a pure-Python twin can assert them bit-for-bit.

Scale contract: a CMS is the fixed-size answer to "how hot is key X?"
when the key space is too large to count exactly — d·w counters
(d rows × w columns) regardless of input size, built with ONE
map-side-combinable aggregation and merged across partitions/streams by
elementwise ADDITION.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def _cms_col(key, row: int, width: int, seed: int):
    """Column index of ``key`` in hash row ``row``: crc32 over the same
    bytes the pure-Python twin hashes (zlib.crc32 parity pinned by
    test_crc32_matches_spark)."""
    return F.pmod(
        F.crc32(
            F.concat_ws("|", F.lit(seed), F.lit(row), key).cast("binary")
        ),
        F.lit(width),
    ).cast("int")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Input rows → SPARSE count-min counters (row, col, cnt): for each
    of ``depth`` hash rows, cnt = number of input rows whose key hashes
    to (row, col). Zero counters are simply absent.

    100-TB shape: the per-row hash is Catalyst-only and all ``depth``
    hash rows come out of ONE scan via an array explode (a ``depth``-way
    unionAll would re-scan the input d times — Spark does not share scan
    subtrees across union branches; measured 4 lineage scans → 1 on the
    bench entry, guide §2.3 "don't compute things you throw away"). The
    d-fold explode happens before the map-side partial aggregation,
    which collapses every task's contribution to ≤ d·w rows, so the
    exchange carries O(tasks · d · w) — input-size independent, the
    whole point of a sketch. Merging two sketches (two time windows, two
    table shards, batch ⊕ stream) is ``unionAll → groupBy(row, col) →
    sum`` — additive, associative, exact: CMS(A ∪ B) == CMS(A) ⊕ CMS(B)
    bit-for-bit (pinned in test_count_min_merge_property).
    """
    rc = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, width, seed).alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(rc).alias("__rc"))
        .select(F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Point queries against a CMS: for each key, est = min over the
    ``depth`` rows of its counter (absent counter = 0). Guarantees
    est ≥ true count; overestimate bounded by collisions (≤ ⌈e·N/w⌉ with
    probability 1 − e^−d on adversary-free input).

    Plan: the probe side fans out ``depth`` rows per key (one scan, an
    array explode — same single-pass shape as the sketch build), joins
    the sketch on (row, col) — at scale the sketch side is ≤ d·w rows
    and broadcasts; the probe side never shuffles beyond its own
    per-key min aggregation.
    """
    rc = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, width, seed).alias("col"),
            )
            for i in range(depth)
        ]
    )
    probes = (
        keys.select(F.col(key_col).alias("key"), F.explode(rc).alias("__rc"))
        .select("key", F.col("__rc.row").alias("row"), F.col("__rc.col").alias("col"))
    )
    hit = probes.join(F.broadcast(sketch), ["row", "col"], "left").select(
        "key", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    return hit.groupBy("key").agg(F.min("cnt").alias("cms_est"))
