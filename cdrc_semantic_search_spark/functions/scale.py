"""Scale-adaptive parallelism helpers.

Guide §2.5 (input skew): "one huge unsplittable file … fix at the source
if you can; otherwise repartition immediately after the read." A parquet
file written as a single row group is exactly that case — Spark's
byte-range splitter assigns every row to the one task whose split
contains the row group's start offset, so a scan of such a file runs on
ONE core no matter how large the cluster, and every per-row compute
stage downstream of it (tokenization, regexp chains, signature UDFs,
decimal aggregation map sides) is single-threaded until the first
exchange.

:func:`fan_out` is the defensive spread for those paths: a round-robin
repartition to the cluster's default parallelism applied ONLY when the
plan's current scan parallelism is below it. On well-split inputs (many
files / many row groups — the normal 100-TB layout) the condition fails
and the helper is a literal no-op, so it can never ADD a shuffle at
scale; on degenerate inputs it pays one small shuffle of the projected
columns to unlock every core. Deterministic under task retries:
``spark.sql.execution.sortBeforeRepartition`` stays at its default
(on), so re-run map tasks reproduce the same row→partition assignment
(SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_in(
    df: DataFrame,
    starved_partition_bytes: int = 256 << 10,
    max_bytes_per_task: int = 4 << 20,
) -> DataFrame:
    """Merge an OVER-partitioned NEAR-EMPTY frame down to the cluster's
    default parallelism (narrow ``coalesce`` — no shuffle, same rows)
    ONLY when all of these hold (sizes from the optimizer's own
    estimate of the PROJECTED frame):

    * the frame has more partitions than the cluster has task slots;
    * the existing partitions are BYTE-STARVED — under
      ``starved_partition_bytes`` (256 KB ≈ tens of ms of python-bound
      work) on average, i.e. per-task launch overhead (~10 ms locally)
      is a double-digit fraction of each task;
    * the merge at least HALVES the partition count (a near-no-op merge
      isn't worth disturbing the scan layout for).

    The inverse of :func:`fan_out`, for the opposite degeneracy: a tiny
    frame split into hundreds of near-empty partitions pays one python
    worker round-trip per partition in every ``mapInArrow``/
    ``mapInPandas`` stage that reads it — pure task-launch overhead
    (guide §4.1's boundary cost is per TASK, amortized only when batches
    are non-trivial). The activation threshold is deliberately LOW and
    keyed on the partitions as they ARE, not as they would be after
    merging: partitions already carrying megabytes have nothing to win
    (overhead <1%), and merging them into giant serial-python tasks was
    MEASURED to lose badly — an earlier draft that merged whenever the
    POST-merge size stayed under 64 MB collapsed the scaling bench's
    64×2 MB scan to slot-count tasks and cost the N level half its
    throughput (216k→114k turns/s; 4N 752k→520k). On any layout whose
    partitions carry real bytes this version is a literal no-op, so it
    can never reduce useful parallelism at scale. Unknown/absurd size
    estimates (Catalyst returns huge sentinels for un-analyzable plans)
    fail the starvation test and also leave the frame untouched.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
        if current <= par:
            return df
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - planning-time failure: stay safe
        return df
    if size // current >= starved_partition_bytes:
        return df
    # smallest task count that keeps every merged partition under the
    # per-task byte bound, floored at cluster width so the merge never
    # costs occupancy; ceil-div without floats
    ideal = max(par, -(-size // max_bytes_per_task))
    if ideal * 2 > current:
        return df
    return df.coalesce(ideal)


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``min_parts`` (default:
    ``defaultParallelism // 4``) ONLY if its current plan parallelism is
    lower — a no-op on inputs that already split.

    Call it on a PROJECTED frame (only the columns the downstream stage
    needs) so the defensive shuffle moves the fewest bytes (guide §2.3).

    Width default: every partition this helper creates costs a task
    launch in EVERY downstream stage that reads it (~10 ms each in local
    mode — measured: fanning a tiny multi-consumer frame to 32 cost
    +2.4 s across its ~8 consumer stages while 8 was break-even), so the
    default is a quarter of the cluster parallelism — enough to unlock
    compute-bound stages, cheap enough that small inputs don't drown in
    scheduling. Callers with one massive compute stage can pass the full
    parallelism explicitly.
    """
    spark = df.sparkSession
    target = min_parts or max(2, spark.sparkContext.defaultParallelism // 4)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning-time failure: stay safe
        return df
    if current >= target:
        return df
    return df.repartition(target)
