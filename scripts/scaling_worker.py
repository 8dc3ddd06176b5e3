"""One scaling-bench run: KG pipeline at a given parallelism; prints JSON.

Invoked as a subprocess by scripts/scaling_bench.py so each parallelism
level gets a fresh JVM (no cross-contamination of executor pools):

    python scripts/scaling_worker.py <cores> <n_conversations> [seed]

The timed job is the production shape: parquet scan → fused
extraction+linking (map-only) → count.  The transcript fixture is
generated distributed (deterministic per-conversation RNG streams) and
written to parquet in evenly-sized salted files first (untimed) — hot
conversations cluster in low conv indices, so contiguous layout would be
maximally skewed (SURVEY §4.1).  ``spark.sql.files.maxPartitionBytes`` is
sized so the scan yields ≥2 splits per core — with the default 128 MB a
~200 MB corpus would collapse to 2 tasks and leave every other core idle.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_conv = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42

    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.operators.assembly import salted_repartition
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline
    from cdrc_semantic_search_spark.session import get_spark

    extra = {
        # per-core heap parity across cluster sizes: a real 4N-executor
        # cluster has 4× the total memory of N executors — a flat heap
        # would GC-throttle the big configuration only (measured: ~45%
        # per-task slowdown at 16 threads on the N-sized heap)
        "spark.driver.memory": f"{2 * cores}g",
    }
    # Task-slot factor (see the long comment below) — resolved up front so
    # the executor-JVM probe modes apply the SAME oversubscription as the
    # local[N] path (slots are advertised cores in local-cluster too).
    slot_factor = float(os.environ.get("SLOT_FACTOR", "1.25"))
    exec_cores = int(os.environ.get("EXEC_CORES", "0"))
    if exec_cores:
        # SEPARATE executor JVMs of a fixed size (north_rule shape: "N and
        # 4N executors" scales executor COUNT at constant executor size).
        # A single-JVM local[16] makes all 16 task threads contend inside
        # one runtime (allocator, GC, scheduler locks) — a contention
        # profile no real multi-executor cluster has; local-cluster spawns
        # real per-executor JVMs with per-core heap parity.
        n_exec = max(cores // exec_cores, 1)
        # advertised cores = slots: apply the same 1.25× factor per
        # executor (heap stays sized by PHYSICAL cores for parity)
        exec_slots = max(int(exec_cores * slot_factor), exec_cores)
        extra["spark.master"] = (
            f"local-cluster[{n_exec},{exec_slots},{2048 * exec_cores}]"
        )
        extra["spark.driver.memory"] = "4g"  # driver does no heavy lifting here
    elif os.environ.get("CLUSTER_MODE") == "1":
        # N separate 1-core executor JVMs — the honest small-scale analog
        # of an N-executor cluster (single-JVM local[N] makes all tasks
        # contend inside one runtime, which a real cluster never does)
        extra["spark.master"] = f"local-cluster[{cores},1,2048]"
    # Task-slot oversubscription, SAME factor at every cluster size (it is
    # a per-job conf, not a per-cluster-size one): the fused stage is
    # python-worker-bound — the JVM task thread mostly waits on the Arrow
    # round trip, so 1 slot/core leaves cores idle during scheduling gaps
    # and stage tails (measured: local[20] on 16 pinned CPUs 510k turns/s
    # vs local[16] 400-430k; the N level moves 137k -> ~130k/cluster).
    # Real deployments express this as executor task slots > physical
    # cores for UDF-heavy stages.
    slots = max(int(cores * slot_factor), cores)
    spark = get_spark(
        app_name=f"kg-scaling-{cores}",
        parallelism=slots,
        extra_conf={
            **extra,
            "spark.locality.wait": "0s",
            # one scan task per input file: openCost == maxPartitionBytes
            # prevents bin-packing several files into one split. The corpus
            # is written as 64 evenly-sized salted files, so the task count
            # divides both cluster sizes exactly — no partial final wave.
            # (At real 10^12-turn scale there are thousands of waves and
            # quantization vanishes; at sandbox scale a partial wave would
            # cost up to 25% at 16 cores and read as fake inefficiency.)
            "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(8 * 1024 * 1024),
            "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
                "ARROW_BATCH", "10000"
            ),
            "spark.driver.extraJavaOptions": os.environ.get("JAVA_OPTS", ""),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_files = int(os.environ.get("N_FILES", "64"))
    data_dir = os.path.join(
        tempfile.gettempdir(), f"kg_scaling_{n_conv}_{seed}_{n_files}"
    )
    if not os.path.exists(data_dir):
        # Unique staging dir + atomic rename: concurrent workers racing on
        # a missing corpus each build their own copy and exactly one
        # rename wins (rename onto an existing dir fails on Linux); a
        # SHARED .tmp once let three racers interleave their output files
        # into one merged, duplicated corpus.
        import shutil

        tmp = f"{data_dir}.tmp.{os.getpid()}"
        tdf_gen, _ = fixtures.generate_spark(
            spark, seed=seed, n_conversations=n_conv, n_entities=500, partitions=n_files
        )
        salted_repartition(tdf_gen, n_files, salt=n_files).write.mode(
            "overwrite"
        ).parquet(tmp)
        try:
            os.rename(tmp, data_dir)
        except OSError:
            if not os.path.exists(data_dir):
                raise  # a real rename failure (EXDEV/ENOSPC/...), not the race
            # lost the race — another worker's corpus is already in place
            shutil.rmtree(tmp, ignore_errors=True)
    entities = fixtures._make_entities(seed, 500)

    tdf = spark.read.parquet(data_dir)
    n_turns = tdf.count()
    pipe = KGPipeline(spark, entities, Settings())

    # full warmup pass: primes codegen and spins up the WHOLE python worker
    # pool (imports + broadcast deserialization) — at 10^12 turns startup
    # amortizes to zero, so steady-state is the honest rate
    pipe.triples(tdf).count()
    # best-of-5 timed runs: single-host co-tenancy makes single runs noisy
    def cpu_busy():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v) - v[3] - v[4]

    runs = []
    utils = []
    n_triples = 0
    for _ in range(5):
        b0, t0 = cpu_busy(), time.time()
        n_triples = pipe.triples(tdf).count()
        dt = time.time() - t0
        runs.append(dt)
        utils.append(round((cpu_busy() - b0) / 100.0 / dt, 1))  # busy cores
    elapsed = min(runs)

    print(
        json.dumps(
            {
                "cores": cores,
                "n_turns": n_turns,
                "n_triples": n_triples,
                "sec": round(elapsed, 3),
                "runs": [round(r, 3) for r in runs],
                "busy_cores": utils,
                "turns_per_sec": round(n_turns / elapsed, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
