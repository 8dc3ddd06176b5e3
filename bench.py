"""Headline benchmark — prints ONE JSON line per the driver contract.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the KG
pipeline over a deterministic transcript fixture sized to the SF, and
reports per-query wall seconds:

    {"metric": "headline_total_sec", "value": <sum>, "unit": "sec",
     "queries": {...}, "sf": <sf>, "kg_turns_per_sec": <rate>}

Scaling evidence (N vs 4N executors) is produced by
``scripts/scaling_bench.py`` and recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "a1_group_rollup",
    "a2_count_by_value",
    "w1_topk_per_group",
    "w5_lag_lead_context",
    "j3_topk_cosine",
    "v4_hybrid_blend",
    "v1_chunk_words",
    "dedup_exact_groups",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ta_quality_features",
    "ta_language_id",
    "i1_windowed_counts",
    "cc_components",
    # r5 session-4 additions (sf-bound): iterative community detection
    # and the deterministic CMS — measured per-round alongside the rest
    "graph_label_prop",
    "sketch_count_min",
    # r6 additions (sf-bound, full-table): DSIR importance scoring (two
    # broadcast LMs over every document) and per-label centroid drift
    # (decimal-exact reductions over every embedding)
    "train_dsir_importance",
    "emb_centroid_drift",
]


def _cpu_ticks() -> list[int] | None:
    """(user..steal) ticks from /proc/stat line 1; None off-Linux."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]
    except (OSError, ValueError, IndexError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.plans.catalog_queries import REGISTRY
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline
    from cdrc_semantic_search_spark.session import get_spark

    spark = get_spark(app_name="cdrc-kg-bench", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ticks0 = _cpu_ticks()

    # untimed warmup: JVM/parquet-reader/codegen init shouldn't be billed
    # to the first headline query
    for t in ("lineitem", "embeddings", "documents"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        # warm the IO/plan cache out of the measurement? No — cold per query,
        # a driver-run comparison wants end-to-end cost including planning.
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        _ = n

    # WARM passes: same queries with planning/scan caches hot. Cold
    # numbers overstate steady-state cost ~3× for the planning-bound
    # entries (ta_language_id warm is ~0.34 s but bills ~1.2 s cold);
    # `value` stays the cold total so round-over-round comparisons hold.
    # MEDIAN of 3 full passes per query: a single warm pass carries no
    # error bars, so ±25% host noise reads as a regression (round-4
    # verdict); the full suite is re-run 3× (vs 3× back-to-back per
    # query) so a transient host stall degrades one PASS, not every
    # sample of one query.
    warm_passes: list[dict[str, float]] = []
    for _ in range(3):
        pass_t: dict[str, float] = {}
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.time()
            fn(spark, sf_dir).count()
            pass_t[name] = time.time() - t0
        warm_passes.append(pass_t)
    timings_warm = {
        name: round(sorted(p[name] for p in warm_passes)[1], 3)
        for name in HEADLINE
    }

    # KG pipeline throughput: fixture scaled with SF (sf0.1 → ~30k turns)
    n_conv = max(200, int(2000 * (sf / 0.1)))
    fx = fixtures.generate(seed=42, n_conversations=n_conv, n_entities=500)
    tdf, _edf = fixtures.to_spark(spark, fx)
    tdf = tdf.repartition(cpus * 2).localCheckpoint()  # materialize input
    n_turns = tdf.count()
    pipe = KGPipeline(spark, fx.entities, Settings())
    t0 = time.time()
    n_triples = pipe.triples(tdf).count()
    kg_sec = time.time() - t0
    timings["kg_pipeline"] = round(kg_sec, 3)
    kg_warm = []
    for _ in range(3):
        t0 = time.time()
        pipe.triples(tdf).count()
        kg_warm.append(time.time() - t0)
    timings_warm["kg_pipeline"] = round(sorted(kg_warm)[1], 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_warm": timings_warm,
        "warm_total_sec": round(sum(timings_warm.values()), 3),
        "sf": sf,
        "kg_turns": n_turns,
        "kg_triples": n_triples,
        "kg_turns_per_sec": round(n_turns / kg_sec, 1),
        "kg_turns_per_sec_warm": round(n_turns / sorted(kg_warm)[1], 1),
    }
    # Hypervisor steal over the bench interval: on this host class,
    # steal is ~0 at idle but spikes to >10% under load (measured 13.9%
    # burning 32 cores while the idle preflight read 0.13 busy cores),
    # so an idle-host preflight can't see it — sample it across the run
    # itself so wall-time comparisons across rounds are interpretable.
    ticks1 = _cpu_ticks()
    if ticks0 and ticks1:
        d = [b - a for a, b in zip(ticks0, ticks1)]
        if sum(d) > 0:
            out["host_steal_pct"] = round(100 * d[7] / sum(d), 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
