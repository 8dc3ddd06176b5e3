"""Bucketed-base dedup re-check bench: the measured shuffle win for
storing the (id, vec) embedding base bucketed by id.

Embedding near-dup dedup is candidate generation (LSH buckets, ids only)
followed by the EXACT-COSINE RE-CHECK: candidate id pairs re-join the
(id, vec) base twice (once per side) to score true cosine. At 100 TB the
base is the billion-row side; how it is stored decides whether the
re-check exchanges it:

* **plain parquet** — the re-joins sort-merge: the full vector payload
  exchanges by id hash (Spark's ReusedExchange collapses the two
  structurally-identical base exchanges into one — still a full-corpus
  shuffle).
* **bucketed table** (bucketBy id, sorted) — both re-joins read the base
  buckets in place; only the small candidate-pair side exchanges (and
  carries one vector through the second hop). Zero base-side Exchange —
  the same discipline the bucketed-fanout PageRank entry measures for
  iterative joins, applied to the dedup pipeline's one expensive join.

autoBroadcastJoinThreshold=-1 models real scale, where the base is far
beyond broadcast. Metrics (shuffle-write bytes/records via the UI REST
API) are deterministic; wall seconds on this host ride the page cache.

Results: JSON to stdout + scripts/.dedup_bucket_bench.json + a BENCH.md
section (replace-by-heading; scripts/scaling_bench.py re-appends it when
it rewrites BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DB_JSON = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".dedup_bucket_bench.json"
)
N_VECS = 500_000
DIM = 64
N_PAIRS = 200_000
N_BUCKETS = 32
MARKER = "## Bucketed embedding base for the dedup re-check join"


def shuffle_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=COMPLETE", timeout=30
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def build_base(spark):
    """Deterministic (id, vec) corpus, generated distributed."""
    from pyspark.sql import functions as F

    expr = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2000)) - 1000) / 1000.0
        ).cast("float"),
    )
    return spark.range(N_VECS, numPartitions=32).select(
        F.col("id").alias("doc_id"), expr.alias("vec")
    )


def build_pairs(spark):
    """Candidate id pairs shaped like LSH output: near-ids pair up."""
    from pyspark.sql import functions as F

    return (
        spark.range(N_PAIRS, numPartitions=8)
        .select(
            (F.pmod(F.xxhash64("id"), F.lit(N_VECS - 1))).alias("id_a"),
        )
        .select(
            F.abs(F.col("id_a")).alias("id_a"),
            (F.abs(F.col("id_a")) + 1).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def run_case(spark, label: str, base_df, cand_df) -> dict:
    from cdrc_semantic_search_spark.operators.similarity import exact_recheck

    from pyspark.sql import functions as F

    scored = exact_recheck(base_df, cand_df, "doc_id", "vec")
    # aggregate over score, not count(): a bare count would let Catalyst
    # prune the vector columns OUT of the exchanges and the bench would
    # measure an id-only shuffle no real dedup run gets
    agg = scored.agg(
        F.sum("score").alias("s"), F.count(F.lit(1)).alias("n")
    )
    b0, r0 = shuffle_totals(spark)
    t0 = time.time()
    row = agg.collect()[0]
    n = row["n"]
    sec = round(time.time() - t0, 2)
    b1, r1 = shuffle_totals(spark)
    res = {
        "variant": label,
        "sec": sec,
        "shuffle_write_mb": round((b1 - b0) / 1e6, 1),
        "shuffle_write_records": r1 - r0,
        "pairs_scored": n,
    }
    print(f"  {label}: {res}", flush=True)
    return res


def render_section(results: list[dict]) -> str:
    r = {x["variant"]: x for x in results}
    p, b = r["plain parquet"], r["bucketed table"]
    saved = round(100 * (1 - b["shuffle_write_mb"] / max(p["shuffle_write_mb"], 0.1)))
    return f"""
{MARKER} ({N_VECS:,} vectors × {DIM} dims, {p["pairs_scored"]:,} candidate pairs)

LSH candidate pairs (ids only) re-join the (id, vec) base twice for the
exact-cosine re-check — the one expensive join in embedding dedup. Same
join, same pairs, base stored two ways, autoBroadcastJoinThreshold=-1
(at real scale the base cannot broadcast). Plain storage exchanges the
full corpus once (ReusedExchange collapses the two identical base
exchanges); bucketed storage exchanges it never:

| base storage | shuffle-write MB | shuffle-write records | wall sec |
|---|---|---|---|
| plain parquet | {p["shuffle_write_mb"]} | {p["shuffle_write_records"]:,} | {p["sec"]} |
| bucketed table ({N_BUCKETS} buckets) | **{b["shuffle_write_mb"]} (−{saved}%)** | {b["shuffle_write_records"]:,} | {b["sec"]} |

The bucketed base never exchanges — both re-joins read buckets in place
(plan-pinned in test_bucketing::test_recheck_bucketed_base_no_exchange);
only the candidate pairs shuffle, and they carry one vector through the
second hop. At 100 TB that converts a full-corpus vector exchange per
dedup run into a one-time write-side sort — the same discipline as the
bucketed PageRank fanout above. Shuffle bytes are the deterministic
metric; local wall seconds ride the page cache.
Reproduce: `python scripts/dedup_bucket_bench.py`.
"""


def main() -> None:
    from cdrc_semantic_search_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="dedup_bucket_bench_")
    spark = get_spark(
        app_name="dedup-bucket-bench",
        parallelism=16,
        shuffle_partitions=N_BUCKETS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.warehouse.dir": os.path.join(work, "warehouse"),
            "spark.driver.extraJavaOptions":
                f"-Dderby.system.home={os.path.join(work, 'derby')}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    plain_path = os.path.join(work, "base_plain")
    build_base(spark).write.mode("overwrite").parquet(plain_path)
    spark.sql("DROP TABLE IF EXISTS dedup_bench_base_bkt")
    (
        build_base(spark).write.bucketBy(N_BUCKETS, "doc_id").sortBy("doc_id")
        .option("path", os.path.join(work, "base_bkt"))
        .mode("overwrite").format("parquet")
        .saveAsTable("dedup_bench_base_bkt")
    )
    pairs_path = os.path.join(work, "pairs")
    build_pairs(spark).write.mode("overwrite").parquet(pairs_path)
    cand = spark.read.parquet(pairs_path)

    # untimed warmup on a slice
    run_case(spark, "warmup", spark.read.parquet(plain_path).limit(1000), cand.limit(100))

    results = [
        run_case(spark, "plain parquet", spark.read.parquet(plain_path), cand),
        run_case(spark, "bucketed table", spark.table("dedup_bench_base_bkt"), cand),
    ]
    print(json.dumps(results))
    with open(DB_JSON, "w") as f:
        json.dump(results, f)
    from bench_sections import replace_section

    replace_section(MARKER, render_section(results))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
