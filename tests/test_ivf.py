from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.operators import similarity


def test_ivf_topk_recall_vs_exact(spark):
    rng = np.random.default_rng(5)
    # clustered corpus: IVF shines when data has cluster structure
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 3
    pts = np.vstack([c + rng.standard_normal((40, 16)).astype(np.float32) for c in centers])
    pdf = pd.DataFrame({"vid": range(len(pts)), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)

    cent = similarity.train_centroids(pts, n_centroids=8, seed=42)
    assert cent.shape == (8, 16)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-5)

    q = df.filter("vid < 20").select(F.col("vid").alias("q_id"), F.col("vec").alias("q_vec"))
    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))

    exact = similarity.topk_cosine_exact(q, c, k=5).toPandas()
    approx = similarity.topk_cosine_ivf(spark, q, c, cent, k=5, n_probe=3).toPandas()

    # recall@5 of IVF vs exact must be high on clustered data
    hits = 0
    for qid in range(20):
        e = set(exact[exact["q_id"] == qid]["c_id"])
        a = set(approx[approx["q_id"] == qid]["c_id"])
        hits += len(e & a)
    recall = hits / (20 * 5)
    assert recall >= 0.9, f"IVF recall {recall}"

    # every approx hit carries the true cosine score (exact re-rank)
    merged = approx.merge(exact, on=["q_id", "c_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["score_a"], merged["score_e"], atol=1e-6)


def test_ivf_assign_buckets_cover_all(spark):
    rng = np.random.default_rng(6)
    pts = rng.standard_normal((50, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vid": range(50), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)
    cent = similarity.train_centroids(pts, n_centroids=4, seed=1)
    out = similarity.ivf_assign(spark, df, "vid", "vec", cent).toPandas()
    assert len(out) == 50
    assert set(out["bucket"]) <= set(range(4))


def test_pq_adc_recall_and_partition_invariance(spark):
    """PQ-ADC top-k recalls most of the exact top-5 on clustered data
    (quantization error, not candidate pruning, is the only loss), codes
    compress dim floats to m small ints, and the result set is identical
    across corpus partitionings (per-partition lexsort top-k + global
    window tie-break by c_id)."""
    # many small clusters: a query's true top-5 IS its cluster, and PQ
    # separates clusters even at 16 codes/subspace (measured recall 1.0;
    # 6 fat clusters of 40 measured 0.29 — quantization can't rank
    # WITHIN a tight cluster, which is what the exact re-rank stage is
    # for, so the test pins the granularity PQ actually provides)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((48, 32)).astype(np.float32) * 3
    pts = np.vstack(
        [c + rng.standard_normal((5, 32)).astype(np.float32) * 0.5 for c in centers]
    )
    pdf = pd.DataFrame({"vid": range(len(pts)), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)

    books = similarity.train_pq_codebooks(pts, m=8, k=16, seed=42)
    assert books.shape == (8, 16, 4)

    codes = similarity.pq_encode(
        spark, df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec")),
        "c_id", "c_vec", books,
    ).toPandas()
    assert len(codes) == len(pts)
    assert all(len(c) == 8 and max(c) < 16 for c in codes["codes"])

    q = df.filter("vid < 20").select(F.col("vid").alias("q_id"), F.col("vec").alias("q_vec"))
    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))
    exact = similarity.topk_cosine_exact(q, c, k=5).toPandas()
    approx = similarity.topk_pq_adc(spark, q, c, books, k=5).toPandas()

    hits = 0
    for qid in range(20):
        e = set(exact[exact["q_id"] == qid]["c_id"])
        a = set(approx[approx["q_id"] == qid]["c_id"])
        assert len(a) == 5
        hits += len(e & a)
    recall = hits / (20 * 5)
    assert recall >= 0.9, f"PQ recall {recall}"

    again = similarity.topk_pq_adc(
        spark, q, c.repartition(7), books, k=5
    ).toPandas()
    key = ["q_id", "rank"]
    a1 = approx.sort_values(key).reset_index(drop=True)
    a2 = again.sort_values(key).reset_index(drop=True)
    assert list(a1["c_id"]) == list(a2["c_id"])


def test_ivfpq_composes_probe_and_quantization(spark):
    """IVF×PQ returns ≤k candidates per query drawn only from probed
    buckets, recalls the cluster neighbours on the many-small-clusters
    corpus, and is invariant to corpus partitioning."""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((48, 32)).astype(np.float32) * 3
    pts = np.vstack(
        [c + rng.standard_normal((5, 32)).astype(np.float32) * 0.5 for c in centers]
    )
    pdf = pd.DataFrame({"vid": range(len(pts)), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)
    cent = similarity.train_centroids(pts, n_centroids=12, seed=42)
    books = similarity.train_pq_codebooks(pts, m=8, k=16, seed=42)

    q = df.filter("vid < 20").select(F.col("vid").alias("q_id"), F.col("vec").alias("q_vec"))
    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))
    exact = similarity.topk_cosine_exact(q, c, k=5).toPandas()
    approx = similarity.topk_ivfpq(spark, q, c, cent, books, k=5, n_probe=4).toPandas()

    hits = 0
    for qid in range(20):
        e = set(exact[exact["q_id"] == qid]["c_id"])
        a = set(approx[approx["q_id"] == qid]["c_id"])
        assert len(a) <= 5
        hits += len(e & a)
    assert hits / (20 * 5) >= 0.8, f"IVFPQ recall {hits / 100}"

    again = similarity.topk_ivfpq(
        spark, q, c.repartition(6), cent, books, k=5, n_probe=4
    ).toPandas()
    key = ["q_id", "rank"]
    a1 = approx.sort_values(key).reset_index(drop=True)
    a2 = again.sort_values(key).reset_index(drop=True)
    assert list(a1["c_id"]) == list(a2["c_id"])


def test_pq_rerank_recovers_exact_topk(spark):
    """With a 20-wide shortlist over the 48-cluster corpus, the exact
    re-rank returns the TRUE top-5 with TRUE cosine scores (coarse
    recall is high enough that the shortlist contains them); shortlist <
    k raises."""
    import pytest as _pytest

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((48, 32)).astype(np.float32) * 3
    pts = np.vstack(
        [c + rng.standard_normal((5, 32)).astype(np.float32) * 0.5 for c in centers]
    )
    pdf = pd.DataFrame({"vid": range(len(pts)), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)
    books = similarity.train_pq_codebooks(pts, m=8, k=16, seed=42)
    q = df.filter("vid < 10").select(F.col("vid").alias("q_id"), F.col("vec").alias("q_vec"))
    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))

    exact = similarity.topk_cosine_exact(q, c, k=5).toPandas()
    fine = similarity.topk_pq_rerank(spark, q, c, books, k=5, shortlist=20).toPandas()
    key = ["q_id", "rank"]
    e = exact.sort_values(key).reset_index(drop=True)
    f = fine.sort_values(key).reset_index(drop=True)
    assert list(e["c_id"]) == list(f["c_id"])
    assert np.allclose(e["score"], f["score"], atol=1e-6)

    with _pytest.raises(ValueError):
        similarity.topk_pq_rerank(spark, q, c, books, k=5, shortlist=3)


def test_residual_ivfpq_beats_plain_pq_within_clusters(spark):
    """On fat clusters (where plain PQ collapses — see the PQ test),
    residual encoding at the same (m=16, k=64) budget ranks
    within-cluster neighbours measurably better: measured 0.60 vs 0.42
    recall@5 (at the coarse m=8/k=16 budget residual is a wash — codes
    too coarse for the small residual magnitudes; the comparison is
    budget-fair, not universal). Full-probe IVF keeps candidate recall
    out of the equation."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, 32)).astype(np.float32) * 3
    pts = np.vstack(
        [c + rng.standard_normal((40, 32)).astype(np.float32) * 0.5 for c in centers]
    )
    pdf = pd.DataFrame({"vid": range(len(pts)), "vec": [list(map(float, v)) for v in pts]})
    df = spark.createDataFrame(pdf)
    cent = similarity.train_centroids(pts, n_centroids=6, seed=42)
    plain_books = similarity.train_pq_codebooks(pts, m=16, k=64, seed=42)
    resid_books = similarity.train_residual_codebooks(pts, cent, m=16, k=64, seed=42)

    q = df.filter("vid < 20").select(F.col("vid").alias("q_id"), F.col("vec").alias("q_vec"))
    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))
    exact = similarity.topk_cosine_exact(q, c, k=5).toPandas()

    def recall(approx):
        hits = 0
        for qid in range(20):
            e = set(exact[exact["q_id"] == qid]["c_id"])
            hits += len(e & set(approx[approx["q_id"] == qid]["c_id"]))
        return hits / 100

    r_plain = recall(
        similarity.topk_ivfpq(spark, q, c, cent, plain_books, k=5, n_probe=6).toPandas()
    )
    r_resid = recall(
        similarity.topk_ivfpq(
            spark, q, c, cent, resid_books, k=5, n_probe=6, residual=True
        ).toPandas()
    )
    assert r_resid > r_plain, (r_resid, r_plain)
    assert r_resid >= 0.5, r_resid


def test_pq_paths_tolerate_null_vectors(spark):
    """NULL embeddings are dropped, not executor crashes: on the corpus
    side they can never score; all-NULL query frames return the typed
    empty result."""
    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]), (2, None)]
    df = spark.createDataFrame(rows, "vid long, vec array<float>")
    pts = np.eye(4, dtype=np.float32)
    books = similarity.train_pq_codebooks(pts, m=2, k=2, seed=1)

    c = df.select(F.col("vid").alias("c_id"), F.col("vec").alias("c_vec"))
    enc = similarity.pq_encode(spark, c, "c_id", "c_vec", books).toPandas()
    assert sorted(enc["c_id"]) == [0, 1]  # NULL row dropped

    q = df.filter("vid = 0").select(
        F.col("vid").alias("q_id"), F.col("vec").alias("q_vec")
    )
    out = similarity.topk_pq_adc(spark, q, c, books, k=2).toPandas()
    assert set(out["c_id"]) <= {0, 1}

    null_q = df.filter("vid = 2").select(
        F.col("vid").alias("q_id"), F.col("vec").alias("q_vec")
    )
    empty = similarity.topk_pq_adc(spark, null_q, c, books, k=2)
    assert empty.count() == 0
    assert dict(empty.dtypes)["q_id"] == "bigint"


def test_pq_index_lifecycle_roundtrip_and_upsert(spark, tmp_path):
    """Codebooks survive the table roundtrip bit-for-bit; a two-batch
    materialize+upsert index equals the one-shot encode; re-upserting an
    EXISTING id replaces its codes (merge semantics, not append)."""
    from cdrc_semantic_search_spark.operators.similarity import (
        codebooks_from_df,
        codebooks_to_df,
        materialize_pq_index,
        pq_encode,
        topk_pq_adc,
        topk_pq_adc_index,
        upsert_pq_index,
    )
    from cdrc_semantic_search_spark.sources.catalog import ParquetTableCatalog

    rng = np.random.default_rng(13)
    pts = rng.standard_normal((60, 16)).astype(np.float32)
    books = similarity.train_pq_codebooks(pts, m=4, k=8, seed=3)
    assert np.array_equal(
        codebooks_from_df(codebooks_to_df(spark, books)), books
    )

    pdf = pd.DataFrame({"c_id": range(60), "c_vec": [list(map(float, v)) for v in pts]})
    c = spark.createDataFrame(pdf)
    catalog = ParquetTableCatalog(str(tmp_path / "idx"))
    materialize_pq_index(spark, catalog, c.filter("c_id < 40"), books)
    upsert_pq_index(spark, catalog, c.filter("c_id >= 40"))

    one_shot = pq_encode(spark, c, "c_id", "c_vec", books).toPandas()
    stored = catalog.read_table(spark, "pq_index_codes").toPandas()
    key = lambda d: sorted((r.c_id, tuple(r.codes)) for r in d.itertuples())
    assert key(stored) == key(one_shot)

    q = c.filter("c_id < 3").select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    direct = topk_pq_adc(spark, q, c, books, k=4).toPandas()
    via_index = topk_pq_adc_index(spark, q, catalog, k=4).toPandas()
    srt = lambda d: d.sort_values(["q_id", "rank"]).reset_index(drop=True)
    assert list(srt(direct)["c_id"]) == list(srt(via_index)["c_id"])

    # upsert an existing id with a DIFFERENT vector: codes must change
    import pandas as _pd
    new_vec = [list(map(float, -pts[0]))]
    delta = spark.createDataFrame(
        _pd.DataFrame({"c_id": [0], "c_vec": new_vec})
    )
    before = {tuple(r.codes) for r in stored.itertuples() if r.c_id == 0}
    upsert_pq_index(spark, catalog, delta)
    after_df = catalog.read_table(spark, "pq_index_codes").toPandas()
    assert len(after_df) == 60  # replaced, not appended
    after = {tuple(r.codes) for r in after_df.itertuples() if r.c_id == 0}
    assert after != before
