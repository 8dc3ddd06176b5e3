"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship semantic query (chunk → encode → top-k cosine
link → group rollup — the reference's retrieval lifecycle, SURVEY §3.2)
over the sf0.001 tables. ``queries``/``oracle_sql`` expose every
implemented operator from SURVEY §2 for the DuckDB cross-check at sf0.01
(see cdrc_semantic_search_spark/plans/catalog_queries.py for the
determinism conventions that make value hashes match exactly).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: semantic retrieval over documents+embeddings at sf0.001.

    documents → word-window chunks (V1) → deterministic encoder UDF (V2)
    → exact top-k cosine against the broadcast embeddings matrix (J3/V3/V5)
    → per-document rollup with max score + ordered concat (A1).
    """
    import numpy as np

    from cdrc_semantic_search_spark.encoder import make_encoder_udf
    from cdrc_semantic_search_spark.operators.chunker import chunk_words
    from cdrc_semantic_search_spark.operators.rollup import group_rollup
    from cdrc_semantic_search_spark.operators.similarity import topk_cosine_broadcast

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # driver-side collect of the INDEX side only — the broadcast-BLAS plan
    # requires the corpus matrix to fit one executor (true for entity
    # catalogues / centroid tables; the streaming fact side never collects)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    corpus_ids = emb["vec_id"].to_numpy()
    corpus = np.array([np.asarray(v, dtype=np.float32) for v in emb["embedding"]])

    chunks = chunk_words(docs, "doc_id", "text", chunk_size=32, overlap=8)
    encode = make_encoder_udf(dim=corpus.shape[1], seed=42)
    encoded = chunks.select(
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_idx")).alias("chunk_key"),
        "doc_id",
        "chunk_idx",
        encode(F.col("chunk_text")).alias("q_vec"),
    )
    hits = topk_cosine_broadcast(
        spark,
        encoded.select(F.col("chunk_key").alias("q_id"), "q_vec"),
        corpus_ids,
        corpus,
        k=3,
        q_id_type="string",
        c_id_type="long",
    ).withColumnRenamed("q_id", "chunk_key")
    joined = hits.join(encoded.select("chunk_key", "doc_id", "chunk_idx"), "chunk_key")
    per_chunk = joined.groupBy("doc_id", "chunk_idx").agg(
        F.max("score").alias("best_score"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rank", F.col("c_id").cast("string").alias("cid")))),
                lambda s: s["cid"],
            ),
        ).alias("neighbors"),
    )
    return group_rollup(
        per_chunk, ["doc_id"], "best_score", "neighbors", ["chunk_idx"], sep="|"
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cdrc_semantic_search_spark.plans.catalog_queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from cdrc_semantic_search_spark.plans.catalog_queries import REGISTRY

    return {
        name: qd.sql_text()
        for name, qd in REGISTRY.items()
        if qd.sql is not None
    }
