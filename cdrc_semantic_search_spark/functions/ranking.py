"""BM25 lexical ranking as pure DataFrame algebra.

The reference's sparse retrieval side is a vector-store keyword query
(/root/reference/src/model.py:73-79, query_mode="sparse"); BM25 is the
classic scorer behind such sparse indexes. Expressed entirely as
groupBy/join/arithmetic — no UDFs — so it scales like any aggregation:

* term frequencies: one explode + groupBy (map-side combined);
* document frequencies + avg doc length: one aggregation over the
  posting table — dimension-sized (≤ |vocab|), broadcast back;
* per-(doc, term) partial scores sum per doc.

At 10^12 docs the posting table is the only large intermediate and it
shuffles once on (term); the idf/avgdl side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import tokens


def _postings(docs: DataFrame, terms: list[str], id_col: str, text_col: str):
    """Shared posting-table scaffolding for the lexical scorers →
    (toks, tf, df_, n_docs): exploded tokens, vocabulary-filtered term
    frequencies, per-term document frequencies, corpus size. One explode
    + one (id, term) groupBy; df_/n_docs are dimension-sized."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = (
        toks.filter(F.col("term").isin(sorted(terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("id").cast("double").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return toks, tf, df_, n_docs


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against a bag of query terms → (id, score).

    score(d) = Σ_t qtf(t) · idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)   = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)   (Robertson/Lucene)

    ``query_terms`` is a true BAG: a term repeated in the query weights
    its contribution by its multiplicity (qtf). Documents matching no
    term score 0 (kept — callers filter/top-k). Fully lazy: N and avgdl
    join in as broadcast one-row aggregates; no driver-side action runs.
    """
    from collections import Counter

    qtf = Counter(query_terms)
    distinct_terms = sorted(qtf)
    toks, tf, df_, n_docs = _postings(docs, distinct_terms, id_col, text_col)
    doclen = toks.groupBy("id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = doclen.agg(F.avg("dl").alias("avgdl"))
    qtf_map = F.create_map(
        *[x for t in distinct_terms for x in (F.lit(t), F.lit(float(qtf[t])))]
    )
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (
            F.element_at(qtf_map, F.col("term"))
            * F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        ).alias("idf"),
    )
    partial = (
        tf.join(F.broadcast(idf), "term")
        .join(doclen, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    scored = partial.groupBy("id").agg(F.sum("s").alias("score"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )


def tfidf_scores(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, term) smoothed TF-IDF over a vocabulary → (id, term, tfidf).

    tfidf(t, d) = tf(t, d) · (ln((N + 1)/(df(t) + 1)) + 1)   (sklearn's
    smooth_idf — no zero division, unseen terms still weighted).

    Same physical shape as bm25_scores (shared _postings scaffolding):
    the posting table shuffles once on (id, term); df/N are
    dimension-sized broadcast aggregates. The classic feature extractor
    for quality classifiers / near-dup scoring over a curated vocabulary
    at corpus scale.
    """
    _, tf, df_, n_docs = _postings(docs, vocab, id_col, text_col)
    idf = df_.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0).alias("idf"),
    )
    return tf.join(F.broadcast(idf), "term").select(
        "id", "term", (F.col("tf") * F.col("idf")).alias("tfidf")
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of two scored lists →
    (id, rank_a, rank_b, rrf = Σ 1/(k + rank)) — the rank-based
    alternative to the reference's α-blend (model.py:74-78): RRF needs
    no score calibration between heterogeneous retrievers (BM25 scale vs
    cosine scale), which is why it is the standard hybrid-fusion
    baseline (Cormack et al. 2009). Absent-from-one-list items
    contribute 0 from that side.

    Determinism contract: ranks are row_number over (score DESC, id
    ASC) — callers should pass scores already rounded to their oracle
    precision so near-equal floats cannot flip ranks between engines;
    the fused score is two exact IEEE divisions and one addition in
    fixed order, bit-identical everywhere, no output rounding needed.

    ``top`` truncates each list after ranking (the usual top-k fusion).
    Scale shape: ranking is one window per list (global order — RRF
    inputs are top-k lists, thousands of rows, not corpora; for per-
    query fusion partition the window by the query key upstream), then
    one full-outer equi-join on id.
    """
    wa = Window.orderBy(F.desc(score_col), F.asc(id_col))
    ra = a.select(
        F.col(id_col).alias("id"),
        F.row_number().over(wa).alias("rank_a"),
    )
    rb = b.select(
        F.col(id_col).alias("id"),
        F.row_number().over(wa).alias("rank_b"),
    )
    if top is not None:
        ra = ra.filter(F.col("rank_a") <= top)
        rb = rb.filter(F.col("rank_b") <= top)
    fused = ra.join(rb, "id", "full_outer").select(
        "id",
        "rank_a",
        "rank_b",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("rank_a")).cast("double"),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col("rank_b")).cast("double"),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    return fused
