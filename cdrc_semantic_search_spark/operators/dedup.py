"""Deduplication operators for large-scale training-data pipelines.

The reference never deduplicates (its corpus is 176 curated files), but a
100-TB transcript/document pipeline must. Five strategies, cheapest to
richest; each returns pair/cluster tables keyed deterministically:

* exact           — hash-groupBy on normalized text (one shuffle on a
                    64-bit digest, not the text bytes)
* n-gram Jaccard  — shingle inverted index self-join, sub-quadratic
* MinHash + LSH   — banded signature buckets, classic near-dup at scale
* SimHash         — 64-bit fingerprint, hamming-band buckets
* embedding cosine— near-dup via cosine_pairs (operators/similarity.py)

Hash functions are crc32/md5-based (process- and platform-stable), never
Python ``hash()`` — determinism across runs/executors is part of the
contract (SURVEY §5.5).
"""

from __future__ import annotations

import logging
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import word_shingles

log = logging.getLogger(__name__)


# --------------------------------------------------------------- exact dedup
def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (whitespace-normalized) texts.

    Shuffles a 64-bit digest + id, not the documents: at 100 TB the
    shuffle payload is ~16 bytes/row. Collision check is by digest only
    (xxhash64+md5 double hash makes a false merge astronomically rare).
    → (dup_key, n_docs, doc_ids sorted, keeper = min id).
    """
    norm = F.trim(F.regexp_replace(F.col(text_col), "\\s+", " "))
    keyed = df.select(
        F.col(id_col),
        F.concat_ws("|", F.xxhash64(norm).cast("string"), F.md5(norm)).alias("dup_key"),
    )
    return (
        keyed.groupBy("dup_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ------------------------------------------------------------ n-gram Jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    cache_handle: list | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with k-word-shingle Jaccard ≥ threshold.

    Candidate generation via an inverted shingle index (explode + equi-join
    on the shingle **hash**, not the string). The join shuffles
    (shingle_hash, id) pairs; per-pair intersection size falls out of a
    groupBy count, union size from the per-doc distinct-shingle counts —
    no document text ever re-shuffles.

    ``max_shingle_df``: the scale guard. A boilerplate shingle shared by
    10M documents creates a 10M-row posting list and a quadratic
    candidate blowup inside the self-join. With a cap, shingles whose
    document frequency exceeds it are removed from the universe BEFORE
    the self-join — consistently, from both the intersection counts and
    the per-doc sizes, so the returned ``jaccard`` is the exact Jaccard
    over the capped shingle universe (stop-shingles carry no
    discriminative signal anyway). The hot-shingle list is tiny by
    construction (only hashes with DF > cap) and is broadcast; the
    posting table never shuffles for the filter. The number of dropped
    shingle hashes is logged. Default ``None`` = off (exact Jaccard over
    the full universe; fine up to moderate corpora, required off for the
    VALUES oracle).
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh"),
    ).select("id", F.xxhash64("sh").alias("shash"))
    # cache the posting list ONCE: it feeds three plan branches (a-side,
    # b-side, per-doc sizes) and Spark does not share subtrees across
    # self-join branches — without this the shingling runs 3×. persist()
    # (not eager checkpoint) so the first action computes it once and the
    # sibling stages read cache; production writes the (id, shingle_hash)
    # table once and joins against it. The persisted frame is an INTERNAL
    # derived plan, never the caller's input. Pass a list as
    # ``cache_handle`` to receive it and unpersist deterministically once
    # the result is consumed; otherwise the ContextCleaner reclaims the
    # blocks when the frames are dropped.
    shingled = shingled.persist()
    if cache_handle is not None:
        cache_handle.append(shingled)

    if max_shingle_df is not None:
        hot = (
            shingled.groupBy("shash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shash")
        )
        # one cheap count over the cached posting list — the honest price
        # of reporting what the cap dropped (no silent truncation)
        n_hot = hot.count()
        if n_hot:
            log.info(
                "ngram_jaccard_pairs: dropping %d shingle hashes with "
                "document frequency > %d", n_hot, max_shingle_df,
            )
        shingled = shingled.join(F.broadcast(hot), "shash", "left_anti")

    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = shingled.select(F.col("id").alias("id_a"), "shash")
    b = shingled.select(F.col("id").alias("id_b"), "shash")
    inter = (
        a.join(b, "shash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("double").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    # plain shuffle joins on id — the size table is one row PER DOCUMENT,
    # so a forced broadcast dies at billions of docs; AQE may still pick
    # broadcast when the corpus is genuinely small
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- MinHash LSH
def _cap_buckets(
    tagged: DataFrame, keys: list[str], cap: int | None, who: str
) -> DataFrame:
    """Shared bucket-size guard for the banded self-joins: drop groups of
    ``keys`` larger than ``cap`` before candidate generation. The
    oversized-bucket list is tiny by construction and broadcast; the
    tagged side never shuffles for the filter. Logs how many buckets
    (and member rows) were skipped — capping must never be silent."""
    if cap is None:
        return tagged
    big = (
        tagged.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
    )
    stats = big.agg(
        F.count(F.lit(1)).alias("buckets"), F.sum("n").alias("rows")
    ).collect()[0]
    if stats["buckets"]:
        log.info(
            "%s: skipping %d buckets (> %d members, %d rows total) for "
            "candidate generation", who, stats["buckets"], cap, stats["rows"],
        )
    return tagged.join(F.broadcast(big.select(*keys)), keys, "left_anti")


def _minhash_matrix(shingle_hashes: list[np.ndarray], n_perm: int, seed: int) -> np.ndarray:
    """(n_docs, n_perm) uint64 minhash signatures via affine permutations."""
    rng = np.random.default_rng(seed)
    P = np.uint64((1 << 61) - 1)  # Mersenne prime
    a = rng.integers(1, P, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, P, size=n_perm, dtype=np.uint64)
    out = np.full((len(shingle_hashes), n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, hs in enumerate(shingle_hashes):
        if len(hs) == 0:
            continue
        # (n_sh, n_perm): (a*h + b) mod P, min over shingles
        vals = (hs[:, None] * a[None, :] + b[None, :]) % P
        out[i] = vals.min(axis=0)
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """→ (id, sig array<long>) minhash signatures, Arrow-batched.

    Shingle base hashes are crc32 of the k-word shingle — identical in the
    pure-Python test oracle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sh_hashes = []
            for t in pdf[text_col]:
                words = [w for w in (t or "").lower().split() if w]
                sh = {
                    " ".join(words[i : i + k])
                    for i in range(max(len(words) - k + 1, 1))
                }
                sh_hashes.append(
                    np.array(
                        sorted(zlib.crc32(s.encode()) for s in sh if s), dtype=np.uint64
                    )
                )
            sig = _minhash_matrix(sh_hashes, n_perm, seed)
            # store as int64 (Spark long); values < 2^61 so no overflow
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sig": list(sig.astype(np.int64))}
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, sig array<long>"
    )


def minhash_lsh_pairs(
    sigs: DataFrame,
    id_col: str,
    n_perm: int = 64,
    n_bands: int = 16,
    min_est_jaccard: float = 0.5,
    cache_handle: list | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs from banded minhash buckets + estimated Jaccard.

    rows-per-band = n_perm/n_bands; a pair collides in ≥1 band with
    probability 1-(1-j^r)^b. Estimated Jaccard = matching-component
    fraction of the two signatures (zip_with equality mean).

    ``max_bucket_size``: the scale guard. A degenerate bucket (millions
    of near-empty docs sharing one signature band) explodes the
    self-join quadratically. With a cap, (band, bucket) groups larger
    than it are skipped for candidate generation — the skipped bucket
    list is tiny (only the pathological ones), broadcast for the
    anti-join, and its size is logged (no silent truncation). Members of
    a skipped bucket can still pair through their other n_bands−1 bands;
    true mass-duplicates should be collapsed by
    :func:`exact_duplicate_groups` FIRST, which is both cheaper and
    exact for that case. Default ``None`` = off (oracle-exact).

    An INTERNAL projection of the signature table is cached before the
    self-join (never the caller's frame — persisting an input is a
    visible side effect the caller may not want): both join branches
    reference it, and Spark would otherwise run the signature UDF twice
    (production shape: signatures land in a table once — they're ~500
    bytes/doc vs the full text). ``cache_handle`` (a list) receives the
    persisted frame for deterministic unpersist by the caller.
    """
    sigs = sigs.select(F.col(id_col), F.col("sig")).persist()
    if cache_handle is not None:
        cache_handle.append(sigs)
    r = n_perm // n_bands
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col("sig"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.transform(F.slice("sig", b * r + 1, r), lambda x: x.cast("string"))), b),
            )
        ).alias("band", "bucket"),
    )
    banded = _cap_buckets(banded, ["band", "bucket"], max_bucket_size, "minhash_lsh_pairs")
    a = banded.select("band", "bucket", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = banded.select("band", "bucket", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1.0).otherwise(0.0)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(float(n_perm))
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


# ------------------------------------------------------------------- SimHash
def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, seed: int = 42
) -> DataFrame:
    """→ (id, simhash long): 64-bit SimHash over word tokens (crc32-seeded
    per-word 64-bit hashes via two crc32 halves)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf[text_col]:
                words = [w for w in (t or "").lower().split() if w]
                acc = np.zeros(64, dtype=np.int64)
                for w in words:
                    wb = w.encode()
                    h = (zlib.crc32(wb, seed) << 32) | zlib.crc32(wb, seed + 1)
                    for bit in range(64):
                        acc[bit] += 1 if (h >> bit) & 1 else -1
                sh = 0
                for bit in range(64):
                    if acc[bit] > 0:
                        sh |= 1 << bit
                # to signed int64
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, simhash long"
    )


def simhash_near_pairs(
    sigs: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    cache_handle: list | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Pairs within hamming distance ≤ max_hamming via banded blocking.

    By pigeonhole, hamming < n_bands ⇒ at least one (64/n_bands)-bit band
    is identical — candidates join on (band, chunk), then exact hamming
    (bit_count of xor) filters. Choose n_bands > max_hamming for a
    completeness guarantee; no all-pairs join ever runs.

    ``max_bucket_size``: same scale guard and logging contract as
    :func:`minhash_lsh_pairs` — (band, chunk) groups larger than the cap
    are skipped (a million empty docs share simhash 0 and would pair
    quadratically; collapse those with :func:`exact_duplicate_groups`
    first). Default ``None`` = off (oracle-exact, pigeonhole guarantee
    intact).

    An internal projection of the signatures is cached before the
    self-join (same rationale and cache_handle contract as
    minhash_lsh_pairs: both branches would re-run the signature UDF).
    """
    sigs = sigs.select(F.col(id_col), F.col("simhash")).persist()
    if cache_handle is not None:
        cache_handle.append(sigs)
    assert 64 % n_bands == 0, "n_bands must divide 64"
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * bits).bitwiseAND(F.lit(mask)).alias("chunk"),
            )
            for i in range(n_bands)
        ]
    )
    tagged = sigs.select(
        F.col(id_col).alias("id"), "simhash", F.explode(bands).alias("bb")
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    tagged = _cap_buckets(tagged, ["band", "chunk"], max_bucket_size, "simhash_near_pairs")
    a = tagged.select("band", "chunk", F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = tagged.select("band", "chunk", F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ----------------------------------------------------- eval decontamination
def cross_split_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str,
    train: str = "train",
    holdout: tuple[str, ...] = ("val", "test"),
    k: int = 5,
) -> DataFrame:
    """Training docs that share ≥1 k-word shingle with ANY holdout doc —
    the standard eval-set decontamination pass an LLM training pipeline
    runs before every data release.

    Inverted-index shape: both sides explode to (shingle_hash, id); the
    holdout side collapses to DISTINCT hashes (eval sets are small →
    broadcast), so the join is a broadcast semi-probe on the train
    posting table — the 10^12-doc side shuffles nothing. Returns
    (id, n_shared) where n_shared counts the train doc's distinct
    shingles that also occur anywhere in the holdout.
    """
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.col(split_col).alias("split"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("sh"),
    ).select("id", "split", F.xxhash64("sh").alias("shash"))
    train_side = shingled.filter(F.col("split") == train).select("id", "shash")
    hold = (
        shingled.filter(F.col("split").isin(list(holdout)))
        .select("shash")
        .distinct()
    )
    return (
        train_side.join(F.broadcast(hold), "shash")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
