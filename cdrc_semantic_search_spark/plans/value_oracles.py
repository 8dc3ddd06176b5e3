"""VALUES-literal DuckDB oracles for queries whose logic is deterministic
but not directly SQL-expressible (seeded LSH banding, crc32 signatures,
xxhash64 fingerprints, the KG fixture pipeline).

Each oracle is an INDEPENDENT pure-Python/NumPy twin of the Spark query:
it re-derives the expected rows from the sf0.01 parquet inputs (the
driver's fixed oracle-compare scale factor) or the deterministic fixture,
then renders them as ``SELECT CAST(...) FROM (VALUES ...)`` so the
DuckDB-side value-hash check is exact. The twins deliberately avoid the
Spark execution path: candidate generation is done by direct bucket/band
EQUALITY (sets in a dict), never by re-running the distributed join —
so the oracle catches self-join, dropDuplicates, exchange and UDF
batching bugs the Spark plan could introduce. Shared *specification*
kernels (crc32, the seeded hyperplane matrix, the driver-side k-means)
are reused where they ARE the operator's definition.

The SQL strings are built lazily (first request) and cached — the driver
calls ``oracle_sql()`` once per round; each twin costs well under a
second at sf0.01.
"""

from __future__ import annotations

import math
import re
import zlib
from decimal import ROUND_HALF_UP, Decimal
from typing import Callable

import numpy as np

ORACLE_SF_DIR = "/root/testdata/sf0.01"

_CACHE: dict[str, str] = {}
_BUILDERS: dict[str, Callable[[], str]] = {}


def lazy(name: str) -> Callable[[], str]:
    """A zero-arg callable producing the VALUES oracle for ``name``
    (registered below); results are cached per process."""

    def build() -> str:
        if name not in _CACHE:
            _CACHE[name] = _BUILDERS[name]()
        return _CACHE[name]

    build.__name__ = f"values_oracle_{name}"
    return build


def _register(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


# ------------------------------------------------------------- SQL rendering
def _lit(v, typ: str) -> str:
    if v is None:
        return "NULL"
    if typ == "VARCHAR":
        s = str(v)
        if "\x00" in s:
            # DuckDB (like Postgres) cannot represent NUL inside a string
            # literal — fail loudly rather than emit unparseable SQL
            raise ValueError("NUL byte in VARCHAR oracle literal")
        return "'" + s.replace("'", "''") + "'"
    if typ == "TIMESTAMP":
        # fixture timestamps are second-resolution; str(pd.Timestamp)
        # renders 'YYYY-MM-DD HH:MM:SS', which both engines parse exactly
        return f"'{v}'"
    if typ == "DOUBLE":
        f = float(v)
        if math.isnan(f):
            return "'NaN'::DOUBLE"
        # string→double (strtod) is correctly rounded; a bare 17-digit
        # literal would land in DECIMAL(38) first, whose →DOUBLE cast is
        # NOT correctly rounded above 2^53 unscaled (NOTES.md)
        return f"CAST('{f!r}' AS DOUBLE)"
    return str(int(v))


def values_sql(rows: list[tuple], schema: list[tuple[str, str]]) -> str:
    """rows + [(col_name, duck_type)] → a typed VALUES SELECT. The outer
    CAST pins every column's type (a bare 0.9 literal would come back as
    DECIMAL and hash differently from Spark's DOUBLE)."""
    if not rows:
        inner = "SELECT " + ", ".join(
            f"CAST(NULL AS {t}) AS {n}" for n, t in schema
        ) + " WHERE 1=0"
        return inner
    cols = ", ".join(f"c{i}" for i in range(len(schema)))
    body = ",\n".join(
        "(" + ", ".join(_lit(v, t) for v, (_, t) in zip(r, schema)) + ")"
        for r in rows
    )
    casts = ", ".join(
        f"CAST(c{i} AS {t}) AS {n}" for i, (n, t) in enumerate(schema)
    )
    return f"SELECT {casts} FROM (VALUES\n{body}\n) AS t({cols})"


def _round_half_up(x: float, digits: int = 6) -> float:
    """Spark's ROUND(double, d): HALF_UP on the double's SHORTEST decimal
    representation (java BigDecimal.valueOf uses Double.toString; Python
    repr produces the same shortest round-trip digits) — neither Python's
    banker's round nor the exact binary expansion: Decimal(0.1234565) is
    0.12345649999..., which would round DOWN, but Spark yields 0.123457."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _read(table: str, columns: list[str]):
    import pyarrow.parquet as pq

    return pq.read_table(f"{ORACLE_SF_DIR}/{table}.parquet", columns=columns)


def _fold_cosine(a, b) -> float:
    """V.cosine's exact arithmetic: sequential left-fold dot in DOUBLE
    (same order DuckDB's list_dot_product and Spark's aggregate use).
    Zero vectors yield NaN (IEEE 0/0, like Spark's double division) —
    NaN fails any ``>= threshold`` filter on both engines."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        x = float(x)
        y = float(y)
        dot += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    if denom == 0.0:
        return float("nan")
    return dot / denom


# ----------------------------------------------------------------- text prep
def _words(text: str | None) -> list[str]:
    return [w for w in (text or "").lower().split() if w]


def _tokens(text: str | None) -> list[str]:
    """functions.text.tokens twin: split(lower, '[^a-z0-9]+'), drop ''."""
    return [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]


def _word_shingles(text: str | None, k: int) -> list[str]:
    """functions.text.word_shingles twin (ordered, keeps duplicates)."""
    toks = _tokens(text)
    if len(toks) >= k:
        raw = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        raw = [" ".join(toks)]
    return [s for s in raw if s != ""]


# ------------------------------------------------------------------- XXH64
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64 (Spark's xxhash64 on a string hashes its UTF-8
    bytes with seed 42). Returns SIGNED int64, matching Spark's LongType.
    Verified against F.xxhash64 in tests/test_value_oracles.py."""
    def word(off: int, width: int = 8) -> int:
        return int.from_bytes(data[off : off + width], "little")

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = (_rotl((v1 + word(i) * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + word(i + 8) * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + word(i + 16) * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + word(i + 24) * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h ^ k) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((word(i) * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((word(i, 4) * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# =====================================================================
# the twins
# =====================================================================

def _pairs_from_buckets(
    buckets: dict[tuple, list], cap: int | None = None
) -> set[tuple]:
    """All (id_a < id_b) pairs sharing ≥1 bucket — pure bookkeeping
    shared by the banding twins (the bucket CONTENTS stay
    twin-specific). ``cap`` models the engine's ``max_bucket_size``
    guard: buckets with more than ``cap`` members generate no pairs."""
    pairs: set[tuple] = set()
    for members in buckets.values():
        if cap is not None and len(members) > cap:
            continue
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def _docs_with_shift(id_bound: int, shift: int):
    t = _read("documents", ["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    rows = list(zip(ids, texts))
    rows += [(i + shift, tx) for i, tx in rows if i < id_bound]
    return rows


def _minhash_sigs_buckets(docs: list[tuple]) -> tuple[dict, dict]:
    """Shared MinHash twin kernel: (sigs, buckets) by the engine's
    affine-permutation spec (seed 42, n_perm 64, 16 bands, k=3 shingles,
    crc32 base hashes) — band membership by direct slice EQUALITY.
    Every minhash-derived twin (pairs, capped pairs, blocking quality)
    derives from here, so a seed/constant change desyncs NOTHING."""
    n_perm, n_bands, k = 64, 16, 3
    r = n_perm // n_bands
    P = np.uint64((1 << 61) - 1)
    rng = np.random.default_rng(42)
    a = rng.integers(1, P, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, P, size=n_perm, dtype=np.uint64)
    sigs: dict[int, np.ndarray] = {}
    for doc_id, text in docs:
        words = _words(text)
        sh = {" ".join(words[i : i + k]) for i in range(max(len(words) - k + 1, 1))}
        hs = np.array(sorted(zlib.crc32(s.encode()) for s in sh if s), dtype=np.uint64)
        if len(hs):
            sig = ((hs[:, None] * a[None, :] + b[None, :]) % P).min(axis=0)
        else:
            sig = np.full(n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        sigs[doc_id] = sig.astype(np.int64)
    buckets: dict[tuple, list[int]] = {}
    for doc_id, sig in sigs.items():
        for band in range(n_bands):
            buckets.setdefault(
                (band, tuple(sig[band * r : (band + 1) * r])), []
            ).append(doc_id)
    return sigs, buckets


def _minhash_lsh_twin(docs: list[tuple], cap: int | None = None) -> list[tuple]:
    """MinHash+LSH pair twin over the shared kernel, est ≥ 0.9 filter and
    optional bucket-size cap mirroring the engine guard."""
    n_perm = 64
    sigs, buckets = _minhash_sigs_buckets(docs)
    pairs = _pairs_from_buckets(buckets, cap)
    rows = []
    for ia, ib in sorted(pairs):
        est = float((sigs[ia] == sigs[ib]).sum()) / n_perm
        if est >= 0.9:
            rows.append((ia, ib, est))
    return rows


@_register("dedup_minhash_lsh")
def _minhash_lsh_values() -> str:
    """MinHash+LSH twin over documents + 50 shifted clones."""
    rows = _minhash_lsh_twin(_docs_with_shift(50, 10_000))
    return values_sql(
        rows,
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("est_jaccard", "DOUBLE")],
    )


@_register("dedup_minhash_lsh_capped")
def _minhash_lsh_capped_values() -> str:
    """Capped-guard twin: same corpus plus a 30-copy mass-duplicate block
    of doc 0's text (ids 20000..20029). With max_bucket_size=10 every
    band bucket holding the mass block (32 members: the block, doc 0,
    and doc 0's shifted clone) is skipped, so doc 0 contributes no
    pairs, while clones 1..49 still surface through their own 2-member
    buckets — the exact drop the engine's guard performs."""
    docs = _docs_with_shift(50, 10_000)
    text0 = next(tx for i, tx in docs if i == 0)
    docs = docs + [(20_000 + i, text0) for i in range(30)]
    rows = _minhash_lsh_twin(docs, cap=10)
    return values_sql(
        rows,
        [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("est_jaccard", "DOUBLE")],
    )


@_register("dedup_simhash")
def _simhash_values() -> str:
    """SimHash twin: crc32-seeded 64-bit word hashes, majority bits,
    pigeonhole 16-bit chunk blocking by direct equality."""
    max_hamming, n_bands, seed = 3, 4, 42
    bits = 64 // n_bands
    mask = (1 << bits) - 1
    docs = _docs_with_shift(50, 10_000)
    sigs: dict[int, int] = {}
    shifts = np.arange(64, dtype=np.uint64)
    for doc_id, text in docs:
        acc = np.zeros(64, dtype=np.int64)
        for w in _words(text):
            wb = w.encode()
            h = np.uint64((zlib.crc32(wb, seed) << 32) | zlib.crc32(wb, seed + 1))
            acc += np.where((h >> shifts) & np.uint64(1), 1, -1)
        sh = int(((acc > 0).astype(np.uint64) << shifts).sum())
        sigs[doc_id] = sh  # keep unsigned for chunking; sign only matters in Spark storage
    buckets: dict[tuple, list[int]] = {}
    for doc_id, sh in sigs.items():
        for band in range(n_bands):
            buckets.setdefault((band, (sh >> (band * bits)) & mask), []).append(doc_id)
    pairs = _pairs_from_buckets(buckets)
    rows = []
    for ia, ib in sorted(pairs):
        ham = bin(sigs[ia] ^ sigs[ib]).count("1")
        if ham <= max_hamming:
            rows.append((ia, ib, ham))
    return values_sql(
        rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("hamming", "INTEGER")]
    )


@_register("dedup_embedding_lsh")
def _embedding_lsh_values() -> str:
    """Random-hyperplane LSH twin over embeddings + 50 shifted clones:
    buckets from the shared seeded-plane kernel, candidates by direct
    (band, bucket) set intersection, exact left-fold cosine re-check."""
    from cdrc_semantic_search_spark.operators.similarity import (
        lsh_bucket_matrix,
        lsh_planes,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    rows_in = list(zip(ids, vecs))
    rows_in += [(i + 100_000, v) for i, v in rows_in if i < 50]
    dim = len(rows_in[0][1])
    mat = np.stack([v for _, v in rows_in])
    buckets_m = lsh_bucket_matrix(mat, lsh_planes(dim, 16, 42), 4)
    buckets: dict[tuple, list[int]] = {}
    for (vid, _), brow in zip(rows_in, buckets_m):
        for band, bucket in enumerate(brow):
            buckets.setdefault((band, int(bucket)), []).append(vid)
    by_id = dict(rows_in)
    pairs = _pairs_from_buckets(buckets)
    rows = []
    for ia, ib in sorted(pairs):
        score = _fold_cosine(by_id[ia], by_id[ib])
        if score >= 0.9:
            rows.append((ia, ib, _round_half_up(score, 6)))
    return values_sql(
        rows, [("id_a", "BIGINT"), ("id_b", "BIGINT"), ("score", "DOUBLE")]
    )


@_register("ta_winnowing")
def _winnowing_values() -> str:
    """Winnowing twin: xxh64 shingle hashes, window-of-4 minima,
    distinct count — replicates the Catalyst expression end to end."""
    k, window = 5, 4
    t = _read("documents", ["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        if doc_id >= 100:
            continue
        hashes = [xxh64(s.encode()) for s in _word_shingles(text, k)]
        n = len(hashes)
        fps = set()
        for start in range(max(n - (window - 1), 1)):
            win = hashes[start : start + window]
            fps.add(min(win) if win else None)
        rows.append((doc_id, len(fps)))
    return values_sql(rows, [("doc_id", "BIGINT"), ("n_fps", "INTEGER")])


@_register("ann_ivf_topk")
def _ann_ivf_values() -> str:
    """IVF twin: same driver-side centroids (they're an INPUT to the
    distributed op), then probe/assign/score/rank re-derived with plain
    dict lookups and the exact left-fold cosine."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _probe_sets,
        _unit_rows,
        train_centroids,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    cent = train_centroids(sample, n_centroids=16, seed=42)

    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    # float64 argmax, matching ivf_assign's batch-shape-robust bucketing
    assign = (corpus.astype(np.float64) @ cent.astype(np.float64).T).argmax(axis=1)
    bucket_members: dict[int, list[int]] = {}
    for idx, b in enumerate(assign):
        bucket_members.setdefault(int(b), []).append(idx)
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        probed = _probe_sets(q, cent, 4)[0]
        cand = []
        for b in probed:
            for ci in bucket_members.get(int(b), []):
                cand.append((-_fold_cosine(vecs[qi], vecs[ci]), ids[ci]))
        cand.sort()
        for rank, (neg, cid) in enumerate(cand[:5], start=1):
            rows.append((qid, cid, _round_half_up(-neg, 6), rank))
    return values_sql(
        rows,
        [("q_id", "BIGINT"), ("c_id", "BIGINT"), ("score", "DOUBLE"), ("rank", "INTEGER")],
    )


def _fixture_triples():
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.oracle import oracle_triples

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    return oracle_triples(fx.transcripts, fx.entities, Settings())


@_register("kg_nodes_fixture")
def _kg_nodes_values() -> str:
    """Node-table twin: single-process mention extraction + linking over
    the deterministic fixture, counted per entity and left-joined onto the
    full entity dim (unmentioned entities keep n_mentions = 0) — the same
    kernels (extract_turn, _link) that ARE the linking specification,
    applied one turn at a time outside Spark."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.operators.extraction_core import (
        AliasMatcher,
        extract_turn,
    )
    from cdrc_semantic_search_spark.operators.linking import build_entity_index
    from cdrc_semantic_search_spark.oracle import _link

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    settings = Settings()
    matcher = AliasMatcher(
        [
            (r.entity_id, [r.canonical_name, *list(r.aliases)])
            for r in fx.entities.itertuples()
        ]
    )
    index = build_entity_index(fx.entities, settings)
    counts: dict[str, int] = {}
    link_cache: dict[str, str | None] = {}
    for r in fx.transcripts.itertuples():
        mentions, _ = extract_turn(r.text or "", matcher)
        for m in mentions:
            if m.surface not in link_cache:
                link_cache[m.surface] = _link(m.surface, index, settings)[0]
            eid = link_cache[m.surface]
            if eid is not None:
                counts[eid] = counts.get(eid, 0) + 1
    rows = [
        (r.entity_id, r.canonical_name, r.entity_type, counts.get(r.entity_id, 0))
        for r in fx.entities.itertuples()
    ]
    return values_sql(
        rows,
        [
            ("entity_id", "VARCHAR"),
            ("canonical_name", "VARCHAR"),
            ("entity_type", "VARCHAR"),
            ("n_mentions", "BIGINT"),
        ],
    )


@_register("kg_triples_fixture")
def _kg_triples_values() -> str:
    """The KG capstone's oracle: the single-process pure-pandas pipeline
    twin (oracle.oracle_triples) over the deterministic fixture — the
    same twin the P/R parity pytest pins, now also hashed by the driver."""
    pdf = _fixture_triples()
    # 4-digit half-up rounding mirrors the Spark query (which rounds to
    # absorb float32 batch-composition noise in the fused linker; every
    # fixture score is ≥1.8e-6 from a 4-digit boundary, noise is ~1e-7)
    rows = [
        (
            r.conv_id,
            int(r.turn_idx),
            r.subj_entity_id,
            r.pred,
            r.obj_entity_id,
            _round_half_up(float(r.score), 4),
        )
        for r in pdf.itertuples(index=False)
    ]
    return values_sql(
        rows,
        [
            ("conv_id", "VARCHAR"),
            ("turn_idx", "INTEGER"),
            ("subj_entity_id", "VARCHAR"),
            ("pred", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("score", "DOUBLE"),
        ],
    )


@_register("kg_edges_fixture")
def _kg_edges_values() -> str:
    """kg_edges rollup of the fixture triples twin (weights only — the
    Spark query drops the ts span columns)."""
    pdf = _fixture_triples()
    agg = (
        pdf.groupby(["subj_entity_id", "pred", "obj_entity_id"])
        .size()
        .reset_index(name="weight")
    )
    rows = [
        (r.subj_entity_id, r.pred, r.obj_entity_id, int(r.weight))
        for r in agg.itertuples(index=False)
    ]
    return values_sql(
        rows,
        [
            ("subj_entity_id", "VARCHAR"),
            ("pred", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("weight", "BIGINT"),
        ],
    )


def _fixture_triples_with_ts():
    """Fixture triples twin joined back to each turn's timestamp — the
    temporal twins need per-observation event times, which the triple
    twin deliberately omits (P/R compares keys only)."""
    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    pdf = _fixture_triples()
    ts = fx.transcripts[["conv_id", "turn_idx", "ts"]]
    return pdf.merge(ts, on=["conv_id", "turn_idx"], how="left")


@_register("kg_edges_temporal")
def _kg_edges_temporal_values() -> str:
    """Temporal-extent twin: weight + [first_ts, last_ts] activity span
    per edge — the validity-interval view of the knowledge graph."""
    pdf = _fixture_triples_with_ts()
    agg = (
        pdf.groupby(["subj_entity_id", "pred", "obj_entity_id"])
        .agg(weight=("ts", "size"), first_ts=("ts", "min"), last_ts=("ts", "max"))
        .reset_index()
    )
    rows = [
        (
            r.subj_entity_id,
            r.pred,
            r.obj_entity_id,
            int(r.weight),
            str(r.first_ts),
            str(r.last_ts),
        )
        for r in agg.itertuples(index=False)
    ]
    return values_sql(
        rows,
        [
            ("subj_entity_id", "VARCHAR"),
            ("pred", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("weight", "BIGINT"),
            ("first_ts", "TIMESTAMP"),
            ("last_ts", "TIMESTAMP"),
        ],
    )


@_register("kg_two_hop_paths")
def _kg_two_hop_values() -> str:
    """Relation-composition twin: collapse fixture edges across
    predicates to (subj, obj, w), then enumerate two-hop paths
    a→mid→c (a≠c) in plain dicts — n_mids distinct midpoints and
    path_weight = Σ w1·w2 per (a, c) pair."""
    pdf = _fixture_triples()
    w: dict[tuple[str, str], int] = {}
    for r in pdf.itertuples(index=False):
        k = (r.subj_entity_id, r.obj_entity_id)
        w[k] = w.get(k, 0) + 1
    out_adj: dict[str, list[tuple[str, int]]] = {}
    for (a, b), wt in w.items():
        out_adj.setdefault(a, []).append((b, wt))
    paths: dict[tuple[str, str], tuple[set, int]] = {}
    for (a, mid), w1 in w.items():
        for c, w2 in out_adj.get(mid, []):
            if a == c:
                continue
            mids, pw = paths.setdefault((a, c), (set(), 0))
            mids.add(mid)
            paths[(a, c)] = (mids, pw + w1 * w2)
    rows = [
        (a, c, len(mids), pw) for (a, c), (mids, pw) in paths.items()
    ]
    return values_sql(
        rows,
        [
            ("subj_entity_id", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("n_mids", "BIGINT"),
            ("path_weight", "BIGINT"),
        ],
    )


@_register("kg_meta_paths")
def _kg_meta_paths_values() -> str:
    """Relation-composition STATISTICS twin: typed edges (subj, pred,
    obj, w); every composable a→[p1]→mid→[p2]→c path (a≠c) rolled up per
    (p1, p2) — n_paths (edge-pair count), Σ w1·w2, distinct (a, c)
    endpoint pairs."""
    pdf = _fixture_triples()
    w: dict[tuple[str, str, str], int] = {}
    for r in pdf.itertuples(index=False):
        k = (r.subj_entity_id, r.pred, r.obj_entity_id)
        w[k] = w.get(k, 0) + 1
    out_adj: dict[str, list[tuple[str, str, int]]] = {}
    for (a, p, b), wt in w.items():
        out_adj.setdefault(a, []).append((p, b, wt))
    agg: dict[tuple[str, str], list] = {}
    for (a, p1, mid), w1 in w.items():
        for p2, c, w2 in out_adj.get(mid, []):
            if a == c:
                continue
            acc = agg.setdefault((p1, p2), [0, 0, set()])
            acc[0] += 1
            acc[1] += w1 * w2
            acc[2].add((a, c))
    rows = [
        (p1, p2, n, pw, len(pairs))
        for (p1, p2), (n, pw, pairs) in agg.items()
    ]
    return values_sql(
        sorted(rows),
        [
            ("pred1", "VARCHAR"),
            ("pred2", "VARCHAR"),
            ("n_paths", "BIGINT"),
            ("path_weight", "BIGINT"),
            ("n_pairs", "BIGINT"),
        ],
    )


@_register("kg_negative_samples")
def _kg_negative_samples_values() -> str:
    """Negative-sampling twin: per positive edge, 2 md5-picked corrupted
    tails from the sorted entity list, dropping hits on the true tail,
    the head, or any positive edge — plain dict/set arithmetic."""
    import hashlib

    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    pdf = _fixture_triples()
    edges = sorted(
        {
            (r.subj_entity_id, r.pred, r.obj_entity_id)
            for r in pdf.itertuples(index=False)
        }
    )
    posset = set(edges)
    ents = sorted(fx.entities.entity_id.tolist())
    n = len(ents)
    rows = []
    for s, p, o in edges:
        for i in range(2):
            d = hashlib.md5(f"neg{i}|{s}|{p}|{o}".encode()).hexdigest()
            cand = ents[int(d[:8], 16) % n]
            if cand == o or cand == s or (s, p, cand) in posset:
                continue
            rows.append((s, p, cand, i))
    return values_sql(
        rows,
        [
            ("subj_entity_id", "VARCHAR"),
            ("pred", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("neg_idx", "INTEGER"),
        ],
    )


@_register("kg_type_assortativity")
def _kg_type_assortativity_values() -> str:
    """Type-pair mixing matrix twin: triple counts per (subject type,
    object type), from the pure-Python triples joined to the entity dim."""
    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    types = dict(zip(fx.entities.entity_id, fx.entities.entity_type))
    pdf = _fixture_triples()
    counts: dict[tuple[str, str], int] = {}
    for r in pdf.itertuples(index=False):
        k = (types[r.subj_entity_id], types[r.obj_entity_id])
        counts[k] = counts.get(k, 0) + 1
    rows = [(s, o, n) for (s, o), n in counts.items()]
    return values_sql(
        rows,
        [
            ("subj_type", "VARCHAR"),
            ("obj_type", "VARCHAR"),
            ("n_triples", "BIGINT"),
        ],
    )


@_register("ann_pq_topk")
def _ann_pq_values() -> str:
    """PQ-ADC twin: the codebooks are shared specification (an INPUT of
    the distributed op, like IVF's centroids); encoding and the ADC scan
    are re-derived here with plain per-candidate loops over the full
    corpus — float32 LUT sums in the same fixed subspace order, so the
    scores are bit-identical before the ROUND(6)."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _pq_codes,
        _pq_luts,
        _unit_rows,
        train_pq_codebooks,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)

    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    codes = _pq_codes(corpus, books)
    m, k_codes, sub = books.shape
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        lut = _pq_luts(q, books)[0]  # (m, k), same kernel as the operator
        scored = []
        for ci in range(len(corpus)):
            s = np.float32(0.0)
            for j in range(m):
                s += lut[j][codes[ci, j]]
            scored.append((-float(s), ids[ci]))
        scored.sort()
        for rank, (neg, cid) in enumerate(scored[:5], start=1):
            rows.append((qid, cid, _round_half_up(-neg, 6), rank))
    return values_sql(
        rows,
        [("q_id", "BIGINT"), ("c_id", "BIGINT"), ("score", "DOUBLE"), ("rank", "INTEGER")],
    )


@_register("ann_ivfpq_topk")
def _ann_ivfpq_values() -> str:
    """IVF×PQ twin: coarse centroids, codebooks, probe selection, LUTs
    all shared specification kernels (driver-side inputs of the
    distributed op); candidate restriction and the ADC scan re-derived
    with plain dict/loop arithmetic over the probed buckets only."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _pq_codes,
        _pq_luts,
        _probe_sets,
        _unit_rows,
        train_centroids,
        train_pq_codebooks,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    cent = train_centroids(sample, n_centroids=16, seed=42)
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)

    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    # float64 argmax, matching topk_ivfpq's batch-shape-robust bucketing
    assign = (corpus.astype(np.float64) @ cent.astype(np.float64).T).argmax(axis=1)
    codes = _pq_codes(corpus, books)
    bucket_members: dict[int, list[int]] = {}
    for idx, b in enumerate(assign):
        bucket_members.setdefault(int(b), []).append(idx)
    p = 4
    m = books.shape[0]
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        lut = _pq_luts(q, books)[0]
        probed = _probe_sets(q, cent, p)[0]
        scored = []
        for b in probed:
            for ci in bucket_members.get(int(b), []):
                s = np.float32(0.0)
                for j in range(m):
                    s += lut[j][codes[ci, j]]
                scored.append((-float(s), ids[ci]))
        scored.sort()
        for rank, (neg, cid) in enumerate(scored[:5], start=1):
            rows.append((qid, cid, _round_half_up(-neg, 6), rank))
    return values_sql(
        rows,
        [("q_id", "BIGINT"), ("c_id", "BIGINT"), ("score", "DOUBLE"), ("rank", "INTEGER")],
    )


@_register("ann_pq_rerank")
def _ann_pq_rerank_values() -> str:
    """Coarse-to-fine twin: the PQ shortlist re-derived via the shared
    kernels (codes, LUTs — same float32 sums), then exact left-fold
    cosine re-rank of only the shortlisted candidates."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _pq_codes,
        _pq_luts,
        _unit_rows,
        train_pq_codebooks,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    codes = _pq_codes(corpus, books)
    m = books.shape[0]
    by_id = {ids[i]: i for i in range(len(ids))}
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        lut = _pq_luts(q, books)[0]
        scored = []
        for ci in range(len(corpus)):
            s = np.float32(0.0)
            for j in range(m):
                s += lut[j][codes[ci, j]]
            scored.append((-float(s), ids[ci]))
        scored.sort()
        short = [cid for _, cid in scored[:20]]
        fine = sorted(
            (
                (-_fold_cosine(vecs[qi], vecs[by_id[cid]]), cid)
                for cid in short
            )
        )
        for rank, (neg, cid) in enumerate(fine[:5], start=1):
            rows.append((qid, cid, _round_half_up(-neg, 6), rank))
    return values_sql(
        rows,
        [("q_id", "BIGINT"), ("c_id", "BIGINT"), ("score", "DOUBLE"), ("rank", "INTEGER")],
    )


@_register("ann_ivfpq_residual")
def _ann_ivfpq_residual_values() -> str:
    """Residual IVF×PQ twin: codes of (unit − coarse centroid), score =
    q·centroid[bucket] + LUT sum (coarse term added LAST, matching the
    operator's accumulation order); all kernels shared."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _pq_codes,
        _pq_luts,
        _probe_sets,
        _query_centroid_ip,
        _unit_rows,
        train_centroids,
        train_residual_codebooks,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    cent = train_centroids(sample, n_centroids=16, seed=42)
    books = train_residual_codebooks(sample, cent, m=8, k=16, seed=42)

    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    assign = (corpus.astype(np.float64) @ cent.astype(np.float64).T).argmax(axis=1)
    residuals = corpus - cent.astype(np.float32)[assign]
    codes = _pq_codes(residuals, books)
    m = books.shape[0]
    p = 4
    bucket_members: dict[int, list[int]] = {}
    for idx, b in enumerate(assign):
        bucket_members.setdefault(int(b), []).append(idx)
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        lut = _pq_luts(q, books)[0]
        qc = _query_centroid_ip(q, cent)[0]
        probed = _probe_sets(q, cent, p)[0]
        scored = []
        for b in probed:
            for ci in bucket_members.get(int(b), []):
                s = np.float32(0.0)
                for j in range(m):
                    s += lut[j][codes[ci, j]]
                s += qc[int(assign[ci])]
                scored.append((-float(s), ids[ci]))
        scored.sort()
        for rank, (neg, cid) in enumerate(scored[:5], start=1):
            rows.append((qid, cid, _round_half_up(-neg, 6), rank))
    return values_sql(
        rows,
        [("q_id", "BIGINT"), ("c_id", "BIGINT"), ("score", "DOUBLE"), ("rank", "INTEGER")],
    )


# ----------------------------------------------------- transcript analytics
def _fixture_transcripts_pdf():
    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    return fx.transcripts


@_register("tr_tool_transitions")
def _tr_tool_transitions_values() -> str:
    """Twin of operators/transcript_analytics.tool_transition_counts:
    per conversation, the tool names of tool turns in turn order; count
    (prev, cur) over consecutive calls with '<start>' openers — derived
    with dicts and sorts, never a window function."""
    pdf = _fixture_transcripts_pdf()
    counts: dict[tuple[str, str], int] = {}
    for conv_id, grp in pdf.groupby("conv_id"):
        seq = [
            str(r.tool)
            for r in grp.sort_values("turn_idx").itertuples()
            if str(r.tool) != ""
        ]
        prev = "<start>"
        for t in seq:
            counts[(prev, t)] = counts.get((prev, t), 0) + 1
            prev = t
    rows = [(p, t, n) for (p, t), n in sorted(counts.items())]
    return values_sql(
        rows,
        [("prev_tool", "VARCHAR"), ("tool", "VARCHAR"), ("n", "BIGINT")],
    )


@_register("tr_turn_latency")
def _tr_turn_latency_values() -> str:
    """Twin of turn_latency_stats: integer-second gap to the previous
    turn of the conversation (any role), rolled up per responding role.
    Integer sums — exact regardless of accumulation order.

    The gap is the difference of PER-TIMESTAMP second floors (mirroring
    Spark's unix_timestamp(ts) − unix_timestamp(prev)), not the floor of
    the float difference — on sub-second timestamps the two disagree
    (09.7→10.2 is 1 the first way, 0 the second)."""
    import math

    pdf = _fixture_transcripts_pdf()

    def _floor_s(ts) -> int:
        return math.floor(ts.timestamp())

    agg: dict[str, list[int]] = {}
    for conv_id, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        prev_ts = None
        for r in g.itertuples():
            if prev_ts is not None:
                gap = _floor_s(r.ts) - _floor_s(prev_ts)
                agg.setdefault(str(r.role), []).append(gap)
            prev_ts = r.ts
    rows = [
        (role, len(gaps), sum(gaps), max(gaps))
        for role, gaps in sorted(agg.items())
    ]
    return values_sql(
        rows,
        [
            ("role", "VARCHAR"),
            ("n_gaps", "BIGINT"),
            ("sum_gap_s", "BIGINT"),
            ("max_gap_s", "BIGINT"),
        ],
    )


@_register("tr_role_balance")
def _tr_role_balance_values() -> str:
    """Twin of role_balance: per-conversation role counts by plain
    tallying."""
    pdf = _fixture_transcripts_pdf()
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        roles = [str(r) for r in grp["role"]]
        rows.append(
            (
                str(conv_id),
                len(roles),
                sum(1 for r in roles if r == "user"),
                sum(1 for r in roles if r == "assistant"),
                sum(1 for r in roles if r == "tool"),
            )
        )
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("n_turns", "BIGINT"),
            ("n_user", "BIGINT"),
            ("n_assistant", "BIGINT"),
            ("n_tool", "BIGINT"),
        ],
    )


# ----------------------------------------------------- semantic dedup
@_register("dedup_semantic_keep")
def _semantic_keep_values() -> str:
    """Twin of dedup_semantic_keep: same driver-side centroids (an INPUT
    to the distributed op), float64-argmax assignment mirroring
    ivf_assign, crc32 sub-sharding, then the SHARED greedy kernel
    (_semantic_keep_mask IS the specification — identical matvec shapes
    on both sides make the float64 keep decisions bit-equal). The
    bucket membership itself is re-derived with plain dict grouping,
    never the distributed join."""
    import zlib as _z

    from cdrc_semantic_search_spark.operators.dedup import _semantic_keep_mask
    from cdrc_semantic_search_spark.operators.similarity import (
        _unit_rows,
        train_centroids,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    cent = train_centroids(sample, n_centroids=16, seed=42)

    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    assign = (corpus.astype(np.float64) @ cent.astype(np.float64).T).argmax(axis=1)
    cap = 4096
    members: dict[tuple[int, int], list[int]] = {}
    csize: dict[int, int] = {}
    for b in assign:
        csize[int(b)] = csize.get(int(b), 0) + 1
    for idx, b in enumerate(assign):
        n_shards = -(-csize[int(b)] // cap)
        shard = _z.crc32(str(ids[idx]).encode()) % n_shards
        members.setdefault((int(b), shard), []).append(idx)
    rows = []
    for (b, _shard), idxs in members.items():
        idxs.sort(key=lambda i: ids[i])
        u = _unit_rows(
            np.stack([vecs[i] for i in idxs]).astype(np.float32)
        ).astype(np.float64)
        keep = _semantic_keep_mask(u, 0.35)
        rows.extend((ids[i], b, bool(k)) for i, k in zip(idxs, keep))
    return values_sql(
        sorted(rows),
        [("id", "BIGINT"), ("cluster", "INTEGER"), ("kept", "BOOLEAN")],
    )


def _fixture_surface_clusters() -> tuple[dict, dict, dict]:
    """Shared canonicalization derivation for the kg_canon_quality and
    kg_cluster_representatives twins: re-derives the surface clusters
    OUTSIDE Spark from the shared specification kernels — extract_turn/
    _link for the distinct (surface → min gold entity) universe (the
    same chain _kg_nodes_values pins), encode_texts for vectors,
    lsh_planes/lsh_bucket_matrix + bucket intersection for candidates,
    the exact left-fold cosine for the ≥ τ re-check, and union-find with
    min-string canonical for components (connected_components'
    specification). Returns (gold entity per surface, mention-occurrence
    counts per surface, cluster label per surface)."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import encode_texts, normalize_surface
    from cdrc_semantic_search_spark.operators.extraction_core import (
        AliasMatcher,
        extract_turn,
    )
    from cdrc_semantic_search_spark.operators.linking import build_entity_index
    from cdrc_semantic_search_spark.operators.similarity import (
        lsh_bucket_matrix,
        lsh_planes,
    )
    from cdrc_semantic_search_spark.oracle import _link
    from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    settings = Settings()
    matcher = AliasMatcher(
        [
            (r.entity_id, [r.canonical_name, *list(r.aliases)])
            for r in fx.entities.itertuples()
        ]
    )
    index = build_entity_index(fx.entities, settings)
    link_cache: dict[str, str | None] = {}
    golds: dict[str, set] = {}
    counts: dict[str, int] = {}
    for r in fx.transcripts.itertuples():
        mentions, _ = extract_turn(r.text or "", matcher)
        for m in mentions:
            if m.surface not in link_cache:
                link_cache[m.surface] = _link(m.surface, index, settings)[0]
            eid = link_cache[m.surface]
            s = normalize_surface(m.surface)
            counts[s] = counts.get(s, 0) + 1
            bucket = golds.setdefault(s, set())
            if eid is not None:
                bucket.add(eid)
    # surface_forms: min(entity_id) skips NULLs; all-null surfaces -> None
    gold = {s: (min(v) if v else None) for s, v in golds.items()}

    surfaces = sorted(gold)
    enc, ps = settings.encoder, settings.pipeline
    mat = encode_texts(surfaces, dim=enc.embed_dim, seed=enc.seed, ngram=enc.ngram)
    planes = lsh_planes(enc.embed_dim, ps.canon_n_planes, enc.seed)
    buckets_m = lsh_bucket_matrix(mat, planes, ps.canon_n_bands)
    buckets: dict[tuple, list[str]] = {}
    for s, brow in zip(surfaces, buckets_m):
        for band, bucket_id in enumerate(brow):
            buckets.setdefault((band, int(bucket_id)), []).append(s)
    vec = dict(zip(surfaces, mat))

    parent: dict[str, str] = {s: s for s in surfaces}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _pairs_from_buckets(buckets):
        if _fold_cosine(vec[a], vec[b]) >= KGPipeline.CANON_THRESHOLD:
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min keeps the root the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

    return gold, counts, {s: find(s) for s in surfaces}


@_register("kg_canon_quality")
def _kg_canon_quality_values() -> str:
    """Twin of kg_canon_quality over the shared
    :func:`_fixture_surface_clusters` derivation. Pair counts are exact
    integers; precision/recall are one IEEE division,
    Spark-ROUND-half-up to 6."""
    gold, _counts, label_of = _fixture_surface_clusters()
    surfaces = sorted(gold)

    def find(s: str) -> str:
        return label_of[s]

    cg: dict[tuple[str, str], int] = {}
    for s in surfaces:
        if gold[s] is None:
            continue
        key = (find(s), gold[s])
        cg[key] = cg.get(key, 0) + 1
    n_items = sum(cg.values())
    tp = sum(n * (n - 1) // 2 for n in cg.values())
    pred_sizes: dict[str, int] = {}
    gold_sizes: dict[str, int] = {}
    for (c, g), n in cg.items():
        pred_sizes[c] = pred_sizes.get(c, 0) + n
        gold_sizes[g] = gold_sizes.get(g, 0) + n
    pred = sum(n * (n - 1) // 2 for n in pred_sizes.values())
    gold_pairs = sum(n * (n - 1) // 2 for n in gold_sizes.values())
    row = (
        n_items,
        tp,
        pred,
        gold_pairs,
        _round_half_up(tp / pred, 6) if pred else None,
        _round_half_up(tp / gold_pairs, 6) if gold_pairs else None,
    )
    return values_sql(
        [row],
        [
            ("n_items", "BIGINT"),
            ("tp_pairs", "BIGINT"),
            ("pred_pairs", "BIGINT"),
            ("gold_pairs", "BIGINT"),
            ("precision", "DOUBLE"),
            ("recall", "DOUBLE"),
        ],
    )


@_register("kg_type_constraints")
def _kg_type_constraints_values() -> str:
    """Twin of kg_type_constraints: distinct (subj, pred, obj) edges from
    the pure-Python triple twin, typed through the entity dim, counted
    per (pred, subj_type, obj_type), and flagged by the SAME
    DEFAULT_EDGE_SCHEMA wildcard logic — shared constant, independent
    evaluation."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.plans.kg_pipeline import DEFAULT_EDGE_SCHEMA

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    pdf = _fixture_triples()
    types = dict(zip(fx.entities.entity_id, fx.entities.entity_type))
    edges = {
        (r.subj_entity_id, r.pred, r.obj_entity_id)
        for r in pdf.itertuples(index=False)
    }
    counts: dict[tuple[str, str, str], int] = {}
    for s, p, o in edges:
        key = (p, types[s], types[o])
        counts[key] = counts.get(key, 0) + 1

    def _allowed(pred: str, st: str, ot: str) -> bool:
        return any(
            sp == pred
            and ss in ("*", st)
            and so in ("*", ot)
            for sp, ss, so in DEFAULT_EDGE_SCHEMA
        )

    rows = [
        (p, st, ot, n, _allowed(p, st, ot))
        for (p, st, ot), n in sorted(counts.items())
    ]
    return values_sql(
        rows,
        [
            ("pred", "VARCHAR"),
            ("subj_type", "VARCHAR"),
            ("obj_type", "VARCHAR"),
            ("n_edges", "BIGINT"),
            ("valid", "BOOLEAN"),
        ],
    )


@_register("tr_qa_pairs")
def _tr_qa_pairs_values() -> str:
    """Twin of qa_pair_mining: per conversation in turn order, a user
    turn containing '?' whose next turn is an assistant turn; character
    lengths — all integers."""
    pdf = _fixture_transcripts_pdf()
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        g = list(grp.sort_values("turn_idx").itertuples())
        for cur, nxt in zip(g, g[1:]):
            if (
                cur.role == "user"
                and "?" in (cur.text or "")
                and nxt.role == "assistant"
            ):
                rows.append(
                    (
                        str(conv_id),
                        int(cur.turn_idx),
                        int(nxt.turn_idx),
                        len(cur.text or ""),
                        len(nxt.text or ""),
                    )
                )
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("q_turn_idx", "INTEGER"),
            ("a_turn_idx", "INTEGER"),
            ("q_len", "BIGINT"),
            ("a_len", "BIGINT"),
        ],
    )


@_register("tr_tool_retries")
def _tr_tool_retries_values() -> str:
    """Twin of tool_retry_runs: run-length encode each conversation's
    tool-call sequence (tool turns only, turn order), keep runs ≥ 2."""
    pdf = _fixture_transcripts_pdf()
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        g = [
            r
            for r in grp.sort_values("turn_idx").itertuples()
            if (r.tool or "") != ""
        ]
        i = 0
        while i < len(g):
            j = i
            while j + 1 < len(g) and g[j + 1].tool == g[i].tool:
                j += 1
            run_len = j - i + 1
            if run_len >= 2:
                rows.append(
                    (str(conv_id), str(g[i].tool), int(g[i].turn_idx), run_len)
                )
            i = j + 1
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("tool", "VARCHAR"),
            ("start_turn_idx", "INTEGER"),
            ("run_len", "BIGINT"),
        ],
    )


@_register("tr_topic_segments")
def _tr_topic_segments_values() -> str:
    """Twin of tr_topic_segments: encode_texts (bit-exact shared kernel)
    + the exact left-fold cosine between consecutive turns; boundary
    where cosine < 0.15 (nearest fixture pair sits 3e-4 from τ);
    running boundary count per conversation."""
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import encode_texts

    pdf = _fixture_transcripts_pdf()
    enc = Settings().encoder
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        texts = [t if isinstance(t, str) else "" for t in g.text.tolist()]
        vecs = encode_texts(
            texts, dim=enc.embed_dim, seed=enc.seed, ngram=enc.ngram
        )
        seg = 0
        for i, r in enumerate(g.itertuples()):
            if i == 0 or _fold_cosine(vecs[i - 1], vecs[i]) < 0.15:
                seg += 1
            rows.append((str(conv_id), int(r.turn_idx), seg))
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("turn_idx", "INTEGER"),
            ("segment_id", "BIGINT"),
        ],
    )


@_register("tr_salient_turns")
def _tr_salient_turns_values() -> str:
    """Twin of tr_salient_turns: per conversation, the exact decimal
    centroid — CAST(float AS DECIMAL(38,18)) mirrors Spark's
    BigDecimal.valueOf (shortest-repr, HALF_UP), exact Decimal sum,
    ROUND(·,8) → double → /n → ROUND(·,6) — then the exact double left
    fold against each turn vector and a (score DESC, turn_idx ASC)
    row_number. Verified bit-equal to the Spark scores on all 1147
    fixture turns before wiring."""
    from decimal import ROUND_HALF_UP, Decimal

    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import encode_texts

    pdf = _fixture_transcripts_pdf()
    enc = Settings().encoder
    q18 = Decimal(1).scaleb(-18)
    q8 = Decimal(1).scaleb(-8)
    top_k = 3
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx")
        texts = [t if isinstance(t, str) else "" for t in g.text.tolist()]
        vecs = encode_texts(
            texts, dim=enc.embed_dim, seed=enc.seed, ngram=enc.ngram
        )
        n = len(vecs)
        cent = []
        for d in range(enc.embed_dim):
            s = sum(
                (
                    Decimal(repr(float(vecs[i][d]))).quantize(q18, ROUND_HALF_UP)
                    for i in range(n)
                ),
                Decimal(0),
            )
            m = float(s.quantize(q8, ROUND_HALF_UP)) / n
            cent.append(_round_half_up(m, 6))
        scored = [
            (_fold_cosine(vecs[i], cent), int(r.turn_idx))
            for i, r in enumerate(g.itertuples())
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (_, turn_idx) in enumerate(scored[:top_k], start=1):
            rows.append((str(conv_id), turn_idx, rank))
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("turn_idx", "INTEGER"),
            ("rank", "BIGINT"),
        ],
    )


def _walk_adjacency() -> tuple[dict, dict]:
    """(sorted-capped neighbor lists, raw neighbor sets) of the sf0.01
    supplier↔bucket walk graph (l_orderkey < 200), re-derived
    independently of Spark — shared by all three walk twins."""
    t = _read("lineitem", ["l_orderkey", "l_suppkey", "l_partkey"])
    ok = t.column("l_orderkey").to_pylist()
    sk = t.column("l_suppkey").to_pylist()
    pk = t.column("l_partkey").to_pylist()
    und: set[tuple[int, int]] = set()
    for o, s, p in zip(ok, sk, pk):
        if o < 200:
            d = 1000 + p % 100
            a, b = (s, d) if s <= d else (d, s)
            if a != b:
                und.add((int(a), int(b)))
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return {v: sorted(ns)[:10_000] for v, ns in adj.items()}, adj


def _random_walk_rows() -> list[tuple]:
    """Shared walk simulation for the graph_random_walks and
    graph_walk_pairs twins over :func:`_walk_adjacency`: the exact
    hash-routed walk — zlib.crc32(f"{seed}|{walk_id}|{step}|{cur}") %
    deg over the sorted array, the same bytes Spark's
    F.crc32(concat_ws(...)) hashes (java.util.zip.CRC32 shares the zlib
    polynomial; pinned by test_crc32_matches_spark)."""
    nbrs, _adj = _walk_adjacency()
    seed, walk_length, n_walks = 42, 4, 2
    rows: list[tuple] = []
    for v in nbrs:
        for w in range(n_walks):
            wid = f"{v}:{w}"
            cur = v
            rows.append((wid, 0, cur))
            for step in range(1, walk_length + 1):
                ns = nbrs[cur]
                idx = zlib.crc32(f"{seed}|{wid}|{step}|{cur}".encode()) % len(ns)
                cur = ns[idx]
                rows.append((wid, step, cur))
    return rows


@_register("graph_random_walks")
def _graph_random_walks_values() -> str:
    """VALUES rendering of the shared walk simulation (_random_walk_rows)."""
    return values_sql(
        sorted(_random_walk_rows()),
        [
            ("walk_id", "VARCHAR"),
            ("step", "INTEGER"),
            ("node", "BIGINT"),
        ],
    )


@_register("graph_walk_pairs")
def _graph_walk_pairs_values() -> str:
    """Twin of graph_walk_pairs: skip-gram positives counted with a plain
    dict over the shared walk simulation — ordered within-walk
    co-occurrences at step distance 1..window (window=2)."""
    window = 2
    walks: dict[str, dict[int, int]] = {}
    for wid, step, node in _random_walk_rows():
        walks.setdefault(wid, {})[step] = node
    counts: dict[tuple[int, int], int] = {}
    for path in walks.values():
        steps = sorted(path)
        for i, s1 in enumerate(steps):
            for s2 in steps[i + 1 :]:
                if s2 - s1 > window:
                    break
                key = (path[s1], path[s2])
                counts[key] = counts.get(key, 0) + 1
    rows = [(c, x, n) for (c, x), n in counts.items()]
    return values_sql(
        sorted(rows),
        [
            ("center", "BIGINT"),
            ("context", "BIGINT"),
            ("n_pairs", "BIGINT"),
        ],
    )


def _fixture_collective_rows() -> list[tuple]:
    """Shared derivation for the collective-linking twins: single-process
    mention extraction (extract_turn — the specification kernel), one
    _topk_blend batch over ALL distinct normalized surfaces (k=3; scores
    rounded half-up to 4, absorbing ~1e-7 BLAS batch-composition noise),
    then the identical double arithmetic:
    final = score + 0.25·(support−1)/max(n−1, 1), argmax by
    (−final, entity_id). Support counts and the per-conv mention totals
    are re-derived with plain dicts, never Spark. Returns (conv_id,
    turn_idx, mention_idx, surface, entity_id, support, final_score)."""
    from cdrc_semantic_search_spark import fixtures
    from cdrc_semantic_search_spark.config import Settings
    from cdrc_semantic_search_spark.encoder import normalize_surface
    from cdrc_semantic_search_spark.operators.extraction_core import (
        AliasMatcher,
        extract_turn,
    )
    from cdrc_semantic_search_spark.operators.linking import (
        _topk_blend,
        build_entity_index,
    )

    fx = fixtures.generate(seed=42, n_conversations=40, n_entities=100)
    settings = Settings()
    matcher = AliasMatcher(
        [
            (r.entity_id, [r.canonical_name, *list(r.aliases)])
            for r in fx.entities.itertuples()
        ]
    )
    index = build_entity_index(fx.entities, settings)
    k, beta = 3, 0.25
    # mentions: (conv_id, turn_idx, mention_idx, norm_surface)
    ments: list[tuple] = []
    for r in fx.transcripts.itertuples():
        found, _ = extract_turn(r.text or "", matcher)
        for mi, m in enumerate(found):
            ments.append(
                (str(r.conv_id), int(r.turn_idx), mi, normalize_surface(m.surface))
            )
    surfaces = sorted({m[3] for m in ments})
    ranked = _topk_blend(
        index,
        surfaces,
        k=k,
        alpha=settings.retrieval.alpha,
        mode=settings.retrieval.query_mode,
    )
    cands = {
        s: [(eid, _round_half_up(score, 4)) for eid, score in r]
        for s, r in zip(surfaces, ranked)
    }
    n_ment: dict[str, int] = {}
    support: dict[tuple[str, str], int] = {}
    for conv_id, _ti, _mi, surf in ments:
        n_ment[conv_id] = n_ment.get(conv_id, 0) + 1
        for eid, _s in cands[surf]:
            support[(conv_id, eid)] = support.get((conv_id, eid), 0) + 1
    rows = []
    for conv_id, ti, mi, surf in ments:
        if not cands[surf]:
            continue
        denom = float(max(n_ment[conv_id] - 1, 1))
        best = min(
            (
                (
                    -(s + beta * ((support[(conv_id, eid)] - 1) / denom)),
                    eid,
                    support[(conv_id, eid)],
                )
                for eid, s in cands[surf]
            )
        )
        rows.append(
            (conv_id, ti, mi, surf, best[1], best[2], _round_half_up(-best[0], 6))
        )
    return rows


@_register("kg_collective_linking")
def _kg_collective_linking_values() -> str:
    """Twin of kg_collective_linking — see _fixture_collective_rows."""
    return values_sql(
        sorted(_fixture_collective_rows()),
        [
            ("conv_id", "VARCHAR"),
            ("turn_idx", "INTEGER"),
            ("mention_idx", "INTEGER"),
            ("surface", "VARCHAR"),
            ("entity_id", "VARCHAR"),
            ("support", "BIGINT"),
            ("final_score", "DOUBLE"),
        ],
    )


@_register("sketch_count_min")
def _sketch_count_min_values() -> str:
    """Twin of sketch_count_min: exact key counts + every CMS counter
    re-derived with plain dicts and zlib.crc32 (== Spark F.crc32,
    pinned); est = min over the 4 hash rows, floor 0 for absent
    counters."""
    t = _read("events", ["event_type", "user_id"])
    ets = t.column("event_type").to_pylist()
    uids = t.column("user_id").to_pylist()
    seed, depth, width = 42, 4, 64
    counts: dict[str, int] = {}
    counters: dict[tuple[int, int], int] = {}
    for et, uid in zip(ets, uids):
        key = f"{et}|{uid}"
        counts[key] = counts.get(key, 0) + 1
        for i in range(depth):
            c = zlib.crc32(f"{seed}|{i}|{key}".encode()) % width
            counters[(i, c)] = counters.get((i, c), 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = []
    for key, exact in top:
        est = min(
            counters.get(
                (i, zlib.crc32(f"{seed}|{i}|{key}".encode()) % width), 0
            )
            for i in range(depth)
        )
        rows.append((key, exact, est))
    return values_sql(
        sorted(rows),
        [
            ("key", "VARCHAR"),
            ("exact_cnt", "BIGINT"),
            ("cms_est", "BIGINT"),
        ],
    )


@_register("graph_node2vec_walks")
def _graph_node2vec_walks_values() -> str:
    """Twin of graph_node2vec_walks (p=2, q=3, 1 walk/vertex, length 4):
    integer node2vec weights (return = q, common = p·q, far = p) over
    the shared adjacency, r = crc32(seed|walk|step|cur|prev) mod
    Σweights, first sorted neighbor whose cumulative weight exceeds r;
    step 1 omits prev from the hashed bytes exactly as concat_ws skips
    the NULL column."""
    nbrs, adj = _walk_adjacency()
    seed, walk_length, n_walks, p, q = 42, 4, 1, 2, 3
    rows: list[tuple] = []
    for v in nbrs:
        for w in range(n_walks):
            wid = f"{v}:{w}"
            cur, prev = v, None
            rows.append((wid, 0, cur))
            for step in range(1, walk_length + 1):
                ns = nbrs[cur]
                wts = [
                    q
                    if (prev is not None and x == prev)
                    else (
                        p * q
                        if (prev is not None and x in adj.get(prev, ()))
                        else p
                    )
                    for x in ns
                ]
                hs = f"{seed}|{wid}|{step}|{cur}" + (
                    f"|{prev}" if prev is not None else ""
                )
                r = zlib.crc32(hs.encode()) % sum(wts)
                cum = 0
                for i, wt in enumerate(wts):
                    cum += wt
                    if cum > r:
                        sel = i
                        break
                prev, cur = cur, ns[sel]
                rows.append((wid, step, cur))
    return values_sql(
        sorted(rows),
        [
            ("walk_id", "VARCHAR"),
            ("step", "INTEGER"),
            ("node", "BIGINT"),
        ],
    )


@_register("kg_entity_communities")
def _kg_entity_communities_values() -> str:
    """Twin of kg_entity_communities: the fixture triples rolled up to
    undirected entity edges, then 4 rounds of synchronous LPA re-derived
    with plain dicts — self-vote included, ties to the lexicographically
    smallest label (Python str < == Spark string ordering for these
    ASCII entity ids)."""
    pdf = _fixture_triples()
    und: set[tuple[str, str]] = set()
    for r in pdf.itertuples(index=False):
        a, b = sorted((r.subj_entity_id, r.obj_entity_id))
        if a != b:
            und.add((a, b))
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v, ns in adj.items():
            votes: dict[str, int] = {labels[v]: 1}
            for n in ns:
                votes[labels[n]] = votes.get(labels[n], 0) + 1
            nxt[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    rows = sorted(labels.items())
    return values_sql(
        rows,
        [
            ("entity_id", "VARCHAR"),
            ("community", "VARCHAR"),
        ],
    )


@_register("kg_entity_communities_weighted")
def _kg_entity_communities_weighted_values() -> str:
    """Twin of kg_entity_communities_weighted: votes weighted by triple
    multiplicity per unordered entity pair (summed across predicates and
    directions — exactly what the (least, greatest) groupBy-sum in
    label_propagation computes from the kg_edges projection),
    self-vote weight 1."""
    pdf = _fixture_triples()
    wts: dict[tuple[str, str], int] = {}
    for r in pdf.itertuples(index=False):
        a, b = sorted((r.subj_entity_id, r.obj_entity_id))
        if a != b:
            wts[(a, b)] = wts.get((a, b), 0) + 1
    adj: dict[str, dict[str, int]] = {}
    for (a, b), w in wts.items():
        adj.setdefault(a, {})[b] = w
        adj.setdefault(b, {})[a] = w
    labels = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v, ns in adj.items():
            votes: dict[str, int] = {labels[v]: 1}
            for n, w in ns.items():
                votes[labels[n]] = votes.get(labels[n], 0) + w
            nxt[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    return values_sql(
        sorted(labels.items()),
        [
            ("entity_id", "VARCHAR"),
            ("community", "VARCHAR"),
        ],
    )


@_register("tr_qa_overlap")
def _tr_qa_overlap_values() -> str:
    """Twin of tr_qa_overlap: the qa-pair mining rule + token-SET
    Jaccard via the shared _tokens kernel (== Catalyst tokens, pinned
    by test_tokens_twin_matches_catalyst); n_union 0 → 0.0."""
    pdf = _fixture_transcripts_pdf()
    rows = []
    for conv_id, grp in pdf.groupby("conv_id"):
        g = grp.sort_values("turn_idx").reset_index(drop=True)
        for i in range(len(g) - 1):
            q, a = g.iloc[i], g.iloc[i + 1]
            if (
                q.role == "user"
                and isinstance(q.text, str)
                and "?" in q.text
                and a.role == "assistant"
            ):
                tq = set(_tokens(q.text))
                ta = set(_tokens(a.text))
                common = len(tq & ta)
                union = len(tq | ta)
                jac = 0.0 if union == 0 else common / union
                rows.append(
                    (
                        str(conv_id),
                        int(q.turn_idx),
                        int(a.turn_idx),
                        common,
                        union,
                        jac,
                    )
                )
    return values_sql(
        sorted(rows),
        [
            ("conv_id", "VARCHAR"),
            ("q_turn_idx", "INTEGER"),
            ("a_turn_idx", "INTEGER"),
            ("n_common", "BIGINT"),
            ("n_union", "BIGINT"),
            ("jaccard", "DOUBLE"),
        ],
    )


@_register("kg_graph_diff")
def _kg_graph_diff_values() -> str:
    """Twin of kg_graph_diff: fixture triples split at 2026-05-01 into
    two observation windows, per-window edge rollups diffed with plain
    dicts — added/removed/changed/stable per (subj, pred, obj)."""
    import pandas as pd

    pdf = _fixture_triples_with_ts()
    split = pd.Timestamp("2026-05-01")
    key_cols = ["subj_entity_id", "pred", "obj_entity_id"]

    def rollup(frame):
        out: dict[tuple, int] = {}
        for r in frame.itertuples(index=False):
            k = (r.subj_entity_id, r.pred, r.obj_entity_id)
            out[k] = out.get(k, 0) + 1
        return out

    old = rollup(pdf[pdf.ts < split])
    new = rollup(pdf[pdf.ts >= split])
    rows = []
    for k in set(old) | set(new):
        wo, wn = old.get(k), new.get(k)
        status = (
            "added"
            if wo is None
            else "removed"
            if wn is None
            else "changed"
            if wo != wn
            else "stable"
        )
        rows.append((*k, wo or 0, wn or 0, status))
    return values_sql(
        sorted(rows),
        [
            ("subj_entity_id", "VARCHAR"),
            ("pred", "VARCHAR"),
            ("obj_entity_id", "VARCHAR"),
            ("w_old", "BIGINT"),
            ("w_new", "BIGINT"),
            ("status", "VARCHAR"),
        ],
    )


@_register("kg_cluster_representatives")
def _kg_cluster_representatives_values() -> str:
    """Twin of kg_cluster_representatives over the shared
    _fixture_surface_clusters derivation: per cluster label, the member
    with the most mention occurrences (ties → min surface), member and
    occurrence totals — all integers plus string argmax."""
    _gold, counts, label_of = _fixture_surface_clusters()
    clusters: dict[str, list[str]] = {}
    for s, lab in label_of.items():
        clusters.setdefault(lab, []).append(s)
    rows = []
    for lab, members in clusters.items():
        rep = min(members, key=lambda s: (-counts[s], s))
        rows.append(
            (
                lab,
                rep,
                counts[rep],
                len(members),
                sum(counts[s] for s in members),
            )
        )
    return values_sql(
        sorted(rows),
        [
            ("canonical_surface", "VARCHAR"),
            ("representative", "VARCHAR"),
            ("rep_mentions", "BIGINT"),
            ("n_members", "BIGINT"),
            ("total_mentions", "BIGINT"),
        ],
    )


# ------------------------------------------------------ KG schema induction
def _fixture_edge_set() -> set[tuple[str, str, str]]:
    """Distinct typed (s, p, o) edge set from the fixture triples — the
    shared base of the three rule-mining twins (operators/rules.py
    works on the same distinct projection of kg_edges)."""
    pdf = _fixture_triples()
    return {
        (r.subj_entity_id, r.pred, r.obj_entity_id)
        for r in pdf.itertuples(index=False)
    }


@_register("kg_rule_confidence")
def _kg_rule_confidence_values() -> str:
    """AMIE-composition-rule twin: body endpoint pairs per (p1, p2) via
    plain dict adjacency, support via set membership, standard
    confidence = support / body — integers plus one rounded division."""
    edges = _fixture_edge_set()
    out_adj: dict[str, list[tuple[str, str]]] = {}
    for s, p, o in edges:
        out_adj.setdefault(s, []).append((p, o))
    body: dict[tuple[str, str], set] = {}
    for a, p1, x in edges:
        for p2, c in out_adj.get(x, []):
            if a == c:
                continue
            body.setdefault((p1, p2), set()).add((a, c))
    heads: dict[tuple[str, str], set] = {}
    for s, p, o in edges:
        heads.setdefault((s, o), set()).add(p)
    rows = []
    for (p1, p2), pairs in body.items():
        sup: dict[str, int] = {}
        for pair in pairs:
            for p3 in heads.get(pair, ()):  # noqa: B020
                sup[p3] = sup.get(p3, 0) + 1
        for p3, s_n in sup.items():
            rows.append(
                (p1, p2, p3, s_n, len(pairs), _round_half_up(s_n / len(pairs), 6))
            )
    return values_sql(
        sorted(rows),
        [
            ("p1", "VARCHAR"),
            ("p2", "VARCHAR"),
            ("p3", "VARCHAR"),
            ("support", "BIGINT"),
            ("body_pairs", "BIGINT"),
            ("confidence", "DOUBLE"),
        ],
    )


@_register("kg_pred_functionality")
def _kg_pred_functionality_values() -> str:
    """Functionality-profile twin: per predicate, distinct fact/subject/
    object counts and the two ratios — set sizes plus rounded
    divisions."""
    edges = _fixture_edge_set()
    per: dict[str, tuple[set, set, set]] = {}
    for s, p, o in edges:
        facts, subs, objs = per.setdefault(p, (set(), set(), set()))
        facts.add((s, o))
        subs.add(s)
        objs.add(o)
    rows = [
        (
            p,
            len(facts),
            len(subs),
            len(objs),
            _round_half_up(len(subs) / len(facts), 6),
            _round_half_up(len(objs) / len(facts), 6),
        )
        for p, (facts, subs, objs) in per.items()
    ]
    return values_sql(
        sorted(rows),
        [
            ("pred", "VARCHAR"),
            ("n_facts", "BIGINT"),
            ("n_subjects", "BIGINT"),
            ("n_objects", "BIGINT"),
            ("functionality", "DOUBLE"),
            ("inv_functionality", "DOUBLE"),
        ],
    )


@_register("kg_inverse_relations")
def _kg_inverse_relations_values() -> str:
    """Inverse-candidate twin: overlap = #{(a,b): p1(a,b) ∧ p2(b,a)}
    restricted to p1 ≤ p2, inclusion–exclusion jaccard over the
    per-predicate fact counts."""
    edges = _fixture_edge_set()
    by_pair: dict[tuple[str, str], set] = {}
    counts: dict[str, int] = {}
    for s, p, o in edges:
        by_pair.setdefault((s, o), set()).add(p)
        counts[p] = counts.get(p, 0) + 1
    overlap: dict[tuple[str, str], int] = {}
    for (s, o), preds in by_pair.items():
        for p2 in by_pair.get((o, s), ()):  # noqa: B020
            for p1 in preds:
                if p1 <= p2:
                    overlap[(p1, p2)] = overlap.get((p1, p2), 0) + 1
    rows = [
        (
            p1,
            p2,
            n,
            counts[p1],
            counts[p2],
            _round_half_up(n / (counts[p1] + counts[p2] - n), 6),
        )
        for (p1, p2), n in overlap.items()
    ]
    return values_sql(
        sorted(rows),
        [
            ("p1", "VARCHAR"),
            ("p2", "VARCHAR"),
            ("overlap", "BIGINT"),
            ("n1", "BIGINT"),
            ("n2", "BIGINT"),
            ("jaccard", "DOUBLE"),
        ],
    )


@_register("kg_rule_pca_confidence")
def _kg_rule_pca_confidence_values() -> str:
    """PCA-confidence twin: same body/support derivation as the standard
    twin, but the denominator counts only body pairs whose SUBJECT has
    some p3 edge (the partial-completeness assumption)."""
    edges = _fixture_edge_set()
    out_adj: dict[str, list[tuple[str, str]]] = {}
    subj_preds: dict[str, set] = {}
    for s, p, o in edges:
        out_adj.setdefault(s, []).append((p, o))
        subj_preds.setdefault(s, set()).add(p)
    body: dict[tuple[str, str], set] = {}
    for a, p1, x in edges:
        for p2, c in out_adj.get(x, []):
            if a == c:
                continue
            body.setdefault((p1, p2), set()).add((a, c))
    heads: dict[tuple[str, str], set] = {}
    for s, p, o in edges:
        heads.setdefault((s, o), set()).add(p)
    rows = []
    for (p1, p2), pairs in body.items():
        sup: dict[str, int] = {}
        pca: dict[str, int] = {}
        for a, c in pairs:
            for p3 in heads.get((a, c), ()):
                sup[p3] = sup.get(p3, 0) + 1
            for p3 in subj_preds.get(a, ()):
                pca[p3] = pca.get(p3, 0) + 1
        for p3, s_n in sup.items():
            rows.append(
                (p1, p2, p3, s_n, pca[p3], _round_half_up(s_n / pca[p3], 6))
            )
    return values_sql(
        sorted(rows),
        [
            ("p1", "VARCHAR"),
            ("p2", "VARCHAR"),
            ("p3", "VARCHAR"),
            ("support", "BIGINT"),
            ("pca_body", "BIGINT"),
            ("pca_confidence", "DOUBLE"),
        ],
    )


def _supplier_bucket_adj() -> dict[int, set[int]]:
    """Shared graph-twin loader: the supplier↔bucket fixture graph
    (l_orderkey < 300) as an undirected adjacency dict — the hyperball /
    WL / neighborhood-function twins all read the same edges."""
    import duckdb

    con = duckdb.connect()
    rows_e = con.sql(
        f"""
        SELECT DISTINCT l_suppkey AS a, 1000 + l_partkey % 100 AS b
        FROM '{ORACLE_SF_DIR}/lineitem.parquet' WHERE l_orderkey < 300
        """
    ).fetchall()
    con.close()
    adj: dict[int, set[int]] = {}
    for a, b in rows_e:
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


_HLL_M, _HLL_ALPHA = 64, 0.709


def _hll_reg_of(u: int) -> tuple[int, int]:
    """Engine register derivation twin: crc32 bucket, crc32 rho via
    33 − bit_length (the integer leading-zero rank)."""
    h1 = zlib.crc32(str(u).encode())
    h2 = zlib.crc32((str(u) + "|rho").encode())
    return h1 % _HLL_M, (33 if h2 == 0 else 33 - h2.bit_length())


def _hll_est_of(ball: set) -> float:
    """Engine HLL estimator twin (α=0.709, m=64, linear-counting
    correction) — shared by the hyperball and neighborhood twins."""
    import math

    m = _HLL_M
    regs = [0] * m
    for u in ball:
        j, rho = _hll_reg_of(u)
        regs[j] = max(regs[j], rho)
    denom = sum(2.0 ** -r for r in regs)
    zeros = float(sum(1 for r in regs if r == 0))
    raw = _HLL_ALPHA * m * m / denom
    return m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw


@_register("graph_hyperball")
def _graph_hyperball_values() -> str:
    """HyperBall twin: exact k-hop balls by BFS over the fixture graph,
    then the IDENTICAL register derivation (crc32 bucket, crc32 rho via
    33 − bit_length) and HLL estimator (α=0.709, m=64, linear-counting
    correction) in plain Python floats — Σ2^−rho over ≤64 power-of-two
    terms is exact in a double in any order, so twin and engine agree
    bit-for-bit before the shared round-6."""
    adj = _supplier_bucket_adj()
    k = 2
    out = []
    for v in adj:
        ball = {v}
        frontier = {v}
        for _ in range(k):
            frontier = {u for f in frontier for u in adj.get(f, ())}
            ball |= frontier
        out.append((v, _round_half_up(_hll_est_of(ball), 6)))
    return values_sql(
        sorted(out), [("id", "BIGINT"), ("ball_est", "DOUBLE")]
    )


@_register("kg_linking_ambiguity")
def _kg_linking_ambiguity_values() -> str:
    """Ambiguity-profile twin: rolls the shared collective-linking rows
    up per surface — mention/conversation counts, distinct FINAL
    entities (how often conversation coherence sent the same surface to
    different entities), and the modal entity (ties → min id)."""
    rows = _fixture_collective_rows()
    per: dict[str, dict] = {}
    for conv_id, _ti, _mi, surf, eid, _sup, _fs in rows:
        d = per.setdefault(surf, {"n": 0, "convs": set(), "ents": {}})
        d["n"] += 1
        d["convs"].add(conv_id)
        d["ents"][eid] = d["ents"].get(eid, 0) + 1
    out = []
    for surf, d in per.items():
        top = min((-c, e) for e, c in d["ents"].items())
        out.append(
            (surf, d["n"], len(d["convs"]), len(d["ents"]), top[1], -top[0])
        )
    return values_sql(
        sorted(out),
        [
            ("surface", "VARCHAR"),
            ("n_mentions", "BIGINT"),
            ("n_convs", "BIGINT"),
            ("n_entities", "BIGINT"),
            ("top_entity", "VARCHAR"),
            ("top_count", "BIGINT"),
        ],
    )


@_register("dedup_blocking_quality")
def _dedup_blocking_quality_values() -> str:
    """Blocking-evaluation twin: exact all-pairs distinct-shingle
    Jaccard (tokens/word_shingles twins) for truth, the shared MinHash
    twin kernel's band-slice-equality pairs (NO estimate filter, no
    cap) for candidates, then the PC/RR arithmetic in plain ints."""
    docs = [
        (i, t) for i, t in _docs_with_shift(30, 10_000)
        if i < 200 or i >= 10_000
    ]
    # truth: exact Jaccard over DISTINCT k=3 shingles
    sets = {i: set(_word_shingles(t, 3)) for i, t in docs}
    ids = sorted(sets)
    truth = set()
    for xi, ia in enumerate(ids):
        for ib in ids[xi + 1:]:
            sa, sb = sets[ia], sets[ib]
            if not sa and not sb:
                continue
            u = len(sa | sb)
            if u and len(sa & sb) / u >= 0.5:
                truth.add((ia, ib))
    # candidates: the shared kernel's band-slice buckets, uncapped,
    # unfiltered
    _sigs, buckets = _minhash_sigs_buckets(docs)
    cand = _pairs_from_buckets(buckets, None)
    n = len(docs)
    allp = n * (n - 1) / 2.0
    n_hit = len(truth & set(cand))
    row = (
        n,
        len(truth),
        len(cand),
        n_hit,
        _round_half_up(n_hit / len(truth), 6),
        _round_half_up(1.0 - len(cand) / allp, 6),
    )
    return values_sql(
        [row],
        [
            ("n_docs", "BIGINT"),
            ("n_truth", "BIGINT"),
            ("n_cand", "BIGINT"),
            ("n_hit", "BIGINT"),
            ("pair_completeness", "DOUBLE"),
            ("reduction_ratio", "DOUBLE"),
        ],
    )


@_register("graph_wl_colors")
def _graph_wl_colors_values() -> str:
    """1-WL refinement twin: adjacency dicts, degree seed colors, two
    rounds of crc32("c|n1,n2,...") with numerically sorted neighbor
    multisets — the identical canonical rendering the engine hashes."""
    adj = _supplier_bucket_adj()
    colors = {v: len(ns) for v, ns in adj.items()}
    for _ in range(2):
        nxt = {}
        for v, ns in adj.items():
            ms = sorted(colors[u] for u in ns)
            s = f"{colors[v]}|{','.join(str(x) for x in ms)}"
            nxt[v] = zlib.crc32(s.encode())
        colors = nxt
    return values_sql(
        sorted(colors.items()),
        [("id", "BIGINT"), ("wl_color", "BIGINT")],
    )


@_register("graph_neighborhood_fn")
def _graph_neighborhood_fn_values() -> str:
    """Neighborhood-function twin: exact BFS balls per t, the shared
    HyperBall register/estimator arithmetic per vertex, half-up rounding
    to millionths, exact integer sum — bit-identical to the engine's
    dyadic rollup."""
    adj = _supplier_bucket_adj()
    max_t = 3
    est_of = _hll_est_of
    balls = {v: {v} for v in adj}
    frontiers = {v: {v} for v in adj}
    rows = []
    for t in range(0, max_t + 1):
        if t > 0:
            for v in adj:
                nf = {u for f in frontiers[v] for u in adj.get(f, ())}
                frontiers[v] = nf - balls[v]
                balls[v] |= nf
        tot = sum(int(_round_half_up(est_of(balls[v]) * 1e6, 0)) for v in adj)
        rows.append((t, tot, _round_half_up(tot / 1e6, 6)))
    return values_sql(
        rows,
        [("t", "INTEGER"), ("n_est_millionths", "BIGINT"), ("n_est", "DOUBLE")],
    )


@_register("tr_conv_near_dup")
def _tr_conv_near_dup_values() -> str:
    """Conversation-level near-dup twin: per-conversation ordered
    turn-concat ('\\n' separator, turn_idx order — the assembly-kernel
    contract pinned by a1b/W5), 20 cloned conversations appended, then
    the shared MinHash kernel's band-slice pairs at est ≥ 0.9."""
    from cdrc_semantic_search_spark import fixtures

    fx = fixtures.generate(seed=42, n_conversations=200, n_entities=100)
    pdf = fx.transcripts.sort_values(["conv_id", "turn_idx"])
    texts = {
        conv: "\n".join(g.text.fillna("").tolist())
        for conv, g in pdf.groupby("conv_id")
    }
    docs = [(c, t) for c, t in sorted(texts.items())]
    clones = [(f"dup_{c}", t) for c, t in docs[:20]]
    rows = _minhash_lsh_twin(docs + clones)
    return values_sql(
        sorted(rows),
        [("id_a", "VARCHAR"), ("id_b", "VARCHAR"), ("est_jaccard", "DOUBLE")],
    )


@_register("graph_linkpred_auc")
def _graph_linkpred_auc_values() -> str:
    """Link-prediction AUC twin: common-neighbor scores over the shared
    fixture adjacency for positives (the edges) and md5-corrupted
    negatives, then the exact integer rank-sum AUC (2·wins + ties in the
    numerator; one final division)."""
    import hashlib

    adj = _supplier_bucket_adj()
    edges = sorted(
        {(min(a, b), max(a, b)) for a, ns in adj.items() for b in ns}
    )
    eset = set(edges)
    nodes = sorted(adj)
    n = len(nodes)
    negs = []
    for a, b in edges:
        h = int(hashlib.md5(f"neg|{a}|{b}".encode()).hexdigest()[:8], 16)
        cand = nodes[h % n]
        if cand == a:
            continue
        pair = (min(a, cand), max(a, cand))
        if pair in eset:
            continue
        negs.append(pair)

    def cn(pair):
        a, b = pair
        return len(adj.get(a, set()) & adj.get(b, set()))

    pos_s = [cn(p) for p in edges]
    neg_s = [cn(p) for p in negs]
    from collections import Counter

    cp, cn_ = Counter(pos_s), Counter(neg_s)
    num_x2 = 0
    for s, np_ in cp.items():
        below = sum(v for s2, v in cn_.items() if s2 < s)
        num_x2 += 2 * np_ * below + np_ * cn_.get(s, 0)
    auc = _round_half_up(num_x2 / (2.0 * len(pos_s) * len(neg_s)), 6)
    return values_sql(
        [(len(pos_s), len(neg_s), num_x2, auc)],
        [
            ("n_pos", "BIGINT"),
            ("n_neg", "BIGINT"),
            ("auc_num_x2", "BIGINT"),
            ("auc", "DOUBLE"),
        ],
    )


@_register("kg_popularity_drift")
def _kg_popularity_drift_values() -> str:
    """Entity-popularity drift twin: subject+object occurrences per
    entity in the two observation windows split at 2026-05-01 (the
    kg_graph_diff boundary), then the distribution_psi arithmetic —
    exact integer proportions, one ln per two-sided category, NULL for
    one-sided ones, all _round_half_up(6)."""
    import math

    import pandas as pd

    pdf = _fixture_triples_with_ts()
    cut = pd.Timestamp("2026-05-01")
    counts: dict[str, list[int]] = {}
    for r in pdf.itertuples(index=False):
        side = 0 if r.ts < cut else 1
        for ent in (r.subj_entity_id, r.obj_entity_id):
            counts.setdefault(ent, [0, 0])[side] += 1
    tot_a = sum(v[0] for v in counts.values())
    tot_b = sum(v[1] for v in counts.values())
    rows = []
    for ent, (na, nb) in counts.items():
        p_a = na / tot_a
        p_b = nb / tot_b
        term = (
            _round_half_up((p_a - p_b) * math.log(p_a / p_b), 6)
            if na > 0 and nb > 0
            else None
        )
        rows.append(
            (ent, na, nb, _round_half_up(p_a, 6), _round_half_up(p_b, 6), term)
        )
    return values_sql(
        sorted(rows),
        [
            ("entity_id", "VARCHAR"),
            ("n_a", "BIGINT"),
            ("n_b", "BIGINT"),
            ("p_a", "DOUBLE"),
            ("p_b", "DOUBLE"),
            ("psi_term", "DOUBLE"),
        ],
    )


@_register("ann_ivf_recall")
def _ann_ivf_recall_values() -> str:
    """IVF recall@5 twin: exact top-5 by brute-force fold-cosine and the
    IVF candidate top-5 via the SAME shared kernels the ann_ivf_topk
    twin uses (_probe_sets/_unit_rows/train_centroids), intersected per
    query — recall is an exact rational of small integers."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _probe_sets,
        _unit_rows,
        train_centroids,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    cent = train_centroids(sample, n_centroids=16, seed=42)
    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    assign = (corpus.astype(np.float64) @ cent.astype(np.float64).T).argmax(axis=1)
    bucket_members: dict[int, list[int]] = {}
    for idx, b in enumerate(assign):
        bucket_members.setdefault(int(b), []).append(idx)
    k = 5
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        exact = sorted(
            (-_fold_cosine(vecs[qi], vecs[ci]), ids[ci]) for ci in range(len(ids))
        )[:k]
        exact_ids = {cid for _, cid in exact}
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        probed = _probe_sets(q, cent, 4)[0]
        cand = sorted(
            (-_fold_cosine(vecs[qi], vecs[ci]), ids[ci])
            for b in probed
            for ci in bucket_members.get(int(b), [])
        )[:k]
        hit = len(exact_ids & {cid for _, cid in cand})
        rows.append((qid, k, hit, _round_half_up(hit / k, 6)))
    return values_sql(
        sorted(rows),
        [
            ("q_id", "BIGINT"),
            ("k", "BIGINT"),
            ("n_hit", "BIGINT"),
            ("recall", "DOUBLE"),
        ],
    )


@_register("kg_rule_confidence_capped")
def _kg_rule_confidence_capped_values() -> str:
    """Hot-midpoint guard twin: fixture edges plus a synthetic hub
    (4 fan-in × 3 fan-out = 12 paths > cap 9), body derivation skipping
    edges through midpoints whose in·out exceeds the cap — the same
    drop the engine's broadcast-mark guard performs."""
    edges = set(_fixture_edge_set())
    for i in range(4):
        edges.add((f"S{i}", "feeds", "HUB"))
    for j in range(3):
        edges.add(("HUB", "emits", f"T{j}"))
    cap = 9
    in_deg: dict[str, int] = {}
    out_deg: dict[str, int] = {}
    for s, p, o in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
        in_deg[o] = in_deg.get(o, 0) + 1
    hot = {
        x
        for x in set(in_deg) & set(out_deg)
        if in_deg[x] * out_deg[x] > cap
    }
    out_adj: dict[str, list[tuple[str, str]]] = {}
    for s, p, o in edges:
        if s not in hot:
            out_adj.setdefault(s, []).append((p, o))
    body: dict[tuple[str, str], set] = {}
    for a, p1, x in edges:
        if x in hot:
            continue
        for p2, c in out_adj.get(x, []):
            if a == c:
                continue
            body.setdefault((p1, p2), set()).add((a, c))
    heads: dict[tuple[str, str], set] = {}
    for s, p, o in edges:
        heads.setdefault((s, o), set()).add(p)
    rows = []
    for (p1, p2), pairs in body.items():
        sup: dict[str, int] = {}
        for pair in pairs:
            for p3 in heads.get(pair, ()):
                sup[p3] = sup.get(p3, 0) + 1
        for p3, s_n in sup.items():
            rows.append(
                (p1, p2, p3, s_n, len(pairs), _round_half_up(s_n / len(pairs), 6))
            )
    return values_sql(
        sorted(rows),
        [
            ("p1", "VARCHAR"),
            ("p2", "VARCHAR"),
            ("p3", "VARCHAR"),
            ("support", "BIGINT"),
            ("body_pairs", "BIGINT"),
            ("confidence", "DOUBLE"),
        ],
    )


@_register("graph_eff_diameter")
def _graph_eff_diameter_values() -> str:
    """Effective-diameter twin: the neighborhood-function twin's exact
    integer-millionth curve, 0.9-quantile crossing by the same long
    arithmetic."""
    adj = _supplier_bucket_adj()
    max_t, q_m = 4, 900_000
    balls = {v: {v} for v in adj}
    frontiers = {v: {v} for v in adj}
    curve = []
    for t in range(0, max_t + 1):
        if t > 0:
            for v in adj:
                nf = {u for f in frontiers[v] for u in adj.get(f, ())}
                frontiers[v] = nf - balls[v]
                balls[v] |= nf
        curve.append(
            (t, sum(int(_round_half_up(_hll_est_of(balls[v]) * 1e6, 0)) for v in adj))
        )
    n_max = max(n for _, n in curve)
    t_star, n_star = min(
        (t, n) for t, n in curve if n * 1_000_000 >= n_max * q_m
    )
    return values_sql(
        [(t_star, n_star, _round_half_up(n_max / 1e6, 6))],
        [
            ("eff_diameter", "INTEGER"),
            ("n_at_diameter_millionths", "BIGINT"),
            ("n_max_est", "DOUBLE"),
        ],
    )


@_register("ann_pq_recall")
def _ann_pq_recall_values() -> str:
    """PQ-ADC recall@5 twin: exact top-5 by fold-cosine vs the ADC
    top-5 via the shared codebook/LUT kernels, intersected per query."""
    from cdrc_semantic_search_spark.operators.similarity import (
        _pq_codes,
        _pq_luts,
        _unit_rows,
        train_pq_codebooks,
    )

    t = _read("embeddings", ["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = [np.asarray(v, dtype=np.float32) for v in t.column("embedding").to_pylist()]
    order = np.argsort(np.array(ids))
    sample = np.stack([vecs[i] for i in order if ids[i] < 256])
    books = train_pq_codebooks(sample, m=8, k=16, seed=42)
    corpus = _unit_rows(np.stack(vecs).astype(np.float32))
    codes = _pq_codes(corpus, books)
    m = books.shape[0]
    k = 5
    rows = []
    for qi, qid in enumerate(ids):
        if qid >= 10:
            continue
        exact_ids = {
            cid
            for _, cid in sorted(
                (-_fold_cosine(vecs[qi], vecs[ci]), ids[ci])
                for ci in range(len(ids))
            )[:k]
        }
        q = _unit_rows(vecs[qi].astype(np.float32).reshape(1, -1))
        lut = _pq_luts(q, books)[0]
        scored = []
        for ci in range(len(corpus)):
            s = np.float32(0.0)
            for j in range(m):
                s += lut[j][codes[ci, j]]
            scored.append((-float(s), ids[ci]))
        adc_ids = {cid for _, cid in sorted(scored)[:k]}
        hit = len(exact_ids & adc_ids)
        rows.append((qid, k, hit, _round_half_up(hit / k, 6)))
    return values_sql(
        sorted(rows),
        [
            ("q_id", "BIGINT"),
            ("k", "BIGINT"),
            ("n_hit", "BIGINT"),
            ("recall", "DOUBLE"),
        ],
    )
