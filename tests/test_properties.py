"""Property-based tests (hypothesis) for the pure operator kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdrc_semantic_search_spark.encoder import encode_texts, normalize_surface
from cdrc_semantic_search_spark.operators.chunker import pack_sentences

texts = st.text(
    alphabet=st.characters(codec="utf-8", categories=("L", "N", "Zs", "P")),
    max_size=400,
)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_encoder_always_unit_norm(t):
    v = encode_texts([t], dim=32)
    assert np.isclose(np.linalg.norm(v[0]), 1.0, atol=1e-5)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_encoder_normalization_invariance(t):
    # invariant under the encoder's own normalization: lowercase + ws collapse
    # (not upper(): 'ß'.upper() == 'SS' is not length-preserving)
    a = encode_texts([t], dim=32)
    b = encode_texts([" ".join(t.lower().split())], dim=32)
    assert np.allclose(a, b, atol=1e-6)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(1, 12), min_size=1, max_size=20),  # sentence lengths
    st.integers(3, 40),  # chunk size
    st.integers(0, 2),  # overlap
)
def test_pack_sentences_covers_all_tokens_in_order(lengths, chunk_size, overlap):
    overlap = min(overlap, chunk_size - 1)
    sents = [
        " ".join(f"w{si}_{wi}" for wi in range(n)) + "." for si, n in enumerate(lengths)
    ]
    text = " ".join(sents)
    chunks = pack_sentences(text, chunk_size, overlap)
    assert chunks, "non-empty text must chunk"
    # dedup the overlap seams, then the concatenation preserves token order
    all_tokens = text.split()
    rebuilt: list[str] = []
    for c in chunks:
        toks = c.split()
        k = 0  # longest suffix of `rebuilt` that prefixes this chunk (overlap)
        for cand in range(min(len(rebuilt), len(toks)), -1, -1):
            if rebuilt[len(rebuilt) - cand :] == toks[:cand]:
                k = cand
                break
        rebuilt.extend(toks[k:])
    assert rebuilt == all_tokens


@settings(max_examples=30, deadline=None)
@given(
    st.sets(st.integers(0, 500), min_size=5, max_size=80),
    st.sets(st.integers(0, 500), min_size=5, max_size=80),
)
def test_minhash_estimates_jaccard(sa, sb):
    """MinHash signature agreement ≈ true Jaccard (within coarse tolerance)."""
    from cdrc_semantic_search_spark.operators.dedup import _minhash_matrix

    import zlib

    ha = np.array(sorted(zlib.crc32(str(x).encode()) for x in sa), dtype=np.uint64)
    hb = np.array(sorted(zlib.crc32(str(x).encode()) for x in sb), dtype=np.uint64)
    sig = _minhash_matrix([ha, hb], n_perm=256, seed=42)
    est = float((sig[0] == sig[1]).mean())
    true = len(sa & sb) / len(sa | sb)
    assert abs(est - true) < 0.22  # 256 perms → σ ≈ sqrt(j(1-j)/256) ≤ 0.032


def test_normalize_surface_idempotent():
    for s in ["A  B", " a b ", "AB\tc", ""]:
        assert normalize_surface(normalize_surface(s)) == normalize_surface(s)
