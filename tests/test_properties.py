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


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=300))
def test_ascii_translate_tokenization_equals_per_token_lower(t):
    """The extract_turn hot-path optimization (whole-text ASCII
    translate instead of per-token str.lower) must be EXACTLY
    equivalent on arbitrary input, including non-ASCII: the token regex
    matches only [A-Za-z0-9'], so per-token lower() touches only ASCII
    letters, and the translate table touches exactly A-Z — same token
    text, same spans (translate is length-preserving where str.lower()
    on the whole text is not: 'İ'.lower() grows)."""
    from cdrc_semantic_search_spark.operators.extraction_core import (
        _ASCII_LOWER,
        _WORD_RE,
    )

    fast = [
        (m.span(), m.group())
        for m in _WORD_RE.finditer(t.translate(_ASCII_LOWER))
    ]
    ref = [(m.span(), m.group().lower()) for m in _WORD_RE.finditer(t)]
    assert fast == ref


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_extract_turn_independent_of_catalogue_insert_order(parts):
    """AliasMatcher output must not depend on the order entities were
    inserted (longest-match-first is sorted per first-token, ambiguous
    aliases tie-break to the smallest entity id)."""
    from cdrc_semantic_search_spark.operators.extraction_core import (
        AliasMatcher,
        extract_turn,
    )

    cat = [("E2", ["a b", "b"]), ("E1", ["a", "a b a"]), ("E3", ["b a"])]
    text = " ".join(parts)
    m1 = AliasMatcher(cat)
    m2 = AliasMatcher(list(reversed(cat)))
    r1 = extract_turn(text, m1)
    r2 = extract_turn(text, m2)
    assert [(m.start, m.end, m.surface) for m in r1[0]] == [
        (m.start, m.end, m.surface) for m in r2[0]
    ]
