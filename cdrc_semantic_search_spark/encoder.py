"""Deterministic text encoder + Arrow-batched Spark UDF.

Plays the role of the reference's embedding stage
(``/root/reference/src/datastore.py:116-120`` — OpenAI
``text-embedding-3-large``, 3072-d, batched).  The encoder interface is
pluggable; the sandbox implementation is a seeded **hashed character-n-gram
projection**: every char n-gram is feature-hashed (crc32, salted by the
seed) into one of ``dim`` buckets with a ±1 sign hash, counts are
accumulated and L2-normalized.  Pure function of (text, dim, seed, ngram)
— bit-identical between the Spark pipeline and the pure-Python oracle,
which is what makes triple parity exactly testable.

Spark integration is a **scalar-iterator pandas UDF**
(``Iterator[pd.Series] → Iterator[pd.Series]``): per-executor-process
setup cost is paid once, texts stream through in Arrow batches, and no
per-row Python ever runs inside Spark (BASELINE.json input_hint).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

__all__ = ["encode_texts", "normalize_surface", "make_encoder_udf"]


def normalize_surface(text: str) -> str:
    """Canonical surface-form normalization used by both linker and oracle."""
    return " ".join(text.lower().split())


def _hash_ngram(gram: bytes, seed: int) -> int:
    # crc32 is deterministic across processes/platforms (unlike hash())
    return zlib.crc32(gram, seed & 0xFFFFFFFF)


def encode_texts(
    texts: "list[str] | pd.Series | np.ndarray",
    dim: int = 64,
    seed: int = 42,
    ngram: int = 3,
) -> np.ndarray:
    """Encode a batch of texts → (n, dim) float32, unit-L2-normalized.

    Empty/degenerate texts get a deterministic one-hot on bucket 0 so every
    vector is unit-norm (cosine stays well-defined).
    """
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, raw in enumerate(texts):
        t = normalize_surface(raw if isinstance(raw, str) else "")
        b = t.encode("utf-8", errors="ignore")
        n = len(b)
        if n >= ngram:
            row = out[i]
            for j in range(n - ngram + 1):
                h = _hash_ngram(b[j : j + ngram], seed)
                idx = h % dim
                sign = 1.0 if (h >> 16) & 1 else -1.0
                row[idx] += sign
        norm = float(np.sqrt(np.dot(out[i], out[i])))
        if norm < 1e-12:
            out[i, 0] = 1.0
        else:
            out[i] /= norm
    return out


def make_encoder_udf(
    dim: int = 64, seed: int = 42, ngram: int = 3
) -> Callable:
    """Build the scalar-iterator pandas UDF ``text → array<float>``.

    The iterator form means the (hypothetically heavy) encoder is
    constructed once per python worker, then reused across Arrow batches —
    the pattern a real sentence-transformer would need (model load once,
    batch inference after).
    """

    @F.pandas_udf(ArrayType(FloatType()))
    def encode_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-worker setup would go here (model load)
        for series in batches:
            mat = encode_texts(series.fillna("").tolist(), dim=dim, seed=seed, ngram=ngram)
            yield pd.Series(list(mat))

    return encode_udf
