"""Text chunking — the reference's SentenceSplitter re-expressed
(/root/reference/src/datastore.py:112-115, config/config.toml:8-9:
chunk_size=256 tokens, chunk_overlap=32, stable in-document order).

Two strategies:

* ``chunk_words`` — fixed token windows with overlap, pure Catalyst
  (sequence → transform → slice → posexplode). Fully SQL-expressible, so
  it gets a DuckDB oracle; also the fastest path (whole-stage codegen,
  zero Python).
* ``chunk_sentences`` — sentence-boundary-aware packing (the reference's
  actual behavior), as an Arrow-batched pandas UDF + posexplode; shares
  ``pack_sentences`` with the oracle for exact parity.

Both preserve stable (doc, chunk_idx) order — the W5 invariant.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.functions.text import tokens

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _check_chunk_params(chunk_size: int, overlap: int) -> None:
    """Single source of truth: delegate to ChunkSettings' own validation
    (overlap >= chunk_size makes the stride non-positive and documents
    would silently vanish from the posexplode output)."""
    from cdrc_semantic_search_spark.config import ChunkSettings

    ChunkSettings(chunk_size=chunk_size, chunk_overlap=overlap)


def chunk_words_col(text: Column, chunk_size: int, overlap: int) -> Column:
    """array<string> of word-window chunks (stride = chunk_size - overlap)."""
    _check_chunk_params(chunk_size, overlap)
    toks = tokens(text)
    stride = chunk_size - overlap
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size))
    )


def chunk_words(
    df: DataFrame, id_col: str, text_col: str, chunk_size: int = 256, overlap: int = 32
) -> DataFrame:
    """→ (id, chunk_idx, chunk_text); Catalyst-only, ordered by construction."""
    chunks = chunk_words_col(F.col(text_col), chunk_size, overlap)
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )


def pack_sentences(text: str, chunk_size: int, overlap: int) -> list[str]:
    """Sentence-aware packing: greedy fill up to chunk_size tokens; the last
    ``overlap`` tokens of a chunk seed the next (pure function, shared with
    the oracle and tests)."""
    _check_chunk_params(chunk_size, overlap)
    sents = [s for s in _SENT_RE.split(text or "") if s.strip()]
    if not sents:
        return []
    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for sent in sents:
        stoks = sent.split()
        if cur and cur_len + len(stoks) > chunk_size:
            chunks.append(" ".join(cur))
            tail = cur[-overlap:] if overlap else []
            cur = list(tail)
            cur_len = len(cur)
        cur.extend(stoks)
        cur_len += len(stoks)
        # a single sentence longer than chunk_size becomes its own chunk(s)
        while cur_len > chunk_size:
            chunks.append(" ".join(cur[:chunk_size]))
            cur = cur[chunk_size - overlap if overlap else chunk_size :]
            cur_len = len(cur)
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def chunk_sentences(
    df: DataFrame, id_col: str, text_col: str, chunk_size: int = 256, overlap: int = 32
) -> DataFrame:
    """Sentence-aware chunking via mapInPandas → (id, chunk_idx, chunk_text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for ci, chunk in enumerate(pack_sentences(t, chunk_size, overlap)):
                    rows.append((i, ci, chunk))
            yield pd.DataFrame(rows, columns=[id_col, "chunk_idx", "chunk_text"])

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, chunk_idx int, chunk_text string"
    )
