"""Spark mention/relation extraction over transcript turns.

``mapInPandas`` operators wrapping the pure extraction core
(operators/extraction_core.py).  The entity catalogue is broadcast once
(``sc.broadcast``) and each Python worker builds the alias automaton a
single time per broadcast epoch, then streams Arrow batches through it —
no per-row Python dispatch, no per-batch setup cost
(BASELINE.json input_hint: "vectorized pandas/Arrow UDFs throughout").

Reference analog: the reference has no sub-chunk extraction (whole chunks
are the retrieval unit); this is the KG graft's D6 operator (SURVEY §2.11).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdrc_semantic_search_spark.operators.extraction_core import (
    AliasMatcher,
    extract_turn,
)

# worker-side matcher cache, keyed by a per-broadcast token: the automaton is
# built once per python worker per broadcast epoch, then reused across tasks
_MATCHER_CACHE: dict[str, AliasMatcher] = {}


def _get_matcher(bc) -> AliasMatcher:
    token, payload = bc.value  # bc.value itself is worker-cached by PySpark
    m = _MATCHER_CACHE.get(token)
    if m is None:
        m = AliasMatcher(payload)
        _MATCHER_CACHE.clear()
        _MATCHER_CACHE[token] = m
    return m


def broadcast_catalogue(spark, entities_pdf: pd.DataFrame):
    """Broadcast (token, [(entity_id, [canonical_name, *aliases])])."""
    import uuid

    payload = [
        (row.entity_id, [row.canonical_name, *list(row.aliases)])
        for row in entities_pdf.itertuples()
    ]
    return spark.sparkContext.broadcast((uuid.uuid4().hex, payload))


MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, mention_idx int, surface string, "
    "start int, end int, exact boolean"
)

CANDIDATES_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, rel_idx int, pred string, "
    "subj_surface string, subj_exact boolean, "
    "obj_surface string, obj_exact boolean"
)


def extract_mentions(transcripts: DataFrame, bc_catalogue) -> DataFrame:
    """transcripts → mentions(conv_id, turn_idx, mention_idx, surface, start, end, exact)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _get_matcher(bc_catalogue)
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, ts, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["ts"], pdf["text"]
            ):
                mentions, _ = extract_turn(text or "", matcher)
                for mi, m in enumerate(mentions):
                    rows.append(
                        (conv_id, turn_idx, ts, mi, m.surface, m.start, m.end, m.exact)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "ts", "mention_idx", "surface",
                    "start", "end", "exact",
                ],
            )

    return transcripts.select("conv_id", "turn_idx", "ts", "text").mapInPandas(
        run, schema=MENTIONS_SCHEMA
    )


def extract_candidates(transcripts: DataFrame, bc_catalogue) -> DataFrame:
    """transcripts → relation candidates with surface forms (pre-linking)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = _get_matcher(bc_catalogue)
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, ts, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["ts"], pdf["text"]
            ):
                _, relations = extract_turn(text or "", matcher)
                for ri, (pred, subj, obj) in enumerate(relations):
                    rows.append(
                        (
                            conv_id, turn_idx, ts, ri, pred,
                            subj.surface, subj.exact,
                            obj.surface, obj.exact,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "conv_id", "turn_idx", "ts", "rel_idx", "pred",
                    "subj_surface", "subj_exact", "obj_surface", "obj_exact",
                ],
            )

    return transcripts.select("conv_id", "turn_idx", "ts", "text").mapInPandas(
        run, schema=CANDIDATES_SCHEMA
    )
