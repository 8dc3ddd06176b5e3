"""Retrieval evaluation over an α grid — the reference's ``src/evaluation.py``
re-expressed (grid at evaluation.py:60: α ∈ {0.0, 0.75, 1.0}).

The reference judges each retrieval with a quantized LLM; a sandboxed
engine can do better: the fixture carries exact ground truth, so the
judge is precision/recall of the emitted triples per α (A6 result
accumulation → a metrics DataFrame; K6 CSV sink via sources.readers).

This is also the knob-sweep harness a production deployment uses to pick
α / link_threshold: one broadcast index build, one extraction pass per
setting (extraction is α-independent but the fused operator links inline,
so each α is a separate map-only job — still zero shuffles each).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from cdrc_semantic_search_spark.config import (
    EncoderSettings,
    PipelineSettings,
    RetrievalSettings,
    Settings,
)
from cdrc_semantic_search_spark.oracle import precision_recall
from cdrc_semantic_search_spark.plans.kg_pipeline import KGPipeline

ALPHA_GRID = (0.25, 0.75, 1.0)  # reference grid has 0.0; alpha ∈ (0,1]


def evaluate_alpha_grid(
    spark: SparkSession,
    transcripts: DataFrame,
    entities_pdf: pd.DataFrame,
    truth: pd.DataFrame,
    alphas: tuple[float, ...] = ALPHA_GRID,
) -> pd.DataFrame:
    """→ metrics frame (alpha, precision, recall, n_triples)."""
    rows = []
    for alpha in alphas:
        settings = Settings(
            encoder=EncoderSettings(),
            retrieval=RetrievalSettings(alpha=alpha),
            pipeline=PipelineSettings(),
        )
        pipe = KGPipeline(spark, entities_pdf, settings)
        got = pipe.triples(transcripts).toPandas()
        p, r = precision_recall(got, truth)
        rows.append(
            {"alpha": alpha, "precision": round(p, 4), "recall": round(r, 4),
             "n_triples": len(got)}
        )
    return pd.DataFrame(rows)
