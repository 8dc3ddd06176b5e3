import pytest

from cdrc_semantic_search_spark.config import (
    ChunkSettings,
    EncoderSettings,
    PipelineSettings,
    RetrievalSettings,
    Settings,
)


def test_defaults_match_reference():
    s = Settings()
    # reference config.toml: chunk 256/32, top_k 30, alpha 0.75, hybrid
    assert s.chunking.chunk_size == 256 and s.chunking.chunk_overlap == 32
    assert s.retrieval.top_k == 30 and s.retrieval.alpha == 0.75
    assert s.retrieval.query_mode == "hybrid"


@pytest.mark.parametrize(
    "bad",
    [
        lambda: EncoderSettings(embed_dim=0),
        lambda: EncoderSettings(embed_dim=10_001),  # utils.py:22 bound
        lambda: RetrievalSettings(top_k=0),
        lambda: RetrievalSettings(top_k=101),  # utils.py:29 bound
        lambda: RetrievalSettings(alpha=0.0),  # utils.py:31: (0, 1]
        lambda: RetrievalSettings(alpha=1.5),
        lambda: RetrievalSettings(query_mode="fuzzy"),  # utils.py:30 enum
        lambda: ChunkSettings(chunk_size=0),
        lambda: ChunkSettings(chunk_size=10, chunk_overlap=10),
        lambda: PipelineSettings(num_buckets=0),
    ],
)
def test_bounds_rejected(bad):
    with pytest.raises(ValueError):
        bad()


def test_valid_edges_accepted():
    RetrievalSettings(top_k=100, alpha=1.0, query_mode="default")
    RetrievalSettings(top_k=1, alpha=0.001, query_mode="sparse")
    ChunkSettings(chunk_size=1, chunk_overlap=0)
