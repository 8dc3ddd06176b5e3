from __future__ import annotations

import pandas as pd

from cdrc_semantic_search_spark.config import Settings
from cdrc_semantic_search_spark.operators.linking import _topk_blend, build_entity_index

ENTS = pd.DataFrame(
    [
        {"entity_id": "E1", "canonical_name": "Index of Multiple Deprivation", "aliases": ["IMD"]},
        {"entity_id": "E2", "canonical_name": "Multiple Index Catalogue", "aliases": []},
        {"entity_id": "E3", "canonical_name": "Retail Footfall Camera", "aliases": []},
    ]
)


def _index():
    return build_entity_index(ENTS, Settings())


def test_modes_mirror_reference_enum():
    idx = _index()
    surf = ["index of multiple deprivationX"]  # near-typo of E1
    dense = _topk_blend(idx, surf, k=3, alpha=0.75, mode="default")[0]
    sparse = _topk_blend(idx, surf, k=3, alpha=0.75, mode="sparse")[0]
    hybrid = _topk_blend(idx, surf, k=3, alpha=0.75, mode="hybrid")[0]
    assert dense[0][0] == "E1" and hybrid[0][0] == "E1"
    # sparse scores are pure token Jaccard ∈ [0,1] and rank E1/E2 over E3
    assert all(0.0 <= s <= 1.0 for _, s in sparse)
    assert sparse[0][0] in ("E1", "E2")
    assert sparse[-1][0] == "E3" or len(sparse) < 3
    # hybrid score = 0.75·dense + 0.25·sparse for the same entity
    d = dict(dense)
    s = dict(_topk_blend(idx, surf, k=3, alpha=0.75, mode="sparse")[0])
    h = dict(hybrid)
    for eid in set(d) & set(s) & set(h):
        assert abs(h[eid] - (0.75 * d[eid] + 0.25 * s[eid])) < 1e-9


def test_tiebreak_score_desc_entity_asc():
    idx = _index()
    # identical surfaces → identical scores per entity; order deterministic
    a = _topk_blend(idx, ["Index of Multiple Deprivation"], k=3, alpha=0.75)[0]
    b = _topk_blend(idx, ["Index of Multiple Deprivation"], k=3, alpha=0.75)[0]
    assert a == b
    assert a[0][0] == "E1" and a[0][1] > a[1][1]
