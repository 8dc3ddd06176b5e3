import numpy as np

from cdrc_semantic_search_spark.encoder import encode_texts, normalize_surface


def test_deterministic_across_calls():
    a = encode_texts(["hello world", "Spark engine"], dim=64, seed=42)
    b = encode_texts(["hello world", "Spark engine"], dim=64, seed=42)
    assert np.array_equal(a, b)


def test_unit_norm():
    m = encode_texts(["some text", "", "x"], dim=32, seed=7)
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_case_and_ws_invariance():
    a = encode_texts(["Index of Multiple  Deprivation"], dim=64)
    b = encode_texts(["index of multiple deprivation"], dim=64)
    assert np.allclose(a, b)


def test_similar_strings_closer_than_random():
    base, typo, other = "Index of Multiple Deprivation", "Indx of Multiple Deprivation", "Retail Footfall Camera"
    m = encode_texts([base, typo, other], dim=64)
    assert m[0] @ m[1] > m[0] @ m[2]


def test_seed_changes_embedding():
    a = encode_texts(["hello world"], dim=64, seed=1)
    b = encode_texts(["hello world"], dim=64, seed=2)
    assert not np.allclose(a, b)


def test_normalize_surface():
    assert normalize_surface("  Foo   BAR ") == "foo bar"
