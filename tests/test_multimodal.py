from __future__ import annotations

import numpy as np

from cdrc_semantic_search_spark.operators import multimodal


def _assets(spark):
    rows = [("a1", bytes([1, 2, 3, 4])), ("a2", bytes(range(64))), ("a3", b"")]
    return spark.createDataFrame(rows, "asset_id string, payload binary")


def test_attach_asset_metadata(spark):
    out = multimodal.attach_asset_metadata(_assets(spark)).toPandas().set_index("asset_id")
    assert out.loc["a1", "n_bytes"] == 4
    assert out.loc["a3", "n_bytes"] == 0
    assert out.loc["a1", "content_hash"] != out.loc["a2", "content_hash"]


def test_image_features_shape_and_determinism(spark):
    df = _assets(spark)
    out1 = multimodal.image_features(df, dim=16).toPandas().set_index("asset_id")
    out2 = multimodal.image_features(df, dim=16).toPandas().set_index("asset_id")
    for aid in ["a1", "a2", "a3"]:
        v1, v2 = np.array(out1.loc[aid, "features"]), np.array(out2.loc[aid, "features"])
        assert v1.shape == (16,)
        assert np.allclose(v1, v2)  # stub decode is deterministic
        assert (0 <= v1).all() and (v1 <= 1).all()


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([("v1", 100), ("v2", 10)], "asset_id string, n_frames int")
    out = multimodal.frame_sample_plan(df, every=30).toPandas()
    v1 = sorted(out[out["asset_id"] == "v1"]["frame_idx"])
    assert v1 == [0, 30, 60, 90]
    assert sorted(out[out["asset_id"] == "v2"]["frame_idx"]) == [0]


def test_audio_features_shape_and_determinism(spark):
    df = _assets(spark)
    out1 = multimodal.audio_features(df).toPandas().set_index("asset_id")
    out2 = multimodal.audio_features(df).toPandas().set_index("asset_id")
    for aid in ["a1", "a2", "a3"]:
        assert out1.loc[aid].equals(out2.loc[aid])  # stub decode deterministic
        assert 0.0 <= out1.loc[aid, "rms_mean"] <= out1.loc[aid, "rms_max"] <= 1.0
        assert 0.0 <= out1.loc[aid, "zero_crossing_rate"] <= 1.0
    # different payloads yield different fake PCM → different features
    assert out1.loc["a1", "rms_mean"] != out1.loc["a2", "rms_mean"]
