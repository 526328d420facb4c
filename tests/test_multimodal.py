"""Multimodal plumbing: schema, Arrow batch shapes, determinism of the
fake extractors, and the stubbed real-decode boundary."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from topo_descriptors_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [f"m{i}" for i in range(30)],
            "text": [f"payload content number {i} " * (i + 1) for i in range(30)],
        }
    )
    return M.attach_fake_media(spark.createDataFrame(pdf))


def test_media_schema(media):
    assert dict(media.dtypes) == {
        "media_id": "string",
        "kind": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"} and len(kinds) > 1


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M.decode_stub("image", b"\x89PNG...")


def test_extract_features(media):
    out = M.extract_features(media).toPandas()
    assert len(out) == 30
    assert (out["n_bytes"] > 0).all()
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (30, M.N_FEATURES)
    # histograms normalized
    assert np.allclose(feats.sum(axis=1), 1.0)
    # deterministic across runs
    out2 = M.extract_features(media).toPandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert all(np.allclose(x, y) for x, y in zip(a["features"], b["features"]))


def test_extract_features_null_payload(spark):
    df = spark.createDataFrame(
        [("a", "image", None, None)],
        "media_id string, kind string, payload binary, meta map<string,string>",
    )
    out = M.extract_features(df).toPandas()
    assert out.loc[0, "n_bytes"] == 0
    assert np.allclose(out.loc[0, "features"], 0.0)


def test_sample_frames(media):
    out = M.sample_frames(media, n_frames=4).toPandas()
    n_videos = media.where(F.col("kind") == "video").count()
    assert len(out) == 4 * n_videos
    assert set(out["frame_idx"].unique()) == {0, 1, 2, 3}
    # frame hashes deterministic across runs
    out2 = M.sample_frames(media, n_frames=4).toPandas()
    key = ["media_id", "frame_idx"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a["frame_hash"].equals(b["frame_hash"])


def test_no_shuffle_in_feature_plan(media):
    plan = M.extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas preserves partitioning
