"""Multimodal stage plumbing: schemas, determinism, actor-pool wiring,
and the real-backend NotImplementedError gate."""

from __future__ import annotations

import numpy as np
import pytest

from article_extraction_ray.stages.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    synth_media_table,
)


@pytest.fixture()
def media():
    return synth_media_table([f"img://d/{i}" for i in range(8)], "image")


def test_real_backend_gated():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(backend="real")
    with pytest.raises(NotImplementedError):
        ImageFeatureStage(backend="real")
    with pytest.raises(NotImplementedError):
        FrameSampleStage(backend="real")


def test_decode_deterministic(media):
    a = ImageDecodeStage()(media).to_pylist()
    b = ImageDecodeStage()(media).to_pylist()
    assert a == b
    for row in a:
        assert 16 <= row["width"] < 4096
        assert 1 <= row["n_channels"] <= 4


def test_features_unit_norm(media):
    out = ImageFeatureStage(dim=32)(media)
    for v in out["features"].to_pylist():
        assert len(v) == 32
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_frame_sampling_flat_map_shape():
    media = synth_media_table([f"vid://d/{i}" for i in range(3)], "video")
    out = FrameSampleStage(frames=4)(media)
    assert out.num_rows == 12
    rows = out.to_pylist()
    assert rows[0]["frame_idx"] == 0 and rows[0]["ts_ms"] == 0
    assert all(r["ts_ms"] >= 0 for r in rows)


def test_actor_pool_pipeline(ray_session, media):
    import ray.data as rd

    ds = rd.from_arrow(media)
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow", concurrency=2).to_pandas()
    assert len(out) == 8
    assert set(out.columns) == {"media_ref", "width", "height", "n_channels"}
