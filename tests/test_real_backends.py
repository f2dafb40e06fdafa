"""Env-gated integration smoke tests for every ``backend="real"`` seam.

``pytest -m real`` collects these everywhere; each test activates only
when its backing dependency exists (PIL / soundfile / av /
sentence-transformers / torch / a live network) and skips cleanly
otherwise — so the production wiring is exercised the day the container
ships the dependency, with zero changes.  In THIS sandbox they all skip;
the companion (unmarked) tests below assert the gates raise the honest
NotImplementedError instead of silently faking."""

from __future__ import annotations

import socket

import numpy as np
import pyarrow as pa
import pytest


def _network_available(host: str = "example.com", port: int = 443, timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


@pytest.mark.real
def test_image_decode_real_backend():
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from article_extraction_ray.stages.multimodal import ImageDecodeStage

    im = PIL_Image.new("RGB", (17, 9))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    batch = pa.table(
        {"media_ref": ["m1"], "payload": pa.array([buf.getvalue()], type=pa.large_binary())}
    )
    out = ImageDecodeStage(backend="real")(batch)
    assert out["width"][0].as_py() == 17
    assert out["height"][0].as_py() == 9
    assert out["n_channels"][0].as_py() == 3


@pytest.mark.real
def test_audio_decode_real_backend():
    pytest.importorskip("soundfile")
    from article_extraction_ray.stages.multimodal import AudioDecodeStage, make_wav

    wav = make_wav(8000, (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16))
    batch = pa.table(
        {"media_ref": ["a1"], "payload": pa.array([wav], type=pa.large_binary())}
    )
    out = AudioDecodeStage(backend="real")(batch)
    assert out["sample_rate"][0].as_py() == 8000
    assert out["n_samples"][0].as_py() == 800
    # libsndfile must agree with the stdlib decoder on the same payload
    ref = AudioDecodeStage(backend="wav")(batch)
    assert abs(out["rms"][0].as_py() - ref["rms"][0].as_py()) < 1.0


@pytest.mark.real
def test_frame_sample_real_backend_constructs():
    pytest.importorskip("av")
    from article_extraction_ray.stages.multimodal import FrameSampleStage

    FrameSampleStage(backend="real")  # per-actor demuxer import succeeds


@pytest.mark.real
def test_image_feature_real_backend_with_torch_encoder():
    torch = pytest.importorskip("torch")
    from article_extraction_ray.stages.multimodal import ImageFeatureStage

    dim = 16

    def encoder(payloads):
        # stand-in vision forward: bytes → fixed-dim embedding on torch
        outs = []
        for p in payloads:
            x = torch.frombuffer(bytearray((p or b"\0")[:64].ljust(64, b"\0")), dtype=torch.uint8)
            outs.append(x.float().reshape(4, 16).mean(dim=0))
        return torch.stack(outs).numpy()

    batch = pa.table(
        {"media_ref": ["m1", "m2"], "payload": pa.array([b"ab" * 40, b"cd" * 40], type=pa.large_binary())}
    )
    out = ImageFeatureStage(dim=dim, backend="real", encoder=encoder)(batch)
    assert out.column_names == ["media_ref", "features"]
    assert len(out["features"][0].as_py()) == dim


@pytest.mark.real
def test_eval_encoder_real_backend():
    st = pytest.importorskip("sentence_transformers")
    from article_extraction_ray.pipelines.eval import EvalEncoderStage

    model = st.SentenceTransformer("all-MiniLM-L6-v2")
    stage = EvalEncoderStage(backend="real", encoder=model)
    batch = pa.table({"true": ["alpha beta"], "predicted": ["alpha beta"]})
    out = stage(batch)
    assert out["cosine_distance"][0].as_py() < 1e-6  # identical strings


@pytest.mark.real
def test_fetch_real_backend_live_get():
    if not _network_available():
        pytest.skip("no network in this container")
    from article_extraction_ray.sources.fetch import FetchStage

    stage = FetchStage(backend="real", timeout=10.0)
    batch = pa.table({"url": ["https://example.com/"]})
    out = stage(batch)
    assert out["status"][0].as_py() == "ok"
    assert out["doc_type"][0].as_py() == "html"
    assert len(out["payload"][0].as_py()) > 0


# --- unmarked: the gates must stay honest when the dependency is absent ---


def test_gates_raise_cleanly_without_deps():
    from article_extraction_ray.pipelines.eval import EvalEncoderStage
    from article_extraction_ray.stages.multimodal import (
        AudioDecodeStage,
        FrameSampleStage,
        ImageDecodeStage,
        ImageFeatureStage,
    )

    def absent(mod):
        try:
            __import__(mod)
            return False
        except ImportError:
            return True

    if absent("PIL"):
        with pytest.raises(NotImplementedError):
            ImageDecodeStage(backend="real")
    if absent("soundfile"):
        with pytest.raises(NotImplementedError):
            AudioDecodeStage(backend="real")
    if absent("av"):
        with pytest.raises(NotImplementedError):
            FrameSampleStage(backend="real")
    with pytest.raises(NotImplementedError):
        ImageFeatureStage(backend="real")  # encoder injection required
    if absent("sentence_transformers"):
        with pytest.raises(NotImplementedError):
            EvalEncoderStage(backend="real")


def test_fetch_real_constructs_offline():
    """Session construction is per-actor __init__ work and must succeed
    offline; only the live GET needs a network."""
    from article_extraction_ray.sources.fetch import FetchStage

    stage = FetchStage(backend="real")
    assert stage._opener is not None
    # per-row isolation: a dead URL errors its row, never the batch
    out = stage(pa.table({"url": ["http://127.0.0.1:1/x"]}))
    assert out["status"][0].as_py().startswith("error:")
