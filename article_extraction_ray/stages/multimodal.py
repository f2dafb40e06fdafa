"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference stores fetched documents as opaque blobs with a type tag
(/root/reference/tables/paper_document_table.py:22-34) and never decodes
media.  This engine treats media as first-class: decode / feature
extraction / resize / frame sampling are actor-pool ``map_batches``
stages over ``large_binary`` payload columns.

The actual codec libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernels are STUBBED: ``backend="real"`` raises
``NotImplementedError`` with the production wiring documented, and
``backend="fake"`` (default for tests/bench) derives deterministic
pseudo-decodes from the payload bytes (blake2 digest → stable shapes and
features).  All the Ray-side plumbing — schema, batch size, actor
signature, zero-copy binary handling, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("media_kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.large_binary()),
    ]
)


def _digest_ints(payload: bytes, n: int, lo: int, hi: int) -> np.ndarray:
    """Deterministic pseudo-values from a payload (the "fake codec")."""
    h = hashlib.blake2b(payload, digest_size=8 * n).digest()
    vals = np.frombuffer(h, dtype=np.uint64).astype(np.float64)
    return (lo + (vals % (hi - lo))).astype(np.int64)


class ImageDecodeStage:
    """Actor-pool stage: binary image payloads → (width, height, n_channels).

    Production backend decodes with PIL/turbojpeg inside ``__init__``-held
    contexts; sandbox backend derives deterministic dimensions from the
    bytes so downstream stages exercise identical schemas.
    """

    def __init__(self, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError(
                "image codecs are not available in this container; production "
                "deployments construct the PIL/turbojpeg decoder here and decode "
                "in __call__ over the same (media_ref, payload) schema"
            )
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dims = np.stack([_digest_ints(p or b"", 3, 16, 4096) for p in payloads]) if payloads else np.zeros((0, 3), dtype=np.int64)
        return pa.Table.from_arrays(
            [
                batch["media_ref"],
                pa.array(dims[:, 0] if len(payloads) else [], type=pa.int64()),
                pa.array(dims[:, 1] if len(payloads) else [], type=pa.int64()),
                pa.array((dims[:, 2] % 4 + 1) if len(payloads) else [], type=pa.int64()),
            ],
            names=["media_ref", "width", "height", "n_channels"],
        )


class ImageFeatureStage:
    """binary payload → fixed-size feature vector (list<float>, dim=d).

    Production: a vision encoder loaded once per actor (GPU-placed via
    ``map_batches(..., num_gpus=...)``).  Sandbox: blake2-seeded unit
    vector — deterministic, schema-identical.
    """

    def __init__(self, dim: int = 64, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("vision encoder unavailable in this container")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            seed = int.from_bytes(hashlib.blake2b(p or b"", digest_size=8).digest(), "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim)
            feats.append((v / np.linalg.norm(v)).astype(np.float32))
        return pa.Table.from_arrays(
            [batch["media_ref"], pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))],
            names=["media_ref", "features"],
        )


class FrameSampleStage:
    """video payload → k evenly spaced frame refs (flat_map shape: one
    output row per sampled frame)."""

    def __init__(self, frames: int = 4, backend: str = "fake"):
        if backend == "real":
            raise NotImplementedError("video demuxer unavailable in this container")
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, idxs, ts = [], [], []
        for r, p in zip(batch["media_ref"].to_pylist(), batch["payload"].to_pylist()):
            duration = int(_digest_ints(p or b"", 1, 1000, 600_000)[0])  # ms
            for i in range(self.frames):
                refs.append(r)
                idxs.append(i)
                ts.append(int(duration * i / self.frames))
        return pa.Table.from_arrays(
            [pa.array(refs, type=pa.string()), pa.array(idxs, type=pa.int32()), pa.array(ts, type=pa.int64())],
            names=["media_ref", "frame_idx", "ts_ms"],
        )


def synth_media_table(refs: list[str], kind: str = "image") -> pa.Table:
    """Deterministic fake payloads for media refs (tests/bench)."""
    payloads = [hashlib.blake2b(r.encode(), digest_size=32).digest() * 8 for r in refs]
    return pa.Table.from_arrays(
        [
            pa.array(refs, type=pa.string()),
            pa.array([kind] * len(refs), type=pa.string()),
            pa.array(payloads, type=pa.large_binary()),
        ],
        schema=MEDIA_META_SCHEMA,
    )
