"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference stores fetched documents as opaque blobs with a type tag
(/root/reference/tables/paper_document_table.py:22-34) and never decodes
media.  This engine treats media as first-class: decode / feature
extraction / resize / frame sampling are actor-pool ``map_batches``
stages over ``large_binary`` payload columns.

The heavyweight codec libraries (PIL/ffmpeg/librosa) are NOT in this
container, so those backends are gated: ``backend="real"`` raises
``NotImplementedError`` with the production wiring documented, and
``backend="fake"`` derives deterministic pseudo-decodes from the payload
bytes (blake2 digest → stable shapes and features).  Two REAL decoders
need only the stdlib and run end-to-end here: ``backend="bmp"``
(uncompressed BITMAPINFOHEADER parse + numpy pixel stats) and
:class:`AudioDecodeStage` ``backend="wav"`` (RIFF/PCM via the stdlib
``wave`` module + numpy RMS) — both oracle-verified round-trip
(`media_decode_bmp` / `media_decode_wav`).  All the Ray-side plumbing —
schema, batch size, actor signature, zero-copy binary handling, output
layout — is identical across backends.
"""

from __future__ import annotations

import hashlib
import struct

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


def make_bmp(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Encode a 24-bit uncompressed BMP (BITMAPINFOHEADER).  Pixel data
    is ``pixel_bytes`` repeated/truncated to fill width×height×3 with
    rows padded to 4 bytes — a real, spec-conformant file."""
    row_raw = width * 3
    pad = (-row_raw) % 4
    need = row_raw * height
    src = (pixel_bytes or b"\x00") * (need // max(len(pixel_bytes), 1) + 1)
    body = bytearray()
    for r in range(height):
        body += src[r * row_raw : (r + 1) * row_raw]
        body += b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a 24-bit uncompressed BMP → (width, height, n_channels,
    mean_pixel).  Stdlib struct + numpy only — a REAL decoder."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_off
    ).reshape(height, row_stride)[:, : width * 3]
    return width, height, 3, float(rows.mean()) if rows.size else 0.0


class ImageDecodeStage:
    """Actor-pool stage: binary image payloads → (width, height, n_channels).

    ``backend="bmp"`` and ``backend="ppm"`` are REAL stdlib decoders
    (see :func:`decode_bmp` / :func:`decode_ppm` — BMP header walk,
    Netpbm P6 tokenizer); ``backend="real"`` (PIL/turbojpeg for
    compressed formats) is gated in this container; ``backend="fake"``
    derives deterministic dimensions from the bytes so downstream
    stages exercise identical schemas.
    """

    def __init__(self, backend: str = "fake"):
        self._pil = None
        if backend == "real":
            # the production seam: PIL loaded ONCE PER ACTOR; activates the
            # day the container ships it (pytest -m real exercises this)
            try:
                from PIL import Image as _pil_image
            except ImportError as exc:
                raise NotImplementedError(
                    "compressed-image codecs are not available in this container "
                    "(pip install pillow to activate backend='real'; "
                    "backend='bmp' is a real in-container decoder)"
                ) from exc
            self._pil = _pil_image
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.backend == "real":
            import io

            dims = []
            for p in payloads:
                with self._pil.open(io.BytesIO(p)) as im:
                    dims.append((im.width, im.height, len(im.getbands())))
            dims = np.array(dims, dtype=np.int64) if dims else np.zeros((0, 3), dtype=np.int64)
            w, h, c = (dims[:, i] for i in range(3))
        elif self.backend in ("bmp", "ppm"):
            dec = decode_bmp if self.backend == "bmp" else decode_ppm
            dims = (
                np.array([dec(p)[:3] for p in payloads], dtype=np.int64)
                if payloads
                else np.zeros((0, 3), dtype=np.int64)
            )
            w, h, c = (dims[:, i] for i in range(3))
        else:
            dims = np.stack([_digest_ints(p or b"", 3, 16, 4096) for p in payloads]) if payloads else np.zeros((0, 3), dtype=np.int64)
            w, h, c = dims[:, 0], dims[:, 1], dims[:, 2] % 4 + 1
        return pa.Table.from_arrays(
            [
                batch["media_ref"],
                pa.array(w, type=pa.int64()),
                pa.array(h, type=pa.int64()),
                pa.array(c, type=pa.int64()),
            ],
            names=["media_ref", "width", "height", "n_channels"],
        )


class ImageFeatureStage:
    """binary payload → fixed-size feature vector (list<float>, dim=d).

    Production: a vision encoder loaded once per actor (GPU-placed via
    ``map_batches(..., num_gpus=...)``).  Sandbox: blake2-seeded unit
    vector — deterministic, schema-identical.
    """

    def __init__(self, dim: int = 64, backend: str = "fake", encoder=None):
        # ``encoder`` is the production seam: any callable
        # ``list[bytes] -> (n, dim) float array`` (a vision model's
        # preprocess+forward), constructed once per actor by the caller.
        self._encoder = encoder
        if backend == "real" and encoder is None:
            raise NotImplementedError(
                "vision encoder unavailable in this container; production "
                "passes encoder=<callable bytes->features> (built once per "
                "actor) — pytest -m real exercises the seam when torch exists"
            )
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._encoder is not None:
            mat = np.asarray(self._encoder(batch["payload"].to_pylist()), dtype=np.float32)
            return pa.Table.from_arrays(
                [
                    batch["media_ref"],
                    pa.array([r.tolist() for r in mat], type=pa.list_(pa.float32())),
                ],
                names=["media_ref", "features"],
            )
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
            # activates the day the container ships PyAV (pytest -m real)
            try:
                import av  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "video demuxer unavailable in this container "
                    "(pip install av to activate backend='real')"
                ) from exc
        self.backend = backend
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


def make_ppm(width: int, height: int, pixel_bytes: bytes) -> bytes:
    """Encode a binary Netpbm P6 (PPM) image: ASCII header
    ``P6\\n<w> <h>\\n255\\n`` + raw interleaved RGB rows (no padding) —
    a real, spec-conformant file."""
    need = width * height * 3
    src = (pixel_bytes or b"\x00") * (need // max(len(pixel_bytes), 1) + 1)
    return f"P6\n{width} {height}\n255\n".encode("ascii") + src[:need]


def decode_ppm(payload: bytes) -> tuple[int, int, int, float]:
    """Parse a binary P6 PPM → (width, height, n_channels, mean_pixel).
    Real header tokenizer (arbitrary whitespace + ``#`` comments per the
    Netpbm spec) + numpy pixel view — stdlib only."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while (
                end < len(payload)
                and not payload[end : end + 1].isspace()
                and payload[end : end + 1] != b"#"
            ):
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    # Raster delimiter: the spec allows comments after the maxval token,
    # and exactly ONE whitespace char then starts the raster.  A bare
    # pos += 1 mis-offsets headers like ``255 #c\n`` or ``255\r\n`` and
    # silently skews mean_pixel (dims stay right, so value oracles on
    # dims alone can't catch it).  Skip comment lines first — whitespace
    # directly preceding a '#' still belongs to the header — then
    # consume the single delimiter (a comment's terminating newline
    # already served as it; a \r\n pair is tolerated as one delimiter).
    comment_nl_was_delim = False
    while pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
            comment_nl_was_delim = True
        elif c in b" \t\r" and payload[pos + 1 : pos + 2] == b"#":
            # non-newline whitespace preceding a '#' is header-internal;
            # a newline always ends the header (it IS the delimiter, so
            # a raster whose first byte is '#' is never eaten)
            pos += 1
            comment_nl_was_delim = False
        else:
            break
    if not comment_nl_was_delim:
        if payload[pos : pos + 2] == b"\r\n":
            pos += 2
        elif payload[pos : pos + 1].isspace():
            pos += 1
        else:
            raise ValueError("malformed P6 header: missing raster delimiter")
    px = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=pos)
    return width, height, 3, float(px.mean()) if px.size else 0.0


def make_wav(sample_rate: int, samples: np.ndarray, n_channels: int = 1) -> bytes:
    """Encode 16-bit PCM WAV via the stdlib ``wave`` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, int, float]:
    """Parse RIFF/PCM WAV → (n_channels, sample_rate, n_samples,
    duration_ms, rms).  Stdlib ``wave`` + numpy — a REAL decoder."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
        raw = w.readframes(n)
    x = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
    return nch, rate, n, n * 1000 // rate, rms


class AudioDecodeStage:
    """Actor-pool stage: binary audio payloads → (n_channels,
    sample_rate, n_samples, duration_ms, rms).

    ``backend="wav"`` is a REAL stdlib decoder (see :func:`decode_wav`);
    ``backend="real"`` (librosa/ffmpeg for compressed audio) is gated in
    this container; ``backend="fake"`` derives deterministic values."""

    def __init__(self, backend: str = "wav"):
        self._sf = None
        if backend == "real":
            # activates the day the container ships libsndfile (pytest -m real)
            try:
                import soundfile as _sf
            except ImportError as exc:
                raise NotImplementedError(
                    "compressed-audio codecs are not available in this container "
                    "(pip install soundfile to activate backend='real'; "
                    "backend='wav' is a real in-container decoder)"
                ) from exc
            self._sf = _sf
        self.backend = backend

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.backend == "real":
            import io

            rows = []
            for p in payloads:
                x, rate = self._sf.read(io.BytesIO(p), dtype="float64", always_2d=True)
                n, nch = x.shape
                rms = float(np.sqrt(np.mean(x * x))) if x.size else 0.0
                rows.append((nch, rate, n, n * 1000 // rate, rms))
        elif self.backend == "wav":
            rows = [decode_wav(p) for p in payloads]
        else:
            rows = [
                (1, int(_digest_ints(p or b"", 1, 8000, 48000)[0]), 0, 0, 0.0)
                for p in payloads
            ]
        nch = [r[0] for r in rows]
        rate = [r[1] for r in rows]
        n = [r[2] for r in rows]
        dur = [r[3] for r in rows]
        rms = [r[4] for r in rows]
        return pa.Table.from_arrays(
            [
                batch["media_ref"],
                pa.array(nch, type=pa.int64()),
                pa.array(rate, type=pa.int64()),
                pa.array(n, type=pa.int64()),
                pa.array(dur, type=pa.int64()),
                pa.array(rms, type=pa.float64()),
            ],
            names=["media_ref", "n_channels", "sample_rate", "n_samples", "duration_ms", "rms"],
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


# ---------------------------------------------------------------------------
# Header probing for COMPRESSED formats (ffprobe-style, no decompression)
# ---------------------------------------------------------------------------
#
# Full pixel decode of JPEG/PNG/GIF needs codec libraries this container
# lacks (gated backend="real" above) — but the METADATA a pipeline
# routes on (dims, bit depth, palette size) lives in plain headers the
# stdlib can parse.  A 100-TB media pipeline runs exactly this probe
# stage first: route/bucket by (format, dims, depth) without paying a
# single decompression, then decode only the selected subset.


def make_png(width: int, height: int, bit_depth: int = 8, color_type: int = 2) -> bytes:
    """A structurally valid PNG: signature + IHDR (with real CRC32) +
    one opaque IDAT chunk + IEND.  The IDAT bytes are NOT a valid
    zlib stream (we never inflate them) — the header walk is what is
    under test, exactly like ffprobe on a truncated file."""
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    idat = hashlib.blake2b(ihdr, digest_size=16).digest()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def probe_png(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from the IHDR chunk,
    verifying the signature, chunk layout and IHDR CRC — a corrupt or
    mis-typed file raises instead of emitting garbage metadata."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    (length,) = struct.unpack(">I", payload[8:12])
    if payload[12:16] != b"IHDR" or length != 13:
        raise ValueError("PNG first chunk is not a 13-byte IHDR")
    body = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
    return int(width), int(height), int(bit_depth), int(color_type)


def make_gif(width: int, height: int, n_colors: int = 16, version: bytes = b"89a") -> bytes:
    """A structurally valid GIF header: signature + logical screen
    descriptor + global color table + trailer (no image data blocks —
    the probe never reads past the GCT)."""
    import math

    gct_bits = max(1, math.ceil(math.log2(max(n_colors, 2))))
    packed = 0x80 | ((gct_bits - 1) & 0x07)  # GCT flag + size field
    lsd = struct.pack("<HHBBB", width, height, packed, 0, 0)
    gct = bytes((i * 7) % 256 for i in range(3 * (2**gct_bits)))
    return b"GIF" + version + lsd + gct + b"\x3b"


def probe_gif(payload: bytes) -> tuple[int, int, int, str]:
    """(width, height, gct_colors, version) from the logical screen
    descriptor; gct_colors is 0 when no global color table is present."""
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (bad signature)")
    version = payload[3:6].decode()
    width, height, packed = struct.unpack("<HHB", payload[6:11])
    gct = 2 ** ((packed & 0x07) + 1) if packed & 0x80 else 0
    return int(width), int(height), int(gct), version


#: magic-byte router used by MediaProbeStage
_MAGIC_PROBES = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"RIFF", "wav"),
    (b"II\x2a\x00", "tiff"),
    (b"MM\x00\x2a", "tiff"),
    (b"\xff", "mp3"),  # frame sync; probe_mp3 validates the full sync
)


def probe_media(payload: bytes) -> tuple[str, int, int, int]:
    """(format, width, height, depth) for any supported container,
    routed on magic bytes.  depth = bit depth (png), GCT colors (gif),
    bits-per-pixel (bmp), maxval+1 (ppm), bits-per-sample (wav);
    for wav, (width, height) = (n_channels, sample_rate); for tiff,
    depth = 0 (bit depth lives outside the minimal IFD); for mp3,
    (width, height, depth) = (bitrate_kbps, sample_rate, 3 = layer) —
    the probe emits the routing-relevant axes of each container."""
    fmt = next((name for magic, name in _MAGIC_PROBES if payload[: len(magic)] == magic), None)
    if fmt == "png":
        w, h, bits, _ctype = probe_png(payload)
        return "png", w, h, bits
    if fmt == "gif":
        w, h, gct, _v = probe_gif(payload)
        return "gif", w, h, gct
    if fmt == "bmp":
        w, h, _nch, _mean = decode_bmp(payload)
        return "bmp", w, h, 24
    if fmt == "ppm":
        w, h, _nch, _mean = decode_ppm(payload)
        return "ppm", w, h, 256
    if fmt == "wav":
        nch, rate, _n, _dur, _rms = decode_wav(payload)
        return "wav", nch, rate, 16
    if fmt == "tiff":
        w, h, _order = probe_tiff(payload)
        return "tiff", w, h, 0
    if fmt == "mp3":
        kbps, rate = probe_mp3(payload)
        return "mp3", kbps, rate, 3
    raise ValueError(f"unrecognized media payload (first bytes {payload[:8]!r})")


class MediaProbeStage:
    """Actor-pool stage: opaque binary payloads → (format, width,
    height, depth) via header-only parsing — the routing/bucketing
    front of a multimodal pipeline (decode-nothing, classify-everything).
    Unrecognized or corrupt payloads land in format='error' rather than
    poisoning the batch (per-row error isolation, same policy as the
    fetch stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["payload"].to_pylist():
            try:
                rows.append(probe_media(p))
            except (ValueError, struct.error, IndexError):
                rows.append(("error", 0, 0, 0))
        return pa.Table.from_arrays(
            [
                batch["media_ref"],
                pa.array([r[0] for r in rows], type=pa.string()),
                pa.array([r[1] for r in rows], type=pa.int64()),
                pa.array([r[2] for r in rows], type=pa.int64()),
                pa.array([r[3] for r in rows], type=pa.int64()),
            ],
            names=["media_ref", "format", "width", "height", "depth"],
        )


def make_tiff(width: int, height: int, big_endian: bool = False) -> bytes:
    """A structurally valid single-IFD TIFF: header (II/MM + magic 42),
    one IFD with ImageWidth(256)/ImageLength(257) SHORT entries and a
    zero next-IFD offset.  No strip data — header-walk under test."""
    e = ">" if big_endian else "<"
    hdr = (b"MM" if big_endian else b"II") + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
    entries = [
        struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "H", width) + b"\x00\x00",
        struct.pack(e + "HHI", 257, 3, 1) + struct.pack(e + "H", height) + b"\x00\x00",
    ]
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries) + struct.pack(e + "I", 0)
    return hdr + ifd


def probe_tiff(payload: bytes) -> tuple[int, int, str]:
    """(width, height, byte_order) from the first IFD's tag-256/257
    entries, honoring the header's declared endianness."""
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (bad byte-order mark)")
    (magic,) = struct.unpack(e + "H", payload[2:4])
    if magic != 42:
        raise ValueError("not a TIFF payload (bad magic)")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    (n_entries,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    width = height = None
    for i in range(n_entries):
        ent = payload[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        tag, typ, cnt = struct.unpack(e + "HHI", ent[:8])
        if tag in (256, 257) and cnt == 1:
            val = struct.unpack(e + "H", ent[8:10])[0] if typ == 3 else struct.unpack(e + "I", ent[8:12])[0]
            if tag == 256:
                width = val
            else:
                height = val
    if width is None or height is None:
        raise ValueError("TIFF IFD lacks ImageWidth/ImageLength")
    return int(width), int(height), "MM" if e == ">" else "II"


#: MPEG-1 Layer III bitrate (kbps) and sample-rate tables, per the spec
_MP3_BITRATES = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_RATES = (44100, 48000, 32000)


def make_mp3_frame(bitrate_kbps: int, sample_rate: int) -> bytes:
    """One spec-conformant MPEG-1 Layer III frame header + zero audio
    bytes sized to the frame formula 144·bitrate/rate."""
    bidx = _MP3_BITRATES.index(bitrate_kbps)
    ridx = _MP3_RATES.index(sample_rate)
    b0 = 0xFF
    b1 = 0xFB  # MPEG-1, Layer III, no CRC
    b2 = (bidx << 4) | (ridx << 2)
    b3 = 0x00
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    return bytes([b0, b1, b2, b3]) + b"\x00" * (frame_len - 4)


def probe_mp3(payload: bytes) -> tuple[int, int]:
    """(bitrate_kbps, sample_rate) from the first frame header."""
    if len(payload) < 4 or payload[0] != 0xFF or (payload[1] & 0xE0) != 0xE0:
        raise ValueError("not an MP3 payload (no frame sync)")
    if (payload[1] & 0x18) != 0x18 or (payload[1] & 0x06) != 0x02:
        raise ValueError("unsupported MPEG version/layer")
    bidx = (payload[2] >> 4) & 0x0F
    ridx = (payload[2] >> 2) & 0x03
    if bidx in (0, 15) or ridx == 3:
        raise ValueError("free/bad bitrate or reserved sample rate")
    return _MP3_BITRATES[bidx], _MP3_RATES[ridx]
