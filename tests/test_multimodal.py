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


class TestRealCodecs:
    def test_bmp_roundtrip_exact(self):
        import numpy as np

        from article_extraction_ray.stages.multimodal import decode_bmp, make_bmp

        px = bytes(range(256))
        for w, h in [(1, 1), (3, 2), (7, 5), (32, 17)]:
            payload = make_bmp(w, h, px)
            W, H, C, mean = decode_bmp(payload)
            assert (W, H, C) == (w, h, 3)
            # recompute the expected mean from the same fill rule
            row_raw = w * 3
            need = row_raw * h
            src = px * (need // len(px) + 1)
            rows = [src[r * row_raw : (r + 1) * row_raw] for r in range(h)]
            want = np.frombuffer(b"".join(rows), dtype=np.uint8).mean()
            assert abs(mean - want) < 1e-12

    def test_bmp_rejects_non_bmp(self):
        import pytest as _pytest

        from article_extraction_ray.stages.multimodal import decode_bmp

        with _pytest.raises(ValueError):
            decode_bmp(b"PNGnotabmp")

    def test_wav_roundtrip_exact(self):
        import numpy as np

        from article_extraction_ray.stages.multimodal import decode_wav, make_wav

        rng = np.random.default_rng(5)
        samples = rng.integers(-3000, 3000, 777).astype(np.int16)
        payload = make_wav(16000, samples)
        nch, rate, n, dur, rms = decode_wav(payload)
        assert (nch, rate, n, dur) == (1, 16000, 777, 777 * 1000 // 16000)
        x = samples.astype(np.float64)
        assert abs(rms - float(np.sqrt(np.mean(x * x)))) < 1e-9

    def test_audio_stage_actor_pool(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from article_extraction_ray.stages.multimodal import (
            AudioDecodeStage,
            make_wav,
        )

        refs = [f"a{i}" for i in range(20)]
        payloads = [
            make_wav(8000 + 1000 * (i % 4), np.arange(100 + i, dtype=np.int16))
            for i in range(20)
        ]
        tab = pa.table(
            {
                "media_ref": pa.array(refs),
                "media_kind": pa.array(["audio"] * 20),
                "payload": pa.array(payloads, type=pa.large_binary()),
            }
        )
        out = (
            rd.from_arrow(tab)
            .map_batches(
                AudioDecodeStage,
                fn_constructor_args=("wav",),
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .to_pandas()
            .sort_values("media_ref")
        )
        assert len(out) == 20
        assert set(out["sample_rate"]) == {8000, 9000, 10000, 11000}
        assert out.loc[out["media_ref"] == "a0", "n_samples"].item() == 100


class TestPpmCodec:
    def test_round_trip(self):
        import numpy as np

        from article_extraction_ray.stages.multimodal import decode_ppm, make_ppm

        w, h = 7, 5
        px = bytes(range(w * h * 3))
        payload = make_ppm(w, h, px)
        gw, gh, gc, mean = decode_ppm(payload)
        assert (gw, gh, gc) == (w, h, 3)
        assert abs(mean - np.frombuffer(px, dtype=np.uint8).mean()) < 1e-9

    def test_header_with_comments_and_whitespace(self):
        from article_extraction_ray.stages.multimodal import decode_ppm

        body = bytes(2 * 3 * 3)
        payload = b"P6\n# a comment\n  2\t3\n# another\n255\n" + body
        assert decode_ppm(payload)[:3] == (2, 3, 3)

    def test_rejects_non_p6(self):
        import pytest

        from article_extraction_ray.stages.multimodal import decode_ppm

        with pytest.raises(ValueError):
            decode_ppm(b"P5\n2 2\n255\n" + bytes(4))

    def test_raster_delimiter_variants(self):
        """Comment after maxval and \\r\\n delimiters must not skew the
        raster offset (ADVICE r3: a bare pos+=1 mis-offsets these while
        dims stay right, silently corrupting mean_pixel)."""
        import numpy as np

        from article_extraction_ray.stages.multimodal import decode_ppm

        body = bytes(range(2 * 2 * 3))
        want = float(np.frombuffer(body, dtype=np.uint8).mean())
        for header in (
            b"P6\n2 2\n255\n",  # spec form
            b"P6\n2 2\n255 # trailing comment\n",  # comment after maxval
            b"P6\n2 2\n255\r\n",  # CRLF delimiter
            b"P6\n2 2\n255# tight comment\n",  # comment abuts maxval
        ):
            w, h, c, mean = decode_ppm(header + body)
            assert (w, h, c) == (2, 2, 3), header
            assert abs(mean - want) < 1e-9, header

    def test_raster_first_byte_may_be_whitespace_or_hash(self):
        """Raster bytes that LOOK like whitespace/'#' must survive: only
        the single delimiter is consumed, never raster content."""
        from article_extraction_ray.stages.multimodal import decode_ppm

        for first in (b"#", b" ", b"\n"):
            body = first + bytes(2 * 2 * 3 - 1)
            w, h, c, mean = decode_ppm(b"P6\n2 2\n255\n" + body)
            assert (w, h, c) == (2, 2, 3)
            assert abs(mean - first[0] / 12.0) < 1e-9


class TestMediaProbe:
    """Header-only probing of compressed containers (PNG/GIF) and the
    magic-byte router across all five supported formats."""

    def test_png_roundtrip(self):
        from article_extraction_ray.stages.multimodal import make_png, probe_png

        assert probe_png(make_png(640, 480)) == (640, 480, 8, 2)
        assert probe_png(make_png(1, 1, 16, 6)) == (1, 1, 16, 6)

    def test_png_crc_corruption_detected(self):
        from article_extraction_ray.stages.multimodal import make_png, probe_png

        bad = bytearray(make_png(10, 10))
        bad[20] ^= 0xFF  # flip a bit inside the IHDR body
        try:
            probe_png(bytes(bad))
        except ValueError as exc:
            assert "CRC" in str(exc)
        else:
            raise AssertionError("corrupt IHDR accepted")

    def test_png_bad_signature_rejected(self):
        from article_extraction_ray.stages.multimodal import probe_png

        try:
            probe_png(b"\x89PNX\r\n\x1a\n" + bytes(32))
        except ValueError as exc:
            assert "signature" in str(exc)
        else:
            raise AssertionError("bad signature accepted")

    def test_gif_roundtrip_both_versions_and_gct_sizes(self):
        from article_extraction_ray.stages.multimodal import make_gif, probe_gif

        assert probe_gif(make_gif(320, 200, 16)) == (320, 200, 16, "89a")
        assert probe_gif(make_gif(12, 7, 256, b"87a")) == (12, 7, 256, "87a")
        assert probe_gif(make_gif(1, 1, 2)) == (1, 1, 2, "89a")

    def test_probe_media_routes_all_formats(self):
        import numpy as np

        from article_extraction_ray.stages.multimodal import (
            make_bmp,
            make_gif,
            make_png,
            make_ppm,
            make_wav,
            probe_media,
        )

        assert probe_media(make_png(9, 5)) == ("png", 9, 5, 8)
        assert probe_media(make_gif(3, 4, 8)) == ("gif", 3, 4, 8)
        assert probe_media(make_bmp(6, 2, b"xy")) == ("bmp", 6, 2, 24)
        assert probe_media(make_ppm(2, 3, b"z")) == ("ppm", 2, 3, 256)
        wav = make_wav(11000, np.zeros(4, dtype=np.int16), 2)
        assert probe_media(wav) == ("wav", 2, 11000, 16)

    def test_probe_stage_isolates_errors(self, ray_session):
        import pyarrow as pa

        from article_extraction_ray.stages.multimodal import MediaProbeStage, make_png

        batch = pa.Table.from_arrays(
            [
                pa.array(["a", "b"], type=pa.string()),
                pa.array(["media", "media"], type=pa.string()),
                pa.array([make_png(4, 4), b"\x00garbage"], type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )
        out = MediaProbeStage()(batch).to_pydict()
        assert out["format"] == ["png", "error"]
        assert out["width"] == [4, 0]

    def test_tiff_roundtrip_both_endians(self):
        from article_extraction_ray.stages.multimodal import make_tiff, probe_tiff

        assert probe_tiff(make_tiff(800, 600)) == (800, 600, "II")
        assert probe_tiff(make_tiff(31, 17, big_endian=True)) == (31, 17, "MM")

    def test_tiff_rejects_bad_magic(self):
        from article_extraction_ray.stages.multimodal import make_tiff, probe_tiff

        bad = bytearray(make_tiff(4, 4))
        bad[2] = 41  # wrong magic
        try:
            probe_tiff(bytes(bad))
        except ValueError as exc:
            assert "magic" in str(exc)
        else:
            raise AssertionError("bad TIFF magic accepted")

    def test_mp3_roundtrip_and_frame_length(self):
        from article_extraction_ray.stages.multimodal import make_mp3_frame, probe_mp3

        for kbps, rate in [(128, 44100), (320, 32000), (32, 48000)]:
            frame = make_mp3_frame(kbps, rate)
            assert probe_mp3(frame) == (kbps, rate)
            assert len(frame) == 144 * kbps * 1000 // rate  # spec frame size

    def test_mp3_rejects_free_bitrate(self):
        from article_extraction_ray.stages.multimodal import probe_mp3

        try:
            probe_mp3(bytes([0xFF, 0xFB, 0x00, 0x00]))  # bitrate index 0 = free
        except ValueError:
            pass
        else:
            raise AssertionError("free-bitrate frame accepted")

    def test_probe_media_routes_tiff_and_mp3(self):
        from article_extraction_ray.stages.multimodal import (
            make_mp3_frame,
            make_tiff,
            probe_media,
        )

        assert probe_media(make_tiff(9, 5, big_endian=True)) == ("tiff", 9, 5, 0)
        assert probe_media(make_mp3_frame(192, 48000)) == ("mp3", 192, 48000, 3)
