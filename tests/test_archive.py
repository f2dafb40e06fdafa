"""S3/S9 driver utilities: archive fetch+extract and project dump.

Reference semantics: /root/reference/tables/other/utils.py:10-46 (zip
download atomic publish; extraction drops __MACOSX and a single shared
top-level dir) and /root/reference/convert.py:4-43 (START/END-marker
concatenation, substring excludes, non-UTF-8 note lines).
"""

import io
import zipfile
from pathlib import Path

import pytest

from article_extraction_ray.sources.archive import (
    dump_project,
    extract_archive,
    fetch_archive,
)


def _make_zip(path: Path, entries: dict[str, bytes]) -> Path:
    with zipfile.ZipFile(path, "w") as zf:
        for name, payload in entries.items():
            zf.writestr(name, payload)
    return path


class TestFetchArchive:
    def test_atomic_download_via_injected_opener(self, tmp_path):
        src = tmp_path / "remote.bin"
        src.write_bytes(b"corpus-zip-bytes")
        dest = tmp_path / "dl" / "corpus.zip"
        got = fetch_archive(
            "http://example.invalid/corpus.zip",
            dest,
            opener=lambda url: io.BytesIO(src.read_bytes()),
        )
        assert got == dest and dest.read_bytes() == b"corpus-zip-bytes"
        assert not list(dest.parent.glob("*.tmp"))  # tmp cleaned up

    def test_overwrites_previous_file(self, tmp_path):
        dest = tmp_path / "corpus.zip"
        dest.write_bytes(b"old")
        fetch_archive("u", dest, opener=lambda url: io.BytesIO(b"new"))
        assert dest.read_bytes() == b"new"

    def test_failed_download_leaves_no_partial(self, tmp_path):
        dest = tmp_path / "corpus.zip"
        dest.write_bytes(b"old")

        def boom(url):
            raise OSError("connection reset")

        with pytest.raises(OSError):
            fetch_archive("u", dest, opener=boom)
        assert dest.read_bytes() == b"old"  # previous file intact
        assert not list(tmp_path.glob("*.tmp"))


class TestExtractArchive:
    def test_drops_single_shared_top_level_and_macosx(self, tmp_path):
        z = _make_zip(
            tmp_path / "a.zip",
            {
                "pkg-1.0/data/hardware.csv": b"h",
                "pkg-1.0/README": b"r",
                "__MACOSX/pkg-1.0/._junk": b"x",
            },
        )
        out = tmp_path / "out"
        n = extract_archive(z, out)
        assert n == 2
        assert (out / "data" / "hardware.csv").read_bytes() == b"h"
        assert (out / "README").read_bytes() == b"r"
        assert not (out / "__MACOSX").exists() and not (out / "pkg-1.0").exists()

    def test_keeps_levels_when_tops_differ(self, tmp_path):
        z = _make_zip(tmp_path / "a.zip", {"a/x.txt": b"1", "b/y.txt": b"2"})
        out = tmp_path / "out"
        assert extract_archive(z, out) == 2
        assert (out / "a" / "x.txt").exists() and (out / "b" / "y.txt").exists()

    def test_replaces_existing_destination(self, tmp_path):
        out = tmp_path / "out"
        out.mkdir()
        (out / "stale.txt").write_text("stale")
        z = _make_zip(tmp_path / "a.zip", {"top/f.txt": b"new"})
        extract_archive(z, out)
        assert not (out / "stale.txt").exists() and (out / "f.txt").exists()

    def test_empty_archive_yields_empty_dir(self, tmp_path):
        z = _make_zip(tmp_path / "a.zip", {"__MACOSX/only": b"x"})
        out = tmp_path / "out"
        assert extract_archive(z, out) == 0
        assert out.is_dir() and not list(out.iterdir())

    def test_zip_slip_rejected(self, tmp_path):
        z = _make_zip(tmp_path / "a.zip", {"top/../../escape.txt": b"evil"})
        with pytest.raises(ValueError, match="escapes"):
            extract_archive(z, tmp_path / "out")
        assert not (tmp_path / "escape.txt").exists()


class TestDumpProject:
    def test_markers_excludes_and_decode_note(self, tmp_path):
        root = tmp_path / "proj"
        (root / "src").mkdir(parents=True)
        (root / "src" / "a.py").write_text("print('a')\n")
        (root / "src" / "b.pyc").write_bytes(b"\x00\x01")
        (root / "notes.txt").write_text("hello")
        (root / "bad.txt").write_bytes(b"\xff\xfe\x00bad")  # not UTF-8
        out = tmp_path / "dump.txt"
        total, copied = dump_project(root, out, exclude=[".pyc"])
        assert (total, copied) == (3, 2)  # bad.txt counted, not copied
        text = out.read_text()
        assert f"--- START FILE: {root}/src/a.py ---" in text
        assert f"--- END FILE: {root}/notes.txt ---" in text
        assert "not saved with UTF-8" in text and "b.pyc" not in text
        # deterministic ordering: sorted paths => bad.txt before notes.txt
        assert text.index("bad.txt") < text.index("notes.txt")
