"""Driver-side corpus-setup utilities: archive fetch + extract (SURVEY
§2a S3) and the project-dump concatenator (S9).

These are the reference's two dev/setup tools
(`/root/reference/tables/other/utils.py:10-46` — zip download with an
atomic tmp-then-rename publish, extraction that drops a single shared
top-level directory and `__MACOSX` junk; `/root/reference/convert.py:4-43`
— walk a tree, exclude by substring, concatenate files between
START/END markers).  They run on the driver before any Dataset exists,
so they are plain functions, not pipeline stages.  Semantics are
re-derived from the cited lines, with two hardenings the reference
lacks: a zip-slip guard (an entry may not escape the destination) and
deterministic file ordering in the dump.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile
from pathlib import Path

_UA = "Mozilla/5.0 (X11; Linux x86_64)"


def fetch_archive(url: str, destination: str | Path, *, opener=None) -> Path:
    """Download ``url`` to ``destination`` atomically (private tmp file
    in the same directory, then ``os.replace``), overwriting any
    previous file.  ``opener`` is an injectable ``url -> file-like``
    (tests pass a local opener; the default builds a stdlib request
    with a browser User-Agent, matching the reference's fetch)."""
    destination = Path(destination)
    destination.parent.mkdir(parents=True, exist_ok=True)
    if opener is None:
        from urllib.request import Request, urlopen

        def opener(u):  # pragma: no cover - no network in sandbox
            return urlopen(Request(u, headers={"User-Agent": _UA}))

    fd, tmp = tempfile.mkstemp(dir=str(destination.parent), suffix=".tmp")
    try:
        with opener(url) as src, os.fdopen(fd, "wb") as dst:
            shutil.copyfileobj(src, dst)
        os.replace(tmp, destination)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return destination


def extract_archive(archive: str | Path, destination: str | Path) -> int:
    """Extract a zip into ``destination`` (replacing it), dropping
    ``__MACOSX`` entries and — when every real file shares one
    top-level directory — that directory level, so the payload lands
    directly under ``destination``.  Returns the number of files
    written.  Raises on an entry that would escape ``destination``
    (zip-slip)."""
    destination = Path(destination)
    if destination.exists():
        shutil.rmtree(destination)
    destination.mkdir(parents=True, exist_ok=True)

    with zipfile.ZipFile(archive) as zf:
        files = [
            i
            for i in zf.infolist()
            if not i.is_dir() and Path(i.filename).parts and Path(i.filename).parts[0] != "__MACOSX"
        ]
        if not files:
            return 0
        shared_top = len({Path(i.filename).parts[0] for i in files}) == 1
        written = 0
        root = destination.resolve()
        for info in files:
            parts = Path(info.filename).parts
            if shared_top and len(parts) > 1:
                parts = parts[1:]
            target = destination.joinpath(*parts)
            if not target.resolve().is_relative_to(root):
                raise ValueError(f"zip entry escapes destination: {info.filename}")
            target.parent.mkdir(parents=True, exist_ok=True)
            with zf.open(info) as src, target.open("wb") as dst:
                shutil.copyfileobj(src, dst)
            written += 1
    return written


def dump_project(
    root: str | Path,
    out_path: str | Path,
    *,
    exclude: list[str] | None = None,
) -> tuple[int, int]:
    """Concatenate every file under ``root`` (skipping paths containing
    any ``exclude`` substring) into one text file with
    ``--- START FILE: p ---`` / ``--- END FILE: p ---`` markers; a file
    that is not valid UTF-8 contributes its path plus an error note
    instead of content.  Returns ``(total_candidates, files_copied)``.
    Files are processed in sorted path order (deterministic, unlike the
    reference's os.walk order)."""
    root = Path(root)
    exclude = exclude if exclude is not None else []
    paths = sorted(
        str(p)
        for p in root.rglob("*")
        if p.is_file() and not any(ex in str(p) for ex in exclude)
    )
    copied = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for p in paths:
            try:
                with open(p, encoding="utf-8") as f:
                    content = f.read()
            except UnicodeDecodeError:
                out.write(f"{p}\nFailed to decode the file, as it is not saved with UTF-8 encoding.\n")
                continue
            out.write(f"--- START FILE: {p} ---\n{content}\n--- END FILE: {p} ---\n")
            copied += 1
    return len(paths), copied
