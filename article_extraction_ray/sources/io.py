"""Corpus I/O: Lance in production, Parquet drop-in for the sandbox.

The reference persists documents as binary blobs in SQLite
(/root/reference/tables/paper_document_table.py:22-34); this engine
reads/writes columnar tables instead.  ``read_corpus`` dispatches on the
path: a ``.lance`` dataset uses ``ray.data.read_lance`` (the documented
production path per BASELINE.json input_hint), anything else is read as
Parquet with the identical schema.  ``pylance`` is not installed in this
sandbox, so tests exercise the Parquet branch only.
"""

from __future__ import annotations

import os


def read_corpus(path: str, *, columns: list[str] | None = None):
    """Lazy Dataset over an interleaved-documents table (DOCUMENT_SCHEMA)."""
    import ray.data as rd

    if str(path).rstrip("/").endswith(".lance"):
        try:
            return rd.read_lance(path, columns=columns)
        except ImportError as exc:  # pragma: no cover - no pylance in sandbox
            raise RuntimeError(
                "reading .lance requires the pylance package; re-materialize the "
                "corpus as parquet or install pylance"
            ) from exc
    return rd.read_parquet(path, columns=columns)


def corpus_files(path: str) -> list[str]:
    """Parquet shard files of a corpus directory (deterministic order)."""
    entries = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    if not entries:
        raise FileNotFoundError(f"no parquet shards under {path}")
    return entries
