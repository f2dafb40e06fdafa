"""Incremental ingestion: extract ONLY the corpus shards that arrived
since the last committed snapshot, and publish the result as a new
snapshot version of the extracted table.

This is the continuously-ingesting-corpus shape at 100 TB — a daily
crawl drop adds shards to the corpus directory; re-extracting the whole
corpus would be O(corpus), re-extracting the delta is O(delta).  The
already-ingested input shards are recorded IN the snapshot manifest
(``inputs`` key), so the increment decision needs one manifest read,
never a scan of previous outputs; the new delta's files land under a
private subdirectory and become visible atomically with the
``commit_snapshot`` optimistic-concurrency publish (``os.link``
refuses to clobber a committed version).  Readers time-travel: every
prior version stays readable byte-for-byte after any number of
increments.

Reference parity: the reference re-runs its whole pipeline and relies
on per-table upsert to skip finished work
(/root/reference/tables/table.py — tometadata resume); this module is
the Ray-Data-native equivalent with input-side pruning, which never
re-reads (or re-parses) already-ingested payload bytes at all.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

from ..sources.io import corpus_files, read_corpus
from ..state.snapshots import commit_snapshot, latest_version, read_manifest
from .flagship import CORPUS_COLUMNS, extract_corpus


def ingested_inputs(table_dir: str | os.PathLike) -> set[str]:
    """Basenames of corpus shards already covered by the latest
    snapshot (empty when the table has no snapshots yet)."""
    v = latest_version(table_dir)
    if v is None:
        return set()
    return set(read_manifest(table_dir, v).get("inputs", []))


def ingest_increment(
    corpus_path: str,
    table_dir: str | os.PathLike,
    *,
    mode: str = "hybrid",
    **kwargs,
) -> dict:
    """Extract the not-yet-ingested shards of ``corpus_path`` into a
    new snapshot version of ``table_dir``.

    Returns ``{"version", "new_shards", "rows"}``; when no new shards
    exist the call is a no-op returning the current version with
    ``new_shards == 0`` (idempotent — safe to run on a schedule).
    """
    table_dir = Path(table_dir)
    table_dir.mkdir(parents=True, exist_ok=True)
    shards = corpus_files(corpus_path)
    prev = latest_version(table_dir)
    done: set[str] = set()
    prev_files: list[str] = []
    if prev is not None:
        man = read_manifest(table_dir, prev)
        done = set(man.get("inputs", []))
        prev_files = man["files"]

    new = [s for s in shards if os.path.basename(s) not in done]
    if not new:
        return {"version": prev, "new_shards": 0, "rows": 0}

    # extract ONLY the delta; files land in a private subdir first
    ds = read_corpus(new, columns=CORPUS_COLUMNS)
    extracted = extract_corpus(ds, mode=mode, **kwargs)
    next_v = 0 if prev is None else prev + 1
    subdir = f"delta-v{next_v}-{uuid.uuid4().hex[:8]}"
    extracted.write_parquet(str(table_dir / subdir))

    new_files = sorted(
        os.path.join(subdir, f)
        for f in os.listdir(table_dir / subdir)
        if f.endswith(".parquet")
    )
    # delta row count from parquet footers (no data re-read)
    import pyarrow.parquet as pq

    rows = sum(pq.ParquetFile(table_dir / f).metadata.num_rows for f in new_files)

    version = commit_snapshot(
        table_dir,
        prev_files + new_files,
        op="append",
        rows=rows,
        extra={"inputs": sorted(done | {os.path.basename(s) for s in new})},
    )
    return {"version": version, "new_shards": len(new), "rows": rows}
