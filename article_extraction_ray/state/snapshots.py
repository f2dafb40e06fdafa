"""Iceberg-lite snapshot log: versioned, time-travelable table states.

A *snapshot table* is a directory of immutable parquet data files plus a
`_snapshots/` log.  Each committed version is one JSON manifest
(`v{N}.json`) listing the data files that ARE the table at that version,
with the parent version and the operation that produced it.  Data files
are never mutated or deleted by a commit — an append adds files, a
compaction REPLACES the membership list while the old files stay on disk
— so any historical version remains readable (time travel) until a
retention sweep removes unreferenced files.

Commit protocol: write a private tmp manifest, then publish it with
EXCLUSIVE semantics — `os.link(tmp, v{N}.json)` fails with EEXIST if
another committer won version N, in which case the commit retries at
N+1 (optimistic concurrency, the same rename-fail-if-exists rule
Iceberg's HadoopTableOperations uses).  A racing pair of committers
therefore serializes into versions N and N+1 instead of one silently
overwriting the other.  (Reference parity: the reference's
upsert/resume sinks at `tables/paper_information_table.py` keep one
mutable state; the snapshot log is the at-scale replacement that makes
every historical state immutable and addressable).

At 100 TB the manifest lists file paths + row counts only (bytes per
file, not per row); a million-file table is a ~100 MB JSON log readable
by the driver — the same order as Iceberg's avro manifests.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

_SNAP_RE = re.compile(r"^v(\d+)\.json$")


def _log_dir(table_dir: str | Path) -> Path:
    return Path(table_dir) / "_snapshots"


def versions(table_dir: str | Path) -> list[int]:
    """Committed versions, ascending.  Ignores in-flight .tmp files."""
    d = _log_dir(table_dir)
    if not d.is_dir():
        return []
    out = []
    for name in os.listdir(d):
        m = _SNAP_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(table_dir: str | Path) -> int | None:
    vs = versions(table_dir)
    return vs[-1] if vs else None


def read_manifest(table_dir: str | Path, version: int) -> dict:
    with open(_log_dir(table_dir) / f"v{version}.json") as f:
        return json.load(f)


def commit_snapshot(
    table_dir: str | Path,
    files: list[str],
    *,
    op: str,
    rows: int | None = None,
    extra: dict | None = None,
) -> int:
    """Commit a new version whose membership is exactly ``files``
    (paths relative to ``table_dir``).  Returns the version number.

    Appends compose: pass ``snapshot_files(dir) + new_files``.
    Replacements (compaction, dedup rewrite) pass the new list alone.
    """
    table_dir = Path(table_dir)
    d = _log_dir(table_dir)
    d.mkdir(parents=True, exist_ok=True)
    for f in files:
        if not (table_dir / f).exists():
            raise FileNotFoundError(f"snapshot member missing on disk: {f}")
    # optimistic-concurrency publish: os.link refuses to overwrite an
    # existing v{N}.json (EEXIST), so a racing committer can never
    # silently clobber a committed version — it retries at N+1
    import uuid

    tmp = d / f".commit-{os.getpid()}-{uuid.uuid4().hex}.tmp"
    try:
        for _ in range(64):
            prev = latest_version(table_dir)
            version = 0 if prev is None else prev + 1
            manifest = {
                **(extra or {}),  # caller metadata; reserved keys below win
                "version": version,
                "parent": prev,
                "op": op,
                "files": sorted(files),
                "rows": rows,
            }
            tmp.write_text(json.dumps(manifest, indent=1))
            try:
                os.link(tmp, d / f"v{version}.json")
            except FileExistsError:
                continue  # lost the race for this version; retry at N+1
            return version
        raise RuntimeError(
            f"commit_snapshot: could not claim a version under {d} "
            "after 64 attempts (livelock or stale v*.json files)"
        )
    finally:
        tmp.unlink(missing_ok=True)


def snapshot_files(table_dir: str | Path, version: int | None = None) -> list[str]:
    """Absolute paths of the data files that form ``version`` (default:
    latest).  Raises if the table has no committed snapshot."""
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshots committed under {table_dir}")
    man = read_manifest(table_dir, version)
    return [str(Path(table_dir) / f) for f in man["files"]]


def read_snapshot(table_dir: str | Path, version: int | None = None, *, columns=None):
    """Time-travel read: a ``ray.data.Dataset`` over exactly the files
    of ``version`` — no listing races, no partially-written files
    (only committed manifests are visible), no interference from files
    added by later versions."""
    import ray.data

    return ray.data.read_parquet(snapshot_files(table_dir, version), columns=columns)


def expire_versions(table_dir: str | Path, keep_latest: int = 1) -> dict:
    """Retention sweep: drop all but the newest ``keep_latest`` version
    manifests and delete data files no surviving version references.
    Returns {"versions_dropped": [...], "files_deleted": [...]}."""
    table_dir = Path(table_dir)
    vs = versions(table_dir)
    keep = set(vs[-keep_latest:]) if keep_latest > 0 else set()
    live: set[str] = set()
    for v in keep:
        live.update(read_manifest(table_dir, v)["files"])
    dropped, deleted = [], []
    for v in vs:
        if v in keep:
            continue
        for f in read_manifest(table_dir, v)["files"]:
            if f not in live and (table_dir / f).exists():
                (table_dir / f).unlink()
                deleted.append(f)
        (_log_dir(table_dir) / f"v{v}.json").unlink()
        dropped.append(v)
    return {"versions_dropped": dropped, "files_deleted": sorted(set(deleted))}
