"""Copy-on-write row deletion over a snapshot-versioned table — the
right-to-be-forgotten path (GDPR erasure, takedown compliance) every
long-lived corpus needs.

Iceberg-style COW delete with file pruning: only files whose parquet
footer statistics can contain a target key are rewritten; untouched
files CARRY OVER BY REFERENCE into the new snapshot (no copy, no read).
The rewrite itself is a distributed Ray Data filter→write over just the
candidate files; the new version commits atomically through the
optimistic-concurrency snapshot log, so readers either see the old
version or the new one, never a half-delete — and time travel keeps
prior versions readable until ``expire_versions`` reclaims them (the
actual erasure point, which the caller controls).
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa


def delete_rows(
    table_dir: str | os.PathLike,
    column: str,
    values,
    *,
    version: int | None = None,
) -> dict:
    """Delete all rows whose ``column`` value is in ``values`` from the
    latest (or given) snapshot; commit the result as a new version.

    Returns ``{"version", "files_rewritten", "files_carried",
    "rows_deleted"}``.  A no-match delete still commits (an auditable
    erasure record) but rewrites nothing."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from .snapshots import commit_snapshot, latest_version, read_manifest

    table_dir = Path(table_dir)
    v = latest_version(table_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots under {table_dir}")
    man = read_manifest(table_dir, v)

    vals = np.asarray(sorted(set(int(x) for x in values)), dtype=np.int64)
    lo, hi = (int(vals.min()), int(vals.max())) if len(vals) else (0, -1)

    # footer-stat pruning: a file can hold a target key only if its
    # [min, max] range intersects the target range AND some target value
    # falls inside it (binary search, no data read)
    touch: list[str] = []
    carry: list[str] = []
    for f in man["files"]:
        meta = pq.ParquetFile(table_dir / f).metadata
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        if column not in names or len(vals) == 0:
            carry.append(f)
            continue
        ci = names.index(column)
        fmin = min(meta.row_group(g).column(ci).statistics.min for g in range(meta.num_row_groups))
        fmax = max(meta.row_group(g).column(ci).statistics.max for g in range(meta.num_row_groups))
        fmin, fmax = int(fmin), int(fmax)
        if fmax < lo or fmin > hi:
            carry.append(f)
            continue
        i = np.searchsorted(vals, fmin, side="left")
        if i < len(vals) and vals[i] <= fmax:
            touch.append(f)
        else:
            carry.append(f)

    rows_deleted = 0
    new_files: list[str] = []
    if touch:
        before = sum(
            pq.ParquetFile(table_dir / f).metadata.num_rows for f in touch
        )
        subdir = f"delete-v{v + 1}-{uuid.uuid4().hex[:8]}"
        ds = rd.read_parquet([str(table_dir / f) for f in touch])
        kept = ds.map_batches(_drop_matching(column, vals), batch_format="pyarrow")
        kept.write_parquet(str(table_dir / subdir))
        new_files = sorted(
            os.path.join(subdir, f)
            for f in os.listdir(table_dir / subdir)
            if f.endswith(".parquet")
        )
        after = sum(
            pq.ParquetFile(table_dir / f).metadata.num_rows for f in new_files
        )
        rows_deleted = before - after

    version_out = commit_snapshot(
        table_dir,
        carry + new_files,
        op="delete",
        rows=None,
        extra={"deleted_rows": rows_deleted, "delete_column": column,
               "delete_count": int(len(vals))},
    )
    return {
        "version": version_out,
        "files_rewritten": len(touch),
        "files_carried": len(carry),
        "rows_deleted": rows_deleted,
    }


def _drop_matching(column: str, vals: np.ndarray):
    """Batch filter dropping rows whose column value is in vals
    (vectorized pc.is_in against a broadcast-safe captured array)."""
    import pyarrow.compute as pc

    value_set = pa.array(vals, type=pa.int64())

    def drop(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[column].cast(pa.int64()), value_set=value_set)
        return batch.filter(pc.invert(mask))

    return drop
