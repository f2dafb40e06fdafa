"""Parquet compaction — the small-files maintenance op (S5/S7 family).

Streaming partitioned writes (state/lineage.py) and incremental runs
leave directories of many small files; at 100 TB the resulting
footer/scheduling overhead dominates reads ("small files problem").
Compaction rewrites a directory into ~target-size files:

1. the driver reads only FILE SIZES (one listdir — no data, no footers);
2. deterministic first-fit-decreasing bin-packing groups files so each
   group's input sums to ≤ ``target_bytes`` (a file already larger than
   the target passes through as its own group);
3. one Ray task per group streams its files into a single zstd parquet
   file, written atomically (tmp + rename) so a crashed compaction
   never leaves a partial file visible.

Every byte moves exactly once, node-local, with NO shuffle — the
deliberate contrast to ``read_parquet().repartition(n).write_parquet``,
which pays an all-to-all exchange for the same result.  Group count,
membership and output names are deterministic (sizes + lexicographic
names), so re-running after a partial failure overwrites the same
outputs instead of duplicating rows.
"""

from __future__ import annotations

import os
from pathlib import Path


def plan_groups(sizes: dict[str, int], target_bytes: int) -> list[list[str]]:
    """First-fit-decreasing bin-pack: file name → group lists.

    Deterministic: files sort by (size desc, name asc); each file lands
    in the first group with room, else opens a new group."""
    groups: list[list[str]] = []
    totals: list[int] = []
    for name in sorted(sizes, key=lambda n: (-sizes[n], n)):
        sz = sizes[name]
        for gi, tot in enumerate(totals):
            if tot + sz <= target_bytes:
                groups[gi].append(name)
                totals[gi] += sz
                break
        else:
            groups.append([name])
            totals.append(sz)
    for g in groups:
        g.sort()  # read order within a group is by name, not size
    return groups


def _compact_group(paths: list[str], out_path: str) -> dict:
    import pyarrow.parquet as pq

    tmp = out_path + ".tmp"
    writer = None
    rows = 0
    try:
        for p in paths:
            f = pq.ParquetFile(p)
            for rg in range(f.num_row_groups):
                t = f.read_row_group(rg)
                if writer is None:
                    writer = pq.ParquetWriter(tmp, t.schema, compression="zstd")
                writer.write_table(t)
                rows += t.num_rows
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, out_path)
    return {"out": os.path.basename(out_path), "files_in": len(paths), "rows": rows}


def compact_parquet(
    in_dir: str | Path,
    out_dir: str | Path,
    *,
    target_bytes: int = 256 * 1024 * 1024,
    prefix: str = "compact",
) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` (non-recursive) into
    ``out_dir/{prefix}-NNNNN.parquet`` files of ~``target_bytes`` input
    each.  Returns {files_in, files_out, rows, groups}."""
    import ray

    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sizes = {
        f: (in_dir / f).stat().st_size
        for f in os.listdir(in_dir)
        if f.endswith(".parquet")
    }
    groups = plan_groups(sizes, target_bytes)

    if ray.is_initialized():
        task = ray.remote(num_cpus=1)(_compact_group)
        results = ray.get(
            [
                task.remote(
                    [str(in_dir / f) for f in g],
                    str(out_dir / f"{prefix}-{gi:05d}.parquet"),
                )
                for gi, g in enumerate(groups)
            ]
        )
    else:  # plain unit tests without a Ray session
        results = [
            _compact_group(
                [str(in_dir / f) for f in g],
                str(out_dir / f"{prefix}-{gi:05d}.parquet"),
            )
            for gi, g in enumerate(groups)
        ]
    return {
        "files_in": len(sizes),
        "files_out": len(results),
        "rows": int(sum(r["rows"] for r in results)),
        "groups": results,
    }
