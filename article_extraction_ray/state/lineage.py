"""Deterministic partitioning + per-partition lineage for checkpoint/resume.

The reference's resume primitive is an anti-join on ids already present
in the destination SQLite table plus per-batch commits
(/root/reference/tables/paper_text_table.py:108-110,133-135;
/root/reference/tables/paper_document_table.py:80-82,113-116).  A Ray
Data engine has no random-access upsert store, so idempotence comes from:

- a **deterministic partition id** ``crc32(doc_id) % P`` (stable across
  processes, unlike Python's salted ``hash``),
- one output directory per partition (``part_id=K/``) written by
  ``write_parquet(partition_cols=["part_id"])``,
- a lineage manifest ``_lineage/part-K.json`` (row count, byte count,
  wall-time share, throughput) written **after** the partition's data —
  a partition is complete iff its manifest exists,
- resume = delete partition dirs lacking manifests (partial writes from
  a crashed run), then filter the input to partitions without manifests
  — a whole-partition anti-join that needs only ``P`` bits of driver
  state no matter how large the corpus is.
"""

from __future__ import annotations

import json
import shutil
import time
import zlib
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_NUM_PARTITIONS = 64

_crc32_vec = np.frompyfunc(lambda s: zlib.crc32(s.encode("utf-8")), 1, 1)


def partition_ids(doc_ids: "pa.ChunkedArray | pa.Array | list[str]", num_partitions: int) -> np.ndarray:
    """Vectorized stable partition assignment for a doc_id column."""
    if isinstance(doc_ids, (pa.ChunkedArray, pa.Array)):
        arr = doc_ids.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(doc_ids, dtype=object)
    return (_crc32_vec(arr).astype(np.int64)) % num_partitions


def add_partition_column(batch: pa.Table, *, key: str = "doc_id", num_partitions: int = DEFAULT_NUM_PARTITIONS) -> pa.Table:
    pids = partition_ids(batch[key], num_partitions)
    return batch.append_column("part_id", pa.array(pids, type=pa.int32()))


def _lineage_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "_lineage"


def done_partitions(out_dir: str | Path) -> set[int]:
    ldir = _lineage_dir(out_dir)
    if not ldir.is_dir():
        return set()
    done = set()
    for f in ldir.glob("part-*.json"):
        try:
            done.add(int(f.stem.split("-", 1)[1]))
        except ValueError:
            continue
    return done


def clean_incomplete(out_dir: str | Path, num_partitions: int | None = None) -> list[int]:
    """Remove data dirs of partitions whose manifest is missing (crashed run)."""
    out = Path(out_dir)
    done = done_partitions(out)
    removed = []
    for d in out.glob("part_id=*"):
        try:
            pid = int(d.name.split("=", 1)[1])
        except ValueError:
            continue
        if pid not in done:
            shutil.rmtree(d)
            removed.append(pid)
    return removed


def prepare_resume(out_dir: str | Path) -> set[int]:
    """Make ``out_dir`` consistent for a (re)run: drop partial partition
    dirs from a crashed run, return the set of completed partition ids.

    Call this BEFORE building the pipeline and filter the *input* on the
    returned set (see :func:`skip_done_batch`) so resumed runs never
    re-extract finished partitions — the reference's anti-join-resume
    semantics (J2) pushed to the read.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    clean_incomplete(out, 0)
    return done_partitions(out)


def skip_done_batch(
    batch: pa.Table,
    done: set[int],
    *,
    key: str = "doc_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> pa.Table:
    """Append ``part_id`` and drop rows of already-completed partitions."""
    t = add_partition_column(batch, key=key, num_partitions=num_partitions)
    if done:
        mask = ~np.isin(t["part_id"].to_numpy(), list(done))
        t = t.filter(pa.array(mask))
    return t


def write_partitioned(
    ds,
    out_dir: str | Path,
    *,
    key: str = "doc_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    resume: bool = True,
    done: set[int] | None = None,
    has_part_id: bool = False,
) -> dict:
    """Write a Dataset as resumable partitioned parquet with lineage.

    ``has_part_id=True`` means the Dataset already carries a ``part_id``
    column (e.g. input-side resume via :func:`skip_done_batch` with no
    intervening stage that drops it); otherwise partition assignment
    happens here (deterministic on ``key``, so it agrees with any
    input-side filter).  Returns a summary dict {partitions_written,
    partitions_skipped, rows, bytes, wall_sec, rows_per_sec}.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if done is None:
        done = set()
        if resume:
            clean_incomplete(out, num_partitions)
            done = done_partitions(out)

    start = time.perf_counter()

    if not has_part_id:
        ds = ds.map_batches(
            lambda t: skip_done_batch(t, done, key=key, num_partitions=num_partitions),
            batch_format="pyarrow",
        )
    ds.write_parquet(str(out), partition_cols=["part_id"])
    wall = time.perf_counter() - start

    # Footer-only scan of the freshly written partitions → lineage manifests.
    ldir = _lineage_dir(out)
    ldir.mkdir(exist_ok=True)
    total_rows = 0
    total_bytes = 0
    written = []
    for d in sorted(out.glob("part_id=*")):
        pid = int(d.name.split("=", 1)[1])
        if pid in done:
            continue
        rows = 0
        nbytes = 0
        for f in d.glob("*.parquet"):
            meta = pq.ParquetFile(f).metadata
            rows += meta.num_rows
            nbytes += f.stat().st_size
        manifest = {
            "partition": pid,
            "rows": rows,
            "bytes": nbytes,
            "wall_sec_job": round(wall, 4),
            "rows_per_sec_job": round((rows / wall) if wall > 0 else 0.0, 2),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = ldir / f".part-{pid}.json.tmp"
        tmp.write_text(json.dumps(manifest))
        tmp.rename(ldir / f"part-{pid}.json")  # atomic completion marker
        total_rows += rows
        total_bytes += nbytes
        written.append(pid)

    return {
        "partitions_written": len(written),
        "partitions_skipped": len(done),
        "rows": total_rows,
        "bytes": total_bytes,
        "wall_sec": round(wall, 4),
        "rows_per_sec": round((total_rows / wall) if wall > 0 else 0.0, 2),
    }
