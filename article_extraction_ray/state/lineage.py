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


def partition_ids(doc_ids: "pa.ChunkedArray | pa.Array | list", num_partitions: int) -> np.ndarray:
    """Vectorized stable partition assignment for an id column — crc32 of
    utf-8 for strings, plain modulo for integer keys (both stable across
    processes and runs)."""
    if isinstance(doc_ids, (pa.ChunkedArray, pa.Array)):
        arr = doc_ids.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(doc_ids)
    if arr.dtype.kind in "iu":
        return (arr.astype(np.int64) % num_partitions).astype(np.int64)
    return (_crc32_vec(arr.astype(object)).astype(np.int64)) % num_partitions


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


def write_table_partitions(
    batch: pa.Table,
    out_dir: str,
    *,
    key: str = "doc_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    done: set[int] | None = None,
    tag: str = "x",
) -> pa.Table:
    """Write ONE Arrow table's rows into the partition layout; returns
    per-partition (part_id, rows, bytes) summary rows.

    Usable directly inside any ``map_batches`` stage (sink fusion: an
    extraction stage can emit files instead of shipping extracted rows
    through the object store to a separate write operator).  File names
    are a pure function of the batch content, so a retried task
    overwrites its own files instead of duplicating rows — idempotent
    writes without a commit coordinator.
    """
    if "part_id" not in batch.column_names:
        batch = add_partition_column(batch, key=key, num_partitions=num_partitions)
        if done:
            mask = ~np.isin(batch["part_id"].to_numpy(), list(done))
            batch = batch.filter(pa.array(mask))
    pids = batch["part_id"].to_numpy()
    keys_digest = zlib.crc32(("\x00".join(map(str, batch[key].to_pylist()))).encode())
    o_pid, o_rows, o_bytes = [], [], []
    for pid in np.unique(pids):
        sub = batch.filter(pa.array(pids == pid)).drop_columns(["part_id"])
        d = Path(out_dir) / f"part_id={pid}"
        d.mkdir(parents=True, exist_ok=True)
        final = d / f"{tag}-{keys_digest:08x}-{sub.num_rows}.parquet"
        tmp_f = d / f".{final.name}.tmp"
        # zstd: ~40% smaller than snappy on text spans — the sink is
        # disk-bandwidth-bound on a single node, and compression CPU
        # parallelizes while disk does not
        pq.write_table(sub, tmp_f, compression="zstd", compression_level=1)
        tmp_f.rename(final)  # atomic within the same dir
        o_pid.append(int(pid))
        o_rows.append(sub.num_rows)
        o_bytes.append(final.stat().st_size)
    return pa.Table.from_arrays(
        [
            pa.array(o_pid, type=pa.int32()),
            pa.array(o_rows, type=pa.int64()),
            pa.array(o_bytes, type=pa.int64()),
        ],
        names=["part_id", "rows", "bytes"],
    )


def write_partition_data(
    ds,
    out_dir: str | Path,
    *,
    key: str = "doc_id",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    done: set[int] | None = None,
    tag: str = "x",
    batch_size: int | None = None,
) -> "pd.DataFrame":
    """Write one phase's data files into the partition layout WITHOUT
    completion manifests (multi-phase jobs call this per phase, then
    :func:`write_manifests` once).  Returns per-batch (part_id, rows,
    bytes) summaries.  Default: one write per upstream block (no rebatch
    boundary, keeps operator fusion)."""
    import pandas as pd  # local: lineage is import-light

    out_str = str(out_dir)
    Path(out_str).mkdir(parents=True, exist_ok=True)
    done = done or set()

    summaries = ds.map_batches(
        lambda t: write_table_partitions(
            t, out_str, key=key, num_partitions=num_partitions, done=done, tag=tag
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).to_pandas()
    if summaries.empty:
        summaries = pd.DataFrame({"part_id": [], "rows": [], "bytes": []})
    return summaries


def write_manifests(
    out_dir: str | Path,
    summaries: "pd.DataFrame",
    wall: float,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    done: set[int] | None = None,
) -> dict:
    """Emit per-partition completion manifests from phase summaries."""
    out = Path(out_dir)
    done = done or set()
    ldir = _lineage_dir(out)
    ldir.mkdir(parents=True, exist_ok=True)
    per_pid = summaries.groupby("part_id")[["rows", "bytes"]].sum() if len(summaries) else None
    total_rows = 0
    total_bytes = 0
    written = []
    for pid in range(num_partitions):
        if pid in done:
            continue
        rows = int(per_pid.loc[pid, "rows"]) if per_pid is not None and pid in per_pid.index else 0
        nbytes = int(per_pid.loc[pid, "bytes"]) if per_pid is not None and pid in per_pid.index else 0
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
    """Single-phase resumable partitioned write with lineage.

    Convenience wrapper over :func:`write_partition_data` +
    :func:`write_manifests` — multi-phase jobs (e.g. the hybrid flagship,
    which writes giants and smalls in separate executions) call those
    directly and finalize manifests once.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if done is None:
        done = set()
        if resume:
            clean_incomplete(out, num_partitions)
            done = done_partitions(out)

    start = time.perf_counter()
    summaries = write_partition_data(
        ds, out, key=key, num_partitions=num_partitions, done=done
    )
    wall = time.perf_counter() - start
    return write_manifests(out, summaries, wall, num_partitions=num_partitions, done=done)
