"""Per-file Bloom-filter index — point-lookup file pruning.

``sources/zorder.py`` prunes files for RANGE predicates via parquet
footer min/max; a point lookup (``key IN (…)``) over a hash- or
arrival-ordered layout gets nothing from min/max (every file's range
covers every key).  The lakehouse answer is a per-file Bloom sidecar
(Parquet's own optional bloom_filter pages, Delta's deletion-vector
cousins): each data file carries a compact bit array over its key
column, and a lookup reads ONLY the files whose bloom might contain a
probed key — false positives cost one extra file read, false negatives
cannot happen.

Ray-Data shape: one hash co-partition on the key (the same exchange
``sources/bucketed.py`` uses, so the layout composes with bucketed
joins) → each bucket task writes its parquet file AND builds its
in-repo vectorized :class:`~article_extraction_ray.stages.sketch.BloomFilter`
over the keys it just wrote — the bloom is a by-product of the write,
no second read.  Only (file name, bloom bits) sidecar rows return to
the driver; at 100 TB the sidecar is ~1.2 MB per 1M keys per file at
1% fpp, footer-metadata scale, not data scale.

Lookup: load sidecars (driver-side, tiny), vector-probe every bloom
with the whole key batch at once, read only candidate files, then
exact-filter — the Bloom's one-sided error means the exact filter is
a correctness no-op for recall and only trims false positives.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.sketch import BloomFilter

_INDEX_DIR = "_bloom"


def write_bloom_indexed(
    ds,
    out_dir: str | Path,
    key_col: str,
    *,
    num_files: int = 16,
    fpp: float = 0.01,
) -> dict:
    """Hash-partition ``ds`` on ``key_col`` into ``num_files`` parquet
    files, each with a Bloom sidecar over its keys.  Returns
    ``{"files": N, "rows": total}``.  Idempotent per out_dir (rewrites)."""
    import pyarrow.parquet as pq

    out_dir = Path(out_dir)
    (out_dir / _INDEX_DIR).mkdir(parents=True, exist_ok=True)

    def tag(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(batch[key_col].to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_files)).astype(np.int32))
        )

    def write_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["__bucket"].iloc[0])
        df = df.drop(columns=["__bucket"])
        fname = f"part-{b:05d}.parquet"
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), out_dir / fname
        )
        bf = BloomFilter.from_keys(df[key_col].to_numpy(), fpp=fpp)
        np.save(out_dir / _INDEX_DIR / f"{fname}.npy", np.packbits(bf.bits))
        meta = {"file": fname, "m": bf.m, "k": bf.k, "rows": len(df)}
        with open(out_dir / _INDEX_DIR / f"{fname}.json", "w") as f:
            json.dump(meta, f)
        return pd.DataFrame({"file": [fname], "rows": [len(df)]})

    written = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    return {"files": len(written), "rows": int(written["rows"].sum())}


def _load_sidecars(table_dir: str | Path) -> list[tuple[str, BloomFilter]]:
    d = Path(table_dir) / _INDEX_DIR
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(d / name) as f:
            meta = json.load(f)
        bf = BloomFilter(meta["m"], meta["k"])
        packed = np.load(d / f"{meta['file']}.npy")
        bf.bits = np.unpackbits(packed)[: meta["m"]].astype(bool)
        out.append((meta["file"], bf))
    return out


def candidate_files(table_dir: str | Path, keys) -> list[str]:
    """Files whose bloom might contain ANY probed key (vector probe,
    one pass per sidecar).  False negatives impossible."""
    keys = np.asarray(keys)
    return [
        fname
        for fname, bf in _load_sidecars(table_dir)
        if bool(bf.might_contain(keys).any())
    ]


def point_lookup(table_dir: str | Path, key_col: str, keys, *, columns=None) -> pa.Table:
    """Exact rows for ``key_col IN keys`` reading only bloom-candidate
    files.  Returns an Arrow table (empty with NO schema when no file
    is a candidate — callers at that point know the keys are absent)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    keys = np.asarray(keys)
    cand = candidate_files(table_dir, keys)
    if not cand:
        return pa.table({})
    tbl = pq.read_table(
        [str(Path(table_dir) / f) for f in cand], columns=columns
    )
    mask = pc.is_in(tbl[key_col], value_set=pa.array(keys))
    return tbl.filter(mask)
