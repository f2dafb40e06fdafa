"""Z-order (Morton) data layout — multi-dimensional scan pruning.

``sources/bucketed.py`` co-locates rows by ONE key hash (shuffle-free
joins); sorting co-locates by one key's RANGE.  Neither helps a filter
on two columns at once: a table sorted by ``x`` scatters any ``y``
range across every file.  Z-ordering interleaves the bits of both
columns' scaled values so rows close in (x, y) space land in the same
file, making parquet footer min/max stats tight on BOTH columns — a
2-D box predicate then prunes most files before any data is read (the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Ray-Data shape: per-batch vectorized Morton encode (magic-number bit
spreads, no per-row Python) → range partition on the z-value with
sampled boundaries (same TeraSort trick as ``tabular.sortmerge_join``)
→ one file per z-range via the existing partitioned writer.  Pruning
at read time needs only ``pyarrow.parquet`` footer metadata.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave-ready spread: 16-bit values → even bit positions of 32."""
    v = v.astype(np.uint64)
    v = (v | (v << 8)) & np.uint64(0x00FF00FF)
    v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
    v = (v | (v << 2)) & np.uint64(0x33333333)
    v = (v | (v << 1)) & np.uint64(0x55555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code of two uint16-range arrays (vectorized)."""
    return (_spread_bits16(x) << np.uint64(1)) | _spread_bits16(y)


def zorder_key(
    xs: np.ndarray, ys: np.ndarray, *, x_range: tuple[float, float], y_range: tuple[float, float]
) -> np.ndarray:
    """Scale two numeric columns to 16-bit grid cells (equi-width over
    the given ranges; swap in sampled quantile boundaries for skewed
    columns) and Morton-interleave.  NaNs map to cell 0."""
    def scale(v, lo, hi):
        span = (hi - lo) or 1.0
        cells = np.clip((np.nan_to_num(v, nan=lo) - lo) / span, 0, 1) * 65535.0
        return cells.astype(np.uint64)

    return morton2(scale(xs, *x_range), scale(ys, *y_range))


def write_zordered(
    ds,
    out_dir: str | Path,
    x_col: str,
    y_col: str,
    *,
    num_files: int = 16,
) -> dict:
    """Rewrite ``ds`` as ``num_files`` parquet files clustered by the
    Morton order of (x_col, y_col).

    One tiny min/max aggregate fixes the grid, every batch encodes its
    z-values vectorized, boundaries are z-quantiles of a bounded sample
    and rows shuffle ONCE into their z-range file.  Returns the layout
    summary (files, per-file row counts)."""
    from ray.data.aggregate import Max, Min

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = ds.aggregate(Min(x_col), Max(x_col), Min(y_col), Max(y_col))
    xr = (float(rng[f"min({x_col})"]), float(rng[f"max({x_col})"]))
    yr = (float(rng[f"min({y_col})"]), float(rng[f"max({y_col})"]))

    def add_z(batch: pa.Table) -> pa.Table:
        z = zorder_key(
            batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64),
            batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64),
            x_range=xr,
            y_range=yr,
        )
        return batch.append_column("__z", pa.array(z.astype(np.int64)))

    zds = ds.map_batches(add_z, batch_format="pyarrow")
    # range boundaries from the streamed z distribution (bounded sample)
    sample = zds.select_columns(["__z"]).limit(65536).to_pandas()["__z"].to_numpy()
    qs = np.linspace(0, 1, num_files + 1)[1:-1]
    bounds = np.unique(np.quantile(sample, qs)) if len(sample) else np.array([])

    def add_file(batch: pa.Table) -> pa.Table:
        z = batch["__z"].to_numpy(zero_copy_only=False)
        f = np.searchsorted(bounds, z, side="right").astype(np.int32)
        return batch.append_column("__file", pa.array(f))

    import pyarrow.parquet as pq

    def write_group(df) -> "pa.Table":
        fi = int(df["__file"].iloc[0])
        path = out / f"z-{fi:05d}.parquet"
        tmp = str(path) + ".tmp"
        t = pa.Table.from_pandas(
            df.sort_values("__z").drop(columns=["__file", "__z"]), preserve_index=False
        )
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, str(path))
        return pa.Table.from_arrays(
            [pa.array([fi]), pa.array([len(df)])], names=["file", "rows"]
        )

    summary = (
        zds.map_batches(add_file, batch_format="pyarrow")
        .groupby("__file")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    return {
        "files": int(len(summary)),
        "rows": int(summary["rows"].sum()),
        "x_range": xr,
        "y_range": yr,
    }


def prune_files(dir_path: str | Path, x_col: str, y_col: str,
                x_box: tuple[float, float], y_box: tuple[float, float]) -> list[str]:
    """Footer-stats pruning: the files a 2-D box predicate must read.
    Metadata only — no row is decoded here."""
    import pyarrow.parquet as pq

    keep = []
    for f in sorted(os.listdir(dir_path)):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(dir_path, f)).metadata
        idx = {meta.row_group(0).column(i).path_in_schema: i for i in range(meta.num_columns)}
        overlaps = False
        for rg in range(meta.num_row_groups):
            sx = meta.row_group(rg).column(idx[x_col]).statistics
            sy = meta.row_group(rg).column(idx[y_col]).statistics
            if sx.max >= x_box[0] and sx.min <= x_box[1] and sy.max >= y_box[0] and sy.min <= y_box[1]:
                overlaps = True
                break
        if overlaps:
            keep.append(f)
    return keep
