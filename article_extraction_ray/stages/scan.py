"""Distributed ordered prefix scan and sequence packing.

Concatenation packing — stream every group's token counts in key
order, cut fixed-``budget`` sequences across document boundaries — is
how training corpora become fixed-length sample streams.  The core is
a classic two-pass parallel prefix sum, expressed in Ray Data:

1. **Partial pass**: each batch emits per-(range-bucket, group) token
   sums — a tiny aggregate (``n_buckets × n_groups`` rows total)
   folded on the driver, where buckets are ORDER-ALIGNED ranges of the
   order key (``key * n_buckets // (max+1)``), so "everything in an
   earlier bucket precedes everything in a later one" holds by
   construction, independent of Ray's block layout.
2. **Offset pass**: the driver's exclusive per-group running totals
   over bucket order broadcast via ``ray.put``; a ``groupby(bucket)``
   brings each range into one task, which sorts locally and adds its
   bucket offset to a local exclusive cumsum.

Only the coarse bucket groupby shuffles; per-bucket work is a
vectorized pandas cumsum.  ``n_buckets`` scales with the corpus (a
bucket must fit one task), the driver state is ``buckets × groups``
integers — independent of row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast


def grouped_prefix_sum(
    ds,
    *,
    order_col: str,
    group_col: str,
    value_col: str,
    out_col: str = "cum_before",
    n_buckets: int = 64,
    max_order: int | None = None,
):
    """Append the per-group EXCLUSIVE running sum of ``value_col`` in
    ``order_col`` order (SQL: ``SUM(v) OVER (PARTITION BY g ORDER BY o
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)``, null→0).

    ``max_order`` (the key's max, e.g. from parquet footer stats) sizes
    the range buckets; when omitted it costs one extra aggregate pass.
    ``order_col`` must be unique within each group.
    """
    if max_order is None:
        max_order = int(ds.max(order_col))
    span = max_order + 1

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return np.minimum(ids.astype(np.int64) * n_buckets // span, n_buckets - 1)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch[order_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"__bucket": bucket_of(ids), group_col: batch[group_col].to_numpy(zero_copy_only=False), "v": vals}
        )
        return df.groupby(["__bucket", group_col], as_index=False)["v"].sum()

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    totals = parts.groupby(["__bucket", group_col], as_index=False)["v"].sum()
    totals = totals.sort_values(["__bucket"])
    totals["off"] = totals.groupby(group_col)["v"].cumsum() - totals["v"]
    offsets = totals[["__bucket", group_col, "off"]]
    handle = Broadcast(offsets)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[order_col].to_numpy(zero_copy_only=False)
        return batch.append_column("__bucket", pa.array(bucket_of(ids)))

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = handle.get()
        df = df.sort_values(order_col).reset_index(drop=True)
        local = df.groupby(group_col)[value_col].cumsum() - df[value_col]
        base = df[["__bucket", group_col]].merge(off, on=["__bucket", group_col], how="left")
        df[out_col] = (local + base["off"].fillna(0)).astype(np.int64)
        return df.drop(columns="__bucket")

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(scan_bucket, batch_format="pandas")
    )


def pack_sequences(
    ds,
    budget: int,
    *,
    order_col: str = "doc_id",
    group_col: str = "source",
    tokens_col: str = "n_tok",
    n_buckets: int = 64,
    max_order: int | None = None,
):
    """Concatenation packing: per group, documents stream in key order
    into back-to-back ``budget``-token sequences (documents may span a
    boundary — GPT-style packing).  Adds ``cum_before`` (tokens before
    this doc in its group's stream), ``seq_id`` (sequence the doc
    STARTS in) and ``seq_offset`` (position within it).
    """
    scanned = grouped_prefix_sum(
        ds,
        order_col=order_col,
        group_col=group_col,
        value_col=tokens_col,
        n_buckets=n_buckets,
        max_order=max_order,
    )

    def place(batch: pa.Table) -> pa.Table:
        cum = batch["cum_before"].to_numpy(zero_copy_only=False)
        batch = batch.append_column("seq_id", pa.array(cum // budget))
        return batch.append_column("seq_offset", pa.array(cum % budget))

    return scanned.map_batches(place, batch_format="pyarrow")
