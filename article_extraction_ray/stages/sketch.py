"""Mergeable cardinality sketches (HyperLogLog).

Scale shape: every batch folds into a fixed-size register array
(2**p bytes), map_batches emits ONE sketch row per batch, and the
merge is an elementwise max over those tiny rows — the corpus never
shuffles, only kilobyte sketches do.  That makes distinct-count a
metadata-sized reduction at any input size, the standard trade
(±~1.04/sqrt(2**p) relative error) a 100 TB pipeline wants for
"how many unique users/URLs/shingles" questions.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — public algorithm;
implementation is vectorized numpy over pd.util.hash_array's fixed-key
siphash (deterministic across workers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partial(values: np.ndarray, p: int = 14) -> np.ndarray:
    """Fold a value array into a fresh 2**p-register HLL (uint8)."""
    m = 1 << p
    h = pd.util.hash_array(np.asarray(values))  # uint64, fixed key
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rho = 1 + count of leading zeros in the remaining 64-p bits;
    # the OR above plants a sentinel bit so rho is capped correctly
    bitlen = np.zeros(len(rest), dtype=np.uint8)
    nz = rest != 0
    # floor(log2) via float conversion is exact for the leading bit
    bitlen[nz] = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.uint8) + 1
    rho = (np.uint8(64) - bitlen + np.uint8(1)).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(sketches) -> np.ndarray:
    """Elementwise max of register arrays (associative, commutative)."""
    out = None
    for s in sketches:
        a = np.asarray(s, dtype=np.uint8)
        out = a.copy() if out is None else np.maximum(out, a)
    if out is None:
        raise ValueError("no sketches to merge")
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Raw HLL estimate with the small-range (linear counting) fix."""
    regs = np.asarray(regs, dtype=np.float64)
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, column: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT column) over a Dataset.

    One sketch row per input batch leaves the workers; the driver merge
    touches ``num_batches * 2**p`` bytes, never the data.  For a
    grouped variant, emit (group, sketch) rows and merge per group with
    the same ``hll_merge`` inside ``groupby().map_groups``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column].to_numpy(zero_copy_only=False)
        regs = hll_partial(col, p=p)
        return pa.table({"sketch": pa.array([regs.tobytes()], type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = hll_merge([np.frombuffer(r["sketch"], dtype=np.uint8) for r in rows])
    return hll_estimate(merged)


def hll_distinct_grouped(ds, group_col: str, value_col: str, p: int = 12):
    """Approximate COUNT(DISTINCT value) per group.

    Per batch, every present group folds its values into its own
    register array (one row per group per batch — the partial-combine
    shape), then ONE groupby merges each group's sketches with
    elementwise max and estimates.  Shuffle volume is
    O(groups × batches × 2**p) bytes and the values themselves never
    shuffle.  Returns Dataset(group, n_distinct_est).
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            out.append((g, hll_partial(sub[value_col].to_numpy(), p=p).tobytes()))
        return pd.DataFrame(out, columns=[group_col, "sketch"])

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        regs = hll_merge([np.frombuffer(s, dtype=np.uint8) for s in df["sketch"]])
        return pd.DataFrame(
            {group_col: [df[group_col].iloc[0]],
             "n_distinct_est": [hll_estimate(regs)]}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pandas")
    )
