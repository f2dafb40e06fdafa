"""Mergeable quantile sketch (t-digest) for continuous domains.

The exact-histogram trick behind ``q_token_quantiles`` works because
token counts are small ints; a DOUBLE column (prices, scores, latency)
has unbounded distinct values, so the scale form of "p50/p99 over
100 TB" is a t-digest: every batch folds into a few hundred
(mean, weight) centroids, only those centroids shuffle or reach the
driver, and merges are associative — the same partial-combine shape as
the HLL sketches in :mod:`stages.sketch`.

Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests" (arXiv:1902.04023) — public algorithm.  This is the
bucketed MergingDigest variant: sorted values are assigned to clusters
by the arcsine scale function k(q) = δ·(asin(2q−1)/π + ½), which gives
≤ δ+1 centroids with cluster width ∝ √(q(1−q)) — fine near the tails,
coarse in the middle — and the whole compression is one argsort +
``np.add.reduceat`` (no per-value Python).

Accuracy is property-tested (rank error ≤ 1% at δ=200 on mixed
distributions) rather than SQL-oracled: a sketch is approximate by
construction, like ``hll_distinct``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_DEFAULT_DELTA = 200


def _k_scale(q: np.ndarray, delta: int) -> np.ndarray:
    """Arcsine scale function: k(0)=0, k(1)=delta, steepest at the tails."""
    return delta * (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / np.pi + 0.5)


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (means, weights) into ≤ delta+1 centroids, vectorized.

    Each centroid is assigned the cluster index floor(k(q_mid)) of its
    midpoint rank; same-cluster runs collapse to their weighted mean via
    reduceat.  Equal means always land in adjacent clusters, so the
    output stays sorted.
    """
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = w.sum()
    cw = np.cumsum(w)
    q_mid = (cw - w / 2.0) / total
    cluster = np.floor(_k_scale(q_mid, delta)).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]])
    w_out = np.add.reduceat(w, starts)
    m_out = np.add.reduceat(m * w, starts) / w_out
    return m_out, w_out


def tdigest_partial(values: np.ndarray, delta: int = _DEFAULT_DELTA) -> bytes:
    """Fold a value array into a serialized digest (float64 pairs).

    Layout: n float64 means followed by n float64 weights — fixed,
    endian-stable within a job, and a few KB regardless of input size.
    NaNs are dropped (SQL aggregate semantics).
    """
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    m, w = _compress(v, np.ones(len(v), dtype=np.float64), delta)
    return np.concatenate([m, w]).tobytes()


def tdigest_merge(digests, delta: int = _DEFAULT_DELTA) -> bytes:
    """Associative merge: concatenate centroids, re-compress once."""
    ms, ws = [], []
    for d in digests:
        arr = np.frombuffer(d, dtype=np.float64)
        n = len(arr) // 2
        ms.append(arr[:n])
        ws.append(arr[n:])
    if not ms:
        raise ValueError("no digests to merge")
    m, w = _compress(np.concatenate(ms), np.concatenate(ws), delta)
    return np.concatenate([m, w]).tobytes()


def tdigest_quantile(digest: bytes, q) -> np.ndarray:
    """Quantile estimate(s) by linear interpolation between centroid
    midpoints (each centroid sits at the midpoint of its weight span)."""
    arr = np.frombuffer(digest, dtype=np.float64)
    n = len(arr) // 2
    m, w = arr[:n], arr[n:]
    qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
    if n == 0:
        return np.full(len(qs), np.nan)
    total = w.sum()
    cw = np.cumsum(w)
    mid = (cw - w / 2.0) / total
    out = np.interp(qs, mid, m)
    # exact ends: below the first midpoint / above the last, clamp to
    # the observed extremes carried by the edge centroids
    return out


def tdigest_column(ds, column: str, *, delta: int = _DEFAULT_DELTA) -> bytes:
    """Digest of a whole Dataset column: one centroid-set row per batch
    leaves the workers; the driver merge touches O(batches × delta)
    floats, never the data."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column].to_numpy(zero_copy_only=False)
        return pa.table({"digest": pa.array([tdigest_partial(col, delta)], type=pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return tdigest_merge([r["digest"] for r in rows], delta)


def tdigest_grouped(ds, group_col: str, value_col: str, quantiles,
                    *, delta: int = _DEFAULT_DELTA):
    """Per-group quantile estimates: (group, digest) partial rows per
    batch, one groupby merges each group's digests — values never
    shuffle, the same shape as ``hll_distinct_grouped``.

    Returns Dataset(group, q_<xx>... one column per requested quantile).
    """
    qs = [float(x) for x in quantiles]
    cols = [f"q_{int(round(x * 100)):02d}" for x in qs]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            out.append((g, tdigest_partial(sub[value_col].to_numpy(), delta)))
        return pd.DataFrame(out, columns=[group_col, "digest"])

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        merged = tdigest_merge(list(df["digest"]), delta)
        est = tdigest_quantile(merged, qs)
        row = {group_col: [df[group_col].iloc[0]]}
        for c, v in zip(cols, est):
            row[c] = [float(v)]
        return pd.DataFrame(row)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(finalize, batch_format="pandas")
    )
