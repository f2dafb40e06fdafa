"""Mergeable sketches: HyperLogLog, Misra-Gries heavy hitters, Bloom.

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

# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries)
# ---------------------------------------------------------------------------
#
# Misra & Gries, "Finding repeated elements" (Sci. Comput. Program. 1982);
# mergeability per Agarwal et al., "Mergeable summaries" (PODS 2012):
# union-sum two summaries, subtract the (m+1)-th largest count, keep
# positives.  Guarantee after any merge tree over a stream of N items:
# true_count - N/(m+1) <= estimate <= true_count, so every key with
# frequency > N/(m+1) survives.  The summary is <= m (key, count) rows —
# per-batch partials stay tiny and the corpus never shuffles.


def mg_reduce(counts: pd.Series, m: int) -> pd.Series:
    """Cut an exact (or merged) count series down to an MG summary of
    at most ``m`` keys by decrementing the (m+1)-th largest count."""
    if len(counts) <= m:
        return counts[counts > 0]
    vals = np.sort(counts.to_numpy())[::-1]
    out = counts - vals[m]
    return out[out > 0]


def mg_merge(summaries, m: int) -> pd.Series:
    """Associative merge: union-sum, then one reduction."""
    total = pd.concat(list(summaries)).groupby(level=0).sum()
    return mg_reduce(total, m)


def heavy_hitters_mg(ds, m: int, values_of, *, batch_format: str = "pyarrow"):
    """Approximate heavy hitters over ``values_of(batch) -> np.ndarray``.

    Per batch: exact local counts (vectorized value_counts — the batch
    is the combiner), reduced to an m-row MG summary; the driver folds
    the ``num_batches`` summaries with :func:`mg_merge`.  Returns
    ``(summary: pd.Series est counts, total: int)`` — the error bound is
    ``total/(m+1)``.
    """

    def partial(batch) -> pd.DataFrame:
        vals = values_of(batch)
        local = pd.Series(vals).value_counts()  # exact, vectorized
        summ = mg_reduce(local, m)
        if not len(summ) and len(local):
            # degenerate cut (every count tied): a zero-count row still
            # carries the batch total without biasing the merge
            summ = local.iloc[:1] * 0
        total = np.zeros(len(summ), dtype=np.int64)
        if len(total):
            total[0] = len(vals)  # batch total carried once, on row 0
        return pd.DataFrame({"key": summ.index, "cnt": summ.to_numpy(), "total": total})

    parts = ds.map_batches(partial, batch_format=batch_format).to_pandas()
    if not len(parts):
        return pd.Series(dtype=np.int64), 0
    # one union-sum over all partial summaries, then a single reduction —
    # correct (merge is associative) and tighter than pairwise folding
    merged = mg_merge([parts.set_index("key")["cnt"]], m)
    return merged, int(parts["total"].sum())


# ---------------------------------------------------------------------------
# Bloom filter (broadcast membership prefilter)
# ---------------------------------------------------------------------------
#
# Bloom, "Space/time trade-offs in hash coding with allowable errors"
# (CACM 1970); double hashing per Kirsch & Mitzenmacher (ESA 2006):
# idx_i = h1 + i*h2 mod m preserves the FP bound with two base hashes.
# Role at scale: the done-set of a resumable run (or any semi-join small
# side) can outgrow a raw broadcast keyset; the bloom is a fixed ~1.2
# bytes/key bitmap with NO false negatives, so "definitely not done"
# rows stream through with zero shuffle and only the FP-rate-sized
# remainder needs the exact confirm (a semi-join on a tiny stream).


class BloomFilter:
    """Vectorized bloom over arbitrary key arrays (fixed-key siphash)."""

    def __init__(self, n_bits: int, n_hashes: int):
        self.m = int(n_bits)
        self.k = int(n_hashes)
        self.bits = np.zeros(self.m, dtype=bool)

    @classmethod
    def from_keys(cls, keys, fpp: float = 0.01) -> "BloomFilter":
        """Size for a target false-positive rate: m = -n ln p / ln2²."""
        n = max(len(keys), 1)
        m = max(int(np.ceil(-n * np.log(fpp) / (np.log(2) ** 2))), 8)
        k = max(int(round(m / n * np.log(2))), 1)
        bf = cls(m, k)
        bf.add(keys)
        return bf

    def _indices(self, keys) -> np.ndarray:
        h1 = pd.util.hash_array(np.asarray(keys))
        with np.errstate(over="ignore"):
            h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
            steps = np.arange(self.k, dtype=np.uint64)[:, None]
            idx = (h1[None, :] + steps * h2[None, :]) % np.uint64(self.m)
        return idx.astype(np.int64)  # (k, n)

    def add(self, keys) -> None:
        if len(keys):
            self.bits[self._indices(keys).ravel()] = True

    def might_contain(self, keys) -> np.ndarray:
        """Per-key bool: False is definitive, True needs exact confirm."""
        if not len(keys):
            return np.zeros(0, dtype=bool)
        return self.bits[self._indices(keys)].all(axis=0)


# ---------------------------------------------------------------------------
# Count-Min sketch — Cormode & Muthukrishnan, "An improved data stream
# summary: the count-min sketch and its applications" (J. Algorithms 2005).
# The sketch is LINEAR: cms(A ∪ B) = cms(A) + cms(B) elementwise, so
# per-batch partials reduce by a plain sum — the cheapest possible merge
# (no groupby; d×w ints per batch leave the workers).  Estimates are
# one-sided: est ≥ true always; est ≤ true + εN with prob 1−δ for
# w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.  Role at scale: point-frequency lookups
# (token/domain/url counts) over a stream whose distinct-key set is far
# too large to aggregate exactly, complementing Misra-Gries (which keeps
# only the heavy keys and answers "what is heavy", not "how often is X").
# ---------------------------------------------------------------------------

_CMS_SEEDS = np.arange(1, 64, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)


def cms_indices(keys, d: int, w: int) -> np.ndarray:
    """(d, n) column indices for arbitrary key arrays — one base hash
    per row seeded deterministically (layout-independent)."""
    arr = np.asarray(keys)
    out = np.empty((d, len(arr)), dtype=np.int64)
    base = pd.util.hash_array(arr)
    with np.errstate(over="ignore"):
        for r in range(d):
            h = (base ^ _CMS_SEEDS[r]) * np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)  # fold high bits down (murmur3 finalize step)
            out[r] = (h % np.uint64(w)).astype(np.int64)
    return out


def cms_partial(keys, counts: np.ndarray | None = None, *, d: int = 4, w: int = 1 << 12) -> np.ndarray:
    """One batch → a (d, w) int64 sketch (vectorized bincount per row)."""
    sk = np.zeros((d, w), dtype=np.int64)
    if len(keys) == 0:
        return sk
    idx = cms_indices(keys, d, w)
    wts = np.ones(idx.shape[1], dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)
    for r in range(d):
        sk[r] += np.bincount(idx[r], weights=wts, minlength=w).astype(np.int64)
    return sk


def cms_estimate(sketch: np.ndarray, keys) -> np.ndarray:
    """Point-frequency estimates: min over the d rows (one-sided ≥ true)."""
    d, w = sketch.shape
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = cms_indices(keys, d, w)
    return np.min(sketch[np.arange(d)[:, None], idx], axis=0)


def cms_build(ds, values_of, *, d: int = 4, w: int = 1 << 12) -> np.ndarray:
    """Distributed build: every batch emits its (d, w) partial flattened
    to one row; partials reduce by elementwise sum (sketch linearity) —
    a tree-reducible fixed-size aggregate, never a groupby."""
    import pyarrow as pa

    def partial(batch) -> pd.DataFrame:
        keys = values_of(batch)
        sk = cms_partial(keys, d=d, w=w)
        return pd.DataFrame({"sk": [sk.ravel()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = np.zeros(d * w, dtype=np.int64)
    for row in parts["sk"]:
        total += np.asarray(row, dtype=np.int64)
    return total.reshape(d, w)


def cms_join_size(sk_a: np.ndarray, sk_b: np.ndarray) -> int:
    """Join-cardinality estimate from two CM sketches built with the
    SAME (d, w) and hash family: |A ⋈ B| = Σ_k f_A(k)·f_B(k) is
    estimated by min_row ⟨row_a, row_b⟩ — the classic sketch inner
    product.  One-sided (≥ true, collisions only inflate), error
    ≤ ‖f_A‖₁·‖f_B‖₁ / w per row, minimized over the d rows.  Lets the
    optimizer (`tabular.join`) price an exchange from two fixed-size
    (d×w) summaries without touching either table."""
    if sk_a.shape != sk_b.shape:
        raise ValueError(f"sketch shapes differ: {sk_a.shape} vs {sk_b.shape}")
    return int(np.min(np.sum(sk_a * sk_b, axis=1)))


def estimate_join_size(left, right, on: str, *, d: int = 4, w: int = 1 << 14) -> int:
    """Distributed estimate of |left ⋈ right| on an equi key: one
    fixed-size CMS build per side (linear partials, tree reduce), one
    driver inner product.  Never shuffles or joins anything."""
    sa = cms_build(left, lambda b: b[on].to_numpy(zero_copy_only=False), d=d, w=w)
    sb = cms_build(right, lambda b: b[on].to_numpy(zero_copy_only=False), d=d, w=w)
    return cms_join_size(sa, sb)
