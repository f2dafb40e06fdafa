"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact dedupe (G2,
/root/reference/tables/hardware_table.py:78) this module adds the
standard near-dup family, each expressed Ray-Data-first:

- **Exact**: content-hash partial dedupe per batch + groupby-min
  (``pipelines.tabular.dedup_exact_min``).
- **MinHash + LSH**: word-shingle → k-permutation minhash signature
  (vectorized numpy) → banding → ``groupby(band_id, band_hash)`` →
  per-bucket candidate pairs with estimated Jaccard → global pair
  dedupe.  The only shuffle moves (band, hash, doc_id, signature) rows —
  never document text.
- **SimHash**: 64-bit token-hash majority fingerprint per doc; near-dups
  = pairs within Hamming distance d, bucketed by the 4-way band trick.
- **n-gram Jaccard**: exact shingle-set Jaccard verification for
  candidate pairs (the "verify" stage after LSH).
- **Embedding cosine**: near-dup pairs above a cosine threshold via
  blocked matmul against a broadcast normalized matrix (small side) —
  for corpora where both sides are huge, LSH-bucket first (see
  stages.similarity).

All hashing is deterministic (no Python ``hash``): crc32/blake2 based.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# 2^31-1: keeps a*x+b < 2^62, exact in uint64 (a 61-bit prime would
# overflow the vectorized product and silently wrap)
_MERSENNE = (1 << 31) - 1
_DEFAULT_K = 64
_DEFAULT_BANDS = 16


def _rng_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def word_shingles(text: str, n: int = 3) -> list[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Deterministic uint64 hashes of the distinct word n-shingles."""
    uniq = set(word_shingles(text, n))
    if not uniq:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little") for s in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )


def minhash_signature(text: str, *, k: int = _DEFAULT_K, n: int = 3, seed: int = 7) -> np.ndarray:
    """k-permutation minhash over word n-shingles; empty text → all-max."""
    a, b = _rng_params(k, seed)
    hashes = shingle_hashes(text, n)
    if hashes.size == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (k, m) universal-hash grid; modular math in uint64 is exact because
    # values stay < 2^63 after the mod.
    grid = (a[:, None] * (hashes[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return grid.min(axis=1)


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa, sb = set(word_shingles(text_a, n)), set(word_shingles(text_b, n))
    if not sa and not sb:
        return 1.0
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0


def _band_hash(sig_slice: np.ndarray) -> int:
    return zlib.crc32(sig_slice.tobytes()) & 0x7FFFFFFF


class MinHashStage:
    """Actor-pool batch fn: doc rows → LSH band rows.

    Emits one compact row per (doc, band): (doc_id, band_id, band_hash).
    Signatures are NOT carried through the shuffle — only 24-byte band
    keys move; candidate pairs are verified afterwards with exact
    Jaccard, so the shuffle volume is independent of signature width.
    Permutation parameters are built once per actor (``__init__``).
    """

    def __init__(self, *, k: int = _DEFAULT_K, bands: int = _DEFAULT_BANDS, n: int = 3, seed: int = 7,
                 id_col: str = "doc_id", text_col: str = "text"):
        if k % bands:
            raise ValueError("k must be divisible by bands")
        self.k, self.bands, self.n, self.seed = k, bands, n, seed
        self.rows_per_band = k // bands
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        o_id, o_band, o_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(text or "", k=self.k, n=self.n, seed=self.seed)
            for band in range(self.bands):
                sl = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                o_id.append(doc_id)
                o_band.append(band)
                o_hash.append(_band_hash(sl))
        return pa.Table.from_arrays(
            [
                pa.array(o_id),
                pa.array(o_band, type=pa.int32()),
                pa.array(o_hash, type=pa.int64()),
            ],
            names=["doc_id", "band_id", "band_hash"],
        )


_N_SHUFFLE_BUCKETS = 256


def _bucket_pair_gen(group: pd.DataFrame) -> pd.DataFrame:
    """Pair generation for one coarse shuffle bucket: vectorized pandas
    groupby over the (band_id, band_hash) keys inside the bucket.

    Coarse bucketing turns millions of tiny Ray groups into
    ``_N_SHUFFLE_BUCKETS`` map_groups invocations — the per-group
    scheduling overhead dominates otherwise.
    """
    frames = []
    for _, g in group.groupby(["band_id", "band_hash"], sort=False):
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) > 1:
            ia, ib = np.triu_indices(len(ids), 1)
            frames.append(pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]}))
    if not frames:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
    return pd.concat(frames, ignore_index=True)


def minhash_candidates(ds, *, k: int = _DEFAULT_K, bands: int = _DEFAULT_BANDS, n: int = 3,
                       seed: int = 7, id_col: str = "doc_id", text_col: str = "text",
                       concurrency=(2, 8)) -> pd.DataFrame:
    """Dataset(id, text) → pandas DataFrame(id_a, id_b, n_bands) of
    distinct candidate pairs.

    The distributed part ends at per-bucket pair generation; the pair
    list is small by construction (near-dup rate × corpus), so the
    cross-band dedupe (value_counts on pair keys) runs on the driver —
    a Ray groupby over it would pay a full sort for kilobytes of data.
    n_bands = number of bands in which the pair collided (the LSH
    confidence signal)."""
    band_rows = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(k=k, bands=bands, n=n, seed=seed, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def coarse_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["band_hash"].to_numpy() % _N_SHUFFLE_BUCKETS).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = band_rows.map_batches(coarse_bucket, batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(_bucket_pair_gen, batch_format="pandas").to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "n_bands": pd.Series(dtype="int64")}
        )
    return (
        pairs.groupby(["id_a", "id_b"], sort=False).size().rename("n_bands").reset_index()
    )


def minhash_dup_pairs(ds, *, threshold: float = 0.5, k: int = _DEFAULT_K,
                      bands: int = _DEFAULT_BANDS, n: int = 3, seed: int = 7,
                      id_col: str = "doc_id", text_col: str = "text", concurrency=(2, 8)):
    """Dataset(id, text) → pandas DataFrame(id_a, id_b, n_bands,
    exact_jaccard) of verified near-dup pairs.

    LSH proposes (distributed, see :func:`minhash_candidates`); exact
    word-shingle Jaccard disposes.  The verify step semi-joins the
    corpus down to only the docs that appear in candidate pairs (a tiny
    fraction by construction) and runs on the driver; at 10^12-doc scale
    the same verify becomes a hash-partitioned join of the candidate
    list against the corpus — the candidate *pair list* stays the small
    side either way.
    """
    candidates = minhash_candidates(
        ds, k=k, bands=bands, n=n, seed=seed, id_col=id_col, text_col=text_col,
        concurrency=concurrency,
    )
    if candidates.empty:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "n_bands": pd.Series(dtype="int64"), "exact_jaccard": pd.Series(dtype="float64")}
        )

    needed = set(candidates["id_a"]) | set(candidates["id_b"])
    from ..pipelines.tabular import broadcast_semi_filter

    texts_df = broadcast_semi_filter(ds, needed, id_col).to_pandas()
    lookup = dict(zip(texts_df[id_col], texts_df[text_col]))
    candidates["exact_jaccard"] = [
        exact_jaccard(lookup.get(a, ""), lookup.get(b, ""), n)
        for a, b in zip(candidates["id_a"], candidates["id_b"])
    ]
    out = candidates[candidates["exact_jaccard"] >= threshold].reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (unweighted)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set((text or "").split()):
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    ids = batch[id_col]
    hashes = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    # store as hex so the value survives every engine's int semantics
    return pa.Table.from_arrays(
        [ids, pa.array([f"{h:016x}" for h in hashes], type=pa.string())],
        names=[id_col, "simhash"],
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_dup_pairs(ds, *, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"):
    """Near-dup pairs within Hamming distance via the 4-band pigeonhole
    trick: two hashes within distance ≤3 share at least one exact 16-bit
    quarter; bucket on (quarter_idx, quarter_value), verify in-bucket."""
    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        o_id, o_q, o_v, o_h = [], [], [], []
        for doc_id, text in zip(ids, batch[text_col].to_pylist()):
            h = simhash64(text or "")
            for qi in range(4):
                o_id.append(doc_id)
                o_q.append(qi)
                o_v.append((h >> (16 * qi)) & 0xFFFF)
                o_h.append(h)
        return pa.Table.from_arrays(
            [pa.array(o_id), pa.array(o_q, type=pa.int32()), pa.array(o_v, type=pa.int64()),
             pa.array([f"{x:016x}" for x in o_h], type=pa.string())],
            names=[id_col, "quarter", "qvalue", "simhash"],
        )

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values(id_col).drop_duplicates(id_col)
        ids = rows[id_col].to_numpy()
        hs = [int(x, 16) for x in rows["simhash"]]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(hs[i], hs[j])
                if d <= max_hamming:
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    d_out.append(d)
        return pd.DataFrame({"id_a": a_out, "id_b": b_out, "hamming": d_out})

    from ray.data.aggregate import Min

    bands = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = bands.groupby(["quarter", "qvalue"]).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (small-side broadcast variant)
# ---------------------------------------------------------------------------


def embedding_dup_pairs(ds, all_vectors: np.ndarray, all_ids: np.ndarray, *, threshold: float = 0.9,
                        id_col: str = "vec_id", vec_col: str = "embedding"):
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    ``all_vectors``/``all_ids`` are the full (small enough to broadcast)
    normalized matrix; each batch does one float64 matmul against it.
    For two huge sides, LSH-bucket with stages.similarity instead.
    """
    from ..state.broadcast import Broadcast

    norms = np.linalg.norm(all_vectors, axis=1, keepdims=True)
    normed = all_vectors / np.where(norms == 0, 1, norms)
    handle = Broadcast((normed, np.asarray(all_ids)))

    def pairs(batch: pa.Table) -> pd.DataFrame:
        mat_all, ids_all = handle.get()
        ids = batch[id_col].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col].to_pylist()])
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(n == 0, 1, n)
        sims = mat @ mat_all.T
        rows, cols = np.nonzero(sims >= threshold)
        keep = ids[rows] < ids_all[cols]
        return pd.DataFrame(
            {
                "id_a": ids[rows][keep],
                "id_b": ids_all[cols][keep],
                "cos_sim": sims[rows, cols][keep],
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")
