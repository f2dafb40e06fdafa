"""SQL-oracled sketch internals: md5-keyed HLL / SimHash / MinHash.

The production sketches (stages/sketch.py, stages/dedup.py) hash with
``pd.util.hash_array`` — SipHash with a fixed key, fast but not
reproducible inside DuckDB, so their driver checks are rows-only or
tolerance gates (`hll_rank_check`).  This module is the *value-level*
counterpart: the same register / signature / fingerprint math keyed by
md5, which DuckDB exposes bit-identically (`md5_number_upper(s)` ==
``int.from_bytes(md5(s).digest()[:8], "little")``), so the ENTIRE
sketch state — every HLL register, every SimHash bit, every MinHash
signature slot — is value-hash-checked against an ANSI-SQL oracle.

These run at production batch shapes (bounded per-batch partials, max
merges) but pay one md5 per distinct token/shingle/key; at 100 TB you
run the SipHash twins and keep ONE md5 pipeline as the cross-engine
conformance probe (the reason warehouses keep md5 UDF parity suites).

Public algorithms only: Flajolet et al. 2007 (HLL), Charikar 2002
(SimHash), Broder 1997 (MinHash).  Reference repo has no sketch layer
(nearest is exact pandas dedupe, tables/paper_information_table.py) —
this family is engine surplus for the 100-TB posture.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "md5_u64",
    "hll_md5_partial",
    "simhash_md5_batch",
    "minhash_md5_batch",
    "cms_md5_partial",
    "bloom_md5_partial",
    "MINHASH_A",
    "MINHASH_B",
    "MINHASH_PRIME",
    "MINHASH_H32_MOD",
]


def md5_u64(strings) -> np.ndarray:
    """uint64 md5 hash of each string: first 8 digest bytes,
    little-endian — DuckDB's ``md5_number_upper`` exactly (probed:
    md5_number_upper('abc') == int.from_bytes(md5(b'abc').digest()[:8],
    'little')).  One hashlib call per string is the md5-parity price;
    the concat + single frombuffer keeps everything else vectorized."""
    if not len(strings):
        return np.empty(0, dtype=np.uint64)
    dig = b"".join(hashlib.md5(s.encode("utf-8")).digest()[:8] for s in strings)
    return np.frombuffer(dig, dtype="<u8")


# ---------------------------------------------------------------------------
# HyperLogLog registers (p fixed per query; value domain = stringified key)
# ---------------------------------------------------------------------------


def hll_md5_partial(strings, p: int) -> pd.DataFrame:
    """(register, rho) max-partial for one batch of key strings.

    register = top ``p`` hash bits; rho = 1 + leading zeros of the
    remaining 64-p bits with the sentinel bit planted at position p-1
    (so rho caps at 64-p+1, same wrap the production kernel uses).
    The bit scan is EXACT integer work (unpackbits argmax), not the
    float log2 shortcut — DuckDB mirrors it as
    ``65 - length(bin(rest))`` (bin() strips leading zeros), so the
    two engines can never diverge on a boundary ulp."""
    h = md5_u64(strings)
    if not len(h):
        return pd.DataFrame({"register": pd.Series(dtype=np.int64),
                             "rho": pd.Series(dtype=np.int64)})
    mask = np.uint64((1 << (64 - p)) - 1)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = ((h & mask) << np.uint64(p)) | np.uint64(1 << (p - 1))
    bits = np.unpackbits(rest[:, None].byteswap().view(np.uint8), axis=1)
    rho = bits.argmax(axis=1).astype(np.int64) + 1  # rest>0: sentinel bit
    return (
        pd.DataFrame({"register": idx, "rho": rho})
        .groupby("register", as_index=False)["rho"]
        .max()
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, distinct whitespace tokens, strict-majority votes)
# ---------------------------------------------------------------------------


def simhash_md5_batch(texts) -> list[str]:
    """Per-text 64-bit md5-SimHash as a 16-char lowercase hex string.

    Same geometry as the production ``batch_simhash64``
    (stages/dedup.py): distinct tokens, one concatenated hash pass,
    unpack to a (T, 64) bit matrix, per-document strict-majority votes
    via ``np.add.reduceat`` segments.  Hex (not uint64) output keeps
    the driver's value hash engine-neutral — DuckDB renders the same
    string with ``lpad(lower(hex(v)), 16, '0')``."""
    n_docs = len(texts)
    vals = np.zeros(n_docs, dtype=np.uint64)
    uniq_lists, counts = [], np.zeros(n_docs, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if toks:
            u = sorted(set(toks))
            uniq_lists.append(u)
            counts[i] = len(u)
    if uniq_lists:
        h = md5_u64([t for u in uniq_lists for t in u])
        bits = np.unpackbits(h[:, None].view(np.uint8), axis=1, bitorder="little")
        nz = np.flatnonzero(counts)
        offs = np.r_[0, np.cumsum(counts[nz])[:-1]]
        sums = np.add.reduceat(bits, offs, axis=0)
        maj = (sums.astype(np.int64) * 2) > counts[nz][:, None]
        vals[nz] = np.packbits(maj, axis=1, bitorder="little").view(np.uint64).ravel()
    return [f"{int(v):016x}" for v in vals]


# ---------------------------------------------------------------------------
# MinHash signatures (k=8 affine permutations over 32-bit shingle hashes)
# ---------------------------------------------------------------------------

#: Affine permutation constants.  a, b < 2**16 so a*h32 + b < 2**64 in
#: BOTH engines without wraparound (DuckDB UBIGINT raises on overflow,
#: so the usual mod-2**64 trick is unavailable — the 32-bit hash domain
#: is what makes exact SQL parity possible at all).
MINHASH_A = (3, 5, 7, 11, 131, 257, 521, 1031)
MINHASH_B = (17, 29, 47, 83, 197, 389, 769, 1543)
MINHASH_PRIME = 4294967311  # smallest prime > 2**32
MINHASH_H32_MOD = 4294967296  # 2**32


def minhash_md5_batch(doc_ids, texts, *, shingle: int = 3) -> pd.DataFrame:
    """(doc_id, perm, sig) rows: k-slot MinHash signatures over distinct
    ``shingle``-word grams, md5-keyed.  Documents with fewer than
    ``shingle`` tokens emit nothing (mirrored by the oracle's
    ``len(toks) >= shingle`` guard).  One md5 pass over the batch's
    concatenated shingles; per-perm minima are ``np.minimum.reduceat``
    segments, so the only per-document Python is shingling itself."""
    keep_ids, sh_lists, counts = [], [], []
    for d, t in zip(doc_ids, texts):
        toks = (t or "").split()
        if len(toks) < shingle:
            continue
        sh = sorted(set(" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)))
        keep_ids.append(d)
        sh_lists.append(sh)
        counts.append(len(sh))
    if not keep_ids:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "perm": pd.Series(dtype=np.int64),
                             "sig": pd.Series(dtype=np.int64)})
    h32 = md5_u64([s for sh in sh_lists for s in sh]) % np.uint64(MINHASH_H32_MOD)
    counts = np.asarray(counts, dtype=np.int64)
    offs = np.r_[0, np.cumsum(counts)[:-1]]
    k = len(MINHASH_A)
    sigs = np.empty((len(keep_ids), k), dtype=np.int64)
    for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B)):
        vals = (np.uint64(a) * h32 + np.uint64(b)) % np.uint64(MINHASH_PRIME)
        sigs[:, j] = np.minimum.reduceat(vals, offs).astype(np.int64)
    n = len(keep_ids)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(np.asarray(keep_ids, dtype=np.int64), k),
            "perm": np.tile(np.arange(k, dtype=np.int64), n),
            "sig": sigs.ravel(),
        }
    )


# ---------------------------------------------------------------------------
# Count-Min sketch registers (Cormode & Muthukrishnan 2005), md5-keyed
# ---------------------------------------------------------------------------


def cms_md5_partial(keys, counts, *, d: int, w: int) -> pd.DataFrame:
    """(sketch_row, col, cnt) partial for one batch of (key, count)
    pairs: cell column = ``md5(r || '|' || key) % w`` for each of the
    ``d`` rows — the salted-row keying DuckDB reproduces verbatim as
    ``md5_number_upper(r || '|' || key) % w``, so EVERY non-zero CMS
    cell is SQL-checkable (the production twin, stages/sketch.cms_*,
    keys with SipHash×fmix64 and is tolerance-gated instead).

    Linear-sketch shape: partials are (≤ d·w)-row count frames that
    elementwise-sum under the same grouped reduce as any counter —
    merge order can't matter, which is the CMS linearity property the
    pytest suite checks on the production kernel."""
    keys = list(keys)
    if not keys:
        return pd.DataFrame({"sketch_row": pd.Series(dtype=np.int64),
                             "col": pd.Series(dtype=np.int64),
                             "cnt": pd.Series(dtype=np.int64)})
    cnt = np.asarray(counts, dtype=np.int64)
    frames = []
    for r in range(d):
        col = (md5_u64([f"{r}|{k}" for k in keys]) % np.uint64(w)).astype(np.int64)
        frames.append(pd.DataFrame({"sketch_row": np.int64(r), "col": col, "cnt": cnt}))
    out = pd.concat(frames, ignore_index=True)
    return out.groupby(["sketch_row", "col"], as_index=False)["cnt"].sum()


# ---------------------------------------------------------------------------
# Counting Bloom filter cells (Fan et al. 2000), md5-keyed
# ---------------------------------------------------------------------------


def bloom_md5_partial(keys, *, k: int, m: int) -> pd.DataFrame:
    """(bit, hits) partial for one batch of DISTINCT key strings: the
    ``k`` probe positions of key are ``md5(i || '|' || key) % m``
    (i = 0..k-1).  ``hits`` counts (i, key) probes landing on the bit —
    the counting-Bloom generalization whose >0 projection is the plain
    Bloom bit vector, and whose exact cell counts make the WHOLE filter
    state value-checkable in SQL (a bit vector alone would hide
    collision miscounts).  Callers must pre-dedupe keys batch-locally
    and globally (a Bloom insert is idempotent; the counting twin here
    counts each distinct key once)."""
    keys = list(keys)
    if not keys:
        return pd.DataFrame({"bit": pd.Series(dtype=np.int64),
                             "hits": pd.Series(dtype=np.int64)})
    frames = []
    for i in range(k):
        bit = (md5_u64([f"{i}|{s}" for s in keys]) % np.uint64(m)).astype(np.int64)
        frames.append(pd.DataFrame({"bit": bit}))
    out = pd.concat(frames, ignore_index=True)
    out["hits"] = np.int64(1)
    return out.groupby("bit", as_index=False)["hits"].sum()
