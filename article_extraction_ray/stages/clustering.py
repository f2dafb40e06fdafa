"""Distributed k-means and IVF approximate nearest-neighbor search.

The scale path for similarity search that :mod:`stages.similarity`'s
LSH variants approximate differently: IVF (inverted-file) ANN first
learns ``nlist`` coarse centroids with distributed Lloyd's k-means,
then each query scores only the vectors assigned to its ``nprobe``
nearest centroids — candidate work is ``nprobe/nlist`` of brute force.

Ray-Data shapes:

- **k-means fit** — classic mirror of the parallel Lloyd's step: the
  centroid matrix (k×d, small by construction) broadcasts via
  ``ray.put``; every batch computes nearest-centroid assignments with
  one matmul and emits ONE partial row of per-cluster (sum, count)
  accumulators; the driver folds the ~num_batches partials (k×d floats
  each — bounded, independent of corpus size) and re-broadcasts.  The
  corpus streams from the object store every sweep; nothing
  materializes, no shuffle at all.
- **IVF search** — queries (small side) broadcast with their probe
  sets; each corpus batch groups its rows by assigned centroid and
  runs one matmul per (cluster-present × queries-probing) slice;
  per-batch top-k prefilter bounds the final per-query reduce exactly
  like :func:`stages.similarity.knn_brute_force`.

Determinism: seeded hash-priority init (smallest blake2-derived
priority per vec id — a seeded spread sample, reproducible across
cluster layouts), float64 accumulation in fixed per-batch order, empty
clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast
from .similarity import _as_matrix, _normalize

#: n_rows × dim budget for the k-means driver-kernel route (64 MiB of
#: float64): under it the sweep loop runs on one collected matrix,
#: above it every sweep is a distributed partial-sum reduce.
_KMEANS_DRIVER_FLOATS = 8_000_000


def _hash_priorities(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic pseudo-uniform priority per id — one vectorized
    fixed-key siphash call (``pd.util.hash_array``), seed mixed in by a
    Fibonacci-constant XOR; no per-row Python."""
    with np.errstate(over="ignore"):  # wrapping uint64 mix is intended
        mixed = ids.astype(np.uint64) ^ (np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
    return pd.util.hash_array(mixed)


_INIT_OVERSAMPLE = 16


def _init_centroids(ds, k: int, *, id_col: str, vec_col: str, seed: int) -> np.ndarray:
    """Deterministic spread init: oversample, then greedy k-center.

    One streaming pass pre-filters each batch to its local m smallest
    hash priorities (m = 16k candidates — a seeded uniform sample,
    independent of block layout, the same A-Res trick as
    ``q_weighted_sample``); the driver then picks k of the m candidates
    by greedy farthest-point selection (start at the min-priority
    candidate, repeatedly add the candidate farthest from the chosen
    set).  The oversample + k-center combination is the cheap
    deterministic cousin of k-means‖ (Bahmani et al., VLDB 2012): pure
    priority sampling routinely seeds two centroids in one dense blob
    and strands another — Lloyd's can't recover from that.
    O(m·k·d) driver work on m = 16k rows, corpus-size-independent.
    """
    m = _INIT_OVERSAMPLE * k

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = _as_matrix(batch[vec_col])
        pri = _hash_priorities(ids, seed)
        take = min(m, len(ids))
        idx = np.argpartition(pri, take - 1)[:take] if take else np.array([], dtype=int)
        return pd.DataFrame({"pri": pri[idx], "vec": list(mat[idx])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    top = parts.nsmallest(min(m, len(parts)), "pri")
    cand = np.stack(top["vec"].to_numpy()).astype(np.float64)
    if len(cand) <= k:
        return cand
    chosen = [0]  # candidates arrive priority-sorted: start at the min
    d2 = ((cand - cand[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    return cand[chosen]


def kmeans_fit(
    ds,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 17,
    tol: float = 1e-6,
    cache: bool = True,
    ckpt_dir: str | None = None,
) -> np.ndarray:
    """Distributed Lloyd's: returns the (k, d) centroid matrix.

    Squared-L2 assignment (argmin ‖x−c‖² = argmax c·x − ‖c‖²/2, one
    matmul per batch).  Stops on ``iters`` or when the max centroid
    shift drops below ``tol``.  With ``ckpt_dir`` each sweep's
    centroids checkpoint atomically and a fresh call resumes after the
    last complete sweep (state/checkpoint.py) — a long fit that dies
    mid-run re-pays only the unfinished sweeps.

    ``cache=True`` materializes the input into the object store before
    the sweeps — the standard shape for iterative fits: the vector
    table is the small DERIVED table (d floats/row, ~1% of a raw
    corpus), each Lloyd iteration re-streams it, and without caching
    every sweep pays the parquet scan + split again (measured ~35% of
    per-sweep wall time at sf0.1).  Blocks spill to disk if the table
    outgrows the store, so this stays safe at scale.
    """
    from ..state.checkpoint import iterate_with_checkpoint

    if cache:
        ds = ds.materialize()
    cents = _init_centroids(ds, k, id_col=id_col, vec_col=vec_col, seed=seed)
    d = cents.shape[1]

    # Size-routed driver kernel (same pattern as triangle_count / the
    # BPE driver-vocab branch): when the DERIVED vector table fits the
    # budget, the sweep loop runs on one collected matrix — identical
    # update rule (argmax c·x − ‖c‖²/2, empty clusters keep their
    # centroid), none of the per-sweep plan/scheduling overhead that
    # dominates iterative fits at small scale.  Above the budget every
    # sweep is the distributed partial-sum reduce below; results differ
    # only in float summation order (≤1 ulp per coordinate).
    try:
        n_rows = ds.count()
    except Exception:
        n_rows = None
    if n_rows is not None and n_rows * d <= _KMEANS_DRIVER_FLOATS:
        import ray as _ray

        blocks = _ray.get(ds.select_columns([vec_col]).to_arrow_refs())
        mats = [_as_matrix(b[vec_col]) for b in blocks if b.num_rows]
        mat = np.vstack(mats) if mats else np.zeros((0, d))

        def sweep_local(cents: np.ndarray, _i: int) -> np.ndarray:
            if not mat.size:
                return cents
            assign = np.argmax(mat @ cents.T - 0.5 * (cents * cents).sum(axis=1), axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            new = cents.copy()
            nz = counts > 0
            new[nz] = sums[nz] / counts[nz, None]
            return new

        def converged_local(prev: np.ndarray, new: np.ndarray) -> bool:
            return float(np.max(np.linalg.norm(new - prev, axis=1))) < tol

        return iterate_with_checkpoint(
            cents, sweep_local, iters, ckpt_dir=ckpt_dir, should_stop=converged_local
        )

    def sweep(cents: np.ndarray, _i: int) -> np.ndarray:
        handle = Broadcast(cents)

        def partial(batch: pa.Table) -> pd.DataFrame:
            c = handle.get()
            mat = _as_matrix(batch[vec_col])
            if not mat.size:
                return pd.DataFrame({"sums": [], "counts": []})
            assign = np.argmax(mat @ c.T - 0.5 * (c * c).sum(axis=1), axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pd.DataFrame({"sums": [sums.ravel()], "counts": [counts]})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            return cents
        sums = np.sum(np.stack(parts["sums"].to_numpy()), axis=0).reshape(k, d)
        counts = np.sum(np.stack(parts["counts"].to_numpy()), axis=0)
        new = cents.copy()  # empty clusters keep their previous centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        return new

    def converged(prev: np.ndarray, new: np.ndarray) -> bool:
        return float(np.max(np.linalg.norm(new - prev, axis=1))) < tol

    return iterate_with_checkpoint(
        cents, sweep, iters, ckpt_dir=ckpt_dir, should_stop=converged
    )


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  out_col: str = "cluster"):
    """Append the nearest-centroid index (int32) to every row."""
    handle = Broadcast(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = handle.get()
        mat = _as_matrix(batch[vec_col])
        if not mat.size:
            return batch.append_column(out_col, pa.array([], type=pa.int32()))
        a = np.argmax(mat @ c.T - 0.5 * (c * c).sum(axis=1), axis=1).astype(np.int32)
        return batch.append_column(out_col, pa.array(a))

    return ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 5,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
):
    """IVF cosine top-k: Dataset(query_id, vec_id, cos_sim, rank).

    Pass ``centroids`` to reuse a prefitted index (the production shape:
    fit once, search many).  Approximate — a true neighbor assigned to
    an unprobed cluster is missed; recall vs brute force is
    property-tested and tunable via ``nprobe``.
    """
    if centroids is None:
        ds = ds.materialize()  # fit sweeps + the scoring pass share blocks
        centroids = kmeans_fit(
            ds, nlist, id_col=id_col, vec_col=vec_col, iters=kmeans_iters,
            seed=seed, cache=False,
        )
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    c = np.asarray(centroids, dtype=np.float64)
    # probe sets: nprobe nearest centroids per query (L2 on the raw
    # query — same metric the corpus assignment uses)
    qraw = np.asarray(queries, dtype=np.float64)
    qd = qraw @ c.T - 0.5 * (c * c).sum(axis=1)
    order = np.argsort(-qd, axis=1)[:, :nprobe]  # (q, nprobe)
    probe = np.zeros((len(c), len(qmat)), dtype=bool)  # (nlist, q)
    for qi in range(len(qmat)):
        probe[order[qi], qi] = True
    handle = Broadcast((c, qmat, np.asarray(query_ids), probe))

    def score(batch: pa.Table) -> pd.DataFrame:
        cents, qm, qids, probe_m = handle.get()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        raw = _as_matrix(batch[vec_col])
        if not raw.size:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
        mat = _normalize(raw)
        assign = np.argmax(raw @ cents.T - 0.5 * (cents * cents).sum(axis=1), axis=1)
        frames = []
        for cl in np.unique(assign):
            q_sel = np.flatnonzero(probe_m[cl])
            if not len(q_sel):
                continue
            rows = np.flatnonzero(assign == cl)
            sims = mat[rows] @ qm[q_sel].T  # (rows, probing queries)
            for j, qi in enumerate(q_sel):
                col = sims[:, j]
                take = min(k, len(col))
                idx = np.argpartition(-col, take - 1)[:take] if take else np.array([], dtype=int)
                frames.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "vec_id": ids[rows[idx]], "cos_sim": col[idx]}
                    )
                )
        if not frames:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(score, batch_format="pyarrow")

    def per_query_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(per_query_topk, batch_format="pandas")


def semantic_dedup(
    ds,
    *,
    k: int = 16,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 17,
):
    """SemDeDup-style embedding dedup (Abbas et al. 2023, arXiv
    2303.09540): cluster the corpus with distributed k-means, then prune
    WITHIN each cluster only — greedy by ascending id, a row is dropped
    when its cosine to any already-kept row of the same cluster exceeds
    ``threshold``.  Pairwise work is O(Σ n_c²) instead of O(N²); at web
    scale k grows with N so per-cluster size (and per-group memory)
    stays constant, and the only shuffle is the groupby(cluster) —
    vectors never all-pairs across clusters.

    Returns Dataset(id, cluster, keep, max_sim) where max_sim is the
    max cosine to a kept earlier row (0 for the cluster's first row).
    Deterministic: seeded k-means + id-ordered greedy.
    """
    cents = kmeans_fit(ds, k, id_col=id_col, vec_col=vec_col, iters=iters, seed=seed)
    assigned = kmeans_assign(ds, cents, vec_col=vec_col, out_col="cluster")

    def prune(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending")]))
        mat = _normalize(_as_matrix(t[vec_col]))  # zero-copy list<float> → matrix
        n = len(t)
        sims = mat @ mat.T  # cluster-local, bounded by design
        keep = np.zeros(n, dtype=bool)
        max_sim = np.zeros(n, dtype=np.float64)
        kept_idx: list[int] = []
        for i in range(n):  # greedy order is inherently sequential,
            if kept_idx:    # but all similarity math is the one matmul above
                max_sim[i] = sims[i, kept_idx].max()
            keep[i] = max_sim[i] <= threshold
            if keep[i]:
                kept_idx.append(i)
        return pd.DataFrame(
            {
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                "cluster": t["cluster"].to_numpy(zero_copy_only=False),
                "keep": keep,
                "max_sim": np.round(max_sim, 6),
            }
        )

    return assigned.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def pca_fit(ds, *, vec_col: str = "embedding", n_components: int = 2):
    """Distributed PCA fit: mean vector + top principal components.

    The whole fit is ONE streaming pass of fixed-width partials — each
    batch contributes ``(n, sum_x (d), sum_xxT (d*d))`` — reduced to a
    single d×d second-moment matrix; the driver does the O(d^3) ``eigh``
    on the covariance (d is the embedding width, never the corpus).
    This is the geometry that holds at 100 TB: rows never shuffle, the
    driver holds d(d+1)+1 floats.  Eigenvector sign is fixed
    deterministically (largest-|coordinate| entry made positive) so the
    projection is reproducible across runs and block orders.

    Returns ``(mean (d,), components (n_components, d))``.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _as_matrix(batch[vec_col])
        d = X.shape[1]
        row = {
            "n": float(X.shape[0]),
            "sum_x": np.asarray(X.sum(axis=0), dtype=np.float64),
            "sum_xxt": (X.T @ X).reshape(d * d),
        }
        return pd.DataFrame([row])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sum_x = np.sum([np.asarray(p["sum_x"]) for p in parts], axis=0)
    sum_xxt = np.sum([np.asarray(p["sum_xxt"]) for p in parts], axis=0)
    d = sum_x.shape[0]
    mean = sum_x / n
    cov = sum_xxt.reshape(d, d) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :n_components].T  # (k, d), top variance first
    # deterministic sign: the largest-|x| coordinate of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                n_components: int = 2):
    """Fit PCA on the stream, then project every vector onto the top
    components (one broadcast of (k+1)·d floats, one vectorized matmul
    per batch).  Output: ``id_col, pc1..pck``."""
    import ray

    mean, comps = pca_fit(ds, vec_col=vec_col, n_components=n_components)
    state = ray.put((mean, comps))

    def project(batch: pa.Table) -> pd.DataFrame:
        m, c = ray.get(state)
        X = _as_matrix(batch[vec_col])
        Y = (X - m) @ c.T
        out = {id_col: batch[id_col].to_numpy(zero_copy_only=False)}
        for i in range(Y.shape[1]):
            out[f"pc{i + 1}"] = Y[:, i]
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pyarrow")
