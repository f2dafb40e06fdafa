"""Product quantization (PQ) — compressed-domain ANN for the 100 TB tier.

IVF (:mod:`stages.clustering`) and LSH (:mod:`stages.similarity`) cut
*candidate work*; PQ cuts *memory*: each d-dim float vector is stored as
``m`` uint8 codes (one per d/m-dim subspace, each quantized against its
own ``ksub``-entry codebook), a 4·d/m-fold compression — the difference
between an embedding table that fits in the cluster's object store and
one that doesn't.  Search runs entirely in the compressed domain via
asymmetric distance computation (ADC): per query, one small
(m × ksub) lookup table of exact query-subvector · codeword inner
products; each database vector's approximate cosine is then m table
gathers + a sum — no float matrix ever streams at query time.

Ray-Data shapes (same conventions as the k-means module):

- **fit** — ONE distributed Lloyd's loop trains all m subspace
  codebooks jointly: each batch computes per-subspace assignments
  with m small matmuls and emits a single partial row of
  (m × ksub × dsub) sum / (m × ksub) count accumulators; the driver
  folds partials (size independent of corpus) and re-broadcasts.
- **encode** — stateless ``map_batches``: (n, d) batch → m argmax
  calls → ``fixed_size_list<uint8, m>`` codes column.  Codes are what
  a production index persists (parquet), the float column is dropped.
- **search** — queries broadcast as prebuilt LUTs; each codes batch
  does a vectorized gather-sum per query and a per-batch top-k
  prefilter, then the usual per-query groupby reduce.

Approximate by construction (quantization error); recall vs brute
force is property-tested in tests/test_similarity.py.  Composes with
IVF (probe lists first, ADC inside the list) — here the full-scan ADC
path is implemented because it is the memory-bound regime PQ exists
for; candidate pruning is IVF/LSH's job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast
from .clustering import _hash_priorities
from .similarity import _as_matrix, _normalize

_FIT_SAMPLE_PER_CODEWORD = 32


def _prep(mat: np.ndarray, coarse: np.ndarray | None):
    """L2-normalize; with a coarse quantizer, also return per-row coarse
    assignments and replace each vector by its residual (IVF-PQ trains
    and encodes PQ on residuals, which carry far less variance than the
    raw vectors)."""
    mat = _normalize(mat)
    if coarse is None:
        return mat, None
    a = np.argmax(mat @ coarse.T - 0.5 * (coarse * coarse).sum(axis=1), axis=1)
    return mat - coarse[a], a


#: n_rows × dim budget for the PQ driver-kernel fit route (64 MiB of
#: float64), mirroring clustering._KMEANS_DRIVER_FLOATS.
_PQ_DRIVER_FLOATS = 8_000_000


def _fit_sample(ds, n_sample: int, *, id_col: str, vec_col: str,
                coarse: np.ndarray | None = None) -> np.ndarray:
    """Seeded spread sample for codebook init: each batch keeps its
    local ``n_sample`` smallest hash priorities (bounded, layout-
    independent), driver keeps the global smallest — the same A-Res
    trick as k-means init, so init is deterministic across block
    layouts."""

    def local(batch: pa.Table) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat, _ = _prep(_as_matrix(batch[vec_col]), coarse)
        if not mat.size:
            return pd.DataFrame({"prio": [], "vec": []})
        pr = _hash_priorities(ids, seed=911)
        take = min(n_sample, len(pr))
        idx = np.argpartition(pr, take - 1)[:take]
        return pd.DataFrame({"prio": pr[idx], "vec": list(mat[idx])})

    # distributed second-level reduce: sort+limit runs over the candidate
    # stream (≤ n_sample rows per batch) in the cluster, so the driver
    # receives exactly n_sample rows regardless of batch count
    cand = ds.map_batches(local, batch_format="pyarrow").sort("prio").limit(n_sample).to_pandas()
    return np.stack(cand["vec"].to_numpy())


def pq_fit(
    ds,
    *,
    m: int = 8,
    ksub: int = 32,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-6,
    coarse: np.ndarray | None = None,
) -> np.ndarray:
    """Train the (m, ksub, d/m) PQ codebooks with joint distributed Lloyd's.

    Vectors are L2-normalized before subspace split so ADC scores
    approximate cosine.  d must be divisible by ``m``.  With ``coarse``
    (an nlist×d centroid matrix) the codebooks are trained on residuals
    — the IVF-PQ configuration.
    """
    sample = _fit_sample(
        ds, _FIT_SAMPLE_PER_CODEWORD * ksub, id_col=id_col, vec_col=vec_col, coarse=coarse
    )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if len(sample) < ksub:
        raise ValueError(f"corpus smaller than ksub={ksub}")
    # init: per subspace, the first ksub sample subvectors in priority order
    books = np.stack([sample[:ksub, j * dsub : (j + 1) * dsub].copy() for j in range(m)])

    def sweep_arrays(mat: np.ndarray, cb: np.ndarray):
        sums = np.zeros((m, ksub, dsub))
        counts = np.zeros((m, ksub), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            a = np.argmax(sub @ cb[j].T - 0.5 * (cb[j] * cb[j]).sum(axis=1), axis=1)
            np.add.at(sums[j], a, sub)
            counts[j] = np.bincount(a, minlength=ksub)
        return sums, counts

    def apply_update(cb: np.ndarray, sums: np.ndarray, counts: np.ndarray):
        new = cb.copy()  # empty codewords keep their previous value
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        return new, float(np.max(np.linalg.norm(new - cb, axis=2)))

    # Size-routed driver kernel (same pattern and rationale as
    # clustering.kmeans_fit): under the floats budget the sweep loop
    # runs on one collected (already _prep-ed) matrix — identical
    # update rule via the shared sweep helper, none of the per-sweep
    # plan overhead.  Above it each sweep is the distributed
    # fixed-width partial-sum reduce.
    try:
        n_rows = ds.count()
    except Exception:
        n_rows = None
    if n_rows is not None and n_rows * d <= _PQ_DRIVER_FLOATS:
        import ray as _ray

        blocks = _ray.get(ds.select_columns([vec_col]).to_arrow_refs())
        mats = [_as_matrix(b[vec_col]) for b in blocks if b.num_rows]
        full = np.vstack(mats) if mats else np.zeros((0, d))
        mat, _ = _prep(full, coarse)
        for _ in range(iters):
            if not mat.size:
                break
            sums, counts = sweep_arrays(mat, books)
            books, shift = apply_update(books, sums, counts)
            if shift < tol:
                break
        return books

    for _ in range(iters):
        handle = Broadcast((books, coarse))

        def partial(batch: pa.Table) -> pd.DataFrame:
            cb, crs = handle.get()  # (m, ksub, dsub), coarse or None
            mat, _ = _prep(_as_matrix(batch[vec_col]), crs)
            if not mat.size:
                return pd.DataFrame({"sums": [], "counts": []})
            sums, counts = sweep_arrays(mat, cb)
            return pd.DataFrame({"sums": [sums.ravel()], "counts": [counts.ravel()]})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            break
        sums = np.sum(np.stack(parts["sums"].to_numpy()), axis=0).reshape(m, ksub, dsub)
        counts = np.sum(np.stack(parts["counts"].to_numpy()), axis=0).reshape(m, ksub)
        books, shift = apply_update(books, sums, counts)
        if shift < tol:
            break
    return books


def pq_encode(ds, codebooks: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding", out_col: str = "pq_code",
              coarse: np.ndarray | None = None, coarse_col: str = "coarse"):
    """Dataset(id_col, out_col[, coarse_col]): each vector as m uint8 codes.

    This is the persistence shape — at scale the float column is
    dropped here and only codes (m bytes/row) flow downstream.  With
    ``coarse``, codes quantize the residual and the coarse list id is
    emitted alongside (the IVF-PQ index layout)."""
    m, ksub, dsub = codebooks.shape
    handle = Broadcast((np.asarray(codebooks, dtype=np.float64), coarse))

    def encode(batch: pa.Table) -> pa.Table:
        cb, crs = handle.get()
        ids = batch[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        mat, assign = _prep(_as_matrix(batch[vec_col]), crs)
        if not mat.size:
            cols = [ids, pa.array([], type=pa.list_(pa.uint8(), m))]
            names = [id_col, out_col]
            if crs is not None:
                cols.append(pa.array([], type=pa.int32()))
                names.append(coarse_col)
            return pa.Table.from_arrays(cols, names=names)
        out = np.empty((len(mat), m), dtype=np.uint8)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            out[:, j] = np.argmax(sub @ cb[j].T - 0.5 * (cb[j] * cb[j]).sum(axis=1), axis=1)
        codes = pa.FixedSizeListArray.from_arrays(pa.array(out.ravel()), m)
        cols = [ids, codes]
        names = [id_col, out_col]
        if crs is not None:
            cols.append(pa.array(assign.astype(np.int32)))
            names.append(coarse_col)
        return pa.Table.from_arrays(cols, names=names)

    return ds.map_batches(encode, batch_format="pyarrow")


def _codes_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # zero chunks
        return np.empty((0, 0), dtype=np.uint8)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1) if n else np.empty((0, 0), dtype=np.uint8)


def knn_pq(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    m: int = 8,
    ksub: int = 32,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
    refine: int = 4,
):
    """PQ/ADC cosine top-k with exact re-rank:
    Dataset(query_id, vec_id, cos_sim, rank).

    Two passes, both streaming: (1) compressed-domain ADC scan keeps a
    ``refine``·k-candidate shortlist per query (quantized scores rank
    coarsely — fine-grained order inside a tight cluster is below the
    quantization noise floor); (2) the shortlist (q·refine·k ids,
    bounded, independent of corpus size) broadcasts back over the float
    table and only candidate rows get exact cosines — the standard
    ADC-then-refine shape (FAISS ``refine_factor``).  ``refine=0``
    skips the re-rank and returns raw ``adc_sim`` scores.

    Pass ``codebooks`` to reuse a prefitted index (fit once, search
    many)."""
    if codebooks is None:
        ds = ds.materialize()  # fit sweeps + encode pass share blocks
        codebooks = pq_fit(ds, m=m, ksub=ksub, iters=iters, id_col=id_col, vec_col=vec_col)
    m, ksub, dsub = codebooks.shape
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    # LUTs: exact query-subvector · codeword inner products, (q, m, ksub)
    luts = _query_luts(qmat, codebooks)
    encoded = pq_encode(ds, codebooks, id_col=id_col, vec_col=vec_col)
    shortlist = max(1, refine) * k
    scored = _adc_scan(encoded, luts, query_ids, shortlist, id_col=id_col)

    if not refine:
        return _topk_reduce(scored, "adc_sim", k)
    refined = _exact_refine(
        ds, scored, qmat, query_ids, shortlist=shortlist, id_col=id_col, vec_col=vec_col
    )
    return _topk_reduce(refined, "cos_sim", k)


def _adc_scan(encoded, luts: np.ndarray, query_ids, shortlist: int, *, id_col: str = "vec_id"):
    """Compressed-domain scan over a codes Dataset (id_col, pq_code):
    per-query LUT gather-sum with a per-batch shortlist prefilter.

    The prefilter uses lexsort (sim desc, id asc) — the SAME tiebreak as
    the final reduce, so it keeps every global-top-k row no matter how
    rows split into blocks (quantized scores tie constantly;
    argpartition's arbitrary tiebreak would make results depend on
    block layout)."""
    m = luts.shape[1]
    handle = Broadcast((luts, np.asarray(query_ids)))
    subspace = np.arange(m)

    def score(batch: pa.Table) -> pd.DataFrame:
        lut, qids = handle.get()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _codes_matrix(batch["pq_code"])
        if not codes.size:
            return pd.DataFrame({"query_id": [], "vec_id": [], "adc_sim": []})
        frames = []
        for qi in range(len(qids)):
            sims = lut[qi][subspace, codes].sum(axis=1)  # (n,) gather-sum
            take = min(shortlist, len(sims))
            idx = np.lexsort((ids, -sims))[:take]
            frames.append(pd.DataFrame({"query_id": qids[qi], "vec_id": ids[idx], "adc_sim": sims[idx]}))
        return pd.concat(frames, ignore_index=True)

    return encoded.map_batches(score, batch_format="pyarrow")


def _query_luts(qmat: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    m, ksub, dsub = codebooks.shape
    return np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)], axis=1
    )


def write_pq_codes(ds, codes_dir: str, codebooks: np.ndarray, *,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> None:
    """Persist the encoded corpus as a parquet code table — the index
    DATA to go with `save_pq_index`'s codebooks.  New corpus shards
    append by encoding with the SAME codebooks and writing more files
    into the directory (no refit, no rewrite of existing codes)."""
    pq_encode(ds, codebooks, id_col=id_col, vec_col=vec_col).write_parquet(codes_dir)


def knn_pq_from_codes(codes_dir: str, codebooks: np.ndarray, queries: np.ndarray,
                      query_ids, *, k: int = 10, id_col: str = "vec_id"):
    """Search straight off a persisted code table: no floats are read
    and nothing re-encodes — the query-time path of a production PQ
    index (m bytes/vector scanned).  Returns raw ADC ranking; compose
    with `_exact_refine` when the float table is also at hand."""
    import ray.data as rd

    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    luts = _query_luts(qmat, np.asarray(codebooks, dtype=np.float64))
    encoded = rd.read_parquet(codes_dir)
    scored = _adc_scan(encoded, luts, query_ids, k, id_col=id_col)
    return _topk_reduce(scored, "adc_sim", k)


def _topk_reduce(scored, score_col: str, k: int):
    """Per-query top-k with the canonical (score desc, vec_id asc) tiebreak."""

    def per_query_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([score_col, "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(per_query_topk, batch_format="pandas")


def _exact_refine(ds, scored, qmat, query_ids, *, shortlist: int, id_col: str, vec_col: str):
    """Exact re-rank of a compressed-domain shortlist: reduce ``scored``
    (query_id, vec_id, adc_sim) to ``shortlist`` candidates per query
    (bounded by the query-set size, not the corpus), broadcast the
    candidate map, and compute exact cosines for candidate rows only in
    one streaming pass over the float table."""

    def per_query_shortlist(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["adc_sim", "vec_id"], ascending=[False, True]).head(shortlist)

    cand = (
        scored.groupby("query_id")
        .map_groups(per_query_shortlist, batch_format="pandas")
        .to_pandas()
    )
    cand_map: dict[int, list[int]] = {}
    for vid, qid in zip(cand["vec_id"].to_numpy(), cand["query_id"].to_numpy()):
        cand_map.setdefault(int(vid), []).append(int(qid))
    cand_ids = np.fromiter(cand_map.keys(), dtype=np.int64, count=len(cand_map))
    qindex = {int(q): i for i, q in enumerate(np.asarray(query_ids))}
    rhandle = Broadcast((cand_map, cand_ids, qmat, qindex))

    def exact(batch: pa.Table) -> pd.DataFrame:
        cmap, cids, qm, qidx = rhandle.get()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = np.isin(ids, cids)  # vectorized membership over the big side
        if not mask.any():
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
        mat = _normalize(_as_matrix(batch[vec_col]))[mask]
        sub_ids = ids[mask]
        # Python loop only over shortlist hits — bounded by q·shortlist,
        # not by batch size.
        out_q, out_v, out_s = [], [], []
        for row, vid in enumerate(sub_ids):
            for qid in cmap[int(vid)]:
                out_q.append(qid)
                out_v.append(vid)
                out_s.append(float(mat[row] @ qm[qidx[qid]]))
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "cos_sim": out_s})

    return ds.map_batches(exact, batch_format="pyarrow")


def knn_ivfpq(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 32,
    iters: int = 6,
    kmeans_iters: int = 5,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[np.ndarray, np.ndarray] | None = None,
    refine: int = 4,
):
    """IVF-PQ cosine top-k: Dataset(query_id, vec_id, cos_sim, rank).

    The full web-scale index: a coarse quantizer prunes CANDIDATES
    (only ``nprobe``/``nlist`` of the corpus is scanned per query) and
    residual PQ codes prune MEMORY (m bytes per scanned vector), with
    the bounded exact-refine pass recovering fine-grained order.  ADC
    score for a row in list L is q·c_L (driver-precomputed per probe)
    + Σⱼ LUT[j, code_j] where the LUTs hold q-subvector · residual-
    codeword products.

    ``index`` is an optional prefitted ``(coarse_centroids, codebooks)``
    pair (fit once, search many).  Normalized-space k-means is reused
    from :func:`stages.clustering.kmeans_fit` over a derived normalized
    view of the corpus.
    """
    from .clustering import kmeans_fit

    def normalize_rows(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        if not mat.size:
            return pa.Table.from_arrays(
                [ids, pa.array([], type=pa.list_(pa.float64()))], names=[id_col, vec_col]
            )
        vecs = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), mat.shape[1])
        return pa.Table.from_arrays([ids, vecs], names=[id_col, vec_col])

    if index is None:
        nds = ds.map_batches(normalize_rows, batch_format="pyarrow").materialize()
        coarse = kmeans_fit(nds, nlist, id_col=id_col, vec_col=vec_col,
                            iters=kmeans_iters, seed=seed, cache=False)
        books = pq_fit(nds, m=m, ksub=ksub, iters=iters, id_col=id_col,
                       vec_col=vec_col, coarse=coarse)
        src = nds
    else:
        coarse, books = index
        src = ds.map_batches(normalize_rows, batch_format="pyarrow")
    m, ksub, dsub = books.shape
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    # probe sets by inner product q·c (normalized space), plus per-probe
    # score offsets; both (q, nprobe)-bounded
    qc = qmat @ coarse.T  # (q, nlist)
    probes = np.argsort(-qc, axis=1)[:, :nprobe]
    luts = np.stack(
        [qmat[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
    )  # (q, m, ksub)
    encoded = pq_encode(src, books, id_col=id_col, vec_col=vec_col, coarse=coarse)
    handle = Broadcast((luts, qc, probes, np.asarray(query_ids)))
    subspace = np.arange(m)
    shortlist = max(1, refine) * k

    def score(batch: pa.Table) -> pd.DataFrame:
        lut, qc_m, probe_m, qids = handle.get()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _codes_matrix(batch["pq_code"])
        coarse_a = batch["coarse"].to_numpy(zero_copy_only=False)
        if not codes.size:
            return pd.DataFrame({"query_id": [], "vec_id": [], "adc_sim": []})
        frames = []
        for qi in range(len(qids)):
            in_probe = np.isin(coarse_a, probe_m[qi])
            if not in_probe.any():
                continue
            rows = np.flatnonzero(in_probe)
            sims = lut[qi][subspace, codes[rows]].sum(axis=1) + qc_m[qi][coarse_a[rows]]
            take = min(shortlist, len(sims))
            idx = np.lexsort((ids[rows], -sims))[:take]  # layout-independent tiebreak
            frames.append(
                pd.DataFrame({"query_id": qids[qi], "vec_id": ids[rows[idx]], "adc_sim": sims[idx]})
            )
        if not frames:
            return pd.DataFrame({"query_id": [], "vec_id": [], "adc_sim": []})
        return pd.concat(frames, ignore_index=True)

    scored = encoded.map_batches(score, batch_format="pyarrow")
    if not refine:
        return _topk_reduce(scored, "adc_sim", k)
    refined = _exact_refine(
        src, scored, qmat, query_ids, shortlist=shortlist, id_col=id_col, vec_col=vec_col
    )
    return _topk_reduce(refined, "cos_sim", k)


def save_pq_index(path: str, codebooks: np.ndarray,
                  coarse: np.ndarray | None = None) -> None:
    """Persist a PQ (or IVF-PQ) index as one parquet file — the
    fit-once/search-many production shape: train on today's corpus,
    reload in every later search job without refitting.  Layout: one
    row per (subspace, codeword) with the dsub floats inline, plus
    coarse-centroid rows tagged subspace = -1."""
    import pyarrow.parquet as pq

    m, ksub, dsub = codebooks.shape
    rows_sub = np.repeat(np.arange(m, dtype=np.int32), ksub)
    rows_code = np.tile(np.arange(ksub, dtype=np.int32), m)
    vecs = [codebooks[j, c].tolist() for j in range(m) for c in range(ksub)]
    if coarse is not None:
        rows_sub = np.concatenate([rows_sub, np.full(len(coarse), -1, dtype=np.int32)])
        rows_code = np.concatenate([rows_code, np.arange(len(coarse), dtype=np.int32)])
        vecs.extend(v.tolist() for v in np.asarray(coarse, dtype=np.float64))
    t = pa.table({"subspace": rows_sub, "codeword": rows_code, "vec": vecs})
    tmp = str(path) + ".tmp"
    pq.write_table(t, tmp, compression="zstd")
    import os

    os.replace(tmp, str(path))


def load_pq_index(path: str) -> tuple[np.ndarray, np.ndarray | None]:
    """Inverse of :func:`save_pq_index` → (codebooks, coarse | None)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    sub = t["subspace"].to_numpy()
    code = t["codeword"].to_numpy()
    vec_lists = t["vec"].to_pylist()
    pq_mask = sub >= 0
    # codeword rows are dsub-wide, coarse rows d-wide — stack separately
    pq_vecs = np.stack(
        [np.asarray(vec_lists[i], dtype=np.float64) for i in np.flatnonzero(pq_mask)]
    )
    m = int(sub[pq_mask].max()) + 1
    ksub = int(code[pq_mask].max()) + 1
    books = np.empty((m, ksub, pq_vecs.shape[1]))
    books[sub[pq_mask], code[pq_mask]] = pq_vecs
    coarse = None
    if (~pq_mask).any():
        rows = np.flatnonzero(~pq_mask)
        cvecs = np.stack([np.asarray(vec_lists[i], dtype=np.float64) for i in rows])
        coarse = np.empty_like(cvecs)
        coarse[code[rows]] = cvecs
    return books, coarse


# ---------------------------------------------------------------------------
# int8 scalar quantization — the lighter-weight sibling of PQ
# ---------------------------------------------------------------------------


def sq_fit(ds, *, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the corpus — one streaming pass of
    fixed-width partials (two d-vectors per batch)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        mat = _as_matrix(batch[vec_col])
        if not mat.size:
            return pd.DataFrame({"lo": [], "hi": []})
        return pd.DataFrame({"lo": [mat.min(axis=0)], "hi": [mat.max(axis=0)]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack(parts["lo"].to_numpy()), axis=0)
    hi = np.max(np.stack(parts["hi"].to_numpy()), axis=0)
    return lo, hi


def sq_encode(ds, lo: np.ndarray, hi: np.ndarray, *, id_col: str = "vec_id",
              vec_col: str = "embedding", out_col: str = "sq_code"):
    """float vectors → uint8 codes (4× smaller than float32, 8× than
    float64): x ↦ round(255·(x−lo)/(hi−lo)) per dimension.  Unlike PQ
    this keeps per-dimension resolution (no subspace codebooks), at a
    4× weaker compression — the usual first step before PQ is needed."""
    span = np.where(hi > lo, hi - lo, 1.0)
    handle = Broadcast((lo, span))
    d = len(lo)

    def encode(batch: pa.Table) -> pa.Table:
        l, s = handle.get()
        ids = batch[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        mat = _as_matrix(batch[vec_col])
        if not mat.size:
            return pa.Table.from_arrays(
                [ids, pa.array([], type=pa.list_(pa.uint8(), d))], names=[id_col, out_col]
            )
        q = np.clip(np.round((mat - l) / s * 255.0), 0, 255).astype(np.uint8)
        codes = pa.FixedSizeListArray.from_arrays(pa.array(q.ravel()), d)
        return pa.Table.from_arrays([ids, codes], names=[id_col, out_col])

    return ds.map_batches(encode, batch_format="pyarrow")


def sq_decode_matrix(codes: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """uint8 codes → float64 reconstruction (midpoint dequantization)."""
    span = np.where(hi > lo, hi - lo, 1.0)
    return codes.astype(np.float64) / 255.0 * span + lo
