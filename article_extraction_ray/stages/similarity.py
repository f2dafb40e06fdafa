"""Similarity search over embedding columns (``list<float>``).

Two paths:

- **Brute-force cosine top-k** (the exactness baseline): normalize the
  query matrix once, broadcast it (``ray.put``), and run one float64
  matmul per batch inside ``map_batches``; per-batch top-k prefilter,
  then a tiny global sort+limit.  Linear in corpus size, embarrassingly
  parallel — the right default until the corpus no longer streams.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  bucket vectors via ``groupby(bucket)``; queries probe their own bucket
  plus all buckets within Hamming distance ``probe_radius``.  Recall is
  tunable (planes/radius); the property test measures recall against the
  brute-force baseline.

Both paths are deterministic (seeded hyperplanes, stable tiebreak on id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast


def _as_matrix(column: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """list<float> column → (n, d) float64 matrix without per-row Python.

    Also accepts Ray's Arrow tensor extension arrays (what
    ``from_pandas`` produces for ndarray cells) and fixed-size lists.
    """
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if isinstance(column, pa.ExtensionArray):  # ray.data tensor extension
        return np.asarray(column.to_numpy(zero_copy_only=False), dtype=np.float64)
    if pa.types.is_fixed_size_list(column.type):
        d = column.type.list_size
        return np.asarray(column.values, dtype=np.float64).reshape(-1, d)
    values = np.asarray(column.values, dtype=np.float64)
    offsets = np.asarray(column.offsets)
    widths = np.diff(offsets)
    if len(widths) == 0:
        return np.zeros((0, 0))
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    return values[offsets[0] : offsets[-1]].reshape(-1, d)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(norms == 0, 1, norms)


def knn_brute_force(ds, queries: np.ndarray, query_ids: np.ndarray, *, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Top-k cosine neighbors for each query vector.

    Returns Dataset(query_id, vec_id, cos_sim) with k rows per query
    (before the final global reduce).  The query matrix is broadcast
    once; each batch computes (batch × queries) similarities vectorized.
    """
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    handle = Broadcast((qmat, np.asarray(query_ids)))

    def score(batch: pa.Table) -> pd.DataFrame:
        qm, qids = handle.get()
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        sims = mat @ qm.T  # (n, q)
        frames = []
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            take = min(k, len(col))
            idx = np.argpartition(-col, take - 1)[:take] if take else np.array([], dtype=int)
            frames.append(
                pd.DataFrame({"query_id": qids[qi], "vec_id": ids[idx], "cos_sim": col[idx]})
            )
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(score, batch_format="pyarrow")

    def per_query_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(per_query_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN
# ---------------------------------------------------------------------------


def _hyperplanes(d: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, d))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # (n, p)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def _neighbors_within(bucket: int, planes: int, radius: int) -> list[int]:
    out = [bucket]
    if radius >= 1:
        out += [bucket ^ (1 << i) for i in range(planes)]
    if radius >= 2:
        out += [
            bucket ^ (1 << i) ^ (1 << j)
            for i in range(planes)
            for j in range(i + 1, planes)
        ]
    return out


def knn_lsh_shuffle(
    corpus_ds,
    queries_ds,
    *,
    k: int = 10,
    planes: int = 8,
    tables: int = 4,
    probe_radius: int = 1,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    dim: int | None = None,
):
    """LSH ANN where the QUERY SET is itself a big Dataset (the scale
    path past :func:`knn_lsh`'s broadcast-probe, which ships every
    query's probe map to every corpus task).

    Shape: both sides hash to ``(table, bucket)`` keys inside
    map_batches — the corpus emits each vector once per table, queries
    emit once per probed bucket per table — then ONE union +
    groupby(key) co-locates colliding pairs and a per-bucket matmul
    scores them; a per-bucket top-k bounds what the final per-query
    reduce sees.  Nothing is broadcast; both sides shuffle once, and
    the shuffle volume is ``tables``× (corpus) and
    ``tables × (1+probes)``× (queries) — the standard distributed-LSH
    trade of replication for locality.  Skew: hot buckets mean the
    hyperplane split failed for that region; raise ``planes`` (halves
    expected bucket size per plane) rather than salting, since ANN
    correctness is per-bucket-local anyway.
    """
    probes_per = 1 + (planes if probe_radius >= 1 else 0) + (
        planes * (planes - 1) // 2 if probe_radius >= 2 else 0
    )

    def fields_dim(ds, col):
        if dim is not None:
            return dim
        import pyarrow.types as pt

        sch = ds.schema()
        t = dict(zip(sch.names, sch.types))[col]
        return t.list_size if pt.is_fixed_size_list(t) else None

    d0 = fields_dim(corpus_ds, vec_col)

    def emit(batch: pa.Table, *, is_query: bool) -> pa.Table:
        ids = batch[query_id_col if is_query else id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[query_vec_col if is_query else vec_col]))
        n, d = mat.shape if mat.size else (0, d0 or 0)
        gkeys, row_idx = [], []
        for t in range(tables):
            hp = _hyperplanes(d, planes, seed + 1000 * t)
            buckets = _bucket_of(mat, hp)
            base = np.int64(t) << np.int64(planes)
            if not is_query:
                gkeys.append(base | buckets)
                row_idx.append(np.arange(n))
            else:
                # probe expansion: bucket itself + all radius-1 (and
                # optionally radius-2) neighbors, vectorized via XOR
                flips = [np.int64(0)]
                if probe_radius >= 1:
                    flips += [np.int64(1) << np.int64(i) for i in range(planes)]
                if probe_radius >= 2:
                    flips += [
                        (np.int64(1) << np.int64(i)) | (np.int64(1) << np.int64(j))
                        for i in range(planes)
                        for j in range(i + 1, planes)
                    ]
                flips_arr = np.array(flips, dtype=np.int64)
                gk = base | (buckets[:, None] ^ flips_arr[None, :])  # (n, probes)
                gkeys.append(gk.ravel())
                row_idx.append(np.repeat(np.arange(n), len(flips_arr)))
        gkey = np.concatenate(gkeys) if gkeys else np.array([], dtype=np.int64)
        rows = np.concatenate(row_idx) if row_idx else np.array([], dtype=np.int64)
        flat = mat[rows].ravel()
        return pa.table(
            {
                "gkey": pa.array(gkey),
                "rid": pa.array(ids[rows]),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(flat), d or 1),
                "is_query": pa.array(np.full(len(rows), is_query)),
            }
        )

    tagged = corpus_ds.map_batches(
        lambda b: emit(b, is_query=False), batch_format="pyarrow"
    ).union(queries_ds.map_batches(lambda b: emit(b, is_query=True), batch_format="pyarrow"))

    def bucket_score(df: pd.DataFrame) -> pd.DataFrame:
        isq = df["is_query"].to_numpy()
        if isq.all() or not isq.any():
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
        qdf, cdf = df[isq], df[~isq]
        # a query may be probed into the same gkey only once and a
        # corpus row appears once per (table) — dedupe inside the bucket
        qdf = qdf.drop_duplicates("rid")
        cdf = cdf.drop_duplicates("rid")
        qm = np.stack(qdf["vec"].to_numpy())
        cm = np.stack(cdf["vec"].to_numpy())
        sims = cm @ qm.T  # (nc, nq)
        cids = cdf["rid"].to_numpy()
        qids = qdf["rid"].to_numpy()
        frames = []
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            take = min(k, len(col))
            idx = np.argpartition(-col, take - 1)[:take] if take else np.array([], dtype=int)
            frames.append(
                pd.DataFrame({"query_id": qids[qi], "vec_id": cids[idx], "cos_sim": col[idx]})
            )
        return pd.concat(frames, ignore_index=True)

    scored = tagged.groupby("gkey").map_groups(
        lambda df: bucket_score(df.drop(columns=["gkey"])), batch_format="pandas"
    )

    def per_query_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id").sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(per_query_topk, batch_format="pandas")


def knn_lsh(ds, queries: np.ndarray, query_ids: np.ndarray, *, k: int = 10, planes: int = 8,
            tables: int = 8, probe_radius: int = 1, seed: int = 11,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k via multi-table random-hyperplane buckets.

    ``tables`` independent hash tables of ``planes`` hyperplanes each
    (the standard recall amplifier: a true neighbor is recovered if ANY
    table collides); each query probes its bucket plus Hamming-``probe_radius``
    neighbors per table.  Candidate work stays sublinear in corpus size;
    recall vs the brute-force baseline is measured by the property test.
    """
    d = int(np.asarray(queries).shape[1])
    hps = [_hyperplanes(d, planes, seed + 1000 * t) for t in range(tables)]
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    probed: list[dict[int, list[int]]] = []
    for hp in hps:
        qb = _bucket_of(qmat, hp)
        table_map: dict[int, list[int]] = {}
        for qi, b in enumerate(qb):
            for nb in _neighbors_within(int(b), planes, probe_radius):
                table_map.setdefault(nb, []).append(qi)
        probed.append(table_map)
    handle = Broadcast((hps, qmat, np.asarray(query_ids), probed))

    def score(batch: pa.Table) -> pd.DataFrame:
        hps_m, qm, qids, probe_maps = handle.get()
        ids = batch[id_col].to_numpy()
        mat = _normalize(_as_matrix(batch[vec_col]))
        # union of candidates across tables, then one matmul per query set
        cand_for_query: dict[int, set[int]] = {}
        for hp, probe_map in zip(hps_m, probe_maps):
            buckets = _bucket_of(mat, hp)
            for b in np.unique(buckets):
                qlist = probe_map.get(int(b))
                if not qlist:
                    continue
                rows = np.nonzero(buckets == b)[0]
                for qi in qlist:
                    cand_for_query.setdefault(qi, set()).update(rows.tolist())
        frames = []
        for qi, rows in cand_for_query.items():
            sel = np.fromiter(rows, dtype=int, count=len(rows))
            col = mat[sel] @ qm[qi]
            take = min(k, len(col))
            idx = np.argpartition(-col, take - 1)[:take] if take else np.array([], dtype=int)
            frames.append(
                pd.DataFrame({"query_id": qids[qi], "vec_id": ids[sel[idx]], "cos_sim": col[idx]})
            )
        if not frames:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos_sim": []})
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(score, batch_format="pyarrow")

    def per_query_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id").sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(per_query_topk, batch_format="pandas")


def knn_graph_blocked(ds, *, k: int = 3, n_blocks: int = 4, margin: int = 8,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      attr_col: str | None = None,
                      exclude_same_attr: bool = False,
                      group_finalize=None):
    """EXACT k-NN graph over the whole table with NO driver-side matrix
    and no corpus broadcast — the big-table sibling of the broadcast
    path in ``pipelines.queries.q_knn_graph``.

    Same block-pair geometry as ``dedup.embedding_dup_pairs_blocked``:
    ids hash into ``n_blocks`` blocks, every vector ships once per
    block-pair its block joins (n_blocks× amplification, the unavoidable
    exact-all-pairs cost; size n_blocks so one pair's two matrices fit a
    worker).  Each pair emits per-source PARTIAL top-(k+margin)
    candidates (a global top-k neighbor is top-k inside every subset
    containing it, so partials cover the exact answer; the margin
    absorbs sim ties at the cut).  One groupby(src) merge-reduce then
    applies the deterministic (sim desc, id asc) rule exactly as the
    broadcast path does.  Returns Dataset(src, dst, rank).

    Extensions for the attribute-aware queries (`hard_negatives`,
    `label_noise_detect`, `mutual_nn` above their broadcast budget):

    - ``attr_col`` carries an integer attribute (e.g. a class label)
      through the exchange; output gains ``src_attr``/``dst_attr``.
    - ``exclude_same_attr=True`` masks SAME-attribute candidates to
      -inf BEFORE the partial top-k (post-filtering would be wrong: a
      block-pair dominated by one label could flood the margin), so
      the graph becomes "top-k among different-attr rows".  Self is a
      same-attr pair, so it is excluded too.  Sources with no
      eligible candidate anywhere emit no row (matching the SQL inner
      join's semantics).
    - ``group_finalize(frame) -> frame`` runs INSIDE the per-src
      merge-reduce on the final deterministic top-k frame (columns
      src, dst, sim, rank [+ attrs]) — votes/renames happen while the
      group is still atomic, so no later stage can split a src across
      blocks.
    """
    import pandas as pd

    from .dedup import _key_buckets

    carry = attr_col is not None

    def expand(batch: "pa.Table") -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        vecs = batch[vec_col].to_pylist()
        own = _key_buckets(ids, n_blocks)
        frames = []
        for other in range(n_blocks):
            lo = np.minimum(own, other)
            hi = np.maximum(own, other)
            cols = {
                "pair_id": lo.astype(np.int64) * n_blocks + hi,
                "block": own,
                "vid": ids,
                "vec": vecs,
            }
            if carry:
                cols["attr"] = (
                    batch[attr_col].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            frames.append(pd.DataFrame(cols))
        return pd.concat(frames, ignore_index=True).drop_duplicates(["pair_id", "vid"])

    def _partial_topk(src_ids, src_mat, dst_ids, dst_mat,
                      src_attr=None, dst_attr=None):
        if not len(src_ids) or not len(dst_ids):
            return []
        sims = src_mat @ dst_mat.T  # (s, d)
        if exclude_same_attr:
            sims[src_attr[:, None] == dst_attr[None, :]] = -np.inf
        else:
            sims[src_ids[:, None] == dst_ids[None, :]] = -np.inf  # self
        take = min(k + margin, sims.shape[1])
        if take < sims.shape[1]:
            cand = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        else:
            cand = np.broadcast_to(
                np.arange(sims.shape[1]), (sims.shape[0], sims.shape[1])
            )
        rows = np.repeat(np.arange(len(src_ids)), cand.shape[1])
        keep_sim = sims[rows, cand.ravel()]
        finite = np.isfinite(keep_sim)
        cols = {
            "src": src_ids[rows][finite],
            "dst": dst_ids[cand.ravel()][finite],
            "sim": keep_sim[finite],
        }
        if carry:
            cols["src_attr"] = src_attr[rows][finite]
            cols["dst_attr"] = dst_attr[cand.ravel()][finite]
        return [pd.DataFrame(cols)]

    def block_pair(g: pd.DataFrame) -> pd.DataFrame:
        pair_id = int(g["pair_id"].iloc[0])
        lo, hi = divmod(pair_id, n_blocks)
        g = g.drop_duplicates("vid")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1, norms)
        ids = g["vid"].to_numpy()
        attrs = g["attr"].to_numpy() if carry else None
        if lo == hi:
            frames = _partial_topk(ids, mat, ids, mat, attrs, attrs)
        else:
            side = g["block"].to_numpy() == lo
            a = attrs[side] if carry else None
            b = attrs[~side] if carry else None
            frames = _partial_topk(ids[side], mat[side], ids[~side], mat[~side], a, b)
            frames += _partial_topk(ids[~side], mat[~side], ids[side], mat[side], b, a)
        if not frames:
            empty = {"src": pd.Series(dtype=np.int64),
                     "dst": pd.Series(dtype=np.int64),
                     "sim": pd.Series(dtype=np.float64)}
            if carry:
                empty["src_attr"] = pd.Series(dtype=np.int64)
                empty["dst_attr"] = pd.Series(dtype=np.int64)
            return pd.DataFrame(empty)
        return pd.concat(frames, ignore_index=True)

    expanded = ds.map_batches(expand, batch_format="pyarrow")
    partials = expanded.groupby("pair_id").map_groups(block_pair, batch_format="pandas")

    out_cols = ["src", "dst", "rank"] + (["src_attr", "dst_attr"] if carry else [])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"]).sort_values(
            ["sim", "dst"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        if group_finalize is not None:
            return group_finalize(g)
        return g[out_cols]

    return partials.groupby("src").map_groups(merge, batch_format="pandas")


def knn_graph_lsh(
    ds,
    *,
    k: int = 3,
    planes: int = 8,
    tables: int = 6,
    probe_radius: int = 1,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """APPROXIMATE k-NN graph — the sublinear tier above
    :func:`knn_graph_blocked`'s exact-O(N²) block-pair expansion, for
    corpora where even n_blocks× replication is too much data motion.

    The corpus self-joins through :func:`knn_lsh_shuffle` (it is both
    sides): every vector emits once per table as corpus and once per
    probed bucket as query, colliding pairs score inside their bucket,
    and the per-query reduce keeps top-(k+1).  A vector always collides
    with itself (same bucket, sim 1.0), so the self edge is dropped
    afterwards and ranks close over the gap — pure vectorized batch
    work, no extra shuffle (map_groups blocks never split a group).
    Recall is tunable via (planes, tables, probe_radius); the property
    test bounds it against the exact graph.  Returns Dataset(src, dst,
    rank)."""

    def as_queries(t: pa.Table) -> pa.Table:
        return pa.table({"query_id": t[id_col], "embedding": t[vec_col]})

    res = knn_lsh_shuffle(
        ds,
        ds.map_batches(as_queries, batch_format="pyarrow"),
        k=k + 1,
        planes=planes,
        tables=tables,
        probe_radius=probe_radius,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )

    def drop_self(df: pd.DataFrame) -> pd.DataFrame:
        is_self = df["query_id"] == df["vec_id"]
        self_rank = df.loc[is_self].set_index("query_id")["rank"]
        out = df.loc[~is_self].copy()
        sr = out["query_id"].map(self_rank).fillna(k + 2).to_numpy()
        rank = out["rank"].to_numpy()
        rank = rank - (rank > sr).astype(np.int64)
        out["rank"] = rank
        out = out[out["rank"] <= k]
        return pd.DataFrame(
            {
                "src": out["query_id"].to_numpy(),
                "dst": out["vec_id"].to_numpy(),
                "rank": out["rank"].to_numpy().astype(np.int64),
            }
        )

    return res.map_batches(drop_self, batch_format="pandas")


# ---------------------------------------------------------------------------
# margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — public method)
# ---------------------------------------------------------------------------


def _avg_topk_asc(vals: np.ndarray, k: int) -> float:
    """Mean of the top-k values, summed in ascending order (fixed
    summation order keeps the two exact paths bit-aligned)."""
    top = np.sort(vals)[-k:] if len(vals) > k else np.sort(vals)
    return float(top.mean())


def bitext_margin_broadcast(a_ids, a_mat, b_ids, b_mat, *, k: int = 4,
                            threshold: float = 1.0) -> pd.DataFrame:
    """Exact mutual-argmax margin pairs with both sides in memory — the
    under-budget kernel (callers route on the parquet footer row count,
    same budget as `q_embedding_dup_pairs`).

    margin(a,b) = cos(a,b) / ((avgk(a) + avgk(b)) / 2) where avgk is
    the mean of the row's top-k cosines to the OTHER side — the
    ratio-margin criterion of Artetxe & Schwenk 2019 that suppresses
    hubness (rows globally similar to everything).  A pair survives iff
    each side is the other's margin argmax (ties: lower id) and the
    margin clears ``threshold``.  Inputs must be L2-normalized and
    sorted by id so numpy argmax's first-hit tie rule IS the (margin
    desc, id asc) rule the SQL oracle spells out."""
    if not len(a_ids) or not len(b_ids):
        return pd.DataFrame({"a_id": pd.Series(dtype=np.int64),
                             "b_id": pd.Series(dtype=np.int64)})
    cos = a_mat @ b_mat.T  # (nA, nB)
    ka, kb = min(k, cos.shape[1]), min(k, cos.shape[0])
    avg_a = np.sort(cos, axis=1)[:, -ka:].mean(axis=1)
    avg_b = np.sort(cos, axis=0)[-kb:, :].mean(axis=0)
    margin = cos / ((avg_a[:, None] + avg_b[None, :]) / 2.0)
    best_b = margin.argmax(axis=1)
    best_a = margin.argmax(axis=0)
    rows = np.arange(len(a_ids))
    mutual = best_a[best_b] == rows
    keep = mutual & (margin[rows, best_b] > threshold)
    return pd.DataFrame(
        {"a_id": np.asarray(a_ids)[keep].astype(np.int64),
         "b_id": np.asarray(b_ids)[best_b[keep]].astype(np.int64)}
    ).sort_values("a_id").reset_index(drop=True)


def bitext_margin_blocked(ds, *, k: int = 4, threshold: float = 1.0,
                          n_blocks: int = 4, id_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """Exact mutual-argmax margin pairs with NO driver-side matrix and
    no corpus broadcast — the at-scale sibling of
    :func:`bitext_margin_broadcast` (forced-route pytest proves equal
    output on the same input).

    Two block-pair sweeps over the :func:`knn_graph_blocked` exchange
    geometry (ids hash into ``n_blocks`` per side; every vector ships
    n_blocks× — the unavoidable exact all-pairs cost):

    1. per (a-block, b-block) group: cosine partials → per-row top-k
       candidates; a groupby(side, id) merge reduces each row's GLOBAL
       top-k mean (a global top-k member is top-k inside every subset
       containing it, so block partials cover the exact answer).
    2. the avgk table re-expands through the SAME id buckets as tiny
       (id, avg) rows — landing in every group its vector lands in, a
       map-side join with no extra shuffle primitive — and each group
       emits its LOCAL margin argmax per row; a groupby(side, id)
       max-reduce applies the (margin desc, other-id asc) rule
       globally.  Mutual filtering is one groupby(b_id) holding one
       best-of-b row plus the a-candidates that chose that b — bounded
       per group, never a driver drain.

    Vectors travel as float64 ``tobytes()`` blobs (one fixed-width
    binary column, zero schema ambiguity across the avg/vec union);
    cosines are recomputed in sweep 2 rather than materialized — an
    O(N²) float column is exactly what a 100-TB pass cannot keep.
    """
    from .dedup import _key_buckets

    def _expand_rows(ids, sides, vb, avg) -> pd.DataFrame:
        own = _key_buckets(ids, n_blocks)
        frames = []
        for other in range(n_blocks):
            pair = np.where(sides == 0, own * n_blocks + other, other * n_blocks + own)
            frames.append(pd.DataFrame(
                {"pair_id": pair, "vid": ids, "side": sides, "vb": vb, "avg": avg}))
        return pd.concat(frames, ignore_index=True)

    def expand_vecs(batch: "pa.Table") -> pd.DataFrame:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sides = (ids % 2 != 0).astype(np.int64)  # 0 = side A, 1 = side B
        mat = _as_matrix(batch[vec_col])
        vb = [r.tobytes() for r in np.ascontiguousarray(mat, dtype=np.float64)]
        return _expand_rows(ids, sides, vb, np.nan)

    def expand_avgs(batch: "pa.Table") -> pd.DataFrame:
        ids = batch["vid"].to_numpy(zero_copy_only=False).astype(np.int64)
        sides = batch["side"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _expand_rows(ids, sides, b"", batch["avg"].to_numpy(zero_copy_only=False))

    def _group_mats(g: pd.DataFrame):
        """(a_ids, a_mat, b_ids, b_mat) for one pair group, L2-normalized,
        each side sorted by id (argmax first-hit == lowest id)."""
        g = g.drop_duplicates("vid").sort_values("vid", kind="stable")
        a, b = g[g["side"] == 0], g[g["side"] == 1]
        if not len(a) or not len(b):
            return None

        def mat(part):
            m = np.frombuffer(b"".join(part["vb"]), dtype=np.float64).reshape(len(part), -1)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            return m / np.where(n == 0, 1, n)

        return a["vid"].to_numpy(), mat(a), b["vid"].to_numpy(), mat(b)

    _EMPTY_TOPK = {"side": pd.Series(dtype=np.int64), "vid": pd.Series(dtype=np.int64),
                   "cos": pd.Series(dtype=np.float64)}

    def pair_topk(g: pd.DataFrame) -> pd.DataFrame:
        got = _group_mats(g)
        if got is None:
            return pd.DataFrame(_EMPTY_TOPK)
        aid, am, bid, bm = got
        cos = am @ bm.T
        ka, kb = min(k, cos.shape[1]), min(k, cos.shape[0])
        top_a = np.sort(cos, axis=1)[:, -ka:]
        top_b = np.sort(cos, axis=0)[-kb:, :]
        return pd.concat(
            [pd.DataFrame({"side": 0, "vid": np.repeat(aid, ka), "cos": top_a.ravel()}),
             pd.DataFrame({"side": 1, "vid": np.repeat(bid, kb), "cos": top_b.T.ravel()})],
            ignore_index=True,
        )

    def reduce_avg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"side": [int(g["side"].iloc[0])], "vid": [int(g["vid"].iloc[0])],
             "avg": [_avg_topk_asc(g["cos"].to_numpy(), k)]}
        )

    avgs = (
        ds.map_batches(expand_vecs, batch_format="pyarrow")
        .groupby("pair_id").map_groups(pair_topk, batch_format="pandas")
        .groupby(["side", "vid"]).map_groups(reduce_avg, batch_format="pandas")
    )

    both = ds.map_batches(expand_vecs, batch_format="pyarrow").union(
        avgs.map_batches(expand_avgs, batch_format="pyarrow")
    )

    _EMPTY_BEST = {"side": pd.Series(dtype=np.int64), "vid": pd.Series(dtype=np.int64),
                   "other": pd.Series(dtype=np.int64), "margin": pd.Series(dtype=np.float64)}

    def pair_margin(g: pd.DataFrame) -> pd.DataFrame:
        avg_map = g[g["avg"].notna()].drop_duplicates("vid").set_index("vid")["avg"]
        got = _group_mats(g[g["avg"].isna()])
        if got is None:
            return pd.DataFrame(_EMPTY_BEST)
        aid, am, bid, bm = got
        cos = am @ bm.T
        avg_a = avg_map.reindex(aid).to_numpy()
        avg_b = avg_map.reindex(bid).to_numpy()
        margin = cos / ((avg_a[:, None] + avg_b[None, :]) / 2.0)

        def best(mat, ids_self, ids_other, side):
            # columns already id-ascending (_group_mats sorts), so
            # argmax's first hit applies (margin desc, other asc)
            pick = mat.argmax(axis=1)
            return pd.DataFrame(
                {"side": side, "vid": ids_self, "other": ids_other[pick],
                 "margin": mat[np.arange(len(ids_self)), pick]})

        return pd.concat(
            [best(margin, aid, bid, 0), best(margin.T, bid, aid, 1)],
            ignore_index=True,
        )

    def reduce_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["margin", "other"], ascending=[False, True], kind="stable")
        return g.iloc[:1][["side", "vid", "other", "margin"]]

    bests = (
        both.groupby("pair_id").map_groups(pair_margin, batch_format="pandas")
        .groupby(["side", "vid"]).map_groups(reduce_best, batch_format="pandas")
    )

    def key_by_b(batch: "pa.Table") -> pd.DataFrame:
        df = batch.to_pandas()
        df["b_key"] = np.where(df["side"] == 0, df["other"], df["vid"])
        return df

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        brow = g[g["side"] == 1]
        arows = g[g["side"] == 0]
        if not len(brow) or not len(arows):
            return pd.DataFrame({"a_id": pd.Series(dtype=np.int64),
                                 "b_id": pd.Series(dtype=np.int64)})
        chosen_a = int(brow["other"].iloc[0])
        hit = arows[(arows["vid"] == chosen_a) & (arows["margin"] > threshold)]
        return pd.DataFrame({"a_id": hit["vid"].to_numpy(dtype=np.int64),
                             "b_id": hit["other"].to_numpy(dtype=np.int64)})

    return (
        bests.map_batches(key_by_b, batch_format="pyarrow")
        .groupby("b_key").map_groups(mutual, batch_format="pandas")
    )
