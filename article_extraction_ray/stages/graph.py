"""Distributed connected components over an edge Dataset.

The missing last step of every near-dup pipeline: MinHash / SimHash /
embedding stages emit *pairs* (stages/dedup.py), but dedupe policy acts
on *clusters* — keep one canonical doc per connected component of the
pair graph.  At 10^12-document scale the pair list itself is a large
Dataset, so the transitive closure must run distributed.

Algorithm: iterative min-label propagation ("hash-to-min" family,
Rastogi et al., "Finding Connected Components in Map-Reduce in
Logarithmic Rounds", ICDE 2013 — public).  Every node starts labeled
with itself; each round every node takes the min label over {itself} ∪
its neighbors; fixpoint = each component labeled by its min node id.

Ray-Data shape per round (2 coarse-bucket shuffles, NO per-key groups):

    union[ edges bucketed by src , labels bucketed by node ]
      → groupby(bucket).map_groups: hash-join labels onto edge sources,
        emit (dst, label(src)) messages pre-min-combined per dst,
        plus the carried (node, label) rows
      → re-bucket by node → groupby(bucket).map_groups: per-node min

Convergence: the int64 label sum is strictly decreasing until fixpoint
(labels only ever decrease), so one cheap ``sum()`` aggregate per round
on the materialized label Dataset detects termination without a
change-count join.  Rounds = graph diameter; dedup-cluster graphs are
dense (near-cliques through shared LSH buckets) so the diameter is
small.  For adversarially long path graphs, the documented upgrade is
label short-cutting (also propagate along node→label pointers, halving
path lengths per round — the log-rounds variant of the same paper);
the per-round shuffle shape is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_N_BUCKETS = 64

#: edge count under which the label graph collapses on the driver: two
#: int64 arrays of 20M edges are 320 MB — the same "the pair list is
#: small by construction" policy as minhash_candidates.  Above it the
#: iterative distributed propagation runs (connected_components_distributed).
DRIVER_EDGE_BUDGET = 20_000_000


def _bucket(vals: np.ndarray, nb: int) -> np.ndarray:
    return (vals.astype(np.int64) % nb).astype(np.int32)


def _cc_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label + pointer-jumping CC over dense edge arrays.

    Returns (nodes_appearing_in_edges, component_label per node).  Each
    sweep is O(E) numpy (`minimum.at` scatter both directions, then one
    pointer jump `lab = lab[lab]`), and the jump halves label-chain
    lengths so sweeps are O(log diameter) — no per-edge Python.
    """
    nodes, inv = np.unique(np.r_[src, dst], return_inverse=True)
    e_src, e_dst = inv[: len(src)], inv[len(src) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lab
        lab = lab.copy()
        np.minimum.at(lab, e_dst, lab[e_src])
        np.minimum.at(lab, e_src, lab[e_dst])
        lab = lab[lab]
        if np.array_equal(lab, old):
            break
    while True:  # full path compression to the component minimum
        nxt = lab[lab]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return nodes, nodes[lab]


def connected_components(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes=None,
    max_iters: int = 64,
    num_buckets: int = _N_BUCKETS,
    driver_edge_budget: int = DRIVER_EDGE_BUDGET,
):
    """Dataset(src, dst) [+ optional Dataset(node)] → Dataset(node, component).

    ``edges`` is undirected (each pair listed in either or both
    directions); int64 node ids.  ``nodes`` (a Dataset with ``node``
    ints) adds isolated nodes, which come back as singleton components.
    ``component`` = min node id reachable from ``node``.

    Routing: edge lists under ``driver_edge_budget`` collapse on the
    driver with the vectorized numpy kernel (ids only — never payloads —
    and the node→component map broadcasts back via ``ray.put``, so the
    node side stays distributed with zero shuffles); larger graphs run
    the iterative distributed propagation.
    """
    n_edges = edges.count()
    if n_edges <= driver_edge_budget:
        return _cc_driver(edges, src_col=src_col, dst_col=dst_col, nodes=nodes)
    return connected_components_distributed(
        edges,
        src_col=src_col,
        dst_col=dst_col,
        nodes=nodes,
        max_iters=max_iters,
        num_buckets=num_buckets,
    )


def _cc_driver(edges, *, src_col: str, dst_col: str, nodes=None):
    """Driver-kernel path: pull ONLY the two id columns, solve, broadcast
    the (edge-touched node → component) map, label nodes in place."""
    from ..state.broadcast import Broadcast

    batches = list(
        edges.select_columns([src_col, dst_col]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    if batches:
        tbl = pa.concat_tables(batches)
        src = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        src = dst = np.zeros(0, dtype=np.int64)
    if len(src):
        touched, comp = _cc_numpy(src, dst)
    else:
        touched = comp = np.zeros(0, dtype=np.int64)

    if nodes is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array(touched), "component": pa.array(comp)})
        )

    handle = Broadcast((touched, comp))

    def label(batch: pa.Table) -> pa.Table:
        t, c = handle.get()
        n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        # touched is sorted (np.unique); isolated nodes label themselves
        pos = np.searchsorted(t, n)
        pos = np.clip(pos, 0, max(len(t) - 1, 0))
        out = n.copy()
        if len(t):
            hit = t[pos] == n
            out[hit] = c[pos[hit]]
        return pa.table({"node": pa.array(n), "component": pa.array(out)})

    return nodes.map_batches(label, batch_format="pyarrow")


def connected_components_distributed(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    nodes=None,
    max_iters: int = 64,
    num_buckets: int = _N_BUCKETS,
):
    """Iterative distributed min-label propagation (see module docstring).

    O(diameter) rounds of two coarse-bucket shuffles each; use for edge
    lists too large for the driver kernel."""
    import ray.data as rd

    def to_directed(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        both_s, both_d = np.r_[s, d], np.r_[d, s]
        return pa.table(
            {
                "src": pa.array(both_s),
                "dst": pa.array(both_d),
                "bucket": pa.array(_bucket(both_s, num_buckets)),
            }
        )

    # Edges are iterated over every round: materialize the bucketed,
    # direction-doubled form ONCE so rounds re-read object-store blocks
    # instead of re-running the upstream plan.
    edges_b = edges.map_batches(to_directed, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        n = np.unique(
            np.r_[
                batch["src"].to_numpy(zero_copy_only=False),
                batch["dst"].to_numpy(zero_copy_only=False),
            ].astype(np.int64)
        )
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    label_parts = [edges_b.map_batches(init_labels, batch_format="pyarrow")]
    if nodes is not None:
        label_parts.append(
            nodes.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "label": t["node"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
    raw = label_parts[0] if len(label_parts) == 1 else label_parts[0].union(*label_parts[1:])

    def bucket_labels(batch: pa.Table) -> pa.Table:
        b = _bucket(batch["node"].to_numpy(zero_copy_only=False), num_buckets)
        return batch.append_column("bucket", pa.array(b))

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False, sort=False)["label"].min()

    labels = (
        raw.map_batches(bucket_labels, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: min_per_node(df.drop(columns=["bucket"])), batch_format="pandas")
        .materialize()
    )
    prev_sum = labels.sum("label")

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["side"] == 0]
        edg = g[g["side"] == 1]
        # messages: label(src) → dst, pre-min-combined per dst inside the
        # bucket so at most one message row per (bucket, dst) shuffles on
        m = edg[["node", "dst"]].merge(lab[["node", "label"]], on="node", how="inner")
        msgs = m.groupby("dst", as_index=False, sort=False)["label"].min()
        msgs = msgs.rename(columns={"dst": "node"})
        return pd.concat([lab[["node", "label"]], msgs], ignore_index=True).astype(
            {"node": np.int64, "label": np.int64}
        )

    _nulls = lambda n: pa.nulls(n, type=pa.int64())  # noqa: E731

    def labels_and_pointer_edges(t: pa.Table) -> pa.Table:
        """Label rows (side 0) + pointer-jump edges (side 1).

        The pointer edge (src=label(v), dst=v) lets round r deliver
        label(label(v)) to v — short-cutting label chains so rounds are
        O(log diameter) instead of O(diameter) (the log-rounds trick of
        the hash-to-min family).  Self-pointers (label == node) are
        dropped — they'd be no-op messages."""
        node = t["node"].to_numpy(zero_copy_only=False)
        lbl = t["label"].to_numpy(zero_copy_only=False)
        ptr = lbl != node
        p_src, p_dst = lbl[ptr], node[ptr]
        return pa.table(
            {
                "node": pa.array(np.r_[node, p_src]),
                "dst": pa.concat_arrays(
                    [pa.nulls(len(node), type=pa.int64()), pa.array(p_dst)]
                ),
                "label": pa.concat_arrays(
                    [pa.array(lbl), pa.nulls(len(p_src), type=pa.int64())]
                ),
                "bucket": pa.array(
                    np.r_[_bucket(node, num_buckets), _bucket(p_src, num_buckets)]
                ),
                "side": pa.array(
                    np.r_[
                        np.zeros(len(node), dtype=np.int8),
                        np.ones(len(p_src), dtype=np.int8),
                    ]
                ),
            }
        )

    for _ in range(max_iters):
        # Both union sides carry the SAME schema (node, dst, label,
        # bucket, side): edges ride as (node=src, dst, label=null).
        lab_tagged = labels.map_batches(labels_and_pointer_edges, batch_format="pyarrow")
        edge_tagged = edges_b.map_batches(
            lambda t: pa.table(
                {
                    "node": t["src"],
                    "dst": t["dst"],
                    "label": _nulls(len(t)),
                    "bucket": t["bucket"],
                    "side": pa.array(np.ones(len(t), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        merged = (
            lab_tagged.union(edge_tagged)
            .groupby("bucket")
            .map_groups(lambda df: propagate(df.drop(columns=["bucket"])), batch_format="pandas")
        )
        labels = (
            merged.map_batches(bucket_labels, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda df: min_per_node(df.drop(columns=["bucket"])), batch_format="pandas"
            )
            .materialize()
        )
        new_sum = labels.sum("label")
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def canonical_per_component(labels, members, *, id_col: str, num_buckets: int = _N_BUCKETS):
    """Pick the canonical member (min id) per component and emit the
    drop-list: Dataset(node, component, keep:bool).

    ``labels`` is the connected_components output; ``members`` is unused
    metadata hook for future best-doc policies (kept simple: min id wins,
    which equals the component label itself — zero extra shuffles).
    """
    def mark(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch["node"], batch["component"])
        return batch.append_column("keep", keep)

    return labels.map_batches(mark, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PageRank (power iteration with broadcast ranks)
# ---------------------------------------------------------------------------


def pagerank(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    ckpt_dir: str | None = None,
):
    """Distributed PageRank → pandas DataFrame(node, rank).

    With ``ckpt_dir``, each sweep's rank vector checkpoints atomically
    and a rerun resumes after the last complete sweep
    (state/checkpoint.py), same as ``kmeans_fit``.

    The edge list is the big distributed side (streamed once per
    iteration from the object store after one ``materialize``); the
    rank vector is the small derived side (one float per node) and
    broadcasts per sweep exactly like k-means centroids.  Each batch
    emits partial per-destination contribution sums (vectorized
    ``np.bincount`` on factorized dst ids); ``grouped_aggregate`` folds
    them; dangling mass redistributes uniformly (standard Brin–Page
    handling).  Deterministic: fixed iteration count, float64, node
    order fixed by sorted factorization.

    At web scale the rank vector outgrows the object store before the
    edge list stops fitting the cluster — swap the broadcast for a
    bucketed src-join of (edges ⨝ ranks) and keep ranks as a Dataset;
    the per-sweep aggregate shape is unchanged.
    """
    from ..pipelines.tabular import grouped_aggregate
    from ..state.broadcast import Broadcast

    edges = edges.materialize()

    deg = (
        grouped_aggregate(edges, [src_col], {"deg": ("count", None)})
        .to_pandas()
    )
    def endpoints(t: pa.Table) -> pd.DataFrame:
        u = np.unique(
            np.concatenate(
                [
                    t[src_col].to_numpy(zero_copy_only=False),
                    t[dst_col].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pd.DataFrame({"node": u})

    nodes_pd = (
        grouped_aggregate(
            edges.map_batches(endpoints, batch_format="pyarrow"), ["node"], {"n": ("count", None)}
        )
        .to_pandas()
    )
    nodes = np.sort(nodes_pd["node"].to_numpy())
    n = len(nodes)
    rank = pd.Series(np.full(n, 1.0 / n), index=nodes)
    degs = pd.Series(deg["deg"].to_numpy(dtype=np.float64), index=deg[src_col]).reindex(
        nodes
    )  # NaN = dangling

    from ..state.checkpoint import iterate_with_checkpoint

    def sweep(rank_arr: np.ndarray, _i: int) -> np.ndarray:
        rank = pd.Series(rank_arr, index=nodes)
        share = (rank / degs).fillna(0.0)  # dangling nodes emit nothing here
        dangling = rank[degs.isna()].sum()
        handle = Broadcast(dict(zip(share.index, share.to_numpy())))

        def contrib(t: pa.Table) -> pd.DataFrame:
            m = handle.get()
            s = t[src_col].to_numpy(zero_copy_only=False)
            d = t[dst_col].to_numpy(zero_copy_only=False)
            w = np.fromiter((m[x] for x in s), dtype=np.float64, count=len(s))
            uniq, inv = np.unique(d, return_inverse=True)
            return pd.DataFrame({"node": uniq, "c": np.bincount(inv, weights=w)})

        got = (
            grouped_aggregate(
                edges.map_batches(contrib, batch_format="pyarrow"), ["node"], {"c": ("sum", "c")}
            )
            .to_pandas()
        )
        c = pd.Series(got["c"].to_numpy(), index=got["node"]).reindex(nodes).fillna(0.0)
        return ((1.0 - damping) / n + damping * (c + dangling / n)).to_numpy()

    final = iterate_with_checkpoint(rank.to_numpy(), sweep, iters, ckpt_dir=ckpt_dir)
    return pd.DataFrame({"node": nodes, "rank": np.round(final, 10)})


def pagerank_local(src: np.ndarray, dst: np.ndarray, *, damping: float = 0.85,
                   iters: int = 10) -> pd.DataFrame:
    """Single-process reference (test oracle) — same formula and
    iteration count as :func:`pagerank`."""
    nodes = np.sort(np.unique(np.concatenate([src, dst])))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = np.fromiter((idx[v] for v in src), dtype=np.int64, count=len(src))
    d = np.fromiter((idx[v] for v in dst), dtype=np.int64, count=len(dst))
    deg = np.bincount(s, minlength=n).astype(np.float64)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        share = np.where(deg > 0, rank / np.where(deg > 0, deg, 1.0), 0.0)
        dangling = rank[deg == 0].sum()
        c = np.bincount(d, weights=share[s], minlength=n)
        rank = (1.0 - damping) / n + damping * (c + dangling / n)
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 10)})


def label_propagation(
    edges,
    seeds: dict,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 10,
):
    """Semi-supervised label propagation over an undirected edge list:
    seed nodes carry fixed labels; each sweep every unlabeled node adopts
    the majority label among its labeled neighbors (ties → smallest
    label).  Returns pandas (node, label) for all nodes reached.

    Shape mirrors the PageRank sweep (stages/graph.py): the label map
    broadcasts via ``ray.put`` once per sweep, the edge list STREAMS —
    each batch emits per-(node, label) vote counts (the batch is the
    combiner) and one ``grouped_aggregate`` sum reduces them; the
    driver only folds the per-node majorities (bounded by the labeled
    frontier, not the edge count).  Converges when a sweep changes no
    label.  At corpora where the label map outgrows a broadcast, the
    same sweep runs with a bucketed label join — the edge-stream /
    vote-count shape is unchanged."""
    import pyarrow as pa

    from ..pipelines.tabular import grouped_aggregate
    from ..state.broadcast import Broadcast

    edges = edges.materialize()  # streamed once per sweep
    labels: dict[int, int] = {int(k): int(v) for k, v in seeds.items()}
    fixed = set(labels)

    for _ in range(max_iters):
        handle = Broadcast(labels)

        def votes(batch: pa.Table) -> pd.DataFrame:
            lm = handle.get()
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            # undirected: votes flow both ways
            frames = []
            for a, b in ((s, d), (d, s)):
                lab = pd.Series(a).map(lm)
                m = lab.notna().to_numpy()
                if m.any():
                    frames.append(
                        pd.DataFrame({"node": b[m], "label": lab[m].astype(np.int64)})
                    )
            if not frames:
                return pd.DataFrame({"node": [], "label": [], "n": []})
            df = pd.concat(frames, ignore_index=True)
            out = df.groupby(["node", "label"], as_index=False).size()
            return out.rename(columns={"size": "n"})

        counts = grouped_aggregate(
            edges.map_batches(votes, batch_format="pyarrow"),
            ["node", "label"],
            {"n": ("sum", "n")},
        ).to_pandas()
        if not len(counts):
            break
        best = (
            counts.sort_values(["node", "n", "label"], ascending=[True, False, True])
            .groupby("node", sort=False)
            .head(1)
        )
        changed = False
        for node, label in zip(best["node"].astype(int), best["label"].astype(int)):
            if node in fixed:
                continue
            if labels.get(node) != label:
                labels[node] = label
                changed = True
        if not changed:
            break
    return pd.DataFrame(
        {"node": list(labels.keys()), "label": list(labels.values())}
    ).sort_values("node").reset_index(drop=True)
