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
        # coalesce to a fixed block count before materializing: the
        # union adds the edge blocks to the label blocks every round,
        # so without this the label block count grows by |edge blocks|
        # per round and scheduling cost compounds (see _pagerank_bucketed)
        import ray as _ray

        _blocks = max(2, int(_ray.cluster_resources().get("CPU", 8)) * 2)
        labels = (
            merged.map_batches(bucket_labels, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda df: min_per_node(df.drop(columns=["bucket"])), batch_format="pandas"
            )
            .repartition(_blocks)
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


#: node count above which the rank vector stops broadcasting and the
#: bucketed node-state join path runs instead.  A 5M-node rank dict is
#: ~0.5 GB pickled — past the point where shipping it to every worker
#: each sweep beats one extra co-partitioned exchange.
PAGERANK_NODE_BUDGET = 5_000_000

#: block budget for edge lists that iterative sweep loops (pagerank,
#: label propagation, BFS) re-scan every iteration: enough blocks to
#: keep every core busy on one box, few enough that 8-10 re-scans
#: aren't task-launch-bound.  Web scale: edge lists above the node
#: budget take the bucketed paths, which manage their own block counts.
_SWEEP_EDGE_BLOCKS = 16


def pagerank(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    ckpt_dir: str | None = None,
    node_budget: int = PAGERANK_NODE_BUDGET,
    path: str = "auto",
    restart_node: int | None = None,
):
    """Distributed PageRank → pandas DataFrame(node, rank).

    ``restart_node`` switches to PERSONALIZED PageRank: the teleport
    vector concentrates on that one node (rank starts as e_s, the
    (1−d) restart mass and the dangling mass both teleport to the
    source instead of spreading uniformly) — the random-walk-with-
    restart proximity measure recommender/similarity pipelines use.
    Both physical plans honor it; ``None`` keeps the standard uniform
    teleport, byte-identical to before.

    With ``ckpt_dir``, each sweep's rank vector checkpoints atomically
    and a rerun resumes after the last complete sweep
    (state/checkpoint.py), same as ``kmeans_fit``.

    Two physical plans, routed by the DISTRIBUTED distinct node count
    (one scalar ``count()``, no node drain before routing):

    - **broadcast** (≤ ``node_budget`` nodes): the rank vector is one
      float per node and broadcasts per sweep exactly like k-means
      centroids; each edge batch emits partial per-destination
      contribution sums (vectorized ``np.bincount`` on factorized dst
      ids) and ``grouped_aggregate`` folds them.
    - **bucketed** (above it — the web-scale path): the rank vector
      NEVER leaves the cluster.  Node state (node, rank, deg) stays a
      Dataset; each sweep co-partitions (edges ⨝ state) on ``src`` via
      ``shuffle_join``, the per-dst vote aggregate is unchanged, and a
      second co-partitioned join writes the new state.  Only two
      scalars (dangling mass, node count) touch the driver per sweep.
      Checkpoints are per-sweep parquet state dirs with atomic done
      markers instead of pickled vectors.

    ``path="broadcast"|"bucketed"`` forces a plan (tests assert the two
    produce identical ranks).  Dangling mass redistributes uniformly
    (standard Brin–Page handling).  Deterministic: fixed iteration
    count, float64, output rounded to 10 decimals.
    """
    from ..pipelines.tabular import grouped_aggregate
    from ..state.broadcast import Broadcast

    edges = edges.materialize()

    deg_ds = grouped_aggregate(edges, [src_col], {"deg": ("count", None)})

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

    nodes_ds = (
        grouped_aggregate(
            edges.map_batches(endpoints, batch_format="pyarrow"), ["node"], {"n": ("count", None)}
        )
        .select_columns(["node"])
        .materialize()
    )
    n = nodes_ds.count()
    if path == "bucketed" or (path == "auto" and n > node_budget):
        return _pagerank_bucketed(
            edges, nodes_ds, deg_ds, n,
            src_col=src_col, dst_col=dst_col,
            damping=damping, iters=iters, ckpt_dir=ckpt_dir,
            restart_node=restart_node,
        )

    # the sweep loop re-scans the edge list once per iteration, so the
    # per-sweep task count is block count × iters; inherited read splits
    # are sized for ONE-shot scans — a metadata-only coalesce (paid once,
    # amortized over all sweeps) bounds the re-scan overhead
    if edges.num_blocks() > _SWEEP_EDGE_BLOCKS:
        edges = edges.repartition(_SWEEP_EDGE_BLOCKS).materialize()

    deg = deg_ds.to_pandas()
    nodes = np.sort(nodes_ds.to_pandas()["node"].to_numpy())
    if restart_node is None:
        restart = np.full(n, 1.0 / n)  # uniform teleport (standard)
    else:
        restart = (nodes == restart_node).astype(np.float64)
        if restart.sum() == 0.0:
            raise ValueError(f"restart_node {restart_node} is not in the graph")
    rank = pd.Series(restart.copy(), index=nodes)
    degs = pd.Series(deg["deg"].to_numpy(dtype=np.float64), index=deg[src_col]).reindex(
        nodes
    )  # NaN = dangling

    from ..state.checkpoint import iterate_with_checkpoint

    def sweep(rank_arr: np.ndarray, _i: int) -> np.ndarray:
        rank = pd.Series(rank_arr, index=nodes)
        share = (rank / degs).fillna(0.0)  # dangling nodes emit nothing here
        dangling = rank[degs.isna()].sum()
        # broadcast (sorted node ids, aligned share values): the per-batch
        # lookup is then ONE vectorized searchsorted instead of a Python
        # dict walk over every edge (measured hot path at 600k edges/sweep)
        handle = Broadcast((np.asarray(nodes), share.to_numpy()))

        def contrib(t: pa.Table) -> pd.DataFrame:
            keys, vals = handle.get()
            s = t[src_col].to_numpy(zero_copy_only=False)
            d = t[dst_col].to_numpy(zero_copy_only=False)
            w = vals[np.searchsorted(keys, s)]  # every src IS a node
            uniq, inv = np.unique(d, return_inverse=True)
            return pd.DataFrame({"node": uniq, "c": np.bincount(inv, weights=w)})

        # broadcast path = n ≤ node_budget, so the per-batch partials
        # (≤ n rows per block) drain straight to the driver and fold in
        # one vectorized groupby — skipping the distributed exchange
        # saves a whole plan launch per sweep (measured ~2× sweep time;
        # the bucketed path above the budget keeps the exchange)
        got = edges.map_batches(contrib, batch_format="pyarrow").to_pandas()
        c = got.groupby("node")["c"].sum().reindex(nodes).fillna(0.0)
        if restart_node is None:
            # classic uniform teleport — expression kept EXACTLY as
            # before ((1-d)/n, dangling/n) so ranks stay bit-identical
            # to the oracle's float sequence
            return ((1.0 - damping) / n + damping * (c + dangling / n)).to_numpy()
        # personalized: restart mass AND dangling mass land on the source
        return (1.0 - damping) * restart + damping * (c.to_numpy() + dangling * restart)

    final = iterate_with_checkpoint(rank.to_numpy(), sweep, iters, ckpt_dir=ckpt_dir)
    return pd.DataFrame({"node": nodes, "rank": np.round(final, 10)})


def _latest_state_sweep(ckpt_dir) -> tuple[int, str] | None:
    """(sweep, path) of the newest COMPLETE parquet state checkpoint."""
    import os
    import re

    if not os.path.isdir(ckpt_dir):
        return None
    best: tuple[int, str] | None = None
    for name in os.listdir(ckpt_dir):
        m = re.match(r"^state-(\d+)$", name)
        full = os.path.join(ckpt_dir, name)
        if m and os.path.exists(os.path.join(full, "_DONE")):
            i = int(m.group(1))
            if best is None or i > best[0]:
                best = (i, full)
    return best


def _save_state_sweep(ckpt_dir: str, sweep: int, state) -> None:
    """Write a sweep's node-state Dataset as a parquet checkpoint with an
    atomic done marker (same tmp-then-rename discipline as lineage)."""
    import os
    import shutil

    final = os.path.join(ckpt_dir, f"state-{sweep}")
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    state.write_parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    with open(os.path.join(final, "_DONE"), "w") as fh:
        fh.write("ok")
    # keep only the two newest complete sweeps
    import re

    sweeps = sorted(
        int(m.group(1))
        for m in (re.match(r"^state-(\d+)$", f) for f in os.listdir(ckpt_dir))
        if m
    )
    for old in sweeps[:-2]:
        shutil.rmtree(os.path.join(ckpt_dir, f"state-{old}"), ignore_errors=True)


def _pagerank_bucketed(
    edges,
    nodes_ds,
    deg_ds,
    n: int,
    *,
    src_col: str,
    dst_col: str,
    damping: float,
    iters: int,
    ckpt_dir: str | None,
    num_buckets: int = _N_BUCKETS,
    restart_node: int | None = None,
):
    """PageRank with node state as a co-partitioned Dataset — the path
    :func:`pagerank` routes to when the rank vector outgrows a
    broadcast.  Node state (node, rank, deg[null=dangling]) never
    drains to the driver; each sweep is

        state → share(node, rank/deg)
              ⨝ edges on src          (hash exchange, co-partitioned)
              → per-dst vote partials → grouped sum  (aggregate shape
                                        identical to the broadcast path)
              ⨝ state on node          (right join keeps vote-less nodes)
              → new state

    Only the dangling-mass scalar folds on the driver per sweep.  With
    ``ckpt_dir`` each sweep's state lands as an atomic parquet dir and
    a rerun resumes after the newest complete one.  Same formula,
    float64, output rounded to 10 decimals — tests assert rank equality
    vs the broadcast plan on the same graph."""
    from ..pipelines.tabular import grouped_aggregate, shuffle_join

    # state: (node, rank, deg) — deg null ⇒ dangling
    deg_named = deg_ds.map_batches(
        lambda t: pa.table({"node": t[src_col], "deg": t["deg"]}),
        batch_format="pyarrow",
    )
    # deg must be float64 in EVERY block (null ⇒ NaN ⇒ dangling): a
    # bucket with no dangling nodes would otherwise keep int64 and the
    # per-block schemas diverge
    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        if restart_node is None:
            r = np.full(len(df), 1.0 / n)
        else:
            r = (df["node"].to_numpy() == restart_node).astype(np.float64)
        return df.assign(deg=df["deg"].astype(np.float64), rank=r)

    state = shuffle_join(
        nodes_ds, deg_named, "node", how="left", num_buckets=num_buckets
    ).map_batches(init_rank, batch_format="pandas")

    start = 0
    if ckpt_dir is not None:
        found = _latest_state_sweep(ckpt_dir)
        if found is not None:
            import ray.data as rd

            start = found[0] + 1
            state = rd.read_parquet(found[1])

    # fixed state block count per sweep: the per-sweep joins emit one
    # block per (input block ∪ bucket), so without a coalesce the state
    # block count DOUBLES every sweep — exponential scheduling cost by
    # sweep 8.  A metadata-only coalesce (repartition without shuffle)
    # pins it to ~2 blocks/CPU.
    import ray

    state_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)) * 2)

    base = (1.0 - damping) / n
    for i in range(start, iters):
        state = state.repartition(state_blocks).materialize()

        def partial_dangling(t: pa.Table) -> pd.DataFrame:
            deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            r = t["rank"].to_numpy(zero_copy_only=False)
            return pd.DataFrame({"d": [float(r[np.isnan(deg)].sum())]})

        dangling = float(
            state.map_batches(partial_dangling, batch_format="pyarrow")
            .to_pandas()["d"].sum()
        )

        def share_of(t: pa.Table) -> pa.Table:
            deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            r = t["rank"].to_numpy(zero_copy_only=False)
            s = np.where(np.isnan(deg), 0.0, r / np.where(np.isnan(deg), 1.0, deg))
            return pa.table({src_col: t["node"], "share": pa.array(s)})

        share = state.map_batches(share_of, batch_format="pyarrow")
        contrib_edges = shuffle_join(
            edges, share, src_col, how="inner", num_buckets=num_buckets
        )

        def vote(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(dst_col, as_index=False)["share"].sum()
            return out.rename(columns={dst_col: "node", "share": "c"})

        contrib = grouped_aggregate(
            contrib_edges.map_batches(vote, batch_format="pandas"),
            ["node"],
            {"c": ("sum", "c")},
        )
        joined = shuffle_join(
            contrib,
            state.select_columns(["node", "deg"]),
            "node",
            how="right",
            num_buckets=num_buckets,
        )

        def update(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy(dtype=np.float64)
            c = np.where(np.isnan(c), 0.0, c)
            if restart_node is None:
                new_rank = base + damping * (c + dangling / n)
            else:
                e_s = (df["node"].to_numpy() == restart_node).astype(np.float64)
                new_rank = (1.0 - damping) * e_s + damping * (c + dangling * e_s)
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "deg": df["deg"].astype(np.float64),
                    "rank": new_rank,
                }
            )

        state = joined.map_batches(update, batch_format="pandas")
        if ckpt_dir is not None:
            state = state.materialize()
            _save_state_sweep(ckpt_dir, i, state)

    out = state.select_columns(["node", "rank"]).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    out["rank"] = np.round(out["rank"].to_numpy(), 10)
    return out


def pagerank_local(src: np.ndarray, dst: np.ndarray, *, damping: float = 0.85,
                   iters: int = 10, restart_node: int | None = None) -> pd.DataFrame:
    """Single-process reference (test oracle) — same formula and
    iteration count as :func:`pagerank`, including the personalized
    restart variant."""
    nodes = np.sort(np.unique(np.concatenate([src, dst])))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = np.fromiter((idx[v] for v in src), dtype=np.int64, count=len(src))
    d = np.fromiter((idx[v] for v in dst), dtype=np.int64, count=len(dst))
    deg = np.bincount(s, minlength=n).astype(np.float64)
    restart = (
        None if restart_node is None else (nodes == restart_node).astype(np.float64)
    )
    rank = np.full(n, 1.0 / n) if restart is None else restart.copy()
    for _ in range(iters):
        share = np.where(deg > 0, rank / np.where(deg > 0, deg, 1.0), 0.0)
        dangling = rank[deg == 0].sum()
        c = np.bincount(d, weights=share[s], minlength=n)
        if restart is None:
            rank = (1.0 - damping) / n + damping * (c + dangling / n)
        else:
            rank = (1.0 - damping) * restart + damping * (c + dangling * restart)
    return pd.DataFrame({"node": nodes, "rank": np.round(rank, 10)})


def label_propagation(
    edges,
    seeds: dict,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 10,
    node_budget: int = PAGERANK_NODE_BUDGET,
    path: str = "auto",
):
    """Semi-supervised label propagation over an undirected edge list:
    seed nodes carry fixed labels; each sweep every unlabeled node adopts
    the majority label among its labeled neighbors (ties → smallest
    label).  Returns pandas (node, label) for all nodes reached.

    Routed like :func:`pagerank` (edge count as the metadata-only
    proxy for the eventual label-map size):

    - **broadcast** (small graphs): the label map broadcasts via
      ``ray.put`` once per sweep, the edge list STREAMS — each batch
      emits per-(node, label) vote counts (the batch is the combiner)
      and the bounded partials drain straight to a driver groupby fold
      (same shape as :func:`pagerank`'s broadcast sweep — no
      distributed exchange per sweep under the budget).
    - **bucketed** (above ``node_budget`` edges — the web-scale path):
      the label map stays a Dataset (node, label, fixed); each sweep
      co-partitions (edges ⨝ labels) on the voting endpoint, the vote
      aggregate is unchanged, the per-node majority is a distributed
      two-level reduce, and an outer co-partitioned join merges new
      labels into the state.  Only the changed-count scalar reaches
      the driver.  Vote counts are integers so both plans are exactly
      equal — tests assert it.

    Converges when a sweep changes no label."""
    import pyarrow as pa

    from ..state.broadcast import Broadcast

    edges = edges.materialize()  # streamed once per sweep
    if path == "bucketed" or (path == "auto" and edges.count() > node_budget):
        return _label_propagation_bucketed(
            edges, seeds, src_col=src_col, dst_col=dst_col, max_iters=max_iters
        )
    # bound the per-sweep re-scan task count (see _SWEEP_EDGE_BLOCKS)
    if edges.num_blocks() > _SWEEP_EDGE_BLOCKS:
        edges = edges.repartition(_SWEEP_EDGE_BLOCKS).materialize()

    labels: dict[int, int] = {int(k): int(v) for k, v in seeds.items()}
    fixed = set(labels)

    for _ in range(max_iters):
        # broadcast (sorted labeled-node ids, aligned labels): per-batch
        # lookup is one vectorized searchsorted + equality mask instead of
        # a Python dict walk over every vote (2 × edges per sweep)
        lkeys = np.array(sorted(labels), dtype=np.int64)
        lvals = np.array([labels[k] for k in lkeys], dtype=np.int64)
        handle = Broadcast((lkeys, lvals))

        def votes(batch: pa.Table) -> pd.DataFrame:
            keys, vals = handle.get()
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            # undirected: votes flow both ways
            frames = []
            for a, b in ((s, d), (d, s)):
                if len(keys) == 0:
                    continue
                idx = np.minimum(np.searchsorted(keys, a), len(keys) - 1)
                m = keys[idx] == a
                if m.any():
                    frames.append(
                        pd.DataFrame({"node": b[m], "label": vals[idx[m]]})
                    )
            if not frames:
                return pd.DataFrame({"node": [], "label": [], "n": []})
            df = pd.concat(frames, ignore_index=True)
            out = df.groupby(["node", "label"], as_index=False).size()
            return out.rename(columns={"size": "n"})

        # broadcast path = graph under node_budget, so the per-batch
        # vote partials (≤ distinct (node,label) pairs per block) drain
        # straight to the driver and fold in one vectorized groupby —
        # same shape as pagerank's broadcast sweep; skipping the
        # distributed exchange saves a whole plan launch per sweep
        # (the bucketed path above the budget keeps the exchange)
        got = edges.map_batches(votes, batch_format="pyarrow").to_pandas()
        if not len(got):
            break
        counts = got.groupby(["node", "label"], as_index=False)["n"].sum()
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


def _label_propagation_bucketed(
    edges,
    seeds: dict,
    *,
    src_col: str,
    dst_col: str,
    max_iters: int,
    num_buckets: int = _N_BUCKETS,
):
    """Label propagation with the label map as a co-partitioned Dataset
    — the path :func:`label_propagation` routes to when the label map
    outgrows a broadcast.  State (node, label, fixed) never drains to
    the driver inside the loop; each sweep is

        state(voters) ⨝ undirected edges on the voting endpoint
          → per-(node,label) vote partials → grouped integer sum
          → distributed per-node majority (max n, tie min label)
          ⨝ state on node (outer)  → merged new state + changed flags

    Only the changed-count scalar folds on the driver per sweep.  Vote
    counts are integers, so the result is EXACTLY equal to the
    broadcast plan (tests assert frame equality)."""
    import ray.data as rd

    from ..pipelines.tabular import grouped_aggregate, latest_per_key, shuffle_join

    # undirected: votes flow both ways; materialize the doubled view once
    def reverse(t: pa.Table) -> pa.Table:
        return pa.table({src_col: t[dst_col], dst_col: t[src_col]})

    und = edges.union(edges.map_batches(reverse, batch_format="pyarrow")).materialize()

    state = rd.from_pandas(
        pd.DataFrame(
            {
                "node": [int(k) for k in seeds],
                "label": [int(v) for v in seeds.values()],
                "fixed": np.ones(len(seeds), dtype=np.int8),
            }
        )
    ).repartition(max(2, min(num_buckets // 8, len(seeds))))

    for _ in range(max_iters):
        state = state.materialize()

        def voter(t: pa.Table) -> pa.Table:
            return pa.table({src_col: t["node"], "label": t["label"]})

        voted = shuffle_join(
            und,
            state.map_batches(voter, batch_format="pyarrow"),
            src_col,
            how="inner",
            num_buckets=num_buckets,
        )

        def count_votes(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby([dst_col, "label"], as_index=False).size()
            return out.rename(columns={dst_col: "node", "size": "n"})

        counts = grouped_aggregate(
            voted.map_batches(count_votes, batch_format="pandas"),
            ["node", "label"],
            {"n": ("sum", "n")},
        )

        def negate(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy(zero_copy_only=False)
            return t.append_column("neg_label", pa.array(-lab))

        majority = latest_per_key(
            counts.map_batches(negate, batch_format="pyarrow"),
            "node",
            ["n", "neg_label"],
            ["label"],
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "vote": t["label"]}),
            batch_format="pyarrow",
        )

        merged = shuffle_join(
            majority, state, "node", how="outer", num_buckets=num_buckets
        )

        def apply_votes(df: pd.DataFrame) -> pd.DataFrame:
            vote = df["vote"].to_numpy(dtype=np.float64)
            old = df["label"].to_numpy(dtype=np.float64)
            fixed = np.nan_to_num(df["fixed"].to_numpy(dtype=np.float64)) > 0
            has_vote = ~np.isnan(vote)
            take = has_vote & ~fixed & (np.isnan(old) | (vote != old))
            new_label = np.where(take, vote, old)
            return pd.DataFrame(
                {
                    "node": df["node"].astype(np.int64),
                    "label": new_label.astype(np.int64),
                    "fixed": fixed.astype(np.int8),
                    "changed": take.astype(np.int8),
                }
            )

        # coalesce to a fixed block count: join outputs otherwise double
        # the state's block count every sweep (see _pagerank_bucketed)
        import ray

        state_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)) * 2)
        new_state = (
            merged.map_batches(apply_votes, batch_format="pandas")
            .repartition(state_blocks)
            .materialize()
        )
        changed = int(
            new_state.map_batches(
                lambda df: pd.DataFrame({"c": [int(df["changed"].sum())]}),
                batch_format="pandas",
            ).to_pandas()["c"].sum()
        )
        state = new_state.select_columns(["node", "label", "fixed"])
        if changed == 0:
            break

    out = state.select_columns(["node", "label"]).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def triangle_count(edges, *, src_col: str = "src", dst_col: str = "dst",
                   num_buckets: int = _N_BUCKETS,
                   driver_edge_budget: int = DRIVER_EDGE_BUDGET) -> int:
    """Triangle count over an undirected edge Dataset — the classic
    graph-quality metric (clustering coefficient numerator) for
    link/citation/dedup-pair graphs.

    Routing mirrors :func:`connected_components`: edge lists under
    ``driver_edge_budget`` collapse on the driver (ids only) and count
    via one vectorized pandas wedge-merge + sorted ``np.isin`` closure
    probe — three distributed exchanges of tiny data would otherwise
    cost ~6 s of fixed all-to-all floors.  Above the budget the
    distributed plan runs (the standard MapReduce triangle
    enumeration): canonicalize each edge to (a < b) and dedupe; JOIN
    edges with themselves on the middle vertex (``shuffle_join``
    co-partitions both sides once) to enumerate wedges a<b<c; then one
    bucketed semi-join of the wedge's closing pair (a, c) against the
    edge set — wedges whose closure exists are triangles, counted once
    each thanks to the a<b<c orientation.  Nothing drains to the
    driver except the final scalar.

    Skew note: id-orientation bounds wedge fan-out by max out-degree in
    id order; for power-law graphs the standard upgrade is DEGREE
    orientation (orient every edge low-degree → high-degree, bounding
    wedges by arboricity) — one extra degree-count pass, same joins.
    """
    import pyarrow.compute as pc

    from ..pipelines.tabular import grouped_aggregate, shuffle_join

    _SHIFT64 = np.int64(1) << np.int64(32)

    if edges.count() <= driver_edge_budget:
        tbl = pa.concat_tables(
            list(
                edges.select_columns([src_col, dst_col]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            )
        )
        s = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        a = np.minimum(s[keep], d[keep])
        b = np.maximum(s[keep], d[keep])
        ekeys = np.unique(a * _SHIFT64 + b)
        a, b = ekeys // _SHIFT64, ekeys % _SHIFT64
        e = pd.DataFrame({"a": a, "b": b})
        wedges = e.merge(e.rename(columns={"a": "b", "b": "c"}), on="b")
        wkeys = wedges["a"].to_numpy() * _SHIFT64 + wedges["c"].to_numpy()
        return int(np.isin(wkeys, ekeys, assume_unique=False).sum())

    def canon(t: pa.Table) -> pa.Table:
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        # per-batch dedupe (the global dedupe happens in the groupby)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    e = grouped_aggregate(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"], {"one": ("count", None)}
    ).select_columns(["a", "b"]).materialize()

    # wedges: (a,b) ⋈ (b,c) on the shared middle vertex b
    left = e.map_batches(lambda t: pa.table({"mid": t["b"], "a": t["a"]}), batch_format="pyarrow")
    right = e.map_batches(lambda t: pa.table({"mid": t["a"], "c": t["b"]}), batch_format="pyarrow")
    wedges = shuffle_join(left, right, "mid", how="inner", num_buckets=num_buckets)

    _SHIFT = np.int64(1) << np.int64(32)

    def wedge_key(df: pd.DataFrame) -> pa.Table:
        a = df["a"].to_numpy(dtype=np.int64)
        c = df["c"].to_numpy(dtype=np.int64)
        return pa.table({"k": pa.array(a * _SHIFT + c)})

    def edge_key(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(a * _SHIFT + b)})

    from ..pipelines.tabular import shuffle_semi_filter

    closed = shuffle_semi_filter(
        wedges.map_batches(wedge_key, batch_format="pandas"),
        e.map_batches(edge_key, batch_format="pyarrow"),
        "k",
        num_buckets=num_buckets,
    )
    return int(closed.count())


# ---------------------------------------------------------------------------
# Bounded-hop weighted shortest paths (multi-source Bellman-Ford)
# ---------------------------------------------------------------------------

#: distinct-node count above which SSSP keeps the distance vector as a
#: co-partitioned Dataset instead of a per-sweep broadcast (same budget
#: rationale as PageRank: one int64 per node; past ~5M nodes the vector
#: outgrows a sane driver/object-store broadcast).
SSSP_NODE_BUDGET = PAGERANK_NODE_BUDGET

#: sentinel "unreached" distance — large enough to dominate any real
#: path cost, small enough that sentinel + max-weight never overflows
#: int64 during a relaxation.
_SSSP_INF = np.int64(np.iinfo(np.int64).max // 4)


def sssp(
    edges,
    seeds,
    *,
    iters: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    node_budget: int = SSSP_NODE_BUDGET,
    path: str = "auto",
):
    """Bounded-hop multi-source weighted shortest paths → DataFrame
    (node, dist) for every node REACHED within ``iters`` edge hops of
    any seed (directed edges, non-negative int64 weights).

    Each Bellman-Ford sweep relaxes every edge once, so after sweep k
    the distance vector holds the exact min-cost over all paths of ≤ k
    edges — the standard Pregel/delta-stepping convergence contract.
    Weights and distances stay int64 throughout: results are exact, no
    float rounding policy needed.

    Two physical plans, routed by the distributed distinct-node count
    (same geometry as :func:`pagerank`):

    - **broadcast** (≤ ``node_budget`` nodes): the distance vector
      broadcasts per sweep via ``ray.put``; each edge batch emits
      per-destination candidate-min partials (vectorized
      ``np.minimum.at`` over factorized dst ids) that drain to one
      driver fold.  Early-exits when a sweep changes nothing (bit-equal
      to running all ``iters`` sweeps, since relaxation is monotone).
    - **bucketed** (above it — the web-scale path): the distance vector
      never leaves the cluster.  State (node, dist) co-partitions with
      edges on ``src`` via ``shuffle_join``; candidates union with the
      previous state and a grouped min writes the new state.  Nothing
      but the plan handle touches the driver per sweep.

    ``path="broadcast"|"bucketed"`` forces a plan (tests assert the two
    produce identical distances).
    """
    import ray.data as rd

    from ..pipelines.tabular import grouped_aggregate
    from ..state.broadcast import Broadcast

    edges = edges.materialize()
    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seeds.size == 0:
        raise ValueError("sssp needs at least one seed node")

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

    nodes_ds = (
        grouped_aggregate(
            edges.map_batches(endpoints, batch_format="pyarrow"), ["node"], {"n": ("count", None)}
        )
        .select_columns(["node"])
        .materialize()
    )
    n = nodes_ds.count()
    if path == "bucketed" or (path == "auto" and n > node_budget):
        return _sssp_bucketed(
            edges, nodes_ds, seeds,
            iters=iters, src_col=src_col, dst_col=dst_col, w_col=w_col,
        )

    # sweep loop re-scans the edge list once per iteration (see pagerank)
    if edges.num_blocks() > _SWEEP_EDGE_BLOCKS:
        edges = edges.repartition(_SWEEP_EDGE_BLOCKS).materialize()

    nodes = np.sort(nodes_ds.to_pandas()["node"].to_numpy(dtype=np.int64))
    dist = np.full(n, _SSSP_INF, dtype=np.int64)
    seed_idx = np.searchsorted(nodes, seeds)
    in_graph = (seed_idx < n) & (nodes[np.minimum(seed_idx, n - 1)] == seeds)
    dist[seed_idx[in_graph]] = 0

    for _ in range(iters):
        handle = Broadcast((nodes, dist))

        def relax(t: pa.Table) -> pd.DataFrame:
            keys, dvec = handle.get()
            s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            w = t[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sd = dvec[np.searchsorted(keys, s)]  # every src IS a node
            live = sd < _SSSP_INF
            if not live.any():
                return pd.DataFrame({"node": np.empty(0, np.int64), "c": np.empty(0, np.int64)})
            cand = sd[live] + w[live]
            uniq, inv = np.unique(d[live], return_inverse=True)
            best = np.full(uniq.size, _SSSP_INF, dtype=np.int64)
            np.minimum.at(best, inv, cand)
            return pd.DataFrame({"node": uniq, "c": best})

        # ≤ n rows per block: partials drain straight to the driver fold
        got = edges.map_batches(relax, batch_format="pyarrow").to_pandas()
        if len(got) == 0:
            break
        folded = got.groupby("node")["c"].min()
        new = dist.copy()
        idx = np.searchsorted(nodes, folded.index.to_numpy(dtype=np.int64))
        np.minimum.at(new, idx, folded.to_numpy(dtype=np.int64))
        if np.array_equal(new, dist):
            break  # monotone relaxation: a fixed point stays fixed
        dist = new

    reached = dist < _SSSP_INF
    return pd.DataFrame({"node": nodes[reached], "dist": dist[reached]})


def _sssp_bucketed(edges, nodes_ds, seeds, *, iters, src_col, dst_col, w_col):
    """Co-partitioned Bellman-Ford: state (node, dist) stays a Dataset;
    each sweep is state ⨝ edges on src → candidate (dst, dist+w) →
    union with prior state → grouped min.  Exact int64 arithmetic, so
    the result is EXACTLY equal to the broadcast plan."""
    from ..pipelines.tabular import grouped_aggregate, shuffle_join
    from ..state.broadcast import Broadcast

    seed_bc = Broadcast(seeds)

    def init_state(t: pa.Table) -> pa.Table:
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_seed = np.isin(nd, seed_bc.get())
        d = np.where(is_seed, np.int64(0), _SSSP_INF)
        return pa.table({"node": pa.array(nd), "dist": pa.array(d)})

    state = nodes_ds.map_batches(init_state, batch_format="pyarrow")

    def as_src(t: pa.Table) -> pa.Table:
        return pa.table({src_col: t["node"], "dist": t["dist"]})

    for _ in range(iters):
        state = state.materialize()
        joined = shuffle_join(
            state.map_batches(as_src, batch_format="pyarrow"),
            edges,
            src_col,
            how="inner",
        )

        def candidates(df: pd.DataFrame) -> pa.Table:
            sd = df["dist"].to_numpy(dtype=np.int64)
            live = sd < _SSSP_INF
            d = df[dst_col].to_numpy(dtype=np.int64)[live]
            w = df[w_col].to_numpy(dtype=np.int64)[live]
            return pa.table({"node": pa.array(d), "dist": pa.array(sd[live] + w)})

        cand = joined.map_batches(candidates, batch_format="pandas")
        state = grouped_aggregate(
            state.union(cand), ["node"], {"dist": ("min", "dist")}
        )

    out = state.map_batches(
        lambda t: t.filter(
            pa.compute.less(t["dist"], pa.scalar(int(_SSSP_INF), type=pa.int64()))
        ),
        batch_format="pyarrow",
    ).to_pandas()
    return out.sort_values("node").reset_index(drop=True)
