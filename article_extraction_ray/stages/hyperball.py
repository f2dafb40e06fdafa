"""HyperBall (Boldi & Vigna 2013, arXiv 1308.2144) — the web-scale
neighborhood-function / effective-diameter estimator: one HyperLogLog
counter per node, each sweep max-merges every node's counter with its
successors' counters, so after t sweeps counter(v) estimates
|ball(v, t)| and N(t) = Σ_v est(v) is the t-hop reachable-pair count.
This is THE published algorithm for diameter statistics on graphs too
large for exact BFS from every node (it ran the Facebook "four degrees
of separation" measurement).

Deterministic here: register assignments hash node ids with md5 (the
same device as the engine's split/coin oracles), so every run — and
both physical plans — produce byte-identical registers.

Two plans, routed by distinct-node count like pagerank/sssp:

- **broadcast** (≤ node budget): the (n × m) uint8 register matrix
  broadcasts per sweep; each edge batch emits per-src max-merge
  partials (vectorized ``np.maximum.reduceat`` over dst registers
  sorted by src) and the driver folds with one ``np.maximum.at``.
- **bucketed** (above it): registers stay a Dataset (node, m-byte
  binary).  Each sweep co-partitions (edges ⨝ state on dst) — the
  successor registers flow to their predecessors — then a two-level
  register-max fold (per-batch reduceat partial, one coarse-bucket
  exchange, final reduceat) merges per src, and an outer union-max
  with the previous state writes the new one.  Exact max-merge = the
  plans agree byte-for-byte (tests assert it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HYPERBALL_NODE_BUDGET = 5_000_000

#: default precision: 2^8 registers ≈ 6.5% relative standard error —
#: the accuracy/space point HyperBall itself recommends for diameter
#: work (the query layer can raise it).
DEFAULT_P = 8


def _init_registers(nodes: np.ndarray, m: int) -> np.ndarray:
    """(n × m) uint8 register matrix with each node's own hash set —
    ball(v, 0) = {v}.  Bucket/rank come from the md5 of the node id
    (deterministic, engine-standard)."""
    from ..pipelines.tabular import md5_digest_words

    hi, lo = md5_digest_words(pa.array(nodes))
    bucket = (hi % np.uint64(m)).astype(np.int64)
    w = (lo >> np.uint64(32)).astype(np.uint64)  # top 32 bits of lo
    _mant, expo = np.frexp(w.astype(np.float64))
    bitlen = np.where(w > 0, expo, 0).astype(np.int64)  # exact via frexp
    rank = (33 - bitlen).astype(np.uint8)  # leading zeros in 32 bits + 1
    regs = np.zeros((len(nodes), m), dtype=np.uint8)
    regs[np.arange(len(nodes)), bucket] = rank
    return regs


def _estimate(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimate per row with the small-range (linear
    counting) correction — deterministic float64."""
    m = regs.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = alpha * m * m / inv
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, est)


def _max_partial(src: np.ndarray, regs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group rows by src and register-max them: sort once, ONE
    ``np.maximum.reduceat`` over the whole (rows × m) matrix."""
    order = np.argsort(src, kind="stable")
    s = src[order]
    r = regs[order]
    starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    return s[starts], np.maximum.reduceat(r, starts, axis=0)


def hyperball(
    edges,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    t_max: int = 8,
    p: int = DEFAULT_P,
    node_budget: int = HYPERBALL_NODE_BUDGET,
    path: str = "auto",
) -> pd.DataFrame:
    """Neighborhood function of the directed graph → DataFrame
    (t, n_pairs_est) for t = 0..t_max, n_pairs_est rounded to 1 dp.
    est(t) ≈ Σ_v |ball(v, t)| — the reachable-pair count within t hops.
    """
    from ..pipelines.tabular import grouped_aggregate
    from ..state.broadcast import Broadcast

    m = 1 << p
    edges = edges.materialize()

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
        return _hyperball_bucketed(
            edges, nodes_ds, t_max=t_max, m=m, src_col=src_col, dst_col=dst_col
        )

    nodes = np.sort(nodes_ds.to_pandas()["node"].to_numpy(dtype=np.int64))
    regs = _init_registers(nodes, m)
    out = [(0, float(np.round(_estimate(regs).sum(), 1)))]

    for t in range(1, t_max + 1):
        handle = Broadcast((nodes, regs))

        def sweep(tbl: pa.Table) -> pd.DataFrame:
            keys, rmat = handle.get()
            s = tbl[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = tbl[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            si = np.searchsorted(keys, s)
            di = np.searchsorted(keys, d)
            gs, gr = _max_partial(si, rmat[di])
            return pd.DataFrame({"i": gs, "regs": [r.tobytes() for r in gr]})

        got = edges.map_batches(sweep, batch_format="pyarrow").to_pandas()
        new = regs.copy()
        if len(got):
            idx = got["i"].to_numpy(dtype=np.int64)
            rm = np.frombuffer(b"".join(got["regs"]), dtype=np.uint8).reshape(-1, m)
            np.maximum.at(new, idx, rm)
        if np.array_equal(new, regs):
            out += [(tt, out[-1][1]) for tt in range(t, t_max + 1)]
            break
        regs = new
        out.append((t, float(np.round(_estimate(regs).sum(), 1))))

    return pd.DataFrame(out, columns=["t", "n_pairs_est"])


def _hyperball_bucketed(edges, nodes_ds, *, t_max, m, src_col, dst_col) -> pd.DataFrame:
    """Registers stay a Dataset; per sweep: (edges ⨝ state on dst) →
    per-batch reduceat partials → ONE coarse-bucket exchange → final
    reduceat → union-max with the previous state."""
    from ..pipelines.tabular import grouped_aggregate, shuffle_join

    def init_state(t: pa.Table) -> pa.Table:
        nd = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        regs = _init_registers(nd, m)
        return pa.table(
            {"node": pa.array(nd), "regs": pa.array([r.tobytes() for r in regs], type=pa.binary(m))}
        )

    state = nodes_ds.map_batches(init_state, batch_format="pyarrow").materialize()

    def est_total(st) -> float:
        def part(t: pa.Table) -> pd.DataFrame:
            regs = np.frombuffer(b"".join(t["regs"].to_pylist()), dtype=np.uint8).reshape(-1, m)
            return pd.DataFrame({"s": [_estimate(regs).sum()]})

        return float(np.round(st.map_batches(part, batch_format="pyarrow").to_pandas()["s"].sum(), 1))

    out = [(0, est_total(state))]

    for t in range(1, t_max + 1):
        as_dst = state.map_batches(
            lambda tb: pa.table({dst_col: tb["node"], "regs": tb["regs"]}),
            batch_format="pyarrow",
        )
        flowed = shuffle_join(edges, as_dst, dst_col, how="inner")

        def partial(df: pd.DataFrame) -> pa.Table:
            src = df[src_col].to_numpy(dtype=np.int64)
            regs = np.frombuffer(b"".join(df["regs"]), dtype=np.uint8).reshape(-1, m)
            gs, gr = _max_partial(src, regs)
            return pa.table(
                {"node": pa.array(gs), "regs": pa.array([r.tobytes() for r in gr], type=pa.binary(m)),
                 "__kb": pa.array((gs % 64).astype(np.int32))}
            )

        def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
            nd = df["node"].to_numpy(dtype=np.int64)
            regs = np.frombuffer(b"".join(df["regs"]), dtype=np.uint8).reshape(-1, m)
            gs, gr = _max_partial(nd, regs)
            return pd.DataFrame({"node": gs, "regs": [r.tobytes() for r in gr]})

        merged = (
            flowed.map_batches(partial, batch_format="pandas")
            .groupby("__kb")
            .map_groups(lambda df: bucket_max(df.drop(columns=["__kb"])), batch_format="pandas")
        )

        def outer_max(df: pd.DataFrame) -> pd.DataFrame:
            return bucket_max(df)

        both = state.union(
            merged.map_batches(
                lambda df: pa.table(
                    {"node": pa.array(df["node"].to_numpy(dtype=np.int64)),
                     "regs": pa.array([bytes(r) for r in df["regs"]], type=pa.binary(m))}
                ),
                batch_format="pandas",
            )
        )

        def rebucket(tb: pa.Table) -> pa.Table:
            nd = tb["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return tb.append_column("__kb", pa.array((nd % 64).astype(np.int32)))

        state = (
            both.map_batches(rebucket, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(lambda df: outer_max(df.drop(columns=["__kb"])), batch_format="pandas")
            .map_batches(
                lambda df: pa.table(
                    {"node": pa.array(df["node"].to_numpy(dtype=np.int64)),
                     "regs": pa.array([bytes(r) for r in df["regs"]], type=pa.binary(m))}
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        out.append((t, est_total(state)))

    return pd.DataFrame(out, columns=["t", "n_pairs_est"])


def effective_diameter(nf: pd.DataFrame, *, q: float = 0.9) -> int:
    """Smallest t with N(t) ≥ q·N(t_max) — the standard effective-
    diameter readout of the neighborhood function."""
    target = q * float(nf["n_pairs_est"].iloc[-1])
    hit = nf[nf["n_pairs_est"] >= target]
    return int(hit["t"].iloc[0])
