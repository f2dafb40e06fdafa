"""Composable tabular operators (SURVEY §2 inventory), Ray-Data-first.

Every wide operation here follows the scale rules from SURVEY §4/§7:
- aggregations pre-combine inside ``map_batches`` (one row per key per
  batch) before the global ``groupby`` — the shuffle moves partials, not
  rows;
- small dimension sides broadcast via :class:`~..state.broadcast.Broadcast`
  (``ray.put`` once) and join as per-batch pandas merges — no shuffle;
- top-k prefilters per batch before the global sort;
- splits are deterministic hash-threshold assignments (the scale-path
  equivalent of the reference's seeded shuffle+slice,
  /root/reference/tables/other/split.py:20-47 — see ``seeded_split``
  in functions for the exact pandas-parity variant).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast

# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    *,
    split: bool = False,
):
    """Read one testdata table, pruning columns at the read.

    ``split=True`` guarantees enough blocks to feed every core when the
    downstream stage is map-heavy.  Parquet reads can't split below a row
    group, and a single-file single-row-group table (the testdata shape)
    yields ONE block — every fused map after it runs serially.  We check
    the file metadata (footer only, no data read): if the source has
    fewer row groups than the target parallelism, repartition right after
    the read.  On a real multi-file corpus the row-group count exceeds
    the target and this is a no-op — no shuffle is added at scale.
    """
    import ray
    import ray.data as rd

    path = os.path.join(sf_dir, f"{name}.parquet")
    ds = rd.read_parquet(path, columns=columns)
    if split:
        import pyarrow.parquet as pq

        target = int(ray.cluster_resources().get("CPU", 8)) * 2
        if os.path.isfile(path):
            meta = pq.ParquetFile(path).metadata
            n_rgs = meta.num_row_groups
            # Right-size to the data (footer metadata only): a 64-way
            # split of a 100k-row table gives 1.5k-row blocks — too thin
            # for vectorized kernels, and every downstream sort exchange
            # pays blocks² scheduling.  ≥8k rows per block keeps kernels
            # amortized; the floor keeps small tables parallel.  On a
            # real multi-file corpus row groups exceed the target and
            # none of this runs.
            target = max(8, min(target, meta.num_rows // 8192))
        else:  # directory of shards: count files (≥1 row group each)
            n_rgs = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        if n_rgs < target:
            ds = ds.repartition(target)
    return ds


def read_table_arrow(sf_dir: str, name: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a SMALL dimension table (for broadcasting)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# grouped aggregation with per-batch partials (G4 pattern)
# ---------------------------------------------------------------------------

_PARTIALIZABLE = {"sum", "count", "min", "max"}


def grouped_aggregate(ds, keys: list[str], specs: dict[str, tuple[str, str | None]],
                      *, small_keys: bool = False):
    """groupby(keys) with partial per-batch combining.

    ``specs`` maps output column → (op, input column); op ∈ {sum, count,
    min, max, mean}.  ``mean`` is computed as sum(col)/count(col) at
    finalize — the count is of NON-NULL values of the source column, so
    it matches SQL avg() on tables with NULLs.  ``count`` means count(*)
    (rows per group, via the first key, which must be non-null).
    Returns a Dataset with columns keys + list(specs).

    ``small_keys=True`` is the bounded-domain fast path: when the CALLER
    knows the key domain is small (a status flag, a priority enum, a
    split name — a property of the query, not the data size), the final
    reduce skips Ray's sort-based Aggregate (a fixed ~0.8 s floor even
    on a few hundred partial rows) for a metadata-only coalesce plus one
    vectorized ``pa.TableGroupBy`` — the partial set is one row per key
    per block, so the coalesced block is |keys|×|blocks| rows at any
    corpus size.  Leave it False for open-domain keys (user ids, doc
    ids), where the distributed bucketed fold is the right shape."""
    partial_specs: dict[str, tuple[str, str]] = {}  # partial col -> (op, src)
    for out, (op, src) in specs.items():
        if op == "mean":
            partial_specs[f"__sum_{src}"] = ("sum", src)
            partial_specs[f"__cnt_{src}"] = ("count", src)
        elif op == "count":
            partial_specs["__cnt"] = ("count", keys[0])
        elif op in _PARTIALIZABLE:
            partial_specs[f"__{op}_{src}"] = (op, src)
        else:
            raise ValueError(f"unsupported op {op!r}")

    def combine(batch: pa.Table) -> pa.Table:
        aggs = []
        for pcol, (op, src) in partial_specs.items():
            aggs.append((src, op))
        grouped = pa.TableGroupBy(batch, keys).aggregate(aggs)
        renames = {f"{src}_{op}": pcol for pcol, (op, src) in partial_specs.items()}
        cols = [renames.get(c, c) for c in grouped.column_names]
        return grouped.rename_columns(cols)

    partials = ds.map_batches(combine, batch_format="pyarrow")

    if small_keys:
        # one coalesced block of partials, one vectorized group-combine —
        # same math as the Aggregate below, none of its sort machinery
        fold = {pcol: ("sum" if op in ("sum", "count") else op)
                for pcol, (op, _src) in partial_specs.items()}

        def final_combine(batch: pa.Table) -> pa.Table:
            grouped = pa.TableGroupBy(batch, keys).aggregate(
                [(pcol, op) for pcol, op in fold.items()]
            )
            renames = {f"{pcol}_{op}": pcol for pcol, op in fold.items()}
            return grouped.rename_columns(
                [renames.get(c, c) for c in grouped.column_names]
            )

        merged = partials.repartition(1).map_batches(
            final_combine, batch_format="pyarrow"
        )
    else:
        # Open-domain keys: ONE coarse key-hash exchange + a vectorized
        # pa.TableGroupBy combine per bucket.  Same exchange volume as
        # Ray's sort-based groupby().aggregate(Sum/Min/Max) but the
        # combine is columnar — Ray's generic Aggregate merges groups in
        # per-row Python (measured ~400 rows/s reducing a 145k-row
        # partial set; the columnar fold is >100× that).  A key lives in
        # exactly one bucket, so in-bucket totals are global totals.
        fold = {pcol: ("sum" if op in ("sum", "count") else op)
                for pcol, (op, _src) in partial_specs.items()}

        def add_kb(batch: pa.Table) -> pa.Table:
            h = np.zeros(len(batch), dtype=np.int64)
            for k in keys:
                h = h * np.int64(1000003) + _bucket_of_column(batch[k], 1 << 30)
            return batch.append_column(
                "__kb", pa.array((h % _KEY_BUCKETS).astype(np.int32))
            )

        def final_combine_bucket(batch: pa.Table) -> pa.Table:
            batch = batch.drop_columns(["__kb"])
            grouped = pa.TableGroupBy(batch, keys).aggregate(
                [(pcol, op) for pcol, op in fold.items()]
            )
            renames = {f"{pcol}_{op}": pcol for pcol, op in fold.items()}
            return grouped.rename_columns(
                [renames.get(c, c) for c in grouped.column_names]
            )

        merged = (
            partials.map_batches(add_kb, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(final_combine_bucket, batch_format="pyarrow")
        )

    def finalize(batch: pa.Table) -> pa.Table:
        out_cols: dict[str, pa.Array] = {k: batch[k] for k in keys}
        for out, (op, src) in specs.items():
            if op == "mean":
                s = batch[f"__sum_{src}"].to_numpy(zero_copy_only=False).astype(np.float64)
                c = batch[f"__cnt_{src}"].to_numpy(zero_copy_only=False).astype(np.float64)
                out_cols[out] = pa.array(s / c)
            elif op == "count":
                out_cols[out] = batch["__cnt"]
            else:
                out_cols[out] = batch[f"__{op}_{src}"]
        return pa.Table.from_arrays(list(out_cols.values()), names=list(out_cols.keys()))

    return merged.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# latest-per-group (G1) with per-batch combining
# ---------------------------------------------------------------------------


_KEY_BUCKETS = 64


def latest_per_key(ds, key: str, order_by: list[str], payload: list[str]):
    """Per key, the row with the lexicographically greatest ``order_by``
    tuple (reference G1 idxmax semantics with a deterministic tiebreak,
    /root/reference/tables/country_table.py:61-74).

    Two-level reduce: per-batch combine (one candidate per key per
    batch), then a shuffle on a COARSE key bucket — grouping on the raw
    key would schedule one map_groups call per key, and per-group
    overhead dominates when keys are numerous and groups tiny.  The
    in-bucket reduction is the same vectorized pandas groupby."""

    cols = [key, *order_by, *[c for c in payload if c not in order_by]]

    def local_best(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.sort_values([key, *order_by]).groupby(key, sort=False).tail(1).index
        return df.loc[idx, cols]

    def bucketed_best(df: pd.DataFrame) -> pd.DataFrame:
        out = local_best(df)
        out = out.copy()
        out["__bucket"] = pd.util.hash_array(out[key].to_numpy()) % _KEY_BUCKETS
        return out

    partials = ds.map_batches(bucketed_best, batch_format="pandas")
    merged = partials.groupby("__bucket").map_groups(local_best, batch_format="pandas")
    return merged.map_batches(lambda df: df[cols], batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast hash join (J1/J3/J4 equi-join flavor)
# ---------------------------------------------------------------------------


def broadcast_join(ds, dim: pa.Table, on: str, *, how: str = "inner"):
    """Join a big Dataset against a small broadcast dimension table."""
    handle = Broadcast(dim.to_pandas())

    def join(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(handle.get(), on=on, how=how)

    return ds.map_batches(join, batch_format="pandas")


def shuffle_join(
    left,
    right,
    on: str | list[str],
    *,
    how: str = "inner",
    num_buckets: int = 64,
    bucket_fn=None,
    sort_buckets: bool = False,
):
    """Big-big equi join: hash-partition BOTH sides on the join key and
    merge per bucket (the complement of :func:`broadcast_join`, for when
    neither side fits a broadcast).

    Shape: each side adds a bucket column (int keys: ``key %
    num_buckets``; otherwise a stable string hash), unions with a side
    tag over the combined column set, and ONE ``groupby(bucket)
    .map_groups`` runs a vectorized ``pandas.merge`` per bucket — each
    table moves across the cluster exactly once, co-partitioned by key.
    Non-key column names must be disjoint.

    Skew: coarse buckets bound per-group scheduling; a single hot key
    concentrates in one bucket — at production scale salt the hot keys
    (replicate the smaller side's hot-key rows across salts, as span
    reassembly does in stages/extract.py) before this operator.

    ``bucket_fn`` overrides the hash partitioner with a custom
    ``pa.Table → int32 array`` assignment (both sides must agree) —
    :func:`sortmerge_join` passes a range partitioner here.
    ``sort_buckets`` additionally key-sorts each bucket before the
    merge, yielding key-clustered output runs.
    """
    keys = [on] if isinstance(on, str) else list(on)

    def fields(ds) -> dict[str, pa.DataType]:
        sch = ds.schema()  # metadata-only; works for Arrow AND pandas blocks
        def to_arrow(t):
            if isinstance(t, pa.DataType):
                return t
            if np.dtype(t).kind == "O":  # pandas object column = strings
                return pa.string()
            return pa.from_numpy_dtype(np.dtype(t))

        return {n: to_arrow(t) for n, t in zip(sch.names, sch.types)}

    lfields, rfields = fields(left), fields(right)
    lcols, rcols = list(lfields), list(rfields)
    overlap = (set(lcols) & set(rcols)) - set(keys)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, got {sorted(overlap)}")
    payload_r = [c for c in rcols if c not in keys]
    payload_l = [c for c in lcols if c not in keys]
    arrow_types = dict(lfields)
    arrow_types.update(rfields)
    # pandas dtypes to restore after the in-bucket split: the union fills
    # the absent side's payload with nulls, which widens int columns to
    # float64 in the grouped frame
    _tmpl = (
        pa.schema([(c, arrow_types[c]) for c in keys + payload_l + payload_r])
        .empty_table()
        .to_pandas()
        .dtypes
    )

    def bucket_of(tbl: pa.Table) -> np.ndarray:
        if bucket_fn is not None:
            return bucket_fn(tbl)
        first = tbl[keys[0]]
        if pa.types.is_integer(first.type):
            h = first.to_numpy().astype(np.int64)
            for k in keys[1:]:
                h = h * np.int64(1000003) + tbl[k].to_numpy().astype(np.int64)
            return (h % num_buckets).astype(np.int32)
        import pyarrow.compute as pc

        joined = tbl[keys[0]].cast(pa.string())
        for k in keys[1:]:
            joined = pc.binary_join_element_wise(joined, tbl[k].cast(pa.string()), "\x1f")
        # pd.util.hash_array: vectorized siphash with a FIXED key — both
        # sides must bucket identically across worker processes, which
        # rules out Python's per-process-salted hash()
        h = pd.util.hash_array(np.asarray(joined.to_pandas(), dtype=object))
        return (h % num_buckets).astype(np.int32)

    out_order = keys + payload_l + payload_r  # identical schema on both sides

    def tag(tbl: pa.Table, is_left: bool) -> pa.Table:
        n = len(tbl)
        cols = {"bucket": pa.array(bucket_of(tbl)), "__side_l": pa.array(np.full(n, is_left))}
        own = set((payload_l if is_left else payload_r) + keys)
        for c in out_order:
            cols[c] = tbl[c] if c in own else pa.nulls(n, type=arrow_types[c])
        return pa.table(cols)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        is_l = df["__side_l"].to_numpy()
        lf = df.loc[is_l, keys + payload_l].astype({c: _tmpl[c] for c in keys + payload_l})
        rf = df.loc[~is_l, keys + payload_r].astype({c: _tmpl[c] for c in keys + payload_r})
        if sort_buckets:
            lf = lf.sort_values(keys, kind="stable")
            rf = rf.sort_values(keys, kind="stable")
        return lf.merge(rf, on=keys, how=how)

    tagged = left.map_batches(lambda t: tag(t, True), batch_format="pyarrow").union(
        right.map_batches(lambda t: tag(t, False), batch_format="pyarrow")
    )
    return tagged.groupby("bucket").map_groups(
        lambda df: merge(df.drop(columns=["bucket"])), batch_format="pandas"
    )


_BROADCAST_BUDGET_BYTES = 256 * 1024 * 1024


def join(left, right, on: str, *, how: str = "inner",
         broadcast_budget: int = _BROADCAST_BUDGET_BYTES,
         salt_hot_share: float | None = None, num_buckets: int = 64):
    """One front door for equi joins — picks the physical strategy from
    metadata, the way an optimizer's size estimate would:

    - right side under ``broadcast_budget`` (``Dataset.size_bytes()``,
      metadata-only for parquet reads) → :func:`broadcast_join` (zero
      shuffle; the dimension ships once via ``ray.put``);
    - otherwise, with ``salt_hot_share`` set → :func:`salted_join`
      (hash exchange + Misra-Gries hot-key salting);
    - otherwise → :func:`shuffle_join` (plain hash exchange).

    Returns ``(result, strategy)`` so callers and tests can assert the
    routing; pass the result straight through when the strategy tag is
    not needed."""
    try:
        rbytes = right.size_bytes()
    except Exception:
        rbytes = None
    if rbytes is not None and rbytes <= broadcast_budget:
        import ray

        tabs = ray.get(right.to_arrow_refs()) if ray.is_initialized() else [right.to_arrow()]
        # high-parallelism runs can emit zero-row blocks with an EMPTY
        # schema (e.g. a map_groups bucket that saw no rows) — drop them
        # before concat or the schema check rejects the whole dimension
        live = [t for t in tabs if t.num_rows > 0]
        if live:
            dim = pa.concat_tables(live)
            return broadcast_join(left, dim, on, how=how), "broadcast"
        # all-blocks-empty degenerate case: Dataset.schema() may itself
        # be None (a dataset of only zero-row empty-schema blocks) or
        # lack the join key — synthesize an empty dimension only when
        # the key is actually present; without it the join's output
        # schema is unknowable on ANY physical path, so fail loudly
        # instead of letting shuffle_join crash opaquely downstream
        sch = right.schema()
        names = list(getattr(sch, "names", []) or [])
        if on not in names:
            raise ValueError(
                f"join: right side is empty and its schema "
                f"{'is unknown' if not names else f'lacks the join key {on!r}'} "
                f"(columns={names}); cannot derive the join output schema"
            )
        dim = pa.schema(list(zip(names, sch.types))).empty_table()
        return broadcast_join(left, dim, on, how=how), "broadcast"
    if salt_hot_share is not None:
        return (
            salted_join(left, right, on, how=how, num_buckets=num_buckets,
                        hot_share=salt_hot_share),
            "salted",
        )
    return shuffle_join(left, right, on, how=how, num_buckets=num_buckets), "shuffle"


def detect_hot_keys(ds, column: str, *, hot_share: float = 0.01, m: int = 256) -> list:
    """Keys whose estimated frequency share exceeds ``hot_share``, via
    the Misra-Gries sketch (bounded m-row partials per batch, driver
    folds ``num_batches`` summaries).  Over-inclusion is harmless for
    salting — spreading a merely-warm key costs a few duplicate
    small-side rows — so the sketch's one-sided error needs no exact
    confirmation pass here."""
    from ..stages.sketch import heavy_hitters_mg

    summary, total = heavy_hitters_mg(
        ds, m, lambda b: b[column].to_numpy(zero_copy_only=False)
    )
    if not total:
        return []
    return [k for k, c in summary.items() if c >= hot_share * total]


def salted_join(
    left,
    right,
    on: str,
    *,
    how: str = "inner",
    num_buckets: int = 64,
    salts: int = 8,
    hot_keys: list | None = None,
    hot_share: float = 0.01,
):
    """:func:`shuffle_join` with hot-key salting — the skew mitigation
    its docstring prescribes, packaged: a single hot key (a crawl's top
    domain, a null-ish default id) otherwise lands every matching row
    in ONE bucket and serializes the merge on one task.

    Shape: hot keys come from one Misra-Gries pass over the left side
    (or pass ``hot_keys`` explicitly); hot LEFT rows spread across
    ``salts`` synthetic sub-keys round-robin, hot RIGHT rows REPLICATE
    once per salt (small side × salts rows, bounded by
    |hot right rows|·salts), and the join runs on the composite
    (key, salt) — each left row still meets each matching right row
    exactly once, so the result set is identical to the unsalted join
    while the hot key's work spreads over ``salts`` buckets.  Non-hot
    rows ride salt 0 untouched."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, on, hot_share=hot_share)
    if not hot_keys:
        return shuffle_join(left, right, on, how=how, num_buckets=num_buckets)
    hot_handle = Broadcast(pa.array(list(hot_keys)))

    def salt_left(batch: pa.Table) -> pa.Table:
        hot = pa.compute.is_in(batch[on], value_set=hot_handle.get()).to_numpy(
            zero_copy_only=False
        )
        salt = np.zeros(len(batch), dtype=np.int32)
        nh = int(hot.sum())
        if nh:
            # round-robin within the batch: perfectly balanced, and the
            # join result is salt-assignment-invariant so layout
            # dependence here is harmless
            salt[hot] = np.arange(nh, dtype=np.int32) % salts
        return batch.append_column("__salt", pa.array(salt))

    def salt_right(batch: pa.Table) -> pa.Table:
        hot = pa.compute.is_in(batch[on], value_set=hot_handle.get()).to_numpy(
            zero_copy_only=False
        )
        base = batch.append_column(
            "__salt", pa.array(np.zeros(len(batch), dtype=np.int32))
        )
        hot_idx = np.flatnonzero(hot)
        if not len(hot_idx):
            return base
        parts = [base]
        hot_rows = batch.take(pa.array(hot_idx))
        for s in range(1, salts):
            parts.append(
                hot_rows.append_column(
                    "__salt", pa.array(np.full(len(hot_idx), s, dtype=np.int32))
                )
            )
        return pa.concat_tables(parts)

    joined = shuffle_join(
        left.map_batches(salt_left, batch_format="pyarrow"),
        right.map_batches(salt_right, batch_format="pyarrow"),
        [on, "__salt"],
        how=how,
        num_buckets=num_buckets,
    )
    return joined.map_batches(
        lambda t: t.drop_columns(["__salt"]), batch_format="pyarrow"
    )


_SMJ_SAMPLE = 4096


def sortmerge_join(
    left,
    right,
    on: str,
    *,
    how: str = "inner",
    num_buckets: int = 64,
    sample_size: int = _SMJ_SAMPLE,
):
    """Range-partitioned sort-merge equi join on a numeric key — the
    TeraSort-shaped complement of :func:`shuffle_join`'s hash partitioner.

    Boundaries come from sampled key quantiles, not linspace: one
    streaming pass over the LEFT side keeps each batch's
    ``sample_size`` smallest seeded hash priorities (a bounded,
    layout-independent uniform sample — same A-Res trick as k-means
    init), and the driver's quantiles of that sample become the
    ``num_buckets−1`` interior boundaries.  Equal-count boundaries make
    the partitioner robust to key-RANGE skew (monotone ids, zipf
    values) where ``key % b`` stays balanced but ``linspace`` ranges
    collapse into one bucket.  Both sides then map to buckets with one
    vectorized ``searchsorted`` and the union/per-bucket machinery of
    :func:`shuffle_join` runs with in-bucket key sorts, so output runs
    are key-clustered — the property downstream merge consumers (as-of
    windows, range scans) rely on.
    """
    def sample_keys(batch: pa.Table) -> pd.DataFrame:
        k = batch[on].to_numpy(zero_copy_only=False)
        if k.dtype.kind not in "iuf":
            raise TypeError(
                f"sortmerge_join needs a numeric key, got {k.dtype} for {on!r}; "
                "use shuffle_join (hash partitioner) for string keys"
            )
        if not len(k):
            return pd.DataFrame({"prio": [], "key": []})
        # value-keyed priority (fixed-key siphash on the key's bit
        # pattern) — deterministic across block layouts; a distinct-value
        # spread sample is what boundary estimation needs
        bits = (k if k.dtype.kind in "iu" else k.astype(np.float64).view(np.uint64)).astype(np.uint64)
        pr = pd.util.hash_array(bits)
        take = min(sample_size, len(pr))
        idx = np.argpartition(pr, take - 1)[:take]
        return pd.DataFrame({"prio": pr[idx], "key": k[idx]})

    # second-level reduce stays distributed: the per-batch candidates
    # (≤ sample_size rows each) sort+limit in the cluster, so the driver
    # receives exactly sample_size rows no matter how many batches the
    # left side has (num_batches × sample_size would be a driver OOM at
    # corpus scale)
    cand = (
        left.map_batches(sample_keys, batch_format="pyarrow")
        .sort("prio")
        .limit(sample_size)
        .to_pandas()
    )
    qs = np.linspace(0, 1, num_buckets + 1)[1:-1]
    bounds = np.unique(np.quantile(cand["key"].to_numpy(), qs))

    def range_bucket(tbl: pa.Table) -> np.ndarray:
        k = tbl[on].to_numpy(zero_copy_only=False)
        return np.searchsorted(bounds, k, side="right").astype(np.int32)

    return shuffle_join(
        left, right, on, how=how, num_buckets=num_buckets,
        bucket_fn=range_bucket, sort_buckets=True,
    )


def _bucket_of_column(col, num_buckets: int) -> np.ndarray:
    """Stable bucket assignment for one key column (int: modulo; other:
    fixed-key siphash via ``pd.util.hash_array`` — process-salt-free, so
    both sides of an exchange agree)."""
    if pa.types.is_integer(col.type):
        return (
            col.to_numpy(zero_copy_only=False).astype(np.int64) % num_buckets
        ).astype(np.int32)
    h = pd.util.hash_array(np.asarray(col.to_pandas(), dtype=object))
    return (h % num_buckets).astype(np.int32)


def shuffle_semi_filter(ds, keys_ds, column: str, *, anti: bool = False,
                        num_buckets: int = 64):
    """Semi/anti filter where the key set is a DATASET — the big-key-set
    complement of :func:`broadcast_semi_filter`, for when the id list
    rivals the corpus (a dup-heavy crawl's loser set) and a driver
    collect + ``ray.put`` would not fit.

    Shape: both sides hash-bucket on ``column`` and union under one
    schema (key rows null-fill the payload columns), ONE
    ``groupby(bucket).map_groups`` applies the vectorized ``pc.is_in``
    membership rule per bucket — the corpus payload moves across the
    cluster exactly once, the key set once.  Groups stay Arrow
    end-to-end so payload types survive exactly (no pandas null
    widening)."""
    import pyarrow.compute as pc

    schema = ds.schema()

    def to_arrow(t):
        if isinstance(t, pa.DataType):
            return t
        if np.dtype(t).kind == "O":  # pandas object column = strings
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))

    types = {n: to_arrow(t) for n, t in zip(schema.names, schema.types)}
    out_cols = list(schema.names)

    def tag_data(t: pa.Table) -> pa.Table:
        n = len(t)
        cols = {c: t[c] for c in out_cols}
        cols["__bucket"] = pa.array(_bucket_of_column(t[column], num_buckets))
        cols["__is_key"] = pa.array(np.zeros(n, dtype=np.bool_))
        return pa.table(cols)

    def tag_keys(t: pa.Table) -> pa.Table:
        n = len(t)
        key = t[column].cast(types[column])
        cols = {c: (key if c == column else pa.nulls(n, type=types[c])) for c in out_cols}
        cols["__bucket"] = pa.array(_bucket_of_column(key, num_buckets))
        cols["__is_key"] = pa.array(np.ones(n, dtype=np.bool_))
        return pa.table(cols)

    tagged = ds.map_batches(tag_data, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_keys, batch_format="pyarrow")
    )

    def apply(t: pa.Table) -> pa.Table:
        is_key = t["__is_key"]
        keys = t.filter(is_key)[column].combine_chunks()
        data = t.filter(pc.invert(is_key))
        mask = pc.is_in(data[column], value_set=keys)
        if anti:
            mask = pc.invert(mask)
        return data.filter(mask).drop_columns(["__bucket", "__is_key"])

    return tagged.groupby("__bucket").map_groups(apply, batch_format="pyarrow")


def broadcast_semi_filter(ds, keys, column: str, *, anti: bool = False):
    """Semi/anti join against a broadcast key set (reference J2 resume
    anti-join, /root/reference/tables/paper_text_table.py:108-110).

    The key set ships once via ``ray.put`` as an Arrow array; each batch
    runs the vectorized ``pc.is_in`` kernel (hash-set probe in C++), not
    a per-row Python membership loop."""
    handle = Broadcast(pa.array(list(keys)))

    def flt(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch[column], value_set=handle.get())
        if anti:
            mask = pa.compute.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic hash split (T3, scale path)
# ---------------------------------------------------------------------------

#: lexicographic md5-hex thresholds ≈ 0.8 / 0.1 / 0.1 — identical logic is
#: expressible in ANSI SQL (md5(cast(key as varchar)) < 'cc…'), making the
#: split oracle-checkable; exact pandas-parity seeded splits for small
#: frames live in ``seeded_split`` below.
SPLIT_THRESHOLDS = (("train", "cc" * 16), ("test", "e6" * 16))


def _md5_hex(value: str) -> str:
    return hashlib.md5(value.encode("utf-8")).hexdigest()


def md5_digest_words(col) -> tuple[np.ndarray, np.ndarray]:
    """md5 digests of a column's decimal/string form as two big-endian
    uint64 arrays (hi, lo) — the vectorizable view of the hex string."""
    vals = col.cast(pa.string()).to_pylist()
    md5 = hashlib.md5
    buf = b"".join(md5(s.encode("utf-8")).digest() for s in vals)
    words = np.frombuffer(buf, dtype=">u8").reshape(-1, 2)
    return words[:, 0], words[:, 1]


def md5_lt_mask(col, hex_thr: str) -> np.ndarray:
    """Vectorized ``md5(cast(col as varchar)) < hex_thr`` — 128-bit compare
    of the digest, bit-identical to the SQL lexicographic hex compare."""
    hi, lo = md5_digest_words(col)
    thr_hi, thr_lo = _split_thr_u128(hex_thr)
    return (hi < thr_hi) | ((hi == thr_hi) & (lo < thr_lo))


def _split_thr_u128(hex_thr: str) -> tuple[int, int]:
    v = int(hex_thr, 16)
    return v >> 64, v & 0xFFFFFFFFFFFFFFFF


_THR_U128 = [(name, _split_thr_u128(thr)) for name, thr in SPLIT_THRESHOLDS]


def hash_split_batch(batch: pa.Table, key: str) -> pa.Table:
    """Append a ``split`` column via md5-threshold assignment.

    md5 itself has no Arrow kernel, so digests come from a tight
    ``hashlib`` loop, but the hex-string threshold comparison (the per-row
    inner loop in v1) is vectorized: each 16-byte digest is viewed as two
    big-endian uint64s and compared 128-bit-wise against the thresholds —
    bit-identical to the SQL ``md5(cast(key as varchar)) < 'cc…'`` rule."""
    hi, lo = md5_digest_words(batch[key])
    out = np.full(len(hi), "dev", dtype=object)
    assigned = np.zeros(len(hi), dtype=bool)
    for name, (thr_hi, thr_lo) in _THR_U128:
        lt = (hi < thr_hi) | ((hi == thr_hi) & (lo < thr_lo))
        out[lt & ~assigned] = name
        assigned |= lt
    return batch.append_column("split", pa.array(out, type=pa.string()))


def seeded_split(df: pd.DataFrame, train: float, test: float, dev: float, *, random_state: int = 42) -> dict[str, pd.DataFrame]:
    """Exact pandas-parity seeded shuffle + ratio slice (reference T3,
    /root/reference/tables/other/split.py:20-47): driver-side, for the
    small catalog frames the reference applies it to."""
    import math

    if any(r < 0 for r in (train, test, dev)):
        raise ValueError("ratios must be non-negative")
    if not math.isclose(train + test + dev, 1.0, rel_tol=1e-6, abs_tol=1e-6):
        raise ValueError("ratios must sum to 1.0")
    shuffled = df.sample(frac=1.0, random_state=random_state).reset_index(drop=True)
    n = len(shuffled)
    t_end = int(n * train)
    s_end = t_end + int(n * test)
    return {
        "train": shuffled.iloc[:t_end],
        "test": shuffled.iloc[t_end:s_end],
        "dev": shuffled.iloc[s_end:],
    }


# ---------------------------------------------------------------------------
# exact dedupe (G2) and top-k (T2)
# ---------------------------------------------------------------------------


def dedup_exact_min(ds, subset: str, id_col: str):
    """Exact dedupe on ``subset``, keeping the row with the minimal id.

    Per-batch combine first (one candidate per key per batch), then a
    coarse key-hash bucket reduce with a vectorized in-bucket groupby-min
    (Ray's built-in Aggregate merges per group in Python — measured
    ~25 s of remote CPU on a 300k-chunk partial set vs <0.1 s for the
    columnar fold) — reference G2 with deterministic keep rule
    (/root/reference/tables/hardware_table.py:78 keeps first occurrence;
    a distributed engine needs an order-free rule, so min-id)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(subset, as_index=False, sort=False)[[id_col]].min()

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = local(df)
        out["__bucket"] = pd.util.hash_array(out[subset].to_numpy()) % _KEY_BUCKETS
        return out

    partials = ds.map_batches(bucketed, batch_format="pandas")
    # local() projects to subset+id_col, so the bucket column drops itself
    return partials.groupby("__bucket").map_groups(local, batch_format="pandas")


def dedup_keep_best(ds, subset: str, id_col: str, score_col: str):
    """Exact dedupe on ``subset`` keeping the BEST-scoring row per key
    (tie → min id) — reference G3's dedupe-keep-best
    (/root/reference/run.py answer-dedupe semantics) lifted to corpus
    scale: among exact duplicates, survive the copy a quality model
    scores highest, not an arbitrary first occurrence.

    Same two-level shape as :func:`dedup_exact_min`: per-batch combine
    (one candidate per key per batch — shuffle volume is key-bounded),
    then a coarse key-hash bucket reduce re-applies the identical
    arg-best rule.  The rule is order-free, so partial/final composition
    is exact."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([subset, score_col, id_col], ascending=[True, False, True])
        return df.groupby(subset, sort=False).head(1)

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = local(df)
        return out.assign(
            __bucket=pd.util.hash_array(out[subset].to_numpy()) % _KEY_BUCKETS
        )

    partials = ds.map_batches(bucketed, batch_format="pandas")
    return partials.groupby("__bucket").map_groups(
        lambda df: local(df.drop(columns="__bucket")), batch_format="pandas"
    )


def top_k_per_group(ds, group: str, order_by: str, k: int, *, descending: bool = False):
    """Per group, the k rows with the smallest (or largest) ``order_by``
    — the per-domain document cap of crawl curation (keep k per host)
    and SQL ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY o) <= k``.

    Same two-level shape as :func:`latest_per_key` generalized to k:
    each batch keeps its local k per group (shuffle volume ≤ k rows per
    group per batch), then a coarse-bucket reduce re-applies the rule.
    ``order_by`` must be unique within a group for determinism.
    """

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([group, order_by], ascending=[True, not descending])
            .groupby(group, sort=False)
            .head(k)
        )

    def bucketed(df: pd.DataFrame) -> pd.DataFrame:
        out = local(df).copy()
        out["__bucket"] = pd.util.hash_array(out[group].to_numpy()) % _KEY_BUCKETS
        return out

    partials = ds.map_batches(bucketed, batch_format="pandas")
    merged = partials.groupby("__bucket").map_groups(local, batch_format="pandas")
    return merged.map_batches(lambda df: df.drop(columns="__bucket"), batch_format="pandas")


def topk(ds, col, k: int, *, descending=True):
    """Global top-k with per-batch prefilter before the sort.

    ``col``/``descending`` accept a single column or a list (mixed
    directions allowed) — ties broken by the later keys, so a unique
    trailing key makes the result deterministic.
    """
    cols = [col] if isinstance(col, str) else list(col)
    desc = [descending] * len(cols) if isinstance(descending, bool) else list(descending)
    asc = [not d for d in desc]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(cols, ascending=asc, kind="stable").head(k)

    return ds.map_batches(local, batch_format="pandas").sort(cols, descending=desc).limit(k)


def set_op(left, right, column: str, op: str):
    """Distributed distinct INTERSECT / EXCEPT on one key column
    (SURVEY §2g — the reference has no set ops; these complete the
    relational surface).

    Plan: each side's batches partially dedupe to (key, side-flag)
    rows — so at most one row per distinct key per batch crosses the
    wire, never the raw table — the union groups by key with max()
    side flags, and a final filter applies the membership rule.  One
    shuffle of distinct keys; both inputs stream.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be intersect|except, got {op!r}")

    def tag(l_flag: int, r_flag: int):
        def f(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    column: batch[column],
                    "__l": pa.array(np.full(len(batch), l_flag, dtype=np.int8)),
                    "__r": pa.array(np.full(len(batch), r_flag, dtype=np.int8)),
                }
            )
            g = pa.TableGroupBy(t, [column]).aggregate([("__l", "max"), ("__r", "max")])
            return g.rename_columns([column, "__l", "__r"])

        return f

    tagged = left.map_batches(tag(1, 0), batch_format="pyarrow").union(
        right.map_batches(tag(0, 1), batch_format="pyarrow")
    )
    def add_kb(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__kb", pa.array(_bucket_of_column(batch[column], _KEY_BUCKETS))
        )

    def fold(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.drop_columns(["__kb"]), [column]).aggregate(
            [("__l", "max"), ("__r", "max")]
        )
        return g.rename_columns([column, "__l", "__r"])

    # coarse key-hash bucket + columnar in-bucket max fold (Ray's
    # built-in Aggregate combine is per-group Python — see
    # grouped_aggregate for the measurement)
    merged = (
        tagged.map_batches(add_kb, batch_format="pyarrow")
        .groupby("__kb")
        .map_groups(fold, batch_format="pyarrow")
    )
    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        in_l = pc.equal(batch["__l"], 1)
        in_r = pc.equal(batch["__r"], 1)
        mask = pc.and_(in_l, in_r) if op == "intersect" else pc.and_(in_l, pc.invert(in_r))
        return batch.filter(mask).select([column])

    return merged.map_batches(keep, batch_format="pyarrow")


def interval_join(
    left,
    right,
    *,
    width: int,
    left_cols: tuple[str, str] = ("lo_a", "hi_a"),
    right_cols: tuple[str, str] = ("lo_b", "hi_b"),
    num_buckets: int = 64,
):
    """Big-big interval OVERLAP join (half-open ``[lo, hi)`` int64
    intervals, strict ``a.lo < b.hi AND b.lo < a.hi``) via time-chunk
    co-partitioning — the scale path ``q_range_join``'s docstring
    promises, as running code.

    Shape: each interval replicates to every ``width``-sized time chunk
    it overlaps (short intervals → 1-2 chunks); both sides then
    co-partition ONCE on the chunk id through :func:`shuffle_join`, the
    overlap predicate filters inside each co-partition, and every
    qualifying pair is attributed to exactly ONE chunk — the chunk
    containing ``max(lo_left, lo_right)``, which any overlapping pair
    shares — so pairs spanning several chunks dedupe with pure
    arithmetic, no second exchange.  Pick ``width`` a small multiple of
    the typical interval length: too small inflates replication, too
    large concentrates co-partitions (a hot time range is a hot chunk —
    salt it upstream like any hot key).

    The two sides' non-chunk columns must be disjoint (rename before
    calling, e.g. ``a_id``/``b_id``); ``left_cols`` / ``right_cols``
    name each side's (lo, hi) pair.
    """

    def replicate(lo_name: str, hi_name: str):
        def rep(batch: pa.Table) -> pa.Table:
            lo = batch[lo_name].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = batch[hi_name].to_numpy(zero_copy_only=False).astype(np.int64)
            first = lo // width
            last = (hi - 1) // width  # hi exclusive
            counts = (last - first + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])
            chunk = np.arange(offs[-1], dtype=np.int64) - offs[idx] + first[idx]
            out = batch.take(pa.array(idx))
            return out.append_column("chunk", pa.array(chunk))

        return rep

    l_lo, l_hi = left_cols
    r_lo, r_hi = right_cols
    lrep = left.map_batches(replicate(l_lo, l_hi), batch_format="pyarrow")
    rrep = right.map_batches(replicate(r_lo, r_hi), batch_format="pyarrow")
    joined = shuffle_join(lrep, rrep, "chunk", how="inner", num_buckets=num_buckets)

    def overlap(df: pd.DataFrame) -> pd.DataFrame:
        alo = df[l_lo].to_numpy(dtype=np.int64)
        ahi = df[l_hi].to_numpy(dtype=np.int64)
        blo = df[r_lo].to_numpy(dtype=np.int64)
        bhi = df[r_hi].to_numpy(dtype=np.int64)
        chunk = df["chunk"].to_numpy(dtype=np.int64)
        hit = (alo < bhi) & (blo < ahi) & (np.maximum(alo, blo) // width == chunk)
        return df.loc[hit].drop(columns=["chunk"])

    return joined.map_batches(overlap, batch_format="pandas")
