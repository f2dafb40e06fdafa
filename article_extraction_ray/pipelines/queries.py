"""Query registry: each implemented operator as a callable over an sf_dir,
with (where expressible) a matching ANSI-SQL oracle for DuckDB.

This is the driver-facing correctness surface (see __ray_entry__.py):
per query the driver runs the Ray pipeline AND the SQL on the same
parquet tables and compares row count + schema + value hash.  Column
names are kept identical on both sides.

Float policy: aggregates whose evaluation order differs between engines
(big sums/averages) are rounded on BOTH sides; arithmetic that is
bit-identical by construction (same IEEE op sequence) is left raw.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.matching import build_country_index, select_country_id
from ..functions.numeric import parse_numeric
from ..functions.physics import DEFAULT_MFU, DEFAULT_PUE, derive_physics_arrays
from ..functions.urls import resolve_url
from ..state.broadcast import Broadcast
from .tabular import (
    SPLIT_THRESHOLDS,
    broadcast_join,
    broadcast_semi_filter,
    dedup_exact_min,
    grouped_aggregate,
    hash_split_batch,
    latest_per_key,
    read_table,
    read_table_arrow,
)

# ---------------------------------------------------------------------------
# G4 — grouped aggregation with per-batch partial combining
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary (reference G4 stats pattern)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("l_discprice", disc)

    ds = ds.filter(expr="l_quantity < 30").map_batches(derive, batch_format="pyarrow")
    out = grouped_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "sum_base_price": ("sum", "l_extendedprice"),
            "sum_disc_price": ("sum", "l_discprice"),
            "avg_qty": ("mean", "l_quantity"),
            "count_order": ("count", None),
        },
        small_keys=True,
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_base_price"] = df["sum_base_price"].round(2)
        df["sum_disc_price"] = df["sum_disc_price"].round(2)
        df["avg_qty"] = df["avg_qty"].round(6)
        return df

    return out.map_batches(rounded, batch_format="pandas")


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                  AS sum_qty,
       round(sum(l_extendedprice), 2)                   AS sum_base_price,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6)                        AS avg_qty,
       count(*)                                         AS count_order
FROM lineitem WHERE l_quantity < 30
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# G1 — latest-per-group with deterministic tiebreak
# ---------------------------------------------------------------------------


def q_latest_event_per_user(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])
    return latest_per_key(ds, "user_id", ["ts", "event_id"], ["event_type", "value"])


SQL_LATEST_EVENT = """
SELECT user_id, ts, event_id, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

#: dimension rows above which an FK keyset stops broadcasting and the
#: orphan/dangling count routes through the co-partitioned anti-join
#: (shared by q_validate_orders and q_fk_audit)
FK_DIM_BUDGET = 20_000_000


def q_validate_orders(sf_dir: str):
    return _validate_orders(sf_dir)


def _validate_orders(sf_dir: str, *, dim_budget: int = FK_DIM_BUDGET):
    """Data-quality validation gate (expectations audit): per-rule
    violation counts over orders — non-negative price, bounded date
    range, non-null priority, duplicate order keys, dangling customer
    FK.  Row rules are one vectorized per-batch pass emitting a single
    count row per rule (a fixed-width partial regardless of batch
    size); uniqueness reuses the dedup-count shape (per-batch key
    value_counts → grouped sum → count of keys seen >1).  The FK rule
    routes like `_fk_audit`: keyset broadcast at or under ``dim_budget``
    dimension rows (footer metadata), co-partitioned shuffle anti-join
    count above it (``dim_budget=0`` parity pytest).  The gate a
    100 TB ingest runs before promoting a snapshot."""
    import os

    import pyarrow.compute as pc

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        split=True,
    )
    from ..sources.io import corpus_num_rows

    dim_rows = corpus_num_rows(os.path.join(sf_dir, "customer.parquet"))
    fk_broadcast = dim_rows is not None and dim_rows <= dim_budget
    if fk_broadcast:
        cust = read_table_arrow(sf_dir, "customer", ["c_custkey"])
        ckeys = Broadcast(cust["c_custkey"].combine_chunks())

    def row_rules(batch: pa.Table) -> pd.DataFrame:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        rules = ["negative_price", "null_orderdate"]
        bad = [int((price < 0).sum()), int(batch["o_orderdate"].null_count)]
        if fk_broadcast:
            fk_ok = pc.is_in(batch["o_custkey"], value_set=ckeys.get()).to_numpy(
                zero_copy_only=False
            )
            rules.append("dangling_custkey")
            bad.append(int((~fk_ok).sum()))
        return pd.DataFrame({"rule": rules, "n_bad": bad})

    counts = grouped_aggregate(
        ds.map_batches(row_rules, batch_format="pyarrow"), ["rule"], {"n_violations": ("sum", "n_bad")},
        small_keys=True,
    )
    if not fk_broadcast:
        # co-partitioned anti-join count (dimension outgrew the budget)
        import ray.data as rd

        from .tabular import shuffle_semi_filter

        dim_ds = read_table(sf_dir, "customer", columns=["c_custkey"], split=True).map_batches(
            lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
        )
        n_dangling = int(
            shuffle_semi_filter(
                ds.select_columns(["o_custkey"]), dim_ds, "o_custkey", anti=True
            ).count()
        )
        counts = counts.union(
            rd.from_arrow(
                pa.table(
                    {"rule": ["dangling_custkey"], "n_violations": pa.array([n_dangling], type=pa.int64())}
                )
            )
        )

    def key_counts(batch: pa.Table) -> pd.DataFrame:
        # per-batch combiner: one (key, count) row per distinct key, plus
        # the coarse bucket so the reduce is a 64-way exchange of
        # partials, not a per-key sort-aggregate over every orderkey
        vc = pd.Series(batch["o_orderkey"].to_numpy(zero_copy_only=False)).value_counts()
        k = vc.index.to_numpy()
        return pd.DataFrame({"k": k, "c": vc.to_numpy(), "bucket": (k % 64).astype(np.int32)})

    def bucket_dups(df: pd.DataFrame) -> pd.DataFrame:
        total = df.groupby("k", sort=False)["c"].sum()
        return pd.DataFrame(
            {"rule": ["duplicate_orderkey"], "n_bad": [int((total > 1).sum())]}
        )

    dup_partials = (
        ds.map_batches(key_counts, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: bucket_dups(df.drop(columns=["bucket"])), batch_format="pandas")
    )
    dup_count = grouped_aggregate(
        dup_partials, ["rule"], {"n_violations": ("sum", "n_bad")},
        small_keys=True,
    )
    return counts.union(dup_count)


SQL_VALIDATE_ORDERS = """
SELECT 'negative_price' AS rule, CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) AS n_violations FROM orders
UNION ALL
SELECT 'null_orderdate', CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) FROM orders
UNION ALL
SELECT 'dangling_custkey', CAST(count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) FROM orders
UNION ALL
SELECT 'duplicate_orderkey', CAST(count(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
"""


def _value_hist(ds, column: str) -> tuple[np.ndarray, np.ndarray]:
    """Exact (sorted value, count) histogram of a bounded-precision
    column — (value, count) partials only, never rows."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(batch[column].to_numpy(zero_copy_only=False)).value_counts()
        return pd.DataFrame({"v": vc.index, "cnt": vc.to_numpy()})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("v", as_index=False)["cnt"]
        .sum()
        .sort_values("v")
    )
    return hist["v"].to_numpy(dtype=np.float64), hist["cnt"].to_numpy(dtype=np.int64)


def q_robust_zscore(sf_dir: str):
    """Robust (median/MAD) z-score per row — outlier-resistant feature
    scaling where mean/stddev would be dragged by the tails.  Two
    streaming histogram passes (2-decimal prices → exact mergeable
    (value, count) partials, the `outlier_filter` machinery): median
    from pass one, MAD = median(|x − med|) from pass two, then one
    vectorized map divides.  Both engines evaluate the identical final
    expression from the same two doubles, so no rounding is needed."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"], split=True)

    vals, cnts = _value_hist(ds, "l_extendedprice")
    med = _quantile_from_hist(vals, cnts, 0.5)

    def absdev(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays([pa.array(np.abs(p - med))], names=["dev"])

    dvals, dcnts = _value_hist(ds.map_batches(absdev, batch_format="pyarrow"), "dev")
    mad = _quantile_from_hist(dvals, dcnts, 0.5)

    def z(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        # MAD == 0 (half the values identical): DuckDB emits NULL for
        # x/0.0 while numpy would emit ±inf — mirror with NaN ≡ NULL
        rz = (p - med) / mad if mad > 0 else np.full(len(p), np.nan)
        return pa.Table.from_arrays(
            [batch["l_orderkey"], batch["l_linenumber"], pa.array(rz)],
            names=["l_orderkey", "l_linenumber", "robust_z"],
        )

    return ds.map_batches(z, batch_format="pyarrow")


SQL_ROBUST_ZSCORE = """
WITH m AS (SELECT quantile_cont(l_extendedprice, 0.5) AS med FROM lineitem),
d AS (SELECT quantile_cont(abs(l_extendedprice - med), 0.5) AS mad FROM lineitem, m)
SELECT l_orderkey, l_linenumber, (l_extendedprice - med) / mad AS robust_z
FROM lineitem, m, d
"""


_RAG_DIM = 64
_RAG_QUERIES = ("the fast key order", "spark window scan", "image token table")


def _rag_chunk_vectors(sf_dir: str):
    """Chunk the corpus and embed every chunk (deterministic hash
    encoder stand-in, per-actor cache) → materialized Dataset(vec_id,
    embedding) — the shared front half of `rag_index_search` and
    `rag_recall_gate`."""
    from ..pipelines.eval import _HashEncoder

    chunks = q_chunk_documents(sf_dir)
    dim = _RAG_DIM

    class EmbedStage:
        def __init__(self):
            self.enc = _HashEncoder(dim)
            self.cache: dict[str, np.ndarray] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["chunk_text"].to_pylist()
            missing = [t for t in texts if t not in self.cache]
            if missing:
                for t, v in zip(missing, self.enc.encode(missing)):
                    self.cache[t] = v
            mat = (
                np.stack([self.cache[t] for t in texts]) if texts else np.zeros((0, dim))
            )
            key = (
                batch["doc_id"].to_numpy(zero_copy_only=False) * 1_000_000
                + batch["chunk_idx"].to_numpy(zero_copy_only=False)
            )
            emb = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel()), dim)
            return pa.Table.from_arrays([pa.array(key), emb], names=["vec_id", "embedding"])

    return chunks.map_batches(
        EmbedStage, concurrency=2, batch_size=512, batch_format="pyarrow"
    ).materialize()


def q_rag_index_search(sf_dir: str):
    """End-to-end RAG index build + search — the vector-pipeline
    composite: overlap-chunk the corpus (`chunk_documents` kernel) →
    embed each chunk in an actor-pool stage (deterministic hash
    encoder stand-in behind the production ``encode(list[str])``
    protocol; per-actor cache) → fit IVF-PQ on the chunk embeddings →
    persist the index to parquet (`save_pq_index`) → reload and search
    3 fixed queries through the compressed-domain scan + exact refine.
    Every stage is individually tested; this query proves they compose
    as one pipeline.  Rows-only at the driver, with retrieval accuracy
    value-gated by `rag_recall_gate`."""
    import os
    import tempfile

    from ..pipelines.eval import _HashEncoder
    from ..stages.clustering import kmeans_fit
    from ..stages.pq import knn_ivfpq, load_pq_index, pq_fit, save_pq_index

    vecs = _rag_chunk_vectors(sf_dir)
    coarse = kmeans_fit(vecs, 8, iters=3, cache=False)
    books = pq_fit(vecs, m=8, ksub=16, iters=3, coarse=coarse)
    # private per-run index path: a fixed per-scale file would race
    # write-vs-reload between concurrent runs (the snapshot_reads
    # advice class); the persist/reload round-trip is what's under
    # test, not cross-run caching
    fd, idx_path = tempfile.mkstemp(prefix="ae_rag_index_", suffix=".parquet")
    os.close(fd)
    try:
        save_pq_index(idx_path, books, coarse)
        books2, coarse2 = load_pq_index(idx_path)
    finally:
        os.unlink(idx_path)

    enc = _HashEncoder(_RAG_DIM)
    queries = enc.encode(list(_RAG_QUERIES))
    out = knn_ivfpq(
        vecs, queries, np.arange(3), k=5, nprobe=4, index=(coarse2, books2), refine=4
    )
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


def _ensure_smallfiles_layout(sf_dir: str) -> str:
    """Cached 24-small-file orders layout under /tmp (private build +
    atomic publish: a concurrent run at the same scale either wins the
    rename or reads the winner's complete layout)."""
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(tempfile.gettempdir(), f"ae_smallfiles_{tag}")
    if not os.path.isdir(src) or not any(f.endswith(".parquet") for f in os.listdir(src)):
        stage = tempfile.mkdtemp(prefix=f"ae_smallfiles_{tag}_stage_")
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True)\
            .repartition(24).write_parquet(stage)
        try:
            os.rename(stage, src)  # atomic publish; loser keeps winner's
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    return src


def q_compact_roundtrip(sf_dir: str):
    """Small-files compaction, driver-visible (state/compact.py): the
    orders table rewrites as 24 deliberately small files, compaction
    bin-packs them into ~target-size outputs, and the summary row
    (files_in, files_out, rows) proves row preservation.  Deterministic
    (FFD packing on sizes, fixed input); cached per scale factor.
    Content preservation is the value-oracled `compact_checksum`."""
    import os
    import tempfile

    import ray.data as rd

    from ..state.compact import compact_parquet

    src = _ensure_smallfiles_layout(sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    # compaction output must be private per run: compact_parquet
    # rewrites dst, and two concurrent runs at the same scale would
    # race delete-vs-read on a shared fixed path (the snapshot_reads
    # advice class)
    dst = tempfile.mkdtemp(prefix=f"ae_compacted_{tag}_")
    try:
        summary = compact_parquet(src, dst, target_bytes=4 * 1024 * 1024)
    finally:
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
    # SQL-oracled shape (round-4 verdict item 5): rows is the exact
    # orders count DuckDB recomputes; files_in is the fixed 24-file
    # layout by construction; the bin-packing payoff folds to a boolean
    # (exact files_out depends on byte sizes, a layout property pinned
    # by tests/test_compact.py)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "files_in": [np.int64(summary["files_in"])],
                "compacted_fewer_ok": [bool(summary["files_out"] < summary["files_in"])],
                "rows": [np.int64(summary["rows"])],
            }
        )
    )


SQL_COMPACT_ROUNDTRIP = """
SELECT CAST(24 AS BIGINT) AS files_in, TRUE AS compacted_fewer_ok,
       CAST(count(*) AS BIGINT) AS rows
FROM orders
"""


def _ensure_zorder_layout(sf_dir: str) -> str:
    """Cached 16-file Morton-clustered lineitem layout under /tmp
    (private build + atomic publish, same race discipline as the
    small-files cache)."""
    import os
    import tempfile

    from ..sources.zorder import write_zordered

    tag = os.path.basename(os.path.normpath(sf_dir))
    zdir = os.path.join(tempfile.gettempdir(), f"ae_zorder_{tag}")
    if not os.path.isdir(zdir) or not any(f.endswith(".parquet") for f in os.listdir(zdir)):
        ds = read_table(
            sf_dir, "lineitem",
            columns=["l_orderkey", "l_extendedprice", "l_quantity"], split=True,
        )
        stage = tempfile.mkdtemp(prefix=f"ae_zorder_{tag}_stage_")
        write_zordered(ds, stage, "l_extendedprice", "l_quantity", num_files=16)
        try:
            os.rename(stage, zdir)
        except OSError:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    return zdir


def q_zorder_prune(sf_dir: str):
    """Z-order layout payoff, measured (sources/zorder.py): lineitem's
    (l_extendedprice, l_quantity) rewrite as 16 Morton-clustered files,
    then a 2-D box predicate answers from parquet FOOTERS which files
    must be read.  Returns one row (files_total, files_read,
    rows_selected) — deterministic, so the driver's rows-only hash is
    stable.  The layout write is cached per scale factor under /tmp.
    Pruning completeness is the value-oracled `zorder_box_rows`."""
    import os

    import pyarrow.parquet as pqt
    import ray.data as rd

    from ..sources.zorder import prune_files

    zdir = _ensure_zorder_layout(sf_dir)
    x_box, y_box = (1000.0, 20000.0), (5.0, 20.0)
    keep = prune_files(zdir, "l_extendedprice", "l_quantity", x_box, y_box)
    files_total = sum(1 for f in os.listdir(zdir) if f.endswith(".parquet"))
    kept_tbl = pqt.read_table(
        [os.path.join(zdir, f) for f in keep], columns=["l_extendedprice", "l_quantity"]
    )
    import pyarrow.compute as pc

    inbox = pc.and_(
        pc.and_(
            pc.greater_equal(kept_tbl["l_extendedprice"], x_box[0]),
            pc.less_equal(kept_tbl["l_extendedprice"], x_box[1]),
        ),
        pc.and_(
            pc.greater_equal(kept_tbl["l_quantity"], y_box[0]),
            pc.less_equal(kept_tbl["l_quantity"], y_box[1]),
        ),
    )
    rows_selected = int(pc.sum(pc.cast(inbox, pa.int64())).as_py() or 0)
    # SQL-oracled shape (round-4 verdict item 5): rows_selected is the
    # exact box count DuckDB recomputes from lineitem; the clustering
    # payoff (a strict subset of files read) folds into a boolean — the
    # exact files_read count is a property of the Morton layout, not of
    # the data, so it stays a pytest assertion (tests/test_zorder.py)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "files_total": [np.int64(files_total)],
                "pruning_payoff_ok": [bool(len(keep) < files_total)],
                "rows_selected": [np.int64(rows_selected)],
            }
        )
    )


SQL_ZORDER_PRUNE = """
SELECT CAST(16 AS BIGINT) AS files_total, TRUE AS pruning_payoff_ok,
       CAST(count(*) FILTER (
         WHERE l_extendedprice BETWEEN 1000.0 AND 20000.0
           AND l_quantity BETWEEN 5.0 AND 20.0
       ) AS BIGINT) AS rows_selected
FROM lineitem
"""


#: fixed probe set for the bloom point-lookup demo: three present keys
#: (every sf has doc_ids 0..N-1) and two definitively-absent ones
_BLOOM_PROBE_KEYS = [1, 7, 123, -5, 10**9]


def q_bloom_point_lookup(sf_dir: str):
    """Point-lookup through the per-file Bloom index
    (state/bloom_index.py): documents hash-partition once into 16
    bloom-sidecarred files (cached per scale factor), then a 5-key
    probe reads ONLY candidate files and exact-filters — the
    needle-in-100TB read path where footer min/max can't prune.
    Returns the looked-up (doc_id, lang, source) rows, value-oracled
    against a plain ``WHERE doc_id IN``; the files_read < files_total
    payoff and the no-false-negative property are pytest-asserted
    (tests/test_bloom_index.py)."""
    import os
    import tempfile

    from ..state.bloom_index import point_lookup, write_bloom_indexed

    tag = os.path.basename(os.path.normpath(sf_dir))
    bdir = os.path.join(tempfile.gettempdir(), f"ae_bloomidx_{tag}")
    if not os.path.isdir(os.path.join(bdir, "_bloom")) or not any(
        f.endswith(".parquet") for f in os.listdir(bdir)
    ):
        # build in a private dir, publish with one atomic rename — a
        # concurrent run at the same scale either wins the rename or
        # reads the winner's complete index, never a half-written one
        # (the same race class as the snapshot_reads advice finding)
        ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"], split=True)
        stage = tempfile.mkdtemp(prefix=f"ae_bloomidx_{tag}_stage_")
        write_bloom_indexed(ds, stage, "doc_id", num_files=16)
        try:
            os.rename(stage, bdir)
        except OSError:  # a concurrent builder won; use theirs
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
    tbl = point_lookup(bdir, "doc_id", np.array(_BLOOM_PROBE_KEYS, dtype=np.int64))
    df = tbl.to_pandas() if tbl.num_rows or tbl.num_columns else pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64), "lang": [], "source": []}
    )
    return df.sort_values("doc_id").reset_index(drop=True)


SQL_BLOOM_POINT_LOOKUP = f"""
SELECT doc_id, lang, source FROM documents
WHERE doc_id IN ({", ".join(str(k) for k in _BLOOM_PROBE_KEYS)})
ORDER BY doc_id
"""


def q_table_diff(sf_dir: str):
    """Snapshot diff (data-diff): classify every key across two table
    versions as added / removed / changed / same and count each class.
    Version B derives deterministically from orders (keys ≡0 mod 101
    dropped, prices of keys ≡0 mod 97 bumped) so the diff is
    SQL-derivable.  Shape: both sides co-partition ONCE via the
    full-outer `shuffle_join`; classification is a vectorized per-batch
    CASE; counts are fixed-width partials.  The promotion check run
    between pipeline versions."""
    from .tabular import shuffle_join

    # materialize version A once — version B derives from the cached
    # blocks instead of a second parquet scan
    a = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True).materialize()

    def mutate(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        keep = k % 101 != 0
        p2 = np.where(k % 97 == 0, np.round(p * 100.0 + 100.0) / 100.0, p)
        t = pa.Table.from_arrays(
            [pa.array(k[keep]), pa.array(p2[keep])], names=["o_orderkey", "price_b"]
        )
        return t

    b = a.map_batches(mutate, batch_format="pyarrow")
    joined = shuffle_join(a, b, "o_orderkey", how="outer")

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        pa_ = df["o_totalprice"]
        pb = df["price_b"]
        status = np.where(
            pa_.isna(), "added",
            np.where(pb.isna(), "removed", np.where(pa_.eq(pb), "same", "changed")),
        )
        out = pd.DataFrame({"status": status})
        return out.groupby("status", as_index=False).size().rename(columns={"size": "c"})

    return grouped_aggregate(
        joined.map_batches(classify, batch_format="pandas"), ["status"], {"n_keys": ("sum", "c")},
        small_keys=True,
    )


SQL_TABLE_DIFF = """
WITH b AS (
  SELECT o_orderkey, CASE WHEN o_orderkey % 97 = 0
                          THEN round(o_totalprice * 100 + 100) / 100
                          ELSE o_totalprice END AS price_b
  FROM orders WHERE o_orderkey % 101 <> 0
),
j AS (
  SELECT a.o_totalprice AS pa, b.price_b AS pb
  FROM orders a FULL OUTER JOIN b USING (o_orderkey)
)
SELECT CASE WHEN pa IS NULL THEN 'added'
            WHEN pb IS NULL THEN 'removed'
            WHEN pa = pb THEN 'same' ELSE 'changed' END AS status,
       CAST(count(*) AS BIGINT) AS n_keys
FROM j GROUP BY 1
"""


def q_merge_upsert(sf_dir: str):
    """MERGE INTO / CDC apply: a changelog of deletes (keys ≡0 mod
    113), updates (≡0 mod 127, price +5) and inserts (100 fresh keys
    past the max) applies onto the base snapshot in ONE co-partitioned
    pass — the warehouse upsert primitive.

    Shape: the changelog derives per-batch from the cached base (no
    second scan), both sides co-partition once via the full-outer
    `shuffle_join`, and a vectorized per-bucket CASE materializes the
    new snapshot: base-only rows survive unless deleted, matched rows
    take the update, changelog-only rows insert.  At scale this is the
    nightly CDC apply; the partitioned writer (state/lineage.py) makes
    it a resumable snapshot swap."""
    import os

    import pyarrow.parquet as pqt

    from .tabular import shuffle_join

    meta = pqt.ParquetFile(os.path.join(sf_dir, "orders.parquet")).metadata
    idx = next(
        i for i in range(meta.num_columns)
        if meta.row_group(0).column(i).path_in_schema == "o_orderkey"
    )
    max_key = max(
        meta.row_group(rg).column(idx).statistics.max for rg in range(meta.num_row_groups)
    )
    base = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True).materialize()

    def changelog(batch: pa.Table) -> pd.DataFrame:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        dele = k % 113 == 0
        upd = (k % 127 == 0) & ~dele
        out = pd.DataFrame(
            {
                "o_orderkey": np.concatenate([k[dele], k[upd]]),
                "op": ["D"] * int(dele.sum()) + ["U"] * int(upd.sum()),
                "new_price": np.concatenate(
                    [np.full(int(dele.sum()), np.nan), np.round(p[upd] * 100.0 + 500.0) / 100.0]
                ),
            }
        )
        # inserts ride on the batch containing the max key (exactly once)
        if (k == max_key).any():
            ins = np.arange(max_key + 1, max_key + 101, dtype=np.int64)
            out = pd.concat(
                [out, pd.DataFrame({"o_orderkey": ins, "op": "I", "new_price": 1.0})],
                ignore_index=True,
            )
        return out

    log = base.map_batches(changelog, batch_format="pyarrow")
    joined = shuffle_join(base, log, "o_orderkey", how="outer")

    def apply_ops(df: pd.DataFrame) -> pd.DataFrame:
        op = df["op"].fillna("")
        keep = op != "D"
        price = np.where(op.isin(["U", "I"]), df["new_price"], df["o_totalprice"])
        out = pd.DataFrame({"o_orderkey": df["o_orderkey"], "o_totalprice": price})
        return out[keep.to_numpy()]

    return joined.map_batches(apply_ops, batch_format="pandas")


SQL_MERGE_UPSERT = """
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
log AS (
  SELECT o_orderkey, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
  FROM orders WHERE o_orderkey % 113 = 0
  UNION ALL
  SELECT o_orderkey, 'U', round(o_totalprice * 100 + 500) / 100
  FROM orders WHERE o_orderkey % 127 = 0 AND o_orderkey % 113 <> 0
  UNION ALL
  SELECT mk + i, 'I', 1.0 FROM mx, unnest(range(1, 101)) AS t(i)
)
SELECT coalesce(o.o_orderkey, l.o_orderkey) AS o_orderkey,
       CASE WHEN l.op IN ('U', 'I') THEN l.new_price ELSE o.o_totalprice END AS o_totalprice
FROM orders o FULL OUTER JOIN log l USING (o_orderkey)
WHERE coalesce(l.op, '') <> 'D'
"""


def q_scd2_history(sf_dir: str):
    """SCD Type-2 history build: two snapshot versions of a dimension
    collapse into validity-interval rows — unchanged keys get one open
    row (v_from=1, v_to=NULL), updated keys a closed v1 row plus an
    open v2 row, deleted keys a closed row, inserted keys an open v2
    row.  Version 2 derives with the `merge_upsert` rules, so the whole
    temporal build is SQL-derivable.  Shape: ONE full-outer
    co-partition (both versions from the cached base, no second scan)
    and a vectorized interval emitter per bucket."""
    from .tabular import shuffle_join

    base = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True).materialize()

    def v2(batch: pa.Table) -> pd.DataFrame:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        keep = k % 113 != 0  # deletes
        p2 = np.where(k % 127 == 0, np.round(p * 100.0 + 500.0) / 100.0, p)
        return pd.DataFrame({"o_orderkey": k[keep], "price_v2": p2[keep]})

    joined = shuffle_join(base, base.map_batches(v2, batch_format="pyarrow"), "o_orderkey", how="outer")

    def intervals(df: pd.DataFrame) -> pd.DataFrame:
        p1 = df["o_totalprice"]
        p2 = df["price_v2"]
        k = df["o_orderkey"]
        rows = []
        unchanged = p1.notna() & p2.notna() & p1.eq(p2)
        rows.append(pd.DataFrame({"o_orderkey": k[unchanged], "price": p1[unchanged],
                                  "v_from": 1, "v_to": np.nan}))
        changed = p1.notna() & p2.notna() & ~p1.eq(p2)
        rows.append(pd.DataFrame({"o_orderkey": k[changed], "price": p1[changed],
                                  "v_from": 1, "v_to": 2.0}))
        rows.append(pd.DataFrame({"o_orderkey": k[changed], "price": p2[changed],
                                  "v_from": 2, "v_to": np.nan}))
        deleted = p1.notna() & p2.isna()
        rows.append(pd.DataFrame({"o_orderkey": k[deleted], "price": p1[deleted],
                                  "v_from": 1, "v_to": 2.0}))
        inserted = p1.isna() & p2.notna()
        rows.append(pd.DataFrame({"o_orderkey": k[inserted], "price": p2[inserted],
                                  "v_from": 2, "v_to": np.nan}))
        out = pd.concat(rows, ignore_index=True)
        out["v_from"] = out["v_from"].astype(np.int64)
        return out

    return joined.map_batches(intervals, batch_format="pandas")


SQL_SCD2 = """
WITH v2 AS (
  SELECT o_orderkey, CASE WHEN o_orderkey % 127 = 0
                          THEN round(o_totalprice * 100 + 500) / 100
                          ELSE o_totalprice END AS price_v2
  FROM orders WHERE o_orderkey % 113 <> 0
),
j AS (SELECT o.o_orderkey AS k1, o.o_totalprice AS p1, v2.o_orderkey AS k2, v2.price_v2 AS p2
      FROM orders o FULL OUTER JOIN v2 USING (o_orderkey))
SELECT coalesce(k1, k2) AS o_orderkey, p1 AS price, CAST(1 AS BIGINT) AS v_from,
       CAST(NULL AS DOUBLE) AS v_to
FROM j WHERE p1 IS NOT NULL AND p2 IS NOT NULL AND p1 = p2
UNION ALL
SELECT coalesce(k1, k2), p1, 1, 2.0 FROM j
WHERE p1 IS NOT NULL AND p2 IS NOT NULL AND p1 <> p2
UNION ALL
SELECT coalesce(k1, k2), p2, 2, CAST(NULL AS DOUBLE) FROM j
WHERE p1 IS NOT NULL AND p2 IS NOT NULL AND p1 <> p2
UNION ALL
SELECT coalesce(k1, k2), p1, 1, 2.0 FROM j WHERE p2 IS NULL
UNION ALL
SELECT coalesce(k1, k2), p2, 2, CAST(NULL AS DOUBLE) FROM j WHERE p1 IS NULL
"""


def q_cluster_topterms(sf_dir: str):
    """Cluster labeling: k-means over the embeddings, then the top-5
    tokens per cluster by document frequency — the standard way to make
    unsupervised clusters human-readable.  Composite of oracled/tested
    stages: `kmeans_fit/assign` (broadcast-partial Lloyd's) + ONE co-partitioned
    join of the corpus-sized assignment onto the documents + per-batch
    token-count combiners + one grouped sum + per-cluster top-5
    (count desc, token asc — deterministic).  Rows-only: k-means isn't
    SQL-expressible; determinism across layouts is what the driver's
    hash check exercises."""
    import pyarrow.compute as pc

    from ..stages.clustering import kmeans_assign, kmeans_fit
    from .tabular import shuffle_join

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    emb = emb.materialize()
    cents = kmeans_fit(emb, 4, iters=5, cache=False)
    # the assignment table is CORPUS-sized (one row per vector), so it
    # must never collect on the driver or broadcast: co-partition it
    # with the documents on the shared id instead — one exchange, both
    # sides streamed
    assign = kmeans_assign(emb, cents).select_columns(["vec_id", "cluster"]).rename_columns(
        {"vec_id": "doc_id"}
    )
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    joined = shuffle_join(docs, assign, "doc_id", how="inner")

    def token_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = pc.split_pattern(pa.array(df["text"].to_numpy(), type=pa.string()), " ")
        counts = np.diff(toks.offsets.to_numpy())
        out = pd.DataFrame(
            {
                "cluster": np.repeat(df["cluster"].to_numpy(dtype=np.int64), counts),
                "token": toks.values.to_pandas(),
            }
        ).groupby(["cluster", "token"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    counts = grouped_aggregate(
        joined.map_batches(token_counts, batch_format="pandas"),
        ["cluster", "token"],
        {"n": ("sum", "cnt")},
    )

    def top5(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["n", "token"], ascending=[False, True]).head(5)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["cluster", "rank", "token", "n"]]

    return counts.groupby("cluster").map_groups(top5, batch_format="pandas")


_KFOLDS = 5


def q_group_kfold(sf_dir: str):
    """Leakage-safe grouped k-fold assignment: every event of a user
    lands in the SAME fold (fold = Knuth-hash(user) mod k), so
    cross-validation never sees one entity on both sides of a split —
    the grouped analogue of `hash_split_counts`.  Pure arithmetic per
    batch, zero shuffle, zero state; SQL mirror is the identical
    integer expression."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id"], split=True)

    def fold(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = (u * 2654435761) % _KFOLDS
        return pa.Table.from_arrays(
            [batch["event_id"], batch["user_id"], pa.array(f.astype(np.int64))],
            names=["event_id", "user_id", "fold"],
        )

    return ds.map_batches(fold, batch_format="pyarrow")


SQL_GROUP_KFOLD = f"""
SELECT event_id, user_id,
       CAST((user_id * 2654435761) % {_KFOLDS} AS BIGINT) AS fold
FROM events
"""


_NEG_K = 4
_KNUTH = 2654435761  # Knuth multiplicative-hash constant


def q_contrastive_pairs(sf_dir: str):
    """Contrastive negative sampling: each document draws ``_NEG_K``
    deterministic pseudo-random negatives via Knuth multiplicative
    hashing over the dense id space — (a·id + j·c) mod N, skipping
    self.  Zero shuffle, zero lookups: the id space is dense (driver
    knows N from footer stats), so negatives are ARITHMETIC, the same
    trick as `domain_mixture`'s integer membership — reproducible,
    SQL-expressible, and no sampling state ships anywhere.  At corpus
    scale with sparse ids the same shape runs against the `global_rank`
    enumeration first."""
    import os

    import pyarrow.parquet as pqt

    meta = pqt.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata
    idx = next(
        i for i in range(meta.num_columns)
        if meta.row_group(0).column(i).path_in_schema == "doc_id"
    )
    n_docs = (
        max(meta.row_group(rg).column(idx).statistics.max for rg in range(meta.num_row_groups))
        + 1
    )
    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def sample(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        anchors = np.repeat(ids, _NEG_K)
        j = np.tile(np.arange(1, _NEG_K + 1, dtype=np.int64), len(ids))
        neg = (anchors * _KNUTH + j * 40503) % n_docs
        neg = np.where(neg == anchors, (neg + 1) % n_docs, neg)  # never self
        return pd.DataFrame({"anchor_id": anchors, "k": j, "negative_id": neg})

    return ds.map_batches(sample, batch_format="pyarrow")


SQL_CONTRASTIVE = f"""
WITH n AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS nd FROM documents),
g AS (SELECT doc_id, unnest(range(1, {_NEG_K} + 1)) AS k FROM documents)
SELECT g.doc_id AS anchor_id, CAST(g.k AS BIGINT) AS k,
       CASE WHEN (g.doc_id * {_KNUTH} + g.k * 40503) % nd = g.doc_id
            THEN ((g.doc_id * {_KNUTH} + g.k * 40503) % nd + 1) % nd
            ELSE (g.doc_id * {_KNUTH} + g.k * 40503) % nd END AS negative_id
FROM g, n
"""


_PROFILE_COLS = ["o_custkey", "o_orderpriority", "o_orderstatus"]


def q_profile_table(sf_dir: str):
    """Column profiling (ANALYZE-style): per column, null count and
    exact distinct count over orders.  One streaming pass melts each
    batch into per-column DISTINCT-value partials (the batch is the
    combiner — at most |batch distinct| rows per column leave, never
    raw rows) plus a fixed-width null-count row; a grouped reduce
    finishes both.  The sketch family (`hll_distinct`, `heavy_tokens_
    sketch`) is the approximate path when exact distinct is too wide to
    shuffle; this op is the exact gate a snapshot-promotion check runs."""
    ds = read_table(sf_dir, "orders", columns=_PROFILE_COLS, split=True)

    def melt_distinct(batch: pa.Table) -> pd.DataFrame:
        frames = []
        for c in _PROFILE_COLS:
            col = batch[c]
            vals = pd.Series(col.to_pandas()).dropna().unique()
            frames.append(
                pd.DataFrame({"column": c, "v": pd.Series(vals).astype(str)})
            )
        return pd.concat(frames, ignore_index=True)

    distinct = grouped_aggregate(
        ds.map_batches(melt_distinct, batch_format="pyarrow"),
        ["column", "v"],
        {"one": ("count", None)},
    )

    def count_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("column", as_index=False).size().rename(columns={"size": "n"})

    n_distinct = grouped_aggregate(
        distinct.map_batches(count_distinct, batch_format="pandas"),
        ["column"],
        {"n_distinct": ("sum", "n")},
    ).to_pandas()

    def null_partial(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"column": _PROFILE_COLS, "nb": [batch[c].null_count for c in _PROFILE_COLS]}
        )

    n_nulls = grouped_aggregate(
        ds.map_batches(null_partial, batch_format="pyarrow"), ["column"], {"n_nulls": ("sum", "nb")}
    ).to_pandas()
    out = n_distinct.merge(n_nulls, on="column")
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["n_nulls"] = out["n_nulls"].astype(np.int64)
    import ray.data as rd

    return rd.from_pandas(out.sort_values("column").reset_index(drop=True))


SQL_PROFILE_TABLE = """
SELECT 'o_custkey' AS "column", CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_nulls FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) FROM orders
"""


def q_span_corruption(sf_dir: str):
    """T5-style span corruption (stages/denoise.py): ~15% of each doc's
    tokens masked in contiguous spans behind ordinal sentinels, target
    sequence carries the hidden tokens.  Per-doc blake2-seeded masks →
    deterministic and layout-independent.  Rows-only (the greedy span
    draw isn't SQL-expressible); losslessness, budget, determinism and
    layout-independence are pytest-verified."""
    from ..stages.denoise import span_corrupt

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    return span_corrupt(ds)


def q_multi_format_union(sf_dir: str):
    """Heterogeneous-source ingest (S4 reader breadth): the same
    dimension arrives as CSV and JSONL (derived deterministically to
    /tmp once per scale factor), reads through ``ray.data.read_csv`` /
    ``read_json``, unions, and exact-dedupes back to the canonical
    rows.  Schema drift between formats (CSV infers, JSON carries
    types) is normalized by one explicit cast map — the realistic
    multi-vendor feed problem."""
    import os
    import tempfile

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pqt
    import ray.data as rd

    from .tabular import dedup_exact_min

    src = pqt.read_table(os.path.join(sf_dir, "nation.parquet"))
    tag = os.path.basename(os.path.normpath(sf_dir))
    base = os.path.join(tempfile.gettempdir(), f"ae_multifmt_{tag}")
    os.makedirs(base, exist_ok=True)
    csv_path = os.path.join(base, "nation.csv")
    json_path = os.path.join(base, "nation.jsonl")
    if not os.path.exists(csv_path):
        pacsv.write_csv(src, csv_path + ".tmp")
        os.replace(csv_path + ".tmp", csv_path)
    if not os.path.exists(json_path):
        with open(json_path + ".tmp", "w") as f:
            for row in src.to_pylist():
                import json as _json

                f.write(_json.dumps(row) + "\n")
        os.replace(json_path + ".tmp", json_path)

    cols = ["n_nationkey", "n_name", "n_regionkey"]

    def normalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch["n_nationkey"].cast(pa.int64()),
                batch["n_name"].cast(pa.string()),
                batch["n_regionkey"].cast(pa.int64()),
            ],
            names=cols,
        )

    both = (
        rd.read_csv(csv_path)
        .map_batches(normalize, batch_format="pyarrow")
        .union(rd.read_json(json_path).map_batches(normalize, batch_format="pyarrow"))
    )
    kept = dedup_exact_min(both, "n_name", "n_nationkey")

    def attach_region(batch: pa.Table) -> pa.Table:
        m = dict(
            zip(src["n_nationkey"].to_pylist(), src["n_regionkey"].to_pylist())
        )  # tiny dim; re-attach the column dropped by the dedup projection
        keys = batch["n_nationkey"].to_numpy(zero_copy_only=False)
        rk = np.array([m[int(k)] for k in keys], dtype=np.int64)
        return pa.Table.from_arrays(
            [batch["n_nationkey"].cast(pa.int64()), batch["n_name"], pa.array(rk)],
            names=cols,
        )

    return kept.map_batches(attach_region, batch_format="pyarrow")


SQL_MULTI_FORMAT_UNION = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
FROM nation
"""


#: group-key cardinality above which ratio-to-report style totals maps
#: stop broadcasting and resolve through a bucketed join on the key
GROUP_MAP_BUDGET = 10_000_000


def q_share_of_total(sf_dir: str):
    return _share_of_total(sf_dir)


def _share_of_total(sf_dir: str, *, key_budget: int = GROUP_MAP_BUDGET):
    """Ratio-to-report window: each event's share of its type's total
    value — the no-sort window: one partial-combine pass builds the
    per-type totals (exact int64 cents, order-independent), then a
    second pass divides.  The SQL mirror also sums cents so both
    engines perform the identical final float division.

    Totals routing: at or under ``key_budget`` distinct group keys the
    totals map broadcasts back and no event row ever shuffles; above it
    the totals resolve through a bucketed ``tabular.shuffle_join`` on
    the group key (one hash exchange of the event rows) — the
    arithmetic is unchanged, proven identical by pytest
    (``key_budget=0`` forces the join route)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "cents": np.round(batch["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        return df.groupby("event_type", as_index=False).sum()

    totals_ds = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type"], {"t": ("sum", "cents")},
        small_keys=True,
    )

    if totals_ds.count() <= key_budget:
        totals = totals_ds.to_pandas()
        handle = Broadcast(dict(zip(totals["event_type"], totals["t"])))

        def share(batch: pa.Table) -> pa.Table:
            m = handle.get()
            t = pd.Series(batch["event_type"].to_pandas()).map(m).to_numpy(dtype=np.float64)
            v = batch["value"].to_numpy(zero_copy_only=False)
            return pa.Table.from_arrays(
                [batch["event_id"], batch["event_type"], pa.array(v / (t / 100.0))],
                names=["event_id", "event_type", "share"],
            )

        return ds.map_batches(share, batch_format="pyarrow")

    # bucketed-join route (group-key domain outgrew the object store)
    from .tabular import shuffle_join

    joined = shuffle_join(ds, totals_ds, "event_type")

    def share_joined(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["t"].to_numpy(dtype=np.float64)
        v = batch["value"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype(np.int64),
                "event_type": batch["event_type"],
                "share": v / (t / 100.0),
            }
        )

    return joined.map_batches(share_joined, batch_format="pandas")


SQL_SHARE_OF_TOTAL = """
SELECT event_id, event_type,
       value / (CAST(sum(CAST(round(value * 100) AS BIGINT))
                     OVER (PARTITION BY event_type) AS DOUBLE) / 100.0) AS share
FROM events
"""


def q_lexical_diversity(sf_dir: str):
    """Per-document lexical diversity (type-token ratio): distinct
    tokens / total tokens — a standard quality signal for crawl
    filtering (boilerplate and spam repeat a tiny vocabulary).  Pure
    per-batch map over ListArray offsets + one vectorized pandas
    groupby(doc).nunique — no shuffle, and the only float op is one
    exact integer division, so the result is order-independent
    (an entropy variant would need a float sum whose accumulation
    order differs between engines)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def ttr(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        off = toks.offsets.to_numpy()
        counts = np.diff(off)
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        df = pd.DataFrame({"d": doc_idx, "w": toks.values.to_pandas()})
        nuniq = df.groupby("d")["w"].nunique()
        ids = batch["doc_id"].to_numpy()
        n_tok = counts.astype(np.int64)
        n_dist = np.zeros(len(ids), dtype=np.int64)
        n_dist[nuniq.index.to_numpy()] = nuniq.to_numpy()
        out = pd.DataFrame(
            {"doc_id": ids, "n_tokens": n_tok, "n_distinct": n_dist}
        )
        out["ttr"] = out["n_distinct"] / out["n_tokens"].clip(lower=1)
        return out

    return ds.map_batches(ttr, batch_format="pyarrow")


SQL_LEXICAL_DIVERSITY = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_distinct,
       CAST(count(DISTINCT w) AS DOUBLE) / greatest(count(*), 1) AS ttr
FROM t GROUP BY doc_id
"""


def q_weighted_mean(sf_dir: str):
    """Grouped weighted mean: quantity-weighted average price per
    return flag.  Partials are exact int64 sums (price in integer
    cents × integer quantity), so accumulation order cannot perturb
    the result and the final division is the only float op — bit-equal
    to SQL regardless of DuckDB's internal accumulation order."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "__wc": (
                    np.round(batch["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
                    * batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "__w": batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        return df.groupby("l_returnflag", as_index=False).sum()

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        {"wc": ("sum", "__wc"), "w": ("sum", "__w")},
        small_keys=True,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["wavg_price"] = df["wc"].to_numpy(dtype=np.float64) / (
            100.0 * df["w"].to_numpy(dtype=np.float64)
        )
        return df[["l_returnflag", "wavg_price"]]

    return agg.map_batches(finalize, batch_format="pandas")


SQL_WEIGHTED_MEAN = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / (100.0 * CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)) AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


_OHLC_BUCKET_US = 3_600 * 1_000_000  # 1-hour bars


def q_ohlc_resample(sf_dir: str):
    """Time-series downsampling to OHLC bars (open/high/low/close per
    hour) — the resample staple.  Classic two-level reduce: each batch
    collapses to ONE candidate row per bar it sees (open = value at the
    minimal ts, close at the maximal, plus high/low/count partials),
    then a coarse bar-hash bucket reduce re-applies the same vectorized
    combine — event rows never shuffle, only per-(batch, bar) partials.
    Timestamps are unique in this schema so arg-min/max need no
    tiebreak; the int64-µs floor matches SQL time_bucket exactly."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        df = pd.DataFrame(
            {
                "bar": (us // _OHLC_BUCKET_US) * _OHLC_BUCKET_US,
                "ts_us": us,
                "value": batch["value"].to_numpy(zero_copy_only=False),
            }
        )
        s = df.sort_values(["bar", "ts_us"], kind="stable")
        first = s.groupby("bar", sort=False).head(1).set_index("bar")
        last = s.groupby("bar", sort=False).tail(1).set_index("bar")
        agg = df.groupby("bar").agg(
            high=("value", "max"), low=("value", "min"), n_events=("value", "size")
        )
        out = agg.join(first[["ts_us", "value"]].rename(columns={"ts_us": "open_ts", "value": "open"}))
        out = out.join(last[["ts_us", "value"]].rename(columns={"ts_us": "close_ts", "value": "close"}))
        return out.reset_index()

    def coarse(df: pd.DataFrame) -> pd.DataFrame:
        df["__bucket"] = pd.util.hash_array(df["bar"].to_numpy()) % 32
        return df

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["bar", "open_ts"], kind="stable")
        first = s.groupby("bar", sort=False).head(1).set_index("bar")["open"]
        s2 = df.sort_values(["bar", "close_ts"], kind="stable")
        last = s2.groupby("bar", sort=False).tail(1).set_index("bar")["close"]
        agg = df.groupby("bar").agg(
            high=("high", "max"), low=("low", "min"), n_events=("n_events", "sum")
        )
        out = agg.join(first).join(last).reset_index()
        out["bar"] = out["bar"].to_numpy().view("datetime64[us]")
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["bar", "open", "high", "low", "close", "n_events"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda df: combine(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_OHLC = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bar,
       arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
       arg_max(value, ts) AS close, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


_WATERMARK_S = 1800


def q_late_events(sf_dir: str):
    return _late_events(sf_dir)


def _late_events(sf_dir: str, *, key_budget: int = GROUP_MAP_BUDGET):
    """Watermark-style late-data detection: events older than 30 min
    behind their user's high-water mark (max ts seen).  The streaming
    primitive behind late-arrival routing, expressed batch: the
    per-user watermark is a `grouped_aggregate` max over int64 epoch-µs
    (partials only), then one vectorized second pass flags stragglers.

    Watermark routing: at or under ``key_budget`` distinct users the
    user→watermark map broadcasts back and no event row ever shuffles;
    above it the watermarks resolve through a bucketed
    ``tabular.shuffle_join`` on user_id (one hash exchange of the event
    rows) — the flag arithmetic is unchanged, proven identical by
    pytest (``key_budget=0`` forces the join route)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"], split=True)

    def to_us(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pa.Table.from_arrays(
            [batch["event_id"], batch["user_id"], pa.array(us)],
            names=["event_id", "user_id", "ts_us"],
        )

    us_ds = ds.map_batches(to_us, batch_format="pyarrow")
    wm_ds = grouped_aggregate(us_ds, ["user_id"], {"wm": ("max", "ts_us")})

    if wm_ds.count() <= key_budget:
        wm = wm_ds.to_pandas()
        handle = Broadcast(dict(zip(wm["user_id"], wm["wm"])))

        def late(batch: pa.Table) -> pa.Table:
            m = handle.get()
            uid = batch["user_id"].to_numpy(zero_copy_only=False)
            ts = batch["ts_us"].to_numpy(zero_copy_only=False)
            wmv = pd.Series(uid).map(m).to_numpy(dtype=np.int64)
            keep = ts < wmv - _WATERMARK_S * 1_000_000
            kept = batch.filter(pa.array(keep))
            lag = (
                pd.Series(kept["user_id"].to_numpy(zero_copy_only=False)).map(m).to_numpy(dtype=np.int64)
                - kept["ts_us"].to_numpy(zero_copy_only=False)
            )  # exact µs — timestamps carry sub-second parts, so a seconds
            #    boundary count (date_diff('second')) would NOT equal a
            #    division here; both sides agree on microseconds instead
            return pa.Table.from_arrays(
                [kept["event_id"], kept["user_id"], pa.array(lag)],
                names=["event_id", "user_id", "lag_us"],
            )

        return us_ds.map_batches(late, batch_format="pyarrow")

    # bucketed-join route (user domain outgrew the object store)
    from .tabular import shuffle_join

    joined = shuffle_join(us_ds, wm_ds, "user_id")

    def late_joined(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts_us"].to_numpy(dtype=np.int64)
        wmv = batch["wm"].to_numpy(dtype=np.int64)
        keep = ts < wmv - _WATERMARK_S * 1_000_000
        kept = batch.loc[keep]
        return pd.DataFrame(
            {
                "event_id": kept["event_id"].astype(np.int64),
                "user_id": kept["user_id"].astype(np.int64),
                "lag_us": (kept["wm"].to_numpy(dtype=np.int64)
                           - kept["ts_us"].to_numpy(dtype=np.int64)),
            }
        )

    return joined.map_batches(late_joined, batch_format="pandas")


SQL_LATE_EVENTS = f"""
SELECT e.event_id, e.user_id,
       CAST(date_diff('microsecond', e.ts, m.wm) AS BIGINT) AS lag_us
FROM events e
JOIN (SELECT user_id, max(ts) AS wm FROM events GROUP BY user_id) m USING (user_id)
WHERE e.ts < m.wm - INTERVAL {_WATERMARK_S} SECOND
"""

# ---------------------------------------------------------------------------
# J1 — broadcast dimension join + aggregate
# ---------------------------------------------------------------------------


def q_region_customer_stats(sf_dir: str):
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    nation = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    dim = (
        nation.to_pandas()
        .merge(region.to_pandas(), left_on="n_regionkey", right_on="r_regionkey")[
            ["n_nationkey", "r_name"]
        ]
        .rename(columns={"n_nationkey": "c_nationkey"})
    )
    joined = broadcast_join(cust, pa.Table.from_pandas(dim), on="c_nationkey")
    out = grouped_aggregate(
        joined,
        ["r_name"],
        {"n_customers": ("count", None), "avg_acctbal": ("mean", "c_acctbal"), "total_acctbal": ("sum", "c_acctbal")},
        small_keys=True,
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["avg_acctbal"] = df["avg_acctbal"].round(4)
        df["total_acctbal"] = df["total_acctbal"].round(2)
        return df

    return out.map_batches(rounded, batch_format="pandas")


SQL_REGION_CUSTOMER = """
SELECT r_name,
       count(*)                   AS n_customers,
       round(avg(c_acctbal), 4)   AS avg_acctbal,
       round(sum(c_acctbal), 2)   AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# ---------------------------------------------------------------------------
# T3 — deterministic hash split (scale path of the seeded split)
# ---------------------------------------------------------------------------


def q_hash_split_counts(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ds = ds.map_batches(lambda t: hash_split_batch(t, "o_orderkey"), batch_format="pyarrow")
    out = grouped_aggregate(
        ds, ["split"], {"n_rows": ("count", None), "sum_price": ("sum", "o_totalprice")},
        small_keys=True,
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["sum_price"].round(2)
        return df

    return out.map_batches(rounded, batch_format="pandas")


_T_TRAIN, _T_TEST = SPLIT_THRESHOLDS[0][1], SPLIT_THRESHOLDS[1][1]
SQL_HASH_SPLIT = f"""
SELECT CASE WHEN md5(cast(o_orderkey AS varchar)) < '{_T_TRAIN}' THEN 'train'
            WHEN md5(cast(o_orderkey AS varchar)) < '{_T_TEST}' THEN 'test'
            ELSE 'dev' END AS split,
       count(*) AS n_rows,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY 1
"""

# ---------------------------------------------------------------------------
# M13 — derived physics columns (vectorized; same IEEE op sequence as SQL)
# ---------------------------------------------------------------------------


def q_derived_physics(sf_dir: str):
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        lo = batch["l_orderkey"].to_numpy().astype(np.int64)
        ln = batch["l_linenumber"].to_numpy().astype(np.int64)
        lp = batch["l_partkey"].to_numpy().astype(np.int64)
        ls = batch["l_suppkey"].to_numpy().astype(np.int64)
        qty = batch["l_quantity"].to_numpy().astype(np.float64)
        price = batch["l_extendedprice"].to_numpy().astype(np.float64)

        tc = price * 1e15
        hc = np.where(lp % 5 == 0, np.nan, (lp % 7 + 1) * 10.0)
        hn = np.where(ls % 3 == 0, np.nan, (ls % 8 + 1).astype(np.float64))
        tth = np.where(ln % 4 == 0, qty * 10.0, np.nan)
        pdraw = np.where(lo % 10 < 3, price / 50.0, np.nan)
        hp = np.where(lp % 2 == 0, 0.3, np.nan)
        co2 = np.full_like(tc, np.nan)
        gco2 = ((ls % 5) * 100).astype(np.float64)

        out = derive_physics_arrays(tc, hc, hn, tth, pdraw, hp, co2, gco2, pue=DEFAULT_PUE, mfu=DEFAULT_MFU)
        return pa.Table.from_arrays(
            [
                pa.array(lo),
                pa.array(ln.astype(np.int32)),
                pa.array(out["training_time_hours"]),
                pa.array(out["energy_kwh"]),
                pa.array(out["co2eq"]),
            ],
            names=["l_orderkey", "l_linenumber", "training_time_hours", "energy_kwh", "co2eq"],
        )

    return ds.map_batches(derive, batch_format="pyarrow")


SQL_PHYSICS = f"""
WITH inputs AS (
  SELECT l_orderkey, l_linenumber,
         l_extendedprice * 1e15 AS tc,
         CASE WHEN l_partkey % 5 = 0 THEN NULL ELSE (l_partkey % 7 + 1) * 10.0 END AS hc,
         CASE WHEN l_suppkey % 3 = 0 THEN NULL ELSE CAST(l_suppkey % 8 + 1 AS DOUBLE) END AS hn,
         CASE WHEN l_linenumber % 4 = 0 THEN l_quantity * 10.0 ELSE NULL END AS tth0,
         CASE WHEN l_orderkey % 10 < 3 THEN l_extendedprice / 50.0 ELSE NULL END AS pdraw,
         CASE WHEN l_partkey % 2 = 0 THEN 0.3 ELSE NULL END AS hp,
         CAST((l_suppkey % 5) * 100 AS DOUBLE) AS gco2
  FROM lineitem
), hours AS (
  SELECT *,
         CASE WHEN tth0 IS NULL AND tc IS NOT NULL AND tc > 0
                   AND hc IS NOT NULL AND hc > 0 AND hn IS NOT NULL AND hn > 0
                   AND (hn * hc * 1e12 * {DEFAULT_MFU}) > 0
              THEN tc / (hn * hc * 1e12 * {DEFAULT_MFU}) / 3600.0
              ELSE tth0 END AS tth
  FROM inputs
), energy AS (
  SELECT *,
         CASE WHEN tth IS NOT NULL AND tth > 0 AND pdraw IS NOT NULL AND pdraw > 0
              THEN (pdraw / 1000.0) * tth * {DEFAULT_PUE}
              WHEN tth IS NOT NULL AND tth > 0 AND (pdraw IS NULL OR pdraw <= 0)
                   AND hp IS NOT NULL AND hp > 0 AND hn IS NOT NULL AND hn > 0
              THEN (hp * hn) * tth * {DEFAULT_PUE}
              ELSE NULL END AS energy_kwh
  FROM hours
)
SELECT l_orderkey, l_linenumber,
       tth AS training_time_hours,
       energy_kwh,
       CASE WHEN energy_kwh IS NOT NULL AND gco2 IS NOT NULL AND gco2 >= 0
            THEN energy_kwh * (gco2 / 1000.0) ELSE NULL END AS co2eq
FROM energy
"""

# ---------------------------------------------------------------------------
# S2 — URL resolution
# ---------------------------------------------------------------------------


def q_url_resolve(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def resolve(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy()
        links = [f"see https://arxiv.org/abs/2101.{k % 100000:05d} (mirror)" for k in keys]
        resolved = [resolve_url(link) for link in links]
        return pa.Table.from_arrays(
            [pa.array(keys), pa.array(resolved, type=pa.string())],
            names=["o_orderkey", "resolved_url"],
        )

    return ds.map_batches(resolve, batch_format="pyarrow")


SQL_URL = """
SELECT o_orderkey,
       'https://arxiv.org/pdf/2101.' || lpad(cast(o_orderkey % 100000 AS varchar), 5, '0') || '.pdf' AS resolved_url
FROM orders
"""

# ---------------------------------------------------------------------------
# G2 — exact dedupe (hash-partitioned, per-batch combine)
# ---------------------------------------------------------------------------


def q_dedup_prefix(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column("text_key", pc.utf8_slice_codeunits(batch["text"], 0, 20)).select(
            ["text_key", "doc_id"]
        )

    return dedup_exact_min(ds.map_batches(key, batch_format="pyarrow"), "text_key", "doc_id")


SQL_DEDUP = """
SELECT substr(text, 1, 20) AS text_key, min(doc_id) AS doc_id
FROM documents GROUP BY 1
"""


def q_dedup_keep_best(sf_dir: str):
    """Exact dedupe keeping the highest-QUALITY duplicate (tie → min
    doc_id) — the curation-grade exact dedupe: among copies, survive
    the one the quality scorer likes best, not an arbitrary first
    occurrence.  Composition of the content-key dedupe (G2) with the
    quality composite, arg-best rule order-free so the two-level
    combiner is exact; the float scores are bit-identical on both
    engines (same order-identical arithmetic as `quality_score`)."""
    from ..stages.text_stats import quality_batch
    from .tabular import dedup_keep_best

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        q = quality_batch(batch)
        return pa.Table.from_arrays(
            [pc.utf8_slice_codeunits(batch["text"], 0, 20), batch["doc_id"],
             q["quality_score"]],
            names=["text_key", "doc_id", "quality_score"],
        )

    return dedup_keep_best(
        ds.map_batches(keyed, batch_format="pyarrow"), "text_key", "doc_id", "quality_score"
    )

# ---------------------------------------------------------------------------
# text analysis — token counting (vectorized)
# ---------------------------------------------------------------------------


def q_token_stats(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        toks = pc.count_substring_regex(batch["text"], r"\S+")
        chars = pc.utf8_length(batch["text"])
        return pa.Table.from_arrays(
            [batch["doc_id"], pc.cast(toks, pa.int64()), pc.cast(chars, pa.int64())],
            names=["doc_id", "n_tokens", "n_chars"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


SQL_TOKENS = """
SELECT doc_id,
       CAST(coalesce(array_length(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""

# ---------------------------------------------------------------------------
# windowed aggregate — tumbling 1h windows per user over the event log
# ---------------------------------------------------------------------------


def q_event_windows(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        # keep microsecond unit: floor("h") would narrow to [s] while the
        # DuckDB oracle returns timestamp[us]
        df["window_start"] = df["ts"].dt.floor("h").astype("datetime64[us]")
        return df[["user_id", "window_start", "value"]]

    ds = ds.map_batches(bucket, batch_format="pandas")
    out = grouped_aggregate(
        ds,
        ["user_id", "window_start"],
        {"n_events": ("count", None), "sum_value": ("sum", "value"), "max_value": ("max", "value")},
    )

    def rounded(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value"].round(2)
        # Ray's groupby shuffle narrows the timestamp key to [s]; the
        # DuckDB oracle returns timestamp[us]
        df["window_start"] = df["window_start"].astype("datetime64[us]")
        return df

    return out.map_batches(rounded, batch_format="pandas")


SQL_WINDOWS = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       max(value) AS max_value
FROM events GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# T2 — top-k with per-batch prefilter
# ---------------------------------------------------------------------------


def q_top_orders(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    k = 10

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)

    return (
        ds.map_batches(local, batch_format="pandas")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""

# ---------------------------------------------------------------------------
# J2 — anti-join against a broadcast done-set
# ---------------------------------------------------------------------------


def q_anti_join_resume(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    # Done-set bound derives from the actual table (parquet footer stats,
    # no data scan) so the query matches the oracle at every scale factor.
    import pyarrow.parquet as pq
    import os as _os

    meta = pq.ParquetFile(_os.path.join(sf_dir, "documents.parquet"))
    max_id = max(
        meta.metadata.row_group(rg).column(
            next(
                i
                for i in range(meta.metadata.num_columns)
                if meta.metadata.row_group(0).column(i).path_in_schema == "doc_id"
            )
        ).statistics.max
        for rg in range(meta.metadata.num_row_groups)
    )
    done = [i for i in range(0, max_id + 1, 7)]
    return broadcast_semi_filter(ds, done, "doc_id", anti=True)


SQL_ANTI_JOIN = """
SELECT doc_id, lang FROM documents WHERE doc_id % 7 <> 0
"""

# ---------------------------------------------------------------------------
# similarity search — brute-force cosine top-k against a broadcast query
# ---------------------------------------------------------------------------


def q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq
    import os

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qvec = (
        pq.read_table(emb_path, columns=["vec_id", "embedding"])
        .filter(pa.compute.equal(pa.compute.field("vec_id"), 0))["embedding"][0]
        .as_py()
    )
    q = np.asarray(qvec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    handle = Broadcast(qn)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    k = 10

    def score(batch: pa.Table) -> pd.DataFrame:
        qv = handle.get()
        ids = batch["vec_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()])
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qv) / norms
        df = pd.DataFrame({"vec_id": ids, "cos_sim": sims})
        df = df[df["vec_id"] != 0]
        return df.nlargest(k, "cos_sim")

    top = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos_sim", "vec_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]]


SQL_KNN = """
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         list_cosine_similarity(embedding, (SELECT qe FROM q)) AS cos_sim
  FROM embeddings WHERE vec_id <> 0
)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""

# ---------------------------------------------------------------------------
# M11 — dimension-frame prep (project/rename/coerce/dedupe/clip)
# ---------------------------------------------------------------------------


def q_hardware_prep(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice", "p_size"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "p_partkey": df["p_partkey"],
                "hardware": df["p_name"].astype(str).str.strip(),
                "compute": pd.to_numeric(df["p_retailprice"], errors="coerce").clip(lower=0),
                "power": (pd.to_numeric(df["p_size"], errors="coerce") * 1e-3).clip(lower=0),
            }
        )
        out = out[out["hardware"] != ""].dropna(subset=["hardware"])
        return out.sort_values("p_partkey").groupby("hardware", as_index=False, sort=False).head(1)

    local = ds.map_batches(prep, batch_format="pandas")
    # global keep-min-key per name (distributed dedupe, same rule)
    return latest_per_key(
        local.map_batches(
            lambda df: df.assign(neg_key=-df["p_partkey"]), batch_format="pandas"
        ),
        "hardware",
        ["neg_key"],
        ["compute", "power"],
    ).map_batches(
        lambda df: df[["hardware", "compute", "power"]], batch_format="pandas"
    )


SQL_HARDWARE_PREP = """
SELECT hardware, compute, power FROM (
  SELECT trim(p_name) AS hardware,
         greatest(p_retailprice, 0) AS compute,
         greatest(p_size * 1e-3, 0) AS power,
         row_number() OVER (PARTITION BY trim(p_name) ORDER BY p_partkey) AS rn
  FROM part WHERE trim(p_name) <> ''
) WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# M6 — numeric-with-suffix parsing
# ---------------------------------------------------------------------------


def q_numeric_suffix(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def parse(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy()
        ln = batch["l_linenumber"].to_numpy()
        suffix = np.where(ln % 3 == 0, "k", np.where(ln % 3 == 1, "m", ""))
        parsed = [parse_numeric(f"{q}{s}") for q, s in zip(qty, suffix)]
        return pa.Table.from_arrays(
            [batch["l_orderkey"], batch["l_linenumber"], pa.array(parsed, type=pa.float64())],
            names=["l_orderkey", "l_linenumber", "parsed"],
        )

    return ds.map_batches(parse, batch_format="pyarrow")


SQL_SUFFIX = """
SELECT l_orderkey, l_linenumber,
       CASE l_linenumber % 3 WHEN 0 THEN l_quantity * 1000.0
                             WHEN 1 THEN l_quantity * 1000000.0
                             ELSE l_quantity END AS parsed
FROM lineitem
"""

# ---------------------------------------------------------------------------
# M10 — rename / pad-missing / project
# ---------------------------------------------------------------------------


def q_project_rename(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand"])

    def project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch["p_partkey"],
                batch["p_name"],
                batch["p_brand"],
                pa.nulls(n, type=pa.string()),
            ],
            names=["id_part", "name", "brand", "architecture"],
        )

    return ds.map_batches(project, batch_format="pyarrow")


SQL_PROJECT = """
SELECT p_partkey AS id_part, p_name AS name, p_brand AS brand,
       CAST(NULL AS VARCHAR) AS architecture
FROM part
"""

# ---------------------------------------------------------------------------
# J3 — fuzzy broadcast country lookup (containment path; JW path is
# covered by unit goldens since SQL cannot express Jaro-Winkler)
# ---------------------------------------------------------------------------


def q_fuzzy_country(sf_dir: str):
    nation = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    order = pa.compute.sort_indices(nation, sort_keys=[("n_nationkey", "ascending")])
    nation = nation.take(order)
    countries = build_country_index(
        nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()
    )
    handle = Broadcast(countries)
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    dim = nation.rename_columns(["c_nationkey", "n_name"])
    joined = broadcast_join(cust, dim, on="c_nationkey")

    def match(df: pd.DataFrame) -> pd.DataFrame:
        idx = handle.get()
        cells = "Unspecified / " + df["n_name"].astype(str)
        df["id_country"] = [select_country_id(cell, idx) for cell in cells]
        return df[["c_custkey", "id_country"]]

    return joined.map_batches(match, batch_format="pandas")


#: Encodes the reference's containment-first-match quirk: "nation 1" is a
#: substring of "nation 15", and the argmin updates only on strictly
#: smaller distance, so the first catalog entry with distance 0 wins
#: (paper_information_table.py:540-546) — NATION_10..19 → 1, 20..24 → 2.
SQL_FUZZY_COUNTRY = """
SELECT c_custkey,
       CAST(CASE WHEN c_nationkey >= 20 THEN 2
                 WHEN c_nationkey >= 10 THEN 1
                 ELSE c_nationkey END AS BIGINT) AS id_country
FROM customer
"""

# ---------------------------------------------------------------------------
# text analysis stages (BPE-ish token counting oracled; langid/quality are
# heuristic and covered by pytest goldens → rows-only)
# ---------------------------------------------------------------------------


def q_token_bpe(sf_dir: str):
    from ..stages.text_stats import token_count_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


SQL_TOKEN_BPE = r"""
SELECT doc_id,
       CAST(coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens_ws,
       CAST(coalesce(array_length(regexp_extract_all(text, '\w+|[^\w\s]')), 0) AS BIGINT) AS n_tokens_bpe
FROM documents
"""


def q_content_fingerprint(sf_dir: str):
    from ..stages.text_stats import content_fingerprint_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(content_fingerprint_batch, batch_format="pyarrow")


SQL_FINGERPRINT = r"""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def q_lang_id(sf_dir: str):
    """Stopword-voting language ID (actor-pool stage; profiles compiled
    once per actor).  Value-oracled: the vote — per-language stopword
    hit counts over the unicode-letter token runs, argmax with
    first-in-sorted-order tie break, zero evidence → 'und' — is exactly
    expressible as SQL list arithmetic, so the driver hash pins every
    prediction."""
    from ..stages.text_stats import LangIdStage

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))


def _sql_lang_id() -> str:
    from ..stages.text_stats import _PROFILES

    langs = sorted(_PROFILES)
    hit_cols = ",\n    ".join(
        "COALESCE(CAST(list_sum(list_transform(ws, w -> CASE WHEN w IN ({words}) "
        "THEN 1 ELSE 0 END)) AS BIGINT), 0) AS h_{lang}".format(
            words=",".join(f"'{w}'" for w in sorted(_PROFILES[lang])), lang=lang
        )
        for lang in langs
    )
    g = "greatest({})".format(", ".join(f"h_{lang}" for lang in langs))
    picks = "\n       ".join(
        f"WHEN h_{lang} = {g} THEN '{lang}'" for lang in langs[:-1]
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(regexp_extract_all(text, '\\p{{L}}+'), w -> lower(w)) AS ws
  FROM documents
), hits AS (
  SELECT doc_id,
    {hit_cols}
  FROM toks
)
SELECT doc_id,
  CASE WHEN {g} = 0 THEN 'und'
       {picks}
       ELSE '{langs[-1]}' END AS lang_pred
FROM hits
"""


SQL_LANG_ID = _sql_lang_id()


def q_quality_score(sf_dir: str):
    from ..stages.text_stats import quality_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


#: SQL mirror of stages.text_stats.quality_batch — same split rule
#: (\S+ runs), same ASCII-alpha predicate, same stopword set, identical
#: arithmetic order so the composite is bit-comparable.
def _sql_stops() -> str:
    from ..stages.text_stats import _STOP_EN

    return ",".join(f"'{w}'" for w in sorted(_STOP_EN))


_SQL_STOPS = _sql_stops()

SQL_QUALITY = f"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(text, '\\S+') AS words,
         length(regexp_replace(text, '\\s', '', 'g')) AS n_chars
  FROM documents
), stats AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_tokens,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE CAST(n_chars AS DOUBLE) / len(words) END AS mwl,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(words,
                     w -> CASE WHEN regexp_full_match(w, '[A-Za-z]+') THEN 1 ELSE 0 END))
                   AS DOUBLE) / len(words) END AS alpha,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(words,
                     w -> CASE WHEN lower(w) IN ({_SQL_STOPS}) THEN 1 ELSE 0 END))
                   AS DOUBLE) / len(words) END AS stop
  FROM toks
)
SELECT doc_id,
       n_tokens,
       mwl AS mean_word_len,
       alpha AS alpha_ratio,
       stop AS stop_ratio,
       0.4 * (least(n_tokens / 20.0, 1.0)
              * least(greatest((5000 - n_tokens) / 5000.0, 0.0), 1.0))
       + 0.3 * alpha
       + 0.2 * (least(greatest((mwl - 2) / 4.0, 0.0), 1.0)
                * least(greatest((12 - mwl) / 6.0, 0.0), 1.0))
       + 0.1 * least(stop * 5, 1.0) AS quality_score
FROM stats
"""


#: dedupe-keep-best: the quality CTE is the full SQL_QUALITY statement
#: (bit-identical composite), the keep rule is one QUALIFY arg-best.
SQL_DEDUP_KEEP_BEST = f"""
WITH q AS ({SQL_QUALITY})
SELECT substr(d.text, 1, 20) AS text_key, d.doc_id, q.quality_score
FROM documents d JOIN q ON q.doc_id = d.doc_id
QUALIFY row_number() OVER (PARTITION BY text_key
                           ORDER BY q.quality_score DESC, d.doc_id) = 1
"""


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprints (Schleimer et al. SIGMOD'03), exploded to
    one row per selected fingerprint (doc_id, ord, fp) — the MOSS-style
    document-fingerprint table a plagiarism/copy detector joins on.

    Value-oracled since round 4: the gram hash is a polynomial
    code-point hash mod 2^31-1 (stages/text_stats.py) that DuckDB
    reproduces bit-exactly, and the rightmost-min window rule collapses
    to a packed-key window min (SQL_WINNOW) — no per-row Python on
    either engine."""
    from ..stages.text_stats import winnow_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = winnow_batch(batch)
        fps = tbl["winnow_fps"]
        if isinstance(fps, pa.ChunkedArray):
            fps = fps.combine_chunks()
        lens = pc.list_value_length(fps).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = np.repeat(tbl["doc_id"].to_numpy(zero_copy_only=False), lens)
        # ord = 1-based position within each doc's fingerprint sequence
        ends = np.cumsum(lens)
        ords = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - lens, lens
        ) + 1
        return pa.Table.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(ords, type=pa.int64()),
             fps.flatten().cast(pa.int64())],
            names=["doc_id", "ord", "fp"],
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def _winnow_pow(j: int) -> int:
    from ..stages.text_stats import _SHINGLE, _WINNOW_BASE, _WINNOW_MOD

    return pow(_WINNOW_BASE, _SHINGLE - 1 - j, _WINNOW_MOD)


#: Winnowing in SQL: same normalization as content_fingerprint, gram
#: hash = Σ unicode(char_j)·BASE^(k-1-j) mod 2^31-1 (term < 2^52, no
#: overflow), rightmost-min window rule via min over a packed
#: hash·2^31 + (2^31-1-pos) key (selected positions are non-decreasing,
#: so DISTINCT == consecutive-dedupe), short docs (< k+window-1 grams)
#: take the single global min per the kernel's contract.
SQL_WINNOW = f"""
WITH t AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+', ' ', 'g')) AS s
  FROM documents
), g AS (
  SELECT doc_id, s, length(s) AS n FROM t WHERE length(s) >= 5
), h AS (
  SELECT doc_id, n, i,
         (CAST(unicode(substr(s, i + 1, 1)) AS BIGINT) * {_winnow_pow(0)}
        + CAST(unicode(substr(s, i + 2, 1)) AS BIGINT) * {_winnow_pow(1)}
        + CAST(unicode(substr(s, i + 3, 1)) AS BIGINT) * {_winnow_pow(2)}
        + CAST(unicode(substr(s, i + 4, 1)) AS BIGINT) * {_winnow_pow(3)}
        + CAST(unicode(substr(s, i + 5, 1)) AS BIGINT) * {_winnow_pow(4)}) % 2147483647 AS hv
  FROM (SELECT doc_id, s, n, unnest(range(0, n - 4)) AS i FROM g)
), wm AS (
  SELECT doc_id, n, i,
         min(hv * 2147483648 + (2147483647 - i))
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM h WHERE n >= 8
), sel AS (
  SELECT DISTINCT doc_id,
         2147483647 - (wmin % 2147483648) AS pos,
         wmin // 2147483648 AS fp
  FROM wm WHERE i <= n - 8
  UNION ALL
  SELECT doc_id, CAST(0 AS BIGINT) AS pos, min(hv) AS fp
  FROM h WHERE n < 8 GROUP BY doc_id
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS ord,
       CAST(fp AS BIGINT) AS fp
FROM sel
ORDER BY doc_id, ord
"""


# ---------------------------------------------------------------------------
# near-dup dedupe over a corpus with injected near-duplicates
# (deterministic mutation: copies at doc_id+1_000_000 drop the last 2 words)
# ---------------------------------------------------------------------------


def _with_injected_dupes(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def with_mutants(batch: pa.Table) -> pa.Table:
        # emit original + mutated rows from ONE pass (a union of two
        # branches would read and decode the parquet twice)
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        mutated = [" ".join((t or "").split()[:-2]) for t in texts]
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate([ids, ids + 1_000_000])),
                pa.array(texts + mutated, type=pa.string()),
            ],
            names=["doc_id", "text"],
        )

    return ds.map_batches(with_mutants, batch_format="pyarrow")


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH candidate generation + exact n-gram-Jaccard verify
    over a corpus with injected near-duplicates (see stages.dedup)."""
    from ..stages.dedup import minhash_dup_pairs

    corpus = _with_injected_dupes(sf_dir)
    pairs = minhash_dup_pairs(corpus, threshold=0.5)
    pairs["exact_jaccard"] = pairs["exact_jaccard"].round(6)
    return pairs


def q_near_dedup_corpus(sf_dir: str):
    """The full near-dup removal pipeline, end-to-end: MinHash-LSH
    candidate pairs (banded signatures, exact-Jaccard verify) →
    connected components (transitive closure of the pair graph) → keep
    the minimum doc id per cluster → survivor counts by origin.  The
    self-checking property: NO mutant survives (its original always has
    the smaller id), and the original count may drop further when
    originals genuinely near-dup each other (the synthetic word-salad
    corpus contains some).  Rows-only (LSH pair lists aren't
    SQL-expressible); each stage is individually oracled/tested.

    Loser-set routing: the loser-id list broadcasts only while it fits
    ``loser_budget`` ids; a dup-heavy crawl (30-50% dups is normal at
    CommonCrawl scale) makes it corpus-order, and then the filter swaps
    to ``tabular.shuffle_semi_filter`` — the losers stay a Dataset and
    the corpus co-partitions against them in one exchange.  Both paths
    produce identical survivors (pytest asserts it on an adversarial
    high-dup corpus)."""
    return _near_dedup_counts(sf_dir)


#: loser ids above which the near-dedup anti-filter stops broadcasting
#: (64 MB of int64 ids ≈ 8M — comfortably inside the object store but
#: past the point where every task re-reading it beats one exchange)
NEAR_DEDUP_LOSER_BUDGET = 8_000_000


def _near_dedup_counts(sf_dir: str, *, loser_budget: int = NEAR_DEDUP_LOSER_BUDGET):
    import pyarrow.compute as pc

    from ..stages.dedup import near_dedup_edges
    from ..stages.graph import connected_components
    from .tabular import broadcast_semi_filter, grouped_aggregate, shuffle_semi_filter

    corpus = _with_injected_dupes(sf_dir).materialize()
    # exact-dup pre-pass + budget-routed LSH pairs: identical-content
    # groups cost O(g) edges and the pair list only collapses to the
    # driver while it fits PAIR_BUDGET (see stages/dedup.near_dedup_edges)
    edges = near_dedup_edges(corpus, threshold=0.5, loser_budget=loser_budget)
    comp = connected_components(edges)
    # drop every clustered doc that is not its component's minimum
    losers_ds = comp.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    n_losers = losers_ds.count()
    if n_losers <= loser_budget:
        losers = losers_ds.to_pandas()["doc_id"].to_numpy().astype(np.int64)
        survivors = broadcast_semi_filter(corpus, losers, "doc_id", anti=True)
    else:
        survivors = shuffle_semi_filter(corpus, losers_ds, "doc_id", anti=True)

    def src_of(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({"origin": np.where(ids < 1_000_000, "original", "mutant")})

    return grouped_aggregate(
        survivors.map_batches(src_of, batch_format="pyarrow"),
        ["origin"],
        {"n_docs": ("count", None)},
        small_keys=True,
    )


_SSJOIN_T = 0.8
_SSJOIN_GATE_T = 0.9


def q_ssjoin_jaccard(sf_dir: str):
    """EXACT n-gram-Jaccard set-similarity self-join (AllPairs prefix
    filtering, stages/dedup.ssjoin_exact): every document pair with
    word-3-shingle Jaccard ≥ 0.8, no LSH approximation.  Value-oracled
    bit-for-bit against DuckDB's own shingle-set arithmetic — the one
    dedup family member where the oracle can pin the PAIR LIST itself,
    not just a property of it."""
    from ..stages.dedup import ssjoin_exact

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    out = ssjoin_exact(ds, threshold=_SSJOIN_T, n=3)
    out["jaccard"] = out["jaccard"].round(6)
    return out


SQL_SSJOIN = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts
  FROM documents WHERE text IS NOT NULL AND text <> ''
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
         ELSE list_transform(range(1, len(ts) - 1), i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]) END) AS s
  FROM toks
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b_exp.doc_id AS id_b
  FROM sh a, UNNEST(a.s) s2(g)
  JOIN (SELECT doc_id, UNNEST(s) AS g FROM sh) b_exp(doc_id, g) USING (g)
  WHERE a.doc_id < b_exp.doc_id
)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
             / len(list_distinct(x.s || y.s)), 6) AS jaccard
FROM cand JOIN sh x ON x.doc_id = cand.id_a JOIN sh y ON y.doc_id = cand.id_b
WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / len(list_distinct(x.s || y.s)) >= {_SSJOIN_T}
"""


def q_minhash_recall_gate(sf_dir: str):
    """The MinHash-LSH recall contract at the driver gate (same pattern
    as `hll_rank_check`): every pair the EXACT prefix-filtered join
    proves has Jaccard ≥ 0.9 must also be found by the 16-band × 4-row
    LSH (per-pair miss probability (1-0.9⁴)¹⁶ ≈ 4e-8).  The oracle
    enumerates the exact pair list with ``found = TRUE``, so a
    signature/banding regression that drops a real near-dup reds the
    value hash — turning the probabilistic dedup path into a
    driver-checked component instead of a rows-only one."""
    from ..stages.dedup import minhash_dup_pairs, ssjoin_exact

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    exact = ssjoin_exact(ds, threshold=_SSJOIN_GATE_T, n=3)
    lsh = minhash_dup_pairs(ds, threshold=_SSJOIN_GATE_T)
    lsh_keys = set(zip(lsh["id_a"].astype(int), lsh["id_b"].astype(int)))
    found = [
        (int(a), int(b)) in lsh_keys
        for a, b in zip(exact["id_a"], exact["id_b"])
    ]
    return pd.DataFrame(
        {"id_a": exact["id_a"].astype(np.int64),
         "id_b": exact["id_b"].astype(np.int64),
         "found": np.asarray(found, dtype=bool)}
    ).reset_index(drop=True)


SQL_MINHASH_RECALL_GATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts
  FROM documents WHERE text IS NOT NULL AND text <> ''
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
         ELSE list_transform(range(1, len(ts) - 1), i -> ts[i]||' '||ts[i+1]||' '||ts[i+2]) END) AS s
  FROM toks
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b_exp.doc_id AS id_b
  FROM sh a, UNNEST(a.s) s2(g)
  JOIN (SELECT doc_id, UNNEST(s) AS g FROM sh) b_exp(doc_id, g) USING (g)
  WHERE a.doc_id < b_exp.doc_id
)
SELECT id_a, id_b, TRUE AS found
FROM cand JOIN sh x ON x.doc_id = cand.id_a JOIN sh y ON y.doc_id = cand.id_b
WHERE CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
      / len(list_distinct(x.s || y.s)) >= {_SSJOIN_GATE_T}
"""


def q_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_with_injected_dupes(sf_dir), max_hamming=3)


def q_simhash_values(sf_dir: str):
    from ..stages.dedup import simhash_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup pairs (cosine ≥ 0.35) — oracled via duckdb
# list_cosine_similarity; the fixed testdata keeps every similarity
# ≥1.2e-6 away from the threshold, far above the engines' 1e-7 float32
# divergence (verified across sf0.001/0.01/0.1)
# ---------------------------------------------------------------------------


#: rows below which the full normalized matrix broadcasts (one ray.put,
#: matmul per batch); above it the exact blocked all-pairs path runs —
#: no driver-side matrix at any scale, same results (both exact).
_EMB_BROADCAST_ROWS = 50_000


def _emb_rows(sf_dir: str) -> int:
    """Embedding-table row count from the parquet footer (no scan) —
    the routing statistic for every broadcast-vs-blocked decision."""
    import os
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")
    ).metadata.num_rows


def q_embedding_dup_pairs(sf_dir: str):
    """Exact cosine near-dup pairs.  Router: broadcast matmul while the
    table fits the broadcast budget (row count from the parquet footer,
    no scan), else the blocked all-pairs path
    (stages.dedup.embedding_dup_pairs_blocked) — and
    embedding_dup_pairs_lsh is the sublinear approximate path for real
    corpora."""
    import os
    import pyarrow.parquet as pq

    from ..stages.dedup import embedding_dup_pairs, embedding_dup_pairs_blocked

    path = os.path.join(sf_dir, "embeddings.parquet")
    n_rows = pq.ParquetFile(path).metadata.num_rows
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    if n_rows <= _EMB_BROADCAST_ROWS:
        all_t = pq.read_table(path, columns=["vec_id", "embedding"])
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in all_t["embedding"].to_pylist()])
        ids = np.asarray(all_t["vec_id"].to_pylist())
        pairs = embedding_dup_pairs(ds, mat, ids, threshold=0.35)
    else:
        pairs = embedding_dup_pairs_blocked(ds, threshold=0.35)
    return pairs.map_batches(lambda df: df[["id_a", "id_b"]], batch_format="pandas")


SQL_EMB_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.35
"""

# ---------------------------------------------------------------------------
# similarity search: LSH-bucketed ANN (recall measured in pytest vs the
# brute-force baseline, which is oracled as knn_cosine above)
# ---------------------------------------------------------------------------


def q_knn_lsh(sf_dir: str):
    import os
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_lsh

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    qmask = pa.compute.less(emb["vec_id"], 5)
    qt = emb.filter(qmask)
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = np.asarray(qt["vec_id"].to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_lsh(ds, queries, qids, k=10, planes=8, probe_radius=1)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


def q_knn_lsh_shuffle(sf_dir: str):
    """The big-query-set ANN scale path: queries stay a Dataset, both
    sides shuffle once to (table, bucket) keys, nothing is broadcast
    (stages/similarity.knn_lsh_shuffle; recall property-tested)."""
    from ..stages.similarity import knn_lsh_shuffle

    corpus = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    queries = (
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], 5)), batch_format="pyarrow"
        )
        .rename_columns({"vec_id": "query_id"})
    )
    out = knn_lsh_shuffle(corpus, queries, k=10, planes=8, tables=8, probe_radius=1)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# multimodal plumbing (decode stubs; Ray-side schema/actor wiring is real)
# ---------------------------------------------------------------------------


def q_media_decode(sf_dir: str):
    from ..stages.multimodal import ImageDecodeStage, synth_media_table

    import ray.data as rd

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        refs = [f"img://doc/{i}" for i in batch["doc_id"].to_pylist()]
        return synth_media_table(refs, "image")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(ImageDecodeStage, batch_format="pyarrow", concurrency=(1, 4))


def q_media_frames(sf_dir: str):
    from ..stages.multimodal import FrameSampleStage, synth_media_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        refs = [f"vid://doc/{i}" for i in batch["doc_id"].to_pylist()]
        return synth_media_table(refs, "video")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(FrameSampleStage, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# E2-equivalent information extraction: pluggable extract_fn over token
# windows with first-hit-wins, per-cell coercion, fuzzy hardware join
# ---------------------------------------------------------------------------

_INFO_CATALOG = [
    (1, "nvidia a100 80gb", 312.0, 0.4),
    (2, "nvidia v100", 125.0, 0.3),
    (3, "google tpu v4", 275.0, 0.2),
]


def q_information_extraction(sf_dir: str):
    """Full extraction pipeline over synthetic "articles" built from the
    documents table (deterministic augmentation so the expected values
    are SQL-expressible): regex-rule extract_fn (the hermetic stand-in
    for the reference's LLM, create_tables.py:53-58) + windowing +
    coercion + fuzzy hardware enrichment."""
    from ..stages.field_extract import extract_information

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def article(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        aug = [
            f"{t} describing model M{i} with {i % 90 + 1} million parameters "
            f"trained in {2000 + i % 25} on {i % 500 + 1} A100 GPUs"
            for i, t in zip(ids, texts)
        ]
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(aug, type=pa.string())], names=["id_paper", "text"]
        )

    articles = ds.map_batches(article, batch_format="pyarrow")
    return extract_information(articles, hardware_catalog=_INFO_CATALOG)


SQL_INFO_EXTRACT = """
SELECT doc_id AS id_paper,
       'M' || cast(doc_id AS varchar)              AS model,
       CAST((doc_id % 90 + 1) * 1000000 AS BIGINT) AS parameters,
       CAST(doc_id % 500 + 1 AS BIGINT)            AS h_number,
       CAST(2000 + doc_id % 25 AS BIGINT)          AS year,
       'A100'                                      AS hardware_text,
       CAST(1 AS BIGINT)                           AS id_hardware,
       312.0                                       AS h_compute,
       0.4                                         AS h_power
FROM documents
"""


# ---------------------------------------------------------------------------
# E3-equivalent eval harness: char metrics oracled via DuckDB's own
# levenshtein/jaro_winkler (verified bit-identical to the engine's
# implementations); semantic distance uses the deterministic stand-in
# encoder → rows-only
# ---------------------------------------------------------------------------


def _eval_pairs(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        preds = [" ".join((t or "").split()[:-1]) for t in texts]
        return pa.Table.from_arrays(
            [
                pa.array(["m1"] * len(ids), type=pa.string()),
                pa.array(langs, type=pa.string()),
                pa.array(ids),
                pa.array(texts, type=pa.string()),
                pa.array(preds, type=pa.string()),
            ],
            names=["model", "category", "idx", "true", "predicted"],
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def q_eval_char_metrics(sf_dir: str):
    from .eval import char_metrics_batch

    out = _eval_pairs(sf_dir).map_batches(char_metrics_batch, batch_format="pyarrow")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"idx": "doc_id"})
        df["norm_levenshtein"] = df["norm_levenshtein"].round(9)
        df["jaro_winkler_distance"] = df["jaro_winkler_distance"].round(9)
        return df[["doc_id", "levenshtein", "norm_levenshtein", "jaro_winkler_distance"]]

    return out.map_batches(project, batch_format="pandas")


SQL_EVAL_CHAR = """
WITH pairs AS (
  SELECT doc_id, text AS t,
         CASE WHEN length(text) - length(replace(text, ' ', '')) >= 1
              THEN regexp_replace(text, ' [^ ]*$', '') ELSE '' END AS p
  FROM documents
)
SELECT doc_id,
       CAST(levenshtein(t, p) AS BIGINT) AS levenshtein,
       round(CASE WHEN length(t) = 0 AND length(p) = 0 THEN 0.0
                  ELSE CAST(levenshtein(t, p) AS DOUBLE) / greatest(length(t), length(p)) END, 9)
           AS norm_levenshtein,
       round(1.0 - jaro_winkler_similarity(t, p), 9) AS jaro_winkler_distance
FROM pairs
"""


def q_eval_summary(sf_dir: str):
    """Per-(model, category) char-distance stats (G4 definitions:
    population std, interpolated median)."""
    from .eval import char_metrics_batch

    scored = _eval_pairs(sf_dir).map_batches(char_metrics_batch, batch_format="pyarrow")

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        v = df["levenshtein"].to_numpy(dtype=float)
        return pd.DataFrame(
            [
                {
                    "model": df["model"].iloc[0],
                    "category": df["category"].iloc[0],
                    "lev_count": np.int64(v.size),
                    "lev_mean": round(float(v.mean()), 6),
                    "lev_median": float(np.median(v)),
                    "lev_std": round(float(v.std(ddof=0)), 6),
                }
            ]
        )

    return scored.groupby(["model", "category"]).map_groups(stats, batch_format="pandas")


SQL_EVAL_SUMMARY = """
WITH pairs AS (
  SELECT lang AS category, text AS t,
         CASE WHEN length(text) - length(replace(text, ' ', '')) >= 1
              THEN regexp_replace(text, ' [^ ]*$', '') ELSE '' END AS p
  FROM documents
)
SELECT 'm1' AS model, category,
       CAST(count(*) AS BIGINT) AS lev_count,
       round(avg(levenshtein(t, p)), 6) AS lev_mean,
       median(CAST(levenshtein(t, p) AS DOUBLE)) AS lev_median,
       round(stddev_pop(levenshtein(t, p)), 6) AS lev_std
FROM pairs GROUP BY category
"""


def q_eval_semantic(sf_dir: str):
    from .eval import score_results

    scored = score_results(_eval_pairs(sf_dir))
    return scored.map_batches(
        lambda df: df[["idx", "cosine_distance"]].rename(columns={"idx": "doc_id"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# E1-equivalent gold-table build: epoch-shaped rows → cleaned/coerced/
# fuzzy-joined paper-information rows (pipelines.ingest)
# ---------------------------------------------------------------------------


def q_gold_from_epoch(sf_dir: str):
    from .ingest import build_gold_information

    nation = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    order = pa.compute.sort_indices(nation, sort_keys=[("n_nationkey", "ascending")])
    nation = nation.take(order)

    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]
    )

    def epochify(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy()
        size = batch["p_size"].to_numpy()
        hw = np.where(pk % 3 == 0, "A100", np.where(pk % 3 == 1, "NVIDIA V100", "TPU v4"))
        return pa.Table.from_arrays(
            [
                pa.array(pk),
                batch["p_name"],
                batch["p_type"],
                batch["p_brand"],
                pa.array((size * 1_000_000).astype(np.float64)),
                pa.array(batch["p_retailprice"].to_numpy() * 1e12),
                pa.array(size * 30.0),
                pa.array((size % 64 + 1).astype(np.float64)),
                pa.array([f"20{int(k) % 25:02d}-06-15" for k in pk], type=pa.string()),
                pa.array([f"Unspecified / NATION_{int(k) % 25}" for k in pk], type=pa.string()),
                pa.array(hw, type=pa.string()),
            ],
            names=[
                "id_paper", "model", "abstract", "approach", "parameters",
                "training_compute", "training_power_draw_w", "hardware_quantity",
                "publication_date", "country_of_organization", "training_hardware",
            ],
        )

    epoch = part.map_batches(epochify, batch_format="pyarrow")
    return build_gold_information(
        epoch,
        nation["n_nationkey"].to_pylist(),
        nation["n_name"].to_pylist(),
        [(c[0], c[1], c[2], c[3]) for c in _INFO_CATALOG],
    )


SQL_GOLD = """
SELECT p_partkey AS id_paper,
       p_name AS model,
       p_type AS abstract,
       p_brand AS architecture,
       CAST(p_size * 1000000 AS BIGINT) AS parameters,
       p_retailprice * 1e12 AS training_compute,
       p_size * 30.0 AS power_draw,
       CAST(p_size % 64 + 1 AS BIGINT) AS h_number,
       CAST(2000 + p_partkey % 25 AS BIGINT) AS year,
       CAST(CASE WHEN p_partkey % 25 >= 20 THEN 2
                 WHEN p_partkey % 25 >= 10 THEN 1
                 ELSE p_partkey % 25 END AS BIGINT) AS id_country,
       CAST(CASE p_partkey % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 3 END AS BIGINT) AS id_hardware,
       CASE p_partkey % 3 WHEN 0 THEN 312.0 WHEN 1 THEN 125.0 ELSE 275.0 END AS h_compute,
       CASE p_partkey % 3 WHEN 0 THEN 0.4 WHEN 1 THEN 0.3 ELSE 0.2 END AS h_power
FROM part
"""


# ---------------------------------------------------------------------------
# diagnosis stats (reference A5/G4, diagnosis/nb_token_papers.py:63-74):
# token-count distribution — count/mean/p50/p90/p95/max
# ---------------------------------------------------------------------------


def _quantile_from_hist(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Exact linear-interpolated quantile from a (sorted value, count)
    histogram — numpy 'linear' / DuckDB quantile_cont semantics:
    ``v_lo + (v_hi - v_lo) * frac`` at position (n-1)·q."""
    n = int(counts.sum())
    h = (n - 1) * q
    lo, hi = int(np.floor(h)), int(np.ceil(h))
    cum = np.cumsum(counts)
    v_lo = float(values[np.searchsorted(cum, lo + 1)])
    v_hi = float(values[np.searchsorted(cum, hi + 1)])
    return v_lo + (v_hi - v_lo) * (h - lo)


def q_token_quantiles(sf_dir: str):
    """Global token-count stats via an EXACT mergeable histogram sketch:
    each batch emits (value, count) partials — token counts are bounded
    ints, so the histogram is lossless — and only the tiny partial
    histograms leave the workers.  Shuffle/driver volume is O(distinct
    values), independent of corpus row count (the scale form of the
    t-digest/KLL pattern, exact here because the domain is discrete)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial_hist(batch: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        vc = pa.Table.from_arrays([toks], names=["n_tokens"])
        return pa.TableGroupBy(vc, "n_tokens").aggregate([("n_tokens", "count")]).rename_columns(
            ["n_tokens", "cnt"]
        )

    partials = ds.map_batches(partial_hist, batch_format="pyarrow").to_pandas()
    hist = partials.groupby("n_tokens", as_index=False)["cnt"].sum().sort_values("n_tokens")
    values = hist["n_tokens"].to_numpy(dtype=np.float64)
    counts = hist["cnt"].to_numpy(dtype=np.int64)
    n = int(counts.sum())
    total = float(np.dot(values, counts))
    return pd.DataFrame(
        [
            {
                "n_docs": np.int64(n),
                "mean_tokens": round(total / n, 6),
                "p50": _quantile_from_hist(values, counts, 0.50),
                "p90": _quantile_from_hist(values, counts, 0.90),
                "p95": _quantile_from_hist(values, counts, 0.95),
                "max_tokens": np.int64(values[-1]),
            }
        ]
    )


SQL_TOKEN_QUANTILES = r"""
WITH c AS (
  SELECT coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS n FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n), 6) AS mean_tokens,
       CAST(quantile_cont(n, 0.50) AS DOUBLE) AS p50,
       CAST(quantile_cont(n, 0.90) AS DOUBLE) AS p90,
       CAST(quantile_cont(n, 0.95) AS DOUBLE) AS p95,
       CAST(max(n) AS BIGINT) AS max_tokens
FROM c
"""

# ---------------------------------------------------------------------------
# session windows over the event log (gap-based sessionization; the
# streaming-shaped workload pattern — ordered scan within key groups)
# ---------------------------------------------------------------------------

_SESSION_GAP_SEC = 1800


def q_sessionize(sf_dir: str):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        # Gap counts whole-second boundary crossings (DuckDB date_diff
        # semantics): floor both timestamps to the second before diffing,
        # so a 1800.4 s gap between :00.8 and :01.2 counts like the oracle.
        gap = df["ts"].dt.floor("s").groupby(df["user_id"]).diff().dt.total_seconds()
        new_sess = (gap.isna() | (gap > _SESSION_GAP_SEC)).astype(np.int64)
        df["session_id"] = new_sess.groupby(df["user_id"]).cumsum()
        # Sum in integer cents: values are exact 2-decimal doubles, so the
        # int64 sum is exact and order-independent, and cents/100 is bit-equal
        # to DuckDB's round(sum(value), 2) regardless of its accumulation
        # order or its half-away-from-zero rule (pandas .round is banker's —
        # that mismatch was the r01 red oracle).
        df["__cents"] = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        out = (
            df.groupby(["user_id", "session_id"], sort=False)
            .agg(
                n_events=("event_id", "size"),
                sum_value=("__cents", "sum"),
                t_start=("ts", "min"),
                t_end=("ts", "max"),
            )
            .reset_index()
        )
        out["sum_value"] = out["sum_value"].to_numpy(dtype=np.float64) / 100.0
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: sessions(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > {_SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value,
       min(ts) AS t_start, max(ts) AS t_end
FROM numbered GROUP BY user_id, session_id
"""

# ---------------------------------------------------------------------------
# typed-metadata extraction from a JSON props column (vectorized regex
# on the Ray side, json_extract on the oracle side — identical for the
# flat props payloads in the events table)
# ---------------------------------------------------------------------------


def q_props_extract(sf_dir: str):
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "events", columns=["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        caps = pc.extract_regex(batch["props"], r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(caps, "k"), pa.int64())
        return pa.Table.from_arrays([batch["event_id"], k], names=["event_id", "k"])

    return ds.map_batches(extract, batch_format="pyarrow")


SQL_PROPS = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""

# ---------------------------------------------------------------------------
# deterministic seeded sampling (hash-threshold, ~10%)
# ---------------------------------------------------------------------------


def q_sample_seeded(sf_dir: str):
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def sample(batch: pa.Table) -> pa.Table:
        mask = md5_lt_mask(batch["o_orderkey"], "19999999999999999999999999999999")
        return batch.filter(pa.array(mask))

    out = ds.map_batches(sample, batch_format="pyarrow")
    agg = grouped_aggregate(
        out.map_batches(
            lambda t: t.append_column("g", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        ),
        ["g"],
        {"n_sampled": ("count", None), "sum_price": ("sum", "o_totalprice")},
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["sum_price"].round(2)
        return df[["n_sampled", "sum_price"]]

    return agg.map_batches(finalize, batch_format="pandas")


SQL_SAMPLE = """
SELECT CAST(count(*) AS BIGINT) AS n_sampled,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
WHERE md5(cast(o_orderkey AS varchar)) < '19999999999999999999999999999999'
"""


# ---------------------------------------------------------------------------
# G5 — expanding means per (model, category) in idx order (oracled via
# a running-average window function)
# ---------------------------------------------------------------------------


def q_expanding_mean(sf_dir: str):
    from .eval import char_metrics_batch, expanding_means

    scored = _eval_pairs(sf_dir).map_batches(char_metrics_batch, batch_format="pyarrow")

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        out = expanding_means(df, "levenshtein")
        out["levenshtein_expanding_mean"] = out["levenshtein_expanding_mean"].round(9)
        return out[["model", "category", "idx", "levenshtein_expanding_mean"]]

    return scored.groupby(["model", "category"]).map_groups(per_group, batch_format="pandas")


SQL_EXPANDING = """
WITH pairs AS (
  SELECT 'm1' AS model, lang AS category, doc_id AS idx,
         levenshtein(text,
           CASE WHEN length(text) - length(replace(text, ' ', '')) >= 1
                THEN regexp_replace(text, ' [^ ]*$', '') ELSE '' END) AS lev
  FROM documents
)
SELECT model, category, idx,
       round(avg(lev) OVER (PARTITION BY model, category ORDER BY idx
                            ROWS UNBOUNDED PRECEDING), 9) AS levenshtein_expanding_mean
FROM pairs
"""


# ---------------------------------------------------------------------------
# A3 — windowed QA extraction with a deterministic hook (the call_qa
# plugin surface; scores/aggregation semantics oracled in pytest)
# ---------------------------------------------------------------------------


def q_qa_extract(sf_dir: str):
    from ..stages.field_extract import qa_extract

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def deterministic_qa(question: str, chunk: str) -> list[tuple[str, float]]:
        # a hermetic "model": answer = first token of the chunk, scored
        # by chunk length (deterministic; exercises windowing + dedupe
        # + best-score aggregation end to end)
        toks = chunk.split()
        if not toks:
            return []
        return [(toks[0], float(len(chunk)))]

    def run(batch: pa.Table) -> pa.Table:
        answers = [
            qa_extract(
                t or "",
                "model",
                deterministic_qa,
                question_map={"model": "what is it?"},
                window=80,
                stride=40,
            )
            for t in batch["text"].to_pylist()
        ]
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(answers, type=pa.string())],
            names=["doc_id", "answer"],
        )

    return ds.map_batches(run, batch_format="pyarrow")


def q_qa_token_extract(sf_dir: str):
    """A3 inner contract end-to-end: char windows (qa_extract) around
    token sub-windows with joint-argmax span selection (qa_window) —
    the deterministic PatternLogitHead stands in for the HF forward."""
    from ..stages.field_extract import qa_extract
    from ..stages.qa_window import make_qa_fn

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    class QATokenStage:
        def __init__(self):
            self.call_qa = make_qa_fn(max_length=64, stride=16)

        def __call__(self, batch: pa.Table) -> pa.Table:
            answers = [
                qa_extract(
                    t or "", "value", self.call_qa,
                    question_map={"value": "what number?"}, window=400, stride=200,
                )
                for t in batch["text"].to_pylist()
            ]
            return pa.Table.from_arrays(
                [batch["doc_id"], pa.array(answers, type=pa.string())],
                names=["doc_id", "answer"],
            )

    return ds.map_batches(QATokenStage, batch_format="pyarrow", concurrency=(1, 4))


def q_media_features(sf_dir: str):
    from ..stages.multimodal import ImageFeatureStage, synth_media_table

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        refs = [f"img://doc/{i}" for i in batch["doc_id"].to_pylist()]
        return synth_media_table(refs, "image")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(
        ImageFeatureStage, fn_constructor_kwargs={"dim": 32}, batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# M10+ — full epoch type-coercion layer: messy CSV-like strings through
# the 59-column normalize + class-dispatch coerce
# (reference tables/other/columns.py:74-95, convert.py:10-64,
# epoch_table.py:130-143)
# ---------------------------------------------------------------------------


def q_epoch_coerce(sf_dir: str):
    from .ingest import coerce_epoch_batch

    # the coercion UDF dominates (dateutil fallback); split the read so a
    # single-row-group file doesn't serialize the whole map chain
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"], split=True
    )

    def messy(batch: pa.Table) -> pd.DataFrame:
        # deterministic "dirty CSV" columns exercising each class set
        df = batch.to_pandas()
        k = df["o_orderkey"].to_numpy()
        date_str = df["o_orderdate"].dt.strftime("%Y-%m-%d").to_numpy(dtype=object)
        out = pd.DataFrame(
            {
                "id_paper": k.astype(str),
                "Publication date": np.where(k % 11 == 0, "unknown", date_str),
                "Citations": np.where(k % 7 == 0, "N/A", (k % 500).astype(str)),
                "Training compute (FLOP)": np.where(
                    k % 13 == 0, "", df["o_totalprice"].map(repr).to_numpy(dtype=object)
                ),
                "Frontier model": np.select(
                    [k % 5 == 0, k % 5 == 1, k % 5 == 2, k % 5 == 3],
                    ["true", "no", "1", "maybe"],
                    default="",
                ),
            }
        )
        return out

    coerced = ds.map_batches(messy, batch_format="pyarrow").map_batches(
        coerce_epoch_batch, batch_format="pandas"
    )

    def project(df: pd.DataFrame) -> pa.Table:
        # explicit output types: nullable ints surface as DOUBLE on the
        # DuckDB side (fetchdf), so citations compares as float64
        schema = pa.schema(
            [
                ("id_paper", pa.int64()),
                ("publication_date", pa.timestamp("us")),
                ("citations", pa.float64()),
                ("training_compute", pa.float64()),
                ("frontier_model", pa.bool_()),
            ]
        )
        sel = df[
            ["id_paper", "publication_date", "citations", "training_compute", "frontier_model"]
        ].copy()
        sel["citations"] = sel["citations"].astype("float64")
        # strip the embedded pandas-dtype metadata: from_pandas records the
        # nullable Int64/boolean dtypes and to_pandas would restore them,
        # while the DuckDB oracle side yields plain int64/object — the
        # driver's value hash is dtype-sensitive (see sessionize, r01)
        tbl = pa.Table.from_pandas(sel, schema=schema, preserve_index=False)
        return tbl.replace_schema_metadata(None)

    return coerced.map_batches(project, batch_format="pandas")


SQL_EPOCH_COERCE = """
WITH messy AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS id_paper,
         CASE WHEN o_orderkey % 11 = 0 THEN 'unknown'
              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS pub,
         CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
              ELSE CAST(o_orderkey % 500 AS VARCHAR) END AS cit,
         CASE WHEN o_orderkey % 13 = 0 THEN ''
              ELSE CAST(o_totalprice AS VARCHAR) END AS tc,
         CASE o_orderkey % 5 WHEN 0 THEN 'true' WHEN 1 THEN 'no'
              WHEN 2 THEN '1' WHEN 3 THEN 'maybe' ELSE '' END AS fm
  FROM orders)
SELECT try_cast(id_paper AS BIGINT) AS id_paper,
       CAST(try_cast(pub AS DATE) AS TIMESTAMP) AS publication_date,
       CAST(try_cast(cit AS BIGINT) AS DOUBLE) AS citations,
       try_cast(tc AS DOUBLE) AS training_compute,
       CASE WHEN lower(trim(fm)) IN ('true','1','yes','y','t') THEN true
            WHEN lower(trim(fm)) IN ('false','0','no','n','f') THEN false
            ELSE NULL END AS frontier_model
FROM messy
"""


# ---------------------------------------------------------------------------
# custom joins Ray Data lacks: as-of (backward) join and interval range
# join.  Both follow the brief's option (a): compositions of map_batches
# + groupby().map_groups with an explicit partitioning assumption,
# documented per operator.
# ---------------------------------------------------------------------------

#: fixed day shift that moves the orders' 1995-2001 date span into the
#: events table's 2024 window (calendar-free arithmetic on purpose:
#: year-offsets disagree between engines on leap days, day-counts don't)
_ASOF_SHIFT_DAYS = 10585
_ASOF_BUCKETS = 32


def q_asof_join(sf_dir: str):
    """As-of (backward inclusive) join: each event picks the latest
    order of the same key whose shifted timestamp is <= the event's.

    Shuffle shape: hash-bucket BOTH sides on the join key, union with a
    side tag, ONE groupby(bucket).map_groups doing a vectorized
    ``pandas.merge_asof`` per bucket — each table moves once, keyed, and
    the in-bucket merge is O(n log n) C code.  The right side is
    pre-shrunk per batch (max price per (key, ts)) before the shuffle so
    ties never travel twice; the bucket holds every row of a key, so the
    in-bucket final dedupe is exact.  Skew: coarse buckets (key % 32)
    bound per-group scheduling; a single hot key still fits one bucket
    because only that key's rows co-locate — at 100 TB the salting used
    by span reassembly (stages/extract.py) applies, with a boundary
    fix-up pass for matches that cross salt edges.
    """
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"], split=True)
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"], split=True)
    shift = np.timedelta64(_ASOF_SHIFT_DAYS, "D").astype("timedelta64[us]")

    def tag_left(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        n = len(batch)
        return pa.table(
            {
                "bucket": pa.array((uid % _ASOF_BUCKETS).astype(np.int32)),
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "event_id": batch["event_id"],
                "asof_price": pa.array(np.full(n, np.nan)),
                "is_left": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def tag_right(df: pd.DataFrame) -> pa.Table:
        # per-batch partial combine: one candidate per (key, ts) leaves
        # the batch, the in-bucket groupby-max finishes the job exactly
        eff = df["o_orderdate"].to_numpy(dtype="datetime64[us]") + shift
        part = (
            pd.DataFrame(
                {"user_id": df["o_custkey"], "ts": eff, "asof_price": df["o_totalprice"]}
            )
            .groupby(["user_id", "ts"], sort=False)["asof_price"]
            .max()
            .reset_index()
        )
        n = len(part)
        return pa.table(
            {
                "bucket": pa.array((part["user_id"].to_numpy() % _ASOF_BUCKETS).astype(np.int32)),
                "user_id": pa.array(part["user_id"].to_numpy()),
                "ts": pa.array(part["ts"].to_numpy(dtype="datetime64[us]")),
                "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "asof_price": pa.array(part["asof_price"].to_numpy()),
                "is_left": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["is_left"]]
        right = (
            df[~df["is_left"]]
            .groupby(["user_id", "ts"], sort=False)["asof_price"]
            .max()
            .reset_index()
            .rename(columns={"ts": "asof_ts"})
            .sort_values("asof_ts", kind="stable")
        )
        out = pd.merge_asof(
            left[["event_id", "user_id", "ts"]].sort_values("ts", kind="stable"),
            right,
            left_on="ts",
            right_on="asof_ts",
            by="user_id",
            direction="backward",  # latest asof_ts <= ts, inclusive
        )
        return out[out["asof_price"].notna()]  # inner semantics, like ASOF JOIN

    tagged = events.map_batches(tag_left, batch_format="pyarrow").union(
        orders.map_batches(tag_right, batch_format="pandas", batch_size=None)
    )
    return (
        tagged.groupby("bucket")
        .map_groups(lambda df: merge(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_ASOF = f"""
WITH r AS (
  SELECT o_custkey AS user_id,
         o_orderdate + INTERVAL {_ASOF_SHIFT_DAYS} DAY AS asof_ts,
         max(o_totalprice) AS asof_price
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, r.asof_ts, r.asof_price
FROM events e ASOF JOIN r ON e.user_id = r.user_id AND e.ts >= r.asof_ts
"""


def q_range_join(sf_dir: str):
    """Interval range join (non-equi, many-to-many): events X the top-50
    high-price order windows [d0, d0 + 7 days) that overlap the event
    span.

    The small side (top-k intervals) is computed with the existing
    distributed top-k then broadcast via ``ray.put`` — read once per
    task, never re-shipped per batch.  Each events batch tests ts
    against the sorted interval starts with two vectorized
    ``np.searchsorted`` calls per interval-batch (intervals here share a
    fixed width, so containment is a pure binary-search band); output is
    built with integer repeats, no per-row Python.  Scale path for a
    BIG interval side: :func:`..pipelines.tabular.interval_join`
    (chunk-replicated co-partition with single-chunk pair attribution)
    — running code, exercised and value-oracled by
    ``interval_overlap_join``; not needed here while the interval side
    is top-k.
    """
    from ..state.broadcast import Broadcast
    from .tabular import topk

    width = np.timedelta64(7, "D").astype("timedelta64[us]")
    shift = np.timedelta64(_ASOF_SHIFT_DAYS, "D").astype("timedelta64[us]")
    lo = np.datetime64("2023-12-01", "us")
    hi = np.datetime64("2024-02-01", "us")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def windows(batch: pa.Table) -> pa.Table:
        d0 = batch["o_orderdate"].to_numpy().astype("datetime64[us]") + shift
        keep = (d0 >= lo) & (d0 < hi)
        return pa.table(
            {
                "o_orderkey": pa.array(batch["o_orderkey"].to_numpy()[keep]),
                "o_totalprice": pa.array(batch["o_totalprice"].to_numpy()[keep]),
                "d0": pa.array(d0[keep]),
            }
        )

    top = (
        topk(
            orders.map_batches(windows, batch_format="pyarrow"),
            ["o_totalprice", "o_orderkey"],
            k=50,
            descending=[True, False],
        )
        .to_pandas()
        .sort_values("d0", kind="stable")
    )
    starts = top["d0"].to_numpy(dtype="datetime64[us]")
    keys = top["o_orderkey"].to_numpy()
    prices = top["o_totalprice"].to_numpy()
    bcast = Broadcast((starts, keys, prices))

    def probe(batch: pa.Table) -> pa.Table:
        s, k, p = bcast.get()
        ts = batch["ts"].to_numpy().astype("datetime64[us]")
        eid = batch["event_id"].to_numpy()
        # interval i matches ts iff s[i] <= ts < s[i] + width; with s
        # sorted, the matching intervals form the index band
        # [searchsorted(s, ts - width, 'right'), searchsorted(s, ts, 'right'))
        hi_idx = np.searchsorted(s, ts, side="right")
        lo_idx = np.searchsorted(s, ts - width, side="right")
        counts = hi_idx - lo_idx
        row_rep = np.repeat(np.arange(len(ts)), counts)
        # flat interval indices: for each row, lo_idx[row] .. hi_idx[row)-1
        offs = np.arange(len(row_rep)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        iv = np.repeat(lo_idx, counts) + offs
        return pa.table(
            {
                "event_id": pa.array(eid[row_rep]),
                "o_orderkey": pa.array(k[iv]),
                "ts": pa.array(ts[row_rep]),
                "o_totalprice": pa.array(p[iv]),
            }
        )

    events = read_table(sf_dir, "events", columns=["event_id", "ts"], split=True)
    return events.map_batches(probe, batch_format="pyarrow")


SQL_RANGE_JOIN = f"""
WITH t AS (
  SELECT o_orderkey, o_totalprice,
         o_orderdate + INTERVAL {_ASOF_SHIFT_DAYS} DAY AS d0
  FROM orders
  WHERE o_orderdate + INTERVAL {_ASOF_SHIFT_DAYS} DAY >= TIMESTAMP '2023-12-01'
    AND o_orderdate + INTERVAL {_ASOF_SHIFT_DAYS} DAY < TIMESTAMP '2024-02-01'
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
)
SELECT e.event_id, t.o_orderkey, e.ts, t.o_totalprice
FROM events e JOIN t ON e.ts >= t.d0 AND e.ts < t.d0 + INTERVAL 7 DAY
"""


# ---------------------------------------------------------------------------
# big-big shuffle join + window functions (rank / lag) over bucketed
# ordered scans
# ---------------------------------------------------------------------------


def q_shuffle_join(sf_dir: str):
    """Big-big equi join where NEITHER side is broadcastable: orders X
    lineitem co-partitioned by order key via ``tabular.shuffle_join``
    (each table shuffles exactly once; per-bucket merge is pandas' C
    hash join).  The complement of the J1 broadcast join."""
    from .tabular import shuffle_join

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True
    )
    lineitem = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
        split=True,
    ).rename_columns({"l_orderkey": "o_orderkey"})
    return shuffle_join(orders, lineitem, on="o_orderkey", how="inner")


SQL_SHUFFLE_JOIN = """
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, l.l_linenumber, l.l_extendedprice
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def q_sortmerge_join(sf_dir: str):
    """Range-partitioned sort-merge join (tabular.sortmerge_join): the
    same big-big orders X lineitem exchange as `shuffle_join`, but
    partitioned by sampled key QUANTILES (TeraSort boundaries) instead
    of key hash — robust to key-range skew and emits key-clustered
    output runs.  Identical join semantics, so the same SQL oracle
    shape applies."""
    from .tabular import sortmerge_join

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )
    lineitem = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
        split=True,
    ).rename_columns({"l_orderkey": "o_orderkey"})
    return sortmerge_join(orders, lineitem, on="o_orderkey", how="inner")


SQL_SORTMERGE_JOIN = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, l.l_linenumber, l.l_quantity
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def q_rank_in_group(sf_dir: str):
    """row_number per group (top-3 orders per customer by price): coarse
    key buckets, then ONE vectorized sort + cumcount per bucket — no
    per-group Python, no global sort."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="stable",
        )
        df["rn"] = df.groupby("o_custkey", sort=False).cumcount() + 1
        return df[df["rn"] <= 3]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: rank(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_RANK = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_window_lag(sf_dir: str):
    """lag() over a per-key ordered scan: each order's price delta vs
    the customer's previous order.  Same bucketed shape as sessionize —
    the scan shuffles once on the key, diffs are one vectorized groupby
    .diff per bucket."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def lag_delta(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        df["price_delta"] = df.groupby("o_custkey", sort=False)["o_totalprice"].diff()
        return df[["o_orderkey", "o_custkey", "o_orderdate", "price_delta"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: lag_delta(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_WINDOW_LAG = """
SELECT o_orderkey, o_custkey, o_orderdate,
       o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey) AS price_delta
FROM orders
"""


def q_sliding_window(sf_dir: str):
    """Sliding time-window aggregate: for each event, the count and
    value sum of the same user's events in the preceding hour
    (inclusive) — SQL's RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW.

    Shape: one shuffle on the user key into coarse buckets, then per
    bucket a single vectorized pass — sort once, one ``searchsorted``
    per user segment gives the window start indices, and prefix sums
    turn [start, i] ranges into O(1) window aggregates.  No per-row
    Python, no second shuffle.  The sum runs over integer cents so the
    result is independent of accumulation order (prefix-sum here,
    rolling sum in the oracle — float would differ in ulps).
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], split=True)
    hour = np.timedelta64(3600, "s").astype("timedelta64[us]")

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        ts = df["ts"].to_numpy(dtype="datetime64[us]")
        cents = np.round(df["value"].to_numpy() * 100.0).astype(np.int64)
        uid = df["user_id"].to_numpy()
        # per-user segment boundaries in the sorted frame
        seg = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        seg_end = np.r_[seg[1:], len(uid)]
        csum = np.r_[np.int64(0), np.cumsum(cents)]
        n_1h = np.empty(len(uid), dtype=np.int64)
        sum_cents = np.empty(len(uid), dtype=np.int64)
        for s, e in zip(seg, seg_end):  # per-USER segment, not per-row
            # RANGE window: [ts - 1h, ts] inclusive, and peers with the
            # SAME ts all belong to every peer's window ('right' end)
            starts = np.searchsorted(ts[s:e], ts[s:e] - hour, side="left") + s
            ends = np.searchsorted(ts[s:e], ts[s:e], side="right") + s
            n_1h[s:e] = ends - starts
            sum_cents[s:e] = csum[ends] - csum[starts]
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": uid,
                "ts": ts,
                "n_1h": n_1h,
                "sum_1h": sum_cents.astype(np.float64) / 100.0,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: window(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_SLIDING_WINDOW = """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100 AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# distinct counting: exact grouped nunique (partial-dedupe shuffle) and
# a HyperLogLog sketch (kilobyte-sized merge, corpus never shuffles)
# ---------------------------------------------------------------------------


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type.  Per-batch partial
    dedupe shrinks the shuffle to unique (type, user) pairs per batch;
    the per-type finalize is one vectorized nunique."""
    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"], split=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_users": np.array([df["user_id"].nunique()], dtype=np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DISTINCT_USERS = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def q_weighted_sample(sf_dir: str):
    """Distributed weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): each row draws a deterministic uniform u from its
    key's md5 (top 52 digest bits → exactly representable float) and a
    priority u^(1/w); the global top-k by priority IS a weighted sample.
    Mergeable by construction — per-batch top-k partials, one tiny
    final reduce; no RNG state, so any worker/batch layout yields the
    same sample.  Price-weighted 100-order sample, SQL-oracled (DuckDB
    computes the identical md5-derived u)."""
    from .tabular import md5_digest_words, topk

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True)

    def priority(batch: pa.Table) -> pa.Table:
        hi, _ = md5_digest_words(batch["o_orderkey"])
        u = (hi >> np.uint64(12)).astype(np.float64) / np.float64(2**52)
        w = batch["o_totalprice"].to_numpy()
        return batch.append_column("pri", pa.array(np.power(u, 1.0 / w)))

    top = (
        topk(ds.map_batches(priority, batch_format="pyarrow"),
             ["pri", "o_orderkey"], k=100, descending=[True, False])
        .to_pandas()
        .reset_index(drop=True)
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "o_orderkey", "o_totalprice"]]


SQL_WEIGHTED_SAMPLE = """
WITH u AS (
  SELECT o_orderkey, o_totalprice,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 13))::BIGINT
           / 4503599627370496.0 AS uu
  FROM orders
)
SELECT CAST(row_number() OVER (ORDER BY pow(uu, 1.0 / o_totalprice) DESC,
                               o_orderkey) AS BIGINT) AS rank,
       o_orderkey, o_totalprice
FROM u
ORDER BY rank LIMIT 100
"""


def q_stratified_sample(sf_dir: str):
    """Stratified sampling: a deterministic 5-order sample per
    o_orderpriority stratum, ranked by the rows' md5 priorities — no
    RNG state, so the sample is stable under any partitioning.  Same
    bucketed shape as rank_in_group: one shuffle on the stratum key,
    vectorized sort + cumcount per coarse bucket."""
    from .tabular import md5_digest_words

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"], split=True
    )

    def add_keys(batch: pa.Table) -> pa.Table:
        hi, _ = md5_digest_words(batch["o_orderkey"])
        b = pd.util.hash_array(
            np.asarray(batch["o_orderpriority"].to_pylist(), dtype=object)
        ) % 16
        # top 15 hex chars (60 bits) of the digest: fits DuckDB's BIGINT
        # '0x…' cast — 16 chars would overflow it (no hex→HUGEINT path)
        pri = (hi.astype(np.uint64) >> np.uint64(4)).astype(np.int64)
        return batch.append_column("pri", pa.array(pri)).append_column(
            "bucket", pa.array(b.astype(np.int32))
        )

    def take5(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderpriority", "pri", "o_orderkey"], kind="stable")
        df["rn"] = df.groupby("o_orderpriority", sort=False).cumcount() + 1
        out = df[df["rn"] <= 5]
        return out[["o_orderpriority", "rn", "o_orderkey", "o_totalprice"]]

    return (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: take5(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_STRATIFIED = """
SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT,
                    o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 5
"""


def q_training_order(sf_dir: str):
    """Training consumption surface: first rows of two deterministic
    shuffled epochs over documents (pipelines/training.py) — same seed
    → same order, property-tested; rows-only here (iteration order is
    not SQL-expressible)."""
    from .training import iter_training_batches

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    rows = []
    for epoch_rows_wanted, epoch in ((100, 0), (100, 1)):
        got = 0
        for batch in iter_training_batches(
            ds, batch_size=50, seed=42 + epoch, epochs=1, shuffle_buffer=500
        ):
            ids = batch["doc_id"].to_pylist()
            for d in ids:
                if got >= epoch_rows_wanted:
                    break
                rows.append((epoch, got, d))
                got += 1
            if got >= epoch_rows_wanted:
                break
    return pd.DataFrame(rows, columns=["epoch", "position", "doc_id"])


#: registers for the SQL-oracled grouped/global HLL queries (p=12 → 4096)
_HLL_Q_P = 12


def _hll_estimate_from_registers(rho_by_reg: np.ndarray, p: int) -> float:
    """Standard HLL estimate from a dense register vector (integer
    registers in, float out — the float only ever feeds a tolerance
    boolean, never a cross-engine hash)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho_by_reg.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((rho_by_reg == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def q_hll_grouped(sf_dir: str):
    """Grouped HLL distinct-user estimate per event_type, DIRECTLY
    SQL-oracled (round-4 verdict item 5): the md5-keyed p=12 registers
    (stages/sketch_parity — the hash both engines share) aggregate to
    two integers DuckDB replays bit-exactly per group — ``m_sum``
    (Σ max-rho over present registers) and ``n_zero`` (registers never
    hit) — plus ``within_ok``, the harmonic-mean estimate landing
    within ±5% (≈3σ at p=12) of the EXACT distinct count, which the
    engine recomputes distributedly (two-level distinct, never a
    driver drain).  Scale shape: per-batch distinct pairs → bounded
    (groups × 4096)-row max-partials; values never shuffle.  The
    production SipHash sketch (stages/sketch.hll_distinct_grouped)
    stays accuracy-gated by `hll_rank_check`."""
    from ..stages.sketch_parity import hll_md5_partial

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pylist(),
             "user_id": batch["user_id"].to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        frames = []
        for et, grp in df.groupby("event_type", sort=False):
            part = hll_md5_partial([str(int(u)) for u in grp["user_id"]], _HLL_Q_P)
            part.insert(0, "event_type", et)
            frames.append(part)
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"event_type": pd.Series(dtype=str),
             "register": pd.Series(dtype=np.int64),
             "rho": pd.Series(dtype=np.int64)}
        )

    regs = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "register"],
        {"rho": ("max", "rho")},
        small_keys=True,
    ).to_pandas()

    # exact per-group distinct, distributed (same shape as hll_rank_check)
    def pair_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        return pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([])

    exact = grouped_aggregate(
        grouped_aggregate(
            ds.map_batches(pair_distinct, batch_format="pyarrow"),
            ["event_type", "user_id"], {"one": ("count", None)},
        ),
        ["event_type"], {"n_exact": ("count", None)}, small_keys=True,
    ).to_pandas().set_index("event_type")["n_exact"]

    m = 1 << _HLL_Q_P
    rows = []
    for et, grp in regs.groupby("event_type", sort=True):
        dense = np.zeros(m, dtype=np.int64)
        dense[grp["register"].to_numpy(np.int64)] = grp["rho"].to_numpy(np.int64)
        est = _hll_estimate_from_registers(dense, _HLL_Q_P)
        n_exact = int(exact[et])
        rows.append(
            {"event_type": et,
             "m_sum": np.int64(grp["rho"].sum()),
             "n_zero": np.int64(m - len(grp)),
             "within_ok": bool(abs(est - n_exact) <= 0.05 * n_exact)}
        )
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


SQL_HLL_GROUPED = f"""
WITH h AS (
  SELECT event_type, md5_number_upper(CAST(user_id AS VARCHAR)) AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
r AS (
  SELECT event_type, CAST(h >> 52 AS BIGINT) AS register,
         65 - length(bin(((h % 4503599627370496::UBIGINT) * 4096::UBIGINT)
                         | 2048::UBIGINT)) AS rho
  FROM h
),
mx AS (
  SELECT event_type, register, max(rho) AS rho
  FROM r GROUP BY event_type, register
)
SELECT event_type, CAST(sum(rho) AS BIGINT) AS m_sum,
       CAST(4096 - count(*) AS BIGINT) AS n_zero, TRUE AS within_ok
FROM mx GROUP BY event_type ORDER BY event_type
"""


def q_hll_rank_check(sf_dir: str):
    """The HyperLogLog accuracy contract at the driver gate (same
    pattern as `tdigest_rank_check`): per event_type, the p=12 sketch's
    distinct-user estimate must sit within ±5% (≈3σ at 1.04/√2¹²) of
    the exact distinct count.  The exact count comes from a
    two-level distributed distinct (per-batch distinct pairs → global
    pair dedupe → per-group count) — never a driver drain; the oracle
    enumerates the event_type grid with ``within = TRUE`` so any
    out-of-tolerance estimate reds the value hash."""
    from ..stages.sketch import hll_distinct_grouped

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"], split=True)
    est = hll_distinct_grouped(ds, "event_type", "user_id", p=12).to_pandas()

    def pair_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        g = pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([])
        return g

    pairs = ds.map_batches(pair_distinct, batch_format="pyarrow")
    distinct_pairs = grouped_aggregate(
        pairs, ["event_type", "user_id"], {"one": ("count", None)}
    )
    exact = grouped_aggregate(
        distinct_pairs, ["event_type"], {"n_exact": ("count", None)}, small_keys=True
    ).to_pandas()

    out = est.merge(exact, on="event_type")
    out["within"] = (
        (out["n_distinct_est"] - out["n_exact"]).abs() <= 0.05 * out["n_exact"]
    )
    return out[["event_type", "within"]].sort_values("event_type").reset_index(drop=True)


SQL_HLL_RANK_CHECK = """
SELECT event_type, TRUE AS within
FROM (SELECT DISTINCT event_type FROM events)
ORDER BY event_type
"""


def q_hll_distinct(sf_dir: str):
    """Global HLL distinct-user estimate, DIRECTLY SQL-oracled (round-4
    verdict item 5): md5-keyed p=12 registers reduce to the two
    integers DuckDB replays bit-exactly (``m_sum``, ``n_zero``) plus a
    ±5% tolerance boolean against the exact distinct count — the same
    register algebra `hll_registers` pins cell-by-cell, here folded to
    the estimate contract.  The production SipHash p=14 kernel
    (stages/sketch.hll_distinct) stays pytest-verified."""
    from ..stages.sketch_parity import hll_md5_partial

    ds = read_table(sf_dir, "events", columns=["user_id"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        uid = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return hll_md5_partial([str(int(u)) for u in uid], _HLL_Q_P)

    regs = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["register"], {"rho": ("max", "rho")}, small_keys=True,
    ).to_pandas()

    n_exact = int(
        grouped_aggregate(
            ds.map_batches(
                lambda t: pa.table(
                    {"user_id": pa.array(np.unique(t["user_id"].to_numpy(zero_copy_only=False)))}
                ),
                batch_format="pyarrow",
            ),
            ["user_id"], {"one": ("count", None)},
        ).count()
    )

    m = 1 << _HLL_Q_P
    dense = np.zeros(m, dtype=np.int64)
    dense[regs["register"].to_numpy(np.int64)] = regs["rho"].to_numpy(np.int64)
    est = _hll_estimate_from_registers(dense, _HLL_Q_P)
    return pd.DataFrame(
        [
            {"m_sum": np.int64(regs["rho"].sum()),
             "n_zero": np.int64(m - len(regs)),
             "within_ok": bool(abs(est - n_exact) <= 0.05 * n_exact)}
        ]
    )


SQL_HLL_DISTINCT = """
WITH h AS (
  SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS h
  FROM (SELECT DISTINCT user_id FROM events)
),
r AS (
  SELECT CAST(h >> 52 AS BIGINT) AS register,
         65 - length(bin(((h % 4503599627370496::UBIGINT) * 4096::UBIGINT)
                         | 2048::UBIGINT)) AS rho
  FROM h
),
mx AS (SELECT register, max(rho) AS rho FROM r GROUP BY register)
SELECT CAST(sum(rho) AS BIGINT) AS m_sum,
       CAST(4096 - count(*) AS BIGINT) AS n_zero, TRUE AS within_ok
FROM mx
"""


def q_grouped_quantiles(sf_dir: str):
    """EXACT per-group continuous quantiles (quantile_cont semantics:
    linear interpolation at rank h=(n-1)q).  Exactness requires each
    group's values to co-locate once — a single shuffle on the group
    key; group count is small (event types), value volume per group is
    the per-worker bound.  For quantiles over unbounded-cardinality
    groups or where one group exceeds a worker, use the mergeable
    t-digest (stages/tdigest.py, q_price_quantiles_tdigest) — centroids
    shuffle instead of values."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64)
        p25, p50, p90 = np.quantile(v, [0.25, 0.5, 0.9], method="linear")
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n": np.array([len(v)], dtype=np.int64),
                "p25": [round(float(p25), 6)],
                "p50": [round(float(p50), 6)],
                "p90": [round(float(p90), 6)],
            }
        )

    return ds.groupby("event_type").map_groups(quantiles, batch_format="pandas")


SQL_GROUPED_QUANTILES = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 6) AS p25,
       round(CAST(quantile_cont(value, 0.50) AS DOUBLE), 6) AS p50,
       round(CAST(quantile_cont(value, 0.90) AS DOUBLE), 6) AS p90
FROM events GROUP BY event_type
"""


def q_price_quantiles_tdigest(sf_dir: str):
    """Approximate per-group price quantiles via the mergeable t-digest
    (stages/tdigest.py): each batch ships ≤ δ+1 centroids per present
    group, one groupby merges digests — order totals never shuffle.

    DIRECTLY SQL-oracled (round-4 verdict item 5) via quantile_cont
    BOUNDS: each estimate must land inside
    [quantile_cont(q−tol), quantile_cont(q+tol)] with tol = 1.1% + 1/n
    (the pytest-proved rank-error bound plus one discrete rank step),
    the bounds recomputed independently on the driver with DuckDB —
    a float estimate never enters the cross-engine hash, booleans do."""
    import os

    import duckdb

    from ..stages.tdigest import tdigest_grouped

    qs = [0.5, 0.9, 0.99]
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"], split=True)
    est = tdigest_grouped(ds, "o_orderpriority", "o_totalprice", qs).to_pandas()

    pq_path = os.path.join(sf_dir, "orders.parquet")
    rows = []
    for _, r in est.sort_values("o_orderpriority").iterrows():
        grp = r["o_orderpriority"]
        n, = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{pq_path}') "
            f"WHERE o_orderpriority = '{grp}'"
        ).fetchone()
        tol = 0.011 + 1.0 / n
        row = {"o_orderpriority": grp, "n": np.int64(n)}
        for q in qs:
            lo_q, hi_q = max(0.0, q - tol), min(1.0, q + tol)
            lo, hi = duckdb.sql(
                f"SELECT quantile_cont(o_totalprice, {lo_q}), "
                f"quantile_cont(o_totalprice, {hi_q}) "
                f"FROM read_parquet('{pq_path}') WHERE o_orderpriority = '{grp}'"
            ).fetchone()
            e = float(r[f"q_{int(round(q * 100)):02d}"])
            row[f"q{int(round(q * 100)):02d}_in_bounds"] = bool(lo <= e <= hi)
        rows.append(row)
    return pd.DataFrame(rows).sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRICE_QUANTILES_TDIGEST = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       TRUE AS q50_in_bounds, TRUE AS q90_in_bounds, TRUE AS q99_in_bounds
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_tdigest_rank_check(sf_dir: str):
    """The t-digest's accuracy contract, value-oracled: for every
    (order priority, q ∈ {0.5, 0.9, 0.99}) the sketch's estimate must
    sit within rank tolerance of the true quantile.  The oracle SQL
    enumerates the same (group, q) grid with ``within = TRUE`` — any
    estimate outside tolerance flips a row to FALSE and reds the
    driver's value hash, so the ≤1%-rank-error property (pytest-proved
    on the kernel) is ALSO asserted at the driver gate.

    Shape: estimates come from the mergeable-digest pipeline
    (fixed-width partials, values never shuffle), then ONE counting
    pass ranks each estimate distributedly — the broadcast is the
    (groups × 3) estimate map, never data.  Rank is bracketed
    [count(<est), count(≤est)]/n so interpolation between samples can't
    fail the check spuriously; tolerance is 1.1% + 1/n (the discrete
    rank step)."""
    from ..stages.tdigest import tdigest_grouped

    qs = [0.5, 0.9, 0.99]
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"], split=True)
    est = tdigest_grouped(ds, "o_orderpriority", "o_totalprice", qs).to_pandas()
    est_map = {
        (row["o_orderpriority"], q): float(row[f"q_{int(round(q * 100)):02d}"])
        for _, row in est.iterrows()
        for q in qs
    }
    handle = Broadcast(est_map)

    def counts(batch: pa.Table) -> pd.DataFrame:
        em = handle.get()
        g = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        rows = []
        for (grp, q), e in em.items():
            m = g == grp
            rows.append((grp, q, int((v[m] < e).sum()), int((v[m] <= e).sum()), int(m.sum())))
        return pd.DataFrame(rows, columns=["o_orderpriority", "q", "n_lt", "n_le", "n"])

    agg = grouped_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["o_orderpriority", "q"],
        {"n_lt": ("sum", "n_lt"), "n_le": ("sum", "n_le"), "n": ("sum", "n")},
        small_keys=True,
    ).to_pandas()
    tol = 0.011 + 1.0 / agg["n"]
    lo = agg["n_lt"] / agg["n"] - tol
    hi = agg["n_le"] / agg["n"] + tol
    agg["within"] = (lo <= agg["q"]) & (agg["q"] <= hi)
    return (
        agg[["o_orderpriority", "q", "within"]]
        .sort_values(["o_orderpriority", "q"])
        .reset_index(drop=True)
    )


SQL_TDIGEST_RANK_CHECK = """
SELECT o_orderpriority, q, TRUE AS within
FROM (SELECT DISTINCT o_orderpriority FROM orders)
CROSS JOIN (SELECT UNNEST([0.5, 0.9, 0.99]) AS q)
ORDER BY o_orderpriority, q
"""


def q_dedup_clusters(sf_dir: str):
    """Connected components over a doc-pair graph (stages/graph.py) —
    the cluster step that turns near-dup PAIRS into dedupe GROUPS.

    The edge list here is SQL-derivable so the whole transitive closure
    is value-oracled: edge (i, i+1) iff md5(i) < '8' in its first hex
    digit — a deterministic ~50% coin per consecutive pair, standing in
    for a near-dup pair list (real LSH pair lists aren't
    SQL-expressible).  Chain lengths are geometric, so components need
    true multi-hop propagation (unlike exact-dup cliques, which
    converge in one round).  Edge generation is embarrassingly parallel
    (the coin depends only on the left endpoint); the last doc_id is
    excluded so no edge dangles.  Output: (doc_id, component = min
    reachable doc_id).
    """
    from ..stages.graph import connected_components
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows

    def coin_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = md5_lt_mask(batch["doc_id"], "8" + "0" * 31) & (ids + 1 < n_docs)
        return pa.table({"src": pa.array(ids[keep]), "dst": pa.array(ids[keep] + 1)})

    edges = ds.map_batches(coin_edges, batch_format="pyarrow")
    nodes = ds.map_batches(
        lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow"
    )
    comp = connected_components(edges, nodes=nodes)
    return comp.map_batches(
        lambda t: t.rename_columns(["doc_id", "component"]), batch_format="pyarrow"
    )


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE
e0 AS (
  SELECT a.doc_id AS src, a.doc_id + 1 AS dst
  FROM documents a
  WHERE md5(CAST(a.doc_id AS VARCHAR)) < '8'
    AND a.doc_id + 1 < (SELECT count(*) FROM documents)
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS component
FROM cc GROUP BY node
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table
    (stages/clustering.py): centroids broadcast per sweep, each batch
    emits one (k×d sums, counts) partial, nothing shuffles.  Output is
    the deterministic per-cluster summary (size + round(inertia)) —
    rows-only driver check (an iterative algorithm has no SQL oracle);
    convergence/determinism are pytest-verified."""
    from ..stages.clustering import kmeans_assign, kmeans_fit

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    ds = ds.materialize()  # 8 sweeps + assign + summary share blocks
    cents = kmeans_fit(ds, 8, iters=8, seed=17, cache=False)
    assigned = kmeans_assign(ds, cents)
    handle = Broadcast(cents)

    def partial(batch: pa.Table) -> pd.DataFrame:
        from ..stages.similarity import _as_matrix

        c = handle.get()
        mat = _as_matrix(batch["embedding"])
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        n = np.bincount(cl, minlength=len(c)).astype(np.int64)
        sq = ((mat - c[cl]) ** 2).sum(axis=1)
        inertia = np.bincount(cl, weights=sq, minlength=len(c))
        return pd.DataFrame({"cluster": np.arange(len(c), dtype=np.int64),
                             "n": n, "inertia": inertia})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("cluster", as_index=False).agg(n=("n", "sum"), inertia=("inertia", "sum"))
        out["inertia"] = out["inertia"].round(4)
        return out.sort_values("cluster").reset_index(drop=True)

    parts = assigned.map_batches(partial, batch_format="pyarrow").to_pandas()
    return finalize(parts)


def q_knn_ivf(sf_dir: str):
    """IVF ANN: k-means coarse quantizer + nprobe inverted-list probe
    (stages/clustering.knn_ivf).  Approximate by construction — recall
    vs brute force is property-tested; rows-only driver check."""
    import os

    import pyarrow.parquet as pq

    from ..stages.clustering import knn_ivf

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qt = emb.filter(pa.compute.less(emb["vec_id"], 5))
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = np.asarray(qt["vec_id"].to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    out = knn_ivf(ds, queries, qids, k=10, nlist=16, nprobe=6, kmeans_iters=4, seed=17)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


def q_knn_pq(sf_dir: str):
    """Product-quantization ANN (stages/pq.knn_pq): joint distributed
    Lloyd's codebook fit, uint8 code encode (4·d/m-fold compression —
    the memory scale path), compressed-domain ADC scan, exact re-rank
    of the bounded shortlist.  Approximate — recall vs brute force is
    property-tested; rows-only driver check."""
    import os

    import pyarrow.parquet as pq

    from ..stages.pq import knn_pq

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qt = emb.filter(pa.compute.less(emb["vec_id"], 5))
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = np.asarray(qt["vec_id"].to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    out = knn_pq(ds, queries, qids, k=10, m=8, ksub=32, iters=5, refine=4)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


def q_knn_ivfpq(sf_dir: str):
    """IVF-PQ ANN (stages/pq.knn_ivfpq): coarse quantizer prunes
    candidates (nprobe/nlist of the corpus scanned), residual PQ codes
    prune memory (m bytes per scanned vector), bounded exact refine.
    Approximate — recall property-tested; rows-only driver check."""
    import os

    import pyarrow.parquet as pq

    from ..stages.pq import knn_ivfpq

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qt = emb.filter(pa.compute.less(emb["vec_id"], 5))
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = np.asarray(qt["vec_id"].to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    out = knn_ivfpq(ds, queries, qids, k=10, nlist=16, nprobe=6, m=8, ksub=32, refine=4)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus curation: redaction / decontamination / repetition / caps / packing
# ---------------------------------------------------------------------------

# Demo entity patterns so the redaction path rewrites real testdata text
# (the PII patterns themselves can't match the synthetic corpus); the
# operator under test is the same chained-RE2 rewrite either way.
_REDACT_DEMO: list[tuple[str, str]] = [
    (r"\bcustomer\b", "<ENT>"),
    (r"\b(spark|vector)\b", "<TOOL>"),
]


def q_pii_redact(sf_dir: str):
    """PII-shaped pattern redaction (stages/curation.redact_patterns):
    chained RE2 rewrites over the contiguous Arrow string buffer, no
    per-row Python.  DuckDB compiles the same RE2 patterns, so the
    oracle is chained regexp_replace(..., 'g')."""
    from ..stages.curation import PII_PATTERNS, redact_patterns

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    return redact_patterns(ds, PII_PATTERNS + _REDACT_DEMO)


def _sql_redact_expr() -> str:
    from ..stages.curation import PII_PATTERNS

    expr = "text"
    for pat, repl in PII_PATTERNS + _REDACT_DEMO:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    return expr


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any 8-gram
    with the benchmark subset (doc_id % 97 == 0 stands in for the eval
    suite).  Benchmark gram hashes broadcast once; the corpus streams
    through one searchsorted probe per batch — no shuffle
    (stages/curation.mark_contaminated)."""
    from ..stages.curation import benchmark_gram_set, mark_contaminated

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def bench_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0))

    def corpus_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0))

    grams = benchmark_gram_set(ds.map_batches(bench_only, batch_format="pyarrow"), n=8)
    corpus = ds.map_batches(corpus_only, batch_format="pyarrow")
    return mark_contaminated(corpus, grams, n=8)


SQL_DECONTAM = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
ng AS (
  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
  FROM toks CROSS JOIN UNNEST(range(1, len(ts) - 6)) AS t(i)
),
bench AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 97 = 0),
hits AS (
  SELECT DISTINCT n.doc_id FROM ng n JOIN bench b USING (gram)
  WHERE n.doc_id % 97 <> 0
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition metrics (stages/curation.repetition_stats):
    distinct-token ratio + top-bigram token fraction, batch-vectorized
    via one lexsort over the flat token-hash buffer.  Ratios are single
    IEEE divisions of exact ints — bit-identical to SQL, no rounding."""
    from ..stages.curation import repetition_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    return repetition_stats(ds)


SQL_REPETITION = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
base AS (
  SELECT doc_id, len(ts) AS n_tok, len(list_distinct(ts)) AS n_distinct FROM toks
),
bg AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bigram
  FROM toks CROSS JOIN UNNEST(range(1, len(ts))) AS t(i)
),
topc AS (
  SELECT doc_id, max(c) AS top
  FROM (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
)
SELECT b.doc_id, b.n_tok, b.n_distinct,
       CAST(b.n_distinct AS DOUBLE) / greatest(b.n_tok, 1) AS distinct_ratio,
       CAST(coalesce(t.top, 0) * 2 AS DOUBLE) / greatest(b.n_tok, 1) AS top_bigram_frac
FROM base b LEFT JOIN topc t USING (doc_id)
"""


def q_domain_cap(sf_dir: str):
    """Per-domain document cap (pipelines/tabular.top_k_per_group):
    keep the 20 lowest doc_ids per source — the per-host cap of crawl
    curation.  Two-level reduce: ≤k rows per group per batch shuffle."""
    from .tabular import top_k_per_group

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"], split=True)
    capped = top_k_per_group(ds, "source", "doc_id", 20)
    return capped.map_batches(lambda df: df[["doc_id", "source"]], batch_format="pandas")


SQL_DOMAIN_CAP = """
SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 20
"""


_CURATE_MIN_DR = 0.35
_CURATE_MAX_TBF = 0.2
_CURATE_CAP = 50


def q_curate_corpus(sf_dir: str):
    """End-to-end curation pipeline — the composition a training-data
    run actually executes, every stage oracled as ONE SQL statement:

      1. drop benchmark docs + repetition-rule failures (streaming
         map_batches, no shuffle),
      2. drop docs sharing an 8-gram with the benchmark (broadcast
         probe, no shuffle),
      3. exact-dedup on text keeping min doc_id (two-level reduce),
      4. cap 50 docs per source (two-level reduce),
      5. concat-pack survivors into 512-token sequences per source
         (distributed prefix scan).

    Stages 1-2 stream; 3-4 shuffle ≤k candidate rows per group per
    batch; 5 shuffles only the coarse range buckets.
    """
    from ..stages.curation import (
        benchmark_gram_set,
        filter_by_repetition,
        mark_contaminated,
    )
    from ..stages.scan import pack_sequences
    from .tabular import top_k_per_group

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def bench_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0))

    def corpus_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0))

    grams = benchmark_gram_set(ds.map_batches(bench_only, batch_format="pyarrow"), n=8)
    corpus = ds.map_batches(corpus_only, batch_format="pyarrow")
    quality = filter_by_repetition(
        corpus, min_distinct_ratio=_CURATE_MIN_DR, max_top_bigram_frac=_CURATE_MAX_TBF
    )
    clean = mark_contaminated(quality, grams, n=8, keep_clean=True)
    deduped = top_k_per_group(clean, "text", "doc_id", 1)
    capped = top_k_per_group(deduped, "source", "doc_id", _CURATE_CAP)

    def tokcount(batch: pa.Table) -> pa.Table:
        n = pa.compute.cast(
            pa.compute.list_value_length(pa.compute.split_pattern(batch["text"], " ")),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], n], names=["doc_id", "source", "n_tok"]
        )

    counted = capped.map_batches(tokcount, batch_format="pyarrow")
    import os as _os

    import pyarrow.parquet as pq

    meta = pq.ParquetFile(_os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    return pack_sequences(counted, _PACK_BUDGET, max_order=int(max_id))


SQL_CURATE = """
WITH t AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS ts
  FROM documents WHERE doc_id % 97 <> 0
),
m AS (
  SELECT doc_id, source, text, len(ts) AS n_tok,
         CAST(len(list_distinct(ts)) AS DOUBLE) / greatest(len(ts), 1) AS dr
  FROM t
),
bgt AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS b
  FROM t CROSS JOIN UNNEST(range(1, len(ts))) x(i)
),
topb AS (
  SELECT doc_id, max(c) AS top
  FROM (SELECT doc_id, b, count(*) AS c FROM bgt GROUP BY 1, 2) GROUP BY 1
),
q AS (
  SELECT m.*, CAST(coalesce(tb.top, 0) * 2 AS DOUBLE) / greatest(m.n_tok, 1) AS tbf
  FROM m LEFT JOIN topb tb USING (doc_id)
),
filtered AS (SELECT * FROM q WHERE dr >= {MIN_DR} AND tbf <= {MAX_TBF}),
allt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
ng AS (
  SELECT doc_id, array_to_string(ts[i:i+7], ' ') AS gram
  FROM allt CROSS JOIN UNNEST(range(1, len(ts) - 6)) x(i)
),
bench AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT n.doc_id FROM ng n JOIN bench b USING (gram)
  WHERE n.doc_id % 97 <> 0
),
clean AS (
  SELECT * FROM filtered WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
deduped AS (
  SELECT * FROM clean
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
capped AS (
  SELECT * FROM deduped
  QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= {CAP}
),
packed AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM capped
)
SELECT doc_id, source, n_tok, cum_before,
       cum_before // 512 AS seq_id, cum_before % 512 AS seq_offset
FROM packed
""".replace("{MIN_DR}", str(_CURATE_MIN_DR)).replace(
    "{MAX_TBF}", str(_CURATE_MAX_TBF)
).replace("{CAP}", str(_CURATE_CAP))


def _flat_token_array(batch: pa.Table, column: str = "text") -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(pa.compute.split_pattern(col, " ").values)


def q_heavy_tokens(sf_dir: str):
    """Exact global token frequencies, top 20: per-batch value_counts is
    the combiner (shuffle moves ≤ vocab rows per batch, never tokens),
    then one small groupby-sum and a deterministic (cnt desc, token)
    top-k."""
    from .tabular import topk

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(_flat_token_array(batch)).value_counts()
        return pd.DataFrame({"token": vc.index, "cnt": vc.to_numpy()})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    summed = grouped_aggregate(partials, ["token"], {"cnt": ("sum", "cnt")})
    return topk(summed, ["cnt", "token"], 20, descending=[True, False])


def q_heavy_tokens_sketch(sf_dir: str):
    """Same top-20, via sketch-propose / exact-confirm: a Misra-Gries
    summary (stages/sketch.heavy_hitters_mg, m=4096) proposes every key
    that COULD be frequent (no false negatives above total/(m+1)), then
    one counting pass restricted to the ≤m broadcast candidates makes
    the counts exact — so the result is bit-identical to the exact
    oracle while per-batch state stays bounded at any corpus size."""
    from ..stages.sketch import heavy_hitters_mg

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)
    summ, _total = heavy_hitters_mg(ds, 4096, _flat_token_array)
    cand = Broadcast(np.sort(summ.index.to_numpy().astype(str)))

    def exact_count(batch: pa.Table) -> pd.DataFrame:
        keys = cand.get()
        flat = _flat_token_array(batch)
        hit = flat[np.isin(flat, keys)]
        vc = pd.Series(hit).value_counts()
        return pd.DataFrame({"token": vc.index, "cnt": vc.to_numpy()})

    parts = ds.map_batches(exact_count, batch_format="pyarrow").to_pandas()
    out = parts.groupby("token", as_index=False)["cnt"].sum()
    out = out.sort_values(["cnt", "token"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


SQL_HEAVY_TOKENS = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, count(*) AS cnt FROM toks GROUP BY token
ORDER BY cnt DESC, token LIMIT 20
"""


def q_anti_join_bloom(sf_dir: str):
    """Anti-join resume with a bloom prefilter (stages/sketch.BloomFilter):
    "definitely not done" rows pass with one bitmap probe; only bloom
    positives (~1% FP + true members) hit the exact confirm, so the
    done-set never broadcasts raw at scale — result is EXACT (no false
    negatives), same oracle as anti_join_resume."""
    import os as _os

    import pyarrow.parquet as pq

    from ..stages.sketch import BloomFilter

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    meta = pq.ParquetFile(_os.path.join(sf_dir, "documents.parquet")).metadata
    col_idx = next(
        i for i in range(meta.num_columns)
        if meta.row_group(0).column(i).path_in_schema == "doc_id"
    )
    max_id = max(
        meta.row_group(rg).column(col_idx).statistics.max
        for rg in range(meta.num_row_groups)
    )
    done = np.arange(0, max_id + 1, 7, dtype=np.int64)
    handle = Broadcast((BloomFilter.from_keys(done, fpp=0.01), done))

    def flt(batch: pa.Table) -> pa.Table:
        bf, done_sorted = handle.get()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        maybe = bf.might_contain(ids)
        keep = ~maybe
        if maybe.any():  # exact confirm on the small positive stream
            cand = ids[maybe]
            pos = np.searchsorted(done_sorted, cand)
            in_range = pos < len(done_sorted)
            is_done = np.zeros(len(cand), dtype=bool)
            is_done[in_range] = done_sorted[pos[in_range]] == cand[in_range]
            keep[np.flatnonzero(maybe)[~is_done]] = True
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


_PMI_MIN_PAIR = 20


#: distinct unigrams above which the PMI unigram table stops
#: broadcasting and pair→unigram resolution routes through two
#: bucketed hash joins (on w1, then w2)
PMI_VOCAB_BUDGET = 20_000_000


def q_bigram_pmi(sf_dir: str):
    return _bigram_pmi(sf_dir)


def _bigram_pmi(sf_dir: str, *, vocab_budget: int = PMI_VOCAB_BUDGET):
    """Bigram PMI (collocation mining): pointwise mutual information of
    adjacent token pairs, ln((c_xy/B) / ((c_x/T)(c_y/T))), pairs with
    ≥ _PMI_MIN_PAIR occurrences.

    Shape: adjacency comes from ListArray offset arithmetic (one
    boundary mask over the flattened token values — no per-doc Python);
    per-batch value_counts partials shrink each stream to its distinct
    keys before the only shuffles, two ``grouped_aggregate`` sums (pair
    and unigram counts).

    Unigram routing: at or under ``vocab_budget`` distinct tokens the
    unigram table collects once and broadcasts back as the PMI map.
    Above it — a vocab that outgrows the object store — the thresholded
    pair counts resolve c_x/c_y through two bucketed
    ``tabular.shuffle_join``s on w1 then w2; only the two scalars T and
    B (fixed-width aggregates) touch the driver.  Both routes are
    proven identical by pytest (``vocab_budget=0`` forces the join
    route on the same corpus); the arithmetic is unchanged."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        vals = toks.values.to_pandas()
        off = toks.offsets.to_numpy()
        n = len(vals)
        if n < 2:
            return pd.DataFrame({"w1": [], "w2": [], "cnt": []})
        valid = np.ones(n - 1, dtype=bool)
        ends = off[1:] - 1  # last token index of each doc: no pair across docs
        valid[ends[(ends >= 0) & (ends < n - 1)]] = False
        i = np.flatnonzero(valid)
        pairs = pd.DataFrame({"w1": vals.iloc[i].to_numpy(), "w2": vals.iloc[i + 1].to_numpy()})
        out = pairs.groupby(["w1", "w2"], as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    def uni_partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch["text"], " ").combine_chunks()
        vc = toks.values.to_pandas().value_counts()
        return pd.DataFrame({"w": vc.index, "cnt": vc.to_numpy()})

    # materialize: the B total (an action) and the PMI map both consume
    # this shuffle's output — without pinning the blocks the exchange
    # would execute twice
    pair_counts = grouped_aggregate(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n_pair": ("sum", "cnt")},
    ).materialize()
    uni_ds = grouped_aggregate(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        ["w"],
        {"n": ("sum", "cnt")},
    ).materialize()
    T = float(uni_ds.sum("n"))
    B = float(pair_counts.sum("n_pair"))

    if uni_ds.count() <= vocab_budget:
        uni = uni_ds.to_pandas()  # vocab-bounded on this route
        uni_map = dict(zip(uni["w"], uni["n"].astype(np.float64)))
        handle = Broadcast((uni_map, T, B))

        def pmi(batch: pd.DataFrame) -> pd.DataFrame:
            umap, t, b = handle.get()
            batch = batch[batch["n_pair"] >= _PMI_MIN_PAIR].copy()
            if not len(batch):
                return pd.DataFrame({"w1": [], "w2": [], "n_pair": [], "pmi": []})
            cx = batch["w1"].map(umap).to_numpy(dtype=np.float64)
            cy = batch["w2"].map(umap).to_numpy(dtype=np.float64)
            c = batch["n_pair"].to_numpy(dtype=np.float64)
            batch["pmi"] = np.round(np.log((c / b) / ((cx / t) * (cy / t))), 6)
            return batch[["w1", "w2", "n_pair", "pmi"]]

        return pair_counts.map_batches(pmi, batch_format="pandas")

    # bucketed-join route (web scale): two hash joins resolve c_x / c_y
    from .tabular import shuffle_join

    def threshold(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_pair"] >= _PMI_MIN_PAIR]

    kept = pair_counts.map_batches(threshold, batch_format="pandas")
    j1 = shuffle_join(
        kept,
        uni_ds.map_batches(
            lambda t: t.rename_columns(["w1", "__c1"]), batch_format="pyarrow"
        ),
        "w1",
    )
    j2 = shuffle_join(
        j1,
        uni_ds.map_batches(
            lambda t: t.rename_columns(["w2", "__c2"]), batch_format="pyarrow"
        ),
        "w2",
    )

    def pmi_joined(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"w1": [], "w2": [], "n_pair": [], "pmi": []})
        cx = batch["__c1"].to_numpy(dtype=np.float64)
        cy = batch["__c2"].to_numpy(dtype=np.float64)
        c = batch["n_pair"].to_numpy(dtype=np.float64)
        out = batch[["w1", "w2"]].copy()
        out["n_pair"] = batch["n_pair"].astype(np.int64)
        out["pmi"] = np.round(np.log((c / B) / ((cx / T) * (cy / T))), 6)
        return out

    return j2.map_batches(pmi_joined, batch_format="pandas")


SQL_BIGRAM_PMI = f"""
WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
idx AS (SELECT t, unnest(range(1, len(t))) AS i FROM d),
b AS (SELECT t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2 FROM idx),
u AS (SELECT unnest(t) AS w FROM d),
uc AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM u GROUP BY w),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM u),
bc AS (SELECT w1, w2, count(*) AS n_pair FROM b GROUP BY w1, w2),
btot AS (SELECT CAST(count(*) AS DOUBLE) AS B FROM b)
SELECT bc.w1, bc.w2, CAST(bc.n_pair AS BIGINT) AS n_pair,
       round(ln((CAST(bc.n_pair AS DOUBLE) / B) / ((u1.c / T) * (u2.c / T))), 6) AS pmi
FROM bc
JOIN uc u1 ON u1.w = bc.w1
JOIN uc u2 ON u2.w = bc.w2
CROSS JOIN tot CROSS JOIN btot
WHERE bc.n_pair >= {_PMI_MIN_PAIR}
"""


def q_cc_redact(sf_dir: str):
    """Luhn-validated credit-card redaction over the corpus
    (stages/curation.redact_credit_cards): regex candidates vectorized,
    checksum only on hits.

    Value-oracled via PLANTED numbers: the synthetic corpus contains no
    card-shaped runs (pytest-verified no-op), so deterministic cards
    append per ``doc_id % 5`` — a Luhn-VALID bare PAN (redacts), a
    Luhn-INVALID one (must survive: the checksum is what separates card
    numbers from order ids), and a dash-separated valid PAN (separator
    handling).  The engine runs the real regex+checksum; the oracle
    encodes the independently-known truth for those literals — Luhn
    itself needs no SQL form."""
    import pyarrow.compute as pc

    from ..stages.curation import redact_credit_cards

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 5
        suffix = np.full(len(ids), "", dtype=object)
        suffix[m == 0] = " 4111111111111111"       # Luhn-valid → redacts
        suffix[m == 1] = " 4111111111111112"       # Luhn-INVALID → survives
        suffix[m == 2] = " 5500-0000-0000-0004"    # valid, dashed → redacts
        text = pc.binary_join_element_wise(
            batch["text"], pa.array(suffix, type=pa.string()), ""
        )
        return pa.table({"doc_id": batch["doc_id"], "text": text})

    return redact_credit_cards(ds.map_batches(plant, batch_format="pyarrow"))


SQL_CC_REDACT = """
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN text || ' <CC>'
            WHEN doc_id % 5 = 1 THEN text || ' 4111111111111112'
            WHEN doc_id % 5 = 2 THEN text || ' <CC>'
            ELSE text END AS text
FROM documents
"""


def q_text_clean(sf_dir: str):
    """Text normalization pass (curation prep): lowercase, collapse
    whitespace runs, trim.  Pure vectorized Arrow kernels
    (utf8_lower + replace_substring_regex + utf8_trim_whitespace) in a
    single shuffle-free map — the cheapest possible stage shape; kept
    as a named operator so pipelines can fingerprint/dedup AFTER
    normalization (near-dup recall improves when case/spacing noise is
    removed first)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def clean(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(batch["text"]), r"\s+", " ")
        )
        return pa.Table.from_arrays([batch["doc_id"], t], names=["doc_id", "text_clean"])

    return ds.map_batches(clean, batch_format="pyarrow")


SQL_TEXT_CLEAN = r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text_clean
FROM documents
"""


_CHUNK_W, _CHUNK_S = 200, 150  # window / stride (50-char overlap)


def q_chunk_documents(sf_dir: str):
    """Overlapping document chunking (RAG/embedding prep): each doc
    splits into ``_CHUNK_W``-char windows every ``_CHUNK_S`` chars
    (starts at 0, S, 2S, … while start < len).

    Shape: pure per-batch ``flat_map`` — embarrassingly parallel, no
    shuffle, output rows carry (doc_id, chunk_idx) so downstream
    embedding/dedup stages keep lineage.  The expansion is stripe-
    vectorized: one ``utf8_slice_codeunits`` call per chunk ordinal
    (≤ ceil(max_len/S) calls per batch), never a per-row Python loop."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def chunk(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        L = pa.compute.utf8_length(texts).to_numpy()
        n = np.where(L > 0, (np.maximum(L, 1) - 1) // _CHUNK_S + 1, 0).astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        parts = []
        for ci in range(int(n.max()) if len(n) else 0):
            rows = np.flatnonzero(n > ci)
            sl = pa.compute.utf8_slice_codeunits(
                texts.take(pa.array(rows)), ci * _CHUNK_S, ci * _CHUNK_S + _CHUNK_W
            )
            parts.append(
                pa.Table.from_arrays(
                    [
                        pa.array(ids[rows]),
                        pa.array(np.full(len(rows), ci, dtype=np.int64)),
                        sl,
                    ],
                    names=["doc_id", "chunk_idx", "chunk_text"],
                )
            )
        if not parts:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.int64()), pa.array([], type=pa.string())],
                names=["doc_id", "chunk_idx", "chunk_text"],
            )
        return pa.concat_tables(parts)

    return ds.map_batches(chunk, batch_format="pyarrow")


SQL_CHUNK_DOCUMENTS = f"""
WITH g AS (
  SELECT doc_id, text,
         unnest(range(0, CAST((length(text) - 1) // {_CHUNK_S} AS BIGINT) + 1)) AS chunk_idx
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, chunk_idx,
       substring(text, CAST(chunk_idx AS INT) * {_CHUNK_S} + 1, {_CHUNK_W}) AS chunk_text
FROM g
"""


def q_rag_prep(sf_dir: str):
    """End-to-end RAG corpus prep, a composite of individually-oracled
    stages chained as ONE lazy plan: normalize (`text_clean`) → overlap-
    chunk (`chunk_documents`) → exact chunk dedup keeping the globally
    smallest (doc_id, chunk_idx) occurrence (`dedup_exact_min` on the
    packed key doc_id·10⁶+idx) → per-document surviving-chunk stats.
    The only shuffles are the dedup groupby-min and the final per-doc
    aggregate; chunk text never moves twice."""
    import pyarrow.compute as pc

    from .tabular import dedup_exact_min, grouped_aggregate

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def clean_chunk(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(batch["text"]), r"\s+", " ")
        )
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        L = pc.utf8_length(t).to_numpy()
        n = np.where(L > 0, (np.maximum(L, 1) - 1) // _CHUNK_S + 1, 0).astype(np.int64)
        ids = batch["doc_id"].to_numpy()
        parts = []
        for ci in range(int(n.max()) if len(n) else 0):
            rows = np.flatnonzero(n > ci)
            sl = pc.utf8_slice_codeunits(
                t.take(pa.array(rows)), ci * _CHUNK_S, ci * _CHUNK_S + _CHUNK_W
            )
            parts.append(
                pa.Table.from_arrays(
                    [pa.array(ids[rows] * 1_000_000 + ci), sl],
                    names=["chunk_key", "chunk_text"],
                )
            )
        if not parts:
            return pa.Table.from_arrays(
                [pa.array([], type=pa.int64()), pa.array([], type=pa.string())],
                names=["chunk_key", "chunk_text"],
            )
        return pa.concat_tables(parts)

    chunks = ds.map_batches(clean_chunk, batch_format="pyarrow")
    kept = dedup_exact_min(chunks, "chunk_text", "chunk_key")

    def doc_of(batch: pa.Table) -> pa.Table:
        k = batch["chunk_key"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(k // 1_000_000), pa.compute.utf8_length(batch["chunk_text"]).cast(pa.int64())],
            names=["doc_id", "chunk_chars"],
        )

    return grouped_aggregate(
        kept.map_batches(doc_of, batch_format="pyarrow"),
        ["doc_id"],
        {"n_chunks": ("count", None), "total_chars": ("sum", "chunk_chars")},
    )


SQL_RAG_PREP = f"""
WITH cleaned AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents
),
g AS (
  SELECT doc_id, t,
         unnest(range(0, CAST((length(t) - 1) // {_CHUNK_S} AS BIGINT) + 1)) AS i
  FROM cleaned WHERE length(t) > 0
),
ch AS (
  SELECT doc_id * 1000000 + i AS chunk_key,
         substring(t, CAST(i AS INT) * {_CHUNK_S} + 1, {_CHUNK_W}) AS chunk_text
  FROM g
),
kept AS (SELECT chunk_text, min(chunk_key) AS chunk_key FROM ch GROUP BY chunk_text)
SELECT CAST(chunk_key // 1000000 AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(length(chunk_text)) AS BIGINT) AS total_chars
FROM kept GROUP BY 1
"""


_PACK_BUDGET = 512


def q_pack_sequences(sf_dir: str):
    """Concatenation packing via a distributed two-pass prefix scan
    (stages/scan.pack_sequences): per source, token counts stream in
    doc_id order into 512-token sequences.  Bucket sums fold on the
    driver (buckets × sources ints), offsets broadcast back — the only
    shuffle is the coarse range-bucket groupby."""
    import os

    import pyarrow.parquet as pq

    from ..stages.scan import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def tokcount(batch: pa.Table) -> pa.Table:
        n = pa.compute.cast(
            pa.compute.list_value_length(pa.compute.split_pattern(batch["text"], " ")),
            pa.int64(),
        )
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], n], names=["doc_id", "source", "n_tok"]
        )

    counted = ds.map_batches(tokcount, batch_format="pyarrow")
    # order-key max from the parquet footer (no data read) sizes the buckets
    meta = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    return pack_sequences(counted, _PACK_BUDGET, max_order=int(max_id))


SQL_PACK = f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tok, cum_before,
       cum_before // {_PACK_BUDGET} AS seq_id,
       cum_before % {_PACK_BUDGET} AS seq_offset
FROM c
"""


# ---------------------------------------------------------------------------
# reshaping + distribution ops: histogram, ordered collect, outlier
# filter, unpivot/pivot
# ---------------------------------------------------------------------------


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of order totals: per-batch (bin, count)
    partials — the combiner — then a tiny groupby-sum; shuffle volume
    is O(bins × batches), never rows."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        bins = np.floor(price / 10000.0).astype(np.int64)
        vc = pd.Series(bins).value_counts()
        return pd.DataFrame({"bin": vc.index, "cnt": vc.to_numpy()})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_aggregate(partials, ["bin"], {"cnt": ("sum", "cnt")}, small_keys=True)


SQL_HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bin, count(*) AS cnt
FROM orders GROUP BY bin
"""


def q_event_sequences(sf_dir: str):
    """Ordered collect per key (the behavioral-sequence builder):
    per user, event types concatenated in (ts, event_id) order.  Same
    coarse-bucket scan shape as sessionize — users co-locate by hash
    bucket, in-bucket work is one vectorized sort + groupby join; a
    pathological single user is bounded by per-user activity, not the
    corpus."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("__bucket", pa.array((uid % 64).astype(np.int64)))

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        out = df.groupby("user_id", sort=True)["event_type"].agg(" ".join)
        return pd.DataFrame({"user_id": out.index, "seq": out.to_numpy()})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(build, batch_format="pandas")
    )


SQL_EVENT_SEQ = """
SELECT user_id, array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS seq
FROM events GROUP BY user_id
"""


def q_outlier_filter(sf_dir: str):
    """Percentile-threshold filter: exact p95 of token counts from the
    mergeable histogram sketch (only (value, count) partials leave the
    workers), threshold broadcast back, second streaming pass keeps the
    tail.  quantile_cont interpolation is reproduced bit-exactly from
    the histogram, so the float threshold comparison matches SQL."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        return pa.Table.from_arrays([batch["doc_id"], n], names=["doc_id", "n_tokens"])

    counted = ds.map_batches(counts, batch_format="pyarrow")

    def partial_hist(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(batch["n_tokens"].to_numpy(zero_copy_only=False)).value_counts()
        return pd.DataFrame({"n": vc.index, "cnt": vc.to_numpy()})

    hist = (
        counted.map_batches(partial_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("n", as_index=False)["cnt"]
        .sum()
        .sort_values("n")
    )
    thr = _quantile_from_hist(
        hist["n"].to_numpy(dtype=np.float64), hist["cnt"].to_numpy(dtype=np.int64), 0.95
    )

    def keep_tail(batch: pa.Table) -> pa.Table:
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n > thr))

    return counted.map_batches(keep_tail, batch_format="pyarrow")


def q_winsorize(sf_dir: str):
    """Winsorization (feature clipping): lineitem prices clip to the
    exact global [p05, p95] band.  Same histogram-sketch shape as
    `outlier_filter` — only (value, count) partials reach the driver,
    both thresholds broadcast, one vectorized np.clip pass — but the
    op REWRITES the value instead of filtering rows (the standard
    robust-scaling prep for numeric training features)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"], split=True)

    def partial_hist(batch: pa.Table) -> pd.DataFrame:
        vc = pd.Series(batch["l_extendedprice"].to_numpy(zero_copy_only=False)).value_counts()
        return pd.DataFrame({"v": vc.index, "cnt": vc.to_numpy()})

    hist = (
        ds.map_batches(partial_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby("v", as_index=False)["cnt"]
        .sum()
        .sort_values("v")
    )
    vals = hist["v"].to_numpy(dtype=np.float64)
    cnts = hist["cnt"].to_numpy(dtype=np.int64)
    lo = _quantile_from_hist(vals, cnts, 0.05)
    hi = _quantile_from_hist(vals, cnts, 0.95)

    def clip(batch: pa.Table) -> pa.Table:
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [batch["l_orderkey"], batch["l_linenumber"], pa.array(np.clip(p, lo, hi))],
            names=["l_orderkey", "l_linenumber", "price_w"],
        )

    return ds.map_batches(clip, batch_format="pyarrow")


SQL_WINSORIZE = """
WITH thr AS (
  SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       least(greatest(l_extendedprice, lo), hi) AS price_w
FROM lineitem, thr
"""


SQL_OUTLIER = r"""
WITH c AS (
  SELECT doc_id,
         CAST(coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens
  FROM documents
),
thr AS (SELECT quantile_cont(n_tokens, 0.95) AS q FROM c)
SELECT doc_id, n_tokens FROM c, thr WHERE n_tokens > q
"""


_MELT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_melt_measures(sf_dir: str):
    """Unpivot (wide→long): each batch emits its four measure slices
    stacked — pure Arrow column selection plus a literal measure tag,
    no shuffle, output streams at 4× input rows."""
    cols = ["l_orderkey", "l_linenumber", *_MELT_MEASURES]
    ds = read_table(sf_dir, "lineitem", columns=cols, split=True)

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for m in _MELT_MEASURES:
            parts.append(
                pa.Table.from_arrays(
                    [
                        batch["l_orderkey"],
                        batch["l_linenumber"],
                        pa.array([m] * batch.num_rows, type=pa.string()),
                        pa.compute.cast(batch[m], pa.float64()),
                    ],
                    names=["l_orderkey", "l_linenumber", "measure", "value"],
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


SQL_MELT = " UNION ALL ".join(
    f"SELECT l_orderkey, l_linenumber, '{m}' AS measure, "
    f"CAST({m} AS DOUBLE) AS value FROM lineitem"
    for m in _MELT_MEASURES
)


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(sf_dir: str):
    """Pivot (long→wide): per-user event-type counts as five columns.
    Per-batch crosstab is the combiner (≤ users-per-batch rows shuffle,
    with 5 small int columns), then one groupby-sum."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)

    def crosstab(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=_EVENT_TYPES, fill_value=0).astype(np.int64)
        ct.index.name = "user_id"
        return ct.reset_index()

    partials = ds.map_batches(crosstab, batch_format="pandas")
    return grouped_aggregate(
        partials, ["user_id"], {t: ("sum", t) for t in _EVENT_TYPES}
    )


SQL_PIVOT = """
SELECT user_id,
       coalesce(count(*) FILTER (WHERE event_type = 'click'), 0) AS click,
       coalesce(count(*) FILTER (WHERE event_type = 'error'), 0) AS error,
       coalesce(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
       coalesce(count(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
       coalesce(count(*) FILTER (WHERE event_type = 'view'), 0) AS view
FROM events GROUP BY user_id
"""


def q_bucketed_join(sf_dir: str):
    """Bucket-aligned join (sources/bucketed.py): both tables are
    written hash-bucketed on the join key ONCE (the only shuffle this
    layout ever pays), then the join runs one task per bucket reading
    its aligned files from both sides — zero exchange.  The production
    pattern for fact-table families sharing a key at 100 TB; this query
    exercises write + verify-spec + aligned join end-to-end."""
    import tempfile

    from ..sources.bucketed import bucketed_join, write_bucketed

    # private per-run scratch (mkdtemp): a fixed /tmp path keyed on the
    # scale tag races delete-vs-read when pytest and bench hit the same
    # sf concurrently (same class as the snapshot_reads fix)
    base = tempfile.mkdtemp(prefix="ae_buckets_")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True)
    items = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"], split=True
    )
    items = items.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_linenumber", "l_quantity"]),
        batch_format="pyarrow",
    )
    write_bucketed(orders, f"{base}/orders", "o_orderkey", 32)
    write_bucketed(items, f"{base}/lineitem", "o_orderkey", 32)
    joined = bucketed_join(f"{base}/orders", f"{base}/lineitem", "o_orderkey")
    out = joined.map_batches(
        lambda df: df[["o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"]],
        batch_format="pandas",
    ).materialize()  # the scratch layout must not outlive the query
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    return out


SQL_BUCKETED_JOIN = """
SELECT o.o_orderkey, o.o_totalprice, l.l_linenumber, l.l_quantity
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""


def q_set_intersect(sf_dir: str):
    """Distinct INTERSECT (tabular.set_op): users who both clicked and
    purchased.  Each side partially dedupes per batch before the one
    distinct-key shuffle — the raw events never move."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)
    from .tabular import set_op

    clicks = ev.filter(expr="event_type == 'click'")
    buys = ev.filter(expr="event_type == 'purchase'")
    return set_op(clicks, buys, "user_id", "intersect")


SQL_SET_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_set_except(sf_dir: str):
    """Distinct EXCEPT: users with a high-value purchase but no
    high-value error."""
    ev = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"], split=True)
    from .tabular import set_op

    hi = ev.filter(expr="value > 90")
    buys = hi.filter(expr="event_type == 'purchase'")
    errs = hi.filter(expr="event_type == 'error'")
    return set_op(buys, errs, "user_id", "except")


SQL_SET_EXCEPT = """
SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 90
"""


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(status, priority): the finest level is ONE
    partial-combined distributed aggregate; the coarser levels are
    re-aggregated from that already-tiny result (|statuses×priorities|
    rows) in a single final task — never a second pass over the fact
    table.  ``grp`` is the SQL GROUPING() id (bit0 = priority rolled)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"], split=True
    )
    fine = grouped_aggregate(
        ds,
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("count", None), "sum_price": ("sum", "o_totalprice")},
        small_keys=True,
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = 0
        sub = (
            df.groupby("o_orderstatus", as_index=False)
            .agg(n_orders=("n_orders", "sum"), sum_price=("sum_price", "sum"))
            .assign(o_orderpriority=None, grp=1)
        )
        total = pd.DataFrame(
            {
                "o_orderstatus": [None],
                "o_orderpriority": [None],
                "n_orders": [df["n_orders"].sum()],
                "sum_price": [df["sum_price"].sum()],
                "grp": [3],
            }
        )
        out = pd.concat([df, sub, total], ignore_index=True)
        out["sum_price"] = out["sum_price"].round(2)
        return out[["o_orderstatus", "o_orderpriority", "n_orders", "sum_price", "grp"]]

    return fine.repartition(1).map_batches(rollup, batch_format="pandas")


SQL_ROLLUP = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS grp
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def q_ntile_orders(sf_dir: str):
    """ntile(4) + percent_rank() over account balance within market
    segment — the missing rank-family windows.  Needs each partition's
    row COUNT before a rank can become a quartile, so the per-bucket
    scan computes (rn, cnt) in one vectorized pass; ntile reproduces
    SQL's earlier-buckets-get-the-remainder rule exactly."""
    ds = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        seg = batch["c_mktsegment"].to_numpy(zero_copy_only=False)
        b = pd.util.hash_array(seg.astype(object)) % np.uint64(16)
        return batch.append_column("bucket", pa.array(b.astype(np.int32)))

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bucket"]).sort_values(
            ["c_mktsegment", "c_acctbal", "c_custkey"], kind="stable"
        )
        g = df.groupby("c_mktsegment", sort=False)
        rn = g.cumcount().to_numpy()  # 0-based rank (order is unique)
        cnt = g["c_custkey"].transform("size").to_numpy()
        n = 4
        base, rem = cnt // n, cnt % n
        big = base + 1
        cutoff = rem * big
        in_big = rn < cutoff
        tile = np.where(
            in_big, rn // np.maximum(big, 1), rem + (rn - cutoff) // np.maximum(base, 1)
        ) + 1
        df["quartile"] = tile.astype(np.int64)
        pr = np.where(cnt > 1, rn / np.maximum(cnt - 1, 1), 0.0)
        df["pct_rank"] = np.round(pr, 9)
        return df

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(windows, batch_format="pandas")
    )


SQL_NTILE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 9) AS pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


def _doc_token_pairs(batch: pa.Table) -> pd.DataFrame:
    """Explode (doc_id, token) pairs vectorized — list lengths repeat the
    doc ids, no Python loop over rows or tokens."""
    import pyarrow.compute as pc

    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = np.asarray(toks.values)
    docs = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), lens)
    return pd.DataFrame({"doc_id": docs, "token": flat})


#: vocabulary size above which the idf map stops broadcasting and the
#: tf→df resolution routes through the bucketed token join
TFIDF_VOCAB_BUDGET = 20_000_000


def q_tfidf_top_terms(sf_dir: str):
    return _tfidf_top_terms(sf_dir)


def _tfidf_top_terms(sf_dir: str, *, vocab_budget: int = TFIDF_VOCAB_BUDGET):
    """TF-IDF top-3 terms per document.  tf needs NO shuffle (a doc's
    text lives in one row, so per-batch groupby is complete); df is one
    partial-combined token aggregate.  Ranking is integer-deterministic
    (tf desc, df asc, token) — tfidf is reported, never compared as a
    sort key, so float ties can't flip rows vs the oracle.

    idf routing: at or under ``vocab_budget`` distinct tokens the df
    table collects once and broadcasts as the idf map (zero further
    shuffles — each batch resolves its own docs).  Above it — a vocab
    that outgrows the object store — the tf rows resolve df through a
    bucketed ``tabular.shuffle_join`` on token, and the per-doc top-3
    re-groups with one doc-hash exchange; no vocab-order state touches
    the driver.  Both routes are proven identical by pytest
    (``vocab_budget=0`` forces the join route on the same corpus)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        pairs = _doc_token_pairs(batch).drop_duplicates()
        vc = pairs["token"].value_counts()
        return pd.DataFrame({"token": vc.index, "dfc": vc.to_numpy()})

    df_ds = grouped_aggregate(
        ds.map_batches(df_partial, batch_format="pyarrow"), ["token"], {"dfc": ("sum", "dfc")}
    )

    def head3(tf: pd.DataFrame) -> pd.DataFrame:
        tf = tf.sort_values(
            ["doc_id", "tf", "df", "token"], ascending=[True, False, True, True], kind="stable"
        )
        return tf.groupby("doc_id", sort=False).head(3)

    if df_ds.count() <= vocab_budget:
        df_tbl = df_ds.to_pandas()
        idf = Broadcast(dict(zip(df_tbl["token"], df_tbl["dfc"].astype(np.int64))))

        def tfidf(batch: pa.Table) -> pd.DataFrame:
            dfm = idf.get()
            tf = (
                _doc_token_pairs(batch)
                .groupby(["doc_id", "token"], as_index=False)
                .size()
                .rename(columns={"size": "tf"})
            )
            tf["df"] = tf["token"].map(dfm).astype(np.int64)
            tf["tfidf"] = (tf["tf"] * np.log(n_docs / tf["df"])).round(6)
            return head3(tf)

        return ds.map_batches(tfidf, batch_format="pyarrow")

    # bucketed-join route (web scale): tf rows resolve df on token
    from .tabular import shuffle_join

    def tf_partial(batch: pa.Table) -> pd.DataFrame:
        return (
            _doc_token_pairs(batch)
            .groupby(["doc_id", "token"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )

    joined = shuffle_join(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        df_ds,
        "token",
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"dfc": "df"})
        df["df"] = df["df"].astype(np.int64)
        df["tfidf"] = (df["tf"] * np.log(n_docs / df["df"])).round(6)
        return df[["doc_id", "token", "tf", "df", "tfidf"]]

    def tag_doc(batch: pa.Table) -> pa.Table:
        b = (batch["doc_id"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    return (
        joined.map_batches(score, batch_format="pandas")
        .map_batches(tag_doc, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda df: head3(df.drop(columns=["__bucket"])), batch_format="pandas"
        )
    )


SQL_TFIDF = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id, token, tf, df, round(tf * ln(n / df), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, df, token) <= 3
"""


def q_vocab_build(sf_dir: str):
    """Frequency-ranked vocabulary: token → contiguous id by (count
    desc, token).  Global rank WITHOUT a global sort: counts bucket into
    ORDER-ALIGNED log2(cnt) ranges (every count in a higher bucket
    outranks every count in a lower one by construction), per-bucket
    sizes fold to exclusive offsets on the driver (≤64 ints), and each
    bucket sorts locally adding its offset — the same two-pass rank
    shape as stages/scan.grouped_prefix_sum."""
    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pa.compute.split_pattern(col, " ").values)
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "cnt": vc.to_numpy()})

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], {"cnt": ("sum", "cnt")}
    )

    def tag(batch: pa.Table) -> pa.Table:
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        bucket = np.log2(np.maximum(cnt, 1)).astype(np.int64)
        return batch.append_column("__bucket", pa.array(bucket))

    tagged = counts.map_batches(tag, batch_format="pyarrow")
    sizes = (
        grouped_aggregate(tagged, ["__bucket"], {"sz": ("count", None)}, small_keys=True)
        .to_pandas()
        .sort_values("__bucket", ascending=False)
    )
    sizes["off"] = sizes["sz"].cumsum() - sizes["sz"]
    offsets = Broadcast(dict(zip(sizes["__bucket"].astype(int), sizes["off"].astype(int))))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        off = offsets.get()[int(df["__bucket"].iloc[0])]
        df = df.drop(columns="__bucket").sort_values(
            ["cnt", "token"], ascending=[False, True], kind="stable"
        )
        df["token_id"] = np.arange(off, off + len(df), dtype=np.int64)
        return df

    return tagged.groupby("__bucket").map_groups(rank_bucket, batch_format="pandas")


SQL_VOCAB = """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1 AS BIGINT) AS token_id
FROM counts
"""


def q_inverted_index(sf_dir: str):
    """token → (df, sorted posting list).  A doc's text is row-local, so
    (doc_id, token) pairs are already distinct after a per-batch dedupe —
    no cross-batch combine needed; postings then co-locate by a coarse
    token-hash bucket (the ordered-collect shape of q_event_sequences)
    and each bucket emits its tokens' sorted lists.  Postings are
    comma-joined strings so the value hash is representation-stable.
    At web scale the posting list of a stopword is the hot key — cap or
    tier those tokens (df above a threshold → store df only), which is
    what real engines do with stopword postings anyway."""
    import zlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        df = _doc_token_pairs(batch).drop_duplicates()
        tok = df["token"].to_numpy()
        df["bucket"] = np.fromiter(
            (zlib.crc32(t.encode()) % 64 for t in tok), dtype=np.int32, count=len(tok)
        )
        return df

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="stable")
        agg = g.groupby("token", sort=False)["doc_id"].agg(
            df="size", postings=lambda s: ",".join(map(str, s))
        )
        out = agg.reset_index()
        out["df"] = out["df"].astype(np.int64)
        return out[["token", "df", "postings"]]

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: collect(df.drop(columns="bucket")), batch_format="pandas")
    )


SQL_INVERTED_INDEX = """
WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
SELECT token, CAST(count(*) AS BIGINT) AS df,
       array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
FROM toks GROUP BY token
"""


def _doc_bigrams(batch: pa.Table) -> pd.DataFrame:
    """Explode (doc_id, w1, w2) consecutive-token pairs vectorized: flat
    token array + per-doc lengths → boolean masks select all-but-last
    (w1) and all-but-first (w2) positions per doc.  No Python loop."""
    import pyarrow.compute as pc

    col = batch["text"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(toks.values)
    ends = np.cumsum(lens)  # one past each doc's last flat index
    not_last = np.ones(len(flat), dtype=bool)
    not_last[ends - 1] = False  # drop each doc's final token from w1
    w1 = flat[not_last]
    not_first = np.ones(len(flat), dtype=bool)
    not_first[ends[:-1]] = False  # drop each doc's first token from w2
    not_first[0] = False
    w2 = flat[not_first]
    docs = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False), np.maximum(lens - 1, 0)
    )
    return pd.DataFrame({"doc_id": docs, "w1": w1, "w2": w2})


def q_bigram_lm_score(sf_dir: str, *, broadcast_budget_rows: int = 2_000_000):
    """CCNet-style LM quality signal: train a bigram MLE model on the
    corpus itself (one partial-combined (w1,w2) count aggregate; unigram
    context counts fold from it), then score each document's mean
    log P(w2|w1) in a second streaming pass.  Every bigram was seen ≥1
    (trained on the same corpus) so MLE needs no smoothing and the
    score is exact.

    Model distribution routes on size (same router shape as
    embedding_dup_pairs): under ``broadcast_budget_rows`` the logprob
    map ships once via ``ray.put``; above it the model stays a Dataset
    and per-doc bigram rows co-partition with it on (w1, w2) through
    ``shuffle_join`` — the model never materializes on the driver or in
    any single worker (scale path pytest-equivalence:
    tests/test_queries_units.py::test_bigram_sharded_matches_broadcast)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        vc = _doc_bigrams(batch).groupby(["w1", "w2"], as_index=False).size()
        return vc.rename(columns={"size": "c12"})

    cnt_ds = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["w1", "w2"], {"c12": ("sum", "c12")}
    ).materialize()
    n_model_rows = cnt_ds.count()

    def finalize_batch(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).agg(
            n_bigrams=("lp", "size"), avg_logp=("lp", "mean")
        )
        out["n_bigrams"] = out["n_bigrams"].astype(np.int64)
        out["avg_logp"] = out["avg_logp"].round(6)
        return out

    if n_model_rows <= broadcast_budget_rows:
        cnt = cnt_ds.to_pandas()
        uni = cnt.groupby("w1")["c12"].sum()
        logp = dict(
            zip(
                zip(cnt["w1"], cnt["w2"]),
                np.log(
                    cnt["c12"].to_numpy(dtype=np.float64)
                    / uni[cnt["w1"]].to_numpy(dtype=np.float64)
                ),
            )
        )
        model = Broadcast(logp)

        def score(batch: pa.Table) -> pd.DataFrame:
            m = model.get()
            big = _doc_bigrams(batch)
            if big.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series(dtype="int64"), "n_bigrams": pd.Series(dtype="int64"),
                     "avg_logp": pd.Series(dtype="float64")}
                )
            big["lp"] = [m[(a, b)] for a, b in zip(big["w1"], big["w2"])]
            return finalize_batch(big)

        return ds.map_batches(score, batch_format="pyarrow")

    # ---- sharded path: model stays distributed, join on the bigram key
    from .tabular import shuffle_join

    uni_ds = grouped_aggregate(cnt_ds, ["w1"], {"c1": ("sum", "c12")})
    model_ds = shuffle_join(cnt_ds, uni_ds, on="w1").map_batches(
        lambda df: df.assign(lp=np.log(df["c12"] / df["c1"]))[["w1", "w2", "lp"]],
        batch_format="pandas",
    )
    doc_bigrams = ds.map_batches(
        lambda b: _doc_bigrams(b).groupby(["doc_id", "w1", "w2"], as_index=False).size(),
        batch_format="pyarrow",
    )
    scored = shuffle_join(doc_bigrams, model_ds, on=["w1", "w2"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # mean over occurrences = multiplicity-weighted mean
        df = df.assign(wlp=df["lp"] * df["size"])
        g = df.groupby("doc_id", as_index=False).agg(
            n_bigrams=("size", "sum"), wlp=("wlp", "sum")
        )
        g["avg_logp"] = (g["wlp"] / g["n_bigrams"]).round(6)
        g["n_bigrams"] = g["n_bigrams"].astype(np.int64)
        return g[["doc_id", "n_bigrams", "avg_logp"]]

    bucketed = scored.map_batches(
        lambda df: df.assign(dbucket=(df["doc_id"].to_numpy() % 64).astype(np.int32)),
        batch_format="pandas",
    )
    return bucketed.groupby("dbucket").map_groups(
        lambda g: fold(g.drop(columns="dbucket")), batch_format="pandas"
    )


SQL_BIGRAM_LM = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        FROM toks, unnest(range(1, len(ts))) AS u(i)),
cnt AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
uni AS (SELECT w1, sum(c12) AS c1 FROM cnt GROUP BY w1),
scored AS (SELECT b.doc_id, ln(cnt.c12 / uni.c1) AS lp
           FROM big b JOIN cnt USING (w1, w2) JOIN uni USING (w1))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, round(avg(lp), 6) AS avg_logp
FROM scored GROUP BY doc_id
"""


_PPL_BUCKETS = 64
_PPL_TILES = 3
_PPL_NAMES = np.array(["head", "middle", "tail"])


def q_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    score every document with the corpus-trained bigram LM
    (:func:`q_bigram_lm_score`'s exact MLE mean log-prob), then split
    EACH LANGUAGE into head/middle/tail terciles by score (best mean
    log-prob = head) — the quality stratification that CCNet-family
    corpora publish and that downstream samplers draw from
    (head-heavy mixes for pretraining, tail for filtering studies).

    Geometry: the scored table (doc-bounded ints + floats, the text
    never re-ships) co-partitions with (doc_id, lang) through ONE
    ``shuffle_join``; per-(lang, value-bucket) counts fold on the
    driver (langs × 64 ints) into per-language DESC prefix offsets and
    NTILE(3) boundaries; one groupby(lang⊗bucket) pass sorts in-bucket
    (avg_logp DESC, doc_id) and assigns terciles — the
    :func:`q_curriculum_order` two-level rank shape, so a language that
    dominates the corpus still spreads over 64 value buckets instead
    of one giant group.  Cross-bucket ties are impossible (equal
    rounded scores share a linspace bucket) and in-bucket order is
    deterministic (doc_id); the 6-dp rounding is shared with the SQL
    oracle, so the ORDER BY ranks identically on both engines.
    Documents with no bigram (≤1 token) have no LM score and drop on
    both sides (inner-join semantics, as in CCNet's own LM gate)."""
    from ray.data.aggregate import Max, Min

    from .tabular import shuffle_join

    scores = q_bigram_lm_score(sf_dir).map_batches(
        lambda df: df[["doc_id", "avg_logp"]], batch_format="pandas"
    )
    langs = read_table(sf_dir, "documents", columns=["doc_id", "lang"], split=True)
    joined = shuffle_join(scores, langs, on="doc_id").materialize()

    rng = joined.aggregate(Min("avg_logp"), Max("avg_logp"))
    bounds = np.linspace(
        rng["min(avg_logp)"], rng["max(avg_logp)"], _PPL_BUCKETS + 1
    )[1:-1]

    def bucket_of(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(bounds, df["avg_logp"].to_numpy(), side="right")
        return df.assign(
            __b=b.astype(np.int64),
            __lb=df["lang"].astype(str) + ":" + pd.Series(b.astype(str), index=df.index),
        )

    bucketed = joined.map_batches(bucket_of, batch_format="pandas")
    counts = (
        bucketed.map_batches(
            lambda df: df.groupby(["lang", "__b"], as_index=False).size(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["lang", "__b"])["size"]
        .sum()
    )
    plan: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for lang in counts.index.get_level_values(0).unique():
        per_b = counts[lang].reindex(range(_PPL_BUCKETS), fill_value=0).to_numpy()
        # DESC rank: bucket b's rows rank after every row in buckets > b
        offsets = np.concatenate([np.cumsum(per_b[::-1])[::-1][1:], [0]])
        n_lang = int(per_b.sum())
        base, rem = divmod(n_lang, _PPL_TILES)
        ends = np.cumsum(
            [base + (1 if t < rem else 0) for t in range(_PPL_TILES)]
        )
        plan[str(lang)] = (offsets, ends)
    plan_bc = Broadcast(plan)

    def rank_tile(g: pd.DataFrame) -> pd.DataFrame:
        offsets, ends = plan_bc.get()[str(g["lang"].iloc[0])]
        b = int(g["__b"].iloc[0])
        g = g.sort_values(["avg_logp", "doc_id"], ascending=[False, True], kind="stable")
        rank = offsets[b] + np.arange(1, len(g) + 1, dtype=np.int64)
        tercile = (np.searchsorted(ends, rank - 1, side="right") + 1).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy().astype(np.int64),
                "lang": g["lang"].to_numpy(),
                "tercile": tercile,
                "bucket": _PPL_NAMES[tercile - 1],
            }
        )

    return bucketed.groupby("__lb").map_groups(rank_tile, batch_format="pandas")


SQL_PERPLEXITY_BUCKETS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
        FROM toks, unnest(range(1, len(ts))) AS u(i)),
cnt AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
uni AS (SELECT w1, sum(c12) AS c1 FROM cnt GROUP BY w1),
scored AS (SELECT b.doc_id, ln(cnt.c12 / uni.c1) AS lp
           FROM big b JOIN cnt USING (w1, w2) JOIN uni USING (w1)),
s AS (SELECT doc_id, round(avg(lp), 6) AS avg_logp FROM scored GROUP BY doc_id),
t AS (SELECT s.doc_id, d.lang,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.avg_logp DESC, s.doc_id) AS tercile
      FROM s JOIN documents d USING (doc_id))
SELECT doc_id, lang, CAST(tercile AS BIGINT) AS tercile,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM t
"""


def q_domain_mixture(sf_dir: str):
    """Temperature-scaled domain resampling (multilingual-mixing style,
    α=0.5, target = half the corpus): per-domain keep rate r_d =
    min(1, T·(n_d^α/Σn^α)/n_d), membership decided per doc by a
    Knuth multiplicative hash ((doc_id·2654435761) mod 2^32) against
    floor(r_d·2^32) — pure int64 arithmetic, bit-identical in numpy and
    SQL, no md5 loop.  One tiny count aggregate trains the rates; the
    keep decision is a stateless vectorized filter, so the full corpus
    streams once and only per-domain counts shuffle.  The float rate
    math is written in the same operation order as the oracle SQL so
    float64 determinism carries the equality."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"], split=True)
    d = grouped_aggregate(ds, ["source"], {"n_in": ("count", None)}, small_keys=True).to_pandas()
    n = d["n_in"].to_numpy(dtype=np.float64)
    denom = np.power(n, 0.5).sum()
    target = 0.5 * n.sum()
    rate = np.minimum(1.0, target * (np.power(n, 0.5) / denom) / n)
    thr = np.floor(rate * 4294967296.0).astype(np.int64)
    rates = Broadcast(
        {s: (t, r) for s, t, r in zip(d["source"], thr, rate)}
    )

    def keep_counts(batch: pa.Table) -> pd.DataFrame:
        rm = rates.get()
        src = batch["source"].to_numpy(zero_copy_only=False)
        h = (batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) * 2654435761) % 4294967296
        t = np.fromiter((rm[s][0] for s in src), dtype=np.int64, count=len(src))
        df = pd.DataFrame({"source": src, "kept": (h < t).astype(np.int64)})
        out = df.groupby("source", as_index=False).agg(n_kept=("kept", "sum"), n=("kept", "size"))
        return out

    agg = grouped_aggregate(
        ds.map_batches(keep_counts, batch_format="pyarrow"),
        ["source"],
        {"n_kept": ("sum", "n_kept")},
        small_keys=True,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rm = rates.get()
        df["n_in"] = df["source"].map({s: int(v) for s, v in zip(d["source"], d["n_in"])}).astype(np.int64)
        df["rate"] = df["source"].map({s: rm[s][1] for s in df["source"]}).round(6)
        df["n_kept"] = df["n_kept"].astype(np.int64)
        return df[["source", "n_in", "n_kept", "rate"]]

    return agg.map_batches(finalize, batch_format="pandas")


SQL_DOMAIN_MIXTURE = """
WITH d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_in FROM documents GROUP BY source),
tot AS (SELECT sum(pow(n_in, 0.5)) AS denom, 0.5 * sum(n_in) AS target FROM d),
rates AS (SELECT source, n_in,
                 least(1.0, target * (pow(n_in, 0.5) / denom) / n_in) AS rate
          FROM d CROSS JOIN tot)
SELECT r.source, r.n_in,
       CAST(count(*) FILTER (((doc_id * 2654435761) % 4294967296)
            < CAST(floor(r.rate * 4294967296) AS BIGINT)) AS BIGINT) AS n_kept,
       round(r.rate, 6) AS rate
FROM documents JOIN rates r USING (source)
GROUP BY r.source, r.n_in, r.rate
"""


def q_passage_dedup(sf_dir: str):
    """MassiveText-style repeated-passage removal: docs split into
    non-overlapping 8-token windows; a window survives only at its
    globally FIRST occurrence (min (doc_id, widx)); each doc is then
    rebuilt from its surviving windows in order.  Two shuffles, both
    necessary: windows co-locate by a coarse text-hash bucket to elect
    winners (per-batch partial min first, so one candidate per window
    text per batch moves), winners co-locate by doc bucket to
    reassemble.  Docs whose every window is a duplicate disappear —
    same as the oracle's GROUP BY over kept rows.  At web scale shuffle
    a 128-bit fingerprint instead of the window text in phase 1 and
    semi-join the winners back against a re-explode (text then moves
    zero times); the two-phase elect/reassemble shape is unchanged."""
    import zlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def explode(batch: pa.Table) -> pd.DataFrame:
        pairs = _doc_token_pairs(batch)
        doc = pairs["doc_id"].to_numpy()
        # within-doc token position without any per-row Python:
        # boundaries where doc changes -> segment starts
        n = len(doc)
        if not n:
            return pd.DataFrame({"doc_id": [], "widx": [], "wtext": []})
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, n]))
        pos = np.arange(n) - starts[seg_of]
        pairs["widx"] = (pos // 8).astype(np.int64)
        w = (
            pairs.groupby(["doc_id", "widx"], sort=False)["token"]
            .agg(" ".join)
            .rename("wtext")
            .reset_index()
        )
        # per-batch partial: local first-occurrence per window text
        w["okey"] = w["doc_id"] * np.int64(1 << 20) + w["widx"]
        w = w.loc[w.groupby("wtext", sort=False)["okey"].idxmin()]
        wt = w["wtext"].to_numpy()
        w["bucket"] = np.fromiter(
            (zlib.crc32(t.encode()) % 64 for t in wt), dtype=np.int32, count=len(wt)
        )
        return w

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        win = g.loc[g.groupby("wtext", sort=False)["okey"].idxmin()]
        win = win[["doc_id", "widx", "wtext"]].copy()
        win["dbucket"] = (win["doc_id"].to_numpy() % 64).astype(np.int32)
        return win

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "widx"], kind="stable")
        out = g.groupby("doc_id", sort=False)["wtext"].agg(
            n_kept="size", text_clean=" ".join
        ).reset_index()
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out[["doc_id", "n_kept", "text_clean"]]

    winners = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: elect(g.drop(columns="bucket")), batch_format="pandas")
    )
    return winners.groupby("dbucket").map_groups(
        lambda g: reassemble(g.drop(columns="dbucket")), batch_format="pandas"
    )


SQL_PASSAGE_DEDUP = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
w AS (SELECT doc_id, CAST((i - 1) // 8 AS BIGINT) AS widx,
             array_to_string(ts[i:i+7], ' ') AS wtext
      FROM toks, unnest(range(1, len(ts)+1, 8)) AS u(i)),
ranked AS (SELECT *, row_number() OVER (PARTITION BY wtext ORDER BY doc_id, widx) AS rn FROM w)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       array_to_string(list(wtext ORDER BY widx), ' ') AS text_clean
FROM ranked WHERE rn = 1 GROUP BY doc_id
"""


def q_left_join_orders(sf_dir: str):
    """LEFT outer join through the big-big shuffle join: every customer
    row survives, order-less customers carry NULL aggregates.  The
    co-partitioned per-bucket merge makes outer semantics exact — a
    bucket holds ALL rows of both sides for its keys, so pandas'
    ``how="left"`` per bucket composes to the global left join."""
    from .tabular import shuffle_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], split=True)
    agg = grouped_aggregate(
        orders, ["o_custkey"], {"n_orders": ("count", None), "sum_price": ("sum", "o_totalprice")}
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["sum_price"].round(2)
        df = df.rename(columns={"o_custkey": "c_custkey"})
        return df

    joined = shuffle_join(cust, agg.map_batches(finalize, batch_format="pandas"),
                          on="c_custkey", how="left")
    return joined


SQL_LEFT_JOIN = """
WITH agg AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                    round(sum(o_totalprice), 2) AS sum_price
             FROM orders GROUP BY o_custkey)
SELECT c_custkey, c_mktsegment, n_orders, sum_price
FROM customer LEFT JOIN agg ON c_custkey = o_custkey
"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(status, priority) — all four grouping sets from
    ONE distributed pass: like q_rollup_orders, the fact table
    aggregates once to the finest level, and the 2ⁿ−1 coarser sets
    re-fold the tiny result in a single final task."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"], split=True
    )
    fine = grouped_aggregate(
        ds,
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("count", None), "sum_price": ("sum", "o_totalprice")},
        small_keys=True,
    )

    def cube(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["grp"] = 0
        by_status = (
            df.groupby("o_orderstatus", as_index=False)
            .agg(n_orders=("n_orders", "sum"), sum_price=("sum_price", "sum"))
            .assign(o_orderpriority=None, grp=1)
        )
        by_prio = (
            df.groupby("o_orderpriority", as_index=False)
            .agg(n_orders=("n_orders", "sum"), sum_price=("sum_price", "sum"))
            .assign(o_orderstatus=None, grp=2)
        )
        total = pd.DataFrame(
            {
                "o_orderstatus": [None],
                "o_orderpriority": [None],
                "n_orders": [df["n_orders"].sum()],
                "sum_price": [df["sum_price"].sum()],
                "grp": [3],
            }
        )
        out = pd.concat([df, by_status, by_prio, total], ignore_index=True)
        out["sum_price"] = out["sum_price"].round(2)
        return out[["o_orderstatus", "o_orderpriority", "n_orders", "sum_price", "grp"]]

    return fine.repartition(1).map_batches(cube, batch_format="pandas")


SQL_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price,
       CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS grp
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


def q_full_outer_join(sf_dir: str):
    """FULL outer join via the co-partitioned shuffle join: customers
    with no orders in the window AND order-groups whose customer row is
    filtered away both survive with NULLs.  Left side = BUILDING-segment
    customers only, so both unmatched directions actually occur."""
    from .tabular import shuffle_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'"
    )
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], split=True)
    agg = grouped_aggregate(
        orders, ["o_custkey"], {"n_orders": ("count", None), "sum_price": ("sum", "o_totalprice")}
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_price"] = df["sum_price"].round(2)
        return df.rename(columns={"o_custkey": "c_custkey"})

    return shuffle_join(
        cust, agg.map_batches(finalize, batch_format="pandas"), on="c_custkey", how="outer"
    )


SQL_FULL_OUTER = """
WITH cust AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'),
agg AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY o_custkey)
SELECT coalesce(cust.c_custkey, agg.o_custkey) AS c_custkey, c_mktsegment, n_orders, sum_price
FROM cust FULL OUTER JOIN agg ON cust.c_custkey = agg.o_custkey
"""


def q_pagerank(sf_dir: str):
    """PageRank over the customer→supplier bipartite graph derived from
    orders ⨝ lineitem (stages/graph.pagerank): edge list streams per
    sweep, rank vector broadcasts like k-means centroids, dangling mass
    redistributes uniformly.  Node ids disambiguate the two key spaces
    as 2·custkey / 2·suppkey+1.  Value-checked against a chained-CTE
    power iteration in DuckDB (SQL_PAGERANK — one CTE per sweep, since
    SQL recursion cannot aggregate in the recursive term); bit-parity
    with the single-process power iteration is additionally
    pytest-verified (tests/test_graph.py::TestPageRank)."""
    from ..stages.graph import pagerank

    orders = read_table_arrow(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"], split=True)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": (df["o_custkey"].to_numpy() * 2).astype(np.int64),
                "dst": (df["l_suppkey"].to_numpy() * 2 + 1).astype(np.int64),
            }
        )

    e = broadcast_join(
        li, orders.rename_columns(["l_orderkey", "o_custkey"]), "l_orderkey"
    ).map_batches(edges, batch_format="pandas")
    # value-oracle rounding contract: ONE rounding to 10 dp on both sides
    # (double rounding 10→8 snaps near-midpoint ranks onto exact 8-dp
    # midpoints, where numpy's half-even and SQL's half-away disagree)
    return pagerank(e, iters=8).sort_values("node").reset_index(drop=True)


def q_grouped_regression(sf_dir: str):
    """Per-group OLS slope/intercept, Pearson r and sample stddev from
    ONE streaming pass of six-moment partials (n, Σx, Σy, Σx², Σy²,
    Σxy) — the textbook mergeable-statistics shape: each batch emits
    one partial row per group it sees, the shuffle moves ≤ groups ×
    batches tiny rows, the driver-free finalize folds them per group.
    Rounded to 4dp: the naive-moment finalize and DuckDB's internal
    accumulator differ in float ordering; 1e-4 grid absorbs the
    cancellation noise of near-zero correlations."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "g": batch["l_returnflag"].to_numpy(zero_copy_only=False),
                "x": batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64),
                "y": batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        df["n"] = np.int64(1)
        return df.groupby("g", as_index=False, sort=False).sum()

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["g"],
        {c: ("sum", c) for c in ["n", "x", "y", "xx", "yy", "xy"]},
        small_keys=True,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype(np.float64).to_numpy()
        cxy = (df["xy"] - df["x"] * df["y"] / n).to_numpy()
        cxx = (df["xx"] - df["x"] * df["x"] / n).to_numpy()
        cyy = (df["yy"] - df["y"] * df["y"] / n).to_numpy()
        # degenerate-group parity with DuckDB's builtins: corr() NULLs
        # when either variance is 0, regr_slope/intercept NULL when
        # var(x)=0, stddev_samp NULLs only n==1 (zero variance → 0.0);
        # numpy would emit ±inf/nan from raw division instead
        x_ok = cxx > 0
        xy_ok = x_ok & (cyy > 0)
        corr = np.where(xy_ok, cxy / np.sqrt(np.where(xy_ok, cxx * cyy, 1.0)), np.nan)
        slope = np.where(x_ok, cxy / np.where(x_ok, cxx, 1.0), np.nan)
        intercept = np.where(x_ok, (df["y"].to_numpy() - slope * df["x"].to_numpy()) / n, np.nan)
        sd = np.where(n >= 2, np.sqrt(np.maximum(cyy, 0.0) / np.maximum(n - 1, 1.0)), np.nan)
        out = pd.DataFrame(
            {
                "l_returnflag": df["g"],
                "n": df["n"].astype(np.int64),
                "corr_qty_price": np.round(corr, 4),
                "slope": np.round(slope, 4),
                "intercept": np.round(intercept, 4),
                "sd_price": np.round(sd, 4),
            }
        )
        return out

    return agg.map_batches(finalize, batch_format="pandas")


SQL_GROUPED_REGRESSION = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(stddev_samp(l_extendedprice), 4) AS sd_price
FROM lineitem GROUP BY l_returnflag
"""


def q_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training (stages/bpe.py): corpus read
    once for word counts, then each merge round is one pair-count
    aggregate over the small word vocabulary + a broadcast rewrite —
    the k-means iterative-broadcast shape applied to tokenizer
    learning.  Rows-only (iterative); bit-equality vs the textbook
    single-process BPE is pytest-verified (tests/test_bpe.py)."""
    from ..stages.bpe import bpe_train

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)
    return bpe_train(ds, num_merges=12)


def q_incremental_dedup(sf_dir: str):
    """Cross-snapshot near-dup detection against a PERSISTED minhash
    index (stages/dedup.write_minhash_index): history = even doc_ids,
    new snapshot = odd.  History text is read once to build the index
    (band rows + signatures, hive-partitioned); the incremental pass
    then touches only index partitions its own hashes occupy and
    verifies on stored signatures — the production crawl-dedup shape
    where each snapshot collides against all prior history.  Rows-only
    (LSH estimator); planted-dup recall + pruning are pytest-verified
    (tests/test_dedup.py::TestIncrementalMinhash)."""
    import tempfile

    from ..stages.dedup import minhash_dedup_incremental, write_minhash_index

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    def parity(p: int):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), p))

        return f

    hist = ds.map_batches(parity(0), batch_format="pyarrow")
    new = ds.map_batches(parity(1), batch_format="pyarrow")
    idx = tempfile.mkdtemp(prefix="ae_mh_index_")
    write_minhash_index(hist, idx)
    return minhash_dedup_incremental(new, idx, threshold=0.5)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (cluster-then-prune embedding dedup) over the embeddings
    table — k-means routes the O(N²) cosine work into bounded
    per-cluster blocks; see stages/clustering.semantic_dedup.  Iterative
    fit → rows-only driver check; determinism + planted-duplicate
    recall are pytest-verified (tests/test_clustering.py)."""
    from ..stages.clustering import semantic_dedup

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    return semantic_dedup(ds, k=8, threshold=0.97, iters=8, seed=17)


def q_zscore_normalize(sf_dir: str):
    """Grouped standardization (feature normalization for training):
    z = (x - mean_g) / stddev_samp_g per o_orderpriority group.

    Two-pass broadcast shape: pass 1 reduces per-batch moment partials
    (sum, sum-of-squares, count per group — three numbers per group per
    batch, never the rows) through ``grouped_aggregate``; the tiny group
    table finalizes mean/sd driver-side and broadcasts; pass 2 streams
    the fact table through a vectorized map.  No row ever shuffles —
    the same geometry at 100 TB, with the broadcast dict bounded by
    group cardinality.  Rounded to 6 on both sides (float policy)."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"], split=True
    )

    def moments(batch: pa.Table) -> pd.DataFrame:
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"o_orderpriority": batch["o_orderpriority"].to_pandas(), "s": x, "ss": x * x}
        )
        g = df.groupby("o_orderpriority", sort=False)
        out = g.agg(s=("s", "sum"), ss=("ss", "sum"), c=("s", "count")).reset_index()
        return out

    stats = (
        grouped_aggregate(
            ds.map_batches(moments, batch_format="pyarrow"),
            ["o_orderpriority"],
            {"s": ("sum", "s"), "ss": ("sum", "ss"), "c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    s, ss, c = (stats[k].to_numpy(dtype=np.float64) for k in ("s", "ss", "c"))
    # n==1 groups go NaN here BY DESIGN (DuckDB stddev_samp parity, see
    # the z() comment); errstate keeps the intentional NaN quiet so real
    # warnings stay visible in the suite
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s / c
        sd = np.sqrt((ss - s * s / c) / (c - 1))
    table = {g: (m, d) for g, m, d in zip(stats["o_orderpriority"], mean, sd)}
    bc = Broadcast(table)

    def z(batch: pa.Table) -> pd.DataFrame:
        t = bc.get()
        pri = batch["o_orderpriority"].to_pandas()
        ms = pri.map(lambda g: t[g][0]).to_numpy(dtype=np.float64)
        sds = pri.map(lambda g: t[g][1]).to_numpy(dtype=np.float64)
        x = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        # degenerate-group parity: DuckDB emits NULL for x/0.0 (zero
        # variance) and propagates NULL for n==1 (stddev_samp NULL);
        # numpy would emit ±inf for the former — NaN ≡ NULL to the
        # comparer, inf is not
        ok = sds > 0.0
        zval = np.where(ok, (x - ms) / np.where(ok, sds, 1.0), np.nan)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_orderpriority": pri,
                "zscore": np.round(zval, 6),
            }
        )

    return ds.map_batches(z, batch_format="pyarrow")


SQL_ZSCORE = """
WITH s AS (
  SELECT o_orderpriority, avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd
  FROM orders GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderpriority,
       round((o.o_totalprice - s.m) / s.sd, 6) AS zscore
FROM orders o JOIN s USING (o_orderpriority)
"""


def q_domain_quality_gate(sf_dir: str):
    """Adaptive per-domain quality gate: keep a document only if its
    token count exceeds ITS OWN source's median — the per-domain
    threshold variant of ``outlier_filter`` that corpus curation uses
    when domains have very different length profiles.

    Per-(source, n_tokens) histogram partials reduce to one tiny table
    (bounded by sources × distinct counts, not rows); exact
    quantile_cont interpolation per source is reproduced bit-exactly
    from the histogram; thresholds broadcast; second streaming pass
    filters.  Same shape as outlier_filter — nothing materializes."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64())
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], n], names=["doc_id", "source", "n_tokens"]
        )

    counted = ds.map_batches(counts, batch_format="pyarrow")

    def partial_hist(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "n": batch["n_tokens"].to_numpy(zero_copy_only=False),
            }
        )
        out = df.value_counts(["source", "n"]).reset_index(name="cnt")
        return out

    hist = (
        counted.map_batches(partial_hist, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "n"], as_index=False)["cnt"]
        .sum()
    )
    thr = {
        src: _quantile_from_hist(
            g.sort_values("n")["n"].to_numpy(dtype=np.float64),
            g.sort_values("n")["cnt"].to_numpy(dtype=np.int64),
            0.5,
        )
        for src, g in hist.groupby("source")
    }
    bc = Broadcast(thr)

    def keep(batch: pa.Table) -> pa.Table:
        t = bc.get()
        n = batch["n_tokens"].to_numpy(zero_copy_only=False)
        qs = batch["source"].to_pandas().map(t).to_numpy(dtype=np.float64)
        return batch.filter(pa.array(n > qs))

    return counted.map_batches(keep, batch_format="pyarrow")


SQL_DOMAIN_GATE = r"""
WITH c AS (
  SELECT doc_id, source,
         CAST(coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens
  FROM documents
),
t AS (SELECT source, quantile_cont(n_tokens, 0.5) AS q FROM c GROUP BY source)
SELECT c.doc_id, c.source, c.n_tokens
FROM c JOIN t USING (source) WHERE c.n_tokens > t.q
"""


_FUZZY_JOIN_MOD = 97
_FUZZY_JOIN_THRESHOLD = 0.9


class _FuzzyNameMatcher:
    """Actor-pool verify stage for the blocked similarity join: the
    small query side arrives once per actor via Broadcast; Jaro-Winkler
    runs once per DISTINCT (query name, candidate name) pair per actor
    (memo), then fans out to key pairs with an integer take — similarity
    work is bounded by distinct-name cardinality, not row count."""

    def __init__(self, queries_bc: Broadcast):
        self._queries = queries_bc.get()  # list[(qk, qname)]
        self._memo: dict[tuple[str, str], float] = {}

    def _sim(self, a: str, b: str) -> float:
        from ..functions.strings import jaro_winkler_similarity

        key = (a, b)
        v = self._memo.get(key)
        if v is None:
            v = jaro_winkler_similarity(a, b)
            self._memo[key] = v
        return v

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        names = batch["p_name"].to_pandas().to_numpy(dtype=object)
        keys = batch["p_partkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(names.astype(str), return_inverse=True)
        out_q, out_m, out_s = [], [], []
        for qk, qn in self._queries:
            blocked = [
                (i, self._sim(qn, u))
                for i, u in enumerate(uniq)
                if u[:1] == qn[:1]
            ]
            for i, sim in blocked:
                if sim < _FUZZY_JOIN_THRESHOLD:
                    continue
                rows = np.flatnonzero(inv == i)
                mk = keys[rows]
                mk = mk[mk != qk]  # a key never matches itself
                out_q.append(np.full(len(mk), qk, dtype=np.int64))
                out_m.append(mk)
                out_s.append(np.full(len(mk), round(sim, 6)))
        if not out_q:
            return pd.DataFrame({"query_key": [], "match_key": [], "sim": []}).astype(
                {"query_key": np.int64, "match_key": np.int64, "sim": np.float64}
            )
        return pd.DataFrame(
            {
                "query_key": np.concatenate(out_q),
                "match_key": np.concatenate(out_m),
                "sim": np.concatenate(out_s),
            }
        )


def q_fuzzy_name_join(sf_dir: str):
    """Blocked string-similarity join (entity resolution): every 97th
    part is a "query" entity; find all parts whose name shares the
    query's first character (the block) and has Jaro-Winkler ≥ 0.9.

    Scale shape: the query side is small by construction → collected
    once, shipped via ``ray.put`` (Broadcast), and probed inside a
    streaming actor-pool map over the big side — no shuffle, and the
    O(|queries| × |names|) similarity math runs on per-batch DISTINCT
    names with a per-actor memo (64 distinct names here; bounded by
    name vocabulary at scale).  Our JW is bit-identical to DuckDB's
    `jaro_winkler_similarity` (verified by the §2h oracles), so the
    threshold decision matches exactly."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"], split=True)

    def pick_queries(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(k % _FUZZY_JOIN_MOD == 0))

    qdf = ds.map_batches(pick_queries, batch_format="pyarrow").to_pandas()
    queries = list(zip(qdf["p_partkey"].astype(int), qdf["p_name"].astype(str)))
    bc = Broadcast(queries)
    return ds.map_batches(
        _FuzzyNameMatcher,
        fn_constructor_args=(bc,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_FUZZY_JOIN = f"""
WITH q AS (SELECT p_partkey AS qk, p_name AS qn FROM part WHERE p_partkey % {_FUZZY_JOIN_MOD} = 0)
SELECT q.qk AS query_key, p.p_partkey AS match_key,
       round(jaro_winkler_similarity(q.qn, p.p_name), 6) AS sim
FROM q JOIN part p
  ON substr(q.qn, 1, 1) = substr(p.p_name, 1, 1) AND q.qk <> p.p_partkey
WHERE jaro_winkler_similarity(q.qn, p.p_name) >= {_FUZZY_JOIN_THRESHOLD}
"""


def q_bpe_encode(sf_dir: str):
    """Tokenize the corpus with a trained BPE merge table — the
    train-then-apply pair to ``bpe_train`` (stages/bpe.BpeEncodeStage).
    The merge table broadcasts once; encoding runs in an actor pool
    with a per-actor word memo, so merge loops scale with distinct
    words, not corpus size.  Rows-only (iterative training upstream);
    encoder bit-equality vs the textbook reference is pytest-verified
    (tests/test_bpe.py)."""
    from ..stages.bpe import bpe_train, encode_stage_task

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    merges = bpe_train(ds, num_merges=12)
    bc = Broadcast(list(zip(merges["left"].astype(str), merges["right"].astype(str))))
    return ds.map_batches(
        lambda b: encode_stage_task(b, bc), batch_format="pyarrow"
    )


_KNN_GRAPH_K = 3

#: rows above which the EXACT k-NN graph (inherently O(N²) similarity
#: work, n_blocks× data replication) gives way to the approximate
#: bucketed-LSH self-join.  2M × 2M exact is ~4e12 dot products — past
#: any reasonable budget; LSH candidate generation is near-linear.
_KNN_GRAPH_EXACT_ROWS = 2_000_000


def q_knn_graph(sf_dir: str):
    """Exact k-NN graph (top-3 cosine neighbors for EVERY vector) — the
    similarity-graph build that feeds near-dup clustering / SemDeDup.

    Three-tier router on the parquet footer row count (same shape as
    `embedding_dup_pairs`): under the broadcast budget the normalized
    corpus matrix ships once via ``ray.put`` and the corpus streams
    through a vectorized (batch × N) matmul with an axis-1
    ``argpartition`` margin; above it,
    `stages.similarity.knn_graph_blocked` runs the same exact math via
    block-pair expansion with NO driver matrix (pytest-equal); above
    ``_KNN_GRAPH_EXACT_ROWS`` — where even n_blocks× replication of an
    O(N²) exact pass is off the table — `knn_graph_lsh` self-joins the
    corpus through the bucketed-LSH exchange (sublinear candidate
    generation, recall bounded by the property test).  Ties at the k
    boundary resolve by the deterministic (sim desc, vec_id asc) rule
    on both exact paths.  Output is rank-only (no float column),
    matching `knn_cosine`'s oracle convention."""
    import os

    import pyarrow.parquet as pq

    from ..stages.similarity import (
        _as_matrix,
        _normalize,
        knn_graph_blocked,
        knn_graph_lsh,
    )

    k = _KNN_GRAPH_K
    n_rows = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    if n_rows > _KNN_GRAPH_EXACT_ROWS:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
        return knn_graph_lsh(ds, k=k)
    if n_rows > _EMB_BROADCAST_ROWS:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
        return knn_graph_blocked(ds, k=k, n_blocks=8)
    tab = read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_ids = tab["vec_id"].to_numpy()
    mat_t = np.ascontiguousarray(_normalize(_as_matrix(tab["embedding"])).T)
    handle = Broadcast((mat_t, all_ids))

    def score(batch: pa.Table) -> pd.DataFrame:
        mt, ids = handle.get()
        bids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bm = _normalize(_as_matrix(batch["embedding"]))
        sims = bm @ mt  # (b, N)
        take = min(k + 8, sims.shape[1])  # margin absorbs boundary ties
        cand = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        rows = np.repeat(np.arange(len(bids)), take)
        df = pd.DataFrame(
            {
                "src": bids[rows],
                "dst": ids[cand.ravel()],
                "sim": sims[rows, cand.ravel()],
            }
        )
        df = df[df["src"] != df["dst"]]
        df = df.sort_values(["src", "sim", "dst"], ascending=[True, False, True], kind="stable")
        df["rank"] = df.groupby("src", sort=False).cumcount() + 1
        df = df[df["rank"] <= k]
        return df[["src", "dst", "rank"]].astype({"rank": np.int64})

    return read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True
    ).map_batches(score, batch_format="pyarrow")


SQL_KNN_GRAPH = f"""
SELECT src, dst, rank FROM (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id
         ) AS BIGINT) AS rank
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
) WHERE rank <= {_KNN_GRAPH_K}
"""


_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1998-01-01"


def q_q3_shipping(sf_dir: str):
    """TPC-H Q3-shaped three-table join: revenue of open orders from one
    market segment — customer ⋈ orders ⋈ lineitem with date filters,
    grouped revenue, top-10.

    Shape: every broadcast value-set is a PRE-BUILT ``pa.array`` shipped
    once (``ray.put``) and probed per batch with the vectorized
    ``pc.is_in`` kernel — no per-batch set→list→Arrow conversion.  The
    filtered order dimension stays a Dataset (materialized once at
    dimension scale); when it fits the broadcast budget its KEYS drain
    once to the driver as the fact-scan semi-filter, otherwise the
    semi-filter is skipped and the per-orderkey partial aggregate does
    the pruning.  The date attach routes through the size-routed
    ``tabular.join`` facade (broadcast under budget, hash exchange
    above), and the top-10 runs through ``topk``'s per-batch prefilter
    — nothing fact-table-scale ever lands on the driver.  Revenue sums
    run in integer cents so accumulation order can't shift the top-10
    boundary."""
    import pyarrow.compute as pc

    from .tabular import _BROADCAST_BUDGET_BYTES, join as join_route, topk

    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ckeys_bc = Broadcast(
        cust.filter(pc.equal(cust["c_mktsegment"], _Q3_SEGMENT))["c_custkey"]
        .combine_chunks()
        .cast(pa.int64())
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True
    )
    cutoff = np.datetime64(_Q3_DATE, "us")

    def pick_orders(batch: pa.Table) -> pa.Table:
        mask = np.asarray(
            pc.is_in(batch["o_custkey"], value_set=ckeys_bc.get()).to_numpy(
                zero_copy_only=False
            )
        )
        dates = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = pa.array(mask & (dates < cutoff))
        return batch.filter(keep).select(["o_orderkey", "o_orderdate"])

    # dimension-scale materialize: reused twice (semi-filter keys + join)
    odim = orders.map_batches(pick_orders, batch_format="pyarrow").materialize()
    okeys_bc = None
    if odim.size_bytes() <= _BROADCAST_BUDGET_BYTES:
        okeys = odim.select_columns(["o_orderkey"]).to_pandas()["o_orderkey"].to_numpy()
        okeys_bc = Broadcast(pa.array(okeys, type=pa.int64()))

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        split=True,
    )

    def partial_revenue(batch: pa.Table) -> pd.DataFrame:
        ship = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = ship > cutoff
        if okeys_bc is not None:
            keep &= np.asarray(
                pc.is_in(batch["l_orderkey"], value_set=okeys_bc.get()).to_numpy(
                    zero_copy_only=False
                )
            )
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        # integer-cent revenue: price has 2 decimals, discount 2 decimals
        # → price*(1-disc) is exact in units of 1e-4 dollars
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return (
            pd.DataFrame({"o_orderkey": ok, "rev": rev})
            .groupby("o_orderkey", as_index=False)["rev"]
            .sum()
        )

    grouped = grouped_aggregate(
        li.map_batches(partial_revenue, batch_format="pyarrow"),
        ["o_orderkey"],
        {"rev": ("sum", "rev")},
    )
    joined, _strategy = join_route(grouped, odim, on="o_orderkey")
    top = topk(
        joined, ["rev", "o_orderdate", "o_orderkey"], 10, descending=[True, False, False]
    ).to_pandas()
    top["revenue"] = np.round(top["rev"] / 10000.0, 2)
    top = top.rename(columns={"o_orderkey": "l_orderkey"})
    return top[["l_orderkey", "revenue", "o_orderdate"]].reset_index(drop=True)


SQL_Q3 = f"""
SELECT l.l_orderkey,
       round(sum(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) ) / 10000.0, 2) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l.l_shipdate  > TIMESTAMP '{_Q3_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY sum(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount))) DESC,
         o.o_orderdate, l.l_orderkey
LIMIT 10
"""


_EWMA_ALPHA = 0.3


def q_ewma(sf_dir: str):
    """Per-user exponentially weighted moving average of event values
    (α=0.3) — the time-decay feature every behavioral model pipeline
    computes.  Same bucketed-ordered-scan shape as `moving_avg`: one
    shuffle on user_id % 32 co-locates each user's whole ordered
    history, then one rank-vectorized scan per bucket.  Value-oracled
    against a DuckDB RECURSIVE CTE running the identical
    e_n = α·v_n + (1-α)·e_{n-1} float64 recursion in the identical
    per-user (ts, event_id) order.  NOT pandas ``ewm``: with
    adjust=False pandas divides each step by (α+(1-α)) =
    0.9999999999999999, whose 1-ulp drift flips round(6) boundaries on
    long histories — the scan below runs the literal recurrence
    instead, vectorized ACROSS users per history position (O(max
    history length) numpy steps, no per-row Python)."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    a, b_ = _EWMA_ALPHA, 1.0 - _EWMA_ALPHA

    def decay(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        n = len(df)
        v = df["value"].to_numpy(dtype=np.float64)
        uniq, u_idx = np.unique(df["user_id"].to_numpy(), return_inverse=True)
        starts = np.r_[0, 1 + np.flatnonzero(u_idx[1:] != u_idx[:-1])]
        rn = np.arange(n) - starts[u_idx]
        order = np.argsort(rn, kind="stable")
        counts = np.bincount(rn) if n else np.zeros(0, dtype=np.int64)
        e = np.empty(n)
        state = np.zeros(len(uniq))
        pos = 0
        for k, c in enumerate(counts):
            rows = order[pos : pos + c]
            pos += c
            ui = u_idx[rows]
            state[ui] = v[rows] if k == 0 else a * v[rows] + b_ * state[ui]
            e[rows] = state[ui]
        # DuckDB round() is half-AWAY-from-zero (std::round); np.round is
        # half-even — the recursion lands on .5 boundaries often enough
        # (19 rows at sf0.1) that the rule must match, not just the value
        scaled = e * 1e6
        df["ewma"] = np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / 1e6
        return df[["event_id", "user_id", "ewma"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: decay(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_EWMA = f"""
WITH RECURSIVE ordered AS (
  SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), rec AS (
  SELECT event_id, user_id, rn, value AS e FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.event_id, o.user_id, o.rn, {_EWMA_ALPHA} * o.value + {1.0 - _EWMA_ALPHA} * r.e
  FROM ordered o JOIN rec r ON o.user_id = r.user_id AND o.rn = r.rn + 1
)
SELECT event_id, user_id, round(e, 6) AS ewma FROM rec
"""


def q_moving_avg(sf_dir: str):
    """ROWS-frame moving average: each event's mean value over the same
    user's last 4 events (ROWS 3 PRECEDING .. CURRENT ROW).  The
    bucketed-ordered-scan shape (one shuffle on user_id % 32, one
    vectorized pandas ``rolling`` per bucket) shared with window_lag /
    sessionize.  Rounded to 6 on both sides (float policy)."""
    ds = read_table(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        df["moving_avg"] = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(window=4, min_periods=1)
            .mean()
            .round(6)
            .reset_index(level=0, drop=True)
        )
        return df[["event_id", "user_id", "ts", "moving_avg"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: roll(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_MOVING_AVG = """
SELECT event_id, user_id, ts,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg
FROM events
"""


_CMS_PROBES = ["the", "table", "query", "value", "spark", "data", "scan", "nosuchtoken"]


def q_cms_token_freq(sf_dir: str):
    """Count-Min point-frequency estimates for a fixed probe
    vocabulary, DIRECTLY SQL-oracled (round-4 verdict item 5): the
    md5-keyed d=4 × w=1024 cells (stages/sketch_parity.cms_md5_partial
    — the salted-row keying DuckDB replays verbatim) fold per batch and
    elementwise-sum under one bounded reduce; each probe's estimate is
    the min over its d cells — pure integers, so DuckDB reproduces
    EVERY estimate bit-exactly, collisions included.  The production
    SipHash kernel (stages/sketch.cms_*) stays tolerance-gated by
    `cms_rank_check`.  Scale shape unchanged: corpus never shuffles,
    partials are ≤ d·w rows."""
    from ..stages.sketch_parity import cms_md5_partial, md5_u64

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        alltoks = " ".join(t or "" for t in batch["text"].to_pylist()).split()
        u, c = np.unique(np.asarray(alltoks, dtype=object), return_counts=True)
        return cms_md5_partial(u.tolist(), c, d=_CMS_SQL_D, w=_CMS_SQL_W)

    cells = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["sketch_row", "col"], {"cnt": ("sum", "cnt")}, small_keys=True,
    ).to_pandas()
    lookup = {
        (int(r), int(col)): int(cnt)
        for r, col, cnt in zip(cells["sketch_row"], cells["col"], cells["cnt"])
    }
    est = []
    for tok in _CMS_PROBES:
        cols = (
            md5_u64([f"{r}|{tok}" for r in range(_CMS_SQL_D)]) % np.uint64(_CMS_SQL_W)
        ).astype(np.int64)
        est.append(min(lookup.get((r, int(c)), 0) for r, c in enumerate(cols)))
    return pd.DataFrame(
        {"token": _CMS_PROBES, "est_count": np.asarray(est, dtype=np.int64)}
    ).sort_values("token").reset_index(drop=True)


def _cms_token_freq_sql() -> str:
    # literals 4 / 1024 mirror _CMS_SQL_D / _CMS_SQL_W (defined later in
    # this module; this SQL string is built at import time, before them)
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    return f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
r(sketch_row) AS (VALUES {", ".join(f"({r})" for r in range(4))}),
cells AS (
  SELECT sketch_row,
         CAST(md5_number_upper(sketch_row || '|' || tok) % 1024 AS BIGINT) AS col,
         sum(c) AS cnt
  FROM cnt CROSS JOIN r GROUP BY sketch_row, col
),
probes(token) AS (VALUES {probes}),
pe AS (
  SELECT p.token, r.sketch_row,
         CAST(md5_number_upper(r.sketch_row || '|' || p.token) % 1024 AS BIGINT) AS col
  FROM probes p CROSS JOIN r
)
SELECT token, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est_count
FROM pe LEFT JOIN cells USING (sketch_row, col)
GROUP BY token ORDER BY token
"""


SQL_CMS_TOKEN_FREQ = _cms_token_freq_sql()


def q_cms_rank_check(sf_dir: str):
    """The Count-Min accuracy contract at the driver gate: for every
    probe token, the sketch estimate must satisfy the one-sided bound
    ``true ≤ est ≤ true + (e/w)·N`` (CMS never undercounts; the
    overcount is bounded by the stream length over the width).  True
    counts come from one vectorized counting pass (the probe list is a
    broadcast constant, counts are per-batch partial sums); the oracle
    enumerates the probe grid with ``within = TRUE``."""
    import pyarrow.compute as pc

    from ..stages.sketch import cms_build, cms_estimate

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def tokens_of(batch: pa.Table) -> np.ndarray:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(pc.split_pattern(col, " ").values.to_pandas(), dtype=object)

    w = 1 << 14
    sketch = cms_build(ds, tokens_of, d=4, w=w)
    probes = np.array(
        ["the", "table", "query", "value", "spark", "data", "scan", "nosuchtoken"],
        dtype=object,
    )
    est = cms_estimate(sketch, probes).astype(np.int64)
    probes_bc = Broadcast(pa.array(probes, type=pa.string()))

    def true_counts(batch: pa.Table) -> pd.DataFrame:
        toks = tokens_of(batch)
        total = len(toks)
        pr = probes_bc.get().to_numpy(zero_copy_only=False)
        s = pd.Series(toks)
        counts = s[s.isin(pr)].value_counts()
        return pd.DataFrame(
            {
                "token": np.append(pr, "__total__"),
                "n": np.append(
                    counts.reindex(pr).fillna(0).to_numpy(dtype=np.int64), total
                ),
            }
        )

    truth = (
        grouped_aggregate(
            ds.map_batches(true_counts, batch_format="pyarrow"),
            ["token"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .set_index("token")["n"]
    )
    stream_n = int(truth["__total__"])
    eps_bound = np.e / w * stream_n
    rows = []
    for tok, e_est in zip(probes, est):
        t = int(truth.get(tok, 0))
        rows.append(
            {"token": tok, "within": bool(t <= e_est <= t + eps_bound)}
        )
    return pd.DataFrame(rows).sort_values("token").reset_index(drop=True)


SQL_CMS_RANK_CHECK = """
SELECT token, TRUE AS within
FROM (SELECT UNNEST(['the','table','query','value','spark','data','scan','nosuchtoken']) AS token)
ORDER BY token
"""


_FUNNEL_STAGES = ("view", "click", "purchase")


def q_funnel_users(sf_dir: str):
    """Ordered-funnel analysis: users whose first 'view' precedes their
    first 'click' precedes their first 'purchase' (strict order).

    Shape: per-batch partial min-timestamp per (user, stage) — three
    columns per user per batch, never the event rows — then one
    ``grouped_aggregate`` min-reduce and a vectorized stage-order
    filter.  The shuffle moves at most |users|×3 values per batch
    regardless of event volume.  The reduce runs over int64 epoch-µs
    with INT64_MAX as the "stage absent" sentinel (min-neutral, and
    immune to the all-null-block object fallback Ray's Min aggregate
    exhibits on timestamp columns); finalize masks sentinels — exactly
    SQL's strict-NULL comparison — and restores timestamp[us]."""
    _ABSENT = np.iinfo(np.int64).max
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
                "ts": batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64"),
            }
        )
        df = df[df["event_type"].isin(_FUNNEL_STAGES)]
        p = df.pivot_table(index="user_id", columns="event_type", values="ts", aggfunc="min")
        out = pd.DataFrame({"user_id": p.index.to_numpy()})
        for s in _FUNNEL_STAGES:
            col = (
                np.asarray(p[s].to_numpy(), dtype=np.float64)
                if s in p.columns
                else np.full(len(out), np.nan, dtype=np.float64)
            )
            # Mask-then-assign: _ABSENT (INT64_MAX) is not float64-representable,
            # so routing it through np.where's float path would overflow the cast.
            absent = np.isnan(col)
            vals = np.where(absent, 0.0, col).astype(np.int64)
            vals[absent] = _ABSENT
            out[f"t_{s}"] = vals
        return out

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {f"t_{s}": ("min", f"t_{s}") for s in _FUNNEL_STAGES},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        tv, tc, tp = (
            batch[f"t_{s}"].to_numpy(zero_copy_only=False) for s in _FUNNEL_STAGES
        )
        ok = (tv < tc) & (tc < tp) & (tv != _ABSENT) & (tc != _ABSENT) & (tp != _ABSENT)
        kept = batch.filter(pa.array(np.asarray(ok, dtype=bool)))
        arrays = [kept["user_id"]]
        for s in _FUNNEL_STAGES:
            arrays.append(
                pa.array(
                    kept[f"t_{s}"].to_numpy(zero_copy_only=False).view("datetime64[us]")
                )
            )
        return pa.Table.from_arrays(arrays, names=["user_id"] + [f"t_{s}" for s in _FUNNEL_STAGES])

    return agg.map_batches(finalize, batch_format="pyarrow")


SQL_FUNNEL = """
WITH m AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
         min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, t_view, t_click, t_purchase
FROM m WHERE t_view < t_click AND t_click < t_purchase
"""


_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
]


def q_fk_audit(sf_dir: str):
    return _fk_audit(sf_dir)


def _fk_audit(sf_dir: str, *, dim_budget: int = FK_DIM_BUDGET):
    """Referential-integrity audit: orphan-row counts for every declared
    FK edge — the data-quality gate a pipeline runs before training
    joins.

    Per-edge routing on the dimension's parquet-footer row count
    (metadata only, no scan): at or under ``dim_budget`` rows the
    keyset broadcasts once (``ray.put``) and the fact table streams
    through a vectorized ``pc.is_in`` anti-mask with per-batch partial
    counts — a count-only anti-join, no shuffle, no row
    materialization.  Above the budget the edge routes through
    ``tabular.shuffle_semi_filter(anti=True)``: fact keys and dimension
    keys co-partition once and the orphan count folds per bucket — no
    dimension-order state on the driver.  Both routes are proven
    identical by pytest (``dim_budget=0`` forces the anti-join on every
    edge).  The edges are independent, so their executions OVERLAP in
    driver threads (the same second-driver-thread trick as the
    flagship's giant phase): wall time is the heaviest edge, not the
    sum of four.  Output: one row per edge."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.compute as pc

    from ..sources.io import corpus_num_rows
    from .tabular import shuffle_semi_filter

    def build_edge(edge):
        # plan construction stays on the main thread: concurrent
        # read_parquet calls race fsspec's lazy module import
        name, fact, fcol, dim, dcol = edge
        # metadata-only row count; works for single files AND shard
        # directories.  None (can't answer cheaply) routes to the
        # anti-join — the conservative choice for an unknown-size side.
        dim_rows = corpus_num_rows(os.path.join(sf_dir, f"{dim}.parquet"))
        if dim_rows is None:
            dim_rows = dim_budget + 1
        ds = read_table(sf_dir, fact, columns=[fcol], split=True)
        if dim_rows <= dim_budget:
            keys = read_table_arrow(sf_dir, dim, columns=[dcol])[dcol]
            kset = Broadcast(keys)

            def orphans(batch: pa.Table) -> pd.DataFrame:
                hit = pc.is_in(batch[fcol], value_set=kset.get())
                n = len(batch) - pc.sum(pc.cast(hit, pa.int64())).as_py()
                return pd.DataFrame({"n": [n]})

            return name, ds.map_batches(orphans, batch_format="pyarrow")
        # co-partitioned anti-join route (dimension outgrew the budget)
        dim_ds = read_table(sf_dir, dim, columns=[dcol], split=True).map_batches(
            lambda t, f=fcol: t.rename_columns([f]), batch_format="pyarrow"
        )
        orphan_rows = shuffle_semi_filter(ds, dim_ds, fcol, anti=True)
        return name, orphan_rows.map_batches(
            lambda t: pd.DataFrame({"n": [len(t)]}), batch_format="pyarrow"
        )

    prepared = [build_edge(e) for e in _FK_EDGES]
    with ThreadPoolExecutor(max_workers=len(prepared)) as pool:
        counts = list(pool.map(lambda p: int(p[1].sum("n") or 0), prepared))
    return pd.DataFrame(
        [{"fk": name, "n_orphans": n} for (name, _), n in zip(prepared, counts)]
    )


SQL_FK_AUDIT = """
SELECT 'orders->customer' AS fk,
       (SELECT count(*) FROM orders o WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT count(*) FROM lineitem l WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer c WHERE c.c_nationkey NOT IN (SELECT n_nationkey FROM nation))
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem l WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part))
"""


def q_media_decode_bmp(sf_dir: str):
    """REAL image decode round-trip: every document becomes a
    spec-conformant 24-bit BMP (dimensions derived from doc_id, pixels
    from the text bytes), and an actor-pool ImageDecodeStage parses the
    actual file format back (struct header walk + numpy pixel view —
    no codec library).  The SQL oracle recomputes the planted dimensions
    in closed form, so a header mis-parse of even one file fails the
    value gate.  Compressed formats keep the gated backend="real"."""
    from ..stages.multimodal import ImageDecodeStage, make_bmp

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        refs = [str(int(i)) for i in ids]
        payloads = [
            make_bmp(int(i) % 31 + 1, int(i) % 17 + 1, (t or " ").encode())
            for i, t in zip(ids, texts)
        ]
        return pa.Table.from_arrays(
            [
                pa.array(refs, type=pa.string()),
                pa.array(["image"] * len(refs), type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(
        ImageDecodeStage,
        fn_constructor_args=("bmp",),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_MEDIA_BMP = """
SELECT CAST(doc_id AS VARCHAR)        AS media_ref,
       CAST(doc_id % 31 + 1 AS BIGINT) AS width,
       CAST(doc_id % 17 + 1 AS BIGINT) AS height,
       CAST(3 AS BIGINT)               AS n_channels
FROM documents
"""


def q_media_decode_ppm(sf_dir: str):
    """REAL Netpbm P6 decode round-trip: every document becomes a
    spec-conformant binary PPM (header tokenizer handles arbitrary
    whitespace + comments; dims derived from doc_id, pixels from the
    text bytes) and the actor-pool ImageDecodeStage parses the actual
    format back.  Closed-form SQL oracle on the planted dimensions —
    a one-byte header mis-parse fails the value gate."""
    from ..stages.multimodal import ImageDecodeStage, make_ppm

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        refs = [str(int(i)) for i in ids]
        payloads = [
            make_ppm(int(i) % 29 + 1, int(i) % 13 + 1, (t or " ").encode())
            for i, t in zip(ids, texts)
        ]
        return pa.Table.from_arrays(
            [
                pa.array(refs, type=pa.string()),
                pa.array(["image"] * len(refs), type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(
        ImageDecodeStage,
        fn_constructor_args=("ppm",),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


SQL_MEDIA_PPM = """
SELECT CAST(doc_id AS VARCHAR)         AS media_ref,
       CAST(doc_id % 29 + 1 AS BIGINT) AS width,
       CAST(doc_id % 13 + 1 AS BIGINT) AS height,
       CAST(3 AS BIGINT)               AS n_channels
FROM documents
"""


def q_media_decode_wav(sf_dir: str):
    """REAL audio decode round-trip: every document becomes a PCM WAV
    (sample rate keyed off doc_id, one int16 sample per character) and
    an actor-pool AudioDecodeStage parses the RIFF container back via
    the stdlib ``wave`` module.  Oracle recomputes rate/sample counts/
    duration in closed form; the RMS column is pytest-covered
    (tests/test_multimodal.py) and projected out here."""
    from ..stages.multimodal import AudioDecodeStage, make_wav

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"], split=True)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        lens = batch["n_chars"].to_numpy(zero_copy_only=False)
        refs, payloads = [], []
        for i, n in zip(ids, lens):
            rate = 8000 + (int(i) % 8) * 1000
            samples = ((np.arange(int(n)) % 256 - 128) * 8).astype(np.int16)
            payloads.append(make_wav(rate, samples))
            refs.append(str(int(i)))
        return pa.Table.from_arrays(
            [
                pa.array(refs, type=pa.string()),
                pa.array(["audio"] * len(refs), type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    decoded = media.map_batches(
        AudioDecodeStage,
        fn_constructor_args=("wav",),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return decoded.select_columns(
        ["media_ref", "n_channels", "sample_rate", "n_samples", "duration_ms"]
    )


SQL_MEDIA_WAV = """
SELECT CAST(doc_id AS VARCHAR) AS media_ref,
       CAST(1 AS BIGINT)       AS n_channels,
       CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) AS sample_rate,
       CAST(n_chars AS BIGINT) AS n_samples,
       CAST(floor(n_chars * 1000.0 / (8000 + (doc_id % 8) * 1000)) AS BIGINT) AS duration_ms
FROM documents
"""


def q_pretokenize_corpus(sf_dir: str):
    """The full make-a-training-set composition: curate (repetition
    filter → benchmark decontamination → exact dedup → per-source cap)
    → train a BPE tokenizer ON THE SURVIVORS → encode them → pack the
    BPE token stream into 512-token training sequences.

    Every stage is an already-oracled operator (`curate_corpus`,
    `bpe_train`, `bpe_encode`, `pack_sequences`); this query pins the
    end-to-end contract a user actually runs.  Rows-only (iterative BPE
    inside); the curation prefix is value-oracled via `curate_corpus`
    and the encoder via tests/test_bpe.py."""
    from ..stages.bpe import bpe_train, encode_stage_task
    from ..stages.curation import benchmark_gram_set, filter_by_repetition, mark_contaminated
    from ..stages.scan import pack_sequences
    from .tabular import top_k_per_group

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def bench_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0))

    def corpus_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0))

    grams = benchmark_gram_set(ds.map_batches(bench_only, batch_format="pyarrow"), n=8)
    corpus = ds.map_batches(corpus_only, batch_format="pyarrow")
    quality = filter_by_repetition(
        corpus, min_distinct_ratio=_CURATE_MIN_DR, max_top_bigram_frac=_CURATE_MAX_TBF
    )
    clean = mark_contaminated(quality, grams, n=8, keep_clean=True)
    deduped = top_k_per_group(clean, "text", "doc_id", 1)
    capped = top_k_per_group(deduped, "source", "doc_id", _CURATE_CAP).materialize()

    merges = bpe_train(capped, num_merges=12)
    bc = Broadcast(list(zip(merges["left"].astype(str), merges["right"].astype(str))))
    encoded = capped.map_batches(
        lambda b: encode_stage_task(b, bc, "text", ("source",)),
        batch_format="pyarrow",
    )
    counted = encoded.select_columns(["doc_id", "source", "n_tokens"]).rename_columns(
        ["doc_id", "source", "n_tok"]
    )

    import os as _os

    import pyarrow.parquet as pq

    meta = pq.ParquetFile(_os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    return pack_sequences(counted, _PACK_BUDGET, max_order=int(max_id))


def q_grouped_mode(sf_dir: str):
    """Most-frequent value per group (mode with deterministic low-value
    tiebreak): the two-level count shape — per-batch partial (group,
    value) counts, one groupby-sum, then top-1 per group by (count desc,
    value asc).  Only (group, value, count) triples ever shuffle."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
            }
        )
        return df.value_counts(["user_id", "event_type"]).reset_index(name="c")

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"],
        {"c": ("sum", "c")},
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy(zero_copy_only=False) % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "c", "event_type"], ascending=[True, False, True], kind="stable"
        )
        out = df.groupby("user_id", sort=False).head(1)
        return out[["user_id", "event_type", "c"]].rename(
            columns={"event_type": "mode_event", "c": "mode_count"}
        )

    return (
        counts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: top1(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_GROUPED_MODE = """
SELECT user_id, event_type AS mode_event, c AS mode_count FROM (
  SELECT user_id, event_type, count(*) AS c,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def q_dense_rank(sf_dir: str):
    """dense_rank of each customer's orders by price within the
    customer (ties share a rank, no gaps) — the bucketed ordered-scan
    window shape; the in-bucket pass is one vectorized pandas
    ``rank(method='dense')`` per bucket."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def dense(df: pd.DataFrame) -> pd.DataFrame:
        df["price_rank"] = (
            df.groupby("o_custkey", sort=False)["o_totalprice"]
            .rank(method="dense", ascending=False)
            .astype(np.int64)
        )
        return df[["o_orderkey", "o_custkey", "price_rank"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: dense(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_DENSE_RANK = """
SELECT o_orderkey, o_custkey,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT)
         AS price_rank
FROM orders
"""


def q_salted_join(sf_dir: str):
    """Hot-key-salted shuffle join (tabular.salted_join): documents ⋈
    per-source counts on `source` — a handful of distinct sources each
    owning a huge share of rows, i.e. EVERY key is hot and an unsalted
    hash exchange would serialize on ~|sources| buckets.  Hot left rows
    spread round-robin over 8 salts, the small side replicates per
    salt, and the join runs on (source, salt) with an identical result
    set.  The hot set comes free from the dim counts this query already
    computes (the general one-pass detector, `tabular.detect_hot_keys`
    via Misra-Gries, is for joins whose small side isn't a count
    table); passing it explicitly drops a whole corpus scan."""
    import ray.data as rd

    from .tabular import grouped_aggregate, salted_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"], split=True)
    dim = grouped_aggregate(docs, ["source"], {"n_docs": ("count", None)}).to_pandas()
    total = int(dim["n_docs"].sum())
    hot = dim.loc[dim["n_docs"] >= 0.05 * total, "source"].tolist()
    return salted_join(docs, rd.from_pandas(dim), "source", salts=8, hot_keys=hot)


SQL_SALTED_JOIN = """
SELECT d.doc_id, d.source, s.n_docs
FROM documents d
JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source) s USING (source)
"""


def q_window_lead_cume(sf_dir: str):
    """lead() and cume_dist() per partition — completes the window
    family (row_number / rank / dense_rank / percent_rank / ntile /
    lag / lead / first_value / cume_dist).  Same bucketed ordered-scan
    shape; the in-bucket pass is one vectorized shift(-1) and
    rank(method='max')/n per customer."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"], kind="stable")
        g = df.groupby("o_custkey", sort=False)
        df["next_price"] = g["o_totalprice"].shift(-1)
        df["cume"] = g["o_totalprice"].rank(method="max") / g["o_totalprice"].transform("size")
        return df[["o_orderkey", "o_custkey", "next_price", "cume"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: win(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_WINDOW_LEAD_CUME = """
SELECT o_orderkey, o_custkey,
       lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         AS next_price,
       cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cume
FROM orders
"""


def q_rank_gaps(sf_dir: str):
    """rank() (ties share a rank, gaps after) plus first_value per
    partition — same bucketed ordered-scan shape as `dense_rank`; the
    in-bucket pass is vectorized ``rank(method='min')`` and a grouped
    ``transform('max')`` for the partition's top price."""
    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def rank_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False)
        df["price_rank"] = g["o_totalprice"].rank(method="min", ascending=False).astype(np.int64)
        df["top_price"] = g["o_totalprice"].transform("max")
        return df[["o_orderkey", "o_custkey", "price_rank", "top_price"]]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: rank_min(df.drop(columns=["bucket"])), batch_format="pandas")
    )


SQL_RANK_GAPS = """
SELECT o_orderkey, o_custkey,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT)
         AS price_rank,
       first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
         AS top_price
FROM orders
"""


_GRANK_BUCKETS = 64


def q_global_rank(sf_dir: str):
    """Global dense enumeration (row_number over the WHOLE table ordered
    by price desc, orderkey asc) — the TeraSort range-partition shape:

    1. one tiny aggregate finds the key range;
    2. every row maps to a range bucket (vectorized searchsorted);
    3. per-batch partial bucket counts reduce to a 64-row table whose
       descending prefix sum yields each bucket's global rank offset
       (broadcast back);
    4. one shuffle co-locates each bucket; an in-bucket vectorized sort
       assigns rank = offset + local position.

    Rows cross the wire exactly once and the driver only ever sees
    64 counts.  At web scale the linspace boundaries become sampled
    quantiles (the skew-proof variant); ties are impossible across
    buckets (equal keys share a bucket) and break deterministically
    inside (orderkey asc)."""
    from ray.data.aggregate import Max, Min

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"], split=True)
    rng = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"))
    lo, hi = rng["min(o_totalprice)"], rng["max(o_totalprice)"]
    bounds = np.linspace(lo, hi, _GRANK_BUCKETS + 1)[1:-1]  # interior boundaries

    def bucket_of(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, p, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.map_batches(bucket_of, batch_format="pyarrow")

    counts = (
        bucketed.map_batches(
            lambda t: pd.DataFrame(
                {"bucket": pd.Series(t["bucket"].to_numpy(zero_copy_only=False)).value_counts().index,
                 "n": pd.Series(t["bucket"].to_numpy(zero_copy_only=False)).value_counts().to_numpy()}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("bucket")["n"]
        .sum()
    )
    # rank is price-DESC: the highest bucket starts at offset 0
    full = counts.reindex(range(_GRANK_BUCKETS), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full[::-1])[:-1]])[::-1]  # per-bucket start
    off_bc = Broadcast(offsets)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        df = df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True], kind="stable")
        df["rank"] = off_bc.get()[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["o_orderkey", "o_totalprice", "rank"]]

    return (
        bucketed.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")
    )


SQL_GLOBAL_RANK = """
SELECT o_orderkey, o_totalprice,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
FROM orders
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_triangle_count(sf_dir: str):
    """Distributed triangle count (stages/graph.triangle_count) over an
    SQL-derivable graph: edges (i, i+1) and (i, i+2) gated by two
    independent md5 coins, so chains-with-skips create genuine
    triangles at {i, i+1, i+2}.  The engine runs the generic two-join
    plan (wedge enumeration via a co-partitioned self-join, closure via
    the bucketed semi-join — nothing reaches the driver but the
    scalar); the oracle recomputes the same count with a three-way SQL
    self-join.  Value-oracled end-to-end."""
    from ..stages.graph import triangle_count
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    max_id = read_table_arrow(sf_dir, "documents", columns=["doc_id"])["doc_id"]
    max_id = int(pa.compute.max(max_id).as_py())
    thr = "8" + "0" * 31

    def coin_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        c1 = md5_lt_mask(batch["doc_id"], thr) & (ids + 1 <= max_id)
        shifted = pa.array(ids + 1_000_000)
        c2 = md5_lt_mask(shifted, thr) & (ids + 2 <= max_id)
        return pa.table(
            {
                "src": pa.array(np.r_[ids[c1], ids[c2]]),
                "dst": pa.array(np.r_[ids[c1] + 1, ids[c2] + 2]),
            }
        )

    edges = ds.map_batches(coin_edges, batch_format="pyarrow")
    return pd.DataFrame({"n_triangles": [triangle_count(edges)]})


SQL_TRIANGLE_COUNT = """
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
e1 AS (
  SELECT doc_id AS a, doc_id + 1 AS b FROM documents, mx
  WHERE md5(CAST(doc_id AS VARCHAR)) < '80000000000000000000000000000000'
    AND doc_id + 1 <= m
),
e2 AS (
  SELECT doc_id AS a, doc_id + 2 AS b FROM documents, mx
  WHERE md5(CAST(doc_id + 1000000 AS VARCHAR)) < '80000000000000000000000000000000'
    AND doc_id + 2 <= m
),
e AS (SELECT a, b FROM e1 UNION SELECT a, b FROM e2)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e x JOIN e y ON y.a = x.b JOIN e z ON z.a = x.a AND z.b = y.b
"""


_KCORE_K = 2
_KCORE_ROUNDS = 6
_KCORE_MIN_ORDERS = 2  # same edge rule as clustering_coeff

#: node count above which k-core peeling keeps the alive set a Dataset
#: (per-round co-partitioned semi-joins) instead of a driver fold
KCORE_NODE_BUDGET = 5_000_000


def q_kcore_members(sf_dir: str):
    return _kcore_members(sf_dir)


def _kcore_members(sf_dir: str, *, node_budget: int = KCORE_NODE_BUDGET):
    """k-core decomposition of the co-purchase graph (parts as nodes,
    edge = bought together in ≥ 2 orders): repeatedly peel nodes of
    degree < k — the classic community-density filter (Seidman 1983)
    used to isolate a graph's cohesive core, and the graph analogue of
    a quality gate.  Fixed ``_KCORE_ROUNDS`` peel rounds (both engines
    run exactly this many, so an unconverged graph still compares
    bit-exactly), then one final degree pass filtered to ≥ k; output
    is (part, core_deg) for the surviving core.

    Routing, same template as ``stages/graph.pagerank``: at or under
    ``node_budget`` nodes the removed-set lives on the driver and each
    round is one streaming degree fold (per-batch partials, bounded by
    the node domain); above it the alive set stays a Dataset and each
    round is two co-partitioned ``shuffle_semi_filter``s + one
    open-domain degree fold — no node-order state on the driver.
    Both routes are proven identical by pytest (``node_budget=0``
    forces the distributed peel).  Pure-int pipeline."""
    import pyarrow.compute as pc

    from .tabular import shuffle_semi_filter

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(columns={"l_partkey_a": "a", "l_partkey_b": "b", "size": "n"})
        )

    folded = grouped_aggregate(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: pairs(df.drop(columns=["__bucket"])), batch_format="pandas"),
        ["a", "b"],
        {"n": ("sum", "n")},
    )
    edges = folded.map_batches(
        lambda df: df[df["n"] >= _KCORE_MIN_ORDERS][["a", "b"]],
        batch_format="pandas",
    ).materialize()

    k = _KCORE_K

    def deg_partial_all(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat(
            [df[["a"]].rename(columns={"a": "node"}),
             df[["b"]].rename(columns={"b": "node"})]
        )
        return both.value_counts(["node"]).reset_index(name="d")

    n_nodes = int(
        grouped_aggregate(
            edges.map_batches(deg_partial_all, batch_format="pandas"),
            ["node"],
            {"d": ("sum", "d")},
        ).count()
    )

    if n_nodes <= node_budget:
        # driver-fold peel: removed set is node-bounded by construction
        removed: np.ndarray = np.array([], dtype=np.int64)
        deg = None
        for _ in range(_KCORE_ROUNDS + 1):  # final pass = the output degree
            gone = Broadcast(pa.array(removed, type=pa.int64()))

            def alive_deg(batch: pa.Table) -> pd.DataFrame:
                keep = pc.and_(
                    pc.invert(pc.is_in(batch["a"], value_set=gone.get())),
                    pc.invert(pc.is_in(batch["b"], value_set=gone.get())),
                )
                df = batch.filter(keep).to_pandas()
                return deg_partial_all(df)

            got = edges.map_batches(alive_deg, batch_format="pyarrow").to_pandas()
            deg = (
                got.groupby("node")["d"].sum()
                if len(got)
                else pd.Series([], dtype=np.int64)
            )
            low = deg[deg < k].index.to_numpy(dtype=np.int64)
            if len(low) == 0:
                break  # fixpoint — further rounds are no-ops on both engines
            removed = np.concatenate([removed, low])
        core = deg[deg >= k]
        out = pd.DataFrame(
            {"part": core.index.to_numpy(dtype=np.int64),
             "core_deg": core.to_numpy(dtype=np.int64)}
        )
        return out.sort_values("part").reset_index(drop=True)

    # distributed peel (node domain outgrew the driver): alive stays a
    # Dataset; each round = 2 co-partitioned semi-joins + 1 degree fold
    def dist_deg(alive_edges):
        return grouped_aggregate(
            alive_edges.map_batches(deg_partial_all, batch_format="pandas"),
            ["node"],
            {"core_deg": ("sum", "d")},
        )

    alive_edges = edges
    for _ in range(_KCORE_ROUNDS):
        deg_ds = dist_deg(alive_edges).materialize()
        alive_nodes = deg_ds.filter(expr=f"core_deg >= {k}").select_columns(["node"]).materialize()
        if deg_ds.filter(expr=f"core_deg < {k}").count() == 0:
            break
        alive_edges = shuffle_semi_filter(
            shuffle_semi_filter(
                alive_edges.map_batches(
                    lambda t: t.rename_columns(["node", "b"]), batch_format="pyarrow"
                ),
                alive_nodes,
                "node",
            ).map_batches(
                lambda t: t.rename_columns(["a", "node"]), batch_format="pyarrow"
            ),
            alive_nodes,
            "node",
        ).map_batches(
            lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
        ).materialize()
    final = dist_deg(alive_edges).filter(expr=f"core_deg >= {k}").to_pandas()
    return (
        final.rename(columns={"node": "part"})
        .astype({"part": np.int64, "core_deg": np.int64})
        .sort_values("part")
        .reset_index(drop=True)
    )


def _kcore_sql() -> str:
    k, rounds = _KCORE_K, _KCORE_ROUNDS
    head = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_KCORE_MIN_ORDERS}
),
und AS MATERIALIZED (SELECT a AS s, b AS t FROM e UNION ALL SELECT b, a FROM e),
alive0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM und)"""
    parts = []
    for r in range(1, rounds + 2):  # the (rounds+1)th degree pass is the output
        p = r - 1
        parts.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT u.s AS node, count(*) AS deg FROM und u
  JOIN alive{p} x ON u.s = x.node JOIN alive{p} y ON u.t = y.node
  GROUP BY 1
),
alive{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})"""
        )
    tail = f"""
SELECT CAST(node AS BIGINT) AS part, CAST(deg AS BIGINT) AS core_deg
FROM d{rounds + 1} WHERE deg >= {k} ORDER BY part"""
    return head + "".join(parts) + tail


SQL_KCORE = _kcore_sql()


_WEEK_US = 7 * 86400 * 10**6


def q_cohort_retention(sf_dir: str):
    """Cohort retention triangle: users grouped by first-activity week,
    counted at every later activity week offset — the
    did-they-come-back table behind every retention dashboard.

    Shape: ONE exchange.  Per-batch distinct (user, week) pairs (the
    batch is the combiner) hash-bucket on user_id; inside each bucket
    every user's full week history is co-located, so one vectorized
    pandas pass computes the cohort (per-user min), the offsets, and
    the in-bucket partial counts; the final reduce is the
    bounded-domain ``small_keys`` fold, since the (cohort, offset)
    grid is a calendar property, not a data-size one.  (The naive plan
    — pair dedupe, cohort groupby, pairs⨝cohorts join, final count —
    is four all-to-alls; this is the same answer in one.)"""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        t = pa.table({"user_id": batch["user_id"], "week": pa.array(ts // _WEEK_US)})
        g = pa.TableGroupBy(t, ["user_id", "week"]).aggregate([])
        b = (g["user_id"].to_numpy(zero_copy_only=False) % 64).astype(np.int32)
        return g.append_column("bucket", pa.array(b))

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "week"])
        cohort = df.groupby("user_id")["week"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_week": cohort.to_numpy(dtype=np.int64),
                "week_offset": (df["week"] - cohort).to_numpy(dtype=np.int64),
            }
        )
        return out.groupby(["cohort_week", "week_offset"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: bucket_counts(df.drop(columns=["bucket"])), batch_format="pandas")
    )
    out = grouped_aggregate(
        partials,
        ["cohort_week", "week_offset"],
        {"n_users": ("sum", "n")},
        small_keys=True,
    )
    return out.to_pandas().sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
), c AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks per user
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_event_islands(sf_dir: str):
    """Gaps-and-islands (consecutive-day activity streaks per user) —
    the classic row_number-difference trick, distributed: within a
    user's sorted distinct active days, ``day_index - rank`` is constant
    exactly along a consecutive run, so that anchor IS the island id.

    Shape: each batch collapses to its distinct (user, day) pairs (a
    combiner — bounded by users×days, not events), ONE coarse shuffle
    on ``user_id % 32`` co-locates each user, and the in-bucket pass is
    a vectorized sort + cumcount + two groupbys.  Event rows never
    shuffle; a user's state is bounded by their active-day count."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def day_pairs(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False), "day": us // _DAY_US}
        ).drop_duplicates()
        df["__bucket"] = (df["user_id"] % 32).astype(np.int32)
        return df

    def islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"], kind="stable")
        rn = df.groupby("user_id", sort=False).cumcount()
        runs = (
            df.assign(anchor=df["day"].to_numpy() - rn.to_numpy())
            .groupby(["user_id", "anchor"], sort=False)
            .size()
            .reset_index(name="len")
        )
        out = (
            runs.groupby("user_id", sort=False)
            .agg(n_islands=("len", "size"), longest_streak=("len", "max"), active_days=("len", "sum"))
            .reset_index()
        )
        for c in ("n_islands", "longest_streak", "active_days"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: islands(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_EVENT_ISLANDS = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
runs AS (
  SELECT user_id,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
  FROM days
),
islands AS (SELECT user_id, anchor, count(*) AS len FROM runs GROUP BY 1, 2)
SELECT user_id,
       CAST(count(*) AS BIGINT)  AS n_islands,
       CAST(max(len) AS BIGINT)  AS longest_streak,
       CAST(sum(len) AS BIGINT)  AS active_days
FROM islands GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Time-spine gap fill: materialize missing buckets, forward-fill values
# ---------------------------------------------------------------------------

_GAPFILL_BUCKET_US = 3_600_000_000


def q_time_gap_fill(sf_dir: str):
    """Time-spine gap fill (the resample-then-ffill staple): hourly
    sum(value), with every MISSING hour between the observed min and max
    materialized and forward-filled from the last present bar.

    Shape: per-batch partials are one row per PRESENT hour — the hour
    domain is bounded by the time range, not the data size (the same
    bounded-domain argument as ``grouped_aggregate(small_keys=True)``)
    — so the final spine build is one vectorized ``reindex + ffill``
    over the coalesced partial set.  Event rows never shuffle."""
    ds = read_table(sf_dir, "events", columns=["ts", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        df = pd.DataFrame(
            {"h": (us // _GAPFILL_BUCKET_US) * _GAPFILL_BUCKET_US,
             "v": batch["value"].to_numpy(zero_copy_only=False)}
        )
        return df.groupby("h", sort=False)["v"].sum().reset_index()

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h")["v"].sum()
        idx = np.arange(g.index.min(), g.index.max() + _GAPFILL_BUCKET_US, _GAPFILL_BUCKET_US)
        s = g.reindex(idx)
        return pd.DataFrame(
            {
                "h": idx.view("datetime64[us]"),
                "value_filled": s.ffill().round(2).to_numpy(),
                "was_gap": s.isna().to_numpy(),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fill, batch_format="pandas")
    )


SQL_TIME_GAP_FILL = """
WITH hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS h, sum(value) AS v
  FROM events GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series((SELECT min(h) FROM hourly),
                                (SELECT max(h) FROM hourly),
                                INTERVAL '1 hour')) AS h
),
j AS (SELECT s.h, v FROM spine s LEFT JOIN hourly USING (h))
SELECT h,
       round(last_value(v IGNORE NULLS) OVER (
             ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS value_filled,
       (v IS NULL) AS was_gap
FROM j
"""


# ---------------------------------------------------------------------------
# Pairwise Pearson correlation matrix from one pass of moment partials
# ---------------------------------------------------------------------------

_CORR_PAIRS = [
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
]


def q_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlations across numeric columns in ONE
    streaming pass: each batch emits fixed-width moment partials
    (n, Σx, Σy, Σxx, Σyy, Σxy per pair — six numbers per pair per
    batch), the tiny partial table reduces, and corr finalizes from the
    merged moments.  No shuffle of fact rows ever; the driver holds
    6·|pairs| floats regardless of corpus size.  Rounded to 6 on both
    sides (float policy)."""
    cols = sorted({c for p in _CORR_PAIRS for c in p})
    ds = read_table(sf_dir, "lineitem", columns=cols, split=True)

    def moments(batch: pa.Table) -> pd.DataFrame:
        arr = {c: batch[c].to_numpy(zero_copy_only=False) for c in cols}
        rows = []
        for cx, cy in _CORR_PAIRS:
            x, y = arr[cx], arr[cy]
            rows.append(
                {
                    "col_x": cx, "col_y": cy, "n": float(len(x)),
                    "sx": x.sum(), "sy": y.sum(),
                    "sxx": (x * x).sum(), "syy": (y * y).sum(), "sxy": (x * y).sum(),
                }
            )
        return pd.DataFrame(rows)

    merged = grouped_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["col_x", "col_y"],
        {k: ("sum", k) for k in ("n", "sx", "sy", "sxx", "syy", "sxy")},
        small_keys=True,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy()
        cov = n * df["sxy"].to_numpy() - df["sx"].to_numpy() * df["sy"].to_numpy()
        vx = n * df["sxx"].to_numpy() - df["sx"].to_numpy() ** 2
        vy = n * df["syy"].to_numpy() - df["sy"].to_numpy() ** 2
        # constant-column parity: DuckDB corr() NULLs when either
        # variance is 0; numpy raw division would emit ±inf
        ok = (vx > 0) & (vy > 0)
        corr = np.where(ok, cov / np.sqrt(np.where(ok, vx * vy, 1.0)), np.nan)
        return pd.DataFrame(
            {
                "col_x": df["col_x"], "col_y": df["col_y"],
                "corr": np.round(corr, 6),
                "n": n.astype(np.int64),
            }
        )

    return merged.map_batches(finalize, batch_format="pandas")


SQL_CORR_MATRIX = " UNION ALL ".join(
    f"""SELECT '{cx}' AS col_x, '{cy}' AS col_y,
               round(corr({cx}, {cy}), 6) AS corr,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem"""
    for cx, cy in _CORR_PAIRS
)


# ---------------------------------------------------------------------------
# Cross-document exact n-gram dedup (ExactSubstr flavor)
# ---------------------------------------------------------------------------

_SPAN_NGRAM = 8
_SPAN_KEEP_FRAC = 0.5


def q_ngram_span_dedup(sf_dir: str):
    """Cross-document exact n-gram duplication audit — the ExactSubstr
    family (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): an 8-token shingle present in ≥2 DISTINCT
    documents is duplicated text; per document report its distinct
    shingle count, how many are cross-doc duplicated, the duplicated
    fraction, and a keep/drop decision (drop when >50% duplicated).

    Shape: the tokenize stage emits distinct (doc, shingle) pairs
    pre-bucketed by a stable shingle hash; ONE co-partition on the
    bucket computes BOTH the ≥2-doc document frequency and the per-doc
    dup counts inside each bucket (no join-back exchange — a shingle
    lives in exactly one bucket, so in-bucket df is global df); per-doc
    partials then reduce through the standard sort-aggregate.  At
    100 TB the shuffled key becomes a 128-bit content hash (16 bytes,
    collision P≪1e-15) instead of the raw shingle string — here the
    raw shingle keeps the DuckDB oracle exact.  Zero-shingle docs
    (<8 tokens) ride along as null-shingle markers so the output covers
    every document without a second scan."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_doc: list[int] = []
        out_sh: list[str | None] = []
        for did, text in zip(doc_ids, texts):
            toks = text.split()
            if len(toks) < _SPAN_NGRAM:
                out_doc.append(did)
                out_sh.append(None)
                continue
            seen = {
                " ".join(toks[i : i + _SPAN_NGRAM])
                for i in range(len(toks) - _SPAN_NGRAM + 1)
            }
            out_doc.extend([did] * len(seen))
            out_sh.extend(seen)
        df = pd.DataFrame({"doc_id": out_doc, "s": out_sh})
        h = pd.util.hash_array(df["s"].fillna("").to_numpy(dtype=object))
        df["__bucket"] = np.where(df["s"].isna(), -1, (h % 64).astype(np.int64))
        return df

    def bucket_df(df: pd.DataFrame) -> pd.DataFrame:
        nulls = df["s"].isna()
        zero = df.loc[nulls, ["doc_id"]].drop_duplicates().assign(n_sh=0, n_dup=0)
        body = df.loc[~nulls].drop_duplicates(["doc_id", "s"])
        if len(body) == 0:
            return zero
        ndocs = body.groupby("s", sort=False)["doc_id"].transform("size")
        per = body.assign(dup=(ndocs >= 2).astype(np.int64)).groupby("doc_id", sort=False)
        counts = per.agg(n_sh=("s", "size"), n_dup=("dup", "sum")).reset_index()
        return pd.concat([counts, zero], ignore_index=True)

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: bucket_df(df.drop(columns=["__bucket"])), batch_format="pandas")
    )

    # Per-doc reduce: coarse doc-hash buckets + one vectorized pandas
    # sum per bucket (Ray's generic Aggregate combine is per-group
    # Python — measured 400 rows/s on this partial set; this shape is
    # the same exchange volume at >100x the reduce speed).
    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__b2"] = (df["doc_id"].to_numpy() % 64).astype(np.int32)
        return df

    def doc_sum(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", as_index=False, sort=False)
            .agg(n_shingles=("n_sh", "sum"), n_dup_shingles=("n_dup", "sum"))
        )

    per_doc = (
        partials.map_batches(doc_bucket, batch_format="pandas")
        .groupby("__b2")
        .map_groups(lambda df: doc_sum(df.drop(columns=["__b2"])), batch_format="pandas")
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_shingles"].to_numpy().astype(np.int64)
        d = df["n_dup_shingles"].to_numpy().astype(np.int64)
        frac = np.where(n == 0, 0.0, d / np.where(n == 0, 1, n))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_shingles": n,
                "n_dup_shingles": d,
                "dup_frac": frac,
                "keep": frac <= _SPAN_KEEP_FRAC,
            }
        )

    return per_doc.map_batches(finalize, batch_format="pandas")


SQL_NGRAM_SPAN_DEDUP = f"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS t
  FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - {_SPAN_NGRAM - 1}, 0))) AS i
  FROM toks
),
pairs AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i + {_SPAN_NGRAM - 1}], ' ') AS s FROM idx
),
freq AS (SELECT s, count(*) AS ndocs FROM pairs GROUP BY s),
perdoc AS (
  SELECT p.doc_id,
         count(*) AS n_sh,
         count(*) FILTER (WHERE f.ndocs >= 2) AS n_dup
  FROM pairs p JOIN freq f USING (s)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_sh, 0) AS BIGINT)  AS n_shingles,
       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_shingles,
       CASE WHEN coalesce(n_sh, 0) = 0 THEN 0.0
            ELSE CAST(n_dup AS DOUBLE) / n_sh END AS dup_frac,
       (CASE WHEN coalesce(n_sh, 0) = 0 THEN 0.0
             ELSE CAST(n_dup AS DOUBLE) / n_sh END) <= {_SPAN_KEEP_FRAC} AS keep
FROM (SELECT doc_id FROM documents) d LEFT JOIN perdoc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Markov transition counts / interval-union coverage / debounce
# ---------------------------------------------------------------------------


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event streams
    (prev_type → type in (ts, event_id) order) — the behavioral-model
    fit primitive.  One coarse user-hash exchange; in-bucket the lag is
    a vectorized groupby shift; the (from, to) count domain is
    |types|², so the final fold is the bounded-domain fast path."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        out = (
            df.assign(from_type=prev)
            .dropna(subset=["from_type"])
            .groupby(["from_type", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out.rename(columns={"event_type": "to_type"})

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: transitions(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    out = grouped_aggregate(
        counted, ["from_type", "to_type"], {"n_transitions": ("sum", "n")}, small_keys=True
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        df["n_transitions"] = df["n_transitions"].astype(np.int64)
        return df

    return out.map_batches(typed, batch_format="pandas")


SQL_EVENT_TRANSITIONS = """
WITH lagged AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
FROM lagged WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
"""


_COVER_LEN_US = 1_800_000_000  # each event covers [ts, ts+30min)


def q_interval_coverage(sf_dir: str):
    """Interval-union coverage (sweep line): give each event a 30-minute
    activity window and report, per user, total covered µs with overlaps
    merged plus the merged-interval count.  The classic gaps-and-islands
    on intervals: after the per-user sort, an interval starts a new
    island exactly when its start exceeds the running max of prior ends
    — one vectorized cummax per bucket.  Same coarse user-hash exchange
    as sessionize; event rows shuffle once."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "s": us,
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def coverage(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "s"], kind="stable")
        e = df["s"] + _COVER_LEN_US
        run_end = e.groupby(df["user_id"], sort=False).cummax()
        prev_end = run_end.groupby(df["user_id"], sort=False).shift(1)
        new_island = prev_end.isna() | (df["s"] > prev_end)
        island = new_island.groupby(df["user_id"], sort=False).cumsum()
        g = (
            pd.DataFrame({"user_id": df["user_id"], "island": island, "s": df["s"], "e": e})
            .groupby(["user_id", "island"], sort=False)
            .agg(start=("s", "min"), end=("e", "max"))
            .reset_index()
        )
        out = (
            g.assign(length=g["end"] - g["start"])
            .groupby("user_id", sort=False)
            .agg(covered_us=("length", "sum"), n_intervals=("length", "size"))
            .reset_index()
        )
        out["covered_us"] = out["covered_us"].astype(np.int64)
        out["n_intervals"] = out["n_intervals"].astype(np.int64)
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: coverage(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_INTERVAL_COVERAGE = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_COVER_LEN_US} AS e FROM events
),
marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY s, e) = 1
                               THEN 1 ELSE 0 END END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
merged AS (
  SELECT user_id, island, max(e) - min(s) AS length FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(sum(length) AS BIGINT) AS covered_us,
       CAST(count(*) AS BIGINT)    AS n_intervals
FROM merged GROUP BY user_id
"""


_DEBOUNCE_US = 300_000_000  # 5 minutes


def q_debounce_events(sf_dir: str):
    """Debounce filter: drop an event when the same user fired the same
    event_type less than 5 minutes earlier (lag-based throttle — the
    dedupe-bursts preprocessing step for clickstreams).  One coarse
    exchange on user hash; in-bucket one vectorized groupby shift."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["user_id"].to_numpy() % 32).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def debounce(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = df.assign(__us=us).sort_values(["user_id", "event_type", "__us", "event_id"], kind="stable")
        prev = df.groupby(["user_id", "event_type"], sort=False)["__us"].shift(1)
        keep = prev.isna() | (df["__us"] - prev >= _DEBOUNCE_US)
        out = df.loc[keep, ["event_id", "user_id", "ts", "event_type"]]
        return out

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: debounce(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_DEBOUNCE_EVENTS = f"""
WITH lagged AS (
  SELECT event_id, user_id, ts, event_type,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                 ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
SELECT event_id, user_id, ts, event_type
FROM lagged
WHERE prev_us IS NULL OR epoch_us(ts) - prev_us >= {_DEBOUNCE_US}
"""


def q_pca_project(sf_dir: str):
    """Distributed PCA projection (stages/clustering.pca_project): one
    streaming moment pass fits mean + top-2 components (driver holds
    d(d+1)+1 floats, eigh is O(d^3) on the d×d covariance), then the
    projection streams with a (k+1)·d broadcast.  Rows-only (no SQL
    eigendecomposition); numpy-parity pytest covers the values."""
    from ..stages.clustering import pca_project

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    return pca_project(ds, n_components=2)


# ---------------------------------------------------------------------------
# Market-basket / statistical-testing / drift / graph-traversal family
# ---------------------------------------------------------------------------

_COPURCHASE_MIN_ORDERS = 2


def q_copurchase_pairs(sf_dir: str):
    """Market-basket pair counts: parts that appear together in the same
    order, with support ≥ 2 orders — the pairwise A-Priori candidate
    step of frequent-itemset mining (and the co-occurrence primitive
    behind item-item recommenders).

    ONE exchange on order-key hash co-locates each order's lines; the
    in-bucket pair expansion is a vectorized self-merge whose fan-out
    is bounded by lines-per-order² (≤ ~12² here — the A-Priori
    assumption that baskets are small while the catalog is huge), and
    the open-domain (part, part) counts fold through
    ``grouped_aggregate``'s coarse-bucket columnar reduce.  Pure-int
    pipeline — deterministic at any scale."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(columns={"l_partkey_a": "part_a", "l_partkey_b": "part_b", "size": "n"})
        )

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: pairs(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    folded = grouped_aggregate(
        counted, ["part_a", "part_b"], {"n_orders": ("sum", "n")}
    )

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_orders"] >= _COPURCHASE_MIN_ORDERS]
        return df.assign(n_orders=df["n_orders"].astype(np.int64))

    return folded.map_batches(keep, batch_format="pandas")


SQL_COPURCHASE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {_COPURCHASE_MIN_ORDERS}
"""


_AB_THR = "8" + "0" * 31  # md5(user_id) < this hex → arm A (≈50/50)


def q_ab_ttest(sf_dir: str):
    """A/B experiment readout with Welch's t-statistic per metric: users
    split into two arms by the same deterministic md5-threshold device
    as ``hash_split_counts`` (no assignment table to join — the split
    is recomputable on every node), event ``value`` is the metric,
    ``event_type`` the metric family.

    One streaming pass reduces exact integer-cent moment partials
    (n, Σc, Σc²) per (metric, arm) — six int64s per metric, immune to
    accumulation order — and the Welch algebra runs driver-side on the
    tiny moment table with the SAME operation sequence as the SQL
    mirror, so the floats are bit-identical before rounding."""
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "value"], split=True)

    def moments(batch: pa.Table) -> pd.DataFrame:
        arm_a = md5_lt_mask(batch["user_id"].cast(pa.string()), _AB_THR)
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "arm": np.where(arm_a, 0, 1),
                "c": cents,
                "cc": cents * cents,
            }
        )
        g = df.groupby(["event_type", "arm"], as_index=False).agg(
            n=("c", "count"), s=("c", "sum"), ss=("cc", "sum")
        )
        return g

    stats = (
        grouped_aggregate(
            ds.map_batches(moments, batch_format="pyarrow"),
            ["event_type", "arm"],
            {"n": ("sum", "n"), "s": ("sum", "s"), "ss": ("sum", "ss")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["event_type", "arm"])
    )
    a = stats[stats["arm"] == 0].set_index("event_type")
    b = stats[stats["arm"] == 1].set_index("event_type")
    types = sorted(set(a.index) & set(b.index))
    rows = []
    for t in types:
        na, nb = float(a.loc[t, "n"]), float(b.loc[t, "n"])
        sa, sb = float(a.loc[t, "s"]), float(b.loc[t, "s"])
        ssa, ssb = float(a.loc[t, "ss"]), float(b.loc[t, "ss"])
        ma, mb = sa / na, sb / nb
        va = (ssa - sa * sa / na) / (na - 1.0)
        vb = (ssb - sb * sb / nb) / (nb - 1.0)
        denom = np.sqrt(va / na + vb / nb)
        # zero-variance-both-arms parity: DuckDB emits NULL for x/0.0,
        # Python would emit ±inf; NaN ≡ NULL to the comparer
        tstat = (ma - mb) / denom if denom > 0 else float("nan")
        rows.append(
            {
                "event_type": t,
                "n_a": int(na),
                "n_b": int(nb),
                "mean_a": round(ma / 100.0, 6),
                "mean_b": round(mb / 100.0, 6),
                "t_stat": round(float(tstat), 6),
            }
        )
    return pd.DataFrame(rows)


SQL_AB_TTEST = f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN md5(cast(user_id AS varchar)) < '{_AB_THR}' THEN 0 ELSE 1 END AS arm,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, arm, count(*) AS n, sum(c) AS s, sum(c * c) AS ss
  FROM e GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       round((CAST(a.s AS DOUBLE) / a.n) / 100.0, 6) AS mean_a,
       round((CAST(b.s AS DOUBLE) / b.n) / 100.0, 6) AS mean_b,
       round((CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
             / sqrt(((a.ss - CAST(a.s AS DOUBLE) * a.s / a.n) / (a.n - 1.0)) / a.n
                  + ((b.ss - CAST(b.s AS DOUBLE) * b.s / b.n) / (b.n - 1.0)) / b.n), 6) AS t_stat
FROM g a JOIN g b ON a.event_type = b.event_type AND a.arm = 0 AND b.arm = 1
ORDER BY a.event_type
"""


_PSI_CUTOFF = "2024-01-16"
_PSI_BIN_W = 33.0
_PSI_NBINS = 10


def q_psi_drift(sf_dir: str):
    """Population-stability-index drift monitor: per metric family
    (event_type), compare the value distribution before vs after a
    date cutoff over 10 fixed-width bins with +1 smoothing —
    PSI = Σ (p−q)·ln(p/q), the standard feature-drift gate a training
    pipeline runs before each refresh.

    One streaming pass reduces per-(type, period, bin) count partials —
    a bounded 5×2×10 domain, so the fold is the small-keys fast path
    and only ~100 int64s reach the driver.  All probabilities derive
    from exact integer counts; the log-expression evaluation order is
    mirrored in the SQL, and the ≤10-term PSI sum is rounded to 6."""
    cutoff = np.datetime64(_PSI_CUTOFF, "us")

    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        period = (batch["ts"].to_numpy(zero_copy_only=False) >= cutoff).astype(np.int8)
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.minimum(np.floor(v / _PSI_BIN_W), _PSI_NBINS - 1).astype(np.int32)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "period": period, "bin": b})
            .value_counts(["event_type", "period", "bin"])
            .reset_index(name="cnt")
        )

    c = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["event_type", "period", "bin"],
            {"cnt": ("sum", "cnt")},
            small_keys=True,
        )
        .to_pandas()
    )
    rows = []
    for t, g in c.groupby("event_type"):
        smoothed = {}
        for period in (0, 1):
            gp = g[g["period"] == period].set_index("bin")["cnt"]
            cnt = np.array(
                [int(gp.get(i, 0)) + 1 for i in range(_PSI_NBINS)], dtype=np.float64
            )
            smoothed[period] = cnt / cnt.sum()
        p, q = smoothed[0], smoothed[1]
        rows.append({"event_type": t, "psi": round(float(np.sum((p - q) * np.log(p / q))), 6)})
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True)


SQL_PSI_DRIFT = f"""
WITH b AS (
  SELECT event_type,
         CASE WHEN ts >= TIMESTAMP '{_PSI_CUTOFF}' THEN 1 ELSE 0 END AS period,
         CAST(least(floor(value / {_PSI_BIN_W}), {_PSI_NBINS - 1}) AS INT) AS bin
  FROM events
),
c AS (SELECT event_type, period, bin, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
grid AS (
  SELECT t.event_type, p.period, r.range AS bin
  FROM (SELECT DISTINCT event_type FROM events) t,
       (VALUES (0), (1)) p(period), range({_PSI_NBINS}) r
),
f AS (
  SELECT g.event_type, g.period, g.bin,
         CAST(coalesce(c.cnt, 0) + 1 AS DOUBLE) AS cnt
  FROM grid g LEFT JOIN c ON g.event_type = c.event_type
       AND g.period = c.period AND g.bin = c.bin
),
n AS (SELECT event_type, period, sum(cnt) AS tot FROM f GROUP BY 1, 2),
pq AS (
  SELECT f.event_type, f.bin,
         max(CASE WHEN f.period = 0 THEN f.cnt / n.tot END) AS p,
         max(CASE WHEN f.period = 1 THEN f.cnt / n.tot END) AS q
  FROM f JOIN n ON f.event_type = n.event_type AND f.period = n.period
  GROUP BY 1, 2
)
SELECT event_type, round(sum((p - q) * ln(p / q)), 6) AS psi
FROM pq GROUP BY event_type ORDER BY event_type
"""


_ENTROPY_MIN_EVENTS = 5


def q_type_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type distribution (users
    with ≥ 5 events) — the behavioral-diversity feature, and the same
    shape as per-document topic/vocabulary entropy in corpus curation.

    (user, type) counts fold through the open-domain coarse-bucket
    exchange; the per-user entropy finalizer is a second, already
    co-partitioned pass (≤ |types| rows per user).  Counts are exact
    ints; the ≤5-term −Σ p·ln p sum rounds to 6."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                    "event_type": batch["event_type"].to_pandas(),
                }
            )
            .value_counts(["user_id", "event_type"])
            .reset_index(name="cnt")
        )

    folded = grouped_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["user_id", "event_type"],
        {"cnt": ("sum", "cnt")},
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__bucket=(df["user_id"].to_numpy() % 32).astype(np.int32))

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby("user_id")["cnt"].transform("sum")
        keep = tot >= _ENTROPY_MIN_EVENTS
        df, tot = df[keep], tot[keep]
        if len(df) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "entropy": pd.Series([], dtype=np.float64)})
        p = df["cnt"].to_numpy(dtype=np.float64) / tot.to_numpy(dtype=np.float64)
        contrib = pd.DataFrame({"user_id": df["user_id"], "h": p * np.log(p)})
        out = contrib.groupby("user_id", as_index=False)["h"].sum()
        out["entropy"] = np.round(-out["h"], 6) + 0.0  # normalize -0.0 → 0.0
        return out[["user_id", "entropy"]]

    return (
        folded.map_batches(tag, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda df: entropy(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_TYPE_ENTROPY = f"""
WITH c AS (SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2),
n AS (SELECT user_id, sum(cnt) AS tot FROM c GROUP BY 1 HAVING sum(cnt) >= {_ENTROPY_MIN_EVENTS})
SELECT c.user_id,
       round(-sum((CAST(cnt AS DOUBLE) / tot) * ln(CAST(cnt AS DOUBLE) / tot)), 6) + 0.0 AS entropy
FROM c JOIN n USING (user_id)
GROUP BY c.user_id
"""


_BFS_SOURCE = 2  # node id of custkey 1 in the 2k / 2k+1 bipartite encoding
_BFS_MAX_HOPS = 4

#: frontier size above which each BFS level stops broadcasting the
#: frontier array and routes to the co-partitioned semi-join sweep
BFS_FRONTIER_BUDGET = 5_000_000


def q_bfs_hops(sf_dir: str):
    return _bfs_hops(sf_dir)


def _bfs_hops(sf_dir: str, *, frontier_budget: int = BFS_FRONTIER_BUDGET):
    """Pregel-style BFS: minimum hop distance from one customer node
    over the UNDIRECTED customer↔supplier bipartite graph (edges =
    orders ⨝ lineitem, the same 2k/2k+1 node encoding as `pagerank`),
    capped at 4 hops.

    Level-synchronous frontier expansion: the edge list materializes
    once and stays put; each level ships only the CURRENT FRONTIER.
    While the frontier fits ``frontier_budget`` it travels as a
    broadcast ``pa.array`` and the edges stream through a vectorized
    ``pc.is_in`` probe, newly reached nodes draining to a driver
    unique fold.  The moment a level's frontier exceeds the budget the
    SAME loop switches to the web-scale sweep: frontier and visited
    stay Datasets, the probe is ``tabular.shuffle_semi_filter``
    (frontier ⨝ edges co-partitioned on ``src``) and the
    visited-exclusion is its anti twin — no node-order state ever
    collects on the driver.  Both routes are proven identical by
    pytest (``frontier_budget=0`` forces the semi-join sweep on the
    same graph).  Pure-int pipeline."""
    import pyarrow.compute as pc

    orders = read_table_arrow(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"], split=True)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        c = (df["o_custkey"].to_numpy() * 2).astype(np.int64)
        s = (df["l_suppkey"].to_numpy() * 2 + 1).astype(np.int64)
        return pd.DataFrame(
            {"src": np.concatenate([c, s]), "dst": np.concatenate([s, c])}
        ).drop_duplicates()

    from ..stages.graph import _SWEEP_EDGE_BLOCKS

    e = (
        broadcast_join(li, orders.rename_columns(["l_orderkey", "o_custkey"]), "l_orderkey")
        .map_batches(edges, batch_format="pandas")
        .materialize()
    )
    # bound the per-hop re-scan task count (see graph._SWEEP_EDGE_BLOCKS)
    if e.num_blocks() > _SWEEP_EDGE_BLOCKS:
        e = e.repartition(_SWEEP_EDGE_BLOCKS).materialize()

    import ray.data as rd

    from .tabular import shuffle_semi_filter

    def distinct_nodes(ds):
        # distinct via the partial-combining grouped_aggregate (one
        # coarse key-hash exchange), then drop the count column
        return grouped_aggregate(ds, ["node"], {"__c": ("count", None)}).select_columns(
            ["node"]
        )

    visited = {_BFS_SOURCE: 0}  # broadcast route's driver fold
    visited_ds = None  # semi-join route's distributed state
    frontier = np.array([_BFS_SOURCE], dtype=np.int64)
    frontier_ds = None
    for hop in range(1, _BFS_MAX_HOPS + 1):
        on_broadcast = frontier_ds is None and len(frontier) <= frontier_budget
        if on_broadcast:
            handle = Broadcast(pa.array(frontier, type=pa.int64()))

            def reached(batch: pa.Table) -> pd.DataFrame:
                keep = pc.is_in(batch["src"], value_set=handle.get())
                d = batch.filter(keep)["dst"].to_numpy(zero_copy_only=False)
                return pd.DataFrame({"node": np.unique(d)})

            # per-batch outputs are already unique and bounded by the
            # reachable-node set (dimension scale on this route), so they
            # drain straight to a driver np.unique fold — no distributed
            # exchange per hop (same shape as pagerank's broadcast sweep)
            got = e.map_batches(reached, batch_format="pyarrow").to_pandas()
            new_nodes = (
                np.unique(got["node"].to_numpy()) if len(got) else np.array([], dtype=np.int64)
            )
            seen = np.fromiter(visited.keys(), dtype=np.int64, count=len(visited))
            frontier = new_nodes[~np.isin(new_nodes, seen)]
            if len(frontier) == 0:
                break
            for x in frontier:
                visited[int(x)] = hop
            continue
        # semi-join sweep (web scale): frontier/visited stay Datasets
        if frontier_ds is None:  # first over-budget level: promote state
            frontier_ds = rd.from_arrow(
                pa.table({"node": pa.array(frontier, type=pa.int64())})
            )
            visited_ds = rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array(list(visited.keys()), type=pa.int64()),
                        "hop": pa.array(list(visited.values()), type=pa.int64()),
                    }
                )
            ).materialize()
        reached_ds = distinct_nodes(
            shuffle_semi_filter(
                e.map_batches(
                    lambda t: t.rename_columns(["node", "dst"]), batch_format="pyarrow"
                ),
                frontier_ds,
                "node",
            ).map_batches(
                lambda t: pa.table({"node": t["dst"]}), batch_format="pyarrow"
            )
        )
        frontier_ds = shuffle_semi_filter(
            reached_ds, visited_ds.select_columns(["node"]), "node", anti=True
        ).materialize()
        if frontier_ds.count() == 0:
            break
        visited_ds = visited_ds.union(
            frontier_ds.map_batches(
                lambda t, h=hop: t.append_column(
                    "hop", pa.array(np.full(len(t), h, dtype=np.int64))
                ),
                batch_format="pyarrow",
            )
        ).materialize()
    if visited_ds is not None:
        out = visited_ds.to_pandas().astype(np.int64)
    else:
        out = pd.DataFrame(
            {"node": list(visited.keys()), "hop": list(visited.values())}
        ).astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)


def _bfs_sql() -> str:
    base = """
WITH eu AS (
  SELECT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  UNION
  SELECT 2 * l.l_suppkey + 1, 2 * o.o_custkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
"""
    parts = [f"v0(node, hop) AS (SELECT {_BFS_SOURCE}, 0)"]
    for k in range(1, _BFS_MAX_HOPS + 1):
        parts.append(
            f"""f{k} AS (
  SELECT DISTINCT e.dst AS node FROM eu e
  JOIN v{k - 1} v ON e.src = v.node AND v.hop = {k - 1}
  WHERE e.dst NOT IN (SELECT node FROM v{k - 1})
),
v{k} AS (SELECT node, hop FROM v{k - 1} UNION ALL SELECT node, {k} FROM f{k})"""
        )
    return (
        base
        + ",\n".join(parts)
        + f"\nSELECT CAST(node AS BIGINT) AS node, CAST(hop AS BIGINT) AS hop FROM v{_BFS_MAX_HOPS} ORDER BY node"
    )


SQL_BFS_HOPS = _bfs_sql()


def _pagerank_sql(iters: int = 8, damping: float = 0.85) -> str:
    """Chained-CTE power iteration mirroring stages/graph.pagerank on the
    customer→supplier bipartite edge list — one CTE per sweep (SQL
    recursion cannot aggregate in the recursive term, so the fixed
    iteration count unrolls instead)."""
    head = f"""
WITH edges AS (
  SELECT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, (SELECT 1.0 / n FROM nn) AS rank FROM nodes)"""
    sweeps = []
    for k in range(1, iters + 1):
        p = k - 1
        sweeps.append(
            f""",
d{k} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS mass FROM r{p} r
  LEFT JOIN deg ON r.node = deg.node WHERE deg.node IS NULL
),
c{k} AS (
  SELECT e.dst AS node, sum(r.rank / deg.deg) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN deg ON deg.node = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node,
         (1.0 - {damping}) / nn.n
         + {damping} * (coalesce(c.contrib, 0.0) + d.mass / nn.n) AS rank
  FROM nodes n CROSS JOIN nn CROSS JOIN d{k} d
  LEFT JOIN c{k} c ON c.node = n.node
)"""
        )
    return (
        head
        + "".join(sweeps)
        + f"\nSELECT CAST(node AS BIGINT) AS node, round(rank, 10) AS rank FROM r{iters} ORDER BY node"
    )


SQL_PAGERANK = _pagerank_sql()


_PPR_SOURCE = 2  # node id of custkey 1 (same encoding as BFS/pagerank)


def q_ppr_scores(sf_dir: str):
    """Personalized PageRank from one source node over the same
    customer→supplier bipartite graph as `pagerank` — random-walk-with-
    restart proximity, the graph-similarity primitive behind
    who-is-close-to-X recommendations.  The teleport vector (and the
    dangling mass) concentrates on the source instead of spreading
    uniformly; everything else — sweep loop, routing, checkpointing —
    is `stages/graph.pagerank` with ``restart_node`` set.  Value-checked
    against the chained-CTE unroll (SQL_PPR) with the same single
    10-dp rounding contract as `pagerank`."""
    from ..stages.graph import pagerank

    orders = read_table_arrow(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"], split=True)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": (df["o_custkey"].to_numpy() * 2).astype(np.int64),
                "dst": (df["l_suppkey"].to_numpy() * 2 + 1).astype(np.int64),
            }
        )

    e = broadcast_join(
        li, orders.rename_columns(["l_orderkey", "o_custkey"]), "l_orderkey"
    ).map_batches(edges, batch_format="pandas")
    out = pagerank(e, iters=8, restart_node=_PPR_SOURCE)
    # drop exact zeros (nodes the walk never reaches): keeps the output
    # support-bounded and the comparison meaningful on both engines
    out = out[out["rank"] > 0.0]
    return out.sort_values("node").reset_index(drop=True)


def _ppr_sql(source: int, iters: int = 8, damping: float = 0.85) -> str:
    """Chained-CTE personalized-PageRank unroll mirroring
    stages/graph.pagerank(restart_node=source): teleport and dangling
    mass land on the source node only."""
    head = f"""
WITH edges AS (
  SELECT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, CASE WHEN node = {source} THEN 1.0 ELSE 0.0 END AS rank FROM nodes)"""
    sweeps = []
    for k in range(1, iters + 1):
        p = k - 1
        sweeps.append(
            f""",
d{k} AS (
  SELECT coalesce(sum(r.rank), 0.0) AS mass FROM r{p} r
  LEFT JOIN deg ON r.node = deg.node WHERE deg.node IS NULL
),
c{k} AS (
  SELECT e.dst AS node, sum(r.rank / deg.deg) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN deg ON deg.node = e.src
  GROUP BY e.dst
),
r{k} AS (
  SELECT n.node,
         (1.0 - {damping}) * (CASE WHEN n.node = {source} THEN 1.0 ELSE 0.0 END)
         + {damping} * (coalesce(c.contrib, 0.0)
                        + d.mass * (CASE WHEN n.node = {source} THEN 1.0 ELSE 0.0 END)) AS rank
  FROM nodes n CROSS JOIN d{k} d
  LEFT JOIN c{k} c ON c.node = n.node
)"""
        )
    return (
        head
        + "".join(sweeps)
        + f"""
SELECT CAST(node AS BIGINT) AS node, round(rank, 10) AS rank
FROM r{iters} WHERE round(rank, 10) > 0.0 ORDER BY node"""
    )


SQL_PPR = _ppr_sql(_PPR_SOURCE)


_LP_SEED_MOD = 5
_LP_ITERS = 6


def q_label_propagation(sf_dir: str):
    """Semi-supervised label propagation (stages/graph.label_propagation)
    over the undirected customer↔supplier bipartite graph: every 5th
    supplier is seeded with its nation key; labels spread by
    majority-of-labeled-neighbors (ties → smallest label) until
    convergence or 6 sweeps.  Multi-hop by construction — unseeded
    suppliers can only be labeled via customers labeled in an earlier
    sweep.

    Value-checked against an unrolled chained-CTE mirror
    (SQL_LABEL_PROP): one CTE trio (votes → per-node argmax → merged
    label state) per sweep.  Unrolling is exact because a converged
    sweep is a fixpoint no-op, and every quantity is an integer with a
    deterministic (count DESC, label ASC) tie rule."""
    from ..stages.graph import label_propagation

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy()
    sn = sup["s_nationkey"].to_numpy()
    m = (sk % _LP_SEED_MOD) == 0
    seeds = {int(2 * k + 1): int(n) for k, n in zip(sk[m], sn[m])}

    orders = read_table_arrow(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"], split=True)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": (df["o_custkey"].to_numpy() * 2).astype(np.int64),
                "dst": (df["l_suppkey"].to_numpy() * 2 + 1).astype(np.int64),
            }
        )

    e = broadcast_join(
        li, orders.rename_columns(["l_orderkey", "o_custkey"]), "l_orderkey"
    ).map_batches(edges, batch_format="pandas")
    out = label_propagation(e, seeds, max_iters=_LP_ITERS)
    out = out.astype({"node": np.int64, "label": np.int64})
    return out.sort_values("node").reset_index(drop=True)


def _label_prop_sql(iters: int = _LP_ITERS) -> str:
    head = f"""
WITH edges AS (
  SELECT 2 * o.o_custkey AS src, 2 * l.l_suppkey + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
seeds AS (
  SELECT 2 * s_suppkey + 1 AS node, CAST(s_nationkey AS BIGINT) AS label
  FROM supplier WHERE s_suppkey % {_LP_SEED_MOD} = 0
),
l0 AS (SELECT node, label FROM seeds)"""
    sweeps = []
    for k in range(1, iters + 1):
        p = k - 1
        sweeps.append(
            f""",
v{k} AS (
  SELECT x.node, l.label, count(*) AS n
  FROM (SELECT dst AS node, src AS nb FROM edges
        UNION ALL SELECT src, dst FROM edges) x
  JOIN l{p} l ON l.node = x.nb
  GROUP BY x.node, l.label
),
b{k} AS (
  SELECT node, label FROM (
    SELECT node, label, row_number() OVER (PARTITION BY node ORDER BY n DESC, label) AS rn
    FROM v{k}
  ) WHERE rn = 1
),
l{k} AS (
  SELECT coalesce(p.node, b.node) AS node,
         CASE WHEN s.node IS NOT NULL THEN p.label
              WHEN b.label IS NOT NULL THEN b.label
              ELSE p.label END AS label
  FROM l{p} p FULL OUTER JOIN b{k} b ON p.node = b.node
  LEFT JOIN seeds s ON coalesce(p.node, b.node) = s.node
)"""
        )
    return (
        head
        + "".join(sweeps)
        + f"\nSELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label FROM l{iters} ORDER BY node"
    )


SQL_LABEL_PROP = _label_prop_sql()


def q_pareto_orders(sf_dir: str):
    """2-D Pareto frontier (skyline): orders not dominated on
    (earlier-or-equal date, strictly higher price) by any other order —
    the classic price/recency skyline, and the local-prune + merge
    shape every distributed skyline uses.

    Stage 1 streams one bounded partial per batch — the per-date max
    price (date domain ≪ rows) — through the small-keys fold; the
    driver finalizes the frontier with a single running-max sweep over
    dates (keep a date iff its max beats every STRICTLY earlier date's
    max).  Stage 2 re-streams the fact table against the broadcast
    frontier, keeping every order that attains its date's frontier
    price (equal (date, price) points don't dominate each other).  No
    arithmetic touches the floats — comparisons only — so no rounding
    is needed on either side."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"], split=True)

    def date_max(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "d": batch["o_orderdate"].to_numpy(zero_copy_only=False),
                    "p": batch["o_totalprice"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("d", as_index=False)["p"]
            .max()
        )

    dm = (
        grouped_aggregate(
            ds.map_batches(date_max, batch_format="pyarrow"),
            ["d"],
            {"p": ("max", "p")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("d")
    )
    prev_max = dm["p"].cummax().shift(1)
    sky = dm[prev_max.isna() | (dm["p"] > prev_max)]
    fr = Broadcast(pd.Series(sky["p"].to_numpy(), index=sky["d"].to_numpy()))

    def keep(batch: pa.Table) -> pa.Table:
        f = fr.get()
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        want = f.reindex(d).to_numpy()
        return batch.filter(pa.array(p == want))

    return ds.map_batches(keep, batch_format="pyarrow")


# Dominance spec: a is dominated iff ∃b with (earlier date, ≥ price) or
# (≤ date, strictly higher price).  The second branch is exactly "a is
# not its own date's max", so the NOT EXISTS only needs the per-date-max
# candidate set — same result as the naive all-pairs form, but the
# quadratic check runs over |dates|, not |orders| (the OR-disjunction
# all-pairs form defeats DuckDB's IEJoin and goes nested-loop).
SQL_PARETO = """
WITH dmax AS (SELECT o_orderdate AS d, max(o_totalprice) AS p FROM orders GROUP BY 1)
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice
FROM orders o JOIN dmax m ON o.o_orderdate = m.d AND o.o_totalprice = m.p
WHERE NOT EXISTS (SELECT 1 FROM dmax b WHERE b.d < m.d AND b.p >= m.p)
"""


_AUC_POS_TYPE = "purchase"


def q_auc_score(sf_dir: str):
    """Exact ROC-AUC of `value` as a score for predicting
    event_type == 'purchase' — the Mann-Whitney U rank statistic, the
    standard offline-eval metric for a trained ranker.

    The trick that makes an O(N log N) global-rank statistic a
    STREAMING aggregate: scores are 2-decimal currency values, so the
    (cents, label) count histogram is bounded by the PRICE DOMAIN, not
    the row count.  One pass reduces per-(cents, label) count partials;
    the driver computes U from the ~2·|domain| int64 histogram with a
    single cumulative sweep (ties get the standard half credit, kept
    exact by accumulating 2U as an integer).  One float division at
    the end, mirrored op-for-op in SQL."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = (batch["event_type"].to_pandas() == _AUC_POS_TYPE).astype(np.int8)
        return (
            pd.DataFrame({"cents": cents, "pos": pos})
            .value_counts(["cents", "pos"])
            .reset_index(name="n")
        )

    hist = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["cents", "pos"],
            {"n": ("sum", "n")},
        )
        .to_pandas()
        .pivot_table(index="cents", columns="pos", values="n", fill_value=0, aggfunc="sum")
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    n0 = hist[0].to_numpy(dtype=np.int64)
    n1 = hist[1].to_numpy(dtype=np.int64)
    cum0 = np.concatenate([[0], np.cumsum(n0)[:-1]])
    u2 = int(np.sum(n1 * (2 * cum0 + n0)))  # 2·U, exact
    auc = u2 / (2.0 * int(n1.sum()) * int(n0.sum()))
    return pd.DataFrame({"auc": [round(auc, 6)]})


SQL_AUC = f"""
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type = '{_AUC_POS_TYPE}' THEN 1 ELSE 0 END AS pos,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT cents,
         coalesce(max(CASE WHEN pos = 1 THEN n END), 0) AS n1,
         coalesce(max(CASE WHEN pos = 0 THEN n END), 0) AS n0
  FROM c GROUP BY 1
),
w AS (
  SELECT n1, n0,
         coalesce(sum(n0) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
  FROM s
)
SELECT round(sum(n1 * (2 * cum0 + n0))
             / (2.0 * (SELECT sum(n1) FROM s) * (SELECT sum(n0) FROM s)), 6) AS auc
FROM w
"""


def q_gini_revenue(sf_dir: str):
    """Per-nation Gini coefficient of customer revenue concentration —
    the inequality/skew diagnostic a marketplace (or a per-domain
    corpus-balance audit) runs over grouped totals.

    Two-level shape: per-customer revenue folds exactly in integer
    cents through the open-domain exchange; ONE nation-hash exchange
    co-locates each nation's customers and the in-bucket Gini is a
    vectorized sorted sweep (Σ i·xᵢ stays int64 — exact).  Tie order
    cannot change Σ i·xᵢ (equal values commute), so no tie rule is
    needed for correctness; one float expression at the end, mirrored
    op-for-op in SQL."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], split=True)
    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nmap = pd.Series(
        cust["c_nationkey"].to_numpy().astype(np.int64),
        index=cust["c_custkey"].to_numpy().astype(np.int64),
    )
    nmap_bc = Broadcast(nmap)

    def rev_partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame({"c_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False), "rev": cents})
            .groupby("c_custkey", as_index=False)["rev"]
            .sum()
        )

    per_cust = grouped_aggregate(
        orders.map_batches(rev_partial, batch_format="pyarrow"),
        ["c_custkey"],
        {"rev": ("sum", "rev")},
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        nk = nmap_bc.get().reindex(df["c_custkey"].to_numpy()).to_numpy()
        return df.assign(c_nationkey=nk.astype(np.int64))

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, g in df.groupby("c_nationkey", sort=True):
            x = np.sort(g["rev"].to_numpy(dtype=np.int64))
            n = len(x)
            s = int(x.sum())
            a = int(np.sum(np.arange(1, n + 1, dtype=np.int64) * x))
            rows.append(
                {
                    "c_nationkey": int(nk),
                    "gini": round(2.0 * a / (n * s) - (n + 1.0) / n, 6),
                    "n_customers": n,
                }
            )
        return pd.DataFrame(rows)

    return (
        per_cust.map_batches(tag, batch_format="pandas")
        .groupby("c_nationkey")
        .map_groups(gini, batch_format="pandas")
    )


SQL_GINI = """
WITH r AS (
  SELECT c.c_nationkey, o.o_custkey,
         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
k AS (
  SELECT c_nationkey, rev,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY rev, o_custkey) AS i
  FROM r
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       round(2.0 * sum(i * rev) / (count(*) * sum(rev)) - (count(*) + 1.0) / count(*), 6) AS gini,
       CAST(count(*) AS BIGINT) AS n_customers
FROM k GROUP BY c_nationkey
"""


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(nation, year) revenue report — the multi-level
    subtotal aggregate every warehouse dashboard runs: nation×year
    cells, per-nation subtotals, and the grand total in ONE result
    (rolled-up levels labelled with 'ALL' / year 0 sentinels, mirroring
    SQL GROUPING()).

    Shape: the fact table folds ONCE — per-batch integer-cent partials
    keyed by (nationkey, year) through the open-domain grouped
    exchange; every coarser rollup level re-aggregates the BOUNDED
    group table (|nations|×|years| rows) — subtotals never cost a
    second fact pass.  Customer→nation is a broadcast dim lookup."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"], split=True
    )
    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nmap = pd.Series(
        cust["c_nationkey"].to_numpy().astype(np.int64),
        index=cust["c_custkey"].to_numpy().astype(np.int64),
    )
    nmap_bc = Broadcast(nmap)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        year = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        ).astype(np.int64) + 1970
        nk = (
            nmap_bc.get()
            .reindex(batch["o_custkey"].to_numpy(zero_copy_only=False))
            .to_numpy()
            .astype(np.int64)
        )
        return (
            pd.DataFrame({"nk": nk, "o_year": year, "cents": cents})
            .groupby(["nk", "o_year"], as_index=False)["cents"]
            .sum()
        )

    base = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["nk", "o_year"],
        {"cents": ("sum", "cents")},
    ).to_pandas()  # bounded: |nations| × |years| rows

    names = pd.Series(
        nat["n_name"].to_pylist(), index=nat["n_nationkey"].to_numpy().astype(np.int64)
    )
    base["n_name"] = names.reindex(base["nk"].to_numpy()).to_numpy()
    lvl0 = base[["n_name", "o_year", "cents"]]
    lvl1 = (
        base.groupby("n_name", as_index=False)["cents"].sum().assign(o_year=0)
    )[["n_name", "o_year", "cents"]]
    lvl2 = pd.DataFrame({"n_name": ["ALL"], "o_year": [0], "cents": [int(base["cents"].sum())]})
    out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
    out["o_year"] = out["o_year"].astype(np.int64)
    out = out.rename(columns={"cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values(["n_name", "o_year"]).reset_index(drop=True)


SQL_ROLLUP_REVENUE = """
SELECT CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS n_name,
       CAST(CASE WHEN GROUPING(year(o.o_orderdate)) = 1 THEN 0
                 ELSE year(o.o_orderdate) END AS BIGINT) AS o_year,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY ROLLUP(n.n_name, year(o.o_orderdate))
ORDER BY n_name, o_year
"""


_SSJ_WINDOW_US = 600_000_000  # 10 minutes


def q_stream_self_join(sf_dir: str):
    """Stream-stream windowed self-join (Flink interval-join shape):
    every (view → click) pair by the same user where the click lands
    within (0, 10 min] after the view.

    ONE user-hash exchange co-locates each user's events; the
    in-bucket pairing is a vectorized same-user merge + window filter
    whose fan-out is bounded by per-user×per-window event counts (the
    interval-join assumption).  At stream scale the SAME shape runs
    per (user, time-bucket) with one-window overlap replication —
    noted here because the bucketing key, not the pairing kernel, is
    what changes.  Pure-int (µs) comparisons."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "us": us,
                "event_type": batch["event_type"].to_pandas(),
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def pair(df: pd.DataFrame) -> pd.DataFrame:
        v = df[df["event_type"] == "view"][["user_id", "event_id", "us"]]
        c = df[df["event_type"] == "click"][["user_id", "event_id", "us"]]
        m = v.merge(c, on="user_id", suffixes=("_v", "_c"))
        dt = m["us_c"] - m["us_v"]
        m = m[(dt > 0) & (dt <= _SSJ_WINDOW_US)]
        return m.rename(columns={"event_id_v": "view_id", "event_id_c": "click_id"})[
            ["user_id", "view_id", "click_id"]
        ]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: pair(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_STREAM_SELF_JOIN = f"""
SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
FROM events v JOIN events c ON v.user_id = c.user_id
WHERE v.event_type = 'view' AND c.event_type = 'click'
  AND epoch_us(c.ts) - epoch_us(v.ts) > 0
  AND epoch_us(c.ts) - epoch_us(v.ts) <= {_SSJ_WINDOW_US}
"""


_ATTR_WINDOW_US = 1_800_000_000  # 30 minutes


def q_attribution_last_touch(sf_dir: str):
    """Last-touch conversion attribution: each purchase is credited to
    the LATEST non-purchase event by the same user strictly before it
    and within 30 minutes (ties at the same µs → highest event_id) —
    the per-user AS-OF self-join every marketing/reco pipeline runs.

    Same single user-hash exchange as sessionize; in-bucket the as-of
    match is one ``pandas.merge_asof`` (backward, tolerance, no exact
    matches) over per-user ordered frames — O(n) after the sort, no
    pair fan-out at all, which is what distinguishes the as-of shape
    from the interval join above.  Purchases with no touch in window
    drop (inner semantics)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "us": us,
                "event_type": batch["event_type"].to_pandas(),
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            df[df["event_type"] == "purchase"][["user_id", "event_id", "us"]]
            .sort_values("us", kind="stable")
            .rename(columns={"event_id": "purchase_id"})
        )
        t = (
            df[df["event_type"] != "purchase"][["user_id", "event_id", "us", "event_type"]]
            .sort_values(["us", "event_id"], kind="stable")
            .rename(columns={"event_id": "touch_id", "event_type": "touch_type"})
        )
        if len(p) == 0 or len(t) == 0:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series([], dtype=np.int64),
                    "touch_id": pd.Series([], dtype=np.int64),
                    "touch_type": pd.Series([], dtype=object),
                }
            )
        m = pd.merge_asof(
            p,
            t,
            on="us",
            by="user_id",
            direction="backward",
            allow_exact_matches=False,
            tolerance=_ATTR_WINDOW_US,
        )
        m = m.dropna(subset=["touch_id"])
        return m.assign(touch_id=m["touch_id"].astype(np.int64))[
            ["purchase_id", "touch_id", "touch_type"]
        ]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: attribute(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_ATTRIBUTION = f"""
SELECT p.event_id AS purchase_id, a.event_id AS touch_id, a.event_type AS touch_type
FROM events p
JOIN LATERAL (
  SELECT e.event_id, e.event_type
  FROM events e
  WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
    AND epoch_us(e.ts) < epoch_us(p.ts)
    AND epoch_us(e.ts) >= epoch_us(p.ts) - {_ATTR_WINDOW_US}
  ORDER BY epoch_us(e.ts) DESC, e.event_id DESC
  LIMIT 1
) a ON true
WHERE p.event_type = 'purchase'
"""


def q_chi2_independence(sf_dir: str):
    """Pearson chi-square independence test on the (event_type ×
    md5-arm) contingency table — "did the experiment arms see the same
    event mix?", the guardrail check run next to `ab_ttest`.

    One streaming pass reduces the bounded |types|×2 contingency counts
    (ints); the driver evaluates Σ (obs−exp)²/exp with the expected
    counts derived from exact integer margins, op-sequence-mirrored in
    SQL.  Output: one row (chi2, dof)."""
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        arm_a = md5_lt_mask(batch["user_id"].cast(pa.string()), _AB_THR)
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"].to_pandas(),
                    "arm": np.where(arm_a, 0, 1),
                }
            )
            .value_counts(["event_type", "arm"])
            .reset_index(name="n")
        )

    c = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["event_type", "arm"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .pivot_table(index="event_type", columns="arm", values="n", fill_value=0, aggfunc="sum")
        .reindex(columns=[0, 1], fill_value=0)
    )
    obs = c.to_numpy(dtype=np.float64)
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    tot = obs.sum()
    exp = row * col / tot
    chi2 = float(np.sum((obs - exp) * (obs - exp) / exp))
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    return pd.DataFrame({"chi2": [round(chi2, 6)], "dof": [dof]})


SQL_CHI2 = f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN md5(cast(user_id AS varchar)) < '{_AB_THR}' THEN 0 ELSE 1 END AS arm
  FROM events
),
c AS (SELECT event_type, arm, CAST(count(*) AS DOUBLE) AS n FROM e GROUP BY 1, 2),
m AS (
  SELECT c.event_type, c.arm, c.n,
         sum(c.n) OVER (PARTITION BY c.event_type) AS row_n,
         sum(c.n) OVER (PARTITION BY c.arm) AS col_n,
         sum(c.n) OVER () AS tot
  FROM c
)
SELECT round(sum((n - row_n * col_n / tot) * (n - row_n * col_n / tot)
                 / (row_n * col_n / tot)), 6) AS chi2,
       CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT arm) - 1) AS BIGINT) AS dof
FROM m
"""


_CLUSTER_COEFF_MIN_ORDERS = 2


#: edges above which the clustering-coefficient closure probe stops
#: broadcasting the packed edge-key array and routes to the
#: hash-partitioned semi-join (16 B/edge ⇒ ~128 MB at the budget)
CLUSTER_COEFF_EDGE_BUDGET = 8_000_000


def q_clustering_coeff(sf_dir: str):
    return _clustering_coeff(sf_dir)


def _clustering_coeff(sf_dir: str, *, edge_budget: int = CLUSTER_COEFF_EDGE_BUDGET):
    """Local clustering coefficient per node of the co-purchase graph
    (parts as nodes, edge = bought together in ≥ 2 orders): the
    community-density metric 2·Δ(v) / (deg(v)·(deg(v)−1)) — graph
    analytics one level past `triangle_count`'s global scalar.

    Three-stage shape on top of the `copurchase_pairs` exchange: (1)
    the thresholded edge set folds once; (2) ONE node-hash exchange
    co-locates each node's adjacency and emits its wedges ((a,b)
    neighbor pairs — fan-out deg², the wedge-join reality every
    triangle algorithm pays); (3) wedges probe the edge set and closed
    counts fold back per node.  Integers until the final mirrored
    division.

    Closure-probe routing: at or under ``edge_budget`` edges the packed
    edge-key array broadcasts once (``ray.put`` + vectorized
    ``pc.is_in`` per batch); above it the probe is
    ``tabular.shuffle_semi_filter`` — wedges and edge keys co-partition
    on the packed key, so no edge-order state ever collects on the
    driver, and node degrees fold distributedly (node-domain-bounded)
    instead of concatenating the edge table driver-side.  Both paths
    are proven identical by pytest (``edge_budget=0`` forces the
    semi-join route on the same graph)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(columns={"l_partkey_a": "a", "l_partkey_b": "b", "size": "n"})
        )

    folded = grouped_aggregate(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: pairs(df.drop(columns=["__bucket"])), batch_format="pandas"),
        ["a", "b"],
        {"n": ("sum", "n")},
    )

    def thresholded(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n"] >= _CLUSTER_COEFF_MIN_ORDERS][["a", "b"]]

    edges = folded.map_batches(thresholded, batch_format="pandas").materialize()
    n_edges = edges.count()

    def tag_v(df: pd.DataFrame) -> pd.DataFrame:
        # co-locate BOTH endpoints' adjacency rows per node bucket:
        # replicate each edge to its two endpoint buckets
        both = pd.concat([df, df.rename(columns={"a": "b", "b": "a"})])[["a", "b"]]
        return both.rename(columns={"a": "v", "b": "w"}).assign(
            __bucket=lambda x: (x["v"].to_numpy() % 64).astype(np.int32)
        )

    def node_wedges(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="v", suffixes=("_1", "_2"))
        m = m[m["w_1"] < m["w_2"]]
        return m.rename(columns={"w_1": "x", "w_2": "y"})[["v", "x", "y"]]

    wedge_ds = (
        edges.map_batches(tag_v, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(lambda df: node_wedges(df.drop(columns=["__bucket"])), batch_format="pandas")
    )

    if n_edges <= edge_budget:
        import ray

        # broadcast route: edge-key set ships once (part ids < 2^32 by
        # key contract; the packed key keeps the probe one int64 is_in)
        ekeys = pa.concat_tables(
            [t.select(["a", "b"]) for t in ray.get(edges.to_arrow_refs()) if t.num_rows > 0]
        )
        packed = ekeys["a"].to_numpy() * np.int64(1 << 32) + ekeys["b"].to_numpy()
        probe = Broadcast(pa.array(packed, type=pa.int64()))

        def closed_partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                                     "tri": pd.Series([], dtype=np.int64)})
            key = df["x"].to_numpy() * np.int64(1 << 32) + df["y"].to_numpy()
            hit = pc.is_in(pa.array(key, type=pa.int64()), value_set=probe.get()).to_numpy(
                zero_copy_only=False
            )
            out = df.loc[hit].groupby("v", as_index=False).size().rename(columns={"size": "tri"})
            return out

        closed_counts = wedge_ds.map_batches(closed_partial, batch_format="pandas")
        deg = (
            pd.concat([ekeys.to_pandas().rename(columns={"a": "v"})[["v"]],
                       ekeys.to_pandas().rename(columns={"b": "v"})[["v"]]])
            .groupby("v", as_index=False)
            .size()
            .rename(columns={"size": "deg"})
        )
    else:
        from .tabular import shuffle_semi_filter

        # semi-join route (web scale): wedges and edge keys co-partition
        # on the packed key — the edge table never touches the driver
        def pack_wedge(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                                     "__ek": pd.Series([], dtype=np.int64)})
            return pd.DataFrame(
                {"v": df["v"].to_numpy(),
                 "__ek": df["x"].to_numpy() * np.int64(1 << 32) + df["y"].to_numpy()}
            )

        def pack_edge(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"__ek": df["a"].to_numpy() * np.int64(1 << 32) + df["b"].to_numpy()}
            )

        closed = shuffle_semi_filter(
            wedge_ds.map_batches(pack_wedge, batch_format="pandas"),
            edges.map_batches(pack_edge, batch_format="pandas"),
            "__ek",
        )

        def count_v(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("v", as_index=False).size().rename(columns={"size": "tri"})

        closed_counts = closed.map_batches(count_v, batch_format="pandas")
        # node degrees fold distributedly; the result is node-bounded
        deg = (
            grouped_aggregate(
                edges.map_batches(
                    lambda df: pd.concat(
                        [df[["a"]].rename(columns={"a": "v"}),
                         df[["b"]].rename(columns={"b": "v"})]
                    ).assign(one=np.int64(1)),
                    batch_format="pandas",
                ),
                ["v"],
                {"deg": ("sum", "one")},
            )
            .to_pandas()
            .astype({"v": np.int64, "deg": np.int64})
        )

    tri = grouped_aggregate(
        closed_counts,
        ["v"],
        {"tri": ("sum", "tri")},
    ).to_pandas()
    out = deg[deg["deg"] >= 2].merge(tri, on="v", how="left").fillna({"tri": 0})
    out["coeff"] = np.round(
        2.0 * out["tri"].to_numpy(dtype=np.float64)
        / (out["deg"].to_numpy(dtype=np.float64) * (out["deg"].to_numpy(dtype=np.float64) - 1.0)),
        6,
    )
    out = out.rename(columns={"v": "part"})
    return (
        out[["part", "deg", "tri", "coeff"]]
        .astype({"part": np.int64, "deg": np.int64, "tri": np.int64})
        .sort_values("part")
        .reset_index(drop=True)
    )


SQL_CLUSTERING_COEFF = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_CLUSTER_COEFF_MIN_ORDERS}
),
adj AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT v, count(*) AS deg FROM adj GROUP BY 1),
tri AS (
  SELECT a1.v, count(*) AS tri
  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.w < a2.w
  JOIN e ON e.a = a1.w AND e.b = a2.w
  GROUP BY a1.v
)
SELECT CAST(d.v AS BIGINT) AS part,
       CAST(d.deg AS BIGINT) AS deg,
       CAST(coalesce(t.tri, 0) AS BIGINT) AS tri,
       round(2.0 * coalesce(t.tri, 0) / (d.deg * (d.deg - 1.0)), 6) AS coeff
FROM deg d LEFT JOIN tri t ON d.v = t.v
WHERE d.deg >= 2
ORDER BY part
"""


def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty score: the fraction of a document's
    distinct 8-token shingles that NO lower-numbered document contains —
    the "how much new text does this doc add" curation signal
    (complementary to `ngram_span_dedup`'s duplication audit; a crawl
    pipeline sorts by novelty to prioritize ingestion).

    Same single shingle-hash co-partition as `ngram_span_dedup`: a
    shingle lives in exactly one bucket, so the in-bucket min(doc_id)
    IS the global first-occurrence — per-doc novel counts come out of
    the same exchange with no join-back; a doc-hash fold then sums
    per-doc partials.  The novelty ratio is one exact int/int division
    (identical on both engines — no rounding needed).  Zero-shingle
    docs ride along as null markers."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_doc: list[int] = []
        out_sh: list[str | None] = []
        for did, text in zip(doc_ids, texts):
            toks = text.split()
            if len(toks) < _SPAN_NGRAM:
                out_doc.append(did)
                out_sh.append(None)
                continue
            seen = {
                " ".join(toks[i : i + _SPAN_NGRAM])
                for i in range(len(toks) - _SPAN_NGRAM + 1)
            }
            out_doc.extend([did] * len(seen))
            out_sh.extend(seen)
        df = pd.DataFrame({"doc_id": out_doc, "s": out_sh})
        h = pd.util.hash_array(df["s"].fillna("").to_numpy(dtype=object))
        df["__bucket"] = np.where(df["s"].isna(), -1, (h % 64).astype(np.int64))
        return df

    def bucket_novel(df: pd.DataFrame) -> pd.DataFrame:
        nulls = df["s"].isna()
        zero = df.loc[nulls, ["doc_id"]].drop_duplicates().assign(n_sh=0, n_novel=0)
        body = df.loc[~nulls].drop_duplicates(["doc_id", "s"])
        if len(body) == 0:
            return zero
        first = body.groupby("s", sort=False)["doc_id"].transform("min")
        per = body.assign(nov=(body["doc_id"] == first).astype(np.int64)).groupby(
            "doc_id", sort=False
        )
        counts = per.agg(n_sh=("s", "size"), n_novel=("nov", "sum")).reset_index()
        return pd.concat([counts, zero], ignore_index=True)

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: bucket_novel(df.drop(columns=["__bucket"])), batch_format="pandas")
    )

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__b2=(df["doc_id"].to_numpy() % 32).astype(np.int32))

    def doc_sum(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False, sort=False).agg(
            n_shingles=("n_sh", "sum"), n_novel=("n_novel", "sum")
        )
        n = out["n_shingles"].to_numpy().astype(np.int64)
        v = out["n_novel"].to_numpy().astype(np.int64)
        out["n_shingles"] = n
        out["n_novel"] = v
        out["novelty"] = np.where(n == 0, 0.0, v / np.where(n == 0, 1, n))
        return out

    return (
        partials.map_batches(doc_bucket, batch_format="pandas")
        .groupby("__b2")
        .map_groups(lambda df: doc_sum(df.drop(columns=["__b2"])), batch_format="pandas")
    )


SQL_NGRAM_NOVELTY = f"""
WITH toks AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+') AS t
  FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - {_SPAN_NGRAM - 1}, 0))) AS i
  FROM toks
),
pairs AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i + {_SPAN_NGRAM - 1}], ' ') AS s FROM idx
),
firsts AS (SELECT s, min(doc_id) AS md FROM pairs GROUP BY s),
perdoc AS (
  SELECT p.doc_id,
         count(*) AS n_sh,
         count(*) FILTER (WHERE f.md = p.doc_id) AS n_novel
  FROM pairs p JOIN firsts f USING (s)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(n_sh, 0) AS BIGINT)    AS n_shingles,
       CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
       CASE WHEN coalesce(n_sh, 0) = 0 THEN 0.0
            ELSE CAST(n_novel AS DOUBLE) / n_sh END AS novelty
FROM (SELECT doc_id FROM documents) d LEFT JOIN perdoc USING (doc_id)
"""


_DAY_US = 86_400_000_000


#: distinct histogram values above which a quantile-threshold metric
#: stops collecting its exact value-count histogram and routes through
#: the mergeable t-digest (≤1% rank error, fixed-width partials)
RFM_HIST_BUDGET = 20_000_000


def q_rfm_segments(sf_dir: str):
    return _rfm_segments(sf_dir)


def _rfm_segments(sf_dir: str, *, hist_domain_budget: int = RFM_HIST_BUDGET):
    """RFM customer segmentation: per customer, Recency (days since
    last order, vs the corpus max date), Frequency (order count) and
    Monetary (integer-cent revenue), each scored into exact quintiles —
    the canonical marketing-segmentation pipeline, and the same
    quantile-threshold bucketize every feature-binning step uses.

    All three metrics reduce exactly (max / count / int-sum partials)
    through the open-domain fold.  Threshold routing, per metric: while
    the value-count histogram stays under ``hist_domain_budget``
    distinct values (recency ≤ date range, frequency ≤ max
    orders/customer, monetary ≤ distinct cent totals) it collects
    exactly and `_quantile_from_hist` reproduces DuckDB's quantile_cont
    bit-exactly; past the budget the metric's quintile thresholds come
    from the in-repo mergeable t-digest (fixed-width centroid partials,
    values never shuffle, ≤1% rank error — pytest forces this route
    and bounds the rank drift).  Scores are integer threshold
    comparisons — recency inverted (recent = high score) — so the
    output is all-int deterministic."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {"c_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False), "us": us, "cents": cents}
            )
            .groupby("c_custkey", as_index=False)
            .agg(last_us=("us", "max"), f_orders=("us", "count"), m_cents=("cents", "sum"))
        )

    per_cust = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["c_custkey"],
        {"last_us": ("max", "last_us"), "f_orders": ("sum", "f_orders"), "m_cents": ("sum", "m_cents")},
    ).materialize()

    gmax = int(per_cust.max("last_us"))

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        r = (gmax - df["last_us"].to_numpy(dtype=np.int64)) // _DAY_US
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"],
                "r_days": r.astype(np.int64),
                "f_orders": df["f_orders"].to_numpy(dtype=np.int64),
                "m_cents": df["m_cents"].to_numpy(dtype=np.int64),
            }
        )

    base = per_cust.map_batches(metrics, batch_format="pandas").materialize()

    def hist_ds_of(col: str):
        def vc(df: pd.DataFrame) -> pd.DataFrame:
            return df[[col]].value_counts().reset_index(name="cnt")

        return grouped_aggregate(
            base.map_batches(vc, batch_format="pandas"), [col], {"cnt": ("sum", "cnt")},
            small_keys=True,
        )

    thresholds = {}
    for col in ("r_days", "f_orders", "m_cents"):
        h_ds = hist_ds_of(col)
        if h_ds.count() <= hist_domain_budget:
            h = h_ds.to_pandas().sort_values(col)
            vals = h[col].to_numpy(dtype=np.float64)
            cnts = h["cnt"].to_numpy(dtype=np.int64)
            thresholds[col] = [
                _quantile_from_hist(vals, cnts, q) for q in (0.2, 0.4, 0.6, 0.8)
            ]
        else:
            # t-digest route: the metric's value domain outgrew the
            # exact histogram — mergeable centroids, values never shuffle
            from ..stages.tdigest import tdigest_column, tdigest_quantile

            digest = tdigest_column(base, col)
            thresholds[col] = [
                float(x) for x in tdigest_quantile(digest, [0.2, 0.4, 0.6, 0.8])
            ]
    thr_bc = Broadcast(thresholds)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        t = thr_bc.get()

        def quintile(v: np.ndarray, qs) -> np.ndarray:
            s = np.ones(len(v), dtype=np.int64)
            for q in qs:
                s += (v > q).astype(np.int64)
            return s

        r_q = quintile(df["r_days"].to_numpy(dtype=np.float64), t["r_days"])
        f_q = quintile(df["f_orders"].to_numpy(dtype=np.float64), t["f_orders"])
        m_q = quintile(df["m_cents"].to_numpy(dtype=np.float64), t["m_cents"])
        r_score = 6 - r_q  # recent (small r_days) = high score
        out = df.assign(r_score=r_score, f_score=f_q, m_score=m_q)
        out["rfm"] = 100 * out["r_score"] + 10 * out["f_score"] + out["m_score"]
        return out

    return base.map_batches(score, batch_format="pandas")


SQL_RFM = f"""
WITH g AS (SELECT max(epoch_us(o_orderdate)) AS gmax FROM orders),
base AS (
  SELECT o_custkey AS c_custkey,
         (g.gmax - max(epoch_us(o_orderdate))) // {_DAY_US} AS r_days,
         CAST(count(*) AS BIGINT) AS f_orders,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_cents
  FROM orders, g
  GROUP BY o_custkey, g.gmax
),
q AS (
  SELECT
    quantile_cont(r_days, 0.2) AS r1, quantile_cont(r_days, 0.4) AS r2,
    quantile_cont(r_days, 0.6) AS r3, quantile_cont(r_days, 0.8) AS r4,
    quantile_cont(f_orders, 0.2) AS f1, quantile_cont(f_orders, 0.4) AS f2,
    quantile_cont(f_orders, 0.6) AS f3, quantile_cont(f_orders, 0.8) AS f4,
    quantile_cont(m_cents, 0.2) AS m1, quantile_cont(m_cents, 0.4) AS m2,
    quantile_cont(m_cents, 0.6) AS m3, quantile_cont(m_cents, 0.8) AS m4
  FROM base
),
scored AS (
  SELECT b.c_custkey, b.r_days, b.f_orders, b.m_cents,
         6 - (1 + CAST(b.r_days > q.r1 AS INT) + CAST(b.r_days > q.r2 AS INT)
                + CAST(b.r_days > q.r3 AS INT) + CAST(b.r_days > q.r4 AS INT)) AS r_score,
         1 + CAST(b.f_orders > q.f1 AS INT) + CAST(b.f_orders > q.f2 AS INT)
           + CAST(b.f_orders > q.f3 AS INT) + CAST(b.f_orders > q.f4 AS INT) AS f_score,
         1 + CAST(b.m_cents > q.m1 AS INT) + CAST(b.m_cents > q.m2 AS INT)
           + CAST(b.m_cents > q.m3 AS INT) + CAST(b.m_cents > q.m4 AS INT) AS m_score
  FROM base b, q
)
SELECT c_custkey, CAST(r_days AS BIGINT) AS r_days, f_orders, m_cents,
       CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(100 * r_score + 10 * f_score + m_score AS BIGINT) AS rfm
FROM scored
"""


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids, unnested to (label, dim, centroid)
    rows — the class-prototype computation behind nearest-centroid
    classifiers, SemDeDup cluster pruning, and drift monitors.

    One streaming pass reduces (Σx, n) matrix partials per label —
    |labels|·(d+1) floats per batch, never rows — through the
    small-keys fold; division and a 6-dp round finalize.  The SQL
    mirror zips ``unnest(embedding)`` with its subscript stream and
    averages per (label, dim)."""
    from ..stages.similarity import _as_matrix

    ds = read_table(sf_dir, "embeddings", columns=["embedding", "label"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = _as_matrix(batch["embedding"]).astype(np.float64)
        lab = batch["label"].to_numpy(zero_copy_only=False)
        rows = []
        for lb in np.unique(lab):
            sel = m[lab == lb]
            s = sel.sum(axis=0)
            for d in range(m.shape[1]):
                rows.append((int(lb), d + 1, s[d], len(sel)))
        return pd.DataFrame(rows, columns=["label", "dim", "s", "n"])

    folded = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["label", "dim"],
            {"s": ("sum", "s"), "n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
    )
    folded["centroid"] = np.round(folded["s"] / folded["n"], 6)
    out = folded.astype({"label": np.int64, "dim": np.int64})
    return out[["label", "dim", "centroid"]].sort_values(["label", "dim"]).reset_index(drop=True)


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim,
       round(sum(CAST(val AS DOUBLE)) / count(*), 6) AS centroid
FROM (
  SELECT label,
         unnest(range(1, len(embedding) + 1)) AS dim,
         unnest(embedding) AS val
  FROM embeddings
)
GROUP BY label, dim
ORDER BY label, dim
"""


_MMR_LAMBDA = 0.5
_MMR_K = 10
_MMR_POOL = 50


def q_mmr_select(sf_dir: str):
    """Maximal-marginal-relevance diverse top-k: greedily pick 10
    vectors maximizing λ·relevance − (1−λ)·max-similarity-to-selected,
    relevance = cosine to the vec_id-0 probe — the diversity-aware
    retrieval step RAG rerankers and dedup-aware samplers run.

    Scale split: the RELEVANCE scan + top-50 candidate pool is
    distributed (same per-batch prefilter as `topk`); the greedy MMR
    loop — inherently sequential, O(k·pool·d) — runs on the driver
    over the pool only, which is the standard shape (pool size, not
    corpus size, bounds driver work).  The probe document itself is
    EXCLUDED from the candidates (self-retrieval is useless for a
    diversifier, and with λ=0.5 it degenerates every later score to
    0.5·rel − 0.5·sim-to-probe ≡ 0, making selection float-noise).
    Rows-only (greedy argmax recursion is not SQL-expressible); the
    greedy invariant is property-tested in tests/test_queries_units.py
    and the selection is parity-gated by `mmr_gate`."""
    import pyarrow.compute as pc

    from ..stages.similarity import _as_matrix, _normalize
    from .tabular import topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)

    # probe vector: distributed filter, one row drains
    probe_row = ds.filter(expr="vec_id == 0").take(1)[0]
    qv = np.asarray(probe_row["embedding"], dtype=np.float64)
    qv /= np.linalg.norm(qv)
    q_bc = Broadcast(qv)

    def rel(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.not_equal(batch["vec_id"], 0))  # drop the probe
        m = _normalize(_as_matrix(batch["embedding"]))
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(zero_copy_only=False),
                "rel": m @ q_bc.get() if len(batch) else np.zeros(0),
            }
        )

    pool = (
        topk(ds.map_batches(rel, batch_format="pyarrow"), ["rel", "vec_id"], _MMR_POOL,
             descending=[True, False])
        .to_pandas()
    )
    ids = pool["vec_id"].to_numpy()
    id_bc = Broadcast(pa.array(ids, type=pa.int64()))

    # pool vectors: distributed semi-filter, ≤ pool rows drain
    def grab(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"], value_set=id_bc.get()))

    vec_df = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    order = {int(v): i for i, v in enumerate(vec_df["vec_id"])}
    mat = _normalize(np.array([np.asarray(e) for e in vec_df["embedding"]], dtype=np.float64))
    rels = dict(zip(pool["vec_id"], pool["rel"]))

    selected: list[int] = []
    remaining = list(ids)
    while len(selected) < _MMR_K and remaining:
        best, best_score = None, -np.inf
        for cand in remaining:
            r = rels[cand]
            if selected:
                sim = max(float(mat[order[cand]] @ mat[order[s]]) for s in selected)
            else:
                sim = 0.0
            score = _MMR_LAMBDA * r - (1.0 - _MMR_LAMBDA) * sim
            if score > best_score or (score == best_score and (best is None or cand < best)):
                best, best_score = cand, score
        selected.append(best)
        remaining.remove(best)
    return pd.DataFrame(
        {"rank": np.arange(1, len(selected) + 1, dtype=np.int64),
         "vec_id": np.array(selected, dtype=np.int64)}
    )


_ROLLMED_W = 5


def q_rolling_median(sf_dir: str):
    """Per-user rolling median of the last 5 event values (ordered by
    ts, event_id) — the robust smoothing window that `moving_avg`'s
    mean can't provide under outliers.

    Same one-exchange bucketed-ordered-scan as sessionize; in-bucket
    the window is a vectorized pandas ``rolling(5, min_periods=1)``
    median per user.  Values are integer cents, and a median is either
    a cent value or an exact half-sum of two — exact in float64, so
    the DuckDB windowed ``quantile_cont(0.5)`` mirror matches
    bit-for-bit after the /100 rescale."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "us": us,
                "cents": cents,
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        med = (
            df.groupby("user_id", sort=False)["cents"]
            .rolling(_ROLLMED_W, min_periods=1)
            .median()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "rolling_median": med / 100.0,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: roll(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_ROLLING_MEDIAN = f"""
SELECT event_id, user_id,
       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN {_ROLLMED_W - 1} PRECEDING AND CURRENT ROW
       ) / 100.0 AS rolling_median
FROM events
"""


_DECAY_LAMBDA = 0.1  # per day


def q_decayed_value(sf_dir: str):
    """Exponentially time-decayed value sum per user, decayed to a FIXED
    reference instant (the corpus max ts) — the freshness-weighted
    engagement score behind recency-aware rankers.

    The associativity trick that makes this a one-pass streaming
    aggregate: decaying every event to the same reference time turns
    the sequential decay recurrence into a plain weighted sum
    Σ value·exp(−λ·age), which partials-and-folds in any order.  The
    reference instant comes from one distributed ``max()`` scalar.
    Weights are floats — both engines evaluate the identical
    exp expression per row and the per-user sums (≤ dozens of terms)
    round to 6."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"], split=True)

    ref_us = int(
        ds.map_batches(
            lambda b: pd.DataFrame(
                {"m": [b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64").max()]}
            ),
            batch_format="pyarrow",
        ).max("m")
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        age_days = (ref_us - us) / float(_DAY_US)
        w = np.exp(-_DECAY_LAMBDA * age_days)
        v = batch["value"].to_numpy(zero_copy_only=False)
        return (
            pd.DataFrame({"user_id": batch["user_id"].to_numpy(zero_copy_only=False), "dv": v * w})
            .groupby("user_id", as_index=False)["dv"]
            .sum()
        )

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["user_id"], {"dv": ("sum", "dv")}
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df["user_id"], "decayed_value": np.round(df["dv"], 6)}
        )

    return out.map_batches(finalize, batch_format="pandas")


SQL_DECAYED_VALUE = f"""
WITH r AS (SELECT max(epoch_us(ts)) AS ref FROM events)
SELECT user_id,
       round(sum(value * exp(-{_DECAY_LAMBDA} * ((r.ref - epoch_us(ts)) / {float(_DAY_US)}))), 6)
         AS decayed_value
FROM events, r
GROUP BY user_id
"""


def q_audience_segments(sf_dir: str):
    """Set-algebra audience builder: per user, membership flags for
    each event type, then the inclusion-exclusion segment counts a
    campaign tool reports — purchasers, clickers-who-never-purchased,
    viewers-without-click-or-purchase, and the grand total.

    Per-(user, type) DISTINCT pairs fold once (the batch is the
    combiner); a second co-partitioned pass ORs each user's flags; the
    bounded segment counts fold driver-side.  All integers."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"], split=True)

    def flags(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "event_type": batch["event_type"].to_pandas(),
            }
        ).drop_duplicates()
        piv = (
            df.assign(one=1)
            .pivot_table(index="user_id", columns="event_type", values="one", fill_value=0,
                         aggfunc="max")
            .reset_index()
        )
        for c in ("view", "click", "purchase"):
            if c not in piv.columns:
                piv[c] = 0
        return piv[["user_id", "view", "click", "purchase"]]

    per_user = grouped_aggregate(
        ds.map_batches(flags, batch_format="pyarrow"),
        ["user_id"],
        {"view": ("max", "view"), "click": ("max", "click"), "purchase": ("max", "purchase")},
    )

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["view"].to_numpy(dtype=bool)
        c = df["click"].to_numpy(dtype=bool)
        p = df["purchase"].to_numpy(dtype=bool)
        return pd.DataFrame(
            {
                "purchasers": [int(p.sum())],
                "clickers_no_purchase": [int((c & ~p).sum())],
                "viewers_only": [int((v & ~c & ~p).sum())],
                "any_user": [len(df)],
            }
        )

    seg = per_user.map_batches(seg_partial, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame(
        {
            "purchasers": [int(seg["purchasers"])],
            "clickers_no_purchase": [int(seg["clickers_no_purchase"])],
            "viewers_only": [int(seg["viewers_only"])],
            "any_user": [int(seg["any_user"])],
        }
    )


SQL_AUDIENCE = """
WITH f AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id
)
SELECT CAST(sum(p) AS BIGINT) AS purchasers,
       CAST(sum(CASE WHEN c = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS clickers_no_purchase,
       CAST(sum(CASE WHEN v = 1 AND c = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS viewers_only,
       CAST(count(*) AS BIGINT) AS any_user
FROM f
"""


_PATH_LEN = 5


def q_user_paths(sf_dir: str):
    """User-journey path strings: each user's first 5 event types in
    (ts, event_id) order joined with '>' plus the path's population
    count — the Sankey/journey-analysis input table.

    One user-hash exchange; the in-bucket ordered head-N concat is a
    groupby-head + string join (deterministic order), and the
    open-domain path counts fold through the standard exchange.  The
    SQL mirror orders inside ``string_agg`` over a ranked head-5
    subquery."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "us": us,
                "event_type": batch["event_type"].to_pandas(),
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def paths(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        head = df.groupby("user_id", sort=False).head(_PATH_LEN)
        p = head.groupby("user_id", sort=False)["event_type"].agg(">".join).reset_index(name="path")
        return p.groupby("path", as_index=False).size().rename(columns={"size": "n"})

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: paths(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    out = grouped_aggregate(counted, ["path"], {"n_users": ("sum", "n")})

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(n_users=df["n_users"].astype(np.int64))

    return out.map_batches(typed, batch_format="pandas")


SQL_USER_PATHS = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
         epoch_us(ts) AS us, event_id
  FROM events
),
p AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path
  FROM ranked WHERE rn <= {_PATH_LEN}
  GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p GROUP BY path
"""


_DBL_WINDOW_DAYS = 7


def q_rapid_reorder(sf_dir: str):
    """Rapid-reorder audit: pairs of orders by the SAME customer placed
    within 7 days of each other — the double-charge / split-shipment
    data-quality sweep, and the equality-blocking + time-window verify
    shape of record linkage (block on the entity key, verify the
    window).

    ONE exchange on custkey hash co-locates each customer's orders;
    the in-bucket candidate set is the per-customer self-merge
    (fan-out bounded by orders-per-customer²) with a vectorized ±7-day
    check.  Pure ints; pair order normalized (earlier orderkey
    first)."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "us": us,
                "__bucket": (batch["o_custkey"].to_numpy() % 32).astype(np.int32),
            }
        )

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="o_custkey", suffixes=("_a", "_b"))
        m = m[m["o_orderkey_a"] < m["o_orderkey_b"]]
        dt = np.abs(m["us_a"].to_numpy() - m["us_b"].to_numpy())
        keep = dt <= _DBL_WINDOW_DAYS * _DAY_US
        m = m[keep]
        gap = (np.abs(m["us_a"].to_numpy() - m["us_b"].to_numpy()) // _DAY_US).astype(np.int64)
        return pd.DataFrame(
            {
                "o_custkey": m["o_custkey"].to_numpy(),
                "order_a": m["o_orderkey_a"].to_numpy(),
                "order_b": m["o_orderkey_b"].to_numpy(),
                "gap_days": gap,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: audit(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_RAPID_REORDER = f"""
SELECT a.o_custkey,
       a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) // {_DAY_US} AS BIGINT) AS gap_days
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND abs(epoch_us(a.o_orderdate) - epoch_us(b.o_orderdate)) <= {_DBL_WINDOW_DAYS} * {_DAY_US}
"""


_ZIPF_TOP = 500


def q_zipf_slope(sf_dir: str):
    """Zipf's-law fit over the corpus vocabulary: OLS slope/intercept of
    ln(freq) vs ln(rank) for the top-500 tokens — the one-number
    sanity check that a scraped corpus has natural-language token
    statistics (a slope far from ≈−1 flags boilerplate or spam).

    Token counts fold through the open-domain exchange (the batch is
    the combiner); the top-500 selection is `topk`'s per-batch
    prefilter with the deterministic (count DESC, token ASC) rule, and
    the OLS closed form runs over 500 (ln r, ln f) pairs driver-side —
    the vocabulary never materializes beyond the top slice.  Mirrored
    op order; rounded to 6."""
    from .tabular import topk

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        toks: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for w in (t or "").split():
                toks[w] = toks.get(w, 0) + 1
        return pd.DataFrame({"token": list(toks.keys()), "n": list(toks.values())})

    vocab = grouped_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"), ["token"], {"n": ("sum", "n")}
    )
    top = (
        topk(vocab, ["n", "token"], _ZIPF_TOP, descending=[True, False])
        .to_pandas()
        .reset_index(drop=True)
    )
    r = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    f = np.log(top["n"].to_numpy(dtype=np.float64))
    n = float(len(top))
    sx, sy = r.sum(), f.sum()
    sxy, sxx = float(np.sum(r * f)), float(np.sum(r * r))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame(
        {
            "slope": [round(slope, 6)],
            "intercept": [round(intercept, 6)],
            "n_points": [int(n)],
        }
    )


SQL_ZIPF = f"""
WITH toks AS (
  SELECT unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
ranked AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, token) AS DOUBLE)) AS x,
         ln(CAST(n AS DOUBLE)) AS y
  FROM vocab
  ORDER BY n DESC, token
  LIMIT {_ZIPF_TOP}
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
       CAST(n AS BIGINT) AS n_points
FROM s
"""


_RDU_WINDOW_H = 24


#: window width (hours) above which the exact sliding-distinct's
#: ×window replication fan-out is traded for HLL register merges
RDU_EXACT_WINDOW_BUDGET = 168  # one week of hourly ticks


def q_rolling_distinct_users(sf_dir: str):
    return _rolling_distinct_users(sf_dir)


def _rolling_distinct_users(
    sf_dir: str,
    *,
    window_h: int | None = None,
    exact_window_budget: int = RDU_EXACT_WINDOW_BUDGET,
):
    """Trailing-24h distinct active users per hour tick — the windowed
    COUNT DISTINCT that dashboards call "rolling DAU", and the classic
    case where a sliding window over a DISTINCT aggregate cannot be
    post-aggregated from per-hour counts.

    Exact two-level distinct shape: (user, hour) pairs dedupe in-batch,
    fold once; each active hour then REPLICATES to the ≤window ticks
    it covers (the bounded fan-out every exact sliding-distinct pays);
    a second distinct-fold per (tick, user) collapses multi-hour users,
    and the final per-tick count is exact.  Ticks outside the data
    range are clipped to the observed hour span.  All integers.

    Window routing: past ``exact_window_budget`` hours the ×window
    replication fan-out is no longer worth exactness and the sweep
    swaps to the in-repo HLL — per-hour user registers fold once
    (hour-bounded, not row-bounded), each tick MERGES its window's
    registers (register max, not row replication) and reports the HLL
    estimate.  A pytest forces the sketch route on the 24 h window and
    bounds its error against the exact counts (±2% at p=14)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)
    if window_h is None:
        window_h = _RDU_WINDOW_H
    if window_h > exact_window_budget:
        return _rolling_distinct_users_hll(ds, window_h)

    def user_hours(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        hour = us // 3_600_000_000
        return pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False), "hour": hour}
        ).drop_duplicates()

    uh = grouped_aggregate(
        ds.map_batches(user_hours, batch_format="pyarrow"),
        ["user_id", "hour"],
        {"n": ("count", None)},
    ).materialize()

    hmin = int(uh.min("hour"))
    hmax = int(uh.max("hour"))

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        h = df["hour"].to_numpy(dtype=np.int64)
        u = df["user_id"].to_numpy(dtype=np.int64)
        reps = np.repeat(np.arange(window_h, dtype=np.int64), len(h))
        ticks = np.tile(h, window_h) + reps
        users = np.tile(u, window_h)
        keep = ticks <= hmax
        return pd.DataFrame({"tick": ticks[keep], "user_id": users[keep]}).drop_duplicates()

    covered = grouped_aggregate(
        uh.map_batches(replicate, batch_format="pandas"),
        ["tick", "user_id"],
        {"n": ("count", None)},
    )

    def per_tick(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("tick", as_index=False).size().rename(columns={"size": "active_users"})
        return out

    out = grouped_aggregate(
        covered.map_batches(per_tick, batch_format="pandas"),
        ["tick"],
        {"active_users": ("sum", "active_users")},
    ).to_pandas()
    out = out[out["tick"] >= hmin]
    return (
        out.astype({"tick": np.int64, "active_users": np.int64})
        .sort_values("tick")[["tick", "active_users"]]
        .reset_index(drop=True)
    )


def _rolling_distinct_users_hll(ds, window_h: int):
    """Sketch route of :func:`_rolling_distinct_users` — per-hour HLL
    registers fold distributedly (one fixed-width register array per
    ACTIVE HOUR, not per row), each tick merges its trailing window's
    registers by register-max on the driver (hour-bounded state) and
    reports the estimate.  Used when the window width makes the exact
    ×window replication fan-out uneconomical."""
    from ..stages.sketch import hll_estimate, hll_merge, hll_partial

    def hour_regs(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        hour = us // 3_600_000_000
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        rows = []
        for h in np.unique(hour):
            regs = hll_partial(uid[hour == h])
            rows.append({"hour": int(h), "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    partials = ds.map_batches(hour_regs, batch_format="pyarrow").to_pandas()
    # register-max fold per hour: hour-bounded driver state (the same
    # footprint class as the exact path's hmin/hmax scalars × |hours|)
    by_hour: dict[int, np.ndarray] = {}
    for h, blob in zip(partials["hour"], partials["regs"]):
        regs = np.frombuffer(blob, dtype=np.uint8)
        cur = by_hour.get(int(h))
        by_hour[int(h)] = regs if cur is None else np.maximum(cur, regs)
    hours = sorted(by_hour)
    hmin, hmax = hours[0], hours[-1]
    out_rows = []
    for tick in range(hmin, hmax + 1):
        window = [by_hour[h] for h in range(tick - window_h + 1, tick + 1) if h in by_hour]
        if not window:
            continue
        out_rows.append(
            {"tick": tick, "active_users": int(round(hll_estimate(hll_merge(window))))}
        )
    return pd.DataFrame(out_rows).astype(np.int64)


SQL_ROLLING_DISTINCT = f"""
WITH uh AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS hour FROM events
),
bounds AS (SELECT min(hour) AS hmin, max(hour) AS hmax FROM uh),
cov AS (
  SELECT DISTINCT uh.hour + r.range AS tick, uh.user_id
  FROM uh, range({_RDU_WINDOW_H}) r, bounds b
  WHERE uh.hour + r.range <= b.hmax
)
SELECT CAST(tick AS BIGINT) AS tick,
       CAST(count(*) AS BIGINT) AS active_users
FROM cov, bounds b
WHERE tick >= b.hmin
GROUP BY tick ORDER BY tick
"""


_PARETO_SHARE = 0.8


#: entity rows above which the Pareto sweep stops draining the
#: per-entity totals and runs the bucketed two-pass rank instead
PARETO_DRAIN_BUDGET = 20_000_000


def q_pareto_8020(sf_dir: str):
    return _pareto_8020(sf_dir)


def _pareto_8020(sf_dir: str, *, drain_budget: int = PARETO_DRAIN_BUDGET):
    """Pareto concentration: the smallest number of customers whose
    revenue sums to ≥ 80% of total, plus their share of the customer
    base — the 80/20 report every revenue (or per-domain corpus-mass)
    analysis opens with.

    Per-customer integer-cent revenue folds through the open-domain
    exchange.  Sweep routing: at or under ``drain_budget`` entities the
    sorted cumulative sweep runs over a driver drain of the totals
    (dimension-scale by the fact→entity reduction); above it the SAME
    answer comes EXACTLY from the bucketed two-pass rank (the
    `vocab_build` device): revenues fold into order-aligned log2
    buckets (≤64 (count, sum) partials — every value in a higher
    bucket outranks every value in a lower one by construction), the
    crossing bucket is located on ≤64 integers, and a second pass
    drains ONLY that bucket's rows to resolve the exact k and
    boundary-cumulative.  Both routes are proven identical by pytest
    (``drain_budget=0`` forces the bucketed rank).  Deterministic:
    revenue ties broken by custkey, all integers until the two
    mirrored final divisions."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame({"c": batch["o_custkey"].to_numpy(zero_copy_only=False), "rev": cents})
            .groupby("c", as_index=False)["rev"]
            .sum()
        )

    per_cust_ds = grouped_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"), ["c"], {"rev": ("sum", "rev")}
    ).materialize()
    n = int(per_cust_ds.count())

    if n <= drain_budget:
        per_cust = per_cust_ds.to_pandas().sort_values(
            ["rev", "c"], ascending=[False, True], kind="stable"
        )
        rev = per_cust["rev"].to_numpy(dtype=np.int64)
        total = int(rev.sum())
        cum = np.cumsum(rev)
        k = int(np.searchsorted(cum, int(np.ceil(_PARETO_SHARE * total)), side="left") + 1)
        cum_at_k = int(cum[k - 1])
    else:
        # bucketed two-pass exact rank (entity table outgrew the drain)
        total = int(per_cust_ds.sum("rev"))
        target = int(np.ceil(_PARETO_SHARE * total))

        def bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
            r = df["rev"].to_numpy(dtype=np.int64)
            b = np.log2(np.maximum(r, 1)).astype(np.int64)
            return (
                pd.DataFrame({"b": b, "cnt": np.int64(1), "s": r})
                .groupby("b", as_index=False)
                .agg(cnt=("cnt", "sum"), s=("s", "sum"))
            )

        buckets = (
            grouped_aggregate(
                per_cust_ds.map_batches(bucket_partial, batch_format="pandas"),
                ["b"],
                {"cnt": ("sum", "cnt"), "s": ("sum", "s")},
                small_keys=True,  # ≤64 log2 buckets
            )
            .to_pandas()
            .sort_values("b", ascending=False)
        )
        cum_s = buckets["s"].cumsum().to_numpy(dtype=np.int64)
        cum_n = buckets["cnt"].cumsum().to_numpy(dtype=np.int64)
        i = int(np.searchsorted(cum_s, target, side="left"))
        bb = int(buckets["b"].iloc[i])  # the crossing bucket
        sum_above = int(cum_s[i - 1]) if i > 0 else 0
        n_above = int(cum_n[i - 1]) if i > 0 else 0
        # second pass: only the crossing bucket's rows drain
        boundary = per_cust_ds.filter(
            expr=f"rev >= {1 << bb} and rev < {1 << (bb + 1)}"
            if bb > 0
            else f"rev < {1 << (bb + 1)}"
        ).to_pandas().sort_values(["rev", "c"], ascending=[False, True], kind="stable")
        bcum = sum_above + np.cumsum(boundary["rev"].to_numpy(dtype=np.int64))
        j = int(np.searchsorted(bcum, target, side="left"))
        k = n_above + j + 1
        cum_at_k = int(bcum[j])

    return pd.DataFrame(
        {
            "top_customers": [k],
            "n_customers": [n],
            "customer_share": [round(k / n, 6)],
            "revenue_share": [round(cum_at_k / total, 6)],
        }
    )


SQL_PARETO_8020 = f"""
WITH r AS (
  SELECT o_custkey AS c, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
w AS (
  SELECT rev,
         sum(rev) OVER (ORDER BY rev DESC, c
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         row_number() OVER (ORDER BY rev DESC, c) AS k,
         sum(rev) OVER () AS total,
         count(*) OVER () AS n
  FROM r
)
SELECT CAST(min(k) AS BIGINT) AS top_customers,
       CAST(min(n) AS BIGINT) AS n_customers,
       round(CAST(min(k) AS DOUBLE) / min(n), 6) AS customer_share,
       round(CAST(min(CASE WHEN cum >= ceil({_PARETO_SHARE} * total) THEN cum END) AS DOUBLE)
             / min(total), 6) AS revenue_share
FROM w
WHERE cum >= ceil({_PARETO_SHARE} * total)
"""


_RECS_K = 3


def q_part_recs(sf_dir: str):
    """Item-item recommendation serving table: for every part, its
    top-3 co-purchased parts by support (ties → smaller partner key) —
    the `copurchase_pairs` exchange composed with the grouped top-k
    prefilter, i.e. the full candidate-generation → ranking path of a
    neighborhood recommender.

    The pair counts fold once; each undirected pair then votes in BOTH
    directions (anchor ↔ partner) and `top_k_per_group` keeps 3 per
    anchor with a deterministic (support DESC, partner ASC) rule."""
    from .tabular import top_k_per_group

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        return (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(columns={"l_partkey_a": "a", "l_partkey_b": "b", "size": "n"})
        )

    folded = grouped_aggregate(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: pairs(df.drop(columns=["__bucket"])), batch_format="pandas"),
        ["a", "b"],
        {"support": ("sum", "n")},
    )

    def both_ways(df: pd.DataFrame) -> pd.DataFrame:
        fwd = df.rename(columns={"a": "part", "b": "rec"})
        rev = df.rename(columns={"b": "part", "a": "rec"})
        out = pd.concat([fwd, rev], ignore_index=True)[["part", "rec", "support"]]
        # order key: high support first, then smaller partner — encoded so
        # ONE ascending sort inside top_k_per_group is deterministic
        return out.assign(
            __ord=-(out["support"].to_numpy(dtype=np.int64) * np.int64(1 << 32))
            + out["rec"].to_numpy(dtype=np.int64)
        )

    ranked = top_k_per_group(
        folded.map_batches(both_ways, batch_format="pandas"),
        "part",
        "__ord",
        _RECS_K,
        descending=False,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["part", "__ord"], kind="stable")
        df["rank"] = df.groupby("part", sort=False).cumcount() + 1
        return df.astype({"part": np.int64, "rec": np.int64, "support": np.int64, "rank": np.int64})[
            ["part", "rec", "support", "rank"]
        ]

    return ranked.map_batches(finalize, batch_format="pandas")


SQL_PART_RECS = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pc AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS support
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
bi AS (
  SELECT a AS part, b AS rec, support FROM pc
  UNION ALL
  SELECT b, a, support FROM pc
),
ranked AS (
  SELECT part, rec, support,
         row_number() OVER (PARTITION BY part ORDER BY support DESC, rec) AS rank
  FROM bi
)
SELECT CAST(part AS BIGINT) AS part, CAST(rec AS BIGINT) AS rec,
       CAST(support AS BIGINT) AS support, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_RECS_K}
"""


_HR_ANOM_Z = 3.0


def q_hourly_anomaly(sf_dir: str):
    """Seasonal-baseline anomaly flags: each event's value is scored
    against ITS OWN (event_type, hour-of-day) population — the
    seasonality-aware variant of a global z-gate, the shape every
    metrics-monitoring pipeline uses for diurnal traffic.

    One streaming pass reduces exact integer-cent moments per
    (type, hour) — a bounded 5×24 domain — and a second pass flags
    |z| > 3 rows with the broadcast baseline.  Same two-pass broadcast
    shape as `zscore_normalize`, but keyed on a derived seasonal
    bucket.  Flag counts per (type, hour) keep the output bounded."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"], split=True)

    def moments(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        hour = (us // 3_600_000_000) % 24
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_pandas(), "hour": hour,
                 "c": cents, "cc": cents * cents}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .agg(n=("c", "count"), s=("c", "sum"), ss=("cc", "sum"))
        )

    stats = (
        grouped_aggregate(
            ds.map_batches(moments, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"n": ("sum", "n"), "s": ("sum", "s"), "ss": ("sum", "ss")},
            small_keys=True,
        )
        .to_pandas()
    )
    n = stats["n"].to_numpy(dtype=np.float64)
    s = stats["s"].to_numpy(dtype=np.float64)
    ss = stats["ss"].to_numpy(dtype=np.float64)
    mean = s / n
    # degenerate groups (n==1 or zero variance) get sd=0 and are never
    # flagged — mirrored by the CASE guard in SQL_HOURLY_ANOMALY (numpy
    # NaN comparisons are False while DuckDB orders NaN above numbers,
    # so an unguarded NaN z-score silently flips the two sides)
    var = np.where(n >= 2.0, (ss - s * s / n) / np.maximum(n - 1.0, 1.0), 0.0)
    sd = np.sqrt(np.maximum(var, 0.0))
    base = {
        (t, int(h)): (m, d)
        for t, h, m, d in zip(stats["event_type"], stats["hour"], mean, sd)
    }
    bc = Broadcast(base)

    def flag(batch: pa.Table) -> pd.DataFrame:
        b = bc.get()
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        hour = (us // 3_600_000_000) % 24
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        types = batch["event_type"].to_pandas()
        ms = np.array([b[(t, int(h))][0] for t, h in zip(types, hour)])
        sds = np.array([b[(t, int(h))][1] for t, h in zip(types, hour)])
        ok = sds > 0.0
        z = np.divide(cents - ms, sds, out=np.zeros_like(ms), where=ok)
        anom = (np.abs(z) > _HR_ANOM_Z) & ok
        return (
            pd.DataFrame({"event_type": types, "hour": hour, "anom": anom.astype(np.int64)})
            .groupby(["event_type", "hour"], as_index=False)["anom"]
            .sum()
        )

    out = grouped_aggregate(
        ds.map_batches(flag, batch_format="pyarrow"),
        ["event_type", "hour"],
        {"n_anomalies": ("sum", "anom")},
        small_keys=True,
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"hour": np.int64, "n_anomalies": np.int64})

    return out.map_batches(typed, batch_format="pandas")


SQL_HOURLY_ANOMALY = f"""
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, hour, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS s, CAST(sum(c * c) AS DOUBLE) AS ss
  FROM e GROUP BY 1, 2
)
SELECT e.event_type, CAST(e.hour AS BIGINT) AS hour,
       CAST(sum(CASE
                  WHEN g.n < 2 OR (g.ss - g.s * g.s / g.n) <= 0 THEN 0
                  WHEN abs((e.c - g.s / g.n) / sqrt((g.ss - g.s * g.s / g.n) / (g.n - 1.0)))
                       > {_HR_ANOM_Z} THEN 1
                  ELSE 0
                END) AS BIGINT) AS n_anomalies
FROM e JOIN g ON e.event_type = g.event_type AND e.hour = g.hour
GROUP BY e.event_type, e.hour
"""


def q_readability_score(sf_dir: str):
    """Flesch-style readability per document from three vectorizable
    counts — words, sentence marks, vowel-group "syllables" — the
    text-quality feature corpus filters use alongside `quality_score`.

    score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    with sentence count floored at 1.  Pure streaming map; the three
    counts are Arrow regex kernels (`pc.count_substring_regex`), and
    the SQL mirror uses the identical regexes so the integer counts
    match exactly; one mirrored float expression, rounded to 6."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def score(batch: pa.Table) -> pd.DataFrame:
        words = pc.count_substring_regex(batch["text"], r"\S+").to_numpy(zero_copy_only=False).astype(np.float64)
        sents = pc.count_substring_regex(batch["text"], r"[.!?]").to_numpy(zero_copy_only=False).astype(np.float64)
        syll = pc.count_substring_regex(batch["text"], r"[aeiouyAEIOUY]+").to_numpy(zero_copy_only=False).astype(np.float64)
        sents = np.maximum(sents, 1.0)
        w = np.maximum(words, 1.0)
        val = 206.835 - 1.015 * (w / sents) - 84.6 * (syll / w)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "n_words": words.astype(np.int64),
                "n_syllables": syll.astype(np.int64),
                "readability": np.round(val, 6),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


SQL_READABILITY = """
WITH c AS (
  SELECT doc_id,
         coalesce(array_length(regexp_extract_all(text, '\\S+')), 0) AS words,
         coalesce(array_length(regexp_extract_all(text, '[.!?]')), 0) AS sents,
         coalesce(array_length(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 0) AS syll
  FROM documents
)
SELECT doc_id,
       CAST(words AS BIGINT) AS n_words,
       CAST(syll AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (greatest(words, 1) / greatest(CAST(sents AS DOUBLE), 1.0))
                     - 84.6 * (syll / greatest(CAST(words AS DOUBLE), 1.0)), 6) AS readability
FROM c
"""


_K_ANON = 5


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier: equivalence-class sizes, the violating classes
    (size < 5), and the re-identifiable population — the privacy gate
    a release pipeline runs before publishing joined demographics.

    Quasi-ID class counts are a bounded-domain fold (|nations| ×
    |segments|); the audit summary is one driver pass over the tiny
    class table.  All integers."""
    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "c_nationkey": batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "c_mktsegment": batch["c_mktsegment"].to_pandas(),
                }
            )
            .value_counts(["c_nationkey", "c_mktsegment"])
            .reset_index(name="n")
        )

    cls = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["c_nationkey", "c_mktsegment"],
            {"class_size": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
    )
    viol = cls[cls["class_size"] < _K_ANON]
    return pd.DataFrame(
        {
            "n_classes": [len(cls)],
            "min_class_size": [int(cls["class_size"].min())],
            "violating_classes": [len(viol)],
            "reidentifiable_rows": [int(viol["class_size"].sum())],
        }
    )


SQL_K_ANON = f"""
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS class_size
  FROM customer GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(class_size) AS BIGINT) AS min_class_size,
       CAST(count(*) FILTER (WHERE class_size < {_K_ANON}) AS BIGINT) AS violating_classes,
       CAST(coalesce(sum(class_size) FILTER (WHERE class_size < {_K_ANON}), 0) AS BIGINT)
         AS reidentifiable_rows
FROM cls
"""


def q_seq_patterns(sf_dir: str):
    """Sequential-pattern support counts: for every ordered event-type
    pair (A, B), how many users have SOME A occurring before SOME B —
    the 2-sequence support table of GSP/PrefixSpan-style mining.

    The containment trick that avoids per-user pair enumeration: in
    the per-user (ts, event_id) ranking, "∃ A before B" ⟺
    min_rank(A) < max_rank(B) — so one user-hash exchange reduces each
    user to a |types|-row (min, max) summary and the pair join runs on
    THAT (|types|² per user, not events²).  All integers."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"], split=True)

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "us": us,
                "event_type": batch["event_type"].to_pandas(),
                "__bucket": (batch["user_id"].to_numpy() % 32).astype(np.int32),
            }
        )

    def support(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        df["rk"] = df.groupby("user_id", sort=False).cumcount() + 1
        mm = (
            df.groupby(["user_id", "event_type"], sort=False)["rk"]
            .agg(mn="min", mx="max")
            .reset_index()
        )
        m = mm.merge(mm, on="user_id", suffixes=("_a", "_b"))
        m = m[m["mn_a"] < m["mx_b"]]
        return (
            m.groupby(["event_type_a", "event_type_b"], as_index=False)
            .size()
            .rename(columns={"event_type_a": "type_a", "event_type_b": "type_b", "size": "n"})
        )

    counted = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: support(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    out = grouped_aggregate(
        counted, ["type_a", "type_b"], {"n_users": ("sum", "n")}, small_keys=True
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(n_users=df["n_users"].astype(np.int64))

    return out.map_batches(typed, batch_format="pandas")


SQL_SEQ_PATTERNS = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rk
  FROM events
),
mm AS (
  SELECT user_id, event_type, min(rk) AS mn, max(rk) AS mx
  FROM r GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM mm a JOIN mm b ON a.user_id = b.user_id AND a.mn < b.mx
GROUP BY 1, 2
"""


_DIV_TOP = 200


def q_source_divergence(sf_dir: str):
    """Corpus-mixture diagnostics: Jensen–Shannon divergence between
    each source's token distribution and the corpus-wide distribution,
    over the global top-200 tokens with +1 smoothing — the "is this
    domain drifting from the mix" gate a pre-training data pipeline
    runs per snapshot.

    (source, token) counts fold through the open-domain exchange; the
    top-token slice comes from `topk`'s prefilter on the corpus
    marginal; the JS algebra runs on the |sources|×200 slice
    driver-side with the SAME expression sequence as the SQL mirror.
    Counts are exact ints; the ≤400-term log sums round to 6."""
    from .tabular import topk

    ds = read_table(sf_dir, "documents", columns=["source", "text"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        rows: dict[tuple[str, str], int] = {}
        for src, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            for w in (t or "").split():
                rows[(src, w)] = rows.get((src, w), 0) + 1
        if not rows:
            return pd.DataFrame({"source": [], "token": [], "n": []})
        ks = list(rows.keys())
        return pd.DataFrame(
            {"source": [k[0] for k in ks], "token": [k[1] for k in ks], "n": list(rows.values())}
        )

    st = grouped_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"), ["source", "token"], {"n": ("sum", "n")}
    ).materialize()

    def marginal(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False)["n"].sum()

    corpus = grouped_aggregate(
        st.map_batches(marginal, batch_format="pandas"), ["token"], {"n": ("sum", "n")}
    )
    top = (
        topk(corpus, ["n", "token"], _DIV_TOP, descending=[True, False])
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )
    top_tokens = top["token"].tolist()
    tok_bc = Broadcast(set(top_tokens))

    def in_top(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["token"].isin(tok_bc.get())]

    slice_df = st.map_batches(in_top, batch_format="pandas").to_pandas()

    qc = top.set_index("token")["n"].reindex(top_tokens).to_numpy(dtype=np.float64)
    qn = qc.sum()
    q = (qc + 1.0) / (qn + float(_DIV_TOP))

    rows = []
    for src, g in sorted(slice_df.groupby("source"), key=lambda kv: kv[0]):
        cs = g.set_index("token")["n"].reindex(top_tokens).fillna(0).to_numpy(dtype=np.float64)
        ns = cs.sum()
        p = (cs + 1.0) / (ns + float(_DIV_TOP))
        m = 0.5 * (p + q)
        js = 0.5 * float(np.sum(p * np.log(p / m))) + 0.5 * float(np.sum(q * np.log(q / m)))
        rows.append({"source": src, "js_divergence": round(js, 6)})
    return pd.DataFrame(rows)


SQL_SOURCE_DIVERGENCE = f"""
WITH toks AS (
  SELECT source,
         unnest(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) AS token
  FROM documents
),
stc AS (SELECT source, token, count(*) AS n FROM toks GROUP BY 1, 2),
corpus AS (SELECT token, sum(n) AS n FROM stc GROUP BY 1),
top AS (SELECT token, n FROM corpus ORDER BY n DESC, token LIMIT {_DIV_TOP}),
qn AS (SELECT sum(n) AS tot FROM top),
grid AS (SELECT s.source, t.token, t.n AS cn FROM (SELECT DISTINCT source FROM documents) s, top t),
f AS (
  SELECT g.source, g.token,
         (coalesce(stc.n, 0) + 1.0) AS cs1, g.cn + 1.0 AS cq1
  FROM grid g LEFT JOIN stc ON stc.source = g.source AND stc.token = g.token
),
ns AS (SELECT source, sum(cs1 - 1.0) AS tot FROM f GROUP BY 1),
pq AS (
  SELECT f.source,
         f.cs1 / (ns.tot + {float(_DIV_TOP)}) AS p,
         f.cq1 / (qn.tot + {float(_DIV_TOP)}) AS q
  FROM f JOIN ns ON f.source = ns.source CROSS JOIN qn
)
SELECT source,
       round(0.5 * sum(p * ln(p / (0.5 * (p + q))))
           + 0.5 * sum(q * ln(q / (0.5 * (p + q)))), 6) AS js_divergence
FROM pq GROUP BY source ORDER BY source
"""


def q_snapshot_reads(sf_dir: str):
    """Snapshot-log time travel (state/snapshots.py — Iceberg-lite):
    build a versioned table from documents (v0 = first half appended,
    v1 = second half appended, v2 = compaction REWRITE of the same
    rows), then time-travel-read every version and report its exact
    (row count, doc_id checksum).

    The property under test is the core table-format invariant: a
    replacement commit changes the file membership but NOT the logical
    table, and historical versions stay readable after it.  All three
    version states are closed-form over the source table, so the
    whole lifecycle is value-oracled.  Reads/writes are distributed
    (Dataset.write_parquet / read_parquet over manifest-listed
    files); only file paths touch the driver."""
    import os
    import shutil
    import tempfile

    import ray.data

    from ..state.snapshots import commit_snapshot, read_snapshot

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    mid = (int(ds.max("doc_id")) + 1) // 2

    # private per-run scratch (mkdtemp): concurrent runs at the same
    # scale (pytest + bench) must not race on a shared fixed path
    table_dir = tempfile.mkdtemp(prefix="ae_snap_table_")

    def rel_files(sub: str) -> list[str]:
        return sorted(
            os.path.join(sub, f)
            for f in os.listdir(os.path.join(table_dir, sub))
            if f.endswith(".parquet")
        )

    try:
        ds.filter(expr=f"doc_id < {mid}").write_parquet(os.path.join(table_dir, "a"))
        commit_snapshot(table_dir, rel_files("a"), op="append")
        ds.filter(expr=f"doc_id >= {mid}").write_parquet(os.path.join(table_dir, "b"))
        commit_snapshot(table_dir, rel_files("a") + rel_files("b"), op="append")
        read_snapshot(table_dir, 1).repartition(2).write_parquet(os.path.join(table_dir, "c"))
        commit_snapshot(table_dir, rel_files("c"), op="compact")

        rows = []
        for v in (0, 1, 2):
            snap = read_snapshot(table_dir, v)
            rows.append(
                {"version": v, "n_rows": int(snap.count()), "sum_doc_id": int(snap.sum("doc_id"))}
            )
        return pd.DataFrame(rows).astype(np.int64)
    finally:
        shutil.rmtree(table_dir, ignore_errors=True)


SQL_SNAPSHOT_READS = """
WITH m AS (SELECT (max(doc_id) + 1) // 2 AS mid FROM documents)
SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM documents, m WHERE doc_id < m.mid
UNION ALL
SELECT 1, count(*), sum(doc_id) FROM documents
UNION ALL
SELECT 2, count(*), sum(doc_id) FROM documents
ORDER BY version
"""


def q_schema_evolution(sf_dir: str):
    """Schema-evolution read: half the table's files were written
    BEFORE a column existed (doc_id < mid, no ``lang``), half after —
    the union-by-name read fills the missing column with nulls and the
    downstream aggregate sees one schema.  The lakehouse add-column
    migration, exercised end-to-end through real parquet files.

    Old and new file sets are written distributedly; the evolved read
    is ``read_parquet`` over both sets with a vectorized
    fill-missing-with-null normalizer (the same shape
    `multi_format_union` uses for CSV+JSONL).  Output: per-lang doc
    counts with the legacy files in the NULL bucket — closed-form
    over the source table, so the whole migration is value-oracled."""
    import os
    import shutil
    import tempfile

    import ray.data

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"], split=True)
    mid = (int(ds.max("doc_id")) + 1) // 2

    # private per-run scratch (mkdtemp): concurrent runs at the same
    # scale must not race on a shared fixed path; the lazy evolved read
    # targets this dir, so the tiny per-lang result is materialized
    # before the finally-cleanup
    base = tempfile.mkdtemp(prefix="ae_schema_evo_")
    try:
        ds.filter(expr=f"doc_id < {mid}").drop_columns(["lang"]).write_parquet(
            os.path.join(base, "v1")
        )
        ds.filter(expr=f"doc_id >= {mid}").write_parquet(os.path.join(base, "v2"))

        def normalize(batch: pa.Table) -> pa.Table:
            if "lang" not in batch.column_names:
                batch = batch.append_column("lang", pa.nulls(len(batch), type=pa.string()))
            return batch.select(["doc_id", "lang"])

        old = ray.data.read_parquet(os.path.join(base, "v1")).map_batches(
            normalize, batch_format="pyarrow"
        )
        new = ray.data.read_parquet(os.path.join(base, "v2")).map_batches(
            normalize, batch_format="pyarrow"
        )
        unioned = old.union(new)

        def counts(batch: pa.Table) -> pd.DataFrame:
            s = batch["lang"].to_pandas()
            return (
                pd.DataFrame({"lang": s.where(s.notna(), "<legacy>")})
                .value_counts(["lang"])
                .reset_index(name="n")
            )

        out = grouped_aggregate(
            unioned.map_batches(counts, batch_format="pyarrow"), ["lang"], {"n_docs": ("sum", "n")},
            small_keys=True,
        )
        df = out.to_pandas()
        return df.assign(n_docs=df["n_docs"].astype(np.int64))
    finally:
        shutil.rmtree(base, ignore_errors=True)


SQL_SCHEMA_EVOLUTION = """
WITH m AS (SELECT (max(doc_id) + 1) // 2 AS mid FROM documents)
SELECT CASE WHEN doc_id < m.mid THEN '<legacy>' ELSE lang END AS lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents, m
GROUP BY 1
"""


def q_cdc_apply(sf_dir: str):
    """CDC apply with deletes: fold an ordered change log
    (upsert/delete ops per key) into the final table state — the
    Debezium-style merge every lakehouse sink runs, one step past
    `merge_upsert` (which has no tombstones).

    The change log derives from orders: each order upserts its
    customer's latest amount; 'F'-status orders are tombstones.  The
    fold is `latest_per_key`'s shape — per-batch latest partial by the
    (orderdate, orderkey) ordinal, one coarse key-hash reduce — then a
    vectorized tombstone filter.  Survivors carry the amount in exact
    cents."""
    ds = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice"],
        split=True,
    )

    def tag(batch: pa.Table) -> pd.DataFrame:
        us = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame(
            {
                "key": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "us": us,
                "ok": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "del_": (batch["o_orderstatus"].to_pandas() == "F").astype(np.int8),
                "cents": cents,
                "__bucket": (batch["o_custkey"].to_numpy() % 32).astype(np.int32),
            }
        )
        # per-batch latest partial: one row per key per batch
        df = df.sort_values(["key", "us", "ok"], kind="stable")
        return df.groupby(["key", "__bucket"], as_index=False).tail(1)

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["key", "us", "ok"], kind="stable")
        last = df.groupby("key", as_index=False).tail(1)
        live = last[last["del_"] == 0]
        return pd.DataFrame(
            {
                "c_custkey": live["key"].to_numpy(),
                "last_amount": live["cents"].to_numpy() / 100.0,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: latest(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_CDC_APPLY = """
WITH log AS (
  SELECT o_custkey AS key, epoch_us(o_orderdate) AS us, o_orderkey AS ok,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS del_,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY epoch_us(o_orderdate) DESC, o_orderkey DESC) AS rn
  FROM orders
)
SELECT key AS c_custkey, cents / 100.0 AS last_amount
FROM log WHERE rn = 1 AND del_ = 0
"""


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join family: Q5 / Q17 / Q18 plan shapes
# ---------------------------------------------------------------------------

_Q5_REGION = "ASIA"
_Q5_FROM = "1996-01-01"
_Q5_TO = "1997-01-01"


def q_q5_region_revenue(sf_dir: str):
    """TPC-H-Q5-shaped five-table join: revenue per nation where the
    customer and the line's supplier sit in the SAME nation of one
    region, over a one-year order window.

    Canonical distributed Q5 plan: the dimension chain (region⋈nation,
    supplier, and the ASIA-filtered custkey→nationkey map — all
    dimensions by the TPC-H size hierarchy) broadcasts once as
    pre-built lookups and FUSES into the fact-scan passes; the one
    genuinely fact-fact exchange, lineitem⋈order-dim, routes through
    the size-routed :func:`tabular.join` facade (broadcast under
    budget, hash exchange above).  Lineitem pre-reduces
    per (orderkey, supplier-nation) inside the batch before the
    exchange, so the join input is bounded by distinct keys, not line
    count.  Revenue accumulates in integer 1e-4 dollars (price has 2
    decimals, discount 2) — exact under any accumulation order."""
    import pyarrow.compute as pc

    from .tabular import join as join_route

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q5_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nkeys = nat_in["n_nationkey"].to_numpy().astype(np.int64)
    nname = {int(k): v for k, v in zip(nkeys, nat_in["n_name"].to_pylist())}
    nkeys_arr_bc = Broadcast(pa.array(nkeys, type=pa.int32()))

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap = pd.Series(
        sup["s_nationkey"].to_numpy().astype(np.int64),
        index=sup["s_suppkey"].to_numpy().astype(np.int64),
    )
    smap_bc = Broadcast(smap)

    lo = np.datetime64(_Q5_FROM, "us")
    hi = np.datetime64(_Q5_TO, "us")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    # customer → nation attach: ASIA-filtered custkey→nationkey map is a
    # DIMENSION by the TPC-H size hierarchy, so it broadcasts once and the
    # attach fuses into the order-filter pass (one plan barrier saved vs
    # routing a dedicated join; the FACT-fact exchange below still routes
    # through the size-routed facade, which is the part that must scale).
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"], split=True)

    def cust_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["c_nationkey"], value_set=nkeys_arr_bc.get())
        out = batch.filter(keep)
        return pd.DataFrame(
            {
                "k": out["c_custkey"].to_numpy(zero_copy_only=False),
                "n": out["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )

    cmap_df = cust.map_batches(cust_partial, batch_format="pyarrow").to_pandas()
    cmap_bc = Broadcast(pd.Series(cmap_df["n"].to_numpy(), index=cmap_df["k"].to_numpy()))

    def pick_orders_nation(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)[keep]
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
        nk = cmap_bc.get().reindex(ck).to_numpy()
        hit = ~np.isnan(nk)
        return pd.DataFrame(
            {"o_orderkey": ok[hit], "c_nationkey": nk[hit].astype(np.int64)}
        )

    odim = orders.map_batches(pick_orders_nation, batch_format="pyarrow")

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        snat = smap_bc.get()[batch["l_suppkey"].to_numpy(zero_copy_only=False)].to_numpy()
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                    "s_nationkey": snat,
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "s_nationkey"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")
    joined, _ = join_route(lrev, odim, on="o_orderkey")

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["s_nationkey"] == df["c_nationkey"]]
        return df[["c_nationkey", "rev"]]

    per_nation = grouped_aggregate(
        joined.map_batches(same_nation, batch_format="pandas"),
        ["c_nationkey"],
        {"rev": ("sum", "rev")},
        small_keys=True,
    ).to_pandas()
    per_nation["n_name"] = per_nation["c_nationkey"].map(nname)
    per_nation["revenue"] = np.round(per_nation["rev"] / 10000.0, 2)
    out = per_nation.sort_values(["rev", "n_name"], ascending=[False, True], kind="stable")
    return out[["n_name", "revenue"]].reset_index(drop=True)


SQL_Q5 = f"""
SELECT n.n_name,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer c
JOIN orders   o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey AND s.s_nationkey = n.n_nationkey
JOIN region   r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{_Q5_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q5_TO}'
GROUP BY n.n_name
ORDER BY sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) DESC, n.n_name
"""


_Q10_FROM = "1996-01-01"
_Q10_TO = "1996-04-01"
_Q10_TOPN = 20


def q_q10_returned_items(sf_dir: str):
    """TPC-H-Q10-shaped returned-item report: the top-20 customers by
    revenue lost to returned lineitems over one quarter, with their
    nation attached — the complaint-triage join chain (fact filter →
    fact-fact join → two dimension attaches → grouped top-k).

    Plan: lineitem filters ``l_returnflag='R'`` AT THE SCAN (predicate
    in the batch pass, only 3 columns read) and pre-reduces integer
    1e-4-dollar revenue per orderkey; the quarter-filtered orders side
    carries (orderkey → custkey); the one fact-fact exchange routes
    through the size-routed :func:`tabular.join` facade.  Per-customer
    revenue folds through the open-domain exchange, the nation name
    attaches from a broadcast dimension map, and the top-20 runs
    through :func:`tabular.topk`'s per-batch prefilter with a
    deterministic (revenue DESC, custkey ASC) rule.  Integer cents
    end-to-end — the top-20 boundary cannot shift with accumulation
    order."""
    import pyarrow.compute as pc

    from .tabular import join as join_route
    from .tabular import topk

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nname = {
        int(k): v
        for k, v in zip(nat["n_nationkey"].to_numpy(), nat["n_name"].to_pylist())
    }
    lo = np.datetime64(_Q10_FROM, "us")
    hi = np.datetime64(_Q10_TO, "us")

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        split=True,
    )

    def returned_rev(batch: pa.Table) -> pd.DataFrame:
        keep = pc.equal(batch["l_returnflag"], "R")
        b = batch.filter(keep)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return (
            pd.DataFrame(
                {"o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False), "rev": rev}
            )
            .groupby("o_orderkey", as_index=False)["rev"]
            .sum()
        )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    def quarter_orders(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[keep],
                "c_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)[keep],
            }
        )

    joined, _ = join_route(
        li.map_batches(returned_rev, batch_format="pyarrow"),
        orders.map_batches(quarter_orders, batch_format="pyarrow"),
        on="o_orderkey",
    )
    per_cust = grouped_aggregate(
        joined.map_batches(
            lambda df: df[["c_custkey", "rev"]], batch_format="pandas"
        ),
        ["c_custkey"],
        {"rev": ("sum", "rev")},
    )
    top = (
        topk(per_cust, ["rev", "c_custkey"], k=_Q10_TOPN, descending=[True, False])
        .to_pandas()
        .reset_index(drop=True)
    )
    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    cdf = cust.to_pandas().set_index("c_custkey")
    top["c_name"] = top["c_custkey"].map(cdf["c_name"])
    top["n_name"] = top["c_custkey"].map(cdf["c_nationkey"]).map(nname)
    top["revenue"] = np.round(top["rev"] / 10000.0, 2)
    return top[["c_custkey", "c_name", "n_name", "revenue"]].astype({"c_custkey": np.int64})


SQL_Q10 = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name, n.n_name,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer c
JOIN orders   o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation   n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{_Q10_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q10_TO}'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) DESC, c.c_custkey
LIMIT {_Q10_TOPN}
"""


_Q17_BRAND = "Brand#13"
_Q17_FRACTION = 0.2


def q_q17_small_quantity(sf_dir: str):
    """TPC-H-Q17-shaped correlated-aggregate join: average yearly
    revenue lost if small-quantity orders (below 20% of the part's own
    mean quantity) were no longer taken, for one brand.

    Two streaming passes over lineitem, zero row shuffle: pass 1
    semi-filters on the brand's part keys (broadcast ``pa.array`` +
    ``pc.is_in``) and reduces exact per-part (sum, count) quantity
    partials — quantities are whole numbers, so the sums are exact
    integers in float64 and the 0.2·mean threshold is deterministic
    under any accumulation order.  The per-part thresholds broadcast
    (bounded by the brand's part count); pass 2 re-filters and sums
    matching revenue in integer cents.  Single-row output."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = part.filter(pc.equal(part["p_brand"], _Q17_BRAND))["p_partkey"].combine_chunks()
    pk_bc = Broadcast(pk.cast(pa.int64()))

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"], split=True)

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["l_partkey"], value_set=pk_bc.get())
        b = batch.filter(keep)
        return (
            pd.DataFrame(
                {
                    "p": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "q": b["l_quantity"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("p", as_index=False)
            .agg(s=("q", "sum"), c=("q", "count"))
        )

    stats = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["p"],
        {"s": ("sum", "s"), "c": ("sum", "c")},
        small_keys=True,
    ).to_pandas()
    thr = pd.Series(
        _Q17_FRACTION * (stats["s"].to_numpy() / stats["c"].to_numpy()),
        index=stats["p"].to_numpy(),
    )
    thr_bc = Broadcast(thr)

    def rev_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.is_in(batch["l_partkey"], value_set=pk_bc.get()).to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(keep))
        if len(b) == 0:
            return pd.DataFrame({"cents": pd.Series([], dtype=np.int64)})
        pkeys = b["l_partkey"].to_numpy(zero_copy_only=False)
        t = thr_bc.get().reindex(pkeys).to_numpy()
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        small = q < t
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)[small]
        cents = np.round(price * 100).astype(np.int64).sum()
        return pd.DataFrame({"cents": [cents]})

    total = (
        li.map_batches(rev_partial, batch_format="pyarrow")
        .sum("cents")
    )
    return pd.DataFrame({"avg_yearly": [round((total / 100.0) / 7.0, 2)]})


SQL_Q17 = f"""
SELECT round((sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{_Q17_BRAND}'
  AND l.l_quantity < (
    SELECT {_Q17_FRACTION} * (sum(l2.l_quantity) / count(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


_Q18_MIN_QTY = 250.0


def q_q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped big-order report: orders whose total line
    quantity exceeds a threshold, with customer name — the
    HAVING-over-fact-aggregate + two-dimension-join plan.

    Per-orderkey quantity partials pre-reduce inside each batch, fold
    through the open-domain ``grouped_aggregate`` exchange (exact —
    whole-number quantities), and the surviving keys (HAVING prunes to
    a sliver) join orders and customer through the size-routed facade.
    Top-100 runs through ``topk``'s per-batch prefilter.  Quantities
    cast to int64 on both sides."""
    from .tabular import join as join_route, topk

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"], split=True)

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "q": batch["l_quantity"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_orderkey", as_index=False)["q"].sum()

    per_order = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["o_orderkey"],
        {"q": ("sum", "q")},
    )

    def keep_big(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["q"] > _Q18_MIN_QTY]
        return df.assign(sum_qty=df["q"].astype(np.int64))[["o_orderkey", "sum_qty"]]

    big = per_order.map_batches(keep_big, batch_format="pandas")

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        split=True,
    )
    j1, _ = join_route(orders, big, on="o_orderkey")

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"], split=True)

    def key_cust(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch["c_custkey"], "c_name": batch["c_name"]})

    j2, _ = join_route(j1, cust.map_batches(key_cust, batch_format="pyarrow"), on="o_custkey")
    top = topk(
        j2, ["o_totalprice", "o_orderdate", "o_orderkey"], 100, descending=[True, False, False]
    ).to_pandas()
    return top[["c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]].reset_index(
        drop=True
    )


SQL_Q18 = f"""
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
HAVING sum(l.l_quantity) > {_Q18_MIN_QTY}
ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
LIMIT 100
"""


_Q4_FROM = "1997-07-01"
_Q4_TO = "1997-10-01"


def q_q4_order_priority(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join: orders placed in one quarter
    that had at least one line shipped AFTER the order date, counted per
    priority class (the commit/receipt columns aren't in this schema, so
    the late-line predicate substitutes — same correlated-EXISTS plan).

    The EXISTS rewrites to an aggregate semi-join: lineitem pre-reduces
    per orderkey to max(l_shipdate) inside each batch (combiner), folds
    through the open-domain exchange, and the QUARTER-windowed order
    sliver joins it through the size-routed facade — the window side is
    the small one, so it broadcasts under budget and hash-exchanges
    above.  Priority counts finalize on the bounded 5-value domain."""
    from .tabular import join as join_route

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"], split=True)

    def max_ship(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship": batch["l_shipdate"].to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_orderkey", as_index=False)["ship"].max()

    per_order = grouped_aggregate(
        li.map_batches(max_ship, batch_format="pyarrow"),
        ["o_orderkey"],
        {"ship": ("max", "ship")},
    )

    lo, hi = np.datetime64(_Q4_FROM, "us"), np.datetime64(_Q4_TO, "us")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"], split=True
    )

    def window(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((d >= lo) & (d < hi)))

    j, _ = join_route(per_order, orders.map_batches(window, batch_format="pyarrow"), on="o_orderkey")

    def late_only(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["ship"].to_numpy() > df["o_orderdate"].to_numpy()
        return df.loc[keep, ["o_orderpriority"]]

    out = grouped_aggregate(
        j.map_batches(late_only, batch_format="pandas"),
        ["o_orderpriority"],
        {"order_count": ("count", None)},
        small_keys=True,
    ).to_pandas()
    out["order_count"] = out["order_count"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_Q4 = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q4_TO}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


_Q6_FROM = "1997-01-01"
_Q6_TO = "1998-01-01"


def q_q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shaped forecast: revenue delta from discounts in a band,
    one shipping year, small quantities — the pure filter-aggregate scan.

    Single streaming pass, zero shuffle: each batch reduces to ONE
    int64 partial in 1e-4-dollar units (price has 2 decimals, discount
    2, so price·10000·discount is an exact integer) and the partials
    fold through ``Dataset.sum``.  The only data leaving a worker is
    8 bytes per block — the canonical shape for a 100-TB filter-agg."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        split=True,
    )
    lo, hi = np.datetime64(_Q6_FROM, "us"), np.datetime64(_Q6_TO, "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi) & (disc >= 0.02) & (disc <= 0.04) & (q < 24)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        units = np.round(price * 10000 * disc[keep]).astype(np.int64).sum()
        return pd.DataFrame({"u": [units]})

    total = li.map_batches(partial, batch_format="pyarrow").sum("u")
    return pd.DataFrame({"revenue": [np.round(total / 10000.0, 2)]})


SQL_Q6 = f"""
SELECT round(sum(CAST(round(l_extendedprice * 10000 * l_discount) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_FROM}'
  AND l_shipdate <  TIMESTAMP '{_Q6_TO}'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


_Q7_N1 = 3
_Q7_N2 = 8
_Q7_FROM = "1998-01-01"
_Q7_TO = "2000-01-01"


def q_q7_volume_shipping(sf_dir: str):
    """TPC-H-Q7-shaped volume shipping: revenue between a NATION PAIR
    (supplier in one, customer in the other, both directions) per ship
    year over a two-year window.

    Supplier→nation and the pair-filtered customer→nation maps are
    dimensions (TPC-H size hierarchy) and broadcast once as pandas
    index lookups; lineitem pre-reduces per (orderkey, supp-nation,
    ship-year) INSIDE the batch so the one fact-fact exchange —
    lineitem⋈order-dimension on orderkey, via the size-routed
    :func:`tabular.join` facade — carries distinct keys, not lines.
    Revenue in exact 1e-4-dollar int64; the 2×2×2 final groupby
    finalizes on the bounded domain."""
    from .tabular import join as join_route

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nname = {int(k): v for k, v in zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist())}

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    sn = sup["s_nationkey"].to_numpy().astype(np.int64)
    m = (sn == _Q7_N1) | (sn == _Q7_N2)
    smap_bc = Broadcast(pd.Series(sn[m], index=sk[m]))

    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    cm = (cn == _Q7_N1) | (cn == _Q7_N2)
    cmap_bc = Broadcast(pd.Series(cn[cm], index=ck[cm]))

    lo, hi = np.datetime64(_Q7_FROM, "us"), np.datetime64(_Q7_TO, "us")
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        snat = smap_bc.get().reindex(b["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy()
        hit = ~np.isnan(snat)
        b = b.filter(pa.array(hit))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        yr = b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]").astype(np.int64) + 1970
        return (
            pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "supp_nat": snat[hit].astype(np.int64),
                    "l_year": yr,
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "supp_nat", "l_year"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        cnat = cmap_bc.get().reindex(batch["o_custkey"].to_numpy(zero_copy_only=False)).to_numpy()
        hit = ~np.isnan(cnat)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False)[hit],
                "cust_nat": cnat[hit].astype(np.int64),
            }
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")
    j, _ = join_route(lrev, odim, on="o_orderkey")

    def pair_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["supp_nat"] == _Q7_N1) & (df["cust_nat"] == _Q7_N2)) | (
            (df["supp_nat"] == _Q7_N2) & (df["cust_nat"] == _Q7_N1)
        )
        return df.loc[keep, ["supp_nat", "cust_nat", "l_year", "rev"]]

    out = grouped_aggregate(
        j.map_batches(pair_filter, batch_format="pandas"),
        ["supp_nat", "cust_nat", "l_year"],
        {"rev": ("sum", "rev")},
        small_keys=True,
    ).to_pandas()
    out["supp_nation"] = out["supp_nat"].map(nname)
    out["cust_nation"] = out["cust_nat"].map(nname)
    out["revenue"] = np.round(out["rev"] / 10000.0, 2)
    return (
        out.sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)[["supp_nation", "cust_nation", "l_year", "revenue"]]
    )


SQL_Q7 = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(extract(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q7_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q7_TO}'
  AND ((s.s_nationkey = {_Q7_N1} AND c.c_nationkey = {_Q7_N2})
    OR (s.s_nationkey = {_Q7_N2} AND c.c_nationkey = {_Q7_N1}))
GROUP BY ns.n_name, nc.n_name, CAST(extract(year FROM l.l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, l_year
"""


_Q8_REGION = "EUROPE"
_Q8_TYPE = "STANDARD"
_Q8_NATION = 3
_Q8_FROM = "1998-01-01"
_Q8_TO = "2000-01-01"


def q_q8_market_share(sf_dir: str):
    """TPC-H-Q8-shaped national market share: of the revenue for one
    part type sold to customers of one region over two years, the
    fraction supplied from one target nation, per order year.

    Dimension chain (type-filtered part keys, region-filtered customer
    keys, supplier→nation) broadcasts once and fuses into the two fact
    scans; lineitem pre-reduces per (orderkey, is-target-nation) so the
    fact-fact exchange (size-routed facade) carries two rows per
    distinct order at most.  Numerator and denominator accumulate as
    exact int64 1e-4-dollar units; the share divides once per year
    group (identical correctly-rounded IEEE division on both engines)
    and rounds to 6 places on both sides."""
    import pyarrow.compute as pc

    from .tabular import join as join_route

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type"])
    pk_bc = Broadcast(
        part.filter(pc.equal(part["p_type"], _Q8_TYPE))["p_partkey"].combine_chunks().cast(pa.int64())
    )

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q8_REGION))["r_regionkey"][0].as_py()
    nkeys = nat.filter(pc.equal(nat["n_regionkey"], rkey))["n_nationkey"].to_numpy().astype(np.int64)

    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy().astype(np.int64)
    cn = cust["c_nationkey"].to_numpy().astype(np.int64)
    ckeys_bc = Broadcast(pa.array(ck[np.isin(cn, nkeys)]))

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap_bc = Broadcast(
        pd.Series(
            sup["s_nationkey"].to_numpy().astype(np.int64),
            index=sup["s_suppkey"].to_numpy().astype(np.int64),
        )
    )

    lo, hi = np.datetime64(_Q8_FROM, "us"), np.datetime64(_Q8_TO, "us")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        inr = pc.is_in(b["o_custkey"], value_set=ckeys_bc.get())
        b = b.filter(inr)
        yr = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[Y]").astype(np.int64) + 1970
        return pd.DataFrame(
            {"o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False), "o_year": yr}
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        split=True,
    )

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_partkey"], value_set=pk_bc.get()))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        snat = smap_bc.get().reindex(b["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy()
        return (
            pd.DataFrame(
                {
                    "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                    "tgt": (snat == _Q8_NATION).astype(np.int64),
                    "rev": rev,
                }
            )
            .groupby(["o_orderkey", "tgt"], as_index=False)["rev"]
            .sum()
        )

    lrev = li.map_batches(li_partial, batch_format="pyarrow")
    j, _ = join_route(lrev, odim, on="o_orderkey")
    per = grouped_aggregate(
        j, ["o_year", "tgt"], {"rev": ("sum", "rev")}, small_keys=True
    ).to_pandas()
    tot = per.groupby("o_year")["rev"].sum()
    tgt = per[per["tgt"] == 1].set_index("o_year")["rev"].reindex(tot.index).fillna(0).astype(np.int64)
    out = pd.DataFrame(
        {
            "o_year": tot.index.to_numpy().astype(np.int64),
            "mkt_share": np.round(tgt.to_numpy() / tot.to_numpy(), 6),
        }
    )
    return out.sort_values("o_year").reset_index(drop=True)


SQL_Q8 = f"""
SELECT CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN s.s_nationkey = {_Q8_NATION}
                      THEN CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)
                      ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)), 6) AS mkt_share
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE r.r_name = '{_Q8_REGION}'
  AND p.p_type = '{_Q8_TYPE}'
  AND o.o_orderdate >= TIMESTAMP '{_Q8_FROM}'
  AND o.o_orderdate <  TIMESTAMP '{_Q8_TO}'
GROUP BY CAST(extract(year FROM o.o_orderdate) AS BIGINT)
ORDER BY o_year
"""


_Q12_FROM = "1998-01-01"
_Q12_TO = "1999-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_q12_priority_lines(sf_dir: str):
    """TPC-H-Q12-shaped priority split: lines shipped in one year,
    counted per line status, split into high-priority (urgent/high
    order) vs low-priority line counts — the fact-fact join with CASE
    aggregation (this schema has no shipmode, so line status keys the
    report; same plan shape).

    Lineitem pre-reduces per (orderkey, linestatus) counts inside each
    batch; the orders side projects to (orderkey, is_high) — both fact-
    sized, so the exchange routes through the size-routed facade
    (broadcast under budget, hash exchange above).  The CASE split is a
    vectorized multiply; the 2-value final groupby is bounded-domain."""
    from .tabular import join as join_route

    lo, hi = np.datetime64(_Q12_FROM, "us"), np.datetime64(_Q12_TO, "us")
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus", "l_shipdate"], split=True)

    def li_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        df = pd.DataFrame(
            {
                "o_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "l_linestatus": b["l_linestatus"].to_numpy(zero_copy_only=False),
            }
        )
        return (
            df.groupby(["o_orderkey", "l_linestatus"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    lcnt = li.map_batches(li_partial, batch_format="pyarrow")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"], split=True)

    def odim_fn(batch: pa.Table) -> pd.DataFrame:
        pri = batch["o_orderpriority"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(zero_copy_only=False),
                "is_high": np.isin(pri, list(_Q12_HIGH)).astype(np.int64),
            }
        )

    odim = orders.map_batches(odim_fn, batch_format="pyarrow")
    j, _ = join_route(lcnt, odim, on="o_orderkey")

    def split(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_linestatus": df["l_linestatus"],
                "h": df["n"] * df["is_high"],
                "l": df["n"] * (1 - df["is_high"]),
            }
        )

    out = grouped_aggregate(
        j.map_batches(split, batch_format="pandas"),
        ["l_linestatus"],
        {"high_line_count": ("sum", "h"), "low_line_count": ("sum", "l")},
        small_keys=True,
    ).to_pandas()
    out["high_line_count"] = out["high_line_count"].astype(np.int64)
    out["low_line_count"] = out["low_line_count"].astype(np.int64)
    return out.sort_values("l_linestatus").reset_index(drop=True)


SQL_Q12 = f"""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q12_TO}'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


_Q13_CUTOFF = "2000-01-01"


def q_q13_order_counts(sf_dir: str):
    """TPC-H-Q13-shaped customer order-count distribution: how many
    customers placed exactly N orders on/after a cutoff date —
    including the zero bucket (the LEFT-JOIN semantics).

    Two-level aggregation: orders pre-reduce per custkey inside each
    batch, fold through the open-domain exchange, and the count
    HISTOGRAM finalizes on the bounded count domain.  The zero bucket
    is arithmetic — total customers from the parquet FOOTER (no data
    read) minus the number of per-customer groups — so the left join
    never materializes; at 100 TB that replaces a customer×orders
    outer exchange with one metadata probe."""
    import os

    import pyarrow.parquet as pq

    lo = np.datetime64(_Q13_CUTOFF, "us")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def per_cust(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False)[d >= lo]})
        return df.groupby("o_custkey", as_index=False).size().rename(columns={"size": "n"})

    per = grouped_aggregate(
        orders.map_batches(per_cust, batch_format="pyarrow"),
        ["o_custkey"],
        {"c_count": ("sum", "n")},
    )
    hist = grouped_aggregate(
        per, ["c_count"], {"custdist": ("count", None)}, small_keys=True
    ).to_pandas()
    total_cust = pq.ParquetFile(os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    n_zero = total_cust - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})], ignore_index=True
        )
    hist["c_count"] = hist["c_count"].astype(np.int64)
    hist["custdist"] = hist["custdist"].astype(np.int64)
    return (
        hist.sort_values(["custdist", "c_count"], ascending=[False, False]).reset_index(drop=True)
    )


SQL_Q13 = f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{_Q13_CUTOFF}'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


_Q14_FROM = "1998-09-01"
_Q14_TO = "1998-10-01"


def q_q14_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped promotion effect: percentage of one month's
    revenue from promo-type parts.

    The promo part-key set is a dimension and broadcasts once as a
    pre-built Arrow array; each lineitem batch reduces to TWO int64
    partials (promo revenue, total revenue, exact 1e-4-dollar units),
    so the exchange is 16 bytes per block.  One double division at the
    end, identical on both engines; rounded to 6 on both sides."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type"])
    promo_bc = Broadcast(
        part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"].combine_chunks().cast(pa.int64())
    )

    lo, hi = np.datetime64(_Q14_FROM, "us"), np.datetime64(_Q14_TO, "us")
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array((d >= lo) & (d < hi)))
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        isp = pc.is_in(b["l_partkey"], value_set=promo_bc.get()).to_numpy(zero_copy_only=False)
        return pd.DataFrame({"p": [rev[isp].sum()], "t": [rev.sum()]})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo, total = int(parts["p"].sum()), int(parts["t"].sum())
    return pd.DataFrame({"promo_revenue": [np.round(100.0 * promo / total, 6)]})


SQL_Q14 = f"""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)
                              ELSE 0 END)
             / sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)), 6) AS promo_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_FROM}'
  AND l.l_shipdate <  TIMESTAMP '{_Q14_TO}'
"""


_Q15_FROM = "1997-01-01"
_Q15_TO = "1997-04-01"


def q_q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    revenue in one quarter (ties kept, per the spec's view + max plan).

    Suppliers are a dimension, so the per-supplier revenue fold uses
    the bounded-domain fast path (one int64 partial row per supplier
    per block, exact 1e-4-dollar units); max + tie filter + the name
    attach all happen on the supplier-sized result.  Nothing
    fact-sized leaves the workers."""
    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        split=True,
    )
    lo, hi = np.datetime64(_Q15_FROM, "us"), np.datetime64(_Q15_TO, "us")

    def partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = np.round(price * 10000 * (1.0 - disc)).astype(np.int64)
        return pd.DataFrame({"l_suppkey": sk, "r": rev}).groupby("l_suppkey", as_index=False)["r"].sum()

    per_supp = grouped_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"],
        {"r": ("sum", "r")},
        small_keys=True,
    ).to_pandas()
    best = per_supp[per_supp["r"] == per_supp["r"].max()]
    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).to_pandas()
    out = best.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out["total_revenue"] = np.round(out["r"] / 10000.0, 2)
    return (
        out.sort_values("s_suppkey")[["s_suppkey", "s_name", "total_revenue"]].reset_index(drop=True)
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(round(l_extendedprice * 10000 * (1.0 - l_discount)) AS BIGINT)) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
    AND l_shipdate <  TIMESTAMP '{_Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, round(r.r / 10000.0, 2) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.r = (SELECT max(r) FROM revenue)
ORDER BY s.s_suppkey
"""


_Q16_EXCL_BRAND = "Brand#13"
_Q16_SIZES = (1, 5, 9, 14, 20, 28, 36, 45)


def q_q16_supplier_variety(sf_dir: str):
    """TPC-H-Q16-shaped supplier variety: distinct suppliers that
    shipped parts of each (brand, type, size) combination, over parts
    outside one brand and within a size set (no partsupp table in this
    schema — lineitem supplies the part↔supplier relation; same
    COUNT(DISTINCT) plan).

    Part attributes broadcast once as index lookups (dimension); each
    lineitem batch emits its DISTINCT (brand, type, size, suppkey)
    tuples — the per-batch combiner for a distinct-count — so the
    exchange is bounded by groups×suppliers, not line count.  The
    global dedupe folds through the open-domain exchange keyed on the
    full tuple; the final count per (brand, type, size) is a bounded-
    domain row count."""
    import pyarrow.compute as pc

    part = read_table_arrow(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    qual = part[(part["p_brand"] != _Q16_EXCL_BRAND) & (part["p_size"].isin(_Q16_SIZES))]
    pk = qual["p_partkey"].to_numpy().astype(np.int64)
    pk_bc = Broadcast(pa.array(pk))
    attr_bc = Broadcast(
        (
            pd.Series(qual["p_brand"].to_numpy(), index=pk),
            pd.Series(qual["p_type"].to_numpy(), index=pk),
            pd.Series(qual["p_size"].to_numpy().astype(np.int64), index=pk),
        )
    )

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_partkey"], value_set=pk_bc.get()))
        pkeys = b["l_partkey"].to_numpy(zero_copy_only=False)
        br, ty, sz = attr_bc.get()
        df = pd.DataFrame(
            {
                "p_brand": br.reindex(pkeys).to_numpy(),
                "p_type": ty.reindex(pkeys).to_numpy(),
                "p_size": sz.reindex(pkeys).to_numpy().astype(np.int64),
                "s": b["l_suppkey"].to_numpy(zero_copy_only=False),
            }
        )
        return df.drop_duplicates()

    distinct = grouped_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["p_brand", "p_type", "p_size", "s"],
        {"c": ("count", None)},
    )
    out = grouped_aggregate(
        distinct,
        ["p_brand", "p_type", "p_size"],
        {"supplier_cnt": ("count", None)},
        small_keys=True,
    ).to_pandas()
    out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return (
        out.sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"], ascending=[False, True, True, True]
        ).reset_index(drop=True)
    )


SQL_Q16 = f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
  AND p.p_size IN {_Q16_SIZES}
GROUP BY p.p_brand, p.p_type, CAST(p.p_size AS BIGINT)
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
"""


_Q19_CLAUSES = (
    ("Brand#3", 1, 5, 1, 11),
    ("Brand#14", 1, 10, 10, 20),
    ("Brand#21", 1, 15, 20, 30),
)


def q_q19_special_revenue(sf_dir: str):
    """TPC-H-Q19-shaped discounted revenue: an OR of three
    (brand, size-range, quantity-range) conjunctions — the disjunctive
    multi-predicate scan (no container column in this schema; size
    stands in, same plan shape).

    Each clause's qualifying part-key set resolves driver-side against
    the part DIMENSION and broadcasts as a pre-built Arrow array; a
    single lineitem pass evaluates the three-way OR vectorized
    (``pc.is_in`` + quantity band per clause) and reduces to one int64
    partial per batch.  Zero shuffle."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    sets = []
    for brand, slo, shi, _qlo, _qhi in _Q19_CLAUSES:
        m = (part["p_brand"] == brand) & (part["p_size"] >= slo) & (part["p_size"] <= shi)
        sets.append(pa.array(part["p_partkey"].to_numpy()[m.to_numpy()].astype(np.int64)))
    sets_bc = Broadcast(tuple(sets))

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        split=True,
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(q), dtype=bool)
        for (_b, _slo, _shi, qlo, qhi), pkset in zip(_Q19_CLAUSES, sets_bc.get()):
            inset = pc.is_in(batch["l_partkey"], value_set=pkset).to_numpy(zero_copy_only=False)
            keep |= inset & (q >= qlo) & (q <= qhi)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)[keep]
        units = np.round(price * 10000 * (1.0 - disc)).astype(np.int64).sum()
        return pd.DataFrame({"u": [units]})

    total = li.map_batches(partial, batch_format="pyarrow").sum("u")
    return pd.DataFrame({"revenue": [np.round(total / 10000.0, 2)]})


SQL_Q19 = f"""
SELECT round(sum(CAST(round(l.l_extendedprice * 10000 * (1.0 - l.l_discount)) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE ({" OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
    f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
    for b, slo, shi, qlo, qhi in _Q19_CLAUSES
)})
"""


_Q22_CUTOFF = "2000-06-01"


def q_q22_dormant_customers(sf_dir: str):
    """TPC-H-Q22-shaped sales opportunity: customers with above-average
    positive account balance and NO orders on/after a cutoff, counted
    and totalled per nation (no phone column in this schema; the
    nation keys the report — same scalar-subquery + anti-join plan).

    The balance threshold computes once over the customer DIMENSION in
    exact integer cents (sum/100.0/count, the identical expression the
    oracle evaluates).  The anti-join's probe side — distinct custkeys
    with a recent order — pre-reduces per batch on the orders FACT
    scan and folds through the open-domain exchange; the drained
    keyset is customer-bounded (a dimension by the size hierarchy), so
    the exclusion is a vectorized isin on the dimension frame."""
    cust = read_table_arrow(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    ).to_pandas()
    bal = cust["c_acctbal"].to_numpy()
    cents = np.round(bal * 100).astype(np.int64)
    pos = bal > 0
    thr = (cents[pos].sum() / 100.0) / int(pos.sum())
    rich = cust[bal > thr]

    lo = np.datetime64(_Q22_CUTOFF, "us")
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def active(batch: pa.Table) -> pd.DataFrame:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {"k": np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False)[d >= lo])}
        )

    act = grouped_aggregate(
        orders.map_batches(active, batch_format="pyarrow"), ["k"], {"c": ("count", None)}
    ).to_pandas()

    dormant = rich[~rich["c_custkey"].isin(act["k"])]
    g = dormant.groupby("c_nationkey", as_index=False).agg(
        numcust=("c_custkey", "count"), bal_cents=("c_acctbal", "sum")
    )
    g["numcust"] = g["numcust"].astype(np.int64)
    g["totacctbal"] = np.round(
        np.array(
            [
                np.round(dormant.loc[dormant["c_nationkey"] == nk, "c_acctbal"].to_numpy() * 100)
                .astype(np.int64)
                .sum()
                for nk in g["c_nationkey"]
            ]
        )
        / 100.0,
        2,
    )
    g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
    return g.sort_values("c_nationkey").reset_index(drop=True)[
        ["c_nationkey", "numcust", "totacctbal"]
    ]


SQL_Q22 = f"""
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) / 100.0 / count(*)
    FROM customer c2 WHERE c2.c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
  )
GROUP BY c.c_nationkey
ORDER BY c_nationkey
"""


_Q2_REGION = "EUROPE"
_Q2_TYPE = "PROMO"
_Q2_MAX_SIZE = 25


def q_q2_min_cost_supplier(sf_dir: str):
    """TPC-H-Q2-shaped correlated-min join, re-targeted at this schema:
    there is no partsupp table, so the (part, supplier) supply relation
    is DERIVED from lineitem history and a pair's "supply cost" is its
    total billed cents; Q2's ``ps_supplycost = (SELECT min ...)``
    correlated subquery then picks, per qualifying part, the cheapest
    REGION supplier.

    Plan: the region-supplier keyset and the size/type part keyset are
    dimensions — both broadcast once as pre-built ``pa.array`` value
    sets and fuse into ONE lineitem pass that semi-filters and reduces
    exact integer-cent partials per (part, supplier).  The partials fold
    through the open-domain exchange; the surviving pair table is
    bounded by |qualifying parts| × |region suppliers| (dimension-sized
    at any corpus scale), so the correlated per-part min and the final
    4-column ordering finalize driver-side on that bounded set."""
    import pyarrow.compute as pc

    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = read_table_arrow(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg["r_name"], _Q2_REGION))["r_regionkey"][0].as_py()
    nat_in = nat.filter(pc.equal(nat["n_regionkey"], rkey))
    nname = pd.Series(
        nat_in["n_name"].to_pylist(),
        index=nat_in["n_nationkey"].to_numpy().astype(np.int64),
    )

    sup = read_table_arrow(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    sdf = sup.to_pandas()
    sdf["s_nationkey"] = sdf["s_nationkey"].astype(np.int64)
    sdf = sdf[sdf["s_nationkey"].isin(nname.index)]
    skeys_bc = Broadcast(pa.array(sdf["s_suppkey"].to_numpy(), type=pa.int64()))

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_type", "p_size"])
    pqual = part.filter(
        pc.and_(
            pc.equal(part["p_type"], _Q2_TYPE),
            pc.less_equal(part["p_size"], _Q2_MAX_SIZE),
        )
    )
    pkeys_bc = Broadcast(pqual["p_partkey"].combine_chunks().cast(pa.int64()))

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"], split=True
    )

    def pair_partial(batch: pa.Table) -> pd.DataFrame:
        keep = pc.and_(
            pc.is_in(batch["l_partkey"], value_set=pkeys_bc.get()),
            pc.is_in(batch["l_suppkey"], value_set=skeys_bc.get()),
        )
        b = batch.filter(keep)
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "cost_cents": cents,
                }
            )
            .groupby(["p_partkey", "s_suppkey"], as_index=False)["cost_cents"]
            .sum()
        )

    pairs = grouped_aggregate(
        li.map_batches(pair_partial, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey"],
        {"cost_cents": ("sum", "cost_cents")},
    ).to_pandas()

    mins = pairs.groupby("p_partkey")["cost_cents"].transform("min")
    win = pairs[pairs["cost_cents"] == mins].merge(sdf, on="s_suppkey")
    win["n_name"] = nname.reindex(win["s_nationkey"]).to_numpy()
    win["cost"] = np.round(win["cost_cents"].to_numpy() / 100.0, 2)
    win["p_partkey"] = win["p_partkey"].astype(np.int64)
    out = win.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    ).head(100)
    return out[["s_acctbal", "s_name", "n_name", "p_partkey", "cost"]].reset_index(drop=True)


SQL_Q2 = f"""
WITH ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey AS s_suppkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem l GROUP BY 1, 2
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, round(ps.cost_cents / 100.0, 2) AS cost
FROM ps
JOIN part p ON p.p_partkey = ps.p_partkey
JOIN supplier s ON s.s_suppkey = ps.s_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{_Q2_REGION}' AND p.p_type = '{_Q2_TYPE}' AND p.p_size <= {_Q2_MAX_SIZE}
  AND ps.cost_cents = (
    SELECT min(ps2.cost_cents)
    FROM ps ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.s_suppkey
    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE r2.r_name = '{_Q2_REGION}' AND ps2.p_partkey = p.p_partkey
  )
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


_Q9_PATTERN = "widget"


def q_q9_product_profit(sf_dir: str):
    """TPC-H-Q9-shaped product-type profit: per (supplier nation, order
    year), the margin on every line whose part name matches a pattern.
    This schema has no partsupp, so ``p_retailprice`` stands in for
    ``ps_supplycost`` — same five-table star plan, same column shape.

    Plan: part→retail-cents and supplier→nation are dimension lookups
    (broadcast once, pre-built); one lineitem pass computes the exact
    1e-4-dollar margin (price and retail have 2 decimals, discount 2,
    quantity whole — every term integer) and pre-reduces per
    (orderkey, nation) INSIDE the batch, so the only fact-fact exchange
    — attaching the order year — moves one row per distinct key, not
    per line, through the size-routed join facade.  The (nation, year)
    finalize runs on a bounded 25×|years| domain."""
    import pyarrow.compute as pc

    from .tabular import join as join_route

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    pq = part.filter(pc.match_substring(part["p_name"], _Q9_PATTERN))
    retail = pd.Series(
        np.round(pq["p_retailprice"].to_numpy() * 100).astype(np.int64),
        index=pq["p_partkey"].to_numpy().astype(np.int64),
    )
    retail_bc = Broadcast(retail)

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    smap_bc = Broadcast(
        pd.Series(
            sup["s_nationkey"].to_numpy().astype(np.int64),
            index=sup["s_suppkey"].to_numpy().astype(np.int64),
        )
    )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
        split=True,
    )

    def profit_partial(batch: pa.Table) -> pd.DataFrame:
        r = retail_bc.get().reindex(batch["l_partkey"].to_numpy(zero_copy_only=False))
        m = r.notna().to_numpy()
        if not m.any():
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype=np.int64),
                    "n_nationkey": pd.Series([], dtype=np.int64),
                    "amount_e4": pd.Series([], dtype=np.int64),
                }
            )
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100
        ).astype(np.int64)
        disc = np.round(batch["l_discount"].to_numpy(zero_copy_only=False)[m] * 100).astype(
            np.int64
        )
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        amount = cents * (100 - disc) - r.to_numpy()[m].astype(np.int64) * 100 * qty
        nation = (
            smap_bc.get()
            .reindex(batch["l_suppkey"].to_numpy(zero_copy_only=False)[m])
            .to_numpy()
            .astype(np.int64)
        )
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False)[m],
                    "n_nationkey": nation,
                    "amount_e4": amount,
                }
            )
            .groupby(["o_orderkey", "n_nationkey"], as_index=False)["amount_e4"]
            .sum()
        )

    partials = grouped_aggregate(
        li.map_batches(profit_partial, batch_format="pyarrow"),
        ["o_orderkey", "n_nationkey"],
        {"amount_e4": ("sum", "amount_e4")},
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"], split=True)

    def year_of(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False)
        yr = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_year": pa.array(yr)})

    j, _ = join_route(partials, orders.map_batches(year_of, batch_format="pyarrow"), on="o_orderkey")

    out = grouped_aggregate(
        j, ["n_nationkey", "o_year"], {"amount_e4": ("sum", "amount_e4")}, small_keys=True
    ).to_pandas()
    nat = read_table_arrow(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    names = pd.Series(
        nat["n_name"].to_pylist(), index=nat["n_nationkey"].to_numpy().astype(np.int64)
    )
    out["n_name"] = names.reindex(out["n_nationkey"].astype(np.int64)).to_numpy()
    out["profit"] = np.round(out["amount_e4"].to_numpy() / 10000.0, 2)
    out["o_year"] = out["o_year"].astype(np.int64)
    return (
        out.sort_values(["n_name", "o_year"], ascending=[True, False])
        .reset_index(drop=True)[["n_name", "o_year", "profit"]]
    )


SQL_Q9 = f"""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                 - CAST(round(p.p_retailprice * 100) AS BIGINT) * 100 * CAST(l.l_quantity AS BIGINT)) / 10000.0, 2) AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%{_Q9_PATTERN}%'
GROUP BY 1, 2
ORDER BY n.n_name, o_year DESC
"""


_Q11_NATIONS = 8
_Q11_FACTOR = 1.5


def q_q11_important_parts(sf_dir: str):
    """TPC-H-Q11-shaped important-stock scan: parts whose billed value
    from suppliers in a nation band exceeds a multiple of the band's
    MEAN per-part value — the global-scalar-subquery (HAVING > SELECT)
    plan.  No partsupp in this schema, so value is billed lineitem
    cents rather than availqty·supplycost; the mean-relative threshold
    replaces Q11's 0.0001/SF fraction so the selectivity is scale-free.

    Plan: the nation-band supplier keyset broadcasts; ONE lineitem pass
    semi-filters and reduces exact per-part cent partials; the partials
    fold through the open-domain exchange ONCE and the result (one row
    per part — dimension-bounded) is materialized so the grand-total
    fold and the threshold filter reuse the same blocks instead of
    re-running the scan."""
    import pyarrow.compute as pc

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    band = sup.filter(pc.less(sup["s_nationkey"], _Q11_NATIONS))
    skeys_bc = Broadcast(band["s_suppkey"].combine_chunks().cast(pa.int64()))

    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"], split=True
    )

    def value_partial(batch: pa.Table) -> pd.DataFrame:
        b = batch.filter(pc.is_in(batch["l_suppkey"], value_set=skeys_bc.get()))
        cents = np.round(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False), "cents": cents}
            )
            .groupby("p_partkey", as_index=False)["cents"]
            .sum()
        )

    vals = grouped_aggregate(
        li.map_batches(value_partial, batch_format="pyarrow"),
        ["p_partkey"],
        {"cents": ("sum", "cents")},
    ).materialize()

    total = vals.sum("cents")
    nparts = vals.count()
    thr = (total / nparts) * _Q11_FACTOR

    def above(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["cents"], pa.scalar(thr)))

    out = vals.map_batches(above, batch_format="pyarrow").to_pandas()
    if "cents" not in out.columns:
        out = pd.DataFrame(
            {"p_partkey": pd.Series([], dtype=np.int64), "cents": pd.Series([], dtype=np.int64)}
        )
    out["value"] = np.round(out["cents"].to_numpy() / 100.0, 2)
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    return (
        out.sort_values(["value", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)[["p_partkey", "value"]]
    )


SQL_Q11 = f"""
WITH pv AS (
  SELECT l.l_partkey AS p_partkey,
         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE s.s_nationkey < {_Q11_NATIONS}
  GROUP BY 1
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, round(cents / 100.0, 2) AS value
FROM pv
WHERE cents > (SELECT sum(cents) / count(*) FROM pv) * {_Q11_FACTOR}
ORDER BY value DESC, p_partkey
"""


_Q20_PATTERN = "bolt"
_Q20_FROM = "1997-01-01"
_Q20_TO = "1998-01-01"
_Q20_SHARE = 0.3


def q_q20_dominant_suppliers(sf_dir: str):
    """TPC-H-Q20-shaped nested semi-join: suppliers who, for SOME part
    matching a name pattern, shipped more than a SHARE of that part's
    total quantity in one year.  Q20's availqty-vs-half-demand
    comparison becomes share-of-demand (no partsupp here); the
    IN (SELECT ... correlated threshold) nesting is preserved.

    Plan: the pattern-part keyset broadcasts; one windowed lineitem
    pass reduces whole-number quantity partials per (part, supplier);
    per-part totals derive from THOSE partials (no second scan) on the
    pattern-bounded domain and broadcast back; the dominant-supplier
    filter then runs distributed over the pair table and only distinct
    supplier ids — dimension-bounded — reach the driver for the name
    attach and final sort."""
    import pyarrow.compute as pc

    part = read_table_arrow(sf_dir, "part", columns=["p_partkey", "p_name"])
    pq = part.filter(pc.match_substring(part["p_name"], _Q20_PATTERN))
    pkeys_bc = Broadcast(pq["p_partkey"].combine_chunks().cast(pa.int64()))

    lo, hi = np.datetime64(_Q20_FROM, "us"), np.datetime64(_Q20_TO, "us")
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"], split=True
    )

    def qty_partial(batch: pa.Table) -> pd.DataFrame:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False)
        b = batch.filter(
            pc.and_(
                pa.array((d >= lo) & (d < hi)),
                pc.is_in(batch["l_partkey"], value_set=pkeys_bc.get()),
            )
        )
        return (
            pd.DataFrame(
                {
                    "p_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": b["l_suppkey"].to_numpy(zero_copy_only=False),
                    "qty": b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            .groupby(["p_partkey", "s_suppkey"], as_index=False)["qty"]
            .sum()
        )

    pairs = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey"],
        {"qty": ("sum", "qty")},
    ).materialize()

    totals = grouped_aggregate(
        pairs, ["p_partkey"], {"tq": ("sum", "qty")}, small_keys=True
    ).to_pandas()
    tq_bc = Broadcast(
        pd.Series(totals["tq"].to_numpy(), index=totals["p_partkey"].to_numpy())
    )

    def dominant(batch: pa.Table) -> pd.DataFrame:
        tq = tq_bc.get().reindex(batch["p_partkey"].to_numpy(zero_copy_only=False)).to_numpy()
        keep = batch["qty"].to_numpy(zero_copy_only=False) > _Q20_SHARE * tq
        return pd.DataFrame(
            {"s_suppkey": np.unique(batch["s_suppkey"].to_numpy(zero_copy_only=False)[keep])}
        )

    supp_ids = grouped_aggregate(
        pairs.map_batches(dominant, batch_format="pyarrow"),
        ["s_suppkey"],
        {"c": ("count", None)},
        small_keys=True,
    ).to_pandas()

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    names = pd.Series(
        sup["s_name"].to_pylist(), index=sup["s_suppkey"].to_numpy().astype(np.int64)
    )
    out = pd.DataFrame(
        {"s_name": names.reindex(supp_ids["s_suppkey"].astype(np.int64)).to_numpy()}
    )
    return out.sort_values("s_name").reset_index(drop=True)


SQL_Q20 = f"""
WITH pq AS (
  SELECT l.l_partkey AS p, l.l_suppkey AS s, sum(CAST(l.l_quantity AS BIGINT)) AS q
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '{_Q20_FROM}' AND l.l_shipdate < TIMESTAMP '{_Q20_TO}'
    AND l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%{_Q20_PATTERN}%')
  GROUP BY 1, 2
),
pt AS (SELECT p, sum(q) AS tq FROM pq GROUP BY 1)
SELECT DISTINCT s.s_name
FROM pq JOIN pt USING (p) JOIN supplier s ON s.s_suppkey = pq.s
WHERE pq.q > {_Q20_SHARE} * pt.tq
ORDER BY s.s_name
"""


_Q21_LATE_DAYS = 60
_Q21_NATIONS = 13


def q_q21_waiting_suppliers(sf_dir: str):
    """TPC-H-Q21-shaped double-EXISTS anti-join: for finalized orders,
    count per supplier the multi-supplier orders where THIS supplier was
    the only late one.  No commit/receipt dates in this schema, so
    "late" is shipping more than LATE_DAYS after the order date — the
    EXISTS(other supplier) AND NOT EXISTS(other LATE supplier) plan is
    preserved.

    Plan: lineitem pre-reduces per (order, supplier) to max(shipdate)
    — one row per pair — and that pair table joins the F-status order
    dates through the size-routed facade (the one fact-fact exchange).
    The double EXISTS collapses into a per-order aggregate: n_supp,
    n_late, and sum(late·suppkey) (which IS the lone late supplier's id
    when n_late = 1), so no self-join runs.  Per-supplier counts
    finalize on the dimension-bounded supplier domain."""
    from .tabular import join as join_route

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"], split=True)

    def max_ship(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "o_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                    "s_suppkey": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                    "ms": batch["l_shipdate"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["o_orderkey", "s_suppkey"], as_index=False)["ms"]
            .max()
        )

    pairs = grouped_aggregate(
        li.map_batches(max_ship, batch_format="pyarrow"),
        ["o_orderkey", "s_suppkey"],
        {"ms": ("max", "ms")},
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"], split=True
    )

    def final_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = batch.filter(pc.equal(batch["o_orderstatus"], "F"))
        return b.select(["o_orderkey", "o_orderdate"])

    j, _ = join_route(pairs, orders.map_batches(final_only, batch_format="pyarrow"), on="o_orderkey")

    late_delta = np.timedelta64(_Q21_LATE_DAYS, "D")

    def late_flags(df: pd.DataFrame) -> pd.DataFrame:
        late = (
            df["ms"].to_numpy() > df["o_orderdate"].to_numpy() + late_delta
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy().astype(np.int64),
                "late": late,
                "late_sk": late * df["s_suppkey"].to_numpy().astype(np.int64),
            }
        )

    stats = grouped_aggregate(
        j.map_batches(late_flags, batch_format="pandas"),
        ["o_orderkey"],
        {"n_supp": ("count", None), "n_late": ("sum", "late"), "late_sk": ("sum", "late_sk")},
    )

    def lone_late(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["n_supp"].to_numpy() >= 2) & (df["n_late"].to_numpy() == 1)
        return pd.DataFrame({"late_sk": df["late_sk"].to_numpy()[keep].astype(np.int64)})

    waits = grouped_aggregate(
        stats.map_batches(lone_late, batch_format="pandas"),
        ["late_sk"],
        {"numwait": ("count", None)},
    ).to_pandas()

    sup = read_table_arrow(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"])
    sdf = sup.to_pandas()
    sdf["s_suppkey"] = sdf["s_suppkey"].astype(np.int64)
    out = waits.merge(sdf, left_on="late_sk", right_on="s_suppkey")
    out = out[out["s_nationkey"].astype(np.int64) < _Q21_NATIONS]
    out["numwait"] = out["numwait"].astype(np.int64)
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True]).head(100)
    return out[["s_name", "numwait"]].reset_index(drop=True)


SQL_Q21 = f"""
WITH ls AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk, max(l_shipdate) AS ms
  FROM lineitem GROUP BY 1, 2
),
j AS (
  SELECT ls.ok, ls.sk, ls.ms, o.o_orderdate AS od
  FROM ls JOIN orders o ON o.o_orderkey = ls.ok
  WHERE o.o_orderstatus = 'F'
),
st AS (
  SELECT ok, count(*) AS n_supp,
         sum(CASE WHEN ms > od + INTERVAL {_Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END) AS n_late,
         sum(CASE WHEN ms > od + INTERVAL {_Q21_LATE_DAYS} DAY THEN sk ELSE 0 END) AS late_sk
  FROM j GROUP BY 1
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM st JOIN supplier s ON s.s_suppkey = st.late_sk
WHERE st.n_supp >= 2 AND st.n_late = 1 AND s.s_nationkey < {_Q21_NATIONS}
GROUP BY 1
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the documents corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "hash", "scan")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_term_freqs(texts, terms) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc term frequencies + doc lengths for one batch:
    one Arrow split, then per-term boolean mask + offset-windowed cumsum
    — no Python loop over docs or tokens."""
    import pyarrow.compute as pc

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    split = pc.split_pattern(arr, " ")
    offs = np.asarray(split.offsets)
    dl = (offs[1:] - offs[:-1]).astype(np.int64)
    tf = np.empty((len(terms), dl.size), dtype=np.int64)
    for i, term in enumerate(terms):
        m = pc.equal(split.values, term).to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.concatenate([[0], np.cumsum(m)])
        tf[i] = c[offs[1:]] - c[offs[:-1]]
    return tf, dl


def q_bm25_search(sf_dir: str):
    """BM25 ranked retrieval (Lucene idf variant, k1=1.2, b=0.75) for a
    fixed term query over the documents corpus — the sparse-retrieval
    scorer complementing the dense ``rag_index_search`` path.

    Two streaming passes, nothing materializes: pass 1 folds bounded
    per-batch partials (doc count, total length, per-term doc
    frequencies — ONE row per block) into global idf/avgdl; those
    broadcast once and pass 2 re-reads the corpus, scores each batch
    with the vectorized tf kernel, and keeps a per-batch top-k so only
    blocks × k candidate rows reach the driver's final cut.  Scores are
    float64 rounded to 6 dp on BOTH engines before the (score desc,
    doc_id) cut, so the top-k boundary is deterministic."""
    terms = list(_BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        row: dict = {"n": [dl.size], "sum_dl": [int(dl.sum())]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int((tf[i] > 0).sum())]
        return pa.table(row)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    df = np.asarray([stats[f"df{i}"] for i in range(len(terms))], dtype=np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    handle = Broadcast((idf, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        idf_vec, avg = handle.get()
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avg)
        s = np.round((idf_vec[:, None] * tff * (k1 + 1.0) / denom).sum(axis=0), 6)
        keep = s > 0.0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        s = s[keep]
        order = np.lexsort((ids, -s))[:_BM25_TOPK]
        return pd.DataFrame({"doc_id": ids[order], "score": s[order]})

    cands = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cands = cands.sort_values(["score", "doc_id"], ascending=[False, True])
    return cands.head(_BM25_TOPK).reset_index(drop=True)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

SQL_BM25 = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, (SELECT count(*) FROM documents) AS n FROM dl),
qt AS (SELECT unnest([{_BM25_TERMS_SQL}]) AS term),
df AS (SELECT t.tok AS term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1),
tf AS (SELECT t.doc_id, t.tok AS term, count(*) AS tf
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1, 2),
scores AS (
  SELECT tf.doc_id,
         sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 6) AS score
FROM scores ORDER BY round(s, 6) DESC, doc_id LIMIT {_BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# Entity resolution: dirty records → blocked JW match → CC → canonical
# ---------------------------------------------------------------------------

_ER_THRESHOLD = 0.93
_ER_VOCAB_BLOCKS = 8


def q_entity_resolution(sf_dir: str):
    """Entity resolution end-to-end: deterministic "dirty" variants of
    part names (identity / drop-last-char / plural-s / capitalize, keyed
    on p_partkey % 4 — SQL-expressible typo rules) are resolved back to
    entities by blocked pairwise Jaro-Winkler (≥ 0.93 on lowercase,
    first-letter blocks), connected components over the match graph, and
    canonical-record election (min p_partkey per entity).  Output:
    (p_partkey, entity_id, entity_size) for every record.

    Scale shape — the similarity work runs over the DISTINCT-name set,
    which is vocabulary-bounded, not corpus-bounded: per-block unique
    partials fold to the name list once; pair generation fans the
    name-id range back out through ``map_batches`` (each task compares
    its id slice against the broadcast name array within blocks —
    O(V²/P) per task, no driver loop); components go through
    stages.graph.connected_components' size-routed kernel; and the
    name→entity map broadcasts back over the streaming record scan, so
    the record corpus itself never shuffles.  Our JW is bit-identical
    to DuckDB's ``jaro_winkler_similarity`` (§2h oracles), so match
    decisions agree exactly."""
    import ray.data as rd

    import pyarrow.compute as pc

    from ..functions.strings import jaro_winkler_similarity
    from ..stages.graph import connected_components

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name"], split=True)

    def dirty(batch: pa.Table) -> pa.Table:
        names = np.asarray(batch["p_name"].to_pylist(), dtype=object)
        keys = batch["p_partkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(names.astype(str), return_inverse=True)
        variants = np.empty((uniq.size, 4), dtype=object)
        for i, nm in enumerate(uniq):
            variants[i] = (nm, nm[:-1], nm + "s", nm[:1].upper() + nm[1:])
        rec = variants[inv, keys % 4]
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "rec_name": pa.array(list(rec), type=pa.string()),
            }
        )

    recs = ds.map_batches(dirty, batch_format="pyarrow")

    def name_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"rec_name": pc.unique(batch["rec_name"])})

    # vocabulary-bounded: one unique-partial per block drains to the fold
    vocab = np.asarray(
        sorted(set(recs.map_batches(name_partial, batch_format="pyarrow").to_pandas()["rec_name"])),
        dtype=object,
    )
    names_bc = Broadcast(vocab)

    def pair_edges(batch: pa.Table) -> pa.Table:
        arr = names_bc.get()
        lows = np.asarray([s.lower() for s in arr], dtype=object)
        out_s: list[int] = []
        out_d: list[int] = []
        for i in batch["id"].to_numpy(zero_copy_only=False):
            la = lows[i]
            b0 = la[:1]
            for j in range(i + 1, arr.size):
                lb = lows[j]
                if lb[:1] == b0 and jaro_winkler_similarity(la, lb) >= _ER_THRESHOLD:
                    out_s.append(i)
                    out_d.append(j)
        return pa.table(
            {
                "src": pa.array(out_s, type=pa.int64()),
                "dst": pa.array(out_d, type=pa.int64()),
            }
        )

    ids_ds = rd.range(len(vocab), override_num_blocks=_ER_VOCAB_BLOCKS)
    edges = ids_ds.map_batches(pair_edges, batch_format="pyarrow")
    nodes = ids_ds.map_batches(
        lambda t: pa.table({"node": pc.cast(t["id"], pa.int64())}), batch_format="pyarrow"
    )
    comp = connected_components(edges, nodes=nodes).to_pandas()  # ≤ |vocab| rows
    comp_of = np.empty(len(vocab), dtype=np.int64)
    comp_of[comp["node"].to_numpy(dtype=np.int64)] = comp["component"].to_numpy(dtype=np.int64)
    comp_bc = Broadcast((vocab, comp_of))

    def label(batch: pa.Table) -> pa.Table:
        arr, cmap = comp_bc.get()
        names = np.asarray(batch["rec_name"].to_pylist(), dtype=object)
        idx = np.searchsorted(arr, names)
        return pa.table({"p_partkey": batch["p_partkey"], "comp": pa.array(cmap[idx])})

    labeled = recs.map_batches(label, batch_format="pyarrow")
    canon = grouped_aggregate(
        labeled, ["comp"], {"entity_id": ("min", "p_partkey"), "entity_size": ("count", None)}
    ).to_pandas()  # ≤ |vocab| rows
    canon = canon.sort_values("comp")
    canon_bc = Broadcast(
        (
            canon["comp"].to_numpy(dtype=np.int64),
            canon["entity_id"].to_numpy(dtype=np.int64),
            canon["entity_size"].to_numpy(dtype=np.int64),
        )
    )

    def attach(batch: pa.Table) -> pa.Table:
        comps, eids, sizes = canon_bc.get()
        i = np.searchsorted(comps, batch["comp"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "p_partkey": batch["p_partkey"],
                "entity_id": pa.array(eids[i]),
                "entity_size": pa.array(sizes[i]),
            }
        )

    return labeled.map_batches(attach, batch_format="pyarrow")


SQL_ENTITY_RESOLUTION = f"""
WITH RECURSIVE
recs AS (
  SELECT p_partkey,
         CASE p_partkey % 4
           WHEN 0 THEN p_name
           WHEN 1 THEN substr(p_name, 1, length(p_name) - 1)
           WHEN 2 THEN p_name || 's'
           ELSE upper(substr(p_name, 1, 1)) || substr(p_name, 2)
         END AS rec_name
  FROM part
),
names AS (SELECT DISTINCT rec_name FROM recs),
e0 AS (
  SELECT a.rec_name AS src, b.rec_name AS dst
  FROM names a JOIN names b
    ON lower(substr(a.rec_name, 1, 1)) = lower(substr(b.rec_name, 1, 1))
   AND a.rec_name < b.rec_name
  WHERE jaro_winkler_similarity(lower(a.rec_name), lower(b.rec_name)) >= {_ER_THRESHOLD}
),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
cc(node, lbl) AS (
  SELECT rec_name, rec_name FROM names
  UNION
  SELECT e.dst, c.lbl FROM cc c JOIN edges e ON e.src = c.node
),
comp AS (SELECT node AS rec_name, min(lbl) AS comp_name FROM cc GROUP BY node),
labeled AS (SELECT r.p_partkey, c.comp_name FROM recs r JOIN comp c USING (rec_name)),
canon AS (
  SELECT comp_name, min(p_partkey) AS entity_id,
         CAST(count(*) AS BIGINT) AS entity_size
  FROM labeled GROUP BY comp_name
)
SELECT l.p_partkey, c.entity_id, c.entity_size
FROM labeled l JOIN canon c USING (comp_name)
"""


# ---------------------------------------------------------------------------
# Bounded-hop multi-source weighted shortest paths
# ---------------------------------------------------------------------------

_SSSP_SEED_MOD = 100
_SSSP_ITERS = 16


def q_sssp_weighted(sf_dir: str):
    """Bounded-hop multi-source weighted shortest paths
    (stages/graph.sssp) over a deterministic SQL-derivable doc graph:
    chain edges i→i+1 (w = 1 + i%5) plus coin long jumps i→i+13
    (w = 2 + i%7, iff md5(i) < 'c' — the same md5-coin device as
    ``dedup_clusters``).  Seeds are every 100th doc; 16 Bellman-Ford
    sweeps give the exact min cost over ≤16-hop paths, value-oracled
    against a chained-CTE unroll of the same relaxation.  Int64 weights
    throughout → exact equality, no rounding policy needed."""
    from ..stages.graph import sssp
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows

    def gen_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        k1 = ids[ids + 1 < n_docs]
        coin = md5_lt_mask(batch["doc_id"], "c" + "0" * 31) & (ids + 13 < n_docs)
        k2 = ids[coin]
        return pa.table(
            {
                "src": pa.array(np.concatenate([k1, k2])),
                "dst": pa.array(np.concatenate([k1 + 1, k2 + 13])),
                "w": pa.array(np.concatenate([1 + k1 % 5, 2 + k2 % 7])),
            }
        )

    edges = ds.map_batches(gen_edges, batch_format="pyarrow")
    seeds = np.arange(0, n_docs, _SSSP_SEED_MOD, dtype=np.int64)
    out = sssp(edges, seeds, iters=_SSSP_ITERS)
    return pd.DataFrame(
        {"doc_id": out["node"].to_numpy(), "dist": out["dist"].to_numpy()}
    )


def _sssp_sql() -> str:
    parts = [
        f"""
WITH e0 AS MATERIALIZED (
  SELECT doc_id AS src, doc_id + 1 AS dst, CAST(1 + doc_id % 5 AS BIGINT) AS w
  FROM documents WHERE doc_id + 1 < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, doc_id + 13, CAST(2 + doc_id % 7 AS BIGINT)
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) < 'c'
    AND doc_id + 13 < (SELECT count(*) FROM documents)
),
d0 AS (
  SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE doc_id % {_SSSP_SEED_MOD} = 0
)"""
    ]
    for k in range(1, _SSSP_ITERS + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{k - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{k - 1} d JOIN e0 e ON e.src = d.node
  ) AS u GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node AS doc_id, dist FROM d{_SSSP_ITERS}")
    return "".join(parts)


SQL_SSSP = _sssp_sql()


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed-feature LM ratio + Gumbel top-k)
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_K = 100
_DSIR_TARGET_LANG = "en"


def _dsir_doc_bucket_counts(texts, m: int) -> np.ndarray:
    """Per-doc hashed-unigram bucket-count matrix (docs × m) for one
    batch.  md5 runs once per DISTINCT token (vocabulary-bounded memo),
    then occurrences map through an Arrow ``index_in`` and a single
    vectorized 2-D scatter-add — no Python loop over tokens."""
    import pyarrow.compute as pc

    from .tabular import md5_digest_words

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    split = pc.split_pattern(arr, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    uniq = pc.unique(flat)
    hi, _lo = md5_digest_words(uniq)
    ubucket = ((hi >> np.uint64(32)) % np.uint64(m)).astype(np.int64)
    idx = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False)
    tok_bucket = ubucket[idx]
    docrow = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    counts = np.zeros((lens.size, m), dtype=np.int64)
    np.add.at(counts, (docrow, tok_bucket), 1)
    return counts


def q_dsir_select(sf_dir: str):
    """DSIR-style data selection (importance resampling over hashed
    LM features, after Xie et al. 2023): score every document by how
    much more likely its hashed-unigram profile is under the TARGET
    distribution (here: the ``lang = 'en'`` slice) than under the raw
    corpus, then draw a without-replacement sample of the top
    ``_DSIR_K`` via deterministic Gumbel top-k.

    log w(doc) = Σ_tokens [ln p̂(bucket) − ln q̂(bucket)] with add-1
    smoothing over ``_DSIR_BUCKETS`` md5-hash buckets; the Gumbel key is
    log w − ln(−ln u) with u derived from md5(doc_id) — fully
    deterministic and SQL-expressible, so the whole selection is
    value-oracled.

    Scale shape: pass 1 folds one (bucket → target count, corpus count)
    partial per block (2m+2 ints — fixed width at any corpus size) into
    the smoothed log-ratio vector, which broadcasts; pass 2 re-streams
    the corpus, computes per-doc log-weights as ONE matmul of the
    per-batch bucket-count matrix against the ratio vector, and keeps a
    per-batch top-k so only blocks × k candidates reach the driver's
    final cut."""
    m, k = _DSIR_BUCKETS, _DSIR_K
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"], split=True)

    def stats_partial(batch: pa.Table) -> pa.Table:
        counts = _dsir_doc_bucket_counts(batch["text"], m)
        import pyarrow.compute as pc

        is_target = pc.equal(batch["lang"], _DSIR_TARGET_LANG).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array(np.arange(m, dtype=np.int64)),
                "t": pa.array(counts[is_target].sum(axis=0)),
                "a": pa.array(counts.sum(axis=0)),
            }
        )

    # fixed-width partials (m rows per block) → one driver fold
    folded = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("b", as_index=False)
        .sum()
        .sort_values("b")
    )
    t = folded["t"].to_numpy(dtype=np.float64)
    a = folded["a"].to_numpy(dtype=np.float64)
    ratio = np.log((t + 1.0) / (t.sum() + m)) - np.log((a + 1.0) / (a.sum() + m))
    handle = Broadcast(ratio)

    def score(batch: pa.Table) -> pd.DataFrame:
        from .tabular import md5_digest_words

        r = handle.get()
        counts = _dsir_doc_bucket_counts(batch["text"], m)
        lw = counts.astype(np.float64) @ r
        hi, _lo = md5_digest_words(batch["doc_id"])
        u = ((hi >> np.uint64(32)).astype(np.float64) + 0.5) / 4294967296.0
        key = lw - np.log(-np.log(u))
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return pd.DataFrame(
            {"doc_id": ids[order], "logw": np.round(lw[order], 6), "k": key[order]}
        )

    cands = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    cands = cands.sort_values(["k", "doc_id"], ascending=[False, True]).head(k)
    return cands[["doc_id", "logw"]].reset_index(drop=True)


SQL_DSIR = f"""
WITH tb AS MATERIALIZED (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(tok), 1, 8))::UBIGINT % {_DSIR_BUCKETS} AS BIGINT) AS b
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents)
),
tcnt AS (SELECT b, count(*) AS t FROM tb WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b),
acnt AS (SELECT b, count(*) AS a FROM tb GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM tb WHERE lang = '{_DSIR_TARGET_LANG}') AS tt,
         (SELECT count(*) FROM tb) AS ta
),
ratio AS (
  SELECT a.b,
         ln((coalesce(t.t, 0) + 1.0) / (tot.tt + {_DSIR_BUCKETS}.0))
         - ln((a.a + 1.0) / (tot.ta + {_DSIR_BUCKETS}.0)) AS r
  FROM acnt a LEFT JOIN tcnt t USING (b) CROSS JOIN tot
),
logw AS (
  SELECT tb.doc_id, sum(r.r) AS lw FROM tb JOIN ratio r USING (b) GROUP BY tb.doc_id
),
keyed AS (
  SELECT doc_id, lw,
         lw - ln(-ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT) + 0.5)
                     / 4294967296.0)) AS k
  FROM logw
)
SELECT doc_id, round(lw, 6) AS logw
FROM keyed ORDER BY k DESC, doc_id LIMIT {_DSIR_K}
"""


# ---------------------------------------------------------------------------
# Density-based boilerplate strip (generic main-content extraction)
# ---------------------------------------------------------------------------

#: docs per scale factor for the density-extraction demo corpus — the
#: operator is per-document parse work (like the flagship), so the
#: bench-facing query sizes the corpus to stay comparable to one bench
#: slot; throughput is what scales, not this constant.
_BOILER_DOCS_PER_SF = 20_000


def _boiler_corpus_docs(sf_dir: str) -> int:
    """Boiler-demo corpus size derived from the supplied CORPUS (the
    documents table's row count), not from parsing the directory name —
    a non-'sfX' path used to silently fall back to the fixed 500-doc
    fixture while appearing to honor the input (round-4 advice).  A
    missing documents table now raises instead of being ignored.  The
    2/5 ratio reproduces the historical sf→docs mapping at every
    shipped scale (500→500, 5000→2000)."""
    import os

    from ..sources.io import corpus_num_rows

    n = corpus_num_rows(os.path.join(sf_dir, "documents.parquet"))
    if not n:
        raise FileNotFoundError(f"no documents table under {sf_dir!r}")
    return max(500, n * 2 // 5)


def q_boilerplate_strip(sf_dir: str):
    """Generic density-based main-content extraction
    (stages/boilerplate.DensityExtractStage): jusText/Boilerpipe-style
    block segmentation + link-density/length classification + short-block
    context inheritance, over the deterministic interleaved synthetic
    corpus (the BASELINE input_hint shape — /root/testdata has no HTML
    table).  Complements the reference-parity ``<p>`` extractor: that one
    matches the reference bit-for-bit; this one is the crawl-pipeline
    main-content path for arbitrary markup.  Rows-only driver check
    (HTML parsing has no SQL oracle); the classifier semantics are
    pytest-verified on planted nav/ads/footer markup
    (tests/test_boilerplate.py)."""
    import os

    import ray.data as rd

    from ..sources.synth import ensure_corpus_parquet
    from ..stages.boilerplate import DensityExtractStage

    n_docs = _boiler_corpus_docs(sf_dir)
    corpus = ensure_corpus_parquet("/tmp/ae_corpora", n_docs, 42)
    ds = rd.read_parquet(str(corpus), columns=["doc_id", "spans"])
    out = ds.map_batches(
        DensityExtractStage, batch_size=64, concurrency=(1, 8), batch_format="pyarrow"
    )
    return out.map_batches(
        lambda df: df[["doc_id", "n_blocks", "content_blocks", "boiler_blocks", "content_chars"]],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Big-big interval overlap join (chunk co-partitioned)
# ---------------------------------------------------------------------------

_IVJ_DUR_US = 120_000_000  # 2-minute intervals
_IVJ_CHUNK_US = 600_000_000  # 10-minute co-partition chunks


def q_interval_overlap_join(sf_dir: str):
    """Big-big interval overlap join (pipelines/tabular.interval_join):
    every view event and click event becomes a 2-minute half-open
    interval; emit all (view, click) pairs whose intervals overlap.
    Neither side is top-k'd or broadcast — both replicate to 10-minute
    time chunks and co-partition ONCE, with each qualifying pair
    attributed to the single chunk containing max(lo_a, lo_b) (so
    multi-chunk pairs dedupe arithmetically, no second exchange).  This
    is the at-scale path `q_range_join`'s docstring names, running and
    value-oracled against DuckDB's native IEJoin plan."""
    from .tabular import interval_join

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "event_type"], split=True)

    def side(kind: str, idc: str, lo: str, hi: str):
        def mk(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(batch["event_type"], kind)
            t = batch.filter(keep)
            ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            return pa.table(
                {idc: t["event_id"], lo: pa.array(ts), hi: pa.array(ts + _IVJ_DUR_US)}
            )

        return mk

    a = ev.map_batches(side("view", "a_id", "lo_a", "hi_a"), batch_format="pyarrow")
    b = ev.map_batches(side("click", "b_id", "lo_b", "hi_b"), batch_format="pyarrow")
    out = interval_join(a, b, width=_IVJ_CHUNK_US)
    return out.map_batches(lambda df: df[["a_id", "b_id"]], batch_format="pandas")


SQL_INTERVAL_OVERLAP = f"""
WITH a AS (
  SELECT event_id AS a_id, epoch_us(ts) AS lo, epoch_us(ts) + {_IVJ_DUR_US} AS hi
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT event_id AS b_id, epoch_us(ts) AS lo, epoch_us(ts) + {_IVJ_DUR_US} AS hi
  FROM events WHERE event_type = 'click'
)
SELECT a.a_id, b.b_id FROM a JOIN b ON a.lo < b.hi AND b.lo < a.hi
"""


# ---------------------------------------------------------------------------
# Multi-touch linear attribution + cross-source duplicate overlap report
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 86_400 * 1_000_000  # 7-day lookback


def q_attribution_linear(sf_dir: str):
    """Multi-touch LINEAR attribution (the many-to-many complement of
    ``attribution_last_touch``): every purchase splits one unit of
    credit equally across ALL of the user's click/view touches in the
    7-day lookback window; output is total credit per touch type.

    Shape: one user-hash exchange co-partitions each user's events,
    then the per-user kernel is pure ``np.searchsorted`` band counting
    (touch timestamps sorted once per user; each purchase costs two
    binary searches per type — no pairwise expansion, even though the
    logical join is many-to-many).  Only two floats per block drain to
    the driver fold.  Credit totals are rounded to 6 dp on both engines
    (sum-order policy)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"], split=True)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        et = df["event_type"].to_numpy(dtype=object)
        credit = {"click": 0.0, "view": 0.0}
        p_ts = np.sort(ts[et == "purchase"])
        if p_ts.size:
            bands = {k: np.sort(ts[et == k]) for k in ("click", "view")}
            counts = {
                k: np.searchsorted(v, p_ts, side="left")
                - np.searchsorted(v, p_ts - _ATTR_LOOKBACK_US, side="left")
                for k, v in bands.items()
            }
            total = counts["click"] + counts["view"]
            live = total > 0
            for k in ("click", "view"):
                credit[k] = float((counts[k][live] / total[live]).sum())
        return pd.DataFrame(
            {"event_type": ["click", "view"], "credit": [credit["click"], credit["view"]]}
        )

    per = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    out = per.to_pandas().groupby("event_type", as_index=False)["credit"].sum()
    out["credit"] = out["credit"].round(6)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_ATTRIBUTION_LINEAR = f"""
WITH t AS (SELECT user_id, ts, event_type FROM events WHERE event_type IN ('click', 'view')),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
w AS (
  SELECT t.event_type,
         1.0 / count(*) OVER (PARTITION BY p.user_id, p.ts) AS c
  FROM p JOIN t
    ON t.user_id = p.user_id
   AND epoch_us(t.ts) >= epoch_us(p.ts) - {_ATTR_LOOKBACK_US}
   AND epoch_us(t.ts) < epoch_us(p.ts)
)
SELECT event_type, round(sum(c), 6) AS credit FROM w GROUP BY event_type ORDER BY event_type
"""


_OVERLAP_PREFIX = 20


def q_source_overlap(sf_dir: str):
    """Cross-source duplicate overlap report: for every pair of
    sources, how many (prefix-20 fingerprint) duplicate text pairs they
    share — the "which feeds duplicate each other" audit that decides
    crawl-dedup priorities.

    Shape: ONE fingerprint-hash exchange co-partitions all copies of a
    fingerprint; the per-group kernel expands only CROSS-SOURCE pairs
    (bounded by per-fingerprint copy counts, the same bound exact dedup
    relies on); per-pair partial counts fold in a tiny grouped sum —
    the corpus text never moves, only 20-byte fingerprints."""
    ds = read_table(sf_dir, "documents", columns=["text", "source"], split=True)

    def fp(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "fp": pc.utf8_slice_codeunits(batch["text"], 0, _OVERLAP_PREFIX),
                "source": batch["source"],
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        src = np.sort(df["source"].to_numpy(dtype=object))
        n = src.size
        if n < 2:
            return pd.DataFrame({"src_a": [], "src_b": [], "n": []})
        ii, jj = np.triu_indices(n, k=1)
        keep = src[ii] != src[jj]
        if not keep.any():
            return pd.DataFrame({"src_a": [], "src_b": [], "n": []})
        out = pd.DataFrame({"src_a": src[ii][keep], "src_b": src[jj][keep]})
        return out.groupby(["src_a", "src_b"], as_index=False).size().rename(columns={"size": "n"})

    per = ds.map_batches(fp, batch_format="pyarrow").groupby("fp").map_groups(
        pairs, batch_format="pandas"
    )
    out = per.to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"src_a": pd.Series(dtype=object), "src_b": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    out = out.groupby(["src_a", "src_b"], as_index=False)["n"].sum()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


SQL_SOURCE_OVERLAP = f"""
SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n
FROM documents a JOIN documents b
  ON substr(a.text, 1, {_OVERLAP_PREFIX}) = substr(b.text, 1, {_OVERLAP_PREFIX})
 AND a.source < b.source
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Quality-classifier train + filter (distributed logistic regression)
# ---------------------------------------------------------------------------


def _quality_features(batch: pa.Table) -> np.ndarray:
    """Cheap vectorized text features: log doc length, mean token
    length, type-token ratio — the classic quality-signal trio."""
    import pyarrow.compute as pc

    arr = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    split = pc.split_pattern(arr, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.float64)
    chars = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    flat = pc.list_flatten(split)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    offs = np.concatenate([[0], np.cumsum(lens).astype(np.int64)])
    c = np.concatenate([[0.0], np.cumsum(tok_lens)])
    mean_tok = (c[offs[1:]] - c[offs[:-1]]) / np.maximum(lens, 1.0)
    # distinct-token ratio per doc: unique (doc, token-id) pairs →
    # bincount per doc — fully vectorized, no per-doc Python
    uniq = pc.unique(flat)
    idx = pc.index_in(flat, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    docrow = np.repeat(np.arange(lens.size, dtype=np.int64), lens.astype(np.int64))
    upair = np.unique(docrow * len(uniq) + idx)
    distinct = np.bincount(upair // len(uniq), minlength=lens.size)
    ttr = distinct / np.maximum(lens, 1.0)
    return np.column_stack([np.log1p(chars), mean_tok, ttr])


def _quality_feature_standardizer(ds):
    """One streaming moment pass over the three quality features → a
    z-scoring feature fn.  Raw scale matters: log-length / mean-token
    features have ‖x‖² ≈ 50, so full-batch GD at lr 0.5 sits far above
    the 2/L stability bound and DIVERGES (observed: train log-loss 4×
    the zero-weight chance loss at sf0.1 before this pass existed);
    standardized features put the Lipschitz constant near (d+1)/4 and
    the same lr converges monotonically."""

    def mom(batch: pa.Table) -> pd.DataFrame:
        x = _quality_features(batch)
        return pd.DataFrame(
            [{"n": float(len(x)), "s": x.sum(axis=0), "ss": (x * x).sum(axis=0)}]
        )

    parts = ds.map_batches(mom, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.asarray(p["ss"]) for p in parts], axis=0)
    mean = s / n
    sd = np.sqrt(np.maximum(ss / n - mean * mean, 1e-12))
    bc = Broadcast((mean, sd))

    def fn(batch: pa.Table) -> np.ndarray:
        m, d = bc.get()
        return (_quality_features(batch) - m) / d

    return fn


def q_quality_classifier(sf_dir: str):
    """Train-then-filter quality gate (stages/logreg.py): a distributed
    full-batch logistic regression learns to separate ``lang='en'``
    docs from the rest on three cheap text features, then the corpus
    streams once more through the broadcast-weights scorer and the gate
    keeps p ≥ 0.5.  Output: per-lang kept/total counts — the audit
    table a curation run reports.  Rows-only driver check (iterative
    fit has no SQL oracle); the distributed fit is parity-tested
    against the textbook driver kernel and the gate decisions are
    deterministic (tests/test_logreg.py)."""
    from ..stages.logreg import logreg_fit, logreg_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"], split=True)

    def labels(batch: pa.Table) -> np.ndarray:
        import pyarrow.compute as pc

        return pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False).astype(np.float64)

    # standardized features (see _quality_feature_standardizer: the raw
    # scale diverges at lr 0.5); 24 sweeps — decisions are stable well
    # before this (each sweep is one plan launch, the dominant bench cost)
    feats = _quality_feature_standardizer(ds)
    w = logreg_fit(ds, feats, labels, d=3, iters=24, lr=0.5)
    scored = logreg_score(ds, w, feats)

    def gate_counts(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"lang": batch["lang"].to_pylist(), "kept": batch["p"].to_numpy() >= 0.5}
        )
        g = df.groupby("lang", as_index=False).agg(kept=("kept", "sum"), total=("kept", "size"))
        return g

    per = scored.map_batches(gate_counts, batch_format="pyarrow").to_pandas()
    out = per.groupby("lang", as_index=False)[["kept", "total"]].sum()
    out["kept"] = out["kept"].astype(np.int64)
    out["total"] = out["total"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer training (SentencePiece-style, hard-EM)
# ---------------------------------------------------------------------------


def q_unigram_train(sf_dir: str):
    """SentencePiece-style unigram-LM tokenizer training
    (stages/unigram_lm.py): seed substring candidates → Viterbi hard-EM
    sweeps with geometric pruning → (piece, logp) vocabulary.  One
    corpus pass (the distributed word-count fold shared with BPE); all
    EM sweeps iterate the distinct-WORD dataset with the piece table
    broadcast — vocabulary-bounded work, like bpe_train.  Rows-only
    driver check (iterative EM has no SQL oracle); distributed-vs-local
    frame equality, Viterbi tie rules, and pruning invariants are
    pytest-verified (tests/test_unigram_lm.py)."""
    from ..stages.unigram_lm import unigram_lm_train

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)
    return unigram_lm_train(ds, vocab_size=120, rounds=3, max_len=5)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance + field-level survivorship merge
# ---------------------------------------------------------------------------


def q_incremental_agg(sf_dir: str):
    """Incremental materialized-aggregate maintenance: a per-customer
    (order count, total cents) aggregate built over the BASE snapshot
    (orders with key < 80% of the table) is brought up to date by a
    signed CDC delta — inserts (the remaining 20%) at +1 and deletes
    (every 7th base order) at −1 — WITHOUT recomputing from scratch.
    This is the view-maintenance half of `cdc_apply` (which replays
    row-level tombstones): counts and sums are self-maintainable under
    Σ±delta, so the merge is base ∪ signed-delta → ONE grouped sum, and
    groups whose maintained count hits 0 drop out.  Prices are summed
    as integer cents (exact, no float policy).  Oracle: full recompute
    of the final state in SQL."""
    import pyarrow.compute as pc

    n_orders = read_table_arrow(sf_dir, "orders", columns=["o_orderkey"]).num_rows
    cut = (n_orders * 8) // 10

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"], split=True
    )

    def signed(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        cust = batch["o_custkey"].to_numpy(zero_copy_only=False)
        base = k < cut
        insert = ~base
        delete = base & (k % 7 == 0)
        sign = np.where(insert | base, np.int64(1), np.int64(0))
        # one pass emits base rows (+1), insert rows (+1) and delete
        # rows (−1) — the delete re-emits the base row negated
        out_cust = np.concatenate([cust, cust[delete]])
        out_sign = np.concatenate([sign, np.full(int(delete.sum()), -1, dtype=np.int64)])
        out_cents = np.concatenate([cents, cents[delete]])
        return pa.table(
            {
                "o_custkey": pa.array(out_cust),
                "n": pa.array(out_sign),
                "total_cents": pa.array(out_cents * out_sign),
            }
        )

    merged = grouped_aggregate(
        ds.map_batches(signed, batch_format="pyarrow"),
        ["o_custkey"],
        {"n": ("sum", "n"), "total_cents": ("sum", "total_cents")},
    )
    return merged.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 0)), batch_format="pyarrow"
    )


SQL_INCREMENTAL_AGG = """
WITH final_rows AS (
  SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey >= (SELECT count(*) * 8 // 10 FROM orders)
     OR (o_orderkey < (SELECT count(*) * 8 // 10 FROM orders) AND o_orderkey % 7 <> 0)
)
SELECT o_custkey, CAST(count(*) AS BIGINT) AS n, sum(cents) AS total_cents
FROM final_rows GROUP BY o_custkey HAVING count(*) > 0
"""


def q_survivorship_merge(sf_dir: str):
    """Field-level survivorship (MDM golden-record rule): per customer,
    each FIELD independently takes its value from the latest order (by
    o_orderdate, tie → higher o_orderkey) where that field passes its
    validity rule — here o_totalprice is treated as missing on every
    5th order and o_orderpriority as missing when the status is 'F', so
    the two golden fields usually come from DIFFERENT rows (what makes
    survivorship different from latest-row-wins `merge_upsert`).

    Shape: ONE coarse 64-bucket customer-hash exchange (per-customer
    map_groups measured ~4.8 s at sf0.1 vs ~1 s bucketed — thousands of
    tiny Python groups is the anti-pattern); the per-bucket kernel
    sorts once by (cust, date, key) and takes each field's last valid
    index with a vectorized masked groupby-max over row positions — no
    per-customer Python.  Output cents are exact ints."""
    ds = read_table(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus",
                 "o_orderpriority"],
        split=True,
    )

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["o_custkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def golden_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).reset_index(drop=True)
        cust = df["o_custkey"].to_numpy().astype(np.int64)
        k = df["o_orderkey"].to_numpy()
        price_ok = (k % 5) != 0
        prio_ok = df["o_orderstatus"].to_numpy(dtype=object) != "F"
        cents = np.round(df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        idx = np.arange(len(df), dtype=np.int64)
        # rows are contiguous & ascending per customer, so a masked
        # positional max IS the newest-valid row for that field
        ip = pd.Series(np.where(price_ok, idx, -1)).groupby(cust, sort=True).max()
        ir = pd.Series(np.where(prio_ok, idx, -1)).groupby(cust, sort=True).max()
        ipv, irv = ip.to_numpy(), ir.to_numpy()
        gc = pd.array(cents[np.maximum(ipv, 0)], dtype="Int64")
        gc[ipv < 0] = pd.NA
        prio = df["o_orderpriority"].to_numpy(dtype=object)
        gp = np.where(irv >= 0, prio[np.maximum(irv, 0)], None)
        return pd.DataFrame(
            {"o_custkey": ip.index.to_numpy(dtype=np.int64),
             "golden_cents": gc, "golden_priority": gp}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: golden_bucket(df.drop(columns=["__bucket"])), batch_format="pandas")
    )


SQL_SURVIVORSHIP = """
SELECT o_custkey,
       last_value(CASE WHEN o_orderkey % 5 <> 0
                       THEN CAST(round(o_totalprice * 100) AS BIGINT) END IGNORE NULLS)
         OVER w AS golden_cents,
       last_value(CASE WHEN o_orderstatus <> 'F' THEN o_orderpriority END IGNORE NULLS)
         OVER w AS golden_priority
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction over the co-purchase graph
# ---------------------------------------------------------------------------

_AA_TOPK = 100


def q_adamic_adar(sf_dir: str):
    """Adamic-Adar link prediction (the 1/ln(degree) common-neighbor
    weighting) over the order-part bipartite graph: parts co-appearing
    in an order score 1/ln(order size), summed over shared orders —
    small baskets certify similarity, mega-baskets barely count.  The
    weighted complement of `part_recs` (raw co-counts).

    Shape: ONE coarse orderkey-hash exchange (64 buckets, each holding
    many whole baskets — the part_recs geometry, NOT a per-basket
    map_groups: 150k tiny Python groups measured 39 s at sf0.1, the
    vectorized bucket kernel ~1 s); the per-bucket kernel is a single
    pandas self-merge + per-order-size 1/ln weighting + pair-sum
    partial; pair scores fold in a grouped sum and a per-batch top-k
    prefilter bounds what the driver's final cut sees.  Scores round to
    6 dp on both engines before the (score desc, pa, pb) cut."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        sz = df.groupby("l_orderkey")["l_partkey"].transform("size")
        df = df.assign(__w=1.0 / np.log(np.maximum(sz.to_numpy(), 2)))
        m = df.merge(df[["l_orderkey", "l_partkey"]], on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        out = (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)["__w"]
            .sum()
            .rename(columns={"l_partkey_a": "pa", "l_partkey_b": "pb", "__w": "w"})
        )
        return out

    pairs = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: bucket_pairs(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    scored = grouped_aggregate(pairs, ["pa", "pb"], {"aa": ("sum", "w")})

    def prefilter(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df["aa"] = df["aa"].round(6)
        df = df.sort_values(["aa", "pa", "pb"], ascending=[False, True, True])
        return df.head(_AA_TOPK)

    cands = scored.map_batches(prefilter, batch_format="pyarrow").to_pandas()
    out = cands.sort_values(["aa", "pa", "pb"], ascending=[False, True, True]).head(_AA_TOPK)
    return out.reset_index(drop=True)


SQL_ADAMIC_ADAR = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sz AS (SELECT l_orderkey, count(*) AS n FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, 1.0 / ln(s.n) AS w
  FROM op a
  JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN sz s ON s.l_orderkey = a.l_orderkey
  WHERE s.n >= 2
)
SELECT pa, pb, round(sum(w), 6) AS aa
FROM pairs GROUP BY 1, 2
ORDER BY round(sum(w), 6) DESC, pa, pb LIMIT {_AA_TOPK}
"""


# ---------------------------------------------------------------------------
# HyperBall neighborhood function / effective diameter
# ---------------------------------------------------------------------------


def q_graph_diameter(sf_dir: str):
    """HyperBall neighborhood function (stages/hyperball.py — Boldi &
    Vigna 2013, the web-scale effective-diameter estimator) over the
    same deterministic doc graph as `sssp_weighted` (chain + md5-coin
    long jumps).  One HLL counter per node max-merges its successors'
    counters per sweep; output is (t, n_pairs_est) for t = 0..8 — the
    reachable-pair growth curve whose 90% knee is the effective
    diameter.  Rows-only driver check (sketch estimates have no SQL
    oracle); accuracy vs exact BFS, plan parity (broadcast vs bucketed
    registers) and determinism are pytest-verified
    (tests/test_hyperball.py)."""
    from ..stages.hyperball import hyperball
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows

    def gen_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        k1 = ids[ids + 1 < n_docs]
        coin = md5_lt_mask(batch["doc_id"], "c" + "0" * 31) & (ids + 13 < n_docs)
        k2 = ids[coin]
        return pa.table(
            {
                "src": pa.array(np.concatenate([k1, k2])),
                "dst": pa.array(np.concatenate([k1 + 1, k2 + 13])),
            }
        )

    edges = ds.map_batches(gen_edges, batch_format="pyarrow")
    return hyperball(edges, t_max=8, p=8)


def q_unigram_encode(sf_dir: str):
    """Apply half of the unigram-LM tokenizer pair
    (stages/unigram_lm.UnigramEncodeStage): train on the corpus, then
    encode it in an actor pool — the piece table broadcasts once, the
    per-actor Viterbi memo bounds DP work by distinct words.  Rows-only
    (encoder semantics pytest-verified: memo path ≡ direct Viterbi, and
    piece counts are consistent under re-encoding)."""
    from ..stages.unigram_lm import UnigramEncodeStage, unigram_lm_train

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    vocab = unigram_lm_train(ds, vocab_size=120, rounds=3, max_len=5)
    bc = Broadcast(list(zip(vocab["piece"], vocab["logp"])))
    return ds.map_batches(
        UnigramEncodeStage,
        fn_constructor_args=(bc,),
        fn_constructor_kwargs={"max_len": 5},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Deterministic random-walk corpus (node2vec-style walk generation)
# ---------------------------------------------------------------------------

_WALK_SEED_MOD = 50
_WALK_STEPS = 4


def q_random_walks(sf_dir: str):
    """Random-walk corpus generation (the node2vec/DeepWalk input
    stage): from every 50th doc node, take 4 walk steps over the
    deterministic doc graph, choosing the neighbor at each step by
    md5(walk-step-node) mod degree — a seeded RNG both engines can
    reproduce exactly, so the full walk corpus is value-oracled.

    Shape: adjacency gets (rank, degree) once via a coarse src-hash
    exchange (64 buckets, vectorized rank/degree inside each); each
    step co-partitions the walk frontier with adjacency through
    ``shuffle_join`` and keeps the one edge whose rank matches the
    hash draw — walks never leave the cluster, and a dead-end node
    simply ends its walk (inner join drops it).  Output: (walk_id,
    step, node) for every alive position, steps 0..4."""
    import ray.data as rd

    from .tabular import md5_digest_words, md5_lt_mask, shuffle_join

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows

    def gen_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        k1 = ids[ids + 1 < n_docs]
        coin = md5_lt_mask(batch["doc_id"], "c" + "0" * 31) & (ids + 13 < n_docs)
        k2 = ids[coin]
        return pa.table(
            {
                "src": pa.array(np.concatenate([k1, k2])),
                "dst": pa.array(np.concatenate([k1 + 1, k2 + 13])),
            }
        )

    edges = ds.map_batches(gen_edges, batch_format="pyarrow")

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["src"].to_numpy(zero_copy_only=False) % 64).astype(np.int32)
        return batch.append_column("__b", pa.array(b))

    def rank_deg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["src", "dst"]).reset_index(drop=True)
        df["rn"] = df.groupby("src", sort=False).cumcount()
        df["deg"] = df.groupby("src", sort=False)["dst"].transform("size")
        return df[["src", "dst", "rn", "deg"]]

    adj = (
        edges.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(lambda df: rank_deg(df.drop(columns=["__b"])), batch_format="pandas")
        .materialize()
    )

    def seed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % _WALK_SEED_MOD == 0
        return pa.table({"walk_id": pa.array(ids[keep]), "node": pa.array(ids[keep])})

    frontier = ds.map_batches(seed, batch_format="pyarrow")
    outs = [
        frontier.map_batches(
            lambda t: t.append_column("step", pa.array(np.zeros(len(t), dtype=np.int64))),
            batch_format="pyarrow",
        )
    ]
    for k in range(1, _WALK_STEPS + 1):
        as_src = frontier.map_batches(
            lambda t: pa.table({"src": t["node"], "walk_id": t["walk_id"]}),
            batch_format="pyarrow",
        )
        joined = shuffle_join(as_src, adj, "src", how="inner")

        def pick(df: pd.DataFrame, k: int = k) -> pa.Table:
            if len(df) == 0:
                return pa.table({"walk_id": pa.array([], type=pa.int64()),
                                 "node": pa.array([], type=pa.int64())})
            keys = (
                df["walk_id"].astype(np.int64).astype(str)
                + f"-{k}-"
                + df["src"].astype(np.int64).astype(str)
            )
            hi, _lo = md5_digest_words(pa.array(keys.to_numpy(dtype=object), type=pa.string()))
            draw = ((hi >> np.uint64(32)) % df["deg"].to_numpy(dtype=np.uint64)).astype(np.int64)
            hit = df["rn"].to_numpy(dtype=np.int64) == draw
            return pa.table(
                {
                    "walk_id": pa.array(df["walk_id"].to_numpy(dtype=np.int64)[hit]),
                    "node": pa.array(df["dst"].to_numpy(dtype=np.int64)[hit]),
                }
            )

        frontier = joined.map_batches(pick, batch_format="pandas").materialize()
        outs.append(
            frontier.map_batches(
                lambda t, k=k: t.append_column("step", pa.array(np.full(len(t), k, dtype=np.int64))),
                batch_format="pyarrow",
            )
        )

    allsteps = outs[0]
    for o in outs[1:]:
        allsteps = allsteps.union(o)
    return allsteps.map_batches(
        lambda t: t.select(["walk_id", "step", "node"]), batch_format="pyarrow"
    )


def _random_walks_sql() -> str:
    head = f"""
WITH e0 AS MATERIALIZED (
  SELECT doc_id AS src, doc_id + 1 AS dst
  FROM documents WHERE doc_id + 1 < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, doc_id + 13
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) < 'c'
    AND doc_id + 13 < (SELECT count(*) FROM documents)
),
adj AS MATERIALIZED (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn,
         count(*) OVER (PARTITION BY src) AS deg
  FROM e0
),
w0 AS (
  SELECT doc_id AS walk_id, doc_id AS node
  FROM documents WHERE doc_id % {_WALK_SEED_MOD} = 0
)"""
    steps = []
    for k in range(1, _WALK_STEPS + 1):
        steps.append(
            f""",
w{k} AS MATERIALIZED (
  SELECT w.walk_id, a.dst AS node
  FROM w{k - 1} w JOIN adj a ON a.src = w.node
  WHERE a.rn = CAST(
    ('0x' || substr(md5(CAST(w.walk_id AS VARCHAR) || '-{k}-' || CAST(w.node AS VARCHAR)), 1, 8))::UBIGINT
    % CAST(a.deg AS UBIGINT) AS BIGINT)
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({k} AS BIGINT) AS step, node FROM w{k}"
        for k in range(_WALK_STEPS + 1)
    )
    return head + "".join(steps) + "\n" + union


SQL_RANDOM_WALKS = _random_walks_sql()


# ---------------------------------------------------------------------------
# Word2vec data prep: skip-gram pairs + unigram^0.75 negative sampling
# ---------------------------------------------------------------------------

_SG_WINDOW = 2
_SG_DOC_MOD = 10
_NEG_PER_DOC = 5
_NEG_POWER = 0.75


def q_skipgram_pairs(sf_dir: str):
    """Skip-gram (center, context) pair extraction with a ±2 window
    over every 10th doc — the word2vec/fastText training-pair stage.
    Vectorized: one Arrow split per batch, then each window offset d is
    ONE shifted-array comparison over the flat token stream (same-doc
    masking via the repeated doc-row ids) — no per-token Python.
    Per-batch pair counts fold through the open-domain grouped sum.
    Output: (center, context, n)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % _SG_DOC_MOD == 0
        t = batch.filter(pa.array(keep))
        if t.num_rows == 0:
            return pd.DataFrame({"center": [], "context": [], "n": []})
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        split = pc.split_pattern(col, " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(split), dtype=object)
        docrow = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        cs, xs = [], []
        for d in range(1, _SG_WINDOW + 1):
            same = docrow[:-d] == docrow[d:]
            cs.append(flat[:-d][same])
            xs.append(flat[d:][same])
            cs.append(flat[d:][same])
            xs.append(flat[:-d][same])
        df = pd.DataFrame({"center": np.concatenate(cs), "context": np.concatenate(xs)})
        return df.groupby(["center", "context"], as_index=False).size().rename(columns={"size": "n"})

    per = ds.map_batches(pairs, batch_format="pyarrow")
    out = grouped_aggregate(per, ["center", "context"], {"n": ("sum", "n")})
    return out.map_batches(
        lambda df: df.assign(n=df["n"].astype(np.int64)), batch_format="pandas"
    )


SQL_SKIPGRAM = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents WHERE doc_id % {_SG_DOC_MOD} = 0
)
SELECT a.tok AS center, b.tok AS context, CAST(count(*) AS BIGINT) AS n
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id
 AND b.pos BETWEEN a.pos - {_SG_WINDOW} AND a.pos + {_SG_WINDOW}
 AND b.pos <> a.pos
GROUP BY 1, 2
"""


def q_negative_samples(sf_dir: str):
    """Unigram^0.75 negative sampling (the word2vec noise
    distribution): 5 deterministic draws per selected doc, each mapping
    an md5-uniform into the cumulative token distribution (counts^0.75,
    tokens in lexical order).  Both engines accumulate the cdf
    LEFT-TO-RIGHT in the same order, so the float boundaries are
    bit-identical and the inverse-cdf join reproduces exactly.

    Shape: the vocabulary folds once (bounded partials), the cdf
    broadcasts, and the draw pass streams the doc ids — a searchsorted
    per batch, no shuffle.  Output: (doc_id, slot, neg)."""
    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def vocab_partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.split_pattern(col, " ").values)
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"tok": vc.index, "c": vc.to_numpy()})

    vc = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("tok")["c"]
        .sum()
        .sort_index()
    )
    toks = vc.index.to_numpy(dtype=object)
    w = np.power(vc.to_numpy(dtype=np.float64), _NEG_POWER)
    total = w.sum()
    cum = np.cumsum(w)
    hi = cum / total  # same left-to-right accumulation as the SQL window
    handle = Broadcast((toks, hi))

    def draw(batch: pa.Table) -> pd.DataFrame:
        tk, cdf_hi = handle.get()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ids = ids[ids % _SG_DOC_MOD == 0]
        if ids.size == 0:
            return pd.DataFrame({"doc_id": [], "slot": [], "neg": []})
        doc = np.repeat(ids, _NEG_PER_DOC)
        slot = np.tile(np.arange(_NEG_PER_DOC, dtype=np.int64), ids.size)
        keys = pd.Series(doc).astype(str) + "-" + pd.Series(slot).astype(str)
        hi_w, _lo = md5_digest_words(pa.array(keys.to_numpy(dtype=object), type=pa.string()))
        u = ((hi_w >> np.uint64(32)).astype(np.float64)) / 4294967296.0
        idx = np.searchsorted(cdf_hi, u, side="right")
        idx = np.minimum(idx, len(tk) - 1)
        return pd.DataFrame({"doc_id": doc, "slot": slot, "neg": tk[idx]})

    return ds.map_batches(draw, batch_format="pyarrow")


SQL_NEGATIVE_SAMPLES = f"""
WITH wc AS (
  SELECT tok, pow(count(*), {_NEG_POWER}) AS w
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
cdf AS (
  SELECT tok,
         (sum(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING) - w)
           / (SELECT sum(w) FROM wc) AS lo,
         sum(w) OVER (ORDER BY tok ROWS UNBOUNDED PRECEDING)
           / (SELECT sum(w) FROM wc) AS hi
  FROM wc
),
draws AS (
  SELECT d.doc_id, s.slot,
         (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '-' || CAST(s.slot AS VARCHAR)), 1, 8))::UBIGINT)
           / 4294967296.0 AS u
  FROM documents d, (SELECT unnest(range({_NEG_PER_DOC})) AS slot) s
  WHERE d.doc_id % {_SG_DOC_MOD} = 0
)
SELECT d.doc_id, d.slot, c.tok AS neg
FROM draws d JOIN cdf c ON d.u >= c.lo AND d.u < c.hi
"""


# ---------------------------------------------------------------------------
# Token-level drift + key-skew observability report
# ---------------------------------------------------------------------------

_DRIFT_TOPK = 20


def q_token_drift(sf_dir: str):
    """Token-level heavy-change detection between the first and second
    half of the corpus (by doc_id): the per-token relative-frequency
    delta, top-20 by |Δ| — the vocabulary-drift complement of the
    distribution-level `psi_drift` gate.  One streaming pass emits per-
    batch (token, half) count partials (vocabulary-bounded); the fold,
    normalization and cut happen on the tiny vocab table.  Deltas round
    to 6 dp on both engines before the (|Δ| desc, token) cut."""
    import pyarrow.compute as pc

    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows
    half = n_docs // 2
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        split = pc.split_pattern(col, " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(split), dtype=object)
        is_b = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False) >= half, lens)
        out = []
        for name, sel in (("a", ~is_b), ("b", is_b)):
            vc = pd.Series(flat[sel]).value_counts()
            out.append(pd.DataFrame({"tok": vc.index, "half": name, "c": vc.to_numpy()}))
        return pd.concat(out, ignore_index=True)

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["tok", "half"])["c"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=["a", "b"], fill_value=0)
    )
    ta, tb = float(folded["a"].sum()), float(folded["b"].sum())
    delta = np.round(folded["b"].to_numpy() / tb - folded["a"].to_numpy() / ta, 6)
    out = pd.DataFrame({"tok": folded.index.to_numpy(dtype=object), "delta": delta})
    out["absd"] = out["delta"].abs()
    out = out.sort_values(["absd", "tok"], ascending=[False, True]).head(_DRIFT_TOPK)
    return out[["tok", "delta"]].reset_index(drop=True)


SQL_TOKEN_DRIFT = f"""
WITH toks AS MATERIALIZED (
  SELECT CASE WHEN doc_id >= (SELECT count(*) // 2 FROM documents) THEN 'b' ELSE 'a' END AS half,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
),
counts AS (
  SELECT tok,
         count(*) FILTER (half = 'a') AS ca,
         count(*) FILTER (half = 'b') AS cb
  FROM toks GROUP BY tok
),
tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM counts)
SELECT tok, round(cb / tot.tb - ca / tot.ta, 6) AS delta
FROM counts CROSS JOIN tot
ORDER BY abs(round(cb / tot.tb - ca / tot.ta, 6)) DESC, tok
LIMIT {_DRIFT_TOPK}
"""


_SKEW_TOPK = 10
_SKEW_BUCKETS = 64


def q_skew_report(sf_dir: str):
    """Partition-skew observability for a planned shuffle key: for
    lineitem partitioned on l_orderkey % 64, report each bucket's row
    count plus its share of the total — the pre-flight report that
    decides whether a key needs salting.  Per-batch bucket histograms
    are 64-int partials; everything after the fold is driver-trivial."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        b = (batch["l_orderkey"].to_numpy(zero_copy_only=False) % _SKEW_BUCKETS).astype(np.int64)
        c = np.bincount(b, minlength=_SKEW_BUCKETS).astype(np.int64)
        return pd.DataFrame({"bucket": np.arange(_SKEW_BUCKETS, dtype=np.int64), "n": c})

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", as_index=False)["n"]
        .sum()
        .sort_values("bucket")
    )
    total = float(folded["n"].sum())
    folded["share"] = np.round(folded["n"].to_numpy() / total, 6)
    folded["n"] = folded["n"].astype(np.int64)
    return folded.reset_index(drop=True)


SQL_SKEW_REPORT = f"""
WITH b AS (
  SELECT l_orderkey % {_SKEW_BUCKETS} AS bucket, CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1
)
SELECT bucket, n, round(n / (SELECT sum(n) FROM b), 6) AS share
FROM b ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Dense hourly series family: ACF, CUSUM changepoint, seasonal strength
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 6


def _dense_hourly_counts(sf_dir: str) -> pd.DataFrame:
    """Shared base for the series-analysis ops: the DENSE per-type
    hourly event-count matrix over the global [min_hour, max_hour]
    range, missing hours filled with 0.

    The distributed part is the count reduction — per-batch
    (type, hour) count partials folded through `grouped_aggregate`.
    The dense table the driver then holds is bounded by the TIME RANGE
    times the type cardinality (720×5 here), not by corpus size: at
    100 TB the corpus grows row count per hour, never this table, so
    draining it is a fixed-width reduce, same class as a sketch."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_pandas(), "hour": us // 3_600_000_000}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    counts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    lo, hi = int(counts["hour"].min()), int(counts["hour"].max())
    hours = np.arange(lo, hi + 1, dtype=np.int64)
    types = sorted(counts["event_type"].unique())
    full = pd.MultiIndex.from_product([types, hours], names=["event_type", "hour"])
    dense = (
        counts.set_index(["event_type", "hour"])["c"]
        .reindex(full, fill_value=0)
        .reset_index()
        .rename(columns={"c": "x"})
    )
    dense["x"] = dense["x"].astype(np.float64)
    return dense


_SQL_DENSE_HOURLY = """
bounds AS (
  SELECT epoch_us(min(ts)) // 3600000000 AS lo,
         epoch_us(max(ts)) // 3600000000 AS hi
  FROM events
),
hours AS (SELECT unnest(generate_series(lo, hi)) AS hour FROM bounds),
cnt AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour, count(*) AS c
  FROM events GROUP BY 1, 2
),
dense AS (
  SELECT t.event_type, h.hour, CAST(coalesce(c.c, 0) AS DOUBLE) AS x
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN hours h
  LEFT JOIN cnt c ON c.event_type = t.event_type AND c.hour = h.hour
)
"""


def q_acf_lags(sf_dir: str):
    """Autocorrelation function of each event type's hourly volume at
    lags 1..6 — the stationarity/seasonality probe every forecasting
    pipeline runs before model choice.  Pearson corr between the dense
    series and its lag-shifted self over the (n−lag) overlapping
    hours, computed from the same six-moment formula as `corr_matrix`
    (n·Σxy − ΣxΣy over the root of the variance products) so the 6-dp
    round matches DuckDB's corr(); zero-variance slices mirror
    DuckDB's NULL."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        x = grp.sort_values("hour")["x"].to_numpy()
        for lag in range(1, _ACF_MAX_LAG + 1):
            a, b = x[:-lag], x[lag:]
            n = float(len(a))
            cov = n * (a * b).sum() - a.sum() * b.sum()
            va = n * (a * a).sum() - a.sum() ** 2
            vb = n * (b * b).sum() - b.sum() ** 2
            acf = cov / np.sqrt(va * vb) if va > 0 and vb > 0 else np.nan
            rows.append(
                {"event_type": etype, "lag": lag, "acf": round(float(acf), 6)
                 if not np.isnan(acf) else np.nan, "n": int(n)}
            )
    out = pd.DataFrame(rows)
    out["lag"] = out["lag"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_ACF_LAGS = f"""
WITH {_SQL_DENSE_HOURLY},
lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag)
SELECT d.event_type, CAST(l.lag AS BIGINT) AS lag,
       round(corr(d.x, d2.x), 6) AS acf,
       CAST(count(*) AS BIGINT) AS n
FROM dense d
JOIN lags l ON true
JOIN dense d2 ON d2.event_type = d.event_type AND d2.hour = d.hour + l.lag
GROUP BY 1, 2
"""


def q_cusum_changepoint(sf_dir: str):
    """CUSUM level-shift detection per event type over the hourly
    series: the hour k maximizing |n·CS_k − k·T| (the exact-integer
    form of |cumsum(x−mean)| scaled by n), with the standardized
    statistic max|cumsum(x−mean)| / (sd·√n).  The argmax runs in
    integer arithmetic on BOTH engines (counts are integers; CS_k and
    k·T are exact), so the selected changepoint hour can never flip on
    float noise; only the final statistic is a float, rounded to 6.
    Zero-variance series report stat 0 and a NULL changepoint hour."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        g = grp.sort_values("hour")
        x = g["x"].to_numpy().astype(np.int64)
        hours = g["hour"].to_numpy()
        n = len(x)
        total = int(x.sum())
        cs = np.cumsum(x)
        k = np.arange(1, n + 1, dtype=np.int64)
        c_exact = n * cs - k * total  # exact integers
        sd = float(np.std(x.astype(np.float64), ddof=1)) if n >= 2 else 0.0
        if sd > 0.0:
            idx = int(np.lexsort((hours, -np.abs(c_exact)))[0])
            stat = round(float(np.abs(c_exact[idx])) / (n * sd * np.sqrt(n)), 6)
            cp = int(hours[idx])
        else:
            stat, cp = 0.0, None
        rows.append({"event_type": etype, "cp_hour": cp, "cusum_stat": stat})
    out = pd.DataFrame(rows)
    out["cp_hour"] = out["cp_hour"].astype("Int64").astype(object).where(out["cp_hour"].notna(), None)
    return out


SQL_CUSUM_CHANGEPOINT = f"""
WITH {_SQL_DENSE_HOURLY},
s AS (
  SELECT event_type, count(*) AS n, sum(CAST(x AS BIGINT)) AS total,
         stddev_samp(x) AS sd
  FROM dense GROUP BY 1
),
cs AS (
  SELECT d.event_type, d.hour,
         s.n * sum(CAST(d.x AS BIGINT)) OVER (
             PARTITION BY d.event_type ORDER BY d.hour
         ) - row_number() OVER (
             PARTITION BY d.event_type ORDER BY d.hour
         ) * s.total AS c_exact,
         s.n, s.sd
  FROM dense d JOIN s ON s.event_type = d.event_type
),
ranked AS (
  SELECT event_type, hour, c_exact, n, sd,
         row_number() OVER (
             PARTITION BY event_type ORDER BY abs(c_exact) DESC, hour
         ) AS rk
  FROM cs
)
SELECT event_type,
       CASE WHEN sd > 0 THEN hour END AS cp_hour,
       CASE WHEN sd > 0
            THEN round(abs(c_exact) / (n * sd * sqrt(n)), 6)
            ELSE 0.0 END AS cusum_stat
FROM ranked WHERE rk = 1
"""


def q_seasonal_strength(sf_dir: str):
    """Diurnal seasonal-strength score per event type: fit the
    hour-of-day mean profile to the dense hourly series and report
    strength = max(0, 1 − Var(residual)/Var(series)) — the STL-style
    "how much of the variance is seasonality" readout (Hyndman's
    F_s measure) that decides whether a seasonal model is worth it.
    The profile and both variances are exact moments of the bounded
    dense table; population variance (ddof=0) on both engines via
    explicit sum-of-squares SQL so the 6-dp round matches."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        g = grp.sort_values("hour")
        x = g["x"].to_numpy()
        hod = (g["hour"].to_numpy() % 24).astype(np.int64)
        prof = pd.Series(x).groupby(hod).mean()
        resid = x - prof.reindex(hod).to_numpy()
        var_x = float(np.var(x))  # ddof=0
        var_r = float(np.var(resid))
        strength = max(0.0, 1.0 - var_r / var_x) if var_x > 0 else 0.0
        rows.append(
            {"event_type": etype, "seasonal_strength": round(strength, 6),
             "var_total": round(var_x, 6), "var_resid": round(var_r, 6)}
        )
    return pd.DataFrame(rows)


SQL_SEASONAL_STRENGTH = f"""
WITH {_SQL_DENSE_HOURLY},
prof AS (
  SELECT event_type, hour % 24 AS hod, avg(x) AS m
  FROM dense GROUP BY 1, 2
),
r AS (
  SELECT d.event_type, d.x, d.x - p.m AS resid
  FROM dense d JOIN prof p ON p.event_type = d.event_type AND p.hod = d.hour % 24
),
v AS (
  SELECT event_type,
         avg(x * x) - avg(x) * avg(x) AS var_x,
         avg(resid * resid) - avg(resid) * avg(resid) AS var_r
  FROM r GROUP BY 1
)
SELECT event_type,
       CASE WHEN var_x > 0
            THEN round(greatest(0.0, 1.0 - var_r / var_x), 6)
            ELSE 0.0 END AS seasonal_strength,
       round(var_x, 6) AS var_total,
       round(var_r, 6) AS var_resid
FROM v
"""


# ---------------------------------------------------------------------------
# ML feature-prep family: target encoding, WOE/IV binning, Benford audit
# ---------------------------------------------------------------------------

_TENC_SMOOTH = 20


def q_target_encoding(sf_dir: str):
    """Smoothed mean target encoding of customer nation against order
    value — the category→number transform every tabular-ML pipeline
    applies before boosting, with additive (m=20) smoothing toward the
    global mean so rare nations shrink instead of memorizing.

    Shape: the customer→nation map is a broadcast dimension (ray.put
    once); the orders fact streams through one partial-sum pass with
    exact integer-cent accumulators, so the final
    (Σy + m·ȳ)/(n + m) is evaluated from identical integers on both
    engines.  Output is one row per nation: bounded."""
    cust = read_table_arrow(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    ck = cust["c_custkey"].to_numpy()
    lut = np.full(int(ck.max()) + 1, -1, dtype=np.int64)
    lut[ck] = cust["c_nationkey"].to_numpy()
    bc = Broadcast(lut)  # dense custkey→nationkey array: O(1) vectorized gather

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        m = bc.get()
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        nk = m[batch["o_custkey"].to_numpy(zero_copy_only=False)]
        return (
            pd.DataFrame({"nationkey": nk, "n": 1, "s": cents})
            .groupby("nationkey", as_index=False)
            .agg(n=("n", "sum"), s=("s", "sum"))
        )

    folded = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["nationkey"],
            {"n": ("sum", "n"), "s": ("sum", "s")},
            small_keys=True,
        )
        .to_pandas()
    )
    total_n = float(folded["n"].sum())
    total_s = float(folded["s"].sum())
    gmean = total_s / total_n
    enc = (folded["s"].to_numpy(dtype=np.float64) + _TENC_SMOOTH * gmean) / (
        folded["n"].to_numpy(dtype=np.float64) + _TENC_SMOOTH
    )
    return pd.DataFrame(
        {
            "nationkey": folded["nationkey"].astype(np.int64),
            "n": folded["n"].astype(np.int64),
            "enc": np.round(enc / 100.0, 6),
        }
    )


SQL_TARGET_ENCODING = f"""
WITH o AS (
  SELECT c.c_nationkey AS nationkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
g AS (SELECT CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS gmean FROM o)
SELECT nationkey, CAST(count(*) AS BIGINT) AS n,
       round((CAST(sum(cents) AS DOUBLE) + {_TENC_SMOOTH} * g.gmean)
             / (CAST(count(*) AS DOUBLE) + {_TENC_SMOOTH}) / 100.0, 6) AS enc
FROM o CROSS JOIN g
GROUP BY nationkey, g.gmean
"""


_WOE_BINS = 10


def q_woe_iv(sf_dir: str):
    """Weight-of-evidence / information-value report for order value
    against the 'F' (fulfilled) order status — the credit-scoring
    feature-screening table: 10 equal-width value bins, per-bin event
    ("bad" = status F) and non-event counts, WOE = ln(good%/bad%) and
    the bin's IV contribution.  Bin edges come from the global min/max
    (one fixed-width pass), bin assignment and counts are exact
    integers, so only the final ln/ratio floats round (6 dp).  Bins
    where either class is empty report NULL WOE, matching the SQL
    CASE."""
    ds = read_table(
        sf_dir, "orders", columns=["o_totalprice", "o_orderstatus"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        bad = (np.asarray(batch["o_orderstatus"].to_pandas()) == "F").astype(np.int64)
        return pd.DataFrame(
            {"lo": [int(cents.min())], "hi": [int(cents.max())],
             "nb": [int(bad.sum())], "ng": [int(len(bad) - bad.sum())]}
        )

    # pass 1: global min/max + class totals (fixed-width partials)
    b = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    lo, hi = int(b["lo"].min()), int(b["hi"].max())
    goods, bads = float(b["ng"].sum()), float(b["nb"].sum())
    span = max(hi - lo, 1)

    def binned(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        # exact integer bin: floor((c-lo)*B / span) clamped to B-1
        bins = np.minimum((cents - lo) * _WOE_BINS // span, _WOE_BINS - 1)
        bad = (np.asarray(batch["o_orderstatus"].to_pandas()) == "F").astype(np.int64)
        return (
            pd.DataFrame({"bin": bins, "n_bad": bad, "n_good": 1 - bad})
            .groupby("bin", as_index=False)
            .agg(n_bad=("n_bad", "sum"), n_good=("n_good", "sum"))
        )

    folded = (
        grouped_aggregate(
            ds.map_batches(binned, batch_format="pyarrow"),
            ["bin"],
            {"n_bad": ("sum", "n_bad"), "n_good": ("sum", "n_good")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("bin")
    )
    ng = folded["n_good"].to_numpy(dtype=np.float64)
    nb = folded["n_bad"].to_numpy(dtype=np.float64)
    ok = (ng > 0) & (nb > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        woe = np.where(ok, np.log((ng / goods) / np.where(nb > 0, nb / bads, 1.0)), np.nan)
        iv = np.where(ok, (ng / goods - nb / bads) * woe, np.nan)
    return pd.DataFrame(
        {
            "bin": folded["bin"].astype(np.int64),
            "n_good": folded["n_good"].astype(np.int64),
            "n_bad": folded["n_bad"].astype(np.int64),
            "woe": np.round(woe, 6),
            "iv_part": np.round(iv, 6),
        }
    )


SQL_WOE_IV = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders
),
bounds AS (
  SELECT min(cents) AS lo, greatest(max(cents) - min(cents), 1) AS span,
         CAST(sum(1 - bad) AS DOUBLE) AS goods, CAST(sum(bad) AS DOUBLE) AS bads
  FROM o
),
binned AS (
  SELECT least((cents - lo) * {_WOE_BINS} // span, {_WOE_BINS - 1}) AS bin,
         bad, goods, bads
  FROM o CROSS JOIN bounds
)
SELECT bin,
       CAST(sum(1 - bad) AS BIGINT) AS n_good,
       CAST(sum(bad) AS BIGINT) AS n_bad,
       CASE WHEN sum(1 - bad) > 0 AND sum(bad) > 0
            THEN round(ln((sum(1 - bad) / goods) / (sum(bad) / bads)), 6)
       END AS woe,
       CASE WHEN sum(1 - bad) > 0 AND sum(bad) > 0
            THEN round((sum(1 - bad) / goods - sum(bad) / bads)
                       * ln((sum(1 - bad) / goods) / (sum(bad) / bads)), 6)
       END AS iv_part
FROM binned
GROUP BY bin, goods, bads
"""


def q_benford_digits(sf_dir: str):
    """Benford first-significant-digit audit of order values — the
    classic fraud/synthetic-data screen: observed share per leading
    digit 1..9 vs the Benford expectation log10(1+1/d), with each
    digit's χ² contribution.  The digit is extracted from the exact
    integer-cent DECIMAL STRING on both engines (never via float
    log10, whose misrounding at powers of ten would flip a digit);
    one fixed-width 9-bucket reduction, floats only in the final
    shares (rounded 6)."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        # leading digit of the cents integer == leading significant
        # digit of the price (the *100 shift preserves it); strip
        # trailing decades by exact integer division — never float log10
        digs = cents.copy()
        while (digs >= 10).any():
            np.floor_divide(digs, 10, out=digs, where=digs >= 10)
        cnt = np.bincount(digs, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64), "n": cnt.astype(np.int64)})

    folded = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["digit"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("digit")
    )
    total = float(folded["n"].sum())
    n = folded["n"].to_numpy(dtype=np.float64)
    exp_share = np.log10(1.0 + 1.0 / folded["digit"].to_numpy(dtype=np.float64))
    chi2 = (n - exp_share * total) ** 2 / (exp_share * total)
    return pd.DataFrame(
        {
            "digit": folded["digit"].astype(np.int64),
            "n": folded["n"].astype(np.int64),
            "share": np.round(n / total, 6),
            "benford": np.round(exp_share, 6),
            "chi2_part": np.round(chi2, 6),
        }
    )


SQL_BENFORD_DIGITS = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders
),
g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM g)
SELECT digit, n,
       round(n / total, 6) AS share,
       round(log10(1.0 + 1.0 / digit), 6) AS benford,
       round(pow(n - log10(1.0 + 1.0 / digit) * total, 2)
             / (log10(1.0 + 1.0 / digit) * total), 6) AS chi2_part
FROM g CROSS JOIN t
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Multinomial naive-Bayes language classifier (train on even doc_ids,
# score odd, confusion-matrix readout)
# ---------------------------------------------------------------------------


def q_naive_bayes_lang(sf_dir: str):
    """Multinomial naive-Bayes language classifier, trained and scored
    in two streaming passes: even doc_ids train, odd doc_ids score,
    output is the 5×5 confusion matrix — the classic from-counts text
    classifier (the fastText-style supervised baseline every corpus
    routing stage starts from).

    Pass 1 reduces (lang, token) Laplace-count partials — a
    vocabulary-bounded table — into a broadcast log-likelihood matrix
    plus per-lang priors.  Pass 2 streams the test half: tokens gather
    rows of the broadcast matrix (unseen tokens take the α/(C_l+V)
    smoothing row), per-doc scores accumulate via np.add.at, and the
    argmax runs on 6-dp-ROUNDED scores with ascending-lang tie-break —
    mirrored exactly by the SQL's row_number(ORDER BY round(score,6)
    DESC, lang), so cross-engine float noise below 1e-6 cannot flip a
    prediction.  Only bounded confusion partials leave the workers."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"], split=True)

    def train_partial(batch: pa.Table) -> pd.DataFrame:
        keep = batch.filter(pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 0))
        if keep.num_rows == 0:
            return pd.DataFrame(
                {"lang": pd.Series(dtype=object), "tok": pd.Series(dtype=object),
                 "c": pd.Series(dtype=np.int64), "docs": pd.Series(dtype=np.int64)}
            )
        split = pc.split_pattern(keep["text"].combine_chunks(), " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(pc.list_flatten(split), dtype=object)
        langs = np.repeat(np.asarray(keep["lang"].to_pandas()), lens)
        df = (
            pd.DataFrame({"lang": langs, "tok": flat})
            .groupby(["lang", "tok"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        df["docs"] = 0
        # per-lang train doc counts ride along as special null-token rows
        dc = pd.DataFrame(keep["lang"].to_pandas().value_counts().rename("docs")).reset_index()
        dc.columns = ["lang", "docs"]
        dc["tok"] = None
        dc["c"] = 0
        return pd.concat([df, dc[["lang", "tok", "c", "docs"]]], ignore_index=True)

    counts = (
        grouped_aggregate(
            ds.map_batches(train_partial, batch_format="pyarrow"),
            ["lang", "tok"],
            {"c": ("sum", "c"), "docs": ("sum", "docs")},
            small_keys=True,
        )
        .to_pandas()
    )
    doc_rows = counts[counts["tok"].isna()]
    tok_rows = counts[counts["tok"].notna()]
    langs = sorted(doc_rows["lang"])
    lidx = {l: i for i, l in enumerate(langs)}
    n_train = float(doc_rows["docs"].sum())
    priors = np.log(
        doc_rows.set_index("lang")["docs"].reindex(langs).to_numpy(dtype=np.float64) / n_train
    )
    vocab = sorted(tok_rows["tok"].unique())
    tidx = {t: i for i, t in enumerate(vocab)}
    V = float(len(vocab))
    C = tok_rows.groupby("lang")["c"].sum().reindex(langs, fill_value=0).to_numpy(dtype=np.float64)
    # (V+1) × L log-likelihood matrix; final row = unseen-token smoothing
    M = np.zeros((len(vocab) + 1, len(langs)), dtype=np.float64)
    M[-1, :] = np.log(1.0 / (C + V))
    cmat = np.zeros((len(vocab), len(langs)), dtype=np.float64)
    cmat[tok_rows["tok"].map(tidx).to_numpy(dtype=np.int64),
         tok_rows["lang"].map(lidx).to_numpy(dtype=np.int64)] = tok_rows["c"].to_numpy(dtype=np.float64)
    M[:-1, :] = np.log((cmat + 1.0) / (C + V))
    bc = Broadcast({"tidx": tidx, "M": M, "priors": priors, "langs": langs})

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        b = bc.get()
        keep = batch.filter(pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 1))
        if keep.num_rows == 0:
            return pd.DataFrame(
                {"lang": pd.Series(dtype=object), "pred": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        split = pc.split_pattern(keep["text"].combine_chunks(), " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pd.Series(np.asarray(pc.list_flatten(split), dtype=object))
        rows = flat.map(b["tidx"]).fillna(len(b["tidx"])).to_numpy(dtype=np.int64)
        doc_pos = np.repeat(np.arange(keep.num_rows), lens)
        scores = np.tile(b["priors"], (keep.num_rows, 1))
        np.add.at(scores, doc_pos, b["M"][rows])
        pred_i = np.argmax(np.round(scores, 6), axis=1)  # first max = lowest lang
        preds = np.asarray(b["langs"], dtype=object)[pred_i]
        return (
            pd.DataFrame({"lang": keep["lang"].to_pandas(), "pred": preds, "n": 1})
            .groupby(["lang", "pred"], as_index=False)["n"]
            .sum()
        )

    out = grouped_aggregate(
        ds.map_batches(score_partial, batch_format="pyarrow"),
        ["lang", "pred"],
        {"n": ("sum", "n")},
        small_keys=True,
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"n": np.int64})

    return out.map_batches(typed, batch_format="pandas")


SQL_NAIVE_BAYES_LANG = """
WITH split AS (
  SELECT doc_id, lang, text, doc_id % 2 = 0 AS is_train FROM documents
),
tr AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM split WHERE is_train
),
cnt AS (SELECT lang, tok, count(*) AS c FROM tr GROUP BY 1, 2),
ltot AS (SELECT lang, CAST(sum(c) AS DOUBLE) AS C FROM cnt GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS V FROM tr),
pri AS (
  SELECT lang, ln(CAST(count(*) AS DOUBLE)
                  / (SELECT count(*) FROM split WHERE is_train)) AS lp
  FROM split WHERE is_train GROUP BY 1
),
te AS (
  SELECT doc_id, lang AS true_lang, unnest(string_split(text, ' ')) AS tok
  FROM split WHERE NOT is_train
),
scored AS (
  SELECT te.doc_id, te.true_lang, pri.lang,
         pri.lp + sum(ln((coalesce(cnt.c, 0) + 1.0) / (ltot.C + v.V))) AS score
  FROM te
  CROSS JOIN pri
  JOIN ltot ON ltot.lang = pri.lang
  CROSS JOIN v
  LEFT JOIN cnt ON cnt.lang = pri.lang AND cnt.tok = te.tok
  GROUP BY te.doc_id, te.true_lang, pri.lang, pri.lp
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred,
         row_number() OVER (
             PARTITION BY doc_id ORDER BY round(score, 6) DESC, lang
         ) AS rk
  FROM scored
)
SELECT true_lang AS lang, pred, CAST(count(*) AS BIGINT) AS n
FROM pred WHERE rk = 1
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# IR evaluation family: reciprocal-rank fusion + nDCG@k
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPK = 20
_NDCG_AT = 10


def q_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion of two retrievers over the same fixed
    query — BM25 (k1=1.2, b=0.75) and length-normalized TF-IDF — the
    standard hybrid-search combiner (Cormack et al. 2009):
    RRF(d) = Σ_lists 1/(60 + rank_d), over each list's top-20.

    One broadcast stats pass (n, avgdl, per-term df — fixed width)
    feeds ONE shared scoring pass that computes both scores per batch
    and keeps a per-batch top-k per list, so blocks×k×2 candidate rows
    reach the driver regardless of corpus size.  Ranks derive from
    6-dp-rounded scores with doc_id tie-break on both engines, and the
    fused sum has ≤2 commutative terms, so the fusion is
    order-deterministic end to end."""
    terms = list(_BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        row: dict = {"n": [dl.size], "sum_dl": [int(dl.sum())]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int((tf[i] > 0).sum())]
        return pa.table(row)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    df = np.asarray([stats[f"df{i}"] for i in range(len(terms))], dtype=np.float64)
    idf_bm = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf_tf = np.log(n / df)
    handle = Broadcast((idf_bm, idf_tf, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        bm_vec, ti_vec, avg = handle.get()
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        tff = tf.astype(np.float64)
        dlf = dl.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * dlf / avg)
        s_bm = np.round((bm_vec[:, None] * tff * (k1 + 1.0) / denom).sum(axis=0), 6)
        with np.errstate(divide="ignore", invalid="ignore"):
            s_ti = np.round((ti_vec[:, None] * tff / dlf).sum(axis=0), 6)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out = []
        for lst, s in (("bm25", s_bm), ("tfidf", s_ti)):
            keep = s > 0.0
            i, v = ids[keep], s[keep]
            order = np.lexsort((i, -v))[:_RRF_TOPK]
            out.append(pd.DataFrame({"lst": lst, "doc_id": i[order], "score": v[order]}))
        return pd.concat(out, ignore_index=True)

    cands = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    fused: dict[int, float] = {}
    for lst in ("bm25", "tfidf"):
        sub = cands[cands["lst"] == lst].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(_RRF_TOPK)
        for rank, did in enumerate(sub["doc_id"], start=1):
            fused[did] = fused.get(did, 0.0) + 1.0 / (_RRF_K + rank)
    out = pd.DataFrame(
        {"doc_id": list(fused.keys()), "rrf": np.round(list(fused.values()), 6)}
    ).sort_values(["rrf", "doc_id"], ascending=[False, True]).head(_RRF_TOPK)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.reset_index(drop=True)


SQL_RRF_FUSION = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, (SELECT count(*) FROM documents) AS n FROM dl),
qt AS (SELECT unnest([{_BM25_TERMS_SQL}]) AS term),
df AS (SELECT t.tok AS term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1),
tf AS (SELECT t.doc_id, t.tok AS term, count(*) AS tf
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1, 2),
bm AS (
  SELECT tf.doc_id,
         round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))), 6) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ti AS (
  SELECT tf.doc_id,
         round(sum(ln(s.n / df.df) * tf.tf / dl.dl), 6) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
bm_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM bm WHERE s > 0 ORDER BY s DESC, doc_id LIMIT {_RRF_TOPK}
),
ti_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM ti WHERE s > 0 ORDER BY s DESC, doc_id LIMIT {_RRF_TOPK}
),
fused AS (
  SELECT coalesce(b.doc_id, t.doc_id) AS doc_id,
         coalesce(1.0 / ({_RRF_K} + b.r), 0) + coalesce(1.0 / ({_RRF_K} + t.r), 0) AS rrf
  FROM bm_rank b FULL OUTER JOIN ti_rank t ON b.doc_id = t.doc_id
)
SELECT doc_id, round(rrf, 6) AS rrf
FROM fused ORDER BY round(rrf, 6) DESC, doc_id LIMIT {_RRF_TOPK}
"""


def q_ndcg_eval(sf_dir: str):
    """nDCG@10 of the BM25 ranking against graded term-overlap
    relevance (grade = #distinct query terms a document contains,
    0..4) — the standard offline ranking-quality metric, computed
    without ever materializing per-document rows on the driver beyond
    the bounded candidate set.

    The scoring pass (same broadcast-stats shape as `rrf_fusion`)
    emits per-batch BM25 top-k candidates WITH their grades plus a
    5-bucket grade histogram partial; DCG sums (2^grade − 1)/log2(1+r)
    over the final top-10, IDCG replays the ideal grade sequence
    straight off the folded histogram.  Single output row."""
    terms = list(_BM25_TERMS)
    k1, b = _BM25_K1, _BM25_B
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        row: dict = {"n": [dl.size], "sum_dl": [int(dl.sum())]}
        for i in range(len(terms)):
            row[f"df{i}"] = [int((tf[i] > 0).sum())]
        return pa.table(row)

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    df = np.asarray([stats[f"df{i}"] for i in range(len(terms))], dtype=np.float64)
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    handle = Broadcast((idf, avgdl))

    def score(batch: pa.Table) -> pd.DataFrame:
        idf_vec, avg = handle.get()
        tf, dl = _bm25_term_freqs(batch["text"], terms)
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avg)
        s = np.round((idf_vec[:, None] * tff * (k1 + 1.0) / denom).sum(axis=0), 6)
        grade = (tf > 0).sum(axis=0).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = s > 0.0
        i, v, g = ids[keep], s[keep], grade[keep]
        order = np.lexsort((i, -v))[:_NDCG_AT]
        hist = np.bincount(grade, minlength=len(terms) + 1)
        out = pd.DataFrame(
            {"doc_id": i[order], "score": v[order], "grade": g[order], "hist_grade": -1,
             "hist_n": 0}
        )
        hrows = pd.DataFrame(
            {"doc_id": -1, "score": 0.0, "grade": 0,
             "hist_grade": np.arange(len(hist), dtype=np.int64),
             "hist_n": hist.astype(np.int64)}
        )
        return pd.concat([out, hrows], ignore_index=True)

    rows = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    hist = (
        rows[rows["hist_grade"] >= 0]
        .groupby("hist_grade")["hist_n"].sum()
        .reindex(range(len(terms) + 1), fill_value=0)
    )
    top = (
        rows[rows["hist_grade"] < 0]
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(_NDCG_AT)
    )
    ranks = np.arange(1, len(top) + 1, dtype=np.float64)
    dcg = float((((2.0 ** top["grade"].to_numpy(dtype=np.float64)) - 1.0)
                 / np.log2(1.0 + ranks)).sum())
    # ideal grade sequence straight off the histogram, best grades first
    seq: list[int] = []
    for g in range(len(terms), 0, -1):
        seq.extend([g] * int(hist[g]))
        if len(seq) >= _NDCG_AT:
            break
    seq = seq[:_NDCG_AT]
    pos = np.arange(1, len(seq) + 1, dtype=np.float64)
    idcg = float((((2.0 ** np.asarray(seq, dtype=np.float64)) - 1.0) / np.log2(1.0 + pos)).sum())
    ndcg = dcg / idcg if idcg > 0 else 0.0
    return pd.DataFrame(
        {"k": [_NDCG_AT], "dcg": [round(dcg, 6)], "idcg": [round(idcg, 6)],
         "ndcg": [round(ndcg, 6)]}
    ).astype({"k": np.int64})


SQL_NDCG_EVAL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT avg(dl) AS avgdl, (SELECT count(*) FROM documents) AS n FROM dl),
qt AS (SELECT unnest([{_BM25_TERMS_SQL}]) AS term),
df AS (SELECT t.tok AS term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1),
tf AS (SELECT t.doc_id, t.tok AS term, count(*) AS tf
       FROM toks t JOIN qt ON qt.term = t.tok GROUP BY 1, 2),
grades AS (SELECT doc_id, count(DISTINCT term) AS grade FROM tf GROUP BY 1),
scores AS (
  SELECT tf.doc_id,
         round(sum(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / s.avgdl))), 6) AS s
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM scores WHERE s > 0 ORDER BY s DESC, doc_id LIMIT {_NDCG_AT}
),
dcg AS (
  SELECT sum((pow(2, g.grade) - 1.0) / log2(1.0 + r.r)) AS dcg
  FROM ranked r JOIN grades g USING (doc_id)
),
ideal AS (
  SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id) AS pos
  FROM grades WHERE grade > 0 ORDER BY grade DESC, doc_id LIMIT {_NDCG_AT}
),
idcg AS (
  SELECT sum((pow(2, grade) - 1.0) / log2(1.0 + pos)) AS idcg FROM ideal
)
SELECT CAST({_NDCG_AT} AS BIGINT) AS k,
       round(dcg.dcg, 6) AS dcg,
       round(idcg.idcg, 6) AS idcg,
       round(CASE WHEN idcg.idcg > 0 THEN dcg.dcg / idcg.idcg ELSE 0 END, 6) AS ndcg
FROM dcg CROSS JOIN idcg
"""


# ---------------------------------------------------------------------------
# Sequential testing / calibration / association rules
# ---------------------------------------------------------------------------

_SPRT_THR = 150.0
_SPRT_P0, _SPRT_P1 = 0.04, 0.06
_SPRT_ALPHA = 0.05  # = beta; Wald boundaries ±ln((1-a)/a)


def q_sprt_abtest(sf_dir: str):
    """Wald sequential probability-ratio test over the treatment-arm
    event stream (user_id % 2 = 1): H0 p=0.04 vs H1 p=0.06 conversion
    (value > 150), LLR walked in event_id order until it crosses
    ±ln((1−α)/α) — the always-valid alternative to the fixed-horizon
    `ab_ttest` that lets an experiment stop early.

    Distributed shape: the same order-aligned range-bucket device as
    the prefix scan in `pack_sequences` — per-batch (bucket, n, conv)
    partials fold to driver offsets (buckets × 2 ints), each bucket
    then scans ITS range locally with the global (n, conv) offsets
    added, emits at most one first-crossing row, and the earliest
    bucket's crossing wins.  The LLR is a·ln(p1/p0)+(n−a)·ln(q1/q0)
    from exact integer (n, a) at every step on both engines; only the
    reported statistic rounds (6 dp)."""
    import os

    import pyarrow.parquet as pq_mod

    l1 = np.log(_SPRT_P1 / _SPRT_P0)
    l0 = np.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0))
    upper = np.log((1.0 - _SPRT_ALPHA) / _SPRT_ALPHA)
    lower = -upper

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "value"], split=True)
    meta = pq_mod.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    n_buckets = 64
    span = int(max_id) + 1

    def arm_conv(batch: pa.Table):
        keep = batch.filter(pa.compute.equal(pa.compute.bit_wise_and(batch["user_id"], 1), 1))
        ids = keep["event_id"].to_numpy(zero_copy_only=False)
        conv = (keep["value"].to_numpy(zero_copy_only=False) > _SPRT_THR).astype(np.int64)
        bucket = np.minimum(ids * n_buckets // span, n_buckets - 1)
        return ids, conv, bucket

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids, conv, bucket = arm_conv(batch)
        if len(ids) == 0:
            return pd.DataFrame(
                {"bucket": pd.Series(dtype=np.int64), "n": pd.Series(dtype=np.int64),
                 "a": pd.Series(dtype=np.int64)}
            )
        return (
            pd.DataFrame({"bucket": bucket, "n": 1, "a": conv})
            .groupby("bucket", as_index=False)
            .agg(n=("n", "sum"), a=("a", "sum"))
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("bucket", as_index=False)
        .sum()
        .sort_values("bucket")
    )
    n_off = (parts["n"].cumsum() - parts["n"]).to_numpy()
    a_off = (parts["a"].cumsum() - parts["a"]).to_numpy()
    offsets = dict(zip(parts["bucket"], zip(n_off, a_off)))
    total_n, total_a = int(parts["n"].sum()), int(parts["a"].sum())
    handle = Broadcast(offsets)

    def tag(batch: pa.Table) -> pa.Table:
        ids, conv, bucket = arm_conv(batch)
        return pa.table({"event_id": ids, "conv": conv, "__bucket": bucket})

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        off = handle.get()
        no, ao = off[int(df["__bucket"].iloc[0])]
        df = df.sort_values("event_id")
        k = no + np.arange(1, len(df) + 1, dtype=np.int64)
        a = ao + df["conv"].to_numpy().cumsum()
        llr = a * l1 + (k - a) * l0
        hit = (llr >= upper) | (llr <= lower)
        if not hit.any():
            return pd.DataFrame(
                {"k": pd.Series(dtype=np.int64), "llr": pd.Series(dtype=np.float64),
                 "dec": pd.Series(dtype=object)}
            )
        i = int(np.argmax(hit))
        return pd.DataFrame(
            {"k": [int(k[i])], "llr": [float(llr[i])],
             "dec": ["accept_h1" if llr[i] >= upper else "accept_h0"]}
        )

    hits = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    if len(hits):
        first = hits.sort_values("k").iloc[0]
        dec, k, llr = str(first["dec"]), int(first["k"]), float(first["llr"])
    else:
        dec, k = "continue", total_n
        llr = total_a * l1 + (total_n - total_a) * l0
    return pd.DataFrame({"decision": [dec], "n_events": [k], "llr": [round(llr, 6)]})


SQL_SPRT_ABTEST = f"""
WITH b AS (
  SELECT event_id, CASE WHEN value > {_SPRT_THR} THEN 1 ELSE 0 END AS conv
  FROM events WHERE user_id % 2 = 1
),
o AS (
  SELECT event_id,
         row_number() OVER (ORDER BY event_id) AS k,
         sum(conv) OVER (ORDER BY event_id) AS a
  FROM b
),
l AS (
  SELECT k,
         a * ln({_SPRT_P1} / {_SPRT_P0})
         + (k - a) * ln((1.0 - {_SPRT_P1}) / (1.0 - {_SPRT_P0})) AS llr
  FROM o
),
bound AS (SELECT ln((1.0 - {_SPRT_ALPHA}) / {_SPRT_ALPHA}) AS up),
x AS (
  SELECT l.k, l.llr,
         CASE WHEN l.llr >= bound.up THEN 'accept_h1'
              WHEN l.llr <= -bound.up THEN 'accept_h0' END AS dec
  FROM l CROSS JOIN bound
),
first AS (SELECT k, llr, dec FROM x WHERE dec IS NOT NULL ORDER BY k LIMIT 1),
last AS (SELECT k, llr FROM l ORDER BY k DESC LIMIT 1)
SELECT coalesce(first.dec, 'continue') AS decision,
       CAST(coalesce(first.k, last.k) AS BIGINT) AS n_events,
       round(coalesce(first.llr, last.llr), 6) AS llr
FROM last LEFT JOIN first ON true
"""


_ECE_BINS = 10


def q_ece_calibration(sf_dir: str):
    """Reliability diagram + expected-calibration-error parts for a
    fixed probabilistic classifier — pred = σ((cents − μ)/σ_c) of the
    order total against the 'F'-status label — the standard post-hoc
    calibration audit (Guo et al. 2017) every scored corpus gate needs.

    Pass 1 folds exact integer-cent moments (n, Σc, Σc²) — fixed
    width; pass 2 bins σ(z) into 10 prediction buckets and reduces
    per-bin (n, Σpred, Σlabel) partials.  Output per bin: count, mean
    prediction, empirical positive rate, and the bin's |gap|·n/N ECE
    contribution, all rounded 6."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice", "o_orderstatus"], split=True)

    def moments(batch: pa.Table) -> pd.DataFrame:
        c = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        # Σc² exceeds int64 at scale (DuckDB silently promotes to
        # HUGEINT); fold it as float64 — 1e-16 relative, far below the
        # 6-dp output round — while n and Σc stay exact ints
        ss = (c.astype(np.float64) ** 2).sum()
        return pd.DataFrame({"n": [len(c)], "s": [int(c.sum())], "ss": [float(ss)]})

    m = ds.map_batches(moments, batch_format="pyarrow").to_pandas().sum()
    n_tot = float(m["n"])
    mu = float(m["s"]) / n_tot
    sd = np.sqrt((float(m["ss"]) - float(m["s"]) * mu) / (n_tot - 1.0))
    handle = Broadcast((mu, sd))

    def binned(batch: pa.Table) -> pd.DataFrame:
        mu_, sd_ = handle.get()
        c = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pred = 1.0 / (1.0 + np.exp(-(c - mu_) / sd_))
        y = (np.asarray(batch["o_orderstatus"].to_pandas()) == "F").astype(np.int64)
        b = np.minimum((pred * _ECE_BINS).astype(np.int64), _ECE_BINS - 1)
        return (
            pd.DataFrame({"bin": b, "n": 1, "sp": pred, "sy": y})
            .groupby("bin", as_index=False)
            .agg(n=("n", "sum"), sp=("sp", "sum"), sy=("sy", "sum"))
        )

    folded = (
        grouped_aggregate(
            ds.map_batches(binned, batch_format="pyarrow"),
            ["bin"],
            {"n": ("sum", "n"), "sp": ("sum", "sp"), "sy": ("sum", "sy")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("bin")
    )
    n = folded["n"].to_numpy(dtype=np.float64)
    mean_pred = folded["sp"].to_numpy() / n
    frac_pos = folded["sy"].to_numpy() / n
    return pd.DataFrame(
        {
            "bin": folded["bin"].astype(np.int64),
            "n": folded["n"].astype(np.int64),
            "mean_pred": np.round(mean_pred, 6),
            "frac_pos": np.round(frac_pos, 6),
            "ece_part": np.round(np.abs(mean_pred - frac_pos) * n / n_tot, 6),
        }
    )


SQL_ECE_CALIBRATION = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS s,
         CAST(sum(c * c) AS DOUBLE) AS ss
  FROM o
),
z AS (
  SELECT y,
         1.0 / (1.0 + exp(-(c - s / n) / sqrt((ss - s * (s / n)) / (n - 1.0)))) AS pred,
         n AS n_tot
  FROM o CROSS JOIN m
),
b AS (
  SELECT least(CAST(floor(pred * {_ECE_BINS}) AS BIGINT), {_ECE_BINS - 1}) AS bin,
         pred, y, n_tot
  FROM z
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       round(avg(pred), 6) AS mean_pred,
       round(avg(CAST(y AS DOUBLE)), 6) AS frac_pos,
       round(abs(avg(pred) - avg(CAST(y AS DOUBLE))) * count(*) / n_tot, 6) AS ece_part
FROM b
GROUP BY bin, n_tot
ORDER BY bin
"""


_ASSOC_MIN_ORDERS = 3
_ASSOC_TOPK = 50


def q_assoc_rules(sf_dir: str):
    """Association rules from market baskets: for every directed part
    pair with joint support ≥ 3 orders, confidence = n_AB/n_A and
    lift = n_AB·N/(n_A·n_B), top-50 by (lift, confidence) — the rule
    mining step on top of `copurchase_pairs`' A-Priori candidates.

    ONE order-key co-partition produces everything: in-bucket
    vectorized pair expansion, per-part distinct-order counts, and the
    bucket's distinct-order tally (buckets partition orders, so the
    sums are exact) — marker rows carry the two side tallies through
    the same fold, no second scan.  Ratios evaluate from exact int64
    counts on both engines; floats appear only in the final round."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"], split=True)

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch["l_orderkey"].to_numpy() % 64).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] != m["l_partkey_b"]]
        pairs = (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(columns={"l_partkey_a": "ante", "l_partkey_b": "cons", "size": "n"})
        )
        items = (
            df.groupby("l_partkey", as_index=False)
            .size()
            .rename(columns={"l_partkey": "ante", "size": "n"})
        )
        items["cons"] = -1  # marker: per-part distinct-order count
        total = pd.DataFrame(
            {"ante": [-1], "cons": [-1], "n": [df["l_orderkey"].nunique()]}
        )
        return pd.concat([pairs, items[["ante", "cons", "n"]], total], ignore_index=True)

    folded = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: bucket_counts(df.drop(columns=["__bucket"])), batch_format="pandas")
    )
    counts = grouped_aggregate(folded, ["ante", "cons"], {"n": ("sum", "n")}).to_pandas()
    n_orders = float(counts.loc[(counts["ante"] == -1) & (counts["cons"] == -1), "n"].iloc[0])
    item = counts[(counts["cons"] == -1) & (counts["ante"] >= 0)].set_index("ante")["n"]
    pairs = counts[(counts["ante"] >= 0) & (counts["cons"] >= 0)]
    pairs = pairs[pairs["n"] >= _ASSOC_MIN_ORDERS]
    na = item.reindex(pairs["ante"]).to_numpy(dtype=np.float64)
    nb = item.reindex(pairs["cons"]).to_numpy(dtype=np.float64)
    conf = pairs["n"].to_numpy(dtype=np.float64) / na
    lift = pairs["n"].to_numpy(dtype=np.float64) * n_orders / (na * nb)
    out = pd.DataFrame(
        {
            "ante": pairs["ante"].astype(np.int64).to_numpy(),
            "cons": pairs["cons"].astype(np.int64).to_numpy(),
            "n_pair": pairs["n"].astype(np.int64).to_numpy(),
            "conf": np.round(conf, 6),
            "lift": np.round(lift, 6),
        }
    ).sort_values(["lift", "conf", "ante", "cons"], ascending=[False, False, True, True])
    return out.head(_ASSOC_TOPK).reset_index(drop=True)


SQL_ASSOC_RULES = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM op),
item AS (SELECT l_partkey, count(*) AS n_item FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons, count(*) AS n_pair
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_ASSOC_MIN_ORDERS}
)
SELECT p.ante, p.cons, CAST(p.n_pair AS BIGINT) AS n_pair,
       round(p.n_pair / CAST(ia.n_item AS DOUBLE), 6) AS conf,
       round(p.n_pair * tot.n_orders / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) AS lift
FROM pairs p
JOIN item ia ON ia.l_partkey = p.ante
JOIN item ib ON ib.l_partkey = p.cons
CROSS JOIN tot
ORDER BY round(p.n_pair * tot.n_orders / (CAST(ia.n_item AS DOUBLE) * ib.n_item), 6) DESC,
         round(p.n_pair / CAST(ia.n_item AS DOUBLE), 6) DESC, p.ante, p.cons
LIMIT {_ASSOC_TOPK}
"""


# ---------------------------------------------------------------------------
# Forecast backtest (seasonal-naive MAPE) + two-sample KS test
# ---------------------------------------------------------------------------


def q_seasonal_naive_mape(sf_dir: str):
    """Forecast backtest: seasonal-naive prediction (this hour's count
    = the same hour yesterday) evaluated as MAPE per event type over
    every hour with a 24h-lagged sibling — the baseline any real
    forecasting pipeline must beat before a model earns its keep.

    Rides the same bounded dense-hourly reduction as `acf_lags`; the
    lag join, absolute percentage errors and the mean are driver-
    trivial on the time-range-bounded table.  Zero-actual hours are
    excluded on both engines (MAPE is undefined there); counts are
    exact ints so only the final mean rounds (6 dp)."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        g = grp.sort_values("hour")
        x = g["x"].to_numpy()
        actual, pred = x[24:], x[:-24]
        ok = actual > 0
        ape = np.abs(actual[ok] - pred[ok]) / actual[ok]
        rows.append(
            {"event_type": etype, "n_hours": int(ok.sum()),
             "mape": round(float(ape.mean()), 6) if ok.any() else np.nan}
        )
    out = pd.DataFrame(rows)
    out["n_hours"] = out["n_hours"].astype(np.int64)
    return out


SQL_SEASONAL_NAIVE_MAPE = f"""
WITH {_SQL_DENSE_HOURLY}
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_hours,
       round(avg(abs(a.x - p.x) / a.x), 6) AS mape
FROM dense a
JOIN dense p ON p.event_type = a.event_type AND p.hour = a.hour - 24
WHERE a.x > 0
GROUP BY a.event_type
"""


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between the document-
    length distributions of each source and the 'src0' baseline
    — the distribution-shift gate that catches what a mean/variance
    check misses (psi_drift's nonparametric sibling).  Baseline =
    'src0' (the testdata's first source); every other source is
    tested against it.

    D = max|ECDF_a − ECDF_b| evaluated at observed support points.
    The distributed part reduces (source, n_chars) counts — a support-
    bounded table (distinct lengths × sources), the ECDF sweep is a
    cumsum over it; the max runs on exact rational differences scaled
    to integers (|cum_a·n_b − cum_b·n_a|), so the argmax can't flip on
    float noise; only the final D rounds.  The critical value is the
    α=0.05 two-sample threshold c(α)·√((n_a+n_b)/(n_a·n_b))."""
    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {"source": batch["source"].to_pandas(),
                 "v": batch["n_chars"].to_numpy(zero_copy_only=False)}
            )
            .groupby(["source", "v"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    counts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["source", "v"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    base = counts[counts["source"] == "src0"].set_index("v")["c"].sort_index()
    nb = int(base.sum())
    rows = []
    for src in sorted(counts["source"].unique()):
        if src == "src0":
            continue
        a = counts[counts["source"] == src].set_index("v")["c"].sort_index()
        na = int(a.sum())
        support = base.index.union(a.index)
        ca = a.reindex(support, fill_value=0).cumsum().to_numpy(dtype=np.int64)
        cb = base.reindex(support, fill_value=0).cumsum().to_numpy(dtype=np.int64)
        # exact integer argmax of |ca/na - cb/nb| = |ca*nb - cb*na|
        diff = np.abs(ca * nb - cb * na)
        d = float(diff.max()) / (na * nb)
        crit = 1.358 * np.sqrt((na + nb) / (float(na) * nb))  # alpha=0.05
        rows.append(
            {"source": src, "n_a": na, "ks_d": round(d, 6),
             "crit_05": round(float(crit), 6), "reject": bool(d > crit)}
        )
    out = pd.DataFrame(rows)
    out["n_a"] = out["n_a"].astype(np.int64)
    return out


SQL_KS_TEST = """
WITH cnt AS (
  SELECT source, n_chars AS v, count(*) AS c FROM documents GROUP BY 1, 2
),
base AS (SELECT v, c FROM cnt WHERE source = 'src0'),
nb AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM base),
srcs AS (SELECT DISTINCT source FROM cnt WHERE source <> 'src0'),
support AS (
  SELECT s.source, u.v
  FROM srcs s CROSS JOIN (SELECT DISTINCT v FROM cnt) u
),
ecdf AS (
  SELECT sp.source, sp.v,
         sum(coalesce(a.c, 0)) OVER (PARTITION BY sp.source ORDER BY sp.v) AS ca,
         sum(coalesce(b.c, 0)) OVER (PARTITION BY sp.source ORDER BY sp.v) AS cb
  FROM support sp
  LEFT JOIN cnt a ON a.source = sp.source AND a.v = sp.v
  LEFT JOIN base b ON b.v = sp.v
),
tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS na FROM cnt
  WHERE source <> 'src0' GROUP BY 1
),
d AS (
  SELECT e.source, t.na, nb.nb,
         max(abs(e.ca * nb.nb - e.cb * t.na)) AS num
  FROM ecdf e JOIN tot t ON t.source = e.source CROSS JOIN nb
  GROUP BY 1, 2, 3
)
SELECT source, na AS n_a,
       round(CAST(num AS DOUBLE) / (na * nb), 6) AS ks_d,
       round(1.358 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb)), 6) AS crit_05,
       CAST(num AS DOUBLE) / (na * nb)
         > 1.358 * sqrt((na + nb) / (CAST(na AS DOUBLE) * nb)) AS reject
FROM d
"""


# ---------------------------------------------------------------------------
# Rank statistics: Mann-Whitney U, Spearman correlation, Kaplan-Meier
# ---------------------------------------------------------------------------

_MW_BASE = "view"  # baseline arm for the rank-sum tests


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U (Wilcoxon rank-sum) test of each event type's
    value distribution against the '{base}' baseline — the
    nonparametric sibling of `ab_ttest` for metrics whose distribution
    a t-test mis-models (heavy tails, bounded supports).

    Values are cent-quantized (x100, round) on BOTH engines so ranks
    are over a discrete support; the distributed part reduces
    (event_type, cents) counts — support-bounded, not row-bounded.
    Mid-ranks are computed exactly in doubled-integer space
    (2·midrank = 2·cum_less + tied + 1), so U is an exact half-integer
    on both sides; the tie-corrected normal z uses the identical
    float operation sequence as the SQL mirror.  |z| > 1.96 rejects
    at alpha = 0.05."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "v": cents})
            .groupby(["event_type", "v"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    counts = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "v"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    base = counts[counts["event_type"] == _MW_BASE].set_index("v")["c"].sort_index()
    rows = []
    for et in sorted(counts["event_type"].unique()):
        if et == _MW_BASE:
            continue
        a = counts[counts["event_type"] == et].set_index("v")["c"].sort_index()
        support = base.index.union(a.index)
        ca = a.reindex(support, fill_value=0).to_numpy(dtype=np.int64)
        ct = ca + base.reindex(support, fill_value=0).to_numpy(dtype=np.int64)
        cumlt = np.concatenate(([0], np.cumsum(ct)[:-1]))
        na, n = int(ca.sum()), int(ct.sum())
        nb = n - na
        r2 = int((ca * (2 * cumlt + ct + 1)).sum())  # 2·(rank-sum of arm a)
        ties = int((ct.astype(np.int64) ** 3 - ct).sum())
        u = (r2 - na * (na + 1)) / 2.0
        var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
        z = (u - na * nb / 2.0) / np.sqrt(var) if var > 0 else float("nan")
        rows.append(
            {"event_type": et, "n_a": na, "n_b": nb,
             "u_stat": round(u, 6), "z": round(float(z), 6),
             "reject": bool(abs(z) > 1.96) if var > 0 else False}
        )
    out = pd.DataFrame(rows)
    out[["n_a", "n_b"]] = out[["n_a", "n_b"]].astype(np.int64)
    return out


q_mann_whitney.__doc__ = q_mann_whitney.__doc__.format(base=_MW_BASE)


SQL_MANN_WHITNEY = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v, count(*) AS c
  FROM events GROUP BY 1, 2
),
pairs AS (SELECT DISTINCT event_type AS et FROM c WHERE event_type <> '{_MW_BASE}'),
comb AS (
  SELECT p.et, c.v,
         sum(CASE WHEN c.event_type = p.et THEN c.c ELSE 0 END) AS ca,
         sum(c.c) AS ct
  FROM pairs p JOIN c ON c.event_type IN (p.et, '{_MW_BASE}')
  GROUP BY 1, 2
),
w AS (
  SELECT et, v, ca, ct,
         coalesce(sum(ct) OVER (PARTITION BY et ORDER BY v
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlt
  FROM comb
),
agg AS (
  SELECT et, CAST(sum(ca) AS BIGINT) AS na,
         CAST(sum(ct) - sum(ca) AS BIGINT) AS nb,
         CAST(sum(ct) AS BIGINT) AS n,
         CAST(sum(ca * (2 * cumlt + ct + 1)) AS BIGINT) AS r2,
         CAST(sum(ct * ct * ct - ct) AS BIGINT) AS ties
  FROM w GROUP BY 1
)
SELECT et AS event_type, na AS n_a, nb AS n_b,
       round((r2 - na * (na + 1)) / 2.0, 6) AS u_stat,
       CASE WHEN na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))) > 0
            THEN round(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))), 6)
            ELSE NULL END AS z,
       CASE WHEN na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))) > 0
            THEN abs(((r2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))))) > 1.96
            ELSE FALSE END AS reject
FROM agg
"""


def q_spearman_corr(sf_dir: str):
    """Spearman rank correlation of l_quantity vs l_discount per
    l_returnflag — the monotonic-association readout Pearson misses
    when the relationship is nonlinear.

    Both variables have tiny discrete supports (quantity 1-50,
    discount 0-10 cents), so the distributed part reduces a JOINT
    contingency table per flag (≤ 50×11 cells) — the row data never
    leaves the cluster.  Marginal mid-ranks are exact in
    doubled-integer space (2·midrank); Pearson over the doubled ranks
    equals Pearson over the ranks (scale invariance), so every sum in
    the correlation is an exact int64 and only the final division
    rounds.  SQL mirrors cell-for-cell."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"], split=True
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        q = np.round(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        d = np.round(batch["l_discount"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {"flag": batch["l_returnflag"].to_pandas(), "q": q, "d": d}
            )
            .groupby(["flag", "q", "d"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    cells = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["flag", "q", "d"],
            {"c": ("sum", "c")},
            small_keys=True,
        )
        .to_pandas()
    )
    rows = []
    for flag, grp in cells.groupby("flag", sort=True):
        n = int(grp["c"].sum())

        def midrank2(marg: pd.Series) -> dict:
            marg = marg.sort_index()
            cnt = marg.to_numpy(dtype=np.int64)
            cumlt = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            return dict(zip(marg.index, 2 * cumlt + cnt + 1))

        rx = midrank2(grp.groupby("q")["c"].sum())
        ry = midrank2(grp.groupby("d")["c"].sum())
        c = grp["c"].to_numpy(dtype=np.int64)
        R = grp["q"].map(rx).to_numpy(dtype=np.int64)
        S = grp["d"].map(ry).to_numpy(dtype=np.int64)
        # cell sums stay exact int64 (max ~4e15/cell at sf0.1); the
        # final algebra runs in DOUBLE with the identical op order as
        # SQL — sr*sr as INT64 overflows in DuckDB at sf0.1 (4e10)^2
        sr, ss = float((c * R).sum()), float((c * S).sum())
        srr, sss = float((c * R * R).sum()), float((c * S * S).sum())
        srs = float((c * R * S).sum())
        num = srs - sr * ss / n
        den = np.sqrt((srr - sr * sr / n) * (sss - ss * ss / n))
        rho = num / den if den > 0 else float("nan")
        rows.append({"l_returnflag": flag, "n": n, "rho": round(float(rho), 6)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_SPEARMAN_CORR = """
WITH cell AS (
  SELECT l_returnflag AS flag, CAST(round(l_quantity) AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d, count(*) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
mx AS (
  SELECT flag, q,
         2 * coalesce(sum(sum(c)) OVER (PARTITION BY flag ORDER BY q
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + sum(c) + 1 AS r2
  FROM cell GROUP BY flag, q
),
my AS (
  SELECT flag, d,
         2 * coalesce(sum(sum(c)) OVER (PARTITION BY flag ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + sum(c) + 1 AS s2
  FROM cell GROUP BY flag, d
),
agg AS (
  SELECT cell.flag, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(c * r2) AS BIGINT) AS sr, CAST(sum(c * s2) AS BIGINT) AS ss,
         CAST(sum(c * r2 * r2) AS BIGINT) AS srr,
         CAST(sum(c * s2 * s2) AS BIGINT) AS sss,
         CAST(sum(c * r2 * s2) AS BIGINT) AS srs
  FROM cell
  JOIN mx ON mx.flag = cell.flag AND mx.q = cell.q
  JOIN my ON my.flag = cell.flag AND my.d = cell.d
  GROUP BY 1
)
SELECT flag AS l_returnflag, n,
       CASE WHEN (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
               * (CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * ss / n) > 0
            THEN round((CAST(srs AS DOUBLE) - CAST(sr AS DOUBLE) * ss / n)
                 / sqrt((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n)
                      * (CAST(sss AS DOUBLE) - CAST(ss AS DOUBLE) * ss / n)), 6)
            ELSE NULL END AS rho
FROM agg
"""


_KM_HORIZON_DAYS = 180  # last order within this window of max date => censored


def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier survival curve over customer order-activity
    lifetimes: duration = days between a customer's first and last
    order, censored when the last order falls within {h} days of the
    dataset's max order date (the customer may still be active).

    The distributed parts are a per-customer (min, max) grouped
    aggregate and a (duration, event) count reduce whose output is
    bounded by the day-range of the data — the KM sweep itself runs
    over that tiny table.  n_at_risk counts censored-at-t customers
    as at risk at t (the standard deaths-before-censoring
    convention).  Survival is exp(Σ ln(1-d/n)) on BOTH engines (same
    summation order, ascending t) and exactly 0 when d == n; rows are
    emitted only at event times."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"], split=True)

    def span(batch: pa.Table) -> pd.DataFrame:
        us = batch["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        day = us // 86_400_000_000
        return (
            pd.DataFrame({"k": batch["o_custkey"].to_numpy(zero_copy_only=False), "d": day})
            .groupby("k", as_index=False)
            .agg(first=("d", "min"), last=("d", "max"))
        )

    spans = (
        grouped_aggregate(
            ds.map_batches(span, batch_format="pyarrow"),
            ["k"],
            {"first": ("min", "first"), "last": ("max", "last")},
        )
        .to_pandas()
    )
    max_day = int(spans["last"].max())
    dur = (spans["last"] - spans["first"]).to_numpy(dtype=np.int64)
    event = (spans["last"].to_numpy(dtype=np.int64) < max_day - _KM_HORIZON_DAYS)
    tbl = (
        pd.DataFrame({"t": dur, "e": event.astype(np.int64)})
        .groupby("t", as_index=False)
        .agg(d=("e", "sum"), a=("e", "count"))
        .sort_values("t")
    )
    total = int(tbl["a"].sum())
    at_risk = total - np.concatenate(([0], np.cumsum(tbl["a"].to_numpy())[:-1]))
    d = tbl["d"].to_numpy(dtype=np.int64)
    keep = d > 0
    n_i, d_i, t_i = at_risk[keep], d[keep], tbl["t"].to_numpy()[keep]
    frac = 1.0 - d_i / n_i
    logs = np.where(frac > 0, np.log(np.where(frac > 0, frac, 1.0)), 0.0)
    surv = np.exp(np.cumsum(logs))
    dead = np.cumsum(d_i == n_i) > 0  # once everyone at risk dies, S == 0
    surv = np.where(dead, 0.0, surv)
    out = pd.DataFrame(
        {"t_days": t_i, "n_risk": n_i, "n_events": d_i,
         "survival": np.round(surv, 6)}
    )
    out[["t_days", "n_risk", "n_events"]] = out[["t_days", "n_risk", "n_events"]].astype(np.int64)
    return out


q_kaplan_meier.__doc__ = q_kaplan_meier.__doc__.format(h=_KM_HORIZON_DAYS)


SQL_KAPLAN_MEIER = f"""
WITH span AS (
  SELECT o_custkey,
         CAST(epoch_us(min(o_orderdate)) // 86400000000 AS BIGINT) AS first,
         CAST(epoch_us(max(o_orderdate)) // 86400000000 AS BIGINT) AS last
  FROM orders GROUP BY 1
),
mx AS (SELECT max(last) AS max_day FROM span),
life AS (
  SELECT s.last - s.first AS t,
         CASE WHEN s.last < m.max_day - {_KM_HORIZON_DAYS} THEN 1 ELSE 0 END AS e
  FROM span s CROSS JOIN mx m
),
tbl AS (SELECT t, sum(e) AS d, count(*) AS a FROM life GROUP BY 1),
risk AS (
  SELECT t, d,
         (SELECT sum(a) FROM tbl) -
         coalesce(sum(a) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS n
  FROM tbl
),
ev AS (SELECT t, d, n FROM risk WHERE d > 0),
curve AS (
  SELECT t, n, d,
         exp(sum(CASE WHEN d < n THEN ln(1.0 - d / CAST(n AS DOUBLE)) ELSE 0 END)
             OVER (ORDER BY t)) AS s_raw,
         max(CASE WHEN d = n THEN 1 ELSE 0 END) OVER (ORDER BY t) AS dead
  FROM ev
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       round(CASE WHEN dead = 1 THEN 0.0 ELSE s_raw END, 6) AS survival
FROM curve
"""


# ---------------------------------------------------------------------------
# Phrase search, DP aggregates, cross-correlation
# ---------------------------------------------------------------------------

_PHRASE = ("merge", "slow")  # adjacent-token phrase under test


def q_phrase_search(sf_dir: str):
    """Positional phrase search: documents containing the exact
    adjacent-token phrase {phrase!r}, with per-document occurrence
    counts (overlapping occurrences count, Lucene PhraseQuery
    semantics).

    The scan is fused and embarrassingly parallel — no shuffle: each
    batch splits its texts once (Arrow kernel), then matches the
    phrase on the FLAT token array with numpy shift-compares
    (k-1 vector ANDs for a k-token phrase), masking positions whose
    window crosses a document boundary.  Occurrence counts come from
    one bincount over the flat→doc index.  At 100 TB this is the
    postings-adjacency plan with the index build fused into the read
    — nothing materializes but (doc_id, n_matches) hits."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    phrase = _PHRASE

    def scan(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = la.values
        off = la.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(off)
        k = len(phrase)
        n_flat = len(flat)
        if n_flat < k:
            return pd.DataFrame({"doc_id": [], "n_matches": []})
        m = pc.equal(flat, phrase[0]).to_numpy(zero_copy_only=False)[: n_flat - k + 1]
        for j, tok in enumerate(phrase[1:], start=1):
            mj = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
            m = m & mj[j : n_flat - k + 1 + j]
        docidx = np.repeat(np.arange(len(lens)), lens)
        m = m & (docidx[: n_flat - k + 1] == docidx[k - 1 :])
        counts = np.bincount(docidx[: n_flat - k + 1][m], minlength=len(lens))
        hit = counts > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[hit]
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "n_matches": counts[hit].astype(np.int64)}
        )

    return ds.map_batches(scan, batch_format="pyarrow")


q_phrase_search.__doc__ = q_phrase_search.__doc__.format(phrase=" ".join(_PHRASE))


SQL_PHRASE_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM toks a
JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.tok = '{_PHRASE[1]}'
WHERE a.tok = '{_PHRASE[0]}'
GROUP BY 1
"""


_DP_EPS = 1.0          # privacy budget per released statistic
_DP_CLIP_CENTS = 10_000  # value clipped to [0, 100.00] before the sum


def q_dp_aggregate(sf_dir: str):
    """Differentially-private per-event-type count and sum release:
    exact integer aggregates plus seeded Laplace noise at ε = {eps}
    (sensitivity 1 for the count; values clipped to [0, {clip}]
    cents for the sum, sensitivity = the clip bound).

    The noise is DETERMINISTIC — u ∈ (0,1) from the first 13 hex
    digits of md5(event_type:stat) (52 bits, exactly representable in
    a double), mapped through the Laplace inverse CDF — so the
    release is reproducible across retries/resume (a real pipeline
    would swap the seed source for a DRBG per release epoch; the
    plumbing — clip, exact reduce, per-group noise — is the
    at-scale shape).  SQL mirrors the hash and the inverse CDF
    exactly."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        cents = np.clip(cents, 0, _DP_CLIP_CENTS)
        return (
            pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "c": cents})
            .groupby("event_type", as_index=False)
            .agg(n=("c", "count"), s=("c", "sum"))
        )

    stats = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type"],
            {"n": ("sum", "n"), "s": ("sum", "s")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values("event_type")
    )

    import hashlib

    def lap(key: str, b: float) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:13], 16)
        u = (h + 0.5) / 16**13
        return -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * abs(u - 0.5))

    rows = []
    for _, r in stats.iterrows():
        et = r["event_type"]
        rows.append(
            {
                "event_type": et,
                "dp_count": round(float(r["n"]) + lap(f"{et}:count", 1.0 / _DP_EPS), 6),
                "dp_sum_cents": round(
                    float(r["s"]) + lap(f"{et}:sum", _DP_CLIP_CENTS / _DP_EPS), 6
                ),
            }
        )
    return pd.DataFrame(rows)


q_dp_aggregate.__doc__ = q_dp_aggregate.__doc__.format(eps=_DP_EPS, clip=_DP_CLIP_CENTS)


SQL_DP_AGGREGATE = f"""
WITH agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(least(greatest(CAST(round(value * 100) AS BIGINT), 0),
                        {_DP_CLIP_CENTS})) AS BIGINT) AS s
  FROM events GROUP BY 1
),
noised AS (
  SELECT event_type, n, s,
         (('0x' || substr(md5(event_type || ':count'), 1, 13))::BIGINT + 0.5)
           / power(16, 13) AS uc,
         (('0x' || substr(md5(event_type || ':sum'), 1, 13))::BIGINT + 0.5)
           / power(16, 13) AS us
  FROM agg
)
SELECT event_type,
       round(n + (-(1.0 / {_DP_EPS}) * sign(uc - 0.5)
                  * ln(1.0 - 2.0 * abs(uc - 0.5))), 6) AS dp_count,
       round(s + (-({_DP_CLIP_CENTS} / {_DP_EPS}) * sign(us - 0.5)
                  * ln(1.0 - 2.0 * abs(us - 0.5))), 6) AS dp_sum_cents
FROM noised
"""


_XCORR_A, _XCORR_B = "click", "purchase"
_XCORR_MAX_LAG = 6


def q_xcorr_lags(sf_dir: str):
    """Cross-correlation between the '{a}' and '{b}' hourly volume
    series at lags 0..{maxlag} (does {a} activity lead {b}?) — the
    lead-lag probe behind every conversion-latency dashboard.

    Rides `_dense_hourly_counts`' bounded reduction; at lag k the
    Pearson corr of (a[t], b[t-k]) over the n-k overlapping hours is
    computed from exact integer sums (counts are ints), identical
    operation order to the SQL mirror; only the final corr rounds."""
    dense = _dense_hourly_counts(sf_dir)
    a = dense[dense["event_type"] == _XCORR_A].sort_values("hour")["x"].to_numpy(np.int64)
    b = dense[dense["event_type"] == _XCORR_B].sort_values("hour")["x"].to_numpy(np.int64)
    rows = []
    for k in range(_XCORR_MAX_LAG + 1):
        x = a[k:].astype(np.int64)
        y = b[: len(b) - k if k else len(b)].astype(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        num = sxy - sx * sy / n
        den = np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        rows.append(
            {"lag": k, "n_hours": n,
             "xcorr": round(float(num / den), 6) if den > 0 else float("nan")}
        )
    out = pd.DataFrame(rows)
    out[["lag", "n_hours"]] = out[["lag", "n_hours"]].astype(np.int64)
    return out


q_xcorr_lags.__doc__ = q_xcorr_lags.__doc__.format(
    a=_XCORR_A, b=_XCORR_B, maxlag=_XCORR_MAX_LAG
)


SQL_XCORR_LAGS = f"""
WITH {_SQL_DENSE_HOURLY},
lags AS (SELECT unnest(generate_series(0, {_XCORR_MAX_LAG})) AS lag),
joined AS (
  SELECT l.lag, CAST(a.x AS BIGINT) AS x, CAST(b.x AS BIGINT) AS y
  FROM lags l
  JOIN dense a ON a.event_type = '{_XCORR_A}'
  JOIN dense b ON b.event_type = '{_XCORR_B}' AND b.hour = a.hour - l.lag
),
agg AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM joined GROUP BY 1
)
SELECT lag, n AS n_hours,
       CASE WHEN (sxx - sx * sx / n) * (syy - sy * sy / n) > 0
            THEN round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
            ELSE NULL END AS xcorr
FROM agg
"""


# ---------------------------------------------------------------------------
# Media probe: header-only metadata across four container formats
# ---------------------------------------------------------------------------


def q_media_probe(sf_dir: str):
    """ffprobe-style header probe across a MIXED media corpus: each
    document becomes one of six real container formats by doc_id % 6
    (PNG with CRC-verified IHDR, GIF with logical screen descriptor +
    global color table, 24-bit BMP, PCM WAV, endian-alternating TIFF
    via a real IFD walk, MPEG-1 Layer III via the frame-header
    bitrate/sample-rate tables), and MediaProbeStage
    routes on magic bytes and parses ONLY headers — the decode-nothing
    classify-everything front stage a 100-TB multimodal pipeline runs
    before paying any decompression.  All planted metadata is closed
    form over doc_id, so the SQL oracle catches a single mis-parsed
    header in any of the four format branches."""
    from ..stages.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
        MediaProbeStage,
        make_bmp,
        make_gif,
        make_mp3_frame,
        make_png,
        make_tiff,
        make_wav,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        payloads = []
        for i, t in zip(ids, texts):
            i = int(i)
            kind = i % 6
            if kind == 0:
                payloads.append(make_png(i % 31 + 1, i % 17 + 1, 8, 2))
            elif kind == 1:
                payloads.append(make_gif(i % 63 + 1, i % 29 + 1, 2 ** (i % 8 + 1)))
            elif kind == 2:
                payloads.append(make_bmp(i % 31 + 1, i % 17 + 1, (t or " ").encode()))
            elif kind == 3:
                payloads.append(
                    make_wav(8000 + (i % 5) * 1000, np.zeros(4, dtype=np.int16), i % 2 + 1)
                )
            elif kind == 4:
                payloads.append(make_tiff(i % 41 + 1, i % 23 + 1, big_endian=bool(i % 2)))
            else:
                payloads.append(
                    make_mp3_frame(_MP3_BITRATES[i % 14 + 1], _MP3_RATES[i % 3])
                )
        return pa.Table.from_arrays(
            [
                pa.array([str(int(i)) for i in ids], type=pa.string()),
                pa.array(["media"] * len(ids), type=pa.string()),
                pa.array(payloads, type=pa.large_binary()),
            ],
            names=["media_ref", "media_kind", "payload"],
        )

    media = ds.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(MediaProbeStage, batch_format="pyarrow", concurrency=(1, 4))


SQL_MEDIA_PROBE = """
SELECT CAST(doc_id AS VARCHAR) AS media_ref,
       CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
                       WHEN 3 THEN 'wav' WHEN 4 THEN 'tiff' ELSE 'mp3'
       END AS format,
       CAST(CASE doc_id % 6
              WHEN 0 THEN doc_id % 31 + 1
              WHEN 1 THEN doc_id % 63 + 1
              WHEN 2 THEN doc_id % 31 + 1
              WHEN 3 THEN doc_id % 2 + 1
              WHEN 4 THEN doc_id % 41 + 1
              ELSE ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320])[doc_id % 14 + 2]
            END AS BIGINT) AS width,
       CAST(CASE doc_id % 6
              WHEN 0 THEN doc_id % 17 + 1
              WHEN 1 THEN doc_id % 29 + 1
              WHEN 2 THEN doc_id % 17 + 1
              WHEN 3 THEN 8000 + (doc_id % 5) * 1000
              WHEN 4 THEN doc_id % 23 + 1
              ELSE ([44100,48000,32000])[doc_id % 3 + 1]
            END AS BIGINT) AS height,
       CAST(CASE doc_id % 6
              WHEN 0 THEN 8
              WHEN 1 THEN power(2, doc_id % 8 + 1)
              WHEN 2 THEN 24
              WHEN 3 THEN 16
              WHEN 4 THEN 0
              ELSE 3 END AS BIGINT) AS depth
FROM documents
"""


# ---------------------------------------------------------------------------
# HLL set operations + isotonic (PAV) calibration
# ---------------------------------------------------------------------------

_HLL_SETOP_PAIRS = (("click", "purchase"), ("view", "signup"))


def q_hll_setops(sf_dir: str):
    """HyperLogLog set algebra: estimated |A∪B| (register max-merge)
    and |A∩B| (inclusion-exclusion) of the user sets behind event-type
    pairs, gated against EXACT distributed counts — the mergeable-
    sketch contract that lets a 100-TB pipeline answer audience-overlap
    questions from 16 KiB per segment instead of a set shuffle.

    Exact counts come from a two-level distributed distinct (never a
    driver drain); only fixed-width register rows (one per batch per
    type) and the tiny per-type counts reach the driver.  The oracle
    enumerates the pair grid with within=TRUE for both estimates
    (union at ±5%, the subtractive intersection at ±10% of the union),
    so an out-of-tolerance sketch reds the value hash."""
    from ..stages.sketch import hll_estimate, hll_partial

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"], split=True)

    P = 12

    def reg_partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(),
             "u": batch["user_id"].to_numpy(zero_copy_only=False)}
        )
        rows = []
        for et, grp in df.groupby("event_type"):
            regs = hll_partial(grp["u"].to_numpy(), p=P)
            rows.append({"event_type": et, "regs": regs.tobytes()})
        return pd.DataFrame(rows)

    reg_rows = ds.map_batches(reg_partial, batch_format="pyarrow").to_pandas()
    regs: dict[str, np.ndarray] = {}
    for _, r in reg_rows.iterrows():
        arr = np.frombuffer(r["regs"], dtype=np.uint8)
        et = r["event_type"]
        regs[et] = np.maximum(regs[et], arr) if et in regs else arr.copy()

    # exact per-type and per-pair counts: distinct (type, user) pairs
    def pair_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_type": batch["event_type"], "user_id": batch["user_id"]})
        return pa.TableGroupBy(t, ["event_type", "user_id"]).aggregate([])

    distinct_pairs = grouped_aggregate(
        ds.map_batches(pair_distinct, batch_format="pyarrow"),
        ["event_type", "user_id"],
        {"one": ("count", None)},
    ).to_pandas()

    rows = []
    for a, b in _HLL_SETOP_PAIRS:
        ua = set(distinct_pairs[distinct_pairs["event_type"] == a]["user_id"])
        ub = set(distinct_pairs[distinct_pairs["event_type"] == b]["user_id"])
        n_union, n_inter = len(ua | ub), len(ua & ub)
        est_a, est_b = hll_estimate(regs[a]), hll_estimate(regs[b])
        est_u = hll_estimate(np.maximum(regs[a], regs[b]))
        est_i = est_a + est_b - est_u
        rows.append(
            {"pair": f"{a}|{b}",
             "n_union": n_union, "n_intersect": n_inter,
             "union_within": bool(abs(est_u - n_union) <= 0.05 * n_union),
             "intersect_within": bool(abs(est_i - n_inter) <= 0.10 * n_union)}
        )
    out = pd.DataFrame(rows)
    out[["n_union", "n_intersect"]] = out[["n_union", "n_intersect"]].astype(np.int64)
    return out


SQL_HLL_SETOPS = f"""
WITH pairs AS (
  SELECT * FROM (VALUES {", ".join(f"('{a}', '{b}')" for a, b in _HLL_SETOP_PAIRS)})
    AS t(a, b)
),
du AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT p.a || '|' || p.b AS pair,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_union,
       CAST(count(DISTINCT CASE WHEN EXISTS (
             SELECT 1 FROM du x WHERE x.event_type = p.a AND x.user_id = d.user_id)
           AND EXISTS (
             SELECT 1 FROM du y WHERE y.event_type = p.b AND y.user_id = d.user_id)
           THEN d.user_id END) AS BIGINT) AS n_intersect,
       TRUE AS union_within, TRUE AS intersect_within
FROM pairs p
JOIN du d ON d.event_type IN (p.a, p.b)
GROUP BY 1
"""


def q_isotonic_calibration(sf_dir: str):
    """Isotonic-regression calibration (pool-adjacent-violators) of
    P(purchase | value): the nonparametric monotone fit every
    model-calibration pass runs after `ece_calibration` flags drift.

    The distributed part reduces (cent-quantized score → n, n_pos)
    — a support-bounded table — and PAV pools adjacent violators
    driver-side with exact integer block sums (rates compare as
    cross-multiplied integers, so pooling order can't float-flip).
    Output: the pooled monotone blocks (score range, n, calibrated
    rate).  Rows-only at the driver gate; the PAV properties
    (monotonicity, mass conservation, mean preservation, parity with
    the textbook per-row algorithm) are pytest-verified."""
    buckets = _isotonic_buckets(sf_dir)
    blocks = pav_blocks(
        buckets["s"].to_numpy(np.int64),
        buckets["n"].to_numpy(np.int64),
        buckets["pos"].to_numpy(np.int64),
    )
    out = pd.DataFrame(blocks, columns=["score_lo", "score_hi", "n", "n_pos"])
    out = out.astype(np.int64)
    out["rate"] = np.round(out["n_pos"] / out["n"], 6)
    return out


def _isotonic_buckets(sf_dir: str) -> pd.DataFrame:
    """The distributed half of isotonic calibration: exact (cent score →
    n, n_pos) buckets over events, sorted by score — a support-bounded
    table (shared by `isotonic_calibration` and `isotonic_gate`)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = (batch["event_type"].to_pandas() == "purchase").to_numpy().astype(np.int64)
        return (
            pd.DataFrame({"s": cents, "n": 1, "pos": pos})
            .groupby("s", as_index=False)
            .agg(n=("n", "sum"), pos=("pos", "sum"))
        )

    return (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["s"],
            {"n": ("sum", "n"), "pos": ("sum", "pos")},
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )


def pav_blocks(scores: np.ndarray, n: np.ndarray, pos: np.ndarray):
    """Textbook stack PAV over pre-aggregated (score, n, n_pos) buckets
    sorted by score.  Violator test is exact: pos_a·n_b >= pos_b·n_a
    (cross-multiplied integers — no float rate comparisons)."""
    stack: list[list[int]] = []  # [score_lo, score_hi, n, pos]
    for s, ni, pi in zip(scores, n, pos):
        stack.append([int(s), int(s), int(ni), int(pi)])
        while (
            len(stack) > 1
            and stack[-2][3] * stack[-1][2] >= stack[-1][3] * stack[-2][2]
        ):
            _lo2, hi2, n2, p2 = stack.pop()
            stack[-1][1] = hi2  # merged block extends to the popped right edge
            stack[-1][2] += n2
            stack[-1][3] += p2
    return [tuple(b) for b in stack]


# ---------------------------------------------------------------------------
# Periodogram, Theil-Sen trend, conversion-lag quantiles
# ---------------------------------------------------------------------------

_PERIODS = (24, 12, 8, 168)


def q_periodogram(sf_dir: str):
    """Discrete-Fourier power at candidate periods ({periods} hours)
    per event type — the frequency-domain seasonality probe that tells
    a forecasting pipeline WHICH period to model (acf_lags' spectral
    sibling).

    Power_P = [(Σ a·cos(2πt/P))² + (Σ a·sin(2πt/P))²] / n over the
    mean-centered dense hourly series (a = x − x̄), scaled by n so the
    magnitude stays O(amplitude²) and the 6-dp rounding is safe.
    Rides the bounded `_dense_hourly_counts` reduction; both engines
    evaluate the identical trig expression per (type, period)."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        g = grp.sort_values("hour")
        x = g["x"].to_numpy(np.float64)
        t = np.arange(len(x), dtype=np.float64)
        a = x - x.sum() / len(x)
        for p in _PERIODS:
            sc = float((a * np.cos(2.0 * np.pi * t / p)).sum())
            ss = float((a * np.sin(2.0 * np.pi * t / p)).sum())
            rows.append(
                {"event_type": etype, "period": p,
                 "power": round((sc * sc + ss * ss) / len(x), 6)}
            )
    out = pd.DataFrame(rows)
    out["period"] = out["period"].astype(np.int64)
    return out


q_periodogram.__doc__ = q_periodogram.__doc__.format(periods=_PERIODS)


SQL_PERIODOGRAM = f"""
WITH {_SQL_DENSE_HOURLY},
idx AS (
  SELECT event_type, hour - min(hour) OVER (PARTITION BY event_type) AS t, x
  FROM dense
),
ctr AS (
  SELECT event_type, t,
         x - avg(x) OVER (PARTITION BY event_type) AS a
  FROM idx
),
per AS (SELECT unnest(ARRAY{list(_PERIODS)}) AS period)
SELECT c.event_type, CAST(p.period AS BIGINT) AS period,
       round((pow(sum(c.a * cos(2.0 * pi() * c.t / p.period)), 2)
              + pow(sum(c.a * sin(2.0 * pi() * c.t / p.period)), 2))
             / count(*), 6) AS power
FROM ctr c CROSS JOIN per p
GROUP BY 1, 2
"""


def q_theilsen_trend(sf_dir: str):
    """Theil-Sen robust trend of each event type's hourly volume: the
    MEDIAN of all pairwise slopes (x_j − x_i)/(j − i) — immune to the
    outlier hours that wreck a least-squares slope.

    The distributed part is the bounded dense-hourly reduction; the
    O(n²) pairwise-slope median runs on the driver over the ~720-point
    series (at 100 TB the series length is set by the TIME RANGE, not
    the corpus, so this stays bounded — and the in-repo t-digest is
    the swap if a deployment ever needs multi-year minute-level
    series).  Each slope is a single IEEE division on both engines, so
    the median (mean of the two middles at even counts) is bit-stable
    before the 6-dp rounding."""
    dense = _dense_hourly_counts(sf_dir)
    rows = []
    for etype, grp in dense.groupby("event_type", sort=True):
        x = grp.sort_values("hour")["x"].to_numpy(np.float64)
        n = len(x)
        i, j = np.triu_indices(n, k=1)
        slopes = (x[j] - x[i]) / (j - i)
        rows.append(
            {"event_type": etype, "n_pairs": int(len(slopes)),
             "slope": round(float(np.median(slopes)), 6)}
        )
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out


SQL_THEILSEN_TREND = f"""
WITH {_SQL_DENSE_HOURLY},
idx AS (
  SELECT event_type, hour - min(hour) OVER (PARTITION BY event_type) AS t, x
  FROM dense
)
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       round(median((b.x - a.x) / (b.t - a.t)), 6) AS slope
FROM idx a JOIN idx b ON b.event_type = a.event_type AND b.t > a.t
GROUP BY 1
"""


def q_conversion_lag(sf_dir: str):
    """Click→purchase conversion-lag distribution: for every user with
    both event types, the exact-microsecond lag between their first
    click and first purchase, summarized as linear-interpolated
    quartiles — the time-to-convert readout behind funnel SLAs.

    The distributed part is a per-(user, type) first-timestamp reduce;
    the per-user lag table that reaches the driver is bounded by the
    USER count, not the event count (and `price_quantiles_tdigest` is
    the in-repo swap when even that is too wide).  Both engines use
    the same linear interpolation (numpy 'linear' == DuckDB
    quantile_cont), negative lags (purchase-first users) included."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type", "ts"], split=True)

    def firsts(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {"user_id": batch["user_id"].to_numpy(zero_copy_only=False),
             "event_type": batch["event_type"].to_pandas(),
             "us": batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")}
        )
        df = df[df["event_type"].isin(("click", "purchase"))]
        return df.groupby(["user_id", "event_type"], as_index=False)["us"].min()

    per_user = (
        grouped_aggregate(
            ds.map_batches(firsts, batch_format="pyarrow"),
            ["user_id", "event_type"],
            {"us": ("min", "us")},
        )
        .to_pandas()
        .pivot(index="user_id", columns="event_type", values="us")
        .dropna()
    )
    if "purchase" not in per_user.columns or "click" not in per_user.columns:
        per_user = per_user.iloc[0:0].assign(purchase=[], click=[])
    lag = (per_user["purchase"] - per_user["click"]).to_numpy(np.int64)
    if len(lag) == 0:  # no converting user: quantiles are NULL/NaN on both engines
        qs = [float("nan")] * 3
    else:
        qs = [float(x) for x in np.percentile(lag, [25, 50, 75], method="linear")]
    return pd.DataFrame(
        {"n_users": np.array([len(lag)], dtype=np.int64),
         "p25_us": [round(qs[0], 2)],
         "median_us": [round(qs[1], 2)],
         "p75_us": [round(qs[2], 2)]}
    )


SQL_CONVERSION_LAG = """
WITH f AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
lag AS (SELECT p - c AS l FROM f WHERE c IS NOT NULL AND p IS NOT NULL)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(quantile_cont(l, 0.25), 2) AS p25_us,
       round(quantile_cont(l, 0.50), 2) AS median_us,
       round(quantile_cont(l, 0.75), 2) AS p75_us
FROM lag
"""


# ---------------------------------------------------------------------------
# URL canonical dedupe + mutual information
# ---------------------------------------------------------------------------


def q_url_canonical_dedup(sf_dir: str):
    """URL-level dedup behind crawl-frontier canonicalization
    (functions/urls.py:canonicalize_url): four planted variants per
    logical page — host case + default port, fragment, trailing slash
    + utm params, tracking params in the middle of the query — must
    all collapse to ONE canonical form; the dedupe keeps the minimum
    doc_id per canonical URL and counts the collapsed variants.

    The canonical string is closed form over doc_id//4, so the SQL
    oracle catches a canonicalizer that mishandles ANY of the four
    rule families (group splits → counts and min-ids shift).  The
    dedupe itself is the exact-key shape: one candidate per key per
    batch leaves each worker."""
    from ..functions.urls import canonicalize_url

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def plant_and_canon(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = []
        for i in ids:
            i = int(i)
            g, v = i // 4, i % 4
            if v == 0:
                urls.append(f"http://EXAMPLE{g}.COM:80/path{g}?b=2&a=1")
            elif v == 1:
                urls.append(f"http://example{g}.com/path{g}?a=1&b=2#frag")
            elif v == 2:
                urls.append(f"http://example{g}.com/path{g}/?utm_source=x&a=1&b=2")
            else:
                urls.append(f"http://example{g}.com:80/path{g}?a=1&utm_campaign=y&b=2")
        canon = [canonicalize_url(u) for u in urls]
        # per-batch combiner: one candidate row per canonical key
        return (
            pd.DataFrame({"url": canon, "doc_id": ids})
            .groupby("url", as_index=False)
            .agg(n_variants=("doc_id", "size"), min_doc_id=("doc_id", "min"))
        )

    out = grouped_aggregate(
        ds.map_batches(plant_and_canon, batch_format="pyarrow"),
        ["url"],
        {"n_variants": ("sum", "n_variants"), "min_doc_id": ("min", "min_doc_id")},
    )

    def typed(df: pd.DataFrame) -> pd.DataFrame:
        return df.astype({"n_variants": np.int64, "min_doc_id": np.int64})

    return out.map_batches(typed, batch_format="pandas")


SQL_URL_CANONICAL_DEDUP = """
SELECT 'http://example' || (doc_id // 4) || '.com/path' || (doc_id // 4)
         || '?a=1&b=2' AS url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents
GROUP BY doc_id // 4
"""


def q_mutual_information(sf_dir: str):
    """Mutual information (nats) between event type and hour-of-day,
    with the marginal entropies — the dependence readout that catches
    what `chi2_independence` only thresholds: HOW MUCH of the type
    signal the diurnal cycle explains.

    One streaming pass reduces the bounded 5×24 contingency table
    (exact integer counts); MI = Σ (n_xy/N)·ln(n_xy·N / (n_x·n_y))
    runs on the tiny table with the identical float expression as the
    SQL mirror; only the final values round (6 dp)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_pandas(),
                 "hour": (us // 3_600_000_000) % 24}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    cells = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
    )
    N = float(cells["n"].sum())
    nx = cells.groupby("event_type")["n"].sum()
    ny = cells.groupby("hour")["n"].sum()
    pxy = cells["n"].to_numpy(np.float64) / N
    px = cells["event_type"].map(nx).to_numpy(np.float64) / N
    py = cells["hour"].map(ny).to_numpy(np.float64) / N
    mi = float((pxy * np.log(pxy / (px * py))).sum())
    hx = float(-((nx.to_numpy(np.float64) / N) * np.log(nx.to_numpy(np.float64) / N)).sum())
    hy = float(-((ny.to_numpy(np.float64) / N) * np.log(ny.to_numpy(np.float64) / N)).sum())
    return pd.DataFrame(
        {"n": np.array([int(N)], dtype=np.int64),
         "mi_nats": [round(mi, 6)], "h_type": [round(hx, 6)], "h_hour": [round(hy, 6)]}
    )


SQL_MUTUAL_INFORMATION = """
WITH e AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour FROM events
),
cell AS (SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn FROM cell),
mx AS (SELECT event_type, sum(n) AS nx FROM cell GROUP BY 1),
my AS (SELECT hour, sum(n) AS ny FROM cell GROUP BY 1)
SELECT CAST(t.nn AS BIGINT) AS n,
       round(sum((c.n / t.nn) * ln(c.n * t.nn / (mx.nx * my.ny))), 6) AS mi_nats,
       (SELECT round(-sum((nx / t2.nn) * ln(nx / t2.nn)), 6)
        FROM mx, tot t2) AS h_type,
       (SELECT round(-sum((ny / t3.nn) * ln(ny / t3.nn)), 6)
        FROM my, tot t3) AS h_hour
FROM cell c
JOIN mx ON mx.event_type = c.event_type
JOIN my ON my.hour = c.hour
CROSS JOIN tot t
GROUP BY t.nn
"""


_IPACK_BUDGET = 2048
_IPACK_MEDIA_TOKENS = 64


def q_interleaved_pack(sf_dir: str):
    """Training-sample packing for an INTERLEAVED text+media corpus:
    each document's sequence cost is its text token count plus a fixed
    {mt}-token budget per media span (the vision-token allowance a
    multimodal trainer reserves per image), packed per source into
    {b}-token sequences in doc order via the same distributed two-pass
    prefix scan as `pack_sequences` (stages/scan.py) — bucket sums fold
    on the driver, offsets broadcast back, one coarse-bucket shuffle.

    Media-span counts are planted closed-form (doc_id % 5 — the
    testdata documents carry no media column) so the packing of the
    MIXED cost model is fully value-oracled; on the real interleaved
    corpus the count comes from the extracted spans' kind column."""
    import os

    import pyarrow.parquet as pq

    from ..stages.scan import pack_sequences

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def cost(batch: pa.Table) -> pa.Table:
        ntok = pa.compute.cast(
            pa.compute.list_value_length(pa.compute.split_pattern(batch["text"], " ")),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        total = ntok + _IPACK_MEDIA_TOKENS * (ids % 5)
        return pa.Table.from_arrays(
            [batch["doc_id"], batch["source"], pa.array(total, type=pa.int64())],
            names=["doc_id", "source", "n_tok"],
        )

    counted = ds.map_batches(cost, batch_format="pyarrow")
    meta = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    return pack_sequences(counted, _IPACK_BUDGET, max_order=int(max_id))


q_interleaved_pack.__doc__ = q_interleaved_pack.__doc__.format(
    mt=_IPACK_MEDIA_TOKENS, b=_IPACK_BUDGET
)


SQL_INTERLEAVED_PACK = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) + {_IPACK_MEDIA_TOKENS} * (doc_id % 5) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tok, cum_before,
       cum_before // {_IPACK_BUDGET} AS seq_id,
       cum_before % {_IPACK_BUDGET} AS seq_offset
FROM c
"""


def q_exact_median_2pass(sf_dir: str):
    """EXACT per-group median WITHOUT co-locating any group's values —
    the selection-by-histogram-drill-down plan for groups too large
    for one worker (where `grouped_quantiles`' one-shuffle plan stops
    working and t-digest would give up exactness):

    pass 1 reduces a (flag, bucket, count) histogram (4096 global
    cent-range buckets from the parquet footer's min/max — no data
    read to size them); the driver walks each flag's cumulative counts
    to find the ≤2 buckets holding the middle order statistics; pass 2
    reduces exact value counts ONLY inside those target buckets
    (support-bounded by the bucket width).  Every shuffle is a bounded
    count reduce — raw values never move.  Median = mean of the two
    middle cents (DuckDB median semantics for even counts)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    meta = pq.ParquetFile(path).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    pi = names.index("l_extendedprice")
    lo = min(meta.row_group(g).column(pi).statistics.min for g in range(meta.num_row_groups))
    hi = max(meta.row_group(g).column(pi).statistics.max for g in range(meta.num_row_groups))
    cmin, cmax = int(round(lo * 100)), int(round(hi * 100))
    width = max(1, (cmax - cmin + 4096) // 4096)

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"], split=True)

    def hist(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"flag": batch["l_returnflag"].to_pandas(),
                 "b": (cents - cmin) // width}
            )
            .groupby(["flag", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    h = (
        grouped_aggregate(
            ds.map_batches(hist, batch_format="pyarrow"),
            ["flag", "b"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["flag", "b"])
    )
    targets: dict[str, set[int]] = {}
    ranks: dict[str, tuple[int, int, int]] = {}
    for flag, grp in h.groupby("flag"):
        n = int(grp["n"].sum())
        k1, k2 = (n - 1) // 2, n // 2
        cum = grp["n"].cumsum().to_numpy()
        bs = grp["b"].to_numpy()
        t = {int(bs[np.searchsorted(cum, k + 1)]) for k in (k1, k2)}
        targets[flag] = t
        ranks[flag] = (n, k1, k2)
    # offsets: elements strictly below each flag's target buckets
    below: dict[str, dict[int, int]] = {}
    for flag, grp in h.groupby("flag"):
        cum = dict(zip(grp["b"], grp["n"].cumsum()))
        bs = sorted(targets[flag])
        below[flag] = {
            b: int(sum(v for bb, v in zip(grp["b"], grp["n"]) if bb < b)) for b in bs
        }
    bc = Broadcast(targets)

    def drill(batch: pa.Table) -> pd.DataFrame:
        tmap = bc.get()
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        flags = batch["l_returnflag"].to_pandas().to_numpy()
        b = (cents - cmin) // width
        keep = np.array([bb in tmap.get(f, ()) for f, bb in zip(flags, b)])
        if not keep.any():
            return pd.DataFrame({"flag": [], "c": [], "n": []})
        return (
            pd.DataFrame({"flag": flags[keep], "c": cents[keep], "n": 1})
            .groupby(["flag", "c"], as_index=False)["n"]
            .sum()
        )

    fine = (
        grouped_aggregate(
            ds.map_batches(drill, batch_format="pyarrow"),
            ["flag", "c"],
            {"n": ("sum", "n")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["flag", "c"])
    )
    rows = []
    for flag, grp in fine.groupby("flag"):
        n, k1, k2 = ranks[flag]
        start = min(below[flag].values())  # elements below the lowest target bucket
        cum = start + grp["n"].cumsum().to_numpy()
        vals = grp["c"].to_numpy()
        v1 = int(vals[np.searchsorted(cum, k1 + 1)])
        v2 = int(vals[np.searchsorted(cum, k2 + 1)])
        rows.append(
            {"l_returnflag": flag, "n": n,
             "median_price": round((v1 + v2) / 2.0 / 100.0, 6)}
        )
    out = pd.DataFrame(rows).sort_values("l_returnflag").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


SQL_EXACT_MEDIAN_2PASS = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(median(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 6)
         AS median_price
FROM lineitem GROUP BY 1
"""


def q_containment_pairs(sf_dir: str):
    """Asymmetric near-duplicate detection by SHINGLE CONTAINMENT
    C(A,B) = |A∩B| / |A| over token-trigram sets — the dedup family
    member symmetric Jaccard misses: a document WRAPPED inside a
    larger one (quoted, boilerplate-framed, concatenated) has high
    containment but low Jaccard.  Pairs with C ≥ 0.9 and |A| ≥ 5
    trigrams are reported in both directions.

    Plan: per-doc distinct trigram sets stream out of the scan (a doc
    lives in one row, so per-batch dedup is global); ONE shuffle on
    the shingle key generates co-occurring doc pairs (bounded by
    per-shingle document frequency — a df cap is the guard on
    adversarial hot shingles); the (a, b, common) reduce joins the
    broadcast size map and the ≥0.9 gate is an exact integer test
    (10·common ≥ 9·|A|) applied BEFORE anything reaches the driver."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def shingles(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch["text"], " ")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(la.values.to_pylist(), dtype=object)
        lens = np.diff(la.offsets.to_numpy(zero_copy_only=False))
        if len(flat) < 3:
            return pd.DataFrame({"doc": [], "sh": []})
        docidx = np.repeat(np.arange(len(lens)), lens)
        valid = docidx[:-2] == docidx[2:]
        sh = flat[:-2][valid] + " " + flat[1:-1][valid] + " " + flat[2:][valid]
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        docs = ids[docidx[:-2][valid]]
        return (
            pd.DataFrame({"doc": docs.astype(np.int64), "sh": sh})
            .drop_duplicates()
        )

    doc_sh = ds.map_batches(shingles, batch_format="pyarrow").materialize()

    sizes = (
        grouped_aggregate(
            doc_sh.map_batches(
                lambda df: df.groupby("doc", as_index=False).size().rename(columns={"size": "sz"}),
                batch_format="pandas",
            ),
            ["doc"],
            {"sz": ("sum", "sz")},
        )
        .to_pandas()
    )
    szmap = Broadcast(dict(zip(sizes["doc"].astype(int), sizes["sz"].astype(int))))

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # coarse 64-bucket exchange on the shingle: one map_groups task
        # per bucket instead of one per shingle (the per-tiny-group
        # scheduling tax measured 9x on adamic_adar's identical shape)
        df["bkt"] = (pd.util.hash_array(df["sh"].to_numpy(object)) % 64).astype(np.int32)
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["doc", "sh"]]
        m = d.merge(d, on="sh", suffixes=("_a", "_b"))
        m = m[m["doc_a"] != m["doc_b"]]
        if not len(m):
            return pd.DataFrame(
                {c: pd.Series(dtype=np.int64) for c in ("a", "b", "common")}
            )
        return (
            m.groupby(["doc_a", "doc_b"], as_index=False)
            .size()
            .rename(columns={"doc_a": "a", "doc_b": "b", "size": "common"})
            .astype(np.int64)
        )

    common = grouped_aggregate(
        doc_sh.map_batches(add_bucket, batch_format="pandas")
        .groupby("bkt")
        .map_groups(pairs, batch_format="pandas"),
        ["a", "b"],
        {"common": ("sum", "common")},
    )

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        sz = szmap.get()
        szs = df["a"].map(sz).to_numpy(np.int64)
        keep = (szs >= 5) & (10 * df["common"].to_numpy(np.int64) >= 9 * szs)
        out = df[keep].copy()
        out["containment"] = np.round(
            out["common"].to_numpy(np.float64) / szs[keep], 6
        )
        return out.rename(columns={"a": "doc_a", "b": "doc_b"}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "common": np.int64}
        )

    return common.map_batches(gate, batch_format="pandas")


SQL_CONTAINMENT_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
tri AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, count(*) AS sz FROM tri GROUP BY 1),
com AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
  FROM tri x JOIN tri y ON y.sh = x.sh AND y.doc_id <> x.doc_id
  GROUP BY 1, 2
)
SELECT a AS doc_a, b AS doc_b, CAST(common AS BIGINT) AS common,
       round(CAST(common AS DOUBLE) / sz, 6) AS containment
FROM com JOIN sz ON sz.doc_id = com.a
WHERE sz >= 5 AND 10 * common >= 9 * sz
"""


def q_quantile_normalize(sf_dir: str):
    """Quantile normalization of doc lengths ACROSS sources: each
    document's n_chars is replaced by the pooled distribution's value
    at the same within-source quantile — the cross-source alignment
    step that makes per-source quality thresholds comparable (the
    bioinformatics-standard transform, applied to corpus stats).

    Within-source rank r is deterministic (ORDER BY n_chars, doc_id);
    the normalized value interpolates the POOLED empirical
    distribution at h = (r−1)/(n_s−1)·(N−1).  The pooled distribution
    travels as a support-bounded (value, cumulative count) table —
    never the N-row sorted array — and the per-source ranking
    co-locates one source per group (20 sources here; the
    counts-based rank from `exact_median_2pass`'s histogram family is
    the swap when one source outgrows a worker)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"], split=True)

    def counts(batch: pa.Table) -> pd.DataFrame:
        return (
            pd.DataFrame({"v": batch["n_chars"].to_numpy(zero_copy_only=False)})
            .groupby("v", as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    pool = (
        grouped_aggregate(
            ds.map_batches(counts, batch_format="pyarrow"),
            ["v"],
            {"c": ("sum", "c")},
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    vs = pool["v"].to_numpy(np.int64)
    cum = np.cumsum(pool["c"].to_numpy(np.int64))  # cum[i] = # values <= vs[i]
    N = int(cum[-1])
    bc = Broadcast((vs, cum, N))

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        vs_, cum_, n_pool = bc.get()

        def value_at(idx: np.ndarray) -> np.ndarray:
            # pooled sorted multiset element at 0-based position idx
            pos = np.searchsorted(cum_, idx + 1, side="left")
            return vs_[pos]

        out = []
        for src, grp in df.groupby("source", sort=False):
            g = grp.sort_values(["n_chars", "doc_id"])
            ns = len(g)
            r = np.arange(1, ns + 1, dtype=np.float64)
            h = ((r - 1) / (ns - 1)) * (n_pool - 1) if ns > 1 else np.zeros(ns)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, n_pool - 1)
            frac = h - lo
            v_lo = value_at(lo).astype(np.float64)
            v_hi = value_at(hi).astype(np.float64)
            norm = v_lo + (v_hi - v_lo) * frac
            out.append(
                pd.DataFrame(
                    {"doc_id": g["doc_id"].to_numpy(np.int64),
                     "source": src,
                     "n_chars": g["n_chars"].to_numpy(np.int64),
                     "normalized": np.round(norm, 6)}
                )
            )
        return pd.concat(out, ignore_index=True)

    # one shuffle co-locating each source (sources are few; the rank is
    # per-source sequential by definition)
    return ds.groupby("source").map_groups(normalize, batch_format="pandas")


SQL_QUANTILE_NORMALIZE = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS ns
  FROM documents
),
pool AS (
  SELECT n_chars AS v,
         row_number() OVER (ORDER BY n_chars) - 1 AS idx
  FROM documents
),
n AS (SELECT count(*) AS n_pool FROM documents),
h AS (
  SELECT r.*,
         CASE WHEN r.ns > 1
              THEN (CAST(r.rn - 1 AS DOUBLE) / (r.ns - 1)) * (n.n_pool - 1)
              ELSE 0.0 END AS h,
         n.n_pool
  FROM r CROSS JOIN n
)
SELECT h.doc_id, h.source, h.n_chars,
       round(plo.v + (phi.v - plo.v) * (h.h - floor(h.h)), 6) AS normalized
FROM h
JOIN pool plo ON plo.idx = CAST(floor(h.h) AS BIGINT)
JOIN pool phi ON phi.idx = least(CAST(floor(h.h) AS BIGINT) + 1,
                                 h.n_pool - 1)
"""


def _mutual_nn_blocked(ds):
    """Above-budget mutual-NN: the exact top-1 graph comes from
    ``knn_graph_blocked`` (block-pair expansion, no driver matrix,
    same (sim desc, id asc) tie rule), then mutuality is a
    groupby(min-id) exchange of (lo, hi, fwd) int triples: the pair
    (a, b) is mutual iff its lo-group holds BOTH directions.  Nothing
    wider than 3 ints per vector ever moves after the matmuls."""
    from ..stages.similarity import knn_graph_blocked

    best = knn_graph_blocked(ds, k=1, n_blocks=8)

    def to_key(batch: pa.Table) -> pd.DataFrame:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {"lo": np.minimum(s, d), "hi": np.maximum(s, d), "fwd": s < d}
        )

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("hi")["fwd"].agg(["min", "max"])
        mut = np.sort(agg.index[(~agg["min"]) & (agg["max"])].to_numpy())
        return pd.DataFrame(
            {
                "vec_a": np.full(len(mut), int(g["lo"].iloc[0]), dtype=np.int64),
                "vec_b": mut.astype(np.int64),
            }
        )

    return (
        best.map_batches(to_key, batch_format="pyarrow")
        .groupby("lo")
        .map_groups(mutual, batch_format="pandas")
    )


def q_mutual_nn(sf_dir: str):
    """Reciprocal best matches (mutual nearest neighbors) over the
    embedding table: pairs where each vector is the OTHER's top-1
    cosine neighbor — the high-precision entity-matching rule (a
    one-directional top-1 is noisy; mutuality filters the noise).

    Two-tier router on the parquet footer row count (same shape as
    `knn_graph`): under the broadcast budget, each batch matmuls
    against the broadcast normalized matrix and mutuality folds on the
    driver over the id-bounded best-match table (2 ints/vector).
    Above it, `stages.similarity.knn_graph_blocked` computes the same
    exact top-1 with NO driver matrix, and mutuality becomes a
    groupby(min-id) exchange of (lo, hi, fwd) int triples — a pair is
    mutual iff its group holds both directions (pytest-equal to the
    broadcast path).  Ties break to the smaller vec_id on both engines
    (argmax returns the first maximum over the id-ordered matrix; SQL
    orders cos DESC, vec_id).  Output: each mutual pair once
    (vec_a < vec_b) — ids only, since DuckDB's list_cosine_similarity
    runs in float32 on FLOAT[] columns and the raw similarity would
    differ in the 7th decimal (the same ids-only convention as
    knn_graph / embedding_dup_pairs)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)

    if _emb_rows(sf_dir) > _EMB_BROADCAST_ROWS:
        return _mutual_nn_blocked(ds)

    mat_tbl = (
        read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .sort_by("vec_id")
    )
    ids = mat_tbl["vec_id"].to_numpy()
    M = np.stack(mat_tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = Broadcast((ids, Mn))

    def best(batch: pa.Table) -> pd.DataFrame:
        ids_, Mn_ = bc.get()
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Mn_.T
        rows_pos = np.searchsorted(ids_, vid)
        sims[np.arange(len(vid)), rows_pos] = -np.inf  # mask self
        nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
        return pd.DataFrame(
            {"a": vid.astype(np.int64), "b": ids_[nn].astype(np.int64),
             "cos": sims[np.arange(len(vid)), nn]}
        )

    bests = ds.map_batches(best, batch_format="pyarrow").to_pandas()
    # mutuality on the id-bounded best-match table (2 ints + 1 float/vec)
    bmap = dict(zip(bests["a"], bests["b"]))
    rows = [
        {"vec_a": int(a), "vec_b": int(b)}
        for a, b in bmap.items()
        if a < b and bmap.get(b) == a
    ]
    return pd.DataFrame(rows).sort_values("vec_a").reset_index(drop=True).astype(
        {"vec_a": np.int64, "vec_b": np.int64}
    )


SQL_MUTUAL_NN = """
WITH nn AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_cosine_similarity(a.embedding, b.embedding) AS cos,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                     b.vec_id) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
),
best AS (SELECT a, b FROM nn WHERE rk = 1)
SELECT x.a AS vec_a, x.b AS vec_b
FROM best x JOIN best y ON y.a = x.b AND y.b = x.a
WHERE x.a < x.b
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for every vector,
    the most-similar vector with a DIFFERENT label (tie → smaller
    vec_id) — the standard way to upgrade random in-batch negatives to
    hard ones (the negative the model most confuses with the anchor).

    Two-tier router on the parquet footer row count: under the
    broadcast budget, the same broadcast-matmul shape as `mutual_nn`
    with the self-mask widened to a same-LABEL mask; above it,
    `knn_graph_blocked(k=1, exclude_same_attr=True)` computes the same
    exact different-label top-1 via block-pair expansion with NO
    driver matrix (the label rides the exchange; same-label sims mask
    to -inf BEFORE the partial top-k so a label-skewed block pair
    cannot flood the margin; pytest-equal).  Ids only (float32
    list_cosine_similarity parity, same convention as knn_graph);
    `knn_ivf`/`knn_lsh_shuffle` remain the sublinear approximate swaps
    past exact-O(N²) budgets."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"], split=True)

    if _emb_rows(sf_dir) > _EMB_BROADCAST_ROWS:
        from ..stages.similarity import knn_graph_blocked

        def rename(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "vec_id": g["src"].to_numpy().astype(np.int64),
                    "hard_neg": g["dst"].to_numpy().astype(np.int64),
                }
            )

        return knn_graph_blocked(
            ds, k=1, n_blocks=8, attr_col="label",
            exclude_same_attr=True, group_finalize=rename,
        )

    mat_tbl = (
        read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
        .sort_by("vec_id")
    )
    ids = mat_tbl["vec_id"].to_numpy()
    labels = mat_tbl["label"].to_numpy().astype(np.int64)
    M = np.stack(mat_tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = Broadcast((ids, labels, Mn))

    def best_other_label(batch: pa.Table) -> pd.DataFrame:
        ids_, labels_, Mn_ = bc.get()
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        vlab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Mn_.T
        sims[vlab[:, None] == labels_[None, :]] = -np.inf  # mask same label
        nn = np.argmax(sims, axis=1)  # first max = smallest vec_id on ties
        # degenerate guard: a label that covers the WHOLE corpus leaves
        # its rows all -inf (argmax would emit a bogus index-0 pair);
        # the SQL inner join emits no row for such a vec_id — drop to match
        has_other = np.isfinite(sims[np.arange(len(vid)), nn])
        return pd.DataFrame(
            {"vec_id": vid.astype(np.int64)[has_other],
             "hard_neg": ids_[nn].astype(np.int64)[has_other]}
        )

    return ds.map_batches(best_other_label, batch_format="pyarrow")


SQL_HARD_NEGATIVES = """
SELECT a.vec_id AS vec_id, b.vec_id AS hard_neg
FROM embeddings a JOIN embeddings b ON b.label <> a.label
QUALIFY row_number() OVER (
  PARTITION BY a.vec_id
  ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) = 1
"""


_FH_BUCKETS = 256  # hashing-trick feature dimensionality


class _FeatureHasher:
    """Stateful hashing-trick vectorizer (Weinberger et al., ICML'09):
    token → md5-derived bucket in [0, 256) with a ±1 sign bit, summed
    per (doc, bucket) with multiplicity.  The md5 memo over distinct
    tokens lives per actor (vocabulary-bounded), the per-doc fold is a
    single pandas groupby per batch — and because a document is one
    row, the (doc, bucket) aggregate COMPLETES inside its batch: the
    whole vectorizer is shuffle-free."""

    def __init__(self):
        self.memo: dict[str, int] = {}

    def _h(self, tok: str) -> int:
        v = self.memo.get(tok)
        if v is None:
            import hashlib

            v = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
            self.memo[tok] = v
        return v

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        doc_l, hv_l = [], []
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            doc_l.append(np.full(len(toks), ids[i], dtype=np.int64))
            hv_l.append(np.fromiter((self._h(tk) for tk in toks), dtype=np.int64,
                                    count=len(toks)))
        if not doc_l:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "bucket": pd.Series(dtype=np.int64),
                                 "value": pd.Series(dtype=np.int64)})
        hv = np.concatenate(hv_l)
        return (
            pd.DataFrame(
                {"doc_id": np.concatenate(doc_l),
                 "bucket": hv % _FH_BUCKETS,
                 "value": np.where((hv >> 8) & 1 == 0, 1, -1).astype(np.int64)}
            )
            .groupby(["doc_id", "bucket"], as_index=False)["value"]
            .sum()
        )


def q_feature_hashing(sf_dir: str):
    """Hashing-trick sparse features over documents: (doc_id, bucket,
    value) triplets of the 256-dim signed-count vectorizer — the
    fixed-memory featurizer for open-vocabulary text (no vocabulary
    pass, no dictionary shipping).  Stateful actor-pool stage
    (per-actor md5 memo over distinct tokens), zero shuffle (a doc is
    one row, so its buckets fold inside the batch)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(_FeatureHasher, concurrency=(1, 8), batch_format="pyarrow")


SQL_FEATURE_HASHING = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM toks
)
SELECT doc_id, hv % {_FH_BUCKETS} AS bucket,
       CAST(sum(CASE WHEN (hv // 256) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS value
FROM h GROUP BY 1, 2
"""


_OOV_VOCAB = 500  # top-V corpus tokens form the in-vocabulary set


def q_oov_rate(sf_dir: str):
    """Vocabulary-coverage report: per document, the fraction of token
    OCCURRENCES outside the corpus's top-500 vocabulary — the tokenizer
    /domain-shift health check run before committing a corpus to an
    expensive tokenizer training.

    Two streaming passes: open-domain token-count fold → top-V cut
    (count DESC, token ASC — deterministic) with per-batch prefilter;
    then the vocab broadcasts as ONE Arrow value-set and the per-doc
    OOV fraction is a vectorized `pc.is_in` + segment sum (no shuffle).
    One float division at the end, mirrored in SQL."""
    import pyarrow.compute as pc

    from .tabular import topk

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.split_pattern_regex(col, r"\s+").values)
        flat = flat[flat != ""]
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index, "cnt": vc.to_numpy()})

    counts = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["token"], {"cnt": ("sum", "cnt")}
    )
    top = topk(counts, ["cnt", "token"], _OOV_VOCAB, descending=[True, False]).to_pandas()
    vocab = Broadcast(pa.array(top["token"].to_numpy(dtype=object), type=pa.string()))

    def oov(batch: pa.Table) -> pd.DataFrame:
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = lists.values
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        inv = pc.is_in(flat, value_set=vocab.get()).to_numpy(zero_copy_only=False)
        offs = lists.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        seg = np.repeat(np.arange(len(lens)), lens)
        n_tok = np.bincount(seg, weights=nonempty, minlength=len(lens)).astype(np.int64)
        n_in = np.bincount(seg, weights=inv & nonempty, minlength=len(lens)).astype(np.int64)
        keep = n_tok > 0
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False)[keep],
             "n_tokens": n_tok[keep],
             "oov_rate": (n_tok[keep] - n_in[keep]) / n_tok[keep]}
        )

    return ds.map_batches(oov, batch_format="pyarrow")


SQL_OOV_RATE = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
), v AS (
  SELECT tok FROM (SELECT tok, count(*) AS c FROM toks GROUP BY 1)
  QUALIFY row_number() OVER (ORDER BY c DESC, tok) <= {_OOV_VOCAB}
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) - count(v.tok) AS BIGINT) / CAST(count(*) AS BIGINT) AS oov_rate
FROM toks t LEFT JOIN v ON v.tok = t.tok
GROUP BY t.doc_id
"""


_LB_BAND = 64  # tokens per length band
_LB_BATCH = 32  # documents per trainer batch


def q_length_batching(sf_dir: str):
    """Length-bucketed trainer batch assignment: band documents by
    token count (band = n_tokens // 64), order each band by
    (n_tokens, doc_id) and chunk into fixed 32-doc batches — the
    padding-minimizing batching every seq2seq/encoder trainer runs
    (batchmates have near-equal lengths, so pad waste is bounded by
    the band width).

    Shape: streaming token counts (one Arrow regex kernel), ONE
    band exchange — bands are LENGTH-bounded (~n_max/64 of them),
    not row-bounded — and the in-band rank is a single vectorized
    sort.  At corpus scale the in-band rank swaps to the TeraSort
    `global_rank` offsets (64 ints per band), documented there."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(batch["text"], r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
             "n_tokens": n, "band": n // _LB_BAND}
        )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n_tokens", "doc_id"]).reset_index(drop=True)
        rk = np.arange(len(df), dtype=np.int64)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy().astype(np.int64),
             "band": df["band"].to_numpy().astype(np.int64),
             "batch_id": df["band"].to_numpy().astype(np.int64) * 1_000_000
                         + rk // _LB_BATCH}
        )

    return (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("band")
        .map_groups(assign, batch_format="pandas")
    )


SQL_LENGTH_BATCHING = f"""
WITH t AS (
  SELECT doc_id,
         CAST(coalesce(array_length(regexp_extract_all(text, '\\S+')), 0) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens // {_LB_BAND} AS band,
       (n_tokens // {_LB_BAND}) * 1000000
       + (row_number() OVER (PARTITION BY n_tokens // {_LB_BAND}
                             ORDER BY n_tokens, doc_id) - 1) // {_LB_BATCH} AS batch_id
FROM t
"""


def q_decision_stump(sf_dir: str):
    """Optimal decision stump: the single value-threshold split that
    maximizes information gain for predicting 'purchase' — the
    first-split probe every tree ensemble and every feature-triage
    pass computes.

    One streaming pass reduces the support-bounded (cent, n, n_pos)
    table; cumulative sums give every candidate split's left/right
    class counts at once, gains evaluate vectorized with the entropy
    convention 0·ln0 = 0, and the argmax breaks ties to the SMALLEST
    threshold after 9-dp gain rounding (identically in SQL, so a
    1-ulp gain difference cannot flip the chosen split)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        cents = np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        pos = (batch["event_type"].to_pandas() == "purchase").to_numpy().astype(np.int64)
        return (
            pd.DataFrame({"s": cents, "n": 1, "pos": pos})
            .groupby("s", as_index=False)
            .agg(n=("n", "sum"), pos=("pos", "sum"))
        )

    t = (
        grouped_aggregate(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["s"],
            {"n": ("sum", "n"), "pos": ("sum", "pos")},
        )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    n = t["n"].to_numpy(np.float64)
    pos = t["pos"].to_numpy(np.float64)
    N, P = float(n.sum()), float(pos.sum())

    def ent(p_arr: np.ndarray, n_arr: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(n_arr > 0, p_arr / np.where(n_arr > 0, n_arr, 1.0), 0.0)
            h = -(
                np.where(q > 0, q * np.log(q), 0.0)
                + np.where(q < 1, (1 - q) * np.log(np.where(q < 1, 1 - q, 1.0)), 0.0)
            )
        return np.where(n_arr > 0, h, 0.0)

    nl = np.cumsum(n)[:-1]  # split AFTER each candidate (x <= s)
    pl = np.cumsum(pos)[:-1]
    nr, pr = N - nl, P - pl
    h_parent = ent(np.array([P]), np.array([N]))[0]
    gain = h_parent - (nl / N) * ent(pl, nl) - (nr / N) * ent(pr, nr)
    gain_r = np.round(gain, 9)
    k = int(np.lexsort((t["s"].to_numpy()[:-1], -gain_r))[0])
    return pd.DataFrame(
        {"threshold_cents": np.array([int(t["s"][k])], dtype=np.int64),
         "gain": [round(float(gain_r[k]), 6)],
         "n_left": np.array([int(nl[k])], dtype=np.int64),
         "n_right": np.array([int(nr[k])], dtype=np.int64)}
    )


SQL_DECISION_STUMP = """
WITH b AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS s, count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(pos) AS DOUBLE) AS pp FROM b),
c AS (
  SELECT s,
         CAST(sum(n) OVER (ORDER BY s) AS DOUBLE) AS nl,
         CAST(sum(pos) OVER (ORDER BY s) AS DOUBLE) AS pl
  FROM b
),
g AS (
  SELECT c.s, c.nl, t.nn - c.nl AS nr, c.pl, t.pp - c.pl AS pr, t.nn, t.pp
  FROM c CROSS JOIN tot t
  WHERE c.nl < t.nn
),
gain AS (
  SELECT s, CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
         round(
           (CASE WHEN pp > 0 AND pp < nn
                 THEN -(pp / nn) * ln(pp / nn) - (1 - pp / nn) * ln(1 - pp / nn)
                 ELSE 0 END)
           - (nl / nn) * (CASE WHEN pl > 0 AND pl < nl
                 THEN -(pl / nl) * ln(pl / nl) - (1 - pl / nl) * ln(1 - pl / nl)
                 ELSE 0 END)
           - (nr / nn) * (CASE WHEN pr > 0 AND pr < nr
                 THEN -(pr / nr) * ln(pr / nr) - (1 - pr / nr) * ln(1 - pr / nr)
                 ELSE 0 END), 9) AS g9
  FROM g
)
SELECT s AS threshold_cents, round(g9, 6) AS gain, n_left, n_right
FROM gain ORDER BY g9 DESC, s LIMIT 1
"""


def q_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value curve: cumulative revenue per signup
    cohort (first-order month) by months-since-first-order — the
    revenue sibling of `cohort_retention`'s count matrix, the curve
    every LTV model calibrates against.

    Two bounded reduces: per-customer first-order month (customer-
    bounded), then exact integer-cent revenue per (cohort, age) cell
    (months² cells); the cumulative sum runs over that tiny matrix.
    Month arithmetic is calendar-exact on both engines (year·12 +
    month)."""
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        ts = pd.to_datetime(
            pd.Series(batch["o_orderdate"].to_numpy(zero_copy_only=False))
        )
        mon = (ts.dt.year * 12 + (ts.dt.month - 1)).to_numpy(np.int64)
        return pd.DataFrame(
            {"k": batch["o_custkey"].to_numpy(zero_copy_only=False),
             "mon": mon,
             "cents": np.round(
                 batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
             ).astype(np.int64)}
        )

    rows = ds.map_batches(prep, batch_format="pyarrow")
    firsts = grouped_aggregate(
        rows.map_batches(
            lambda df: df.groupby("k", as_index=False)["mon"].min().rename(columns={"mon": "c0"}),
            batch_format="pandas",
        ),
        ["k"],
        {"c0": ("min", "c0")},
    ).to_pandas()
    cmap = Broadcast(dict(zip(firsts["k"].astype(int), firsts["c0"].astype(int))))

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        c0 = df["k"].map(cmap.get()).to_numpy(np.int64)
        return (
            pd.DataFrame(
                {"cohort": c0, "age": df["mon"].to_numpy(np.int64) - c0,
                 "cents": df["cents"].to_numpy(np.int64)}
            )
            .groupby(["cohort", "age"], as_index=False)["cents"]
            .sum()
        )

    cells = (
        grouped_aggregate(
            rows.map_batches(cell, batch_format="pandas"),
            ["cohort", "age"],
            {"cents": ("sum", "cents")},
            small_keys=True,
        )
        .to_pandas()
        .sort_values(["cohort", "age"])
    )
    cells["cum_cents"] = cells.groupby("cohort")["cents"].cumsum()
    out = pd.DataFrame(
        {"cohort": cells["cohort"], "age_months": cells["age"],
         "revenue": np.round(cells["cents"].to_numpy(np.float64) / 100.0, 2),
         "cum_revenue": np.round(cells["cum_cents"].to_numpy(np.float64) / 100.0, 2)}
    ).reset_index(drop=True)
    out[["cohort", "age_months"]] = out[["cohort", "age_months"]].astype(np.int64)
    return out


SQL_COHORT_LTV = """
WITH o AS (
  SELECT o_custkey AS k,
         year(o_orderdate) * 12 + (month(o_orderdate) - 1) AS mon,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT k, min(mon) AS c0 FROM o GROUP BY 1),
cell AS (
  SELECT f.c0 AS cohort, o.mon - f.c0 AS age, sum(o.cents) AS cents
  FROM o JOIN f ON f.k = o.k
  GROUP BY 1, 2
)
SELECT CAST(cohort AS BIGINT) AS cohort, CAST(age AS BIGINT) AS age_months,
       round(cents / 100.0, 2) AS revenue,
       round(sum(cents) OVER (PARTITION BY cohort ORDER BY age
                              ROWS UNBOUNDED PRECEDING) / 100.0, 2) AS cum_revenue
FROM cell
"""


def q_new_returning_users(sf_dir: str):
    """Weekly new-vs-returning active users over the event stream: per
    ISO-ish week (epoch-day // 7), how many active users are seen for
    the FIRST time vs returning — the growth-accounting readout.

    Per-user first-activity week and per-(user, week) activity both
    reduce distributed (user- and user×week-bounded); the weekly
    split is a tiny driver fold.  Exact integer week arithmetic on
    both engines."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"u": batch["user_id"].to_numpy(zero_copy_only=False),
                 "w": us // (7 * 86_400_000_000)}
            )
            .drop_duplicates()
        )

    uw = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["u", "w"],
        {"one": ("count", None)},
    ).to_pandas()
    first = uw.groupby("u")["w"].min()
    uw["is_new"] = (uw["u"].map(first) == uw["w"]).astype(np.int64)
    out = (
        uw.groupby("w", as_index=False)
        .agg(n_new=("is_new", "sum"), n_active=("is_new", "size"))
        .sort_values("w")
        .reset_index(drop=True)
    )
    out["n_returning"] = out["n_active"] - out["n_new"]
    out = out.rename(columns={"w": "week"})
    return out[["week", "n_active", "n_new", "n_returning"]].astype(np.int64)


SQL_NEW_RETURNING = """
WITH uw AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // (7 * 86400000000) AS w
  FROM events
),
f AS (SELECT u, min(w) AS w0 FROM uw GROUP BY 1)
SELECT CAST(uw.w AS BIGINT) AS week,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN uw.w = f.w0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(count(*) - sum(CASE WHEN uw.w = f.w0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM uw JOIN f ON f.u = uw.u
GROUP BY 1
"""


def q_jaccard_weeks(sf_dir: str):
    """Week-over-week audience overlap: Jaccard similarity of the
    active-user sets of consecutive epoch-weeks — the churn-shape
    readout that `new_returning_users` counts can't give (returning
    users may be returning from ANY past week; this measures adjacent
    retention directly).

    Distinct (user, week) pairs reduce distributed; the consecutive-
    week intersection sizes reduce from the user-bounded pair table
    (each user contributes |their weeks|−1 adjacent hits); Jaccard is
    exact integers until the final 6-dp division."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"], split=True)

    def prep(batch: pa.Table) -> pd.DataFrame:
        us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
        return (
            pd.DataFrame(
                {"u": batch["user_id"].to_numpy(zero_copy_only=False),
                 "w": us // (7 * 86_400_000_000)}
            )
            .drop_duplicates()
        )

    uw = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["u", "w"],
        {"one": ("count", None)},
    ).to_pandas()
    per_week = uw.groupby("w")["u"].agg(set)
    weeks = sorted(per_week.index)
    rows = []
    for w0, w1 in zip(weeks, weeks[1:]):
        if w1 != w0 + 1:
            # a gap week: the SQL oracle's b.w = a.w + 1 join emits no
            # row across it — pairing list-adjacent weeks would diverge
            continue
        a, b = per_week[w0], per_week[w1]
        inter, union = len(a & b), len(a | b)
        rows.append(
            {"week": int(w1), "n_prev": len(a), "n_curr": len(b),
             "n_common": inter,
             "jaccard": round(inter / union, 6) if union else float("nan")}
        )
    cols = ["week", "n_prev", "n_curr", "n_common"]
    out = pd.DataFrame(rows, columns=cols + ["jaccard"])
    out[cols] = out[cols].astype(np.int64)
    out["jaccard"] = out["jaccard"].astype(np.float64)
    return out


SQL_JACCARD_WEEKS = """
WITH uw AS (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // (7 * 86400000000) AS w
  FROM events
),
wk AS (SELECT w, count(*) AS n FROM uw GROUP BY 1),
pairs AS (
  SELECT b.w AS week, a.n AS n_prev, b.n AS n_curr
  FROM wk a JOIN wk b ON b.w = a.w + 1
),
common AS (
  SELECT y.w AS week, count(*) AS n_common
  FROM uw x JOIN uw y ON y.u = x.u AND y.w = x.w + 1
  GROUP BY 1
)
SELECT CAST(p.week AS BIGINT) AS week,
       CAST(p.n_prev AS BIGINT) AS n_prev, CAST(p.n_curr AS BIGINT) AS n_curr,
       CAST(coalesce(c.n_common, 0) AS BIGINT) AS n_common,
       round(coalesce(c.n_common, 0)
             / CAST(p.n_prev + p.n_curr - coalesce(c.n_common, 0) AS DOUBLE), 6)
         AS jaccard
FROM pairs p LEFT JOIN common c ON c.week = p.week
"""


def q_gdpr_delete(sf_dir: str):
    """Copy-on-write deletion lifecycle (state/deletes.py): documents
    are committed as a 4-file snapshot table partitioned by doc_id
    range, then every doc_id ≡ 0 (mod 7) is erased.  Footer-stat
    pruning must rewrite ONLY the files that can contain targets (all
    4 here — the ids span the range — but the carried/rewritten split
    is asserted in pytest on a range-limited delete); the new version
    commits atomically and v0 stays time-travel readable.

    Output: per-version (rows, sum of surviving doc_ids) — closed form
    over the documents table, so a delete that drops a wrong row or
    leaks a target reds the value hash."""
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from ..state.deletes import delete_rows
    from ..state.snapshots import commit_snapshot, read_snapshot

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    table = Path(tempfile.mkdtemp(prefix="ae_gdpr_"))
    try:
        ds.repartition(4).write_parquet(str(table / "base"))
        files = sorted(
            os.path.join("base", f)
            for f in os.listdir(table / "base")
            if f.endswith(".parquet")
        )
        commit_snapshot(table, files, op="append")
        max_id = int(ds.max("doc_id"))
        targets = list(range(0, max_id + 1, 7))
        delete_rows(table, "doc_id", targets)

        rows = []
        for v in (0, 1):
            snap = read_snapshot(table, v)
            rows.append(
                {"version": v, "n_rows": int(snap.count()),
                 "sum_doc_id": int(snap.sum("doc_id"))}
            )
        return pd.DataFrame(rows).astype(np.int64)
    finally:
        shutil.rmtree(table, ignore_errors=True)


SQL_GDPR_DELETE = """
SELECT CAST(0 AS BIGINT) AS version, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
FROM documents
UNION ALL
SELECT 1, count(*), sum(doc_id) FROM documents WHERE doc_id % 7 <> 0
ORDER BY version
"""


def q_stream_sessionize(sf_dir: str):
    """Micro-batch streaming sessionization (pipelines/streaming.py):
    the events table processed as week-long arrival-time windows with
    carried keyed state (open session + permanent per-user session
    counter), watermark-closed emission, and per-batch snapshot
    checkpoints.  The output contract is IDENTICAL to the batch
    `sessionize` query — micro-batching is an execution strategy, not
    a semantics change — so this runs against the same SQL oracle;
    crash-resume parity is pytest-verified (test_streaming.py)."""
    import shutil
    import tempfile

    from .streaming import read_emitted_sessions, run_sessionized_stream

    out = tempfile.mkdtemp(prefix="ae_stream_sess_")
    try:
        run_sessionized_stream(sf_dir, out, batch_hours=168)
        return read_emitted_sessions(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_incremental_ingest(sf_dir: str):
    """Incremental-ingestion lifecycle (pipelines/incremental.py): a
    sharded corpus arrives in two drops; each ``ingest_increment``
    extracts ONLY the new shards and publishes an atomic snapshot
    version whose manifest records the covered inputs.  Returns the
    per-version ledger (version, new_shards, delta rows, cumulative
    snapshot rows) plus an idempotency row (re-run with nothing new
    must be a no-op).  Rows-only at the driver gate; bit-exact
    equality of the final snapshot vs a from-scratch full extraction
    is pytest-verified (test_incremental.py)."""
    import shutil
    import tempfile
    from pathlib import Path

    from ..sources.synth import ensure_corpus_parquet
    from ..state.snapshots import read_snapshot
    from .incremental import ingest_increment

    corpus = ensure_corpus_parquet("/tmp/ae_corpora", 2000, 42)
    shards = sorted(p for p in Path(corpus).iterdir() if p.suffix == ".parquet")
    staged = Path(tempfile.mkdtemp(prefix="ae_inc_staged_"))
    table = Path(tempfile.mkdtemp(prefix="ae_inc_table_"))
    try:
        rows = []
        for batch_shards, label in ((shards[: len(shards) // 2], "drop1"),
                                    (shards, "drop2"), (shards, "noop")):
            for s in batch_shards:
                if not (staged / s.name).exists():
                    shutil.copy(s, staged / s.name)
            s_i = ingest_increment(str(staged), table)
            total = (
                int(read_snapshot(table).count()) if s_i["version"] is not None else 0
            )
            rows.append(
                {"step": label, "version": s_i["version"],
                 "new_shards": s_i["new_shards"], "delta_rows": s_i["rows"],
                 "snapshot_rows": total}
            )
        out = pd.DataFrame(rows)
        for c in ("version", "new_shards", "delta_rows", "snapshot_rows"):
            out[c] = out[c].astype(np.int64)
        return out
    finally:
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(table, ignore_errors=True)


# ---------------------------------------------------------------------------
# Content-addressed media-blob dedup across the interleaved corpus
# ---------------------------------------------------------------------------

#: distinct blob contents planted in the synthetic media corpus
_BLOB_GROUPS = 40
_MBD_BUCKETS = 16


def q_media_blob_dedup(sf_dir: str):
    """Content-addressed media deduplication across documents — the
    storage op an interleaved text+media corpus runs before anything
    else: identical image payloads referenced by many documents are
    stored ONCE, every ``media_ref`` remaps to the canonical blob, and
    the report quantifies bytes reclaimed per blob.

    Each document carries one real 24-bit BMP (``make_bmp``) whose
    content is a deterministic function of ``doc_id % _BLOB_GROUPS`` —
    exact cross-document duplicates, like a hotlinked logo on a crawl.
    The engine is plant-blind: every blob is sha256-hashed from its
    ACTUAL bytes and sized with ``len`` (no closed form on the Ray
    side); only the SQL oracle uses the planted arithmetic, so a single
    corrupted byte or mis-measured length flips the hash check.

    Scale shape: blobs never shuffle — each batch reduces to one
    ``(digest, min_ref, n, nbytes)`` candidate per distinct blob, and
    only those 72-byte rows move through a digest-bucket reduce (the
    :func:`..pipelines.tabular.dedup_exact_min` geometry).  Shuffle
    volume is bounded by blocks × distinct-blobs, independent of
    payload size."""
    import hashlib

    from ..stages.multimodal import make_bmp

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def blob_partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dig = np.empty(len(ids), dtype=object)
        nbytes = np.empty(len(ids), dtype=np.int64)
        for j, i in enumerate(ids):
            g = int(i) % _BLOB_GROUPS
            w, h = 4 * (g % 8 + 1), g % 5 + 1
            blob = make_bmp(w, h, str(g).encode())
            dig[j] = hashlib.sha256(blob).hexdigest()
            nbytes[j] = len(blob)
        df = pd.DataFrame({"digest": dig, "ref": ids, "nbytes": nbytes})
        part = df.groupby("digest", as_index=False).agg(
            ref=("ref", "min"), n=("ref", "size"), nbytes=("nbytes", "first")
        )
        part["__bucket"] = pd.util.hash_array(part["digest"].to_numpy()) % _MBD_BUCKETS
        return part

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("digest", as_index=False).agg(
            canonical_ref=("ref", "min"), n_refs=("n", "sum"), blob_bytes=("nbytes", "first")
        )
        out["bytes_saved"] = (out["n_refs"] - 1) * out["blob_bytes"]
        for c in ("canonical_ref", "n_refs", "blob_bytes", "bytes_saved"):
            out[c] = out[c].astype(np.int64)
        return out[["canonical_ref", "n_refs", "blob_bytes", "bytes_saved"]]

    partials = ds.map_batches(blob_partials, batch_format="pyarrow")
    return partials.groupby("__bucket").map_groups(finalize, batch_format="pandas")

SQL_MEDIA_BLOB_DEDUP = """
WITH g AS (SELECT doc_id, doc_id % 40 AS grp FROM documents)
SELECT MIN(doc_id) AS canonical_ref,
       CAST(COUNT(*) AS BIGINT) AS n_refs,
       CAST(54 + 3 * (4 * (grp % 8 + 1)) * (grp % 5 + 1) AS BIGINT) AS blob_bytes,
       CAST((COUNT(*) - 1) * (54 + 3 * (4 * (grp % 8 + 1)) * (grp % 5 + 1)) AS BIGINT)
           AS bytes_saved
FROM g
GROUP BY grp
"""


_MDG_MIN_SIDE = 16
_MDG_MAX_ASPECT = 3


def q_media_dims_gate(sf_dir: str):
    """LAION-style image geometry gate: drop images whose shorter side
    is under ``_MDG_MIN_SIDE`` px or whose aspect ratio exceeds
    ``_MDG_MAX_ASPECT`` — the first filter every image-text corpus runs
    (LAION-5B used min-side and aspect cuts before any model scoring),
    with the verdict kept per ref so the drop set is reviewable.

    Plant-blind like :func:`q_media_blob_dedup`: each document's image
    is a REAL PNG built at dims that vary with doc_id, and the engine
    reads width/height by walking the actual IHDR chunk
    (:func:`..stages.multimodal.probe_png` verifies signature, layout
    and CRC — a corrupt byte raises rather than emitting garbage);
    only the SQL oracle uses the planted closed form.  ``too_small``
    outranks ``bad_aspect`` (a tiny skewed image reports the cheaper
    check, as the real pipelines short-circuit).  Stateless header
    probe → fully fused single scan, no shuffle; payload bytes never
    leave the task."""
    from ..stages.multimodal import make_png, probe_png

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def gate(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = np.empty(len(ids), dtype=np.int64)
        h = np.empty(len(ids), dtype=np.int64)
        for i, d in enumerate(ids):
            png = make_png(int(4 * (d % 23 + 1)), int(4 * (d * 7 % 19 + 1)))
            w[i], h[i], _, _ = probe_png(png)
        short, long_ = np.minimum(w, h), np.maximum(w, h)
        verdict = np.where(
            short < _MDG_MIN_SIDE,
            "too_small",
            np.where(long_ > _MDG_MAX_ASPECT * short, "bad_aspect", "ok"),
        )
        return pd.DataFrame(
            {"doc_id": ids.astype(np.int64), "width": w, "height": h,
             "verdict": verdict}
        )

    return ds.map_batches(gate, batch_format="pyarrow")


SQL_MEDIA_DIMS_GATE = f"""
WITH d AS (SELECT doc_id,
                  4 * ((doc_id % 23) + 1) AS width,
                  4 * (((doc_id * 7) % 19) + 1) AS height
           FROM documents)
SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CASE WHEN least(width, height) < {_MDG_MIN_SIDE} THEN 'too_small'
            WHEN greatest(width, height) > {_MDG_MAX_ASPECT} * least(width, height)
                 THEN 'bad_aspect'
            ELSE 'ok' END AS verdict
FROM d
"""


# ---------------------------------------------------------------------------
# Curriculum ordering: difficulty-phased, in-phase hash-shuffled
# ---------------------------------------------------------------------------

_CURR_PHASES = 4
_CURR_BUCKETS = 64


def q_curriculum_order(sf_dir: str):
    """Curriculum data ordering (Bengio et al. 2009 shape): documents are
    globally ranked by a difficulty proxy (``n_chars``, tie → doc_id),
    cut into ``_CURR_PHASES`` equal phases (easy → hard, exact NTILE
    semantics), then deterministically shuffled WITHIN each phase by an
    md5 key so a trainer streaming phase-by-phase sees difficulty-
    homogeneous but content-mixed batches.

    Two bucketed rank passes, rows cross the wire once each and the
    driver only ever folds bucket COUNTS:

    1. global difficulty rank — the TeraSort shape of
       :func:`q_global_rank`: linspace value buckets over ``n_chars``
       (equal keys share a bucket, so cross-bucket ties are impossible),
       per-bucket counts → prefix-sum offsets broadcast back, in-bucket
       vectorized sort assigns ``rank``; ``phase`` is pure arithmetic on
       the rank (NTILE boundary table).  At web scale the linspace
       bounds become sampled quantiles (``sortmerge_join``'s sampler).
    2. in-phase shuffle rank — same geometry keyed on the md5 digest's
       top bits, which are uniform by construction, so the second pass
       is skew-proof at ANY corpus shape."""
    from ray.data.aggregate import Max, Min

    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "n_chars"], split=True)
    rng = ds.aggregate(Min("n_chars"), Max("n_chars"))
    bounds = np.linspace(rng["min(n_chars)"], rng["max(n_chars)"], _CURR_BUCKETS + 1)[1:-1]

    def bucket_of(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    bucketed = ds.map_batches(bucket_of, batch_format="pyarrow")
    counts = (
        bucketed.map_batches(
            lambda t: pd.DataFrame(
                {
                    "__bucket": pd.Series(
                        t["__bucket"].to_numpy(zero_copy_only=False)
                    ).value_counts().index,
                    "n": pd.Series(
                        t["__bucket"].to_numpy(zero_copy_only=False)
                    ).value_counts().to_numpy(),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__bucket")["n"]
        .sum()
    )
    full = counts.reindex(range(_CURR_BUCKETS), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(full)[:-1]])
    n_total = int(full.sum())  # total rows fall out of the same fold — no extra job
    # NTILE(k): first n%k tiles get ceil(n/k) rows
    base, rem = divmod(n_total, _CURR_PHASES)
    tile_ends = np.cumsum([base + (1 if t < rem else 0) for t in range(_CURR_PHASES)])
    off_bc = Broadcast((offsets, tile_ends))

    def rank_phase(df: pd.DataFrame) -> pd.DataFrame:
        offs, ends = off_bc.get()
        b = int(df["__bucket"].iloc[0])
        df = df.sort_values(["n_chars", "doc_id"], kind="stable")
        rank = offs[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        df["phase"] = (np.searchsorted(ends, rank - 1, side="right") + 1).astype(np.int64)
        return df[["doc_id", "n_chars", "phase"]]

    phased = bucketed.groupby("__bucket").map_groups(rank_phase, batch_format="pandas")

    # pass 2: in-phase md5-shuffle rank, bucketed on the digest's top bits
    def hash_bucket(batch: pa.Table) -> pa.Table:
        hi, lo = md5_digest_words(batch["doc_id"])
        hi, lo = hi.astype(np.uint64), lo.astype(np.uint64)  # native-endian view
        ph = batch["phase"].to_numpy(zero_copy_only=False)
        hb = (hi >> np.uint64(58)).astype(np.int64)  # top 6 bits → 64 buckets
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["n_chars"],
                batch["phase"],
                pa.array(hi),
                pa.array(lo),
                pa.array(ph * _CURR_BUCKETS + hb),
            ],
            names=["doc_id", "n_chars", "phase", "__hi", "__lo", "__pb"],
        )

    hb_ds = phased.map_batches(hash_bucket, batch_format="pyarrow")
    hb_counts = (
        hb_ds.map_batches(
            lambda t: pd.DataFrame(
                {
                    "__pb": pd.Series(t["__pb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .index,
                    "n": pd.Series(t["__pb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .to_numpy(),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__pb")["n"]
        .sum()
        .sort_index()
    )
    # per-phase prefix offsets over that phase's hash buckets
    pb_offsets: dict[int, int] = {}
    seen_per_phase: dict[int, int] = {}
    for pb, n in hb_counts.items():
        ph = int(pb) // _CURR_BUCKETS
        pb_offsets[int(pb)] = seen_per_phase.get(ph, 0)
        seen_per_phase[ph] = pb_offsets[int(pb)] + int(n)
    pbo_bc = Broadcast(pb_offsets)

    def rank_in_phase(df: pd.DataFrame) -> pd.DataFrame:
        pb = int(df["__pb"].iloc[0])
        df = df.sort_values(["__hi", "__lo", "doc_id"], kind="stable")
        df["phase_rank"] = pbo_bc.get()[pb] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "n_chars", "phase", "phase_rank"]]

    return hb_ds.groupby("__pb").map_groups(rank_in_phase, batch_format="pandas")


SQL_CURRICULUM_ORDER = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         NTILE({_CURR_PHASES}) OVER (ORDER BY n_chars, doc_id) AS phase
  FROM documents)
SELECT doc_id, n_chars, CAST(phase AS BIGINT) AS phase,
       CAST(ROW_NUMBER() OVER (
           PARTITION BY phase
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS phase_rank
FROM ranked
"""


# ---------------------------------------------------------------------------
# Per-source dataset card
# ---------------------------------------------------------------------------


def q_data_card(sf_dir: str):
    """Per-source dataset card — the one-page summary a training-data
    release ships per subcorpus (docs, token volume, mean length,
    language mix + entropy, exact-duplicate rate).

    One streaming pass folds per-``(source, lang)`` partials (count,
    token sum via the vectorized ``\\S+`` Arrow kernel, char sum) —
    a table bounded by sources × languages, NOT corpus size — and the
    driver finishes the per-source entropy over it.  The exact
    distinct-text count per source is a second pass with the
    md5-digest dedup geometry: each batch emits its distinct
    ``(source, digest)`` pairs once, a digest-bucket reduce re-dedups,
    and only per-bucket COUNTS return.  Text never shuffles."""
    import pyarrow.compute as pc

    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["source", "lang", "text"], split=True)

    def lang_partials(batch: pa.Table) -> pd.DataFrame:
        toks = pc.fill_null(
            pc.cast(pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        chars = pc.fill_null(
            pc.cast(pc.utf8_length(batch["text"]), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "toks": toks,
                "chars": chars,
            }
        )
        return df.groupby(["source", "lang"], as_index=False).agg(
            n=("toks", "size"), toks=("toks", "sum"), chars=("chars", "sum")
        )

    per_sl = (
        ds.map_batches(lang_partials, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "lang"], as_index=False)
        .sum()
    )

    def distinct_partials(batch: pa.Table) -> pd.DataFrame:
        hi, lo = md5_digest_words(batch["text"])
        hi, lo = hi.astype(np.uint64), lo.astype(np.uint64)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_numpy(zero_copy_only=False),
                "hi": hi,
                "lo": lo,
            }
        ).drop_duplicates()
        df["__bucket"] = (df["hi"] % np.uint64(_MBD_BUCKETS)).astype(np.int64)
        return df

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.drop_duplicates(["source", "hi", "lo"])
            .groupby("source", as_index=False)
            .size()
            .rename(columns={"size": "n_distinct"})
        )
        return out

    dist = (
        ds.map_batches(distinct_partials, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(count_distinct, batch_format="pandas")
        .to_pandas()
        .groupby("source", as_index=False)["n_distinct"]
        .sum()
    )

    tot = per_sl.groupby("source", as_index=False).agg(
        n_docs=("n", "sum"), n_tokens=("toks", "sum"), chars=("chars", "sum"),
        n_langs=("lang", "nunique"),
    )
    ent = (
        per_sl.merge(tot[["source", "n_docs"]], on="source")
        .assign(p=lambda d: d["n"] / d["n_docs"])
        .assign(term=lambda d: -d["p"] * np.log(d["p"]))
        .groupby("source", as_index=False)["term"]
        .sum()
        .rename(columns={"term": "lang_entropy"})
    )
    out = tot.merge(ent, on="source").merge(dist, on="source")
    out["mean_chars"] = (out["chars"] / out["n_docs"]).round(6)
    out["lang_entropy"] = out["lang_entropy"].round(6)
    out["dup_frac"] = ((out["n_docs"] - out["n_distinct"]) / out["n_docs"]).round(6)
    for c in ("n_docs", "n_tokens", "n_langs", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    out = out.rename(columns={"n_distinct": "n_distinct_texts"})
    return out[
        [
            "source", "n_docs", "n_tokens", "mean_chars",
            "n_langs", "lang_entropy", "n_distinct_texts", "dup_frac",
        ]
    ]


SQL_DATA_CARD = r"""
WITH per AS (
  SELECT source, lang, COUNT(*) AS n,
         SUM(coalesce(array_length(regexp_extract_all(text, '\S+')), 0)) AS toks,
         SUM(len(text)) AS chars
  FROM documents GROUP BY 1, 2),
tot AS (
  SELECT source, SUM(n) AS n_docs, SUM(toks) AS n_tokens, SUM(chars) AS chars,
         COUNT(*) AS n_langs
  FROM per GROUP BY 1),
ent AS (
  SELECT per.source,
         -SUM((CAST(n AS DOUBLE) / n_docs) * ln(CAST(n AS DOUBLE) / n_docs)) AS h
  FROM per JOIN tot USING (source) GROUP BY 1),
dist AS (SELECT source, COUNT(DISTINCT text) AS n_distinct FROM documents GROUP BY 1)
SELECT t.source,
       CAST(t.n_docs AS BIGINT) AS n_docs,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       round(CAST(t.chars AS DOUBLE) / t.n_docs, 6) AS mean_chars,
       CAST(t.n_langs AS BIGINT) AS n_langs,
       round(e.h, 6) AS lang_entropy,
       CAST(d.n_distinct AS BIGINT) AS n_distinct_texts,
       round(CAST(t.n_docs - d.n_distinct AS DOUBLE) / t.n_docs, 6) AS dup_frac
FROM tot t JOIN ent e ON t.source = e.source JOIN dist d ON t.source = d.source
"""


# ---------------------------------------------------------------------------
# Quality-proportional rejection sampling
# ---------------------------------------------------------------------------


def q_quality_sample(sf_dir: str):
    """Quality-proportional rejection sampling — the curation op that
    keeps a document with probability equal to its quality score
    (FineWeb-style stochastic filtering, instead of a hard threshold
    that cliff-drops mid-quality content).

    The coin is deterministic: u(doc) = top-52-md5-bits(doc_id) / 2^52
    (an exactly representable float, the :func:`q_weighted_sample`
    idiom), accept iff u < quality_score.  No RNG state — any
    worker/batch layout, retry, or resume draws the same sample, and
    DuckDB reproduces the identical uniform so the whole sample is
    value-oracled.  Fused scan: score + coin + filter in one
    ``map_batches``, zero shuffle, output is accepted rows only."""
    from ..stages.text_stats import quality_batch

    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def accept(batch: pa.Table) -> pa.Table:
        scored = quality_batch(batch)
        hi, _ = md5_digest_words(scored["doc_id"])
        u = (hi >> np.uint64(12)).astype(np.float64) / np.float64(2**52)
        keep = u < scored["quality_score"].to_numpy(zero_copy_only=False)
        return scored.filter(pa.array(keep)).select(["doc_id", "quality_score"])

    return ds.map_batches(accept, batch_format="pyarrow")


SQL_QUALITY_SAMPLE = f"""
WITH q AS ({SQL_QUALITY})
SELECT doc_id, quality_score
FROM q
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        / 4503599627370496.0 < quality_score
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility per language
# ---------------------------------------------------------------------------


def q_tokenizer_fertility(sf_dir: str):
    """Tokenizer fertility report per language — tokens-per-word and
    chars-per-token, the standard multilingual tokenizer-efficiency
    audit (a language whose fertility is 2× pays 2× the compute per
    word of content).

    Fertility = BPE-ish tokens (``\\w+|[^\\w\\s]`` runs, the
    ``token_bpe`` kernel) over whitespace words; both counts come from
    vectorized Arrow regex kernels in ONE fused scan that reduces each
    batch to a per-language partial row — the driver folds a table
    bounded by language count, never rows."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["lang", "text"], split=True)

    def partials(batch: pa.Table) -> pd.DataFrame:
        def cnt(pattern: str) -> np.ndarray:
            return pc.fill_null(
                pc.cast(pc.count_substring_regex(batch["text"], pattern), pa.int64()), 0
            ).to_numpy(zero_copy_only=False)

        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_numpy(zero_copy_only=False),
                "ws": cnt(r"\S+"),
                "bpe": cnt(r"\w+|[^\w\s]"),
                "chars": pc.fill_null(
                    pc.cast(pc.utf8_length(batch["text"]), pa.int64()), 0
                ).to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("lang", as_index=False).agg(
            n_docs=("ws", "size"), ws=("ws", "sum"), bpe=("bpe", "sum"),
            chars=("chars", "sum"),
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang", as_index=False)
        .sum()
    )
    agg["fertility"] = (agg["bpe"] / agg["ws"]).round(6)
    agg["chars_per_token"] = (agg["chars"] / agg["bpe"]).round(6)
    for c in ("n_docs", "ws", "bpe"):
        agg[c] = agg[c].astype(np.int64)
    agg = agg.rename(columns={"ws": "n_ws_tokens", "bpe": "n_bpe_tokens"})
    return agg[["lang", "n_docs", "n_ws_tokens", "n_bpe_tokens", "fertility", "chars_per_token"]]


SQL_TOKENIZER_FERTILITY = r"""
WITH t AS (
  SELECT lang,
         coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS ws,
         coalesce(array_length(regexp_extract_all(text, '\w+|[^\w\s]')), 0) AS bpe,
         len(text) AS chars
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       round(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS fertility,
       round(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6) AS chars_per_token
FROM t GROUP BY lang
"""


# ---------------------------------------------------------------------------
# kNN label-noise detection over the embeddings table
# ---------------------------------------------------------------------------

_LND_K = 5


def q_label_noise_detect(sf_dir: str):
    """Label-noise detection (confident-learning-lite): flag every
    vector whose ``_LND_K`` nearest neighbors by cosine majority-vote a
    DIFFERENT label — the standard pre-training audit that surfaces
    mislabeled examples before they poison a classifier.

    Same broadcast-matmul shape as :func:`q_hard_negatives` (ids-only
    output for float32 ``list_cosine_similarity`` parity): each batch
    computes its sims block against the broadcast normalized matrix,
    takes the top-K columns with a stable argsort (equal sims keep
    ascending vec_id order — the SQL tie rule), folds votes with ONE
    vectorized 2-D scatter-add (no per-row Python), and emits only the
    disagreeing rows.

    Above the broadcast budget (footer row count), the same exact
    top-K + vote runs with NO driver matrix:
    ``knn_graph_blocked(attr_col="label")`` carries both labels
    through the block-pair exchange, and the vote happens inside the
    per-src merge-reduce (``group_finalize``) while the neighbor group
    is still atomic — only (ids, labels, sims) triples move after the
    matmuls (pytest-equal to the broadcast path).
    ``knn_ivf``/``knn_lsh_shuffle`` remain the sublinear approximate
    swaps past exact-O(N²) budgets."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"], split=True)

    if _emb_rows(sf_dir) > _EMB_BROADCAST_ROWS:
        from ..stages.similarity import knn_graph_blocked

        def vote(g: pd.DataFrame) -> pd.DataFrame:
            own = int(g["src_attr"].iloc[0])
            vc = g.groupby("dst_attr").size().sort_index()
            knn_label = int(vc.idxmax())  # first max = smallest label on ties
            if knn_label == own:
                return pd.DataFrame(
                    {c: pd.Series(dtype=np.int64)
                     for c in ("vec_id", "label", "knn_label", "n_votes")}
                )
            return pd.DataFrame(
                {
                    "vec_id": [int(g["src"].iloc[0])],
                    "label": [own],
                    "knn_label": [knn_label],
                    "n_votes": [int(vc.max())],
                }
            )

        return knn_graph_blocked(
            ds, k=_LND_K, n_blocks=8, attr_col="label", group_finalize=vote,
        )

    mat_tbl = (
        read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])
        .sort_by("vec_id")
    )
    ids = mat_tbl["vec_id"].to_numpy()
    labels = mat_tbl["label"].to_numpy().astype(np.int64)
    n_labels = int(labels.max()) + 1
    M = np.stack(mat_tbl["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bc = Broadcast((ids, labels, n_labels, Mn))

    def flag_noise(batch: pa.Table) -> pd.DataFrame:
        ids_, labels_, n_labels_, Mn_ = bc.get()
        vid = batch["vec_id"].to_numpy(zero_copy_only=False)
        vlab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        sims = Vn @ Mn_.T
        sims[vid[:, None] == ids_[None, :]] = -np.inf  # mask self
        # stable argsort of -sims: ties keep ascending vec_id (matrix is
        # vec_id-sorted) — identical to SQL's (sim DESC, vec_id) rule
        order = np.argsort(-sims, axis=1, kind="stable")[:, :_LND_K]
        top_labels = labels_[order]  # B × K
        votes = np.zeros((len(vid), n_labels_), dtype=np.int64)
        rows = np.repeat(np.arange(len(vid)), _LND_K)
        np.add.at(votes, (rows, top_labels.ravel()), 1)
        knn_label = votes.argmax(axis=1)  # first max = smallest label on ties
        n_votes = votes[np.arange(len(vid)), knn_label]
        bad = knn_label != vlab
        return pd.DataFrame(
            {
                "vec_id": vid.astype(np.int64)[bad],
                "label": vlab[bad],
                "knn_label": knn_label.astype(np.int64)[bad],
                "n_votes": n_votes.astype(np.int64)[bad],
            }
        )

    return ds.map_batches(flag_noise, batch_format="pyarrow")


SQL_LABEL_NOISE = f"""
WITH nn AS (
  SELECT a.vec_id, a.label AS own, b.label AS nlabel,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                    b.vec_id) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id),
votes AS (
  SELECT vec_id, own, nlabel, COUNT(*) AS c
  FROM nn WHERE rk <= {_LND_K} GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, own, nlabel AS knn_label, c
  FROM votes
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, nlabel) = 1)
SELECT vec_id,
       CAST(own AS BIGINT) AS label,
       CAST(knn_label AS BIGINT) AS knn_label,
       CAST(c AS BIGINT) AS n_votes
FROM best WHERE knn_label <> own
"""


# ---------------------------------------------------------------------------
# Deterministic class-balanced downsampling
# ---------------------------------------------------------------------------

_CB_BUCKETS = 64


def q_class_balance(sf_dir: str):
    """Class-balanced downsampling: keep exactly ``min(class size)``
    rows per label, chosen by a deterministic md5 order — the trainer
    prep that equalizes class frequencies without RNG state (any
    worker layout, retry, or resume keeps the same rows).

    Geometry is the :func:`q_curriculum_order` pass-2 shape: one
    bounded fold counts rows per (label, md5-top-bits bucket) — the
    bucket key is uniform by construction, so the pass is skew-proof
    even when one class dominates — prefix offsets within each label
    broadcast back, and each (label, bucket) group sorts locally and
    keeps the rows whose global in-label md5 rank clears the minimum
    class size.  Rows cross the wire once; the driver folds only
    labels × buckets counts."""
    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "label"], split=True)

    def hash_bucket(batch: pa.Table) -> pa.Table:
        hi, lo = md5_digest_words(batch["vec_id"])
        hi, lo = hi.astype(np.uint64), lo.astype(np.uint64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        hb = (hi >> np.uint64(58)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                batch["vec_id"],
                batch["label"],
                pa.array(hi),
                pa.array(lo),
                pa.array(lab * _CB_BUCKETS + hb),
            ],
            names=["vec_id", "label", "__hi", "__lo", "__lb"],
        )

    hb_ds = ds.map_batches(hash_bucket, batch_format="pyarrow")
    lb_counts = (
        hb_ds.map_batches(
            lambda t: pd.DataFrame(
                {
                    "__lb": pd.Series(t["__lb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .index,
                    "n": pd.Series(t["__lb"].to_numpy(zero_copy_only=False))
                    .value_counts()
                    .to_numpy(),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__lb")["n"]
        .sum()
        .sort_index()
    )
    class_sizes: dict[int, int] = {}
    lb_offsets: dict[int, int] = {}
    for lb, n in lb_counts.items():
        lab = int(lb) // _CB_BUCKETS
        lb_offsets[int(lb)] = class_sizes.get(lab, 0)
        class_sizes[lab] = lb_offsets[int(lb)] + int(n)
    m = min(class_sizes.values())
    state_bc = Broadcast((lb_offsets, m))

    def keep_ranked(df: pd.DataFrame) -> pd.DataFrame:
        offs, m_ = state_bc.get()
        lb = int(df["__lb"].iloc[0])
        df = df.sort_values(["__hi", "__lo", "vec_id"], kind="stable")
        rank = offs[lb] + np.arange(1, len(df) + 1, dtype=np.int64)
        out = df.loc[rank <= m_, ["vec_id", "label"]].copy()
        out["label"] = out["label"].astype(np.int64)
        return out

    return hb_ds.groupby("__lb").map_groups(keep_ranked, batch_format="pandas")


SQL_CLASS_BALANCE = """
WITH m AS (
  SELECT MIN(n) AS m FROM (SELECT COUNT(*) AS n FROM embeddings GROUP BY label))
SELECT vec_id, CAST(label AS BIGINT) AS label
FROM embeddings, m
QUALIFY row_number() OVER (
  PARTITION BY label
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= m.m
"""


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) near-duplicate image detection
# ---------------------------------------------------------------------------

_PHASH_GROUPS = 25


def _phash_base_bits(g: int) -> np.ndarray:
    """64 deterministic pattern bits for blob group ``g`` (md5-derived;
    first two bits forced to 1,0 so no pattern is uniform — a uniform
    image would alias across groups under a mean-threshold hash)."""
    import hashlib

    raw = hashlib.md5(f"phash-{g}".encode()).digest()
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8))[:64].copy()
    bits[0], bits[1] = 1, 0
    return bits


def q_media_phash_dedup(sf_dir: str):
    """Perceptual near-duplicate image detection — the dedup that exact
    content hashing CANNOT do: each document's image is its group's
    base pattern plus per-document pixel noise (re-encoded thumbnails,
    recompressed logos), so every payload is byte-unique, yet the
    8×8 average-hash (aHash: grayscale, threshold at the image mean,
    pack to 64 bits) is identical within a group.

    The engine is plant-blind: it walks the real BMP container
    (data-offset/stride from the header), grayscales actual pixels,
    thresholds at the actual per-image mean, and groups by the
    resulting 64-bit hash with the same digest-bucket combiner as
    :func:`q_media_blob_dedup` — payloads never shuffle, only
    (hash, min_ref, n) candidates.  The noise is ±1 on 40/200-valued
    pixels, so no bit can cross the ~120 mean: the SQL oracle knows
    only the planted group arithmetic, and any decode/threshold bug
    splits or merges a group and flips the hash check."""
    import hashlib
    import struct

    from ..stages.multimodal import make_bmp

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def phash_partials(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hashes = np.empty(len(ids), dtype=np.uint64)
        for j, i in enumerate(ids):
            i = int(i)
            g = i % _PHASH_GROUPS
            vals = np.where(_phash_base_bits(g) == 1, 200, 40).astype(np.int16)
            noise_bits = np.unpackbits(
                np.frombuffer(hashlib.md5(f"noise-{i}".encode()).digest(), dtype=np.uint8)
            )[:64]
            vals = (vals + np.where(noise_bits == 1, 1, -1)).astype(np.uint8)
            payload = make_bmp(8, 8, np.repeat(vals, 3).tobytes())
            # honest decode: header walk, stride slice, grayscale, aHash
            data_off = struct.unpack_from("<I", payload, 10)[0]
            w, h = struct.unpack_from("<ii", payload, 18)
            stride = (w * 3 + 3) & ~3
            px = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
            gray = px.mean(axis=2)
            bits = (gray > gray.mean()).astype(np.uint8).ravel()
            hashes[j] = np.packbits(bits).view(">u8")[0]
        df = pd.DataFrame({"ahash": hashes, "ref": ids})
        part = df.groupby("ahash", as_index=False).agg(ref=("ref", "min"), n=("ref", "size"))
        part["__bucket"] = (part["ahash"].to_numpy() % np.uint64(_MBD_BUCKETS)).astype(np.int64)
        return part

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("ahash", as_index=False).agg(
            canonical_ref=("ref", "min"), n_refs=("n", "sum")
        )
        for c in ("canonical_ref", "n_refs"):
            out[c] = out[c].astype(np.int64)
        return out[["canonical_ref", "n_refs"]]

    partials = ds.map_batches(phash_partials, batch_format="pyarrow")
    return partials.groupby("__bucket").map_groups(finalize, batch_format="pandas")


SQL_MEDIA_PHASH_DEDUP = f"""
SELECT MIN(doc_id) AS canonical_ref, CAST(COUNT(*) AS BIGINT) AS n_refs
FROM documents GROUP BY doc_id % {_PHASH_GROUPS}
"""


# ---------------------------------------------------------------------------
# Safety blocklist gate
# ---------------------------------------------------------------------------

#: whole-word blocklist (stand-in for a safety/brand-risk term list)
_BLOCKLIST = ("slow", "dup", "error")
_BLOCKLIST_RE = r"\b(" + "|".join(_BLOCKLIST) + r")\b"


def q_blocklist_filter(sf_dir: str):
    """Safety blocklist gate — the wordlist screen a training-data
    pipeline runs before any model-based toxicity scorer (cheap, exact,
    auditable): count whole-word blocklist hits per document and emit
    the documents the gate removes, with their hit counts, so the drop
    set is reviewable.

    One fused scan: a single vectorized Arrow regex count per batch
    (alternation compiled once by RE2), filter to hits > 0, zero
    shuffle.  The whole-word ``\\b`` semantics are identical in RE2 and
    DuckDB, so the gate is value-oracled."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def gate(batch: pa.Table) -> pa.Table:
        hits = pc.fill_null(
            pc.cast(pc.count_substring_regex(batch["text"], _BLOCKLIST_RE), pa.int64()), 0
        )
        keep = pc.greater(hits, 0)
        return pa.Table.from_arrays(
            [batch["doc_id"].filter(keep), hits.filter(keep)],
            names=["doc_id", "n_hits"],
        )

    return ds.map_batches(gate, batch_format="pyarrow")


SQL_BLOCKLIST_FILTER = rf"""
SELECT doc_id,
       CAST(array_length(regexp_extract_all(text, '{_BLOCKLIST_RE}')) AS BIGINT) AS n_hits
FROM documents
WHERE array_length(regexp_extract_all(text, '{_BLOCKLIST_RE}')) > 0
"""


# ---------------------------------------------------------------------------
# Normalization-robust exact dedup
# ---------------------------------------------------------------------------


def q_normalized_dedup(sf_dir: str):
    """Normalization-robust exact dedup: case-fold, collapse whitespace
    runs, trim — then dedupe on the canonical form (min doc_id
    survives) with per-group variant counts.  Catches the
    trivially-edited duplicates byte-exact dedup misses (re-wrapped
    lines, case-changed titles, tab-vs-space paste artifacts) without
    paying MinHash.

    Normalization is three vectorized Arrow kernels; the canonical
    text itself never shuffles — each batch reduces to one
    ``(md5(canon), min_id, n)`` candidate per distinct form and only
    those fixed-width rows cross the digest-bucket reduce (the
    :func:`..pipelines.tabular.dedup_exact_min` geometry)."""
    import pyarrow.compute as pc

    from .tabular import md5_digest_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def canon_partials(batch: pa.Table) -> pd.DataFrame:
        canon = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(batch["text"]), r"\s+", " ")
        )
        hi, lo = md5_digest_words(canon)
        df = pd.DataFrame(
            {
                "hi": hi.astype(np.uint64),
                "lo": lo.astype(np.uint64),
                "ref": batch["doc_id"].to_numpy(zero_copy_only=False),
            }
        )
        part = df.groupby(["hi", "lo"], as_index=False).agg(
            ref=("ref", "min"), n=("ref", "size")
        )
        part["__bucket"] = (part["hi"] % np.uint64(_MBD_BUCKETS)).astype(np.int64)
        return part

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["hi", "lo"], as_index=False).agg(
            doc_id=("ref", "min"), n_variants=("n", "sum")
        )
        out["doc_id"] = out["doc_id"].astype(np.int64)
        out["n_variants"] = out["n_variants"].astype(np.int64)
        return out[["doc_id", "n_variants"]]

    partials = ds.map_batches(canon_partials, batch_format="pyarrow")
    return partials.groupby("__bucket").map_groups(finalize, batch_format="pandas")


SQL_NORMALIZED_DEDUP = r"""
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_variants
FROM (SELECT doc_id,
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k
      FROM documents)
GROUP BY k
"""


# ---------------------------------------------------------------------------
# sketch internals, value-oracled: md5-keyed HLL / SimHash / MinHash
# (stages/sketch_parity.py) — the register/bit/signature-level SQL
# parity suite for the production SipHash sketches
# ---------------------------------------------------------------------------

_HLL_SQL_P = 10  # 1024 registers: bounded output at any corpus size


def q_hll_registers(sf_dir: str):
    """EVERY HyperLogLog register value-checked against SQL: md5-keyed
    p=10 sketch over events.user_id, output = (register, max rho) rows.

    Where `hll_rank_check` proves the production SipHash sketch lands
    within tolerance, this proves the register MATH — bucket index from
    the top p hash bits, rho from the leading-zero scan of the
    sentinel-planted remainder, max-merge — bit-exactly, because md5 is
    the one hash both engines expose (`md5_number_upper` ==
    digest[:8] little-endian, probed).  The rho scan is pure integer
    work on both sides (unpackbits argmax here, 65 - length(bin(rest))
    in DuckDB — bin() strips leading zeros), so no float boundary can
    flip a register.  Scale shape: per-batch distinct → md5 → bounded
    (≤2**p rows) max-partials, one small_keys max-reduce; the corpus
    never shuffles."""
    from ..stages.sketch_parity import hll_md5_partial

    ds = read_table(sf_dir, "events", columns=["user_id"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        uid = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return hll_md5_partial([str(int(u)) for u in uid], _HLL_SQL_P)

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["register"],
        {"rho": ("max", "rho")},
        small_keys=True,
    ).to_pandas()
    return out.sort_values("register").reset_index(drop=True).astype(
        {"register": np.int64, "rho": np.int64}
    )


SQL_HLL_REGISTERS = """
WITH h AS (
  SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS h
  FROM (SELECT DISTINCT user_id FROM events)
),
r AS (
  SELECT CAST(h >> 54 AS BIGINT) AS register,
         65 - length(bin(((h % 18014398509481984::UBIGINT) * 1024::UBIGINT)
                         | 512::UBIGINT)) AS rho
  FROM h
)
SELECT register, CAST(max(rho) AS BIGINT) AS rho
FROM r GROUP BY register ORDER BY register
"""


def q_simhash_md5(sf_dir: str):
    """Per-document 64-bit SimHash with EVERY bit value-checked: the
    md5-keyed twin of the rows-only `simhash_values` (production SipHash
    kernel, stages/dedup.py batch_minhash-era `batch_simhash64`).  Same
    geometry — distinct whitespace tokens, one batch-wide hash pass,
    reduceat majority votes — with the fingerprint emitted as a 16-char
    hex string so the value hash is engine-neutral.  The oracle rebuilds
    all 64 majority votes as per-bit integer sums (strict majority,
    ties → 0), so a single flipped bit on 60k documents reds the check."""
    from ..stages.sketch_parity import simhash_md5_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def sh(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "simhash": simhash_md5_batch(batch["text"].to_pylist()),
            }
        )

    return ds.map_batches(sh, batch_format="pyarrow").sort("doc_id")


_SIMHASH_BITSUMS = ",\n         ".join(
    f"sum(CAST((h >> {b}) & 1 AS BIGINT)) AS b{b}" for b in range(64)
)
_SIMHASH_ORS = "\n       | ".join(
    f"(CASE WHEN 2*b{b} > n THEN {1 << b}::UBIGINT ELSE 0::UBIGINT END)"
    for b in range(64)
)

SQL_SIMHASH_MD5 = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> ''))) AS tok
  FROM documents
),
h AS (SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, count(*) AS n,
         {_SIMHASH_BITSUMS}
  FROM h GROUP BY doc_id
),
vals AS (
  SELECT doc_id,
         {_SIMHASH_ORS} AS v
  FROM bits
)
SELECT d.doc_id, coalesce(lpad(lower(hex(va.v)), 16, '0'),
                          '0000000000000000') AS simhash
FROM documents d LEFT JOIN vals va USING (doc_id)
ORDER BY d.doc_id
"""


def q_minhash_sigs(sf_dir: str):
    """EVERY MinHash signature slot value-checked against SQL: k=8
    affine permutations over md5-keyed 32-bit hashes of distinct 3-word
    shingles — the signature math behind `minhash_dedup`'s rows-only
    LSH pipeline, isolated where DuckDB can recompute it (32-bit hash
    domain keeps a*h+b under 2**64, the overflow ceiling BOTH engines
    share — DuckDB UBIGINT raises rather than wraps).  Documents
    shorter than one shingle emit nothing on both sides.  Scale shape:
    one streaming pass, per-batch md5 + reduceat minima, no shuffle."""
    from ..stages.sketch_parity import minhash_md5_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def mh(batch: pa.Table) -> pd.DataFrame:
        return minhash_md5_batch(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        )

    return ds.map_batches(mh, batch_format="pyarrow").sort(["doc_id", "perm"])


def _minhash_sql() -> str:
    from ..stages.sketch_parity import MINHASH_A, MINHASH_B, MINHASH_PRIME

    perm_vals = ", ".join(
        f"({j}, {a}::UBIGINT, {b}::UBIGINT)"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM t WHERE len(toks) >= 3)
),
perms(perm, a, b) AS (VALUES {perm_vals}),
hashed AS (SELECT doc_id, md5_number_upper(sh) % 4294967296::UBIGINT AS h32 FROM s)
SELECT doc_id, CAST(perm AS BIGINT) AS perm,
       CAST(min((a * h32 + b) % {MINHASH_PRIME}::UBIGINT) AS BIGINT) AS sig
FROM hashed CROSS JOIN perms
GROUP BY doc_id, perm ORDER BY doc_id, perm
"""


SQL_MINHASH_SIGS = _minhash_sql()


# ---------------------------------------------------------------------------
# margin-based bitext mining (Artetxe & Schwenk 2019) — the parallel-pair
# miner behind CCMatrix-style corpora, over the embeddings table with the
# two "languages" as the even/odd vec_id halves
# ---------------------------------------------------------------------------

#: the broadcast kernel materializes the full (nA × nB) margin matrix —
#: that matrix, not the vectors, is the budget-setter (8192² × 8 B ≈
#: 512 MiB across both float planes); above it the block-pair path runs
_BITEXT_MATRIX_ROWS = 8192


def q_bitext_mine(sf_dir: str):
    """Mutual-margin bitext pairs: margin(a,b) = cos / mean of the two
    rows' top-k cosine averages (ratio margin, Artetxe & Schwenk 2019 —
    the hubness-robust criterion CCMatrix/LASER mining uses), a pair
    kept iff each side is the other's argmax and margin > 1.

    Router on the parquet footer row count: under
    ``_BITEXT_MATRIX_ROWS`` the exact kernel runs in one task
    (`stages.similarity.bitext_margin_broadcast`); above it the
    block-pair two-sweep path (`bitext_margin_blocked`) computes the
    same answer with no driver-side matrix (forced-route pytest).  The
    argmax is rank-only output (ids, no float column), `knn_cosine`
    convention; the minimum runner-up margin gap on this corpus is
    ~1.3e-3, five orders above the engines' float divergence."""
    from ..stages.similarity import (
        _as_matrix,
        _normalize,
        bitext_margin_blocked,
        bitext_margin_broadcast,
    )

    if _emb_rows(sf_dir) > _BITEXT_MATRIX_ROWS:
        ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
        out = bitext_margin_blocked(ds, k=4, threshold=1.0, n_blocks=8).to_pandas()
        return out.sort_values("a_id").reset_index(drop=True)
    tab = read_table_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids = tab["vec_id"].to_numpy()
    mat = _normalize(_as_matrix(tab["embedding"]))
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    a = ids % 2 == 0
    return bitext_margin_broadcast(ids[a], mat[a], ids[~a], mat[~a], k=4, threshold=1.0)


SQL_BITEXT_MINE = """
WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_cosine_similarity(a.e, b.e) AS cos
  FROM n a JOIN n b ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
),
ka AS (SELECT a_id, avg(cos) AS avg_a FROM (
         SELECT a_id, cos, row_number() OVER (PARTITION BY a_id ORDER BY cos DESC) AS rn
         FROM c) WHERE rn <= 4 GROUP BY a_id),
kb AS (SELECT b_id, avg(cos) AS avg_b FROM (
         SELECT b_id, cos, row_number() OVER (PARTITION BY b_id ORDER BY cos DESC) AS rn
         FROM c) WHERE rn <= 4 GROUP BY b_id),
m AS (
  SELECT c.a_id, c.b_id, c.cos / ((ka.avg_a + kb.avg_b) / 2.0) AS margin
  FROM c JOIN ka USING (a_id) JOIN kb USING (b_id)
),
ba AS (SELECT a_id, b_id, margin FROM (
         SELECT *, row_number() OVER (PARTITION BY a_id ORDER BY margin DESC, b_id) AS rn
         FROM m) WHERE rn = 1),
bb AS (SELECT a_id, b_id FROM (
         SELECT *, row_number() OVER (PARTITION BY b_id ORDER BY margin DESC, a_id) AS rn
         FROM m) WHERE rn = 1)
SELECT ba.a_id, ba.b_id
FROM ba JOIN bb ON ba.a_id = bb.a_id AND ba.b_id = bb.b_id
WHERE ba.margin > 1.0 ORDER BY ba.a_id
"""


# ---------------------------------------------------------------------------
# ROUGE-1 eval + Distinct-n corpus diversity — summarization-eval and
# generation-diversity metrics over document pairs / sources
# ---------------------------------------------------------------------------


def _token_count_frame(texts, seg_ids) -> pd.DataFrame:
    """Exploded (seg, tok, c) counts for a batch of texts — one pandas
    groupby, no per-row Counter in the hot path."""
    toks, segs = [], []
    for s, t in zip(seg_ids, texts):
        tt = (t or "").split()
        toks.extend(tt)
        segs.extend([s] * len(tt))
    if not toks:
        return pd.DataFrame({"seg": pd.Series(dtype=np.int64), "tok": [],
                             "c": pd.Series(dtype=np.int64)})
    return (
        pd.DataFrame({"seg": np.asarray(segs, dtype=np.int64), "tok": toks})
        .groupby(["seg", "tok"], as_index=False)
        .size()
        .rename(columns={"size": "c"})
    )


def q_rouge_pairs(sf_dir: str):
    """ROUGE-1 precision/recall/F1 between each document and the NEXT
    document of the same source (a deterministic candidate/reference
    pairing with no external data): unigram multiset overlap
    Σ min(count_cand, count_ref), the Lin 2004 recall-oriented eval
    every summarization pipeline reports.

    Shape: one groupby(source) builds adjacent pairs with both texts
    carried (window-lead semantics, group stays atomic); one streaming
    map scores pairs via vectorized token-count frames merged on
    (pair, token) — integer arithmetic until the three final divisions,
    rounded on both engines."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"])

    _EMPTY = {
        "cand_id": pd.Series(dtype=np.int64), "ref_id": pd.Series(dtype=np.int64),
        "cand_text": pd.Series(dtype=object), "ref_text": pd.Series(dtype=object),
    }

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_EMPTY)
        g = g.sort_values("doc_id", kind="stable")
        ids = g["doc_id"].to_numpy()
        txt = g["text"].to_numpy()
        return pd.DataFrame(
            {"cand_id": ids[:-1], "ref_id": ids[1:],
             "cand_text": txt[:-1], "ref_text": txt[1:]}
        )

    pairs = ds.groupby("source").map_groups(pair_up, batch_format="pandas")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "cand_id": pd.Series(dtype=np.int64),
                "ref_id": pd.Series(dtype=np.int64),
                "rouge1_p": pd.Series(dtype=np.float64),
                "rouge1_r": pd.Series(dtype=np.float64),
                "rouge1_f": pd.Series(dtype=np.float64),
            })
        seg = np.arange(len(df), dtype=np.int64)
        c1 = _token_count_frame(df["cand_text"].to_numpy(), seg)
        c2 = _token_count_frame(df["ref_text"].to_numpy(), seg)
        ov = (
            c1.merge(c2, on=["seg", "tok"], suffixes=("_1", "_2"))
            .assign(m=lambda x: np.minimum(x["c_1"], x["c_2"]))
            .groupby("seg")["m"].sum()
        )
        n1 = c1.groupby("seg")["c"].sum()
        n2 = c2.groupby("seg")["c"].sum()
        ovv = ov.reindex(seg).fillna(0).to_numpy(dtype=np.float64)
        n1v = n1.reindex(seg).fillna(0).to_numpy(dtype=np.float64)
        n2v = n2.reindex(seg).fillna(0).to_numpy(dtype=np.float64)
        p = np.divide(ovv, n1v, out=np.zeros_like(ovv), where=n1v > 0)
        r = np.divide(ovv, n2v, out=np.zeros_like(ovv), where=n2v > 0)
        f = np.divide(2 * p * r, p + r, out=np.zeros_like(p), where=ovv > 0)
        return pd.DataFrame(
            {"cand_id": df["cand_id"].to_numpy(dtype=np.int64),
             "ref_id": df["ref_id"].to_numpy(dtype=np.int64),
             "rouge1_p": np.round(p, 6), "rouge1_r": np.round(r, 6),
             "rouge1_f": np.round(f, 6)}
        )

    return pairs.map_batches(score, batch_format="pandas").sort("cand_id")


SQL_ROUGE_PAIRS = """
WITH pairs AS (
  SELECT doc_id AS cand_id,
         lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref_id
  FROM documents
),
tc AS (
  SELECT doc_id, tok, count(*) AS c FROM (
    SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS tok
    FROM documents) GROUP BY doc_id, tok
),
tl AS (SELECT doc_id, sum(c) AS n FROM tc GROUP BY doc_id),
ov AS (
  SELECT p.cand_id, p.ref_id, sum(least(c1.c, c2.c)) AS ov
  FROM pairs p
  JOIN tc c1 ON c1.doc_id = p.cand_id
  JOIN tc c2 ON c2.doc_id = p.ref_id AND c2.tok = c1.tok
  GROUP BY p.cand_id, p.ref_id
),
sc AS (
  SELECT p.cand_id, p.ref_id, coalesce(ov.ov, 0) AS ov,
         coalesce(l1.n, 0) AS n1, coalesce(l2.n, 0) AS n2
  FROM pairs p
  LEFT JOIN ov ON ov.cand_id = p.cand_id
  LEFT JOIN tl l1 ON l1.doc_id = p.cand_id
  LEFT JOIN tl l2 ON l2.doc_id = p.ref_id
  WHERE p.ref_id IS NOT NULL
)
SELECT cand_id, ref_id,
  round(CASE WHEN n1 > 0 THEN ov / CAST(n1 AS DOUBLE) ELSE 0.0 END, 6) AS rouge1_p,
  round(CASE WHEN n2 > 0 THEN ov / CAST(n2 AS DOUBLE) ELSE 0.0 END, 6) AS rouge1_r,
  round(CASE WHEN ov > 0 THEN
      2.0 * (ov / CAST(n1 AS DOUBLE)) * (ov / CAST(n2 AS DOUBLE))
          / ((ov / CAST(n1 AS DOUBLE)) + (ov / CAST(n2 AS DOUBLE)))
    ELSE 0.0 END, 6) AS rouge1_f
FROM sc ORDER BY cand_id
"""


def q_distinct_ngrams(sf_dir: str):
    """Distinct-1 / Distinct-2 per source (Li et al. 2016): distinct
    n-grams over total n-grams — the standard corpus-diversity gate for
    generated/synthetic training data (a templated source scores low).

    Shape: per-batch exploded (source, n, gram) partial counts (one
    pandas groupby per batch bounds shuffle volume at the distinct-gram
    count, not the token count), one distributed per-gram sum, then a
    bounded per-(source, n) finalize."""
    ds = read_table(sf_dir, "documents", columns=["source", "text"], split=True)

    def grams(batch: pa.Table) -> pd.DataFrame:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        s_out, n_out, g_out = [], [], []
        for s, t in zip(srcs, texts):
            toks = (t or "").split()
            s_out.extend([s] * len(toks))
            n_out.extend([1] * len(toks))
            g_out.extend(toks)
            if len(toks) >= 2:
                bi = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
                s_out.extend([s] * len(bi))
                n_out.extend([2] * len(bi))
                g_out.extend(bi)
        if not g_out:
            return pd.DataFrame({"source": [], "n": pd.Series(dtype=np.int64),
                                 "gram": [], "c": pd.Series(dtype=np.int64)})
        return (
            pd.DataFrame({"source": s_out,
                          "n": np.asarray(n_out, dtype=np.int64), "gram": g_out})
            .groupby(["source", "n", "gram"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    per_gram = grouped_aggregate(
        ds.map_batches(grams, batch_format="pyarrow"),
        ["source", "n", "gram"],
        {"c": ("sum", "c")},
    )
    out = grouped_aggregate(
        per_gram,
        ["source", "n"],
        {"n_distinct": ("count", None), "n_total": ("sum", "c")},
        small_keys=True,
    ).to_pandas()
    out = out.sort_values(["source", "n"]).reset_index(drop=True)
    out["distinct_ratio"] = np.round(
        out["n_distinct"].to_numpy(dtype=np.float64)
        / out["n_total"].to_numpy(dtype=np.float64),
        6,
    )
    return out.astype({"n": np.int64, "n_distinct": np.int64, "n_total": np.int64})


SQL_DISTINCT_NGRAMS = """
WITH toks AS (
  SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
uni AS (SELECT source, 1 AS n, unnest(t) AS gram FROM toks),
bi AS (
  SELECT source, 2 AS n, t[i] || ' ' || t[i+1] AS gram
  FROM (SELECT source, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 2)
),
allg AS (SELECT * FROM uni UNION ALL SELECT * FROM bi)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_total,
       round(count(DISTINCT gram) / CAST(count(*) AS DOUBLE), 6) AS distinct_ratio
FROM allg GROUP BY source, n ORDER BY source, n
"""


# ---------------------------------------------------------------------------
# content-defined chunking dedup (rsync/LBFS-style rolling-hash cuts) —
# the storage-layer blob dedup that survives insertions, unlike
# fixed-offset blocks
# ---------------------------------------------------------------------------

_CDC_K = 8  # rolling window (chars)
_CDC_DIV = 64  # boundary condition hv % DIV == 0 → ~64-char expected chunks
_CDC_BASE = 1_000_003
_CDC_MOD = 2_147_483_647
_CDC_POWS = np.array(
    [pow(_CDC_BASE, _CDC_K - 1 - j, _CDC_MOD) for j in range(_CDC_K)], dtype=np.int64
)


def _cdc_chunks(text: str) -> list[str]:
    """Content-defined chunks: cut after char i (1-based, i < n)
    whenever the polynomial hash of chars [i-7..i] ≡ 0 mod {div} —
    boundaries depend only on local content, so a one-char insertion
    shifts ONE chunk instead of re-chunking the whole blob (the
    LBFS/rsync property).  Vectorized: one utf-32 decode, one sliding
    dot with the power vector, one flatnonzero."""
    n = len(text)
    if n < _CDC_K:
        return [text]
    codes = np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(codes, _CDC_K) @ _CDC_POWS
    ends = np.flatnonzero((wins % _CDC_MOD) % _CDC_DIV == 0) + _CDC_K
    ends = ends[ends < n]
    out, prev = [], 0
    for c in ends:
        out.append(text[prev:c])
        prev = int(c)
    out.append(text[prev:])
    return out


_cdc_chunks.__doc__ = _cdc_chunks.__doc__.format(div=_CDC_DIV)


def q_cdc_chunk_dedup(sf_dir: str):
    """Content-defined-chunking dedup report per source — the
    storage-layer dedup (rsync, LBFS, restic/borg) that splits every
    blob at content-derived boundaries and stores each distinct chunk
    once: per source, document/chunk counts, DISTINCT chunk count and
    bytes, and the dedup ratio (distinct bytes / total bytes).

    Scale shape: chunking streams (zero shuffle); distinctness is an
    exact chunk-hash-bucket reduce — a chunk lives in one bucket, so
    in-bucket distinct is global (the `data_card` geometry); the
    doc/char totals fold as exact int partials with no exchange at
    all.  Chunks shuffle as raw strings here so the DuckDB oracle can
    GROUP BY them; a production store ships (md5, nbytes) pairs — 24
    bytes per chunk — and never moves chunk bodies."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def explode(batch: pa.Table) -> pd.DataFrame:
        srcs: list[str] = []
        chunks: list[str] = []
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            cs = _cdc_chunks(t)
            srcs.extend([s] * len(cs))
            chunks.extend(cs)
        df = pd.DataFrame({"source": srcs, "chunk": chunks})
        df["__bucket"] = (
            pd.util.hash_array(df["chunk"].to_numpy(dtype=object)) % 64
        ).astype(np.int64)
        return df

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["source", "chunk"])
        return (
            d.assign(nch=d["chunk"].str.len().astype(np.int64))
            .groupby("source", as_index=False)
            .agg(n_distinct=("chunk", "size"), distinct_chars=("nch", "sum"))
        )

    distinct = grouped_aggregate(
        exploded.groupby("__bucket").map_groups(
            lambda df: bucket_distinct(df.drop(columns=["__bucket"])),
            batch_format="pandas",
        ),
        ["source"],
        {"n_distinct_chunks": ("sum", "n_distinct"),
         "distinct_chars": ("sum", "distinct_chars")},
        small_keys=True,
    ).to_pandas()

    def totals_partial(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            rows.append((s, 1, len(_cdc_chunks(t)), len(t)))
        return (
            pd.DataFrame(rows, columns=["source", "n_docs", "n_chunks", "total_chars"])
            .groupby("source", as_index=False)
            .sum()
        )

    totals = grouped_aggregate(
        ds.map_batches(totals_partial, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("sum", "n_docs"), "n_chunks": ("sum", "n_chunks"),
         "total_chars": ("sum", "total_chars")},
        small_keys=True,
    ).to_pandas()

    out = totals.merge(distinct, on="source")
    out["dedup_ratio"] = out["distinct_chars"].to_numpy(dtype=np.float64) / out[
        "total_chars"
    ].to_numpy(dtype=np.float64)
    cols = ["source", "n_docs", "n_chunks", "n_distinct_chunks",
            "total_chars", "distinct_chars", "dedup_ratio"]
    for c in cols[1:-1]:
        out[c] = out[c].astype(np.int64)
    return out[cols].sort_values("source").reset_index(drop=True)


_CDC_HV_TERMS = "\n        + ".join(
    f"CAST(unicode(substr(text, i - {_CDC_K - 1 - j}, 1)) AS BIGINT) * {int(_CDC_POWS[j])}"
    for j in range(_CDC_K)
)

SQL_CDC_CHUNK_DEDUP = f"""
WITH t AS (SELECT doc_id, source, text, length(text) AS n FROM documents),
hv AS (
  SELECT doc_id, i,
         ({_CDC_HV_TERMS}) % {_CDC_MOD} AS hv
  FROM (SELECT doc_id, text, unnest(range({_CDC_K}, n)) AS i FROM t WHERE n >= {_CDC_K})
),
cuts AS (SELECT doc_id, i FROM hv WHERE hv % {_CDC_DIV} = 0),
chars AS (
  SELECT doc_id, source, unnest(range(1, n + 1)) AS p, text
  FROM t WHERE n >= 1
),
cid AS (
  SELECT c.doc_id, c.source, c.p, substr(c.text, c.p, 1) AS ch,
         coalesce(sum(CASE WHEN cu.i IS NOT NULL THEN 1 ELSE 0 END) OVER (
           PARTITION BY c.doc_id ORDER BY c.p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM chars c LEFT JOIN cuts cu ON cu.doc_id = c.doc_id AND cu.i = c.p
),
chunks AS (
  SELECT doc_id, source, chunk_id, string_agg(ch, '' ORDER BY p) AS chunk
  FROM cid GROUP BY doc_id, source, chunk_id
),
allc AS (
  SELECT * FROM chunks
  UNION ALL
  SELECT doc_id, source, 0 AS chunk_id, text AS chunk FROM t WHERE n = 0
),
tot AS (
  SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
         sum(length(chunk)) AS total_chars
  FROM allc GROUP BY source
),
dis AS (
  SELECT source, count(*) AS n_distinct_chunks, sum(length(chunk)) AS distinct_chars
  FROM (SELECT DISTINCT source, chunk FROM allc) GROUP BY source
)
SELECT t.source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(n_distinct_chunks AS BIGINT) AS n_distinct_chunks,
       CAST(total_chars AS BIGINT) AS total_chars,
       CAST(distinct_chars AS BIGINT) AS distinct_chars,
       CAST(distinct_chars AS DOUBLE) / CAST(total_chars AS DOUBLE) AS dedup_ratio
FROM tot t JOIN dis USING (source) ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# weighted reservoir sample (Efraimidis & Spirakis 2006 A-ES), k per group
# ---------------------------------------------------------------------------

_WRES_K = 5


def q_weighted_reservoir(sf_dir: str):
    """Distributed weighted sampling-without-replacement, k={k} per
    source (Efraimidis & Spirakis 2006 A-ES): each row draws a
    deterministic md5 coin u ∈ (0, 1] and ranks by u^(1/w) — computed
    as ln(u)/w for numerical range — so the top-k per group IS an exact
    weighted sample, mergeable across any partitioning (max-k of key
    partials).  The deterministic coin (md5 of the row id — the same
    resume-safe trick as `quality_sample`) is what makes the sample
    value-oracled AND re-runnable: both engines draw the identical u,
    and ln / the integer→double cast round identically (libm on the
    same doubles).

    Scale shape: per-batch per-group top-k prefilter (bounded
    groups×k×blocks partial rows), one coalesce, final rank — the
    corpus never shuffles; weight = n_chars (floor 1)."""
    from ..stages.sketch_parity import md5_u64

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "n_chars"], split=True)

    def keyed_topk(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0)
        h = md5_u64([str(int(i)) for i in ids])
        # integer halve-then-increment BEFORE the double cast — the same
        # op order as the SQL's ((h >> 1) + 1) / 2^63, so the one
        # rounding step happens on the identical integer in both engines
        u = ((h >> np.uint64(1)) + np.uint64(1)).astype(np.float64) / 9223372036854775808.0
        df = pd.DataFrame(
            {"source": batch["source"].to_pandas(), "doc_id": ids, "key": np.log(u) / w}
        )
        return (
            df.sort_values(["source", "key", "doc_id"], ascending=[True, False, True])
            .groupby("source", sort=False)
            .head(_WRES_K)
        )

    partials = ds.map_batches(keyed_topk, batch_format="pyarrow")

    def final_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "key", "doc_id"], ascending=[True, False, True])
        df = df.groupby("source", sort=False).head(_WRES_K).reset_index(drop=True)
        df["rnk"] = df.groupby("source", sort=False).cumcount().astype(np.int64) + 1
        return df[["source", "rnk", "doc_id", "key"]]

    return partials.repartition(1).map_batches(final_rank, batch_format="pandas")


q_weighted_reservoir.__doc__ = q_weighted_reservoir.__doc__.format(k=_WRES_K)


SQL_WEIGHTED_RESERVOIR = f"""
WITH w AS (
  SELECT source, doc_id,
         ln(((md5_number_upper(CAST(doc_id AS VARCHAR)) >> 1) + 1)
            / 9223372036854775808.0)
           / greatest(n_chars, 1) AS key
  FROM documents
),
r AS (
  SELECT source, doc_id, key,
         row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id) AS rnk
  FROM w
)
SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, key
FROM r WHERE rnk <= {_WRES_K} ORDER BY source, rnk
"""


# ---------------------------------------------------------------------------
# ExactSubstr REMOVAL (Lee et al. 2022): rewrite documents with
# cross-document duplicated token spans cut out — the surgery step the
# audit (`ngram_span_dedup`) only scores
# ---------------------------------------------------------------------------

_XSR_NGRAM = 8  # duplicated-span unit (tokens), same W as the audit


def q_exact_substr_rewrite(sf_dir: str):
    """ExactSubstr removal: any {w}-token shingle present in ≥2 distinct
    documents marks its {w} tokens for removal in EVERY document; the
    rewrite keeps the uncovered tokens in order.  This is the surgical
    half of Lee et al. 2022 — where `ngram_span_dedup` scores docs and
    drops whole ones, this emits the cleaned text itself, the variant
    production corpora actually ship.

    Shape: one shingle-bucket co-partition decides cross-doc df
    (a shingle lives in one bucket, so in-bucket df is global — same
    geometry as the audit) and emits the duplicated (doc, start)
    positions; starts fold per doc into a bounded CSV list on a coarse
    doc bucket; the size-routed `tabular.join` facade brings start
    lists and text together (broadcast under budget, hash-shuffle
    above); the rebuild is a vectorized boundary-diff coverage mask —
    no per-token Python.  The shuffled keys here are raw shingle
    strings to keep the DuckDB oracle exact; at 100 TB the key becomes
    a 128-bit content hash (16 bytes, collision P≪1e-15)."""
    from .tabular import join as join_route

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def sh_pos(batch: pa.Table) -> pd.DataFrame:
        out_doc: list[np.ndarray] = []
        out_pos: list[np.ndarray] = []
        out_sh: list[str] = []
        for did, text in zip(
            batch["doc_id"].to_numpy(zero_copy_only=False), batch["text"].to_pylist()
        ):
            toks = text.split()
            n = len(toks) - _XSR_NGRAM + 1
            if n <= 0:
                continue
            out_sh.extend(" ".join(toks[i : i + _XSR_NGRAM]) for i in range(n))
            out_doc.append(np.full(n, did, dtype=np.int64))
            out_pos.append(np.arange(n, dtype=np.int64))
        if not out_sh:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64), "pos": pd.Series(dtype=np.int64),
                 "s": pd.Series(dtype=object), "__bucket": pd.Series(dtype=np.int64)}
            )
        df = pd.DataFrame(
            {"doc_id": np.concatenate(out_doc), "pos": np.concatenate(out_pos), "s": out_sh}
        )
        df["__bucket"] = (pd.util.hash_array(df["s"].to_numpy(dtype=object)) % 64).astype(
            np.int64
        )
        return df

    def dup_starts(df: pd.DataFrame) -> pd.DataFrame:
        ndocs = df.groupby("s", sort=False)["doc_id"].transform("nunique")
        return df.loc[ndocs >= 2, ["doc_id", "pos"]]

    starts = (
        ds.map_batches(sh_pos, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda df: dup_starts(df.drop(columns=["__bucket"])), batch_format="pandas")
    )

    def doc_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df["__b2"] = (df["doc_id"].to_numpy() % 64).astype(np.int32)
        return df

    def fold_lists(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(["doc_id", "pos"]).groupby("doc_id", sort=False)["pos"]
        return g.apply(lambda s: ",".join(map(str, s))).rename("starts").reset_index()

    start_lists = (
        starts.map_batches(doc_bucket, batch_format="pandas")
        .groupby("__b2")
        .map_groups(lambda df: fold_lists(df.drop(columns=["__b2"])), batch_format="pandas")
    )

    joined, _ = join_route(ds, start_lists, on="doc_id", how="left")

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = np.empty(len(df), dtype=np.int64)
        n_rm = np.empty(len(df), dtype=np.int64)
        clean: list[str] = []
        for i, (text, st) in enumerate(zip(df["text"], df["starts"])):
            toks = text.split()
            nt = len(toks)
            n_tok[i] = nt
            if not isinstance(st, str) or not st:
                n_rm[i] = 0
                clean.append(" ".join(toks))
                continue
            pos = np.fromstring(st, dtype=np.int64, sep=",")
            diff = np.zeros(nt + 1, dtype=np.int64)
            np.add.at(diff, pos, 1)
            np.add.at(diff, np.minimum(pos + _XSR_NGRAM, nt), -1)
            covered = np.cumsum(diff[:-1]) > 0
            n_rm[i] = int(covered.sum())
            kept = [t for t, c in zip(toks, covered) if not c]
            clean.append(" ".join(kept))
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy().astype(np.int64),
             "n_tokens": n_tok, "n_removed": n_rm, "clean_text": clean}
        )

    return joined.map_batches(rebuild, batch_format="pandas").sort("doc_id")


q_exact_substr_rewrite.__doc__ = q_exact_substr_rewrite.__doc__.format(w=_XSR_NGRAM)


SQL_EXACT_SUBSTR_REWRITE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(toks[i:i + {_XSR_NGRAM - 1}], ' ') AS g
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_XSR_NGRAM - 1})) AS i
        FROM t WHERE len(toks) >= {_XSR_NGRAM})
),
dup AS (SELECT g FROM sh GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
st AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup USING (g)),
tok AS (
  SELECT doc_id, unnest(generate_series(0, len(toks) - 1)) AS i, toks
  FROM t WHERE len(toks) >= 1
),
flag AS (
  SELECT tok.doc_id, tok.i, tok.toks[tok.i + 1] AS w,
         CASE WHEN st.pos IS NOT NULL THEN 1 ELSE 0 END AS f
  FROM tok LEFT JOIN st ON st.doc_id = tok.doc_id AND st.pos = tok.i
),
cov AS (
  SELECT doc_id, i, w,
         max(f) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN {_XSR_NGRAM - 1} PRECEDING AND CURRENT ROW) AS c
  FROM flag
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(c) AS n_removed,
         coalesce(string_agg(CASE WHEN c = 0 THEN w END, ' ' ORDER BY i), '') AS clean_text
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# interleaved-corpus pairing + sampling mix (MMC4 / OBELICS-style ops the
# north rule's interleaved text+media payload needs; ref has no media layer)
# ---------------------------------------------------------------------------

_CAP_W = 20  # tokens per text span (the "sentence" unit of the pairing)
_CAP_MIN_TOKENS = 5  # MMC4-style minimum caption length gate


def _caption_frame(doc_ids: np.ndarray, texts: list[str]) -> pd.DataFrame:
    """(doc_id, media_idx, cap_idx, caption, cap_tok) rows for one batch
    under the planted interleave (m = doc_id % 4 media spans, media k
    attached after text span (doc_id*(k+1)+k) % n_spans).  Mostly
    vectorized: the per-media fanout is numpy repeat/arange; only the
    final caption slice walks surviving rows (≤3 per doc)."""
    toks = [t.split() for t in texts]
    nt = np.array([len(t) for t in toks], dtype=np.int64)
    m = doc_ids % 4
    keep = (nt >= 1) & (m >= 1)
    if not keep.any():
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64), "media_idx": pd.Series(dtype=np.int64),
             "cap_idx": pd.Series(dtype=np.int64), "caption": pd.Series(dtype=object),
             "cap_tok": pd.Series(dtype=np.int64)}
        )
    idx = np.flatnonzero(keep)
    mm = m[idx]
    nsp = -(-nt[idx] // _CAP_W)  # ceil
    rep = np.repeat(np.arange(len(idx)), mm)  # local doc slot per media row
    k = np.arange(mm.sum(), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(mm)[:-1])), mm
    )
    d_rep = doc_ids[idx][rep]
    cap_idx = (d_rep * (k + 1) + k) % nsp[rep]
    df = pd.DataFrame({"doc_id": d_rep, "media_idx": k, "cap_idx": cap_idx,
                       "slot": idx[rep], "nt": nt[idx][rep]})
    # one image per span (MMC4's one-per-sentence rule): keep lowest k
    df = df.drop_duplicates(["doc_id", "cap_idx"], keep="first")
    df["cap_tok"] = np.minimum(_CAP_W, df["nt"].to_numpy() - df["cap_idx"].to_numpy() * _CAP_W)
    df = df[df["cap_tok"] >= _CAP_MIN_TOKENS]
    df["caption"] = [
        " ".join(toks[s][c * _CAP_W : (c + 1) * _CAP_W])
        for s, c in zip(df["slot"], df["cap_idx"])
    ]
    return df[["doc_id", "media_idx", "cap_idx", "caption", "cap_tok"]]


def q_caption_pairs(sf_dir: str):
    """Image-text pair extraction from an interleaved corpus — the
    MMC4 / OBELICS pairing step that turns interleaved documents into
    (media_ref, caption) training pairs: each media span pairs with the
    text span it follows, one media per span (lowest media index wins),
    captions under {mn} tokens gated out.  The media positions are
    planted closed-form (doc_id % 4 spans at (doc_id*(k+1)+k) % n_spans
    — the testdata documents carry no media column) so the WHOLE
    pairing — fanout, span arithmetic, per-span dedup, length gate,
    caption text — is value-oracled; on the real interleaved corpus the
    positions come from the extracted spans' kind/offset columns.

    Scale shape: one streaming pass, per-doc fanout bounded (≤3), no
    shuffle; output is pair rows ready for a partitioned sink."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def pairs(batch: pa.Table) -> pd.DataFrame:
        df = _caption_frame(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            batch["text"].to_pylist(),
        )
        df["media_ref"] = [
            f"img://{d}/{k}" for d, k in zip(df["doc_id"], df["media_idx"])
        ]
        return df[["doc_id", "media_idx", "media_ref", "cap_idx", "caption"]].astype(
            {"doc_id": np.int64, "media_idx": np.int64, "cap_idx": np.int64}
        )

    return ds.map_batches(pairs, batch_format="pyarrow").sort(["doc_id", "media_idx"])


q_caption_pairs.__doc__ = q_caption_pairs.__doc__.format(mn=_CAP_MIN_TOKENS)


SQL_CAPTION_PAIRS = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, toks, len(toks) AS nt,
         CAST(ceil(len(toks) / {_CAP_W}.0) AS BIGINT) AS nsp, doc_id % 4 AS m
  FROM t WHERE len(toks) >= 1 AND doc_id % 4 >= 1
),
k AS (
  SELECT doc_id, toks, nt, nsp, unnest(generate_series(0, m - 1)) AS k FROM d
),
p AS (
  SELECT doc_id, k, ((doc_id * (k + 1) + k) % nsp) AS cap_idx, toks, nt FROM k
),
dedup AS (
  SELECT doc_id, cap_idx, min(k) AS media_idx FROM p GROUP BY doc_id, cap_idx
),
cap AS (
  SELECT de.doc_id, de.media_idx, de.cap_idx,
         array_to_string(p.toks[de.cap_idx * {_CAP_W} + 1 : de.cap_idx * {_CAP_W} + {_CAP_W}], ' ') AS caption,
         least(p.nt - de.cap_idx * {_CAP_W}, {_CAP_W}) AS cap_tok
  FROM dedup de JOIN p ON p.doc_id = de.doc_id AND p.k = de.media_idx
)
SELECT doc_id, media_idx,
       'img://' || doc_id || '/' || media_idx AS media_ref, cap_idx, caption
FROM cap WHERE cap_tok >= {_CAP_MIN_TOKENS}
ORDER BY doc_id, media_idx
"""


def q_span_interleave_stats(sf_dir: str):
    """Per-source structure report for an interleaved corpus — the
    table every interleaved-dataset card publishes (OBELICS Table 1
    shape): document count, documents carrying media, total text
    spans, total media spans, and media density (media per text span).
    Same planted interleave as `caption_pairs`; integer sums reduce
    exactly (order-free), the single density division happens once per
    source row on both engines."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.array(
            [len(t.split()) for t in batch["text"].to_pylist()], dtype=np.int64
        )
        m = ids % 4
        nsp = -(-ntok // _CAP_W)
        return pd.DataFrame(
            {"source": batch["source"].to_pandas(), "n_docs": 1,
             "with_media": ((m >= 1) & (ntok >= 1)).astype(np.int64),
             "n_spans": nsp, "n_media": np.where(ntok >= 1, m, 0)}
        ).groupby("source", as_index=False).sum()

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("sum", "n_docs"), "docs_with_media": ("sum", "with_media"),
         "n_spans": ("sum", "n_spans"), "n_media": ("sum", "n_media")},
        small_keys=True,
    ).to_pandas()
    out["media_density"] = out["n_media"].to_numpy(dtype=np.float64) / out[
        "n_spans"
    ].to_numpy(dtype=np.float64)
    return out.sort_values("source").reset_index(drop=True)


SQL_SPAN_INTERLEAVE_STATS = f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
  FROM documents
),
d AS (
  SELECT source,
         CAST(ceil(nt / {_CAP_W}.0) AS BIGINT) AS nsp,
         CASE WHEN nt >= 1 THEN doc_id % 4 ELSE 0 END AS m,
         CASE WHEN nt >= 1 AND doc_id % 4 >= 1 THEN 1 ELSE 0 END AS wm
  FROM t
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(wm) AS BIGINT) AS docs_with_media,
       CAST(sum(nsp) AS BIGINT) AS n_spans,
       CAST(sum(m) AS BIGINT) AS n_media,
       CAST(sum(m) AS DOUBLE) / CAST(sum(nsp) AS DOUBLE) AS media_density
FROM d GROUP BY source ORDER BY source
"""


def q_temperature_mix(sf_dir: str):
    """Temperature-scaled sampling mix (α = 0.5, the multilingual
    up-sampling rule of mT5/XLM-R): per source, the up-sampling factor
    relative to the LARGEST source, sqrt(n_max / n_i) — how many times
    each tail domain repeats per head epoch under p_i ∝ n_i^0.5.
    Expressed pairwise against max(n) so both engines compute ONE
    sqrt of the same exact-integer ratio — no cross-source float sum
    whose addition order could differ.  Counts reduce as exact int
    partials; the domain table is dimension-bounded."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"], split=True)
    counts = grouped_aggregate(
        ds, ["source"], {"n_docs": ("count", None)}, small_keys=True
    ).to_pandas()
    n = counts["n_docs"].to_numpy(dtype=np.int64)
    counts["upsample"] = np.sqrt(n.max() / n.astype(np.float64))
    counts["n_docs"] = counts["n_docs"].astype(np.int64)
    return counts.sort_values("source").reset_index(drop=True)


SQL_TEMPERATURE_MIX = """
WITH n AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
m AS (SELECT max(n_docs) AS n_max FROM n)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       sqrt(CAST(n_max AS BIGINT) / CAST(n_docs AS DOUBLE)) AS upsample
FROM n, m ORDER BY source
"""


# ---------------------------------------------------------------------------
# round-4 sketch-parity extensions: every CMS cell and every counting-
# Bloom cell value-checked in SQL (completing the md5-keyed family that
# already covers HLL registers, SimHash bits and MinHash slots)
# ---------------------------------------------------------------------------

_CMS_SQL_D = 4  # rows (depth): error probability delta = e^-d
_CMS_SQL_W = 1024  # columns (width): overcount epsilon = e/w


def q_cms_registers(sf_dir: str):
    """EVERY Count-Min cell value-checked against SQL: the d×w register
    matrix of an md5-keyed CMS over documents' whitespace tokens, as
    (sketch_row, col, cnt) rows for the non-zero cells.

    Where `cms_rank_check` tolerance-gates the production SipHash
    sketch (stages/sketch.cms_*), this proves the CELL math — salted
    row hashing, column assignment, count accumulation — bit-exactly
    in both engines.  Linear-sketch scale shape: per-batch token
    counts fold into ≤ d·w-row partials that elementwise-sum under one
    bounded `small_keys` reduce; the corpus never shuffles and merge
    order cannot matter (CMS is a linear sketch — the property the
    production kernel's pytest checks directly)."""
    from ..stages.sketch_parity import cms_md5_partial

    ds = read_table(sf_dir, "documents", columns=["text"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        alltoks = " ".join(t or "" for t in batch["text"].to_pylist()).split()
        u, c = np.unique(np.asarray(alltoks, dtype=object), return_counts=True)
        return cms_md5_partial(u.tolist(), c, d=_CMS_SQL_D, w=_CMS_SQL_W)

    out = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["sketch_row", "col"],
        {"cnt": ("sum", "cnt")},
        small_keys=True,
    ).to_pandas()
    return out.sort_values(["sketch_row", "col"]).reset_index(drop=True).astype(
        {"sketch_row": np.int64, "col": np.int64, "cnt": np.int64}
    )


SQL_CMS_REGISTERS = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
  FROM documents
),
cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
r(sketch_row) AS (VALUES {", ".join(f"({r})" for r in range(_CMS_SQL_D))}),
cells AS (
  SELECT sketch_row,
         CAST(md5_number_upper(sketch_row || '|' || tok) % {_CMS_SQL_W} AS BIGINT) AS col,
         sum(c) AS cnt
  FROM cnt CROSS JOIN r GROUP BY sketch_row, col
)
SELECT CAST(sketch_row AS BIGINT) AS sketch_row, col, CAST(cnt AS BIGINT) AS cnt
FROM cells ORDER BY sketch_row, col
"""


_BLOOM_SQL_K = 6  # probes per key (optimal k for m/n ≈ 8.7)
_BLOOM_SQL_M = 1 << 14  # cells


def q_bloom_bits(sf_dir: str):
    """EVERY counting-Bloom cell value-checked against SQL: the k=6
    md5-keyed probe positions of each DISTINCT orders customer,
    accumulated as (bit, hits) cells.  The >0 projection is the plain
    Bloom membership vector (`bloom_point_lookup`'s production twin
    keys with SipHash and is gated behaviorally); the exact per-cell
    hit counts additionally expose collision miscounts a bit vector
    would hide.

    Scale shape: per-batch distinct keys → k md5 probes → ≤ m-row
    count partials, one bounded reduce.  Key distinctness is enforced
    globally BEFORE probing (two-level exact distinct), because a
    Bloom insert is idempotent — re-inserting a key seen in another
    batch must not double its cells."""
    from ..stages.sketch_parity import bloom_md5_partial

    ds = read_table(sf_dir, "orders", columns=["o_custkey"], split=True)

    def distinct_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays([pa.array(u, type=pa.int64())], names=["o_custkey"])

    uniq = grouped_aggregate(
        ds.map_batches(distinct_partial, batch_format="pyarrow"),
        ["o_custkey"],
        {"__n": ("count", None)},
    ).drop_columns(["__n"])

    def probe(batch: pa.Table) -> pd.DataFrame:
        keys = [str(int(v)) for v in batch["o_custkey"].to_numpy(zero_copy_only=False)]
        return bloom_md5_partial(keys, k=_BLOOM_SQL_K, m=_BLOOM_SQL_M)

    out = grouped_aggregate(
        uniq.map_batches(probe, batch_format="pyarrow"),
        ["bit"],
        {"hits": ("sum", "hits")},
        small_keys=True,
    ).to_pandas()
    return out.sort_values("bit").reset_index(drop=True).astype(
        {"bit": np.int64, "hits": np.int64}
    )


SQL_BLOOM_BITS = f"""
WITH keys AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key FROM orders),
probes(i) AS (VALUES {", ".join(f"({i})" for i in range(_BLOOM_SQL_K))}),
cells AS (
  SELECT CAST(md5_number_upper(i || '|' || key) % {_BLOOM_SQL_M} AS BIGINT) AS bit,
         count(*) AS hits
  FROM keys CROSS JOIN probes GROUP BY bit
)
SELECT bit, CAST(hits AS BIGINT) AS hits FROM cells ORDER BY bit
"""


# ---------------------------------------------------------------------------
# round-4 interleaved-corpus operators: referential integrity of media
# refs, the span-reassembly shuffle value-checked, and token-budget
# sharding with media costs — all on the same planted interleave as
# caption_pairs (doc_id % 4 media spans at (doc_id*(k+1)+k) % n_spans)
# ---------------------------------------------------------------------------

#: planted blob-store membership: blob for (doc_id, k) exists iff
#: (doc_id + 3k) % 5 != 0 — ~20% orphan refs, deterministic in SQL
_BLOB_MISSING_MOD = 5


def _media_ref_rows(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, source, k) rows — one per planted media span."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    src = np.asarray(batch["source"].to_pylist(), dtype=object)
    m = ids % 4
    rep = np.repeat(np.arange(len(ids)), m)
    k = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(m)[:-1])), m
    )
    return pd.DataFrame({"doc_id": ids[rep], "source": src[rep], "k": k})


def q_media_ref_integrity(sf_dir: str):
    return _media_ref_integrity(sf_dir)


def _media_ref_integrity(sf_dir: str, *, dim_budget: int = FK_DIM_BUDGET):
    """Referential-integrity audit of an interleaved corpus: every
    media_ref in the span stream must resolve in the blob store.  The
    refs explode from the planted interleave; the blob manifest is a
    SECOND dataset (planted membership, ~20% orphans) whose key set
    reduces through a two-level distributed distinct.

    Routing (the `_validate_orders` FK shape): at or under
    ``dim_budget`` manifest keys (bounded by 3× the doc count, known
    from footer metadata) the keyset broadcasts once and each ref
    batch runs a count-only vectorized anti-join (`pc.is_in`) — no row
    materialization, fixed-width per-source partials.  Above it the
    manifest STAYS a Dataset and the orphans come from the
    co-partitioned `shuffle_semi_filter` anti-join — both sides cross
    the wire exactly once (``dim_budget=0`` parity pytest).

    Output per source: refs, resolved, missing, and Σ(4·doc_id+k) of
    the missing refs — an identity checksum that reds the value hash if
    the WRONG refs go missing even when the count is right."""
    import os

    import pyarrow.compute as pc

    from ..sources.io import corpus_num_rows

    docs_cols = ["doc_id", "source"]
    refs = read_table(sf_dir, "documents", columns=docs_cols, split=True)
    blobs = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = corpus_num_rows(os.path.join(sf_dir, "documents.parquet"))
    use_broadcast = n_docs is not None and 3 * n_docs <= dim_budget

    def blob_keys(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % 4
        rep = np.repeat(np.arange(len(ids)), m)
        k = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(m)[:-1])), m
        )
        d = ids[rep]
        exists = (d + 3 * k) % _BLOB_MISSING_MOD != 0
        return pa.Table.from_arrays(
            [pa.array(d[exists] * 4 + k[exists], type=pa.int64())], names=["ref_key"]
        )

    manifest = grouped_aggregate(
        blobs.map_batches(blob_keys, batch_format="pyarrow"),
        ["ref_key"],
        {"__n": ("count", None)},
    ).drop_columns(["__n"])

    if use_broadcast:
        keys_bc = Broadcast(
            pa.array(manifest.to_pandas()["ref_key"].to_numpy(), type=pa.int64())
        )

        def audit(batch: pa.Table) -> pd.DataFrame:
            df = _media_ref_rows(batch)
            if df.empty:
                return pd.DataFrame(
                    {"source": pd.Series(dtype=object),
                     "n_refs": pd.Series(dtype=np.int64),
                     "n_resolved": pd.Series(dtype=np.int64),
                     "n_missing": pd.Series(dtype=np.int64),
                     "missing_key_sum": pd.Series(dtype=np.int64)}
                )
            ref_key = df["doc_id"].to_numpy() * 4 + df["k"].to_numpy()
            hit = np.asarray(
                pc.is_in(pa.array(ref_key, type=pa.int64()), value_set=keys_bc.get())
                .to_numpy(zero_copy_only=False)
            )
            df["n_refs"] = np.int64(1)
            df["n_resolved"] = hit.astype(np.int64)
            df["n_missing"] = (~hit).astype(np.int64)
            df["missing_key_sum"] = np.where(~hit, ref_key, 0).astype(np.int64)
            return df.groupby("source", as_index=False)[
                ["n_refs", "n_resolved", "n_missing", "missing_key_sum"]
            ].sum()

        out = grouped_aggregate(
            refs.map_batches(audit, batch_format="pyarrow"),
            ["source"],
            {
                "n_refs": ("sum", "n_refs"),
                "n_resolved": ("sum", "n_resolved"),
                "n_missing": ("sum", "n_missing"),
                "missing_key_sum": ("sum", "missing_key_sum"),
            },
            small_keys=True,
        ).to_pandas()
    else:
        from .tabular import shuffle_semi_filter

        def explode(batch: pa.Table) -> pa.Table:
            df = _media_ref_rows(batch)
            return pa.table(
                {
                    "source": pa.array(df["source"], type=pa.string()),
                    "ref_key": pa.array(
                        df["doc_id"].to_numpy() * 4 + df["k"].to_numpy(), type=pa.int64()
                    ),
                }
            )

        refs_x = refs.map_batches(explode, batch_format="pyarrow").materialize()
        totals = grouped_aggregate(
            refs_x, ["source"], {"n_refs": ("count", None)}, small_keys=True
        ).to_pandas()
        orphans = shuffle_semi_filter(refs_x, manifest, "ref_key", anti=True)

        def miss_partial(batch: pa.Table) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "source": batch["source"].to_pylist(),
                    "n_missing": np.int64(1),
                    "missing_key_sum": batch["ref_key"].to_numpy(zero_copy_only=False),
                }
            ).groupby("source", as_index=False).sum()

        miss = grouped_aggregate(
            orphans.map_batches(miss_partial, batch_format="pyarrow"),
            ["source"],
            {"n_missing": ("sum", "n_missing"), "missing_key_sum": ("sum", "missing_key_sum")},
            small_keys=True,
        ).to_pandas()
        out = totals.merge(miss, on="source", how="left").fillna(0)
        out["n_resolved"] = out["n_refs"] - out["n_missing"]
        out = out[["source", "n_refs", "n_resolved", "n_missing", "missing_key_sum"]]
    return out.sort_values("source").reset_index(drop=True).astype(
        {c: np.int64 for c in ["n_refs", "n_resolved", "n_missing", "missing_key_sum"]}
    )


SQL_MEDIA_REF_INTEGRITY = f"""
WITH refs AS (
  SELECT doc_id, source, unnest(generate_series(0, doc_id % 4 - 1)) AS k
  FROM documents WHERE doc_id % 4 >= 1
),
audit AS (
  SELECT source, doc_id * 4 + k AS ref_key,
         CASE WHEN (doc_id + 3 * k) % {_BLOB_MISSING_MOD} <> 0 THEN 1 ELSE 0 END AS ok
  FROM refs
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_refs,
       CAST(sum(ok) AS BIGINT) AS n_resolved,
       CAST(sum(1 - ok) AS BIGINT) AS n_missing,
       CAST(coalesce(sum(CASE WHEN ok = 0 THEN ref_key ELSE 0 END), 0) AS BIGINT)
         AS missing_key_sum
FROM audit GROUP BY source ORDER BY source
"""


_SPAN_W = 20  # text-span width; == _CAP_W (the caption family, defined below)
_RESTORE_BUCKETS = 64


def q_span_order_restore(sf_dir: str):
    """The north-star span-reassembly shuffle, value-oracled: documents
    explode into per-span rows that arrive in a planted ROTATED order
    ((s + doc_id) % n_spans), co-locate by doc through a coarse-bucket
    groupby, re-sort by byte offset inside the group, and reassemble —
    the reconstructed text's md5 must equal the md5 DuckDB computes
    from the intact document, so a reassembly that drops, duplicates or
    misorders even one span reds the value hash on every document.

    This is the flagship's reassembly contract (groupby-doc_id
    aggregate-sort over span rows) isolated as a value-checked query;
    the flagship itself proves it against reference fixtures, this
    proves it against an independent engine at corpus scale.  Scale
    shape: explode is streaming, the one shuffle is the coarse-bucket
    exchange every reassembly needs, in-bucket work is vectorized
    pandas; giant documents ride the flagship's salted two-level
    variant (stages/extract.py), not re-implemented here."""
    import hashlib

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [(t or "").split() for t in batch["text"].to_pylist()]
        nt = np.array([len(t) for t in toks], dtype=np.int64)
        keep = np.flatnonzero(nt >= 1)
        nsp = -(-nt[keep] // _SPAN_W)
        rep = np.repeat(np.arange(len(keep)), nsp)  # position within keep
        s = np.arange(int(nsp.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(nsp)[:-1])), nsp
        )
        d = ids[keep][rep]
        span_text = [
            " ".join(toks[keep[r]][si * _SPAN_W : (si + 1) * _SPAN_W])
            for r, si in zip(rep, s)
        ]
        df = pd.DataFrame(
            {
                "doc_id": d,
                "offset": s * _SPAN_W,
                "span_text": span_text,
                "arrive": (s + d) % nsp[rep],
            }
        )
        # planted shuffled arrival: rows leave this stage rotated so no
        # downstream step can rely on emission order being span order
        df = df.sort_values(["arrive", "doc_id"], kind="stable")
        df["bucket"] = (df["doc_id"].to_numpy() % _RESTORE_BUCKETS).astype(np.int32)
        return df[["doc_id", "offset", "span_text", "bucket"]]

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "offset"], kind="stable")
        out = g.groupby("doc_id", sort=True).agg(
            n_spans=("offset", "size"), restored=("span_text", " ".join)
        ).reset_index()
        out["restored_md5"] = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in out["restored"]
        ]
        return out[["doc_id", "n_spans", "restored_md5"]]

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: reassemble(df.drop(columns=["bucket"])), batch_format="pandas")
        .sort("doc_id")
    )


SQL_SPAN_ORDER_RESTORE = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(ceil(len(toks) / {_SPAN_W}.0) AS BIGINT) AS n_spans,
       md5(array_to_string(toks, ' ')) AS restored_md5
FROM t WHERE len(toks) >= 1 ORDER BY doc_id
"""


_SHARD_BUDGET = 48  # text tokens per training shard
_IMG_TOKENS = 32  # planted vision-encoder token cost per media span


def q_token_budget_shards(sf_dir: str):
    """Token-budget sharding of interleaved documents — the
    sequence-packing precursor that splits a long interleaved document
    into trainer-sized shards at SPAN boundaries, where a media span
    costs a fixed {it}-token vision-encoder budget and is glued to the
    text span it illustrates (the MMC4 pairing rule), so a shard
    boundary can never separate an image from its caption.

    Deterministic prefix-sum binning (shard = floor(cumulative cost
    before the span / {b})), not greedy fill: the bin of a span depends
    only on the doc-local prefix sum, so the assignment is
    embarrassingly parallel, resumable, and SQL-expressible — the
    at-scale reason to prefer it over stateful greedy packing (same
    trade the `pack_sequences` query documents).  Everything is
    doc-local: one streaming pass, zero shuffle, vectorized numpy +
    one pandas segment aggregate per batch.

    Output per (doc_id, shard): spans, media spans, total token cost
    (text + media)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def shards(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = np.array([len((t or "").split()) for t in batch["text"].to_pylist()],
                      dtype=np.int64)
        keep = np.flatnonzero(nt >= 1)
        if not len(keep):
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64), "shard": pd.Series(dtype=np.int64),
                 "n_spans": pd.Series(dtype=np.int64), "n_media": pd.Series(dtype=np.int64),
                 "n_tokens": pd.Series(dtype=np.int64)}
            )
        nsp = -(-nt[keep] // _SPAN_W)
        rep = np.repeat(np.arange(len(keep)), nsp)
        s = np.arange(int(nsp.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(nsp)[:-1])), nsp
        )
        d = ids[keep][rep]
        tok = np.where(s == nsp[rep] - 1, nt[keep][rep] - (nsp[rep] - 1) * _SPAN_W,
                       _SPAN_W)
        sp = pd.DataFrame({"doc_id": d, "s": s, "tok": tok})

        # planted media placement, one per span after the lowest-k rule
        m = ids[keep] % 4
        mrep = np.repeat(np.arange(len(keep)), m)
        k = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(m)[:-1])), m
        )
        md = pd.DataFrame(
            {"doc_id": ids[keep][mrep], "s": (ids[keep][mrep] * (k + 1) + k) % nsp[mrep]}
        ).drop_duplicates()
        md["has_m"] = np.int64(1)

        sp = sp.merge(md, on=["doc_id", "s"], how="left")
        sp["has_m"] = sp["has_m"].fillna(0).astype(np.int64)
        sp["cost"] = sp["tok"] + _IMG_TOKENS * sp["has_m"]
        sp = sp.sort_values(["doc_id", "s"], kind="stable")
        cum_before = sp.groupby("doc_id", sort=False)["cost"].cumsum() - sp["cost"]
        sp["shard"] = (cum_before // _SHARD_BUDGET).astype(np.int64)
        out = sp.groupby(["doc_id", "shard"], as_index=False).agg(
            n_spans=("s", "size"), n_media=("has_m", "sum"), n_tokens=("cost", "sum")
        )
        return out.astype({c: np.int64 for c in out.columns})

    return ds.map_batches(shards, batch_format="pyarrow").sort(["doc_id", "shard"])


q_token_budget_shards.__doc__ = q_token_budget_shards.__doc__.format(
    it=_IMG_TOKENS, b=_SHARD_BUDGET
)


SQL_TOKEN_BUDGET_SHARDS = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
d AS (
  SELECT doc_id, len(toks) AS nt,
         CAST(ceil(len(toks) / {_SPAN_W}.0) AS BIGINT) AS nsp, doc_id % 4 AS m
  FROM t WHERE len(toks) >= 1
),
sp AS (
  SELECT doc_id, s,
         CASE WHEN s = nsp - 1 THEN nt - (nsp - 1) * {_SPAN_W} ELSE {_SPAN_W} END AS tok
  FROM (SELECT doc_id, nt, nsp, unnest(generate_series(0, nsp - 1)) AS s FROM d)
),
media AS (
  SELECT DISTINCT doc_id, ((doc_id * (k + 1) + k) % nsp) AS s
  FROM (SELECT doc_id, nsp, unnest(generate_series(0, m - 1)) AS k FROM d WHERE m >= 1)
),
cost AS (
  SELECT sp.doc_id, sp.s,
         CASE WHEN media.s IS NOT NULL THEN 1 ELSE 0 END AS has_m,
         sp.tok + {_IMG_TOKENS} * CASE WHEN media.s IS NOT NULL THEN 1 ELSE 0 END AS c
  FROM sp LEFT JOIN media ON media.doc_id = sp.doc_id AND media.s = sp.s
),
w AS (
  SELECT doc_id, s, has_m, c,
         coalesce(sum(c) OVER (PARTITION BY doc_id ORDER BY s
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cb
  FROM cost
)
SELECT doc_id, CAST(cb // {_SHARD_BUDGET} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(has_m) AS BIGINT) AS n_media,
       CAST(sum(c) AS BIGINT) AS n_tokens
FROM w GROUP BY doc_id, shard ORDER BY doc_id, shard
"""


def q_zorder_box_rows(sf_dir: str):
    """The CONTENT half of the Z-order contract, value-oracled: read
    ONLY the footer-pruned files of the Morton-clustered lineitem
    layout (same cached layout as `zorder_prune`), apply the 2-D box
    predicate, and return exact integer aggregates of the surviving
    rows — count, Σ price (cents), Σ quantity (centi-units).

    The oracle computes the same aggregates from a FULL-TABLE scan, so
    a pruner that skips any file containing an in-box row reds the
    value hash — the completeness property `zorder_prune`'s rows-only
    (files_total, files_read) summary cannot prove.  Scale shape: the
    pruned read is a plain distributed `read_parquet` over the kept
    file list; the box filter and cent conversions are vectorized; only
    three int64 partials per block reach the driver."""
    import os

    import pyarrow.compute as pc
    import ray.data as rd

    from ..sources.zorder import prune_files

    zdir = _ensure_zorder_layout(sf_dir)
    x_box, y_box = (1000.0, 20000.0), (5.0, 20.0)
    keep = prune_files(zdir, "l_extendedprice", "l_quantity", x_box, y_box)
    pruned = rd.read_parquet(
        [os.path.join(zdir, f) for f in keep],
        columns=["l_extendedprice", "l_quantity"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        px = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        qy = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = (px >= x_box[0]) & (px <= x_box[1]) & (qy >= y_box[0]) & (qy <= y_box[1])
        return pd.DataFrame(
            {
                "k": np.zeros(1, dtype=np.int64),
                "n_rows": [np.int64(m.sum())],
                "sum_price_cents": [np.round(px[m] * 100).astype(np.int64).sum()],
                "sum_qty_centi": [np.round(qy[m] * 100).astype(np.int64).sum()],
            }
        )

    out = grouped_aggregate(
        pruned.map_batches(partial, batch_format="pyarrow"),
        ["k"],
        {
            "n_rows": ("sum", "n_rows"),
            "sum_price_cents": ("sum", "sum_price_cents"),
            "sum_qty_centi": ("sum", "sum_qty_centi"),
        },
        small_keys=True,
    ).to_pandas()
    return out.drop(columns=["k"]).astype(np.int64).reset_index(drop=True)


SQL_ZORDER_BOX_ROWS = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_price_cents,
       CAST(coalesce(sum(CAST(round(l_quantity * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_qty_centi
FROM lineitem
WHERE l_extendedprice BETWEEN 1000.0 AND 20000.0
  AND l_quantity BETWEEN 5.0 AND 20.0
"""


def q_compact_checksum(sf_dir: str):
    """The CONTENT half of the compaction contract, value-oracled: the
    24-small-file orders layout compacts (same FFD bin-packing as
    `compact_roundtrip`), the COMPACTED output is read back
    distributedly, and exact integer aggregates — row count, Σ orderkey,
    Σ totalprice (cents) — must equal a direct SQL scan of the source
    table.  Catches a compactor that drops, duplicates or truncates a
    row group, which the (files_in, files_out, rows) summary alone
    would miss whenever two mistakes cancel in the count."""
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from ..state.compact import compact_parquet

    src = _ensure_smallfiles_layout(sf_dir)
    dst = tempfile.mkdtemp(prefix="ae_compact_ck_")
    try:
        compact_parquet(src, dst, target_bytes=4 * 1024 * 1024)
        compacted = rd.read_parquet(
            [os.path.join(dst, f) for f in sorted(os.listdir(dst)) if f.endswith(".parquet")]
        )

        def partial(batch: pa.Table) -> pd.DataFrame:
            keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {
                    "k": np.zeros(1, dtype=np.int64),
                    "n_rows": [np.int64(len(keys))],
                    "sum_orderkey": [keys.astype(np.int64).sum()],
                    "sum_price_cents": [np.round(price * 100).astype(np.int64).sum()],
                }
            )

        out = grouped_aggregate(
            compacted.map_batches(partial, batch_format="pyarrow"),
            ["k"],
            {
                "n_rows": ("sum", "n_rows"),
                "sum_orderkey": ("sum", "sum_orderkey"),
                "sum_price_cents": ("sum", "sum_price_cents"),
            },
            small_keys=True,
        ).to_pandas()
        return out.drop(columns=["k"]).astype(np.int64).reset_index(drop=True)
    finally:
        shutil.rmtree(dst, ignore_errors=True)


SQL_COMPACT_CHECKSUM = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
FROM orders
"""


def _simhash_md5_hash64(texts) -> np.ndarray:
    from ..stages.sketch_parity import simhash_md5_batch

    return np.array([int(h, 16) for h in simhash_md5_batch(texts)], dtype=np.uint64)


def q_simhash_md5_pairs(sf_dir: str):
    """SimHash near-dup PAIRS value-checked against a brute-force SQL
    oracle: the banded-LSH pair miner (stages/dedup.simhash_dup_pairs —
    4-quarter pigeonhole buckets, skew-proof representative expansion,
    cross-bucket min-hamming dedupe) keyed by the md5 fingerprint twin,
    over the injected-near-dupes corpus.

    The oracle is NOT the same algorithm: DuckDB recomputes every
    fingerprint from scratch and compares ALL O(n²) pairs with
    ``bit_count(xor(a, b)) <= 3`` — the pigeonhole completeness claim
    (hamming ≤ 3 ⇒ at least one intact 16-bit quarter ⇒ the LSH path
    finds the pair) is what the value hash actually proves, on every
    scale's full pair matrix.  The rows-only `simhash_pairs` keeps the
    production SipHash kernel on the identical routing code."""
    from ..stages.dedup import simhash_dup_pairs

    pairs = simhash_dup_pairs(
        _with_injected_dupes(sf_dir), max_hamming=3, hash64_fn=_simhash_md5_hash64
    )
    out = pairs.to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True).astype(
        {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
    )


_SIMHASH_CORPUS = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
             [1 : greatest(len(list_filter(string_split_regex(text, '\\s+'),
                                           x -> x <> '')) - 2, 0)],
           ' ') AS text
  FROM documents
)"""

SQL_SIMHASH_MD5_PAIRS = f"""
WITH {_SIMHASH_CORPUS},
toks AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> ''))) AS tok
  FROM corpus
),
h AS (SELECT doc_id, md5_number_upper(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, count(*) AS n,
         {_SIMHASH_BITSUMS}
  FROM h GROUP BY doc_id
),
vals0 AS (
  SELECT doc_id,
         {_SIMHASH_ORS} AS v
  FROM bits
),
vals AS (
  SELECT c.doc_id, coalesce(va.v, 0::UBIGINT) AS v
  FROM corpus c LEFT JOIN vals0 va USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.v, b.v)) AS BIGINT) AS hamming
FROM vals a JOIN vals b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.v, b.v)) <= 3
ORDER BY id_a, id_b
"""


#: ANN gate: every variant's mean recall@10 over the 5 probe queries
#: must clear this floor.  Measured on the fixed testdata: 0.42-0.76
#: across all three scales; a routing/banding/codebook regression that
#: degrades any variant toward random (~k/n) reds the gate.
_ANN_GATE_RECALL = 0.3
_ANN_GATE_K = 10
_ANN_GATE_QUERIES = 5


def q_ann_recall_gates(sf_dir: str):
    """The ANN accuracy contract at the driver gate (the
    `hll_rank_check` pattern, applied to similarity search): all five
    approximate-NN variants — LSH broadcast-probe, LSH shuffle, IVF,
    PQ, IVF-PQ — must reach mean recall@{k} ≥ {t} against the exact
    top-k over the same {q} probe queries.  The oracle enumerates the
    variant grid with ``recall_ok = TRUE``, so a regression in ANY
    variant's routing, banding, codebook fit or refine stage reds the
    value hash — converting five rows-only pipelines into
    driver-checked components.

    The exact baseline is computed distributedly (5 query vectors
    broadcast once, per-batch top-k partials, bounded driver fold of
    ≤ 5·k·blocks candidate rows), then each variant's own query
    callable runs unchanged."""
    import os

    import pyarrow.parquet as pqt

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pqt.read_table(emb_path, columns=["vec_id", "embedding"])
    qmask = pa.compute.less(qt["vec_id"], _ANN_GATE_QUERIES)
    qsel = qt.filter(qmask)
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qsel["embedding"].to_pylist()])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qids = np.asarray(qsel["vec_id"].to_pylist(), dtype=np.int64)
    q_bc = Broadcast(qmat)
    qid_bc = Broadcast(qids)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)

    def topk_partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ q_bc.get().T  # (batch, nq)
        frames = []
        for j, qid in enumerate(qid_bc.get()):
            s = sims[:, j]
            keep = ids != qid
            order = np.argsort(-s[keep], kind="stable")[:_ANN_GATE_K]
            frames.append(pd.DataFrame(
                {"query_id": np.int64(qid), "vec_id": ids[keep][order],
                 "sim": s[keep][order]}
            ))
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    truth: dict[int, set] = {}
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        truth[int(qid)] = set(g["vec_id"].head(_ANN_GATE_K).astype(int))

    variants = {
        "knn_lsh": q_knn_lsh,
        "knn_lsh_shuffle": q_knn_lsh_shuffle,
        "knn_ivf": q_knn_ivf,
        "knn_pq": q_knn_pq,
        "knn_ivfpq": q_knn_ivfpq,
    }
    rows = []
    for name, fn in sorted(variants.items()):
        r = fn(sf_dir)
        df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
        recalls = []
        for qid in qids:
            got = set(df[df["query_id"] == qid]["vec_id"].astype(int)) - {int(qid)}
            recalls.append(len(got & truth[int(qid)]) / _ANN_GATE_K)
        rows.append((name, bool(np.mean(recalls) >= _ANN_GATE_RECALL)))
    return pd.DataFrame(rows, columns=["variant", "recall_ok"])


q_ann_recall_gates.__doc__ = q_ann_recall_gates.__doc__.format(
    k=_ANN_GATE_K, t=_ANN_GATE_RECALL, q=_ANN_GATE_QUERIES
)


SQL_ANN_RECALL_GATES = """
SELECT variant, TRUE AS recall_ok FROM (VALUES
  ('knn_ivf'), ('knn_ivfpq'), ('knn_lsh'), ('knn_lsh_shuffle'), ('knn_pq')
) AS v(variant) ORDER BY variant
"""


#: span-corruption gate band: per-source mean masked-token rate must sit
#: in [0.10, 0.25] around MASK_FRACTION=0.15 (greedy spans may overshoot
#: the per-doc budget by at most one span tail; attempts may undershoot)
_CORRUPT_RATE_LO, _CORRUPT_RATE_HI = 0.10, 0.25


def q_span_corruption_gate(sf_dir: str):
    """The T5 span-corruption contract at the driver gate: for every
    source, (a) EVERY document must reconstruct losslessly — splicing
    each sentinel's target span back into the inputs reproduces the
    original token stream exactly — and (b) the mean masked-token rate
    must sit inside [{lo}, {hi}] (the greedy draw targets
    MASK_FRACTION=0.15 per doc).  The oracle enumerates the source grid
    with both flags TRUE, so a sentinel-numbering bug, a dropped span,
    or a mask-budget regression anywhere in the corpus reds the value
    hash — converting the rows-only `span_corruption` into a
    driver-checked component.  Scale shape: the corruption kernel and
    the reconstruction check run in the SAME streaming pass; only
    fixed-width per-source count partials reduce."""
    import re

    from ..stages.denoise import span_corrupt_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source", "text"], split=True)
    sent_re = re.compile(r"<extra_id_\d+>")

    def gate_partial(batch: pa.Table) -> pd.DataFrame:
        out = span_corrupt_batch(batch.select(["doc_id", "text"]))
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        lossless = np.zeros(len(texts), dtype=np.int64)
        masked = out["n_masked"].to_numpy()
        ntok = np.zeros(len(texts), dtype=np.int64)
        for i, (orig, inp, tgt) in enumerate(
            zip(texts, out["inputs"], out["targets"])
        ):
            otoks = (orig or "").split()
            ntok[i] = len(otoks)
            spans: dict[str, list[str]] = {}
            cur = None
            for t in (tgt or "").split():
                if sent_re.fullmatch(t):
                    cur = t
                    spans[cur] = []
                elif cur is not None:
                    spans[cur].append(t)
            rebuilt: list[str] = []
            for t in (inp or "").split():
                if sent_re.fullmatch(t):
                    rebuilt.extend(spans.get(t, []))
                else:
                    rebuilt.append(t)
            lossless[i] = np.int64(rebuilt == otoks)
        return pd.DataFrame(
            {"source": srcs, "n_docs": np.int64(1), "n_lossless": lossless,
             "n_masked": masked.astype(np.int64), "n_tokens": ntok}
        ).groupby("source", as_index=False).sum()

    agg = grouped_aggregate(
        ds.map_batches(gate_partial, batch_format="pyarrow"),
        ["source"],
        {"n_docs": ("sum", "n_docs"), "n_lossless": ("sum", "n_lossless"),
         "n_masked": ("sum", "n_masked"), "n_tokens": ("sum", "n_tokens")},
        small_keys=True,
    ).to_pandas()
    rate = agg["n_masked"].to_numpy() / np.maximum(agg["n_tokens"].to_numpy(), 1)
    return pd.DataFrame(
        {"source": agg["source"],
         "lossless_ok": (agg["n_lossless"] == agg["n_docs"]).to_numpy(),
         "rate_ok": (rate >= _CORRUPT_RATE_LO) & (rate <= _CORRUPT_RATE_HI)}
    ).sort_values("source").reset_index(drop=True)


q_span_corruption_gate.__doc__ = q_span_corruption_gate.__doc__.format(
    lo=_CORRUPT_RATE_LO, hi=_CORRUPT_RATE_HI
)


SQL_SPAN_CORRUPTION_GATE = """
SELECT source, TRUE AS lossless_ok, TRUE AS rate_ok
FROM (SELECT DISTINCT source FROM documents) ORDER BY source
"""


_ES_EPOCHS = 2
_ES_BUCKETS = 64


def q_epoch_shuffle(sf_dir: str):
    """Deterministic global training shuffle, value-oracled: every
    document's exact position in each epoch's order, where the order is
    the rank of ``md5(epoch:doc_id)`` — the reproducible-epoch rule
    (same seed ⇒ same order on any cluster size, no RNG state to ship)
    that `training_order`'s iterator consumes but whose rows-only check
    can't pin.  Here DuckDB recomputes every position with
    ``row_number() OVER (ORDER BY md5, doc_id)``, so one displaced
    document anywhere in either epoch reds the value hash.

    TeraSort enumeration shape (same as `global_rank`, keyed by hash):
    the md5 key is uniform so the top-6-bit bucket boundaries are
    FIXED — no quantile pass needed; per-bucket counts (128 ints)
    prefix-sum into offsets broadcast back; one shuffle co-locates each
    bucket and an in-bucket vectorized sort assigns offset + local
    position.  Rows cross the wire once; the driver sees 128 counts."""
    from ..stages.sketch_parity import md5_u64

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def keyed(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for ep in range(_ES_EPOCHS):
            h = md5_u64([f"{ep}:{d}" for d in ids])
            frames.append(pd.DataFrame({"epoch": np.int64(ep), "doc_id": ids, "h": h}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            out["epoch"].to_numpy() * _ES_BUCKETS
            + (out["h"].to_numpy() >> np.uint64(58)).astype(np.int64)
        ).astype(np.int32)
        return out

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    counts = (
        keyed_ds.map_batches(
            lambda df: df.groupby("bucket", as_index=False).agg(n=("doc_id", "size")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("bucket")["n"]
        .sum()
        .reindex(range(_ES_EPOCHS * _ES_BUCKETS), fill_value=0)
        .to_numpy()
    )
    per_epoch = counts.reshape(_ES_EPOCHS, _ES_BUCKETS)
    offsets = np.concatenate(
        [np.concatenate(([0], np.cumsum(row)[:-1])) for row in per_epoch]
    )
    off_bc = Broadcast(offsets)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        df = df.sort_values(["h", "doc_id"], kind="stable")
        df["position"] = off_bc.get()[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["epoch", "doc_id", "position"]]

    return (
        keyed_ds.groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
        .sort(["epoch", "position"])
    )


SQL_EPOCH_SHUFFLE = f"""
WITH e(epoch) AS (VALUES {", ".join(f"({i})" for i in range(_ES_EPOCHS))}),
h AS (
  SELECT epoch, doc_id, md5_number_upper(epoch || ':' || doc_id) AS h
  FROM documents CROSS JOIN e
)
SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS BIGINT)
         AS position
FROM h ORDER BY epoch, position
"""


_ND_MD5_BUCKETS = 64


def q_near_dedup_md5(sf_dir: str):
    """END-TO-END near-dup removal, every stage value-checked in SQL —
    the full MinHash-LSH → exact-Jaccard verify → connected components
    → keep-min-id pipeline whose production twin (`near_dedup_corpus`)
    is rows-only because SipHash signatures aren't SQL-reproducible.
    Here the signatures are the md5-keyed k=8 parity kernel
    (stages/sketch_parity.minhash_md5_batch), bands are perm pairs
    (4 bands × 2 rows), and DuckDB replays EVERYTHING: signatures,
    band-equality candidates, distinct-3-gram Jaccard ≥ 0.5, transitive
    closure via a recursive CTE, min-id survivors — so the value hash
    pins the survivor SET (per-origin id sums), not just its size.

    Scale shape matches the production pipeline: banded sig rows
    bucket-shuffle once, in-bucket pair-gen is an exact-key merge,
    verify is the hash-partitioned `_verify_pairs_distributed` join
    (document text never drains to the driver), components run on the
    pair graph, and the loser filter budget-routes broadcast vs
    shuffle exactly as `near_dedup_corpus` does."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..stages.dedup import _verify_pairs_distributed
    from ..stages.graph import connected_components
    from ..stages.sketch_parity import minhash_md5_batch
    from .tabular import broadcast_semi_filter, shuffle_semi_filter

    corpus = _with_injected_dupes(sf_dir).materialize()

    def band_rows(batch: pa.Table) -> pd.DataFrame:
        long = minhash_md5_batch(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        )
        if long.empty:
            return pd.DataFrame(
                {"band": pd.Series(dtype=np.int64), "k0": pd.Series(dtype=np.int64),
                 "k1": pd.Series(dtype=np.int64), "doc_id": pd.Series(dtype=np.int64),
                 "bucket": pd.Series(dtype=np.int32)}
            )
        wide = long.pivot(index="doc_id", columns="perm", values="sig")
        frames = []
        for b in range(4):
            frames.append(pd.DataFrame(
                {"band": np.int64(b),
                 "k0": wide[2 * b].to_numpy(dtype=np.int64),
                 "k1": wide[2 * b + 1].to_numpy(dtype=np.int64),
                 "doc_id": wide.index.to_numpy(dtype=np.int64)}
            ))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            ((out["k0"].to_numpy() * 31 + out["k1"].to_numpy()) * 4
             + out["band"].to_numpy()) % _ND_MD5_BUCKETS
        ).astype(np.int32)
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band", "k0", "k1"])
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        return (
            m[["doc_id_x", "doc_id_y"]]
            .rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b"})
            .drop_duplicates()
        )

    candidates = (
        corpus.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda df: bucket_pairs(df.drop(columns=["bucket"])),
                    batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if candidates.empty:
        verified = candidates
    else:
        v = _verify_pairs_distributed(
            corpus, candidates, n=3, id_col="doc_id", text_col="text"
        )
        verified = v[v["exact_jaccard"] >= 0.5][["id_a", "id_b"]]

    if verified.empty:
        losers = np.empty(0, dtype=np.int64)
        survivors = corpus
    else:
        edges = rd.from_pandas(
            verified.rename(columns={"id_a": "src", "id_b": "dst"})
        )
        comp = connected_components(edges)
        losers_ds = comp.map_batches(
            lambda t: pa.table(
                {"doc_id": t.filter(pc.not_equal(t["node"], t["component"]))["node"]}
            ),
            batch_format="pyarrow",
        ).materialize()
        if losers_ds.count() <= NEAR_DEDUP_LOSER_BUDGET:
            losers = losers_ds.to_pandas()["doc_id"].to_numpy().astype(np.int64)
            survivors = broadcast_semi_filter(corpus, losers, "doc_id", anti=True)
        else:
            survivors = shuffle_semi_filter(corpus, losers_ds, "doc_id", anti=True)

    def origin_partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {"origin": np.where(ids < 1_000_000, "original", "mutant"),
             "n_survivors": np.int64(1), "survivor_key_sum": ids}
        )
        return df.groupby("origin", as_index=False).sum()

    out = grouped_aggregate(
        survivors.map_batches(origin_partial, batch_format="pyarrow"),
        ["origin"],
        {"n_survivors": ("sum", "n_survivors"),
         "survivor_key_sum": ("sum", "survivor_key_sum")},
        small_keys=True,
    ).to_pandas()
    return out.sort_values("origin").reset_index(drop=True).astype(
        {"n_survivors": np.int64, "survivor_key_sum": np.int64}
    )


def _near_dedup_md5_sql() -> str:
    from ..stages.sketch_parity import MINHASH_A, MINHASH_B, MINHASH_PRIME

    perm_vals = ", ".join(
        f"({j}, {a}::UBIGINT, {b}::UBIGINT)"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    band_joins = "\n    UNION\n    ".join(
        f"SELECT a.doc_id AS ia, b.doc_id AS ib FROM wide a JOIN wide b "
        f"ON a.s{2*b} = b.s{2*b} AND a.s{2*b+1} = b.s{2*b+1} AND a.doc_id < b.doc_id"
        for b in range(4)
    )
    slot_cols = ",\n         ".join(
        f"max(CASE WHEN perm = {j} THEN sig END) AS s{j}" for j in range(8)
    )
    return f"""
WITH RECURSIVE {_SIMHASH_CORPUS},
t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM corpus
),
s AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i
        FROM t WHERE len(toks) >= 3)
),
perms(perm, a, b) AS (VALUES {perm_vals}),
hashed AS (SELECT doc_id, md5_number_upper(sh) % 4294967296::UBIGINT AS h32 FROM s),
sig AS (
  SELECT doc_id, CAST(perm AS BIGINT) AS perm,
         CAST(min((a * h32 + b) % {MINHASH_PRIME}::UBIGINT) AS BIGINT) AS sig
  FROM hashed CROSS JOIN perms GROUP BY doc_id, perm
),
wide AS (
  SELECT doc_id,
         {slot_cols}
  FROM sig GROUP BY doc_id
),
cand AS (
  SELECT DISTINCT ia, ib FROM (
    {band_joins}
  )
),
sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (
  SELECT c.ia, c.ib, count(*) AS i
  FROM cand c
  JOIN s sa ON sa.doc_id = c.ia
  JOIN s sb ON sb.doc_id = c.ib AND sb.sh = sa.sh
  GROUP BY c.ia, c.ib
),
verified AS (
  SELECT i.ia, i.ib
  FROM inter i
  JOIN sizes na ON na.doc_id = i.ia
  JOIN sizes nb ON nb.doc_id = i.ib
  WHERE CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) >= 0.5
),
und AS (SELECT ia AS a, ib AS b FROM verified UNION SELECT ib, ia FROM verified),
reach(nd, m) AS (
  SELECT a, a FROM und
  UNION
  SELECT r.nd, u.b FROM reach r JOIN und u ON u.a = r.m
),
comp AS (SELECT nd AS doc_id, min(m) AS c FROM reach GROUP BY nd),
losers AS (SELECT doc_id FROM comp WHERE doc_id <> c),
surv AS (
  SELECT doc_id FROM corpus
  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
)
SELECT CASE WHEN doc_id < 1000000 THEN 'original' ELSE 'mutant' END AS origin,
       CAST(count(*) AS BIGINT) AS n_survivors,
       CAST(sum(doc_id) AS BIGINT) AS survivor_key_sum
FROM surv GROUP BY origin ORDER BY origin
"""


SQL_NEAR_DEDUP_MD5 = _near_dedup_md5_sql()


# ---------------------------------------------------------------------------
# Round-4 gates: convert the remaining rows-only families into
# driver-checked components (the `ann_recall_gates` /
# `span_corruption_gate` pattern), plus one genuinely new exact
# operator (`reach_pairs`, the horizon-bounded transitive closure that
# also serves as HyperBall's exact yardstick).
# ---------------------------------------------------------------------------

_REACH_T = 6


def _doc_graph_edges(sf_dir: str, *, names: tuple[str, str] = ("src", "dst")):
    """The deterministic SQL-derivable doc graph shared by
    `sssp_weighted` / `graph_diameter` / `random_walks`: chain edges
    i→i+1 plus md5-coin long jumps i→i+13.  Returns a Dataset with the
    requested column names."""
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows
    a, b = names

    def gen_edges(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        k1 = ids[ids + 1 < n_docs]
        coin = md5_lt_mask(batch["doc_id"], "c" + "0" * 31) & (ids + 13 < n_docs)
        k2 = ids[coin]
        return pa.table(
            {
                a: pa.array(np.concatenate([k1, k2])),
                b: pa.array(np.concatenate([k1 + 1, k2 + 13])),
            }
        )

    return ds.map_batches(gen_edges, batch_format="pyarrow")


#: edge rows under which the reach closure broadcasts the adjacency
#: once (CSR) and each SOURCE batch runs its own bounded BFS locally —
#: zero shuffles, (T+1) ints per batch on the wire.  Above it the
#: semi-naive iterate-shuffle path runs (one hash exchange per hop).
_REACH_BCAST_EDGES = 5_000_000


def q_reach_pairs(sf_dir: str):
    """Horizon-bounded transitive closure: the exact count of reachable
    (src, dst) pairs within t hops, t = 0..{T} — the neighborhood
    function HyperBall approximates, computed exactly.

    Two-tier router on the edge count (the `embedding_dup_pairs`
    shape): under {B:,} edges the adjacency broadcasts once as CSR and
    every batch of SOURCES expands its own ≤T-hop balls locally — the
    only traffic is (T+1) partial counts per batch; above it,
    `_reach_pairs_shuffle` runs the textbook distributed semi-naive
    iteration (reach ∪ (reach ⨝ edges) per hop, deduped in a src-hash
    co-partition) where nothing is driver-resident.  Both paths are
    value-oracled against a chained-CTE unroll in DuckDB; the shuffle
    path is additionally forced in pytest for parity."""
    edges_ds = _doc_graph_edges(sf_dir)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows
    # chain+jump out-degree ≤ 2 ⇒ edge count ≤ 2·n_docs, known pre-scan
    if 2 * n_docs > _REACH_BCAST_EDGES:
        return _reach_pairs_shuffle(sf_dir)

    import ray

    tabs = [t for t in ray.get(edges_ds.to_arrow_refs()) if t.num_rows]
    et = pa.concat_tables(tabs)
    src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(n_docs + 1))
    csr = Broadcast((indptr, dst))

    def balls(batch: pa.Table) -> pd.DataFrame:
        indp, nbr = csr.get()
        sizes = np.zeros(_REACH_T + 1, dtype=np.int64)
        for s in batch["doc_id"].to_numpy(zero_copy_only=False):
            visited = {int(s)}
            frontier = [int(s)]
            sizes[0] += 1
            for t in range(1, _REACH_T + 1):
                nxt = []
                for u in frontier:
                    for v in nbr[indp[u] : indp[u + 1]]:
                        vi = int(v)
                        if vi not in visited:
                            visited.add(vi)
                            nxt.append(vi)
                frontier = nxt
                sizes[t] += len(visited)
        return pd.DataFrame({"t": np.arange(_REACH_T + 1, dtype=np.int64), "n": sizes})

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    parts = ds.map_batches(balls, batch_format="pyarrow").to_pandas()
    out = parts.groupby("t", as_index=False)["n"].sum().rename(columns={"n": "n_pairs"})
    return out.sort_values("t").reset_index(drop=True).astype(np.int64)


q_reach_pairs.__doc__ = q_reach_pairs.__doc__.format(T=_REACH_T, B=_REACH_BCAST_EDGES)


def _reach_pairs_shuffle(sf_dir: str, t_max: int = _REACH_T):
    """The above-budget reach closure: one hash exchange per hop, pair
    set never driver-resident (see `q_reach_pairs`).  ``t_max`` is
    parameterized so the forced-route parity pytest can bound the
    per-hop plan-floor cost."""
    from .tabular import shuffle_join

    edges = _doc_graph_edges(sf_dir, names=("node", "nxt")).materialize()
    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def self_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(ids), "node": pa.array(ids)})

    reach = ds.map_batches(self_pairs, batch_format="pyarrow").materialize()
    counts = [(0, reach.count())]

    def step_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "node": batch["nxt"]})

    def tag(batch: pa.Table) -> pa.Table:
        h = (batch["src"].to_numpy(zero_copy_only=False) % 64).astype(np.int32)
        return batch.append_column("__b", pa.array(h))

    def distinct_group(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "node"]].drop_duplicates()

    for t in range(1, t_max + 1):
        stepped = shuffle_join(reach, edges, "node").map_batches(
            step_cols, batch_format="pyarrow"
        )
        reach = (
            reach.union(stepped)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(distinct_group, batch_format="pandas")
            .materialize()
        )
        counts.append((t, reach.count()))
    return pd.DataFrame(counts, columns=["t", "n_pairs"]).astype(np.int64)


def _reach_pairs_sql() -> str:
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
  WHERE doc_id + 1 < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, doc_id + 13 FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) < 'c'
    AND doc_id + 13 < (SELECT count(*) FROM documents)
),
r0 AS MATERIALIZED (SELECT doc_id AS src, doc_id AS nd FROM documents)"""
    ]
    for k in range(1, _REACH_T + 1):
        parts.append(
            f""",
r{k} AS MATERIALIZED (
  SELECT DISTINCT src, nd FROM (
    SELECT src, nd FROM r{k - 1}
    UNION ALL
    SELECT r.src, e.dst FROM r{k - 1} r JOIN e0 e ON e.src = r.nd
  ) AS u
)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS t,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM r{k}) AS n_pairs"
        for k in range(_REACH_T + 1)
    )
    parts.append("\n" + selects + "\nORDER BY t")
    return "".join(parts)


SQL_REACH_PAIRS = _reach_pairs_sql()


_HB_GATE_RELERR = 0.25


def q_hyperball_gate(sf_dir: str):
    """HyperBall accuracy at the driver gate: the sketch's
    neighborhood-function estimate must sit within {e:.0%} of the EXACT
    reachable-pair count at every horizon t = 0..{T}, where the exact
    side is the distributed `reach_pairs` closure (itself value-oracled
    against DuckDB).  A regression in register init, the max-merge
    sweep, or the bias-corrected estimator reds the value hash —
    converting the rows-only `graph_diameter` family into a
    driver-checked component."""
    from ..stages.hyperball import hyperball

    exact = q_reach_pairs(sf_dir).set_index("t")["n_pairs"]
    est = hyperball(
        _doc_graph_edges(sf_dir).materialize(), t_max=_REACH_T, p=8
    ).set_index("t")["n_pairs_est"]
    rows = []
    for t in range(_REACH_T + 1):
        ok = abs(float(est[t]) - float(exact[t])) <= _HB_GATE_RELERR * float(exact[t])
        rows.append((t, bool(ok)))
    return pd.DataFrame(rows, columns=["t", "est_ok"]).astype({"t": np.int64})


q_hyperball_gate.__doc__ = q_hyperball_gate.__doc__.format(
    e=_HB_GATE_RELERR, T=_REACH_T
)


SQL_HYPERBALL_GATE = f"""
SELECT CAST(t AS BIGINT) AS t, TRUE AS est_ok
FROM (VALUES {", ".join(f"({t})" for t in range(_REACH_T + 1))}) AS v(t)
ORDER BY t
"""


_BPE_GATE_MERGES = 12


class _BpeRoundtripGateStage:
    """Per-actor BPE roundtrip checker: the trained merge table arrives
    once via Broadcast, encodes memoize per distinct word, and every
    word's token sequence must concatenate back to word + '</w>'."""

    def __init__(self, merges_bc: Broadcast):
        from ..stages.bpe import _END, BpeEncodeStage

        self._st = BpeEncodeStage(merges_bc)
        self._end = _END
        self._word_ok: dict[str, bool] = {}

    def _ok(self, w: str) -> bool:
        got = self._word_ok.get(w)
        if got is None:
            got = "".join(self._st._encode_word(w)) == w + self._end
            self._word_ok[w] = got
        return got

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        ok = np.fromiter(
            (all(self._ok(w) for w in (t or "").split()) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return (
            pd.DataFrame(
                {"source": batch["source"].to_pylist(), "n_docs": np.int64(1), "n_ok": ok}
            )
            .groupby("source", as_index=False)
            .sum()
        )


def q_bpe_roundtrip_gate(sf_dir: str):
    """The BPE losslessness contract at the driver gate: train the
    merge table distributedly ({m} merges, `stages/bpe.bpe_train`),
    then EVERY document must tokenize reversibly — each word's token
    sequence concatenates back to the word + end marker — and the
    learned table must hold exactly {m} merges.  The oracle enumerates
    the source grid with per-source SQL-exact doc counts and TRUE
    flags, so a merge-application bug, a dropped merge round, or a
    word-splitting regression anywhere in the corpus reds the value
    hash — converting the rows-only `bpe_train`/`bpe_encode` pair into
    driver-checked components."""
    from ..stages.bpe import bpe_train

    ds = read_table(sf_dir, "documents", columns=["source", "text"], split=True)
    merges = bpe_train(ds, num_merges=_BPE_GATE_MERGES)
    merges_ok = len(merges) == _BPE_GATE_MERGES
    mbc = Broadcast(list(zip(merges["left"].astype(str), merges["right"].astype(str))))

    agg = grouped_aggregate(
        ds.map_batches(
            _BpeRoundtripGateStage,
            fn_constructor_args=(mbc,),
            batch_format="pyarrow",
            concurrency=(1, 4),
        ),
        ["source"],
        {"n_docs": ("sum", "n_docs"), "n_ok": ("sum", "n_ok")},
        small_keys=True,
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "source": agg["source"],
                "n_docs": agg["n_docs"].astype(np.int64),
                "lossless_ok": (agg["n_ok"] == agg["n_docs"]).to_numpy(),
                "merges_ok": np.full(len(agg), bool(merges_ok)),
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


q_bpe_roundtrip_gate.__doc__ = q_bpe_roundtrip_gate.__doc__.format(m=_BPE_GATE_MERGES)


SQL_BPE_ROUNDTRIP_GATE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS lossless_ok, TRUE AS merges_ok
FROM documents GROUP BY source ORDER BY source
"""


_UNI_GATE_MAXLEN = 5


class _UnigramRoundtripGateStage:
    """Per-actor unigram-LM checker: Viterbi segmentation of every
    distinct word must (a) concatenate back to the word and (b) score
    at least as high as the greedy longest-match segmentation (Viterbi
    optimality witnessed against a concrete rival)."""

    def __init__(self, logp_bc: Broadcast, max_len: int):
        self._logp: dict[str, float] = dict(logp_bc.get())
        self._max_len = max_len
        self._memo: dict[str, tuple[bool, bool]] = {}

    def _greedy(self, w: str):
        out, i = [], 0
        while i < len(w):
            for L in range(min(self._max_len, len(w) - i), 0, -1):
                if w[i : i + L] in self._logp:
                    out.append(w[i : i + L])
                    i += L
                    break
            else:
                return None
        return out

    def _check(self, w: str) -> tuple[bool, bool]:
        got = self._memo.get(w)
        if got is None:
            from ..stages.unigram_lm import viterbi_segment

            pieces = viterbi_segment(w, self._logp, self._max_len)
            lossless = "".join(pieces) == w
            score = sum(self._logp.get(p, -1e18) for p in pieces)
            rival = self._greedy(w)
            opt = rival is None or score >= sum(self._logp[p] for p in rival) - 1e-9
            got = (lossless, opt)
            self._memo[w] = got
        return got

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        texts = batch["text"].to_pylist()
        loss = np.zeros(len(texts), dtype=np.int64)
        opt = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            checks = [self._check(w) for w in (t or "").split()]
            loss[i] = np.int64(all(c[0] for c in checks))
            opt[i] = np.int64(all(c[1] for c in checks))
        return (
            pd.DataFrame(
                {
                    "source": batch["source"].to_pylist(),
                    "n_docs": np.int64(1),
                    "n_lossless": loss,
                    "n_opt": opt,
                }
            )
            .groupby("source", as_index=False)
            .sum()
        )


def q_unigram_roundtrip_gate(sf_dir: str):
    """The unigram-LM tokenizer contract at the driver gate: train the
    SentencePiece-style vocabulary distributedly
    (`stages/unigram_lm.unigram_lm_train`), then for EVERY document (a)
    the Viterbi segmentation of each word must concatenate back to the
    word (losslessness) and (b) its total log-prob must be ≥ the greedy
    longest-match segmentation's (optimality, witnessed against a
    concrete rival segmentation).  Per-source doc counts are SQL-exact;
    a pruning bug that drops a needed char piece, a DP off-by-one, or a
    tie-rule regression reds the value hash — converting the rows-only
    `unigram_train`/`unigram_encode` pair into driver-checked
    components."""
    from ..stages.unigram_lm import unigram_lm_train

    ds = read_table(sf_dir, "documents", columns=["source", "text"], split=True)
    vocab = unigram_lm_train(ds, vocab_size=120, rounds=3, max_len=_UNI_GATE_MAXLEN)
    lbc = Broadcast(list(zip(vocab["piece"], vocab["logp"])))

    agg = grouped_aggregate(
        ds.map_batches(
            _UnigramRoundtripGateStage,
            fn_constructor_args=(lbc, _UNI_GATE_MAXLEN),
            batch_format="pyarrow",
            concurrency=(1, 4),
        ),
        ["source"],
        {
            "n_docs": ("sum", "n_docs"),
            "n_lossless": ("sum", "n_lossless"),
            "n_opt": ("sum", "n_opt"),
        },
        small_keys=True,
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "source": agg["source"],
                "n_docs": agg["n_docs"].astype(np.int64),
                "lossless_ok": (agg["n_lossless"] == agg["n_docs"]).to_numpy(),
                "viterbi_opt_ok": (agg["n_opt"] == agg["n_docs"]).to_numpy(),
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


SQL_UNIGRAM_ROUNDTRIP_GATE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS lossless_ok, TRUE AS viterbi_opt_ok
FROM documents GROUP BY source ORDER BY source
"""


def _embedding_moment_fold(sf_dir: str):
    """One streaming pass over embeddings → (n, Σx (d,), Σx² (d,)) in
    float64 — the fixed-width partial every second-moment gate shares.
    Products are computed element-exact from the stored float32 values
    promoted to float64 (both engines do the same), so only the
    addition order differs between Ray and DuckDB."""
    from ..stages.similarity import _as_matrix

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _as_matrix(batch["embedding"])
        return pd.DataFrame(
            [{"n": float(X.shape[0]), "sx": X.sum(axis=0), "sxx": (X * X).sum(axis=0)}]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    sx = np.sum([np.asarray(p["sx"]) for p in parts], axis=0)
    sxx = np.sum([np.asarray(p["sxx"]) for p in parts], axis=0)
    return n, sx, sxx


def _kmeans_inertia(ds, cents: np.ndarray) -> float:
    """Σ min-squared-distance to ``cents`` — one streaming pass, one
    float per batch on the wire."""
    from ..stages.similarity import _as_matrix

    bc = Broadcast(cents)

    def part(batch: pa.Table) -> pd.DataFrame:
        X = _as_matrix(batch["embedding"])
        c = bc.get()
        d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pd.DataFrame({"s": [float(d2.min(axis=1).sum())]})

    return float(ds.map_batches(part, batch_format="pyarrow").to_pandas()["s"].sum())


_KMG_K, _KMG_ITERS, _KMG_SEED = 8, 8, 17


def q_kmeans_quality_gate(sf_dir: str):
    """The Lloyd's-iteration contract at the driver gate: the fitted
    k-means objective must (a) not exceed the inertia at the seeded
    initial centroids (each Lloyd sweep is non-increasing) and (b) beat
    the trivial one-cluster solution, whose inertia — the corpus' total
    sum of squared deviations — DuckDB recomputes independently from the
    embeddings table (per-dim Σv² − (Σv)²/n) and the gate checks against
    with a RELATIVE tolerance folded into a boolean (`ss_agree_ok`):
    the Ray per-batch fold and DuckDB's unnest-sum add float64 in
    different orders, so shipping a rounded float into the bit-exact
    hash could flip spuriously at a 0.005 boundary (round-4 advice).
    A centroid-update bug, a wrong assignment kernel, or a seeding
    regression reds the value hash — converting the rows-only
    `kmeans_clusters` family into a driver-checked component."""
    from ..stages.clustering import _init_centroids, kmeans_fit

    ds = read_table(
        sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True
    ).materialize()
    n, sx, sxx = _embedding_moment_fold(sf_dir)
    one_cluster_ss = float((sxx - sx * sx / n).sum())
    # independent recompute with DuckDB's own addition order, compared
    # under a relative tolerance ON THE DRIVER — the boolean crosses the
    # bit-exact hash, the float never does
    import os

    import duckdb

    sql_ss = float(
        duckdb.sql(
            "WITH ud AS (SELECT CAST(unnest(embedding) AS DOUBLE) AS v, "
            "generate_subscripts(embedding, 1) AS d FROM "
            f"read_parquet('{os.path.join(sf_dir, 'embeddings.parquet')}')) "
            "SELECT sum(ss) FROM (SELECT d, sum(v*v) - sum(v)*sum(v)/count(*) AS ss "
            "FROM ud GROUP BY d)"
        ).fetchone()[0]
    )
    cents0 = _init_centroids(ds, _KMG_K, id_col="vec_id", vec_col="embedding", seed=_KMG_SEED)
    cents = kmeans_fit(ds, _KMG_K, iters=_KMG_ITERS, seed=_KMG_SEED, cache=False)
    inertia0 = _kmeans_inertia(ds, cents0)
    inertia = _kmeans_inertia(ds, cents)
    return pd.DataFrame(
        [
            {
                "n_vecs": np.int64(n),
                "ss_agree_ok": bool(
                    abs(one_cluster_ss - sql_ss) <= 1e-9 * max(abs(sql_ss), 1.0)
                ),
                "monotone_ok": bool(inertia <= inertia0 + 1e-6),
                "beats_single_cluster_ok": bool(inertia <= one_cluster_ss + 1e-6),
            }
        ]
    )


SQL_KMEANS_QUALITY_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS ss_agree_ok,
       TRUE AS monotone_ok, TRUE AS beats_single_cluster_ok
FROM embeddings
"""


def q_pca_gate(sf_dir: str):
    """The PCA spectral contract at the driver gate: the fitted top-2
    components must be (a) orthonormal (‖CCᵀ − I‖∞ < 1e-8), (b)
    variance-ordered (λ₁ ≥ λ₂ ≥ 0), and (c) DOMINANT — their explained
    variance must be at least the best any 2 RAW coordinates achieve
    (the Rayleigh-quotient optimality of eigenvectors, witnessed
    against the top-2 diagonal entries of the covariance).  A sign/
    normalization bug, a moment-pass error, or a sorted-eigenvalue
    regression reds the value hash — converting the rows-only
    `pca_project` into a driver-checked component."""
    from ..stages.clustering import pca_fit

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    mean, comps = pca_fit(ds, n_components=2)
    n, sx, sxx_diag = _embedding_moment_fold(sf_dir)
    # full second-moment matrix for the quadratic forms (d×d, one pass)
    from ..stages.similarity import _as_matrix

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = _as_matrix(batch["embedding"])
        d = X.shape[1]
        return pd.DataFrame([{"n": float(X.shape[0]), "sum_xxt": (X.T @ X).reshape(d * d)}])

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    sum_xxt = np.sum([np.asarray(p["sum_xxt"]) for p in parts], axis=0)
    d = sx.shape[0]
    cov = sum_xxt.reshape(d, d) / n - np.outer(mean, mean)
    gram = comps @ comps.T
    orthonormal_ok = bool(np.abs(gram - np.eye(2)).max() < 1e-8)
    ev = np.diag(comps @ cov @ comps.T)
    ordered_ok = bool(ev[0] >= ev[1] - 1e-12 and ev[1] >= -1e-9)
    coord_top2 = np.sort(np.diag(cov))[-2:].sum()
    dominance_ok = bool(ev.sum() >= coord_top2 - 1e-9)
    return pd.DataFrame(
        [
            {
                "n_vecs": np.int64(n),
                "orthonormal_ok": orthonormal_ok,
                "ordered_ok": ordered_ok,
                "dominance_ok": dominance_ok,
            }
        ]
    )


SQL_PCA_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS orthonormal_ok,
       TRUE AS ordered_ok, TRUE AS dominance_ok
FROM embeddings
"""


_SDG_K, _SDG_THR = 8, 0.97


def q_semantic_dedup_gate(sf_dir: str):
    """The SemDeDup output contract at the driver gate, checked
    per-cluster against the raw vectors: (a) PARTITION — every vector
    gets exactly one keep/drop verdict (count is SQL-exact), (b)
    INDEPENDENCE — no two KEPT vectors in the same cluster exceed the
    cosine threshold, and (c) COVER — every DROPPED vector has a kept
    same-cluster vector above it.  The check co-partitions verdicts
    with vectors on vec_id and re-derives the cosines inside each
    cluster group — same geometry as the dedup itself, nothing
    driver-resident but three counters.  A greedy-order bug, a
    normalization slip, or a cluster-assignment drift reds the value
    hash — converting the rows-only `semantic_dedup` into a
    driver-checked component."""
    from ..stages.clustering import semantic_dedup
    from .tabular import shuffle_join

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    n_vecs = read_table_arrow(sf_dir, "embeddings", columns=["vec_id"]).num_rows
    verdicts = semantic_dedup(ds, k=_SDG_K, threshold=_SDG_THR, iters=8, seed=17)
    joined = shuffle_join(ds, verdicts, "vec_id")

    def check(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1, norms)
        keep = g["keep"].to_numpy(dtype=bool)
        km, dm = mat[keep], mat[~keep]
        iv = 0
        if km.shape[0] >= 2:
            s = km @ km.T
            np.fill_diagonal(s, 0.0)
            iv = int((s > _SDG_THR).sum() // 2)
        if dm.shape[0]:
            cv = (
                int((np.max(dm @ km.T, axis=1) <= _SDG_THR).sum())
                if km.shape[0]
                else len(dm)
            )
        else:
            cv = 0
        return pd.DataFrame([{"n": len(g), "iv": iv, "cv": cv}])

    parts = (
        joined.groupby("cluster").map_groups(check, batch_format="pandas").to_pandas()
    )
    return pd.DataFrame(
        [
            {
                "n_vecs": np.int64(n_vecs),
                "partition_ok": bool(parts["n"].sum() == n_vecs),
                "independent_ok": bool(parts["iv"].sum() == 0),
                "cover_ok": bool(parts["cv"].sum() == 0),
            }
        ]
    )


SQL_SEMANTIC_DEDUP_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS partition_ok,
       TRUE AS independent_ok, TRUE AS cover_ok
FROM embeddings
"""


def q_isotonic_gate(sf_dir: str):
    """The PAV contract at the driver gate: the pooled isotonic fit
    must (a) be strictly increasing across blocks (exact
    cross-multiplied integer rates), (b) conserve mass — block (n,
    n_pos) totals equal the SQL-EXACT event and purchase counts — and
    (c) not fit worse than the best constant predictor (SSE refinement
    bound, exact integer algebra).  A pooling-order bug, a lost bucket,
    or a rate-comparison float slip reds the value hash — converting
    the rows-only `isotonic_calibration` into a driver-checked
    component."""
    buckets = _isotonic_buckets(sf_dir)
    blocks = pav_blocks(
        buckets["s"].to_numpy(np.int64),
        buckets["n"].to_numpy(np.int64),
        buckets["pos"].to_numpy(np.int64),
    )
    bn = np.array([b[2] for b in blocks], dtype=np.int64)
    bp = np.array([b[3] for b in blocks], dtype=np.int64)
    monotone_ok = bool(
        all(
            bp[i] * bn[i + 1] < bp[i + 1] * bn[i]
            for i in range(len(blocks) - 1)
        )
    )
    total_n = int(buckets["n"].sum())
    total_pos = int(buckets["pos"].sum())
    mass_ok = bool(bn.sum() == total_n and bp.sum() == total_pos)
    # SSE over 0/1 outcomes: per block pos − pos²/n; constant predictor
    # P − P²/N.  The isotonic fit refines the constant fit ⇒ ≤.
    sse_fit = float((bp - bp.astype(np.float64) ** 2 / bn).sum())
    sse_const = float(total_pos - total_pos**2 / total_n)
    return pd.DataFrame(
        [
            {
                "total_n": np.int64(total_n),
                "total_pos": np.int64(total_pos),
                "monotone_ok": monotone_ok,
                "mass_ok": mass_ok,
                "sse_ok": bool(sse_fit <= sse_const + 1e-9),
            }
        ]
    )


SQL_ISOTONIC_GATE = """
SELECT CAST(count(*) AS BIGINT) AS total_n,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS total_pos,
       TRUE AS monotone_ok, TRUE AS mass_ok, TRUE AS sse_ok
FROM events
"""


def q_training_order_gate(sf_dir: str):
    """The training-iterator contract at the driver gate: one full
    epoch of `pipelines/training.iter_training_batches` must visit
    EVERY document exactly once (permutation over the SQL-exact corpus
    count), the same seed must reproduce the identical order, and a
    different seed must produce a different one.  A shuffle-buffer
    off-by-one, a dropped trailing batch, or a seed-plumbing bug reds
    the value hash — converting the rows-only `training_order` into a
    driver-checked component (the ORDER itself is already value-pinned
    by `epoch_shuffle`)."""
    from .training import iter_training_batches

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    all_ids = np.sort(
        read_table_arrow(sf_dir, "documents", columns=["doc_id"])["doc_id"].to_numpy()
    )

    def epoch_ids(seed: int) -> list[int]:
        out: list[int] = []
        for b in iter_training_batches(
            ds, batch_size=256, seed=seed, epochs=1, shuffle_buffer=512
        ):
            out.extend(b["doc_id"].to_pylist())
        return out

    a, b, c = epoch_ids(42), epoch_ids(42), epoch_ids(43)
    return pd.DataFrame(
        [
            {
                "n_docs": np.int64(len(all_ids)),
                "permutation_ok": bool(np.array_equal(np.sort(np.asarray(a)), all_ids)),
                "reproducible_ok": bool(a == b),
                # degenerate corpora can't witness seed divergence: n<2
                # has ONE permutation, so a != c would red with no bug
                "seeds_differ_ok": bool(len(all_ids) < 2 or a != c),
            }
        ]
    )


SQL_TRAINING_ORDER_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS permutation_ok,
       TRUE AS reproducible_ok, TRUE AS seeds_differ_ok
FROM documents
"""


def q_quality_classifier_gate(sf_dir: str):
    """The trained-classifier contract at the driver gate: the
    distributed full-batch logistic fit must (a) end with lower
    log-loss than the zero-weight start (n·ln 2 — convex descent
    actually descended) and (b) classify the training corpus at least
    as well as the majority-class baseline.  Label counts are
    SQL-exact.  A gradient-sign bug, a feature-scaling regression, or
    a broadcast-weights mixup reds the value hash — converting the
    rows-only `quality_classifier` into a driver-checked component.

    This gate caught a real bug when written: the fit originally ran on
    RAW features, where lr 0.5 exceeds the GD stability bound and the
    loss DIVERGED to 4× chance (accuracy below the majority baseline at
    sf0.1) — the standardizer pass now shared with
    `q_quality_classifier` is the fix."""
    import pyarrow.compute as pc

    from ..stages.logreg import logreg_fit, logreg_score

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"], split=True)

    def labels(batch: pa.Table) -> np.ndarray:
        return pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False).astype(np.float64)

    feats = _quality_feature_standardizer(ds)
    w = logreg_fit(ds, feats, labels, d=3, iters=24, lr=0.5)
    scored = logreg_score(ds, w, feats)

    def partial(batch: pa.Table) -> pd.DataFrame:
        p = np.clip(batch["p"].to_numpy(zero_copy_only=False), 1e-12, 1 - 1e-12)
        y = pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False).astype(np.float64)
        loss = float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).sum())
        correct = int(((p >= 0.5) == (y == 1.0)).sum())
        return pd.DataFrame(
            [{"n": len(p), "n_en": float(y.sum()), "correct": correct, "loss": loss}]
        )

    parts = scored.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    n_en = int(parts["n_en"].sum())
    correct = int(parts["correct"].sum())
    loss = float(parts["loss"].sum())
    baseline = max(n_en, n - n_en)
    return pd.DataFrame(
        [
            {
                "n_docs": np.int64(n),
                "n_en": np.int64(n_en),
                "loss_ok": bool(loss <= n * np.log(2.0) + 1e-6),
                "acc_ok": bool(correct >= baseline),
            }
        ]
    )


SQL_QUALITY_CLASSIFIER_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
       TRUE AS loss_ok, TRUE AS acc_ok
FROM documents
"""


_RAG_GATE_K = 5


def q_rag_recall_gate(sf_dir: str):
    """The RAG known-item retrieval contract at the driver gate: three
    probe queries are the EXACT texts of indexed chunks (the first
    three in (doc_id, chunk_idx) order), so each query's embedding is
    identical to its chunk's (deterministic encoder, cosine 1 against
    near-orthogonal hash-vector noise) — the IVF-PQ search MUST return
    the chunk's own vec_id in its top-{k}.  A routing bug (query probes
    the wrong coarse list), a codebook/LUT sign error, or a vec_id
    plumbing slip reds the value hash — converting the rows-only
    `rag_index_search` composite into a driver-checked component.

    (Rank-based recall vs an exact baseline is deliberately NOT the
    contract here: the stand-in hash encoder gives near-orthogonal
    chunk vectors, so non-identical neighbors are statistical ties that
    no quantized index can rank stably at corpus scale.)"""
    from ..pipelines.eval import _HashEncoder
    from ..stages.clustering import kmeans_fit
    from ..stages.pq import knn_ivfpq, pq_fit

    probes = (
        q_chunk_documents(sf_dir)
        .sort(["doc_id", "chunk_idx"])
        .limit(3)
        .to_pandas()
    )
    targets = (
        probes["doc_id"].to_numpy(dtype=np.int64) * 1_000_000
        + probes["chunk_idx"].to_numpy(dtype=np.int64)
    )
    vecs = _rag_chunk_vectors(sf_dir)
    coarse = kmeans_fit(vecs, 8, iters=3, cache=False)
    books = pq_fit(vecs, m=8, ksub=16, iters=3, coarse=coarse)
    enc = _HashEncoder(_RAG_DIM)
    queries = enc.encode(list(probes["chunk_text"]))
    got = knn_ivfpq(
        vecs, queries, np.arange(3), k=_RAG_GATE_K, nprobe=4,
        index=(coarse, books), refine=4,
    ).to_pandas()
    rows = []
    for qid in range(3):
        hits = set(got[got["query_id"] == qid]["vec_id"].astype(int))
        rows.append((qid, bool(int(targets[qid]) in hits)))
    return pd.DataFrame(rows, columns=["query_id", "self_hit_ok"]).astype(
        {"query_id": np.int64}
    )


q_rag_recall_gate.__doc__ = q_rag_recall_gate.__doc__.format(k=_RAG_GATE_K)


SQL_RAG_RECALL_GATE = """
SELECT CAST(q AS BIGINT) AS query_id, TRUE AS self_hit_ok
FROM (VALUES (0), (1), (2)) AS v(q) ORDER BY query_id
"""


def q_incremental_dedup_gate(sf_dir: str):
    """The incremental-index completeness contract at the driver gate:
    the persisted-minhash-index path (`write_minhash_index` →
    `minhash_dedup_incremental`, hive-pruned partitions, new×old only)
    must surface EXACTLY the cross-snapshot candidate pairs the
    one-shot `minhash_candidates` finds on the full corpus with the
    same (k, bands, seed) — the index can neither lose a band collision
    (pruning too hard) nor invent one.  The new-snapshot doc count is
    SQL-exact.  Converts the rows-only `incremental_dedup` into a
    driver-checked component."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from ..stages.dedup import (
        minhash_candidates,
        minhash_dedup_incremental,
        write_minhash_index,
    )

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def parity(p: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), p))

        return f

    hist = ds.map_batches(parity(0), batch_format="pyarrow")
    new = ds.map_batches(parity(1), batch_format="pyarrow")
    idx = tempfile.mkdtemp(prefix="ae_mh_gate_idx_")
    try:
        write_minhash_index(hist, idx)
        inc = minhash_dedup_incremental(new, idx, threshold=0.0)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    inc_pairs = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(inc["id_new"], inc["id_old"])
    }
    cands = minhash_candidates(ds)
    cross = {
        (min(int(a), int(b)), max(int(a), int(b)))
        for a, b in zip(cands["id_a"], cands["id_b"])
        if (int(a) ^ int(b)) & 1
    }
    n_new = int(
        pc.sum(
            pc.bit_wise_and(
                read_table_arrow(sf_dir, "documents", columns=["doc_id"])["doc_id"], 1
            )
        ).as_py()
        or 0
    )
    return pd.DataFrame(
        [{"n_new_docs": np.int64(n_new), "candidates_equal_ok": bool(inc_pairs == cross)}]
    )


SQL_INCREMENTAL_DEDUP_GATE = """
SELECT CAST(count(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS n_new_docs,
       TRUE AS candidates_equal_ok
FROM documents
"""


def q_boilerplate_gate(sf_dir: str):
    """The boilerplate-classifier contract at the driver gate, checked
    against PLANTED ground truth in the synthetic interleaved corpus
    (sources/synth._BOILER): the nav bar ('home about x') and the
    footer ('© site …') must NEVER classify as content, and every
    long anchor-free block must NEVER classify as boilerplate —
    end-to-end through segmentation, link-density scoring and
    short-block inheritance.  One streaming pass, three counters on
    the wire.  Converts the rows-only `boilerplate_strip` into a
    driver-checked component."""
    import os

    import ray.data as rd

    from ..sources.synth import ensure_corpus_parquet
    from ..stages.boilerplate import SHORT_BLOCK_CHARS, classify_blocks, segment_blocks

    n_docs = _boiler_corpus_docs(sf_dir)
    corpus = ensure_corpus_parquet("/tmp/ae_corpora", n_docs, 42)
    ds = rd.read_parquet(str(corpus), columns=["doc_id", "spans"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        nav_viol = footer_viol = plain_viol = 0
        for spans in batch["spans"].to_pylist():
            for sp in spans or []:
                if sp.get("kind") != "html":
                    continue
                for blk in classify_blocks(segment_blocks(sp.get("text") or "")):
                    content = blk["label"] == "content"
                    if blk["text"] == "home about x" and content:
                        nav_viol += 1
                    if "© site" in blk["text"] and content:
                        footer_viol += 1
                    if (
                        blk["n_chars"] >= SHORT_BLOCK_CHARS
                        and blk["link_density"] == 0.0
                        and not content
                    ):
                        plain_viol += 1
        return pd.DataFrame(
            [{"nav_viol": nav_viol, "footer_viol": footer_viol, "plain_viol": plain_viol}]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        [
            {
                "nav_boiler_ok": bool(parts["nav_viol"].sum() == 0),
                "footer_boiler_ok": bool(parts["footer_viol"].sum() == 0),
                "long_plain_content_ok": bool(parts["plain_viol"].sum() == 0),
            }
        ]
    )


SQL_BOILERPLATE_GATE = """
SELECT TRUE AS nav_boiler_ok, TRUE AS footer_boiler_ok,
       TRUE AS long_plain_content_ok
"""


def q_pretokenize_gate(sf_dir: str):
    """The make-a-training-set composition at the driver gate: the
    per-source SURVIVOR COUNTS of `pretokenize_corpus`'s curation
    prefix are recomputed EXACTLY in SQL (the `curate_corpus` CTE chain
    up to the per-source cap), and the distributed prefix scan's
    ``cum_before`` must equal a driver-side per-source cumsum of the
    same (doc_id-ordered) BPE token counts.  A lost survivor anywhere
    in the four curation stages, or a mis-bucketed scan partial, reds
    the value hash — converting the rows-only `pretokenize_corpus`
    composite into a driver-checked component."""
    out = q_pretokenize_corpus(sf_dir)
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    df = df.sort_values(["source", "doc_id"]).reset_index(drop=True)
    prefix_ok = True
    for _, g in df.groupby("source", sort=False):
        want = g["n_tok"].cumsum().shift(fill_value=0).to_numpy()
        if not np.array_equal(want, g["cum_before"].to_numpy()):
            prefix_ok = False
            break
    agg = df.groupby("source", as_index=False).agg(n_docs=("doc_id", "size"))
    return pd.DataFrame(
        {
            "source": agg["source"],
            "n_docs": agg["n_docs"].astype(np.int64),
            "prefix_ok": np.full(len(agg), bool(prefix_ok)),
        }
    ).sort_values("source").reset_index(drop=True)


SQL_PRETOKENIZE_GATE = (
    SQL_CURATE[: SQL_CURATE.index("packed AS")]
    + """surv AS (SELECT source FROM capped)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs, TRUE AS prefix_ok
FROM surv GROUP BY source ORDER BY source
"""
)


def q_qa_extract_gate(sf_dir: str):
    """The QA extraction plumbing contract at the driver gate: for both
    QA variants — the char-window first-hit extractor (`qa_extract`)
    and the token-sub-window joint-argmax head (`qa_token_extract`) —
    every produced answer must be a SUBSTRING of its own source
    document (window offsets recovered correctly ⇒ text can only come
    from the doc; a char-offset or sentinel bug yields out-of-document
    text).  Per-source doc counts are SQL-exact."""
    char_df = q_qa_extract(sf_dir).to_pandas()
    tok_df = q_qa_token_extract(sf_dir).to_pandas()
    docs = read_table_arrow(sf_dir, "documents", columns=["doc_id", "source", "text"])
    dd = docs.to_pandas().set_index("doc_id")

    def in_doc(frame: pd.DataFrame) -> pd.Series:
        ok = []
        for did, ans in zip(frame["doc_id"], frame["answer"]):
            t = dd.loc[did, "text"] or ""
            ok.append(ans is None or ans == "" or ans in t)
        return pd.Series(ok, index=frame["doc_id"].to_numpy())

    char_ok = in_doc(char_df)
    tok_ok = in_doc(tok_df)
    src = dd["source"]
    out = pd.DataFrame(
        {
            "source": src.loc[char_ok.index].to_numpy(),
            "n_docs": np.int64(1),
            "c_ok": char_ok.to_numpy().astype(np.int64),
            # a doc_id coverage mismatch between the two extractors must
            # RED the gate (fillna(False)), not crash an opaque astype
            # on NaN; duplicated ids are collapsed before the reindex
            "t_ok": (
                tok_ok[~tok_ok.index.duplicated()]
                .reindex(char_ok.index)
                .fillna(False)
                .to_numpy()
                .astype(np.int64)
            ),
        }
    ).groupby("source", as_index=False).sum()
    return pd.DataFrame(
        {
            "source": out["source"],
            "n_docs": out["n_docs"].astype(np.int64),
            "char_answers_ok": (out["c_ok"] == out["n_docs"]).to_numpy(),
            "token_answers_ok": (out["t_ok"] == out["n_docs"]).to_numpy(),
        }
    ).sort_values("source").reset_index(drop=True)


SQL_QA_EXTRACT_GATE = """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS char_answers_ok, TRUE AS token_answers_ok
FROM documents GROUP BY source ORDER BY source
"""


def q_eval_semantic_gate(sf_dir: str):
    """The semantic-eval scoring contract at the driver gate, with
    PLANTED identical pairs: even doc_ids get predicted == true (the
    encoder must score cosine distance exactly 0 — per-actor cache and
    all), odd doc_ids get a truncated prediction (distance must be
    strictly positive for differing strings), and every distance must
    sit in [0, 2].  Doc count is SQL-exact.  Converts the rows-only
    `eval_semantic` family into a driver-checked component.  Only the
    encoder stage runs (char metrics are value-oracled separately by
    `eval_char_metrics` — recomputing Levenshtein on full documents
    here would be O(len²) dead weight)."""
    from .eval import EvalEncoderStage

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"], split=True)

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = [t or "" for t in batch["text"].to_pylist()]
        preds = [
            t if i % 2 == 0 else " ".join(t.split()[:-1])
            for i, t in zip(ids, texts)
        ]
        return pa.Table.from_arrays(
            [
                pa.array(["m1"] * len(ids)),
                batch["lang"],
                pa.array(ids),
                pa.array(texts, type=pa.string()),
                pa.array(preds, type=pa.string()),
            ],
            names=["model", "category", "idx", "true", "predicted"],
        )

    scored = ds.map_batches(pairs, batch_format="pyarrow").map_batches(
        EvalEncoderStage,
        fn_constructor_kwargs={"backend": "fake"},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def check(batch: pa.Table) -> pd.DataFrame:
        d = batch["cosine_distance"].to_numpy(zero_copy_only=False)
        same = np.array(
            [a == b for a, b in zip(batch["true"].to_pylist(), batch["predicted"].to_pylist())]
        )
        return pd.DataFrame(
            [
                {
                    "n": len(d),
                    "ident_viol": int((np.abs(d[same]) > 1e-12).sum()),
                    "diff_viol": int((d[~same] <= 1e-12).sum()),
                    "bound_viol": int(((d < -1e-9) | (d > 2.0 + 1e-9)).sum()),
                }
            ]
        )

    parts = scored.map_batches(check, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        [
            {
                "n_docs": np.int64(parts["n"].sum()),
                "ident_zero_ok": bool(parts["ident_viol"].sum() == 0),
                "nonident_pos_ok": bool(parts["diff_viol"].sum() == 0),
                "bounds_ok": bool(parts["bound_viol"].sum() == 0),
            }
        ]
    )


SQL_EVAL_SEMANTIC_GATE = """
SELECT CAST(count(*) AS BIGINT) AS n_docs, TRUE AS ident_zero_ok,
       TRUE AS nonident_pos_ok, TRUE AS bounds_ok
FROM documents
"""


def q_incremental_ingest_gate(sf_dir: str):
    """The incremental-ingestion ledger contract at the driver gate:
    across the two drops + noop replay of `incremental_ingest`, (a) the
    noop step must ingest nothing, (b) snapshot versions must advance
    only when new shards arrive, and (c) the cumulative snapshot row
    count must equal the sum of the ingested deltas (nothing dropped,
    nothing double-counted by the manifest resume).  Converts the
    rows-only `incremental_ingest` lifecycle into a driver-checked
    component (bit-exact final-state parity vs a from-scratch run is
    pytest-verified)."""
    led = q_incremental_ingest(sf_dir)
    led = led if isinstance(led, pd.DataFrame) else led.to_pandas()
    led = led.set_index("step")
    noop_ok = bool(
        led.loc["noop", "new_shards"] == 0 and led.loc["noop", "delta_rows"] == 0
    )
    version_ok = bool(
        led.loc["drop2", "version"] == led.loc["drop1", "version"] + 1
        and led.loc["noop", "version"] == led.loc["drop2", "version"]
    )
    additive_ok = bool(
        led.loc["drop2", "snapshot_rows"]
        == led.loc["drop1", "delta_rows"] + led.loc["drop2", "delta_rows"]
        and led.loc["noop", "snapshot_rows"] == led.loc["drop2", "snapshot_rows"]
    )
    return pd.DataFrame(
        [{"noop_ok": noop_ok, "version_monotone_ok": version_ok, "rows_additive_ok": additive_ok}]
    )


SQL_INCREMENTAL_INGEST_GATE = """
SELECT TRUE AS noop_ok, TRUE AS version_monotone_ok, TRUE AS rows_additive_ok
"""


def q_cluster_topterms_gate(sf_dir: str):
    """Independent-implementation parity for cluster labeling: the
    distributed `cluster_topterms` (co-partitioned join + per-batch
    token combiners + grouped sum + per-cluster top-5) must equal a
    single-process pandas recomputation over the same deterministic
    k-means assignment — frame-exact, including the (count desc, token
    asc) tie rule.  A combiner that loses a partial, a join that drops
    a doc, or a tie-rule drift reds the value hash."""
    from ..stages.clustering import kmeans_assign, kmeans_fit

    got = q_cluster_topterms(sf_dir)
    got = (got if isinstance(got, pd.DataFrame) else got.to_pandas()).sort_values(
        ["cluster", "rank"]
    ).reset_index(drop=True)

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    cents = kmeans_fit(emb, 4, iters=5, cache=False)
    assign = kmeans_assign(emb, cents).select_columns(["vec_id", "cluster"]).to_pandas()
    docs = read_table_arrow(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    j = docs.merge(assign.rename(columns={"vec_id": "doc_id"}), on="doc_id")
    rows = []
    for cl, g in j.groupby("cluster"):
        cnt: dict[str, int] = {}
        for t in g["text"]:
            for w in (t or "").split():
                cnt[w] = cnt.get(w, 0) + 1
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for r, (tok, n) in enumerate(top, 1):
            rows.append({"cluster": int(cl), "rank": r, "token": tok, "n": n})
    want = pd.DataFrame(rows).sort_values(["cluster", "rank"]).reset_index(drop=True)
    parity_ok = bool(
        len(got) == len(want)
        and (got["cluster"].to_numpy() == want["cluster"].to_numpy()).all()
        and (got["rank"].to_numpy() == want["rank"].to_numpy()).all()
        and (got["token"].to_numpy() == want["token"].to_numpy()).all()
        and (got["n"].to_numpy().astype(np.int64) == want["n"].to_numpy().astype(np.int64)).all()
    )
    return pd.DataFrame([{"parity_ok": parity_ok}])


SQL_CLUSTER_TOPTERMS_GATE = """
SELECT TRUE AS parity_ok
"""


def q_mmr_gate(sf_dir: str):
    """Independent-implementation parity for MMR selection: the greedy
    loop of `mmr_select` must equal a vectorized numpy re-derivation
    (per step: one masked argmax over λ·rel − (1−λ)·max-sim, ties to
    the smallest id) over the same distributed relevance pool, and the
    first pick must be the pure-relevance argmax.  Selection size is
    pinned."""
    from ..stages.similarity import _as_matrix, _normalize

    got = q_mmr_select(sf_dir)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    import pyarrow.compute as pc

    from .tabular import topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    probe_row = ds.filter(expr="vec_id == 0").take(1)[0]
    qv = np.asarray(probe_row["embedding"], dtype=np.float64)
    qv /= np.linalg.norm(qv)
    q_bc = Broadcast(qv)

    def rel(batch: pa.Table) -> pd.DataFrame:
        batch = batch.filter(pc.not_equal(batch["vec_id"], 0))  # probe excluded
        m = _normalize(_as_matrix(batch["embedding"]))
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(zero_copy_only=False),
                "rel": m @ q_bc.get() if len(batch) else np.zeros(0),
            }
        )

    pool = topk(
        ds.map_batches(rel, batch_format="pyarrow"), ["rel", "vec_id"], _MMR_POOL,
        descending=[True, False],
    ).to_pandas()
    ids = pool["vec_id"].to_numpy(dtype=np.int64)
    id_bc = Broadcast(pa.array(ids, type=pa.int64()))

    def grab(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["vec_id"], value_set=id_bc.get()))

    vec_df = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
    order = {int(v): i for i, v in enumerate(vec_df["vec_id"])}
    mat = _normalize(np.array([np.asarray(e) for e in vec_df["embedding"]], dtype=np.float64))
    rels = pool.set_index("vec_id")["rel"]

    # vectorized greedy: per step one masked argmax, ids ascending so
    # np.argmax's first-max rule IS the smallest-id tie-break
    sort_ix = np.argsort(ids, kind="stable")
    sids = ids[sort_ix]
    rvec = rels.loc[sids].to_numpy()
    pmat = mat[[order[int(v)] for v in sids]]
    alive = np.ones(len(sids), dtype=bool)
    # -inf init: max-sim-to-selected may be NEGATIVE (cosines), a zero
    # floor silently over-penalizes nothing and under-penalizes
    # negative-sim candidates; step 0 uses the explicit 0.0 default
    max_sim = np.full(len(sids), -np.inf)
    picks: list[int] = []
    for step in range(min(_MMR_K, len(sids))):
        score = _MMR_LAMBDA * rvec - (1.0 - _MMR_LAMBDA) * (max_sim if picks else 0.0)
        score = np.where(alive, score, -np.inf)
        i = int(np.argmax(score))
        picks.append(int(sids[i]))
        alive[i] = False
        max_sim = np.maximum(max_sim, pmat @ pmat[i])
    parity_ok = bool(list(got["vec_id"].astype(int)) == picks)
    first_pick_ok = bool(
        int(got["vec_id"].iloc[0])
        == int(sids[np.argmax(np.where(np.ones_like(rvec, dtype=bool), rvec, -np.inf))])
    )
    return pd.DataFrame(
        [
            {
                "n_selected": np.int64(len(got)),
                "parity_ok": parity_ok,
                "first_pick_ok": first_pick_ok,
            }
        ]
    )


SQL_MMR_GATE = f"""
SELECT CAST({_MMR_K} AS BIGINT) AS n_selected, TRUE AS parity_ok, TRUE AS first_pick_ok
"""


# ---------------------------------------------------------------------------
# Strongly connected components over a planted cyclic doc graph
# ---------------------------------------------------------------------------

#: SCC block width: the doc graph chains i→i+1 and, when
#: md5(block) < '8' (≈ half the blocks), adds a back edge from the
#: block's last node to its first — turning that block into one
#: {B}-cycle SCC; other blocks stay singletons.  The planted structure
#: is SQL-derivable, so the oracle checks GENERIC SCC output against
#: algorithm-independent ground truth.
_SCC_BLOCK = 16
#: nodes under which both CSR directions broadcast and every batch of
#: nodes resolves its own component locally; above it the Dataset
#: doubling-closure path runs (log₂ horizon shuffle rounds)
_SCC_NODE_BUDGET = 2_000_000


def _scc_edges(sf_dir: str):
    """Chain + coin-back-edge doc graph → Dataset(src, dst)."""
    from .tabular import md5_lt_mask

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chain = ids[ids + 1 < n_docs]
        ends = ids[(ids % _SCC_BLOCK == _SCC_BLOCK - 1)]
        blocks = ends // _SCC_BLOCK
        coin = (
            md5_lt_mask(pa.array(blocks), "8" + "0" * 31)
            if len(blocks)
            else np.zeros(0, dtype=bool)
        )
        back = ends[coin]
        return pa.table(
            {
                "src": pa.array(np.concatenate([chain, back])),
                "dst": pa.array(
                    np.concatenate([chain + 1, back - (_SCC_BLOCK - 1)])
                ),
            }
        )

    return ds.map_batches(gen, batch_format="pyarrow")


def q_scc_members(sf_dir: str):
    """Strongly connected components of a directed graph — the
    condensation primitive (web-graph spam loops, dependency cycles,
    currency-arbitrage rings).  The kernel is GENERIC: node v's
    component is min(fwd-ball(v) ∩ bwd-ball(v)) under a bounded
    component diameter (horizon = {B} here; the standard FW-BW
    observation that the intersection of descendants and ancestors IS
    the SCC).  The graph is planted so the oracle knows ground truth
    WITHOUT running any SCC algorithm: md5-coin blocks are {B}-cycles
    (scc_id = block start), the rest singletons — a regression in edge
    building, either ball sweep, or the intersection reds the value
    hash at every node.

    Two-tier router (the `reach_pairs` shape): under {N:,} nodes both
    CSR directions broadcast once and each node batch resolves locally
    (zero shuffles); above it `_scc_members_pairs` runs the doubling
    transitive closure (log₂ horizon co-partitioned self-joins per
    direction, pairs never driver-resident) — forced in pytest on a
    planted mini corpus for parity."""
    n_docs = read_table_arrow(sf_dir, "documents", columns=["doc_id"]).num_rows
    if n_docs > _SCC_NODE_BUDGET:
        return _scc_members_pairs(sf_dir)
    import ray

    et = pa.concat_tables(
        [t for t in ray.get(_scc_edges(sf_dir).to_arrow_refs()) if t.num_rows]
    )
    src = et["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = et["dst"].to_numpy(zero_copy_only=False).astype(np.int64)

    def csr(s: np.ndarray, d: np.ndarray):
        order = np.argsort(s, kind="stable")
        s, d = s[order], d[order]
        return np.searchsorted(s, np.arange(n_docs + 1)), d

    fwd = csr(src, dst)
    bwd = csr(dst, src)
    graph = Broadcast((fwd, bwd))

    def ball(indp, nbr, s: int) -> set:
        visited = {s}
        frontier = [s]
        for _ in range(_SCC_BLOCK):
            nxt = []
            for u in frontier:
                for v in nbr[indp[u] : indp[u + 1]]:
                    vi = int(v)
                    if vi not in visited:
                        visited.add(vi)
                        nxt.append(vi)
            if not nxt:
                break
            frontier = nxt
        return visited

    def members(batch: pa.Table) -> pd.DataFrame:
        (fip, fnb), (bip, bnb) = graph.get()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.empty(len(ids), dtype=np.int64)
        for i, u in enumerate(ids):
            out[i] = min(ball(fip, fnb, int(u)) & ball(bip, bnb, int(u)))
        return pd.DataFrame({"node": ids, "scc_id": out})

    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)
    return (
        ds.map_batches(members, batch_format="pyarrow")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype(np.int64)
    )


q_scc_members.__doc__ = q_scc_members.__doc__.format(
    B=_SCC_BLOCK, N=_SCC_NODE_BUDGET
)


def _closure_doubling(pairs, t_max: int):
    """Bounded transitive closure of a (src, nd) reflexive pair Dataset
    by repeated squaring: r ← r ∪ (r ∘ r) reaches horizon 2^k after k
    rounds — log₂(t_max) co-partitioned self-joins instead of t_max
    hop joins (each hop pays a full exchange; see `reach_pairs`' 62 s →
    0.5 s lesson).  Dedup rides a src-hash co-partition."""
    import math

    from .tabular import shuffle_join

    def tag(batch: pa.Table) -> pa.Table:
        h = (batch["src"].to_numpy(zero_copy_only=False) % 64).astype(np.int32)
        return batch.append_column("__b", pa.array(h))

    def distinct_group(df: pd.DataFrame) -> pd.DataFrame:
        return df[["src", "nd"]].drop_duplicates()

    def mid_left(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "mid": batch["nd"]})

    def mid_right(batch: pa.Table) -> pa.Table:
        return pa.table({"mid": batch["src"], "nd2": batch["nd"]})

    def step_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "nd": batch["nd2"]})

    r = pairs.materialize()
    for _ in range(max(1, math.ceil(math.log2(t_max)))):
        stepped = shuffle_join(
            r.map_batches(mid_left, batch_format="pyarrow"),
            r.map_batches(mid_right, batch_format="pyarrow"),
            "mid",
        ).map_batches(step_cols, batch_format="pyarrow")
        r = (
            r.union(stepped)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(distinct_group, batch_format="pandas")
            # union + join triple the block count per round (observed
            # 48 → 1296 tiny blocks by round 3, 78 s of pure task
            # scheduling for 10k rows) — coalesce before the next round
            .repartition(16)
            .materialize()
        )
    return r


def _scc_members_pairs(sf_dir: str):
    """Above-budget SCC: doubling closure of the reflexive edge
    relation in BOTH directions, then one co-partitioned join of
    fwd-reach with bwd-reach on (src, nd) — the surviving pairs are
    exactly the same-SCC pairs — and a grouped min per node."""
    from .tabular import grouped_aggregate, shuffle_join

    edges = _scc_edges(sf_dir)
    ds = read_table(sf_dir, "documents", columns=["doc_id"], split=True)

    def self_pairs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(ids), "nd": pa.array(ids)})

    ident = ds.map_batches(self_pairs, batch_format="pyarrow")

    def fwd_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["src"], "nd": batch["dst"]})

    def bwd_cols(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "nd": batch["src"]})

    r_f = _closure_doubling(
        ident.union(edges.map_batches(fwd_cols, batch_format="pyarrow")), _SCC_BLOCK
    )
    r_b = _closure_doubling(
        ident.union(edges.map_batches(bwd_cols, batch_format="pyarrow")), _SCC_BLOCK
    )
    both = shuffle_join(r_f, r_b, ["src", "nd"])
    out = grouped_aggregate(both, ["src"], {"scc_id": ("min", "nd")}).to_pandas()
    return (
        out.rename(columns={"src": "node"})
        .sort_values("node")
        .reset_index(drop=True)
        .astype(np.int64)
    )


# ---------------------------------------------------------------------------
# Edit-distance similarity self-join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

_EDJ_BUCKETS = 64


def q_edit_distance_join(sf_dir: str):
    """Edit-distance ≤ 1 similarity self-join over supplier names —
    the typo-tolerant record-matching primitive (entity resolution,
    query spelling, near-key audits), via FastSS deletion
    neighborhoods (Bocek et al. 2007; SymSpell's index): two strings
    are within edit distance 1 iff their {self ∪ single-deletion
    variants} sets intersect, for ALL edit types with no length or
    alphabet assumptions.  LSH-shaped plan: each name emits len+1
    compact (variant, key, name) rows, ONE variant-hash co-partition
    collides candidates in-bucket, and the exact verify runs where the
    collision happened (equal-length pairs vectorize as a byte-compare
    hamming count, which for equal lengths decides distance ≤ 1
    exactly; unequal lengths fall back to the DP kernel) — names never
    broadcast, pairs dedupe through the grouped fold.  Candidate FPs
    (distance-2 pairs sharing a variant) are disposed by the verify,
    so the output is EXACT and the DuckDB oracle is the quadratic
    ``levenshtein`` cross-join."""
    import pyarrow.compute as pc  # noqa: F401  (module import locality)

    from ..functions.strings import levenshtein_distance

    ds = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"], split=True)

    def variants(batch: pa.Table) -> pd.DataFrame:
        keys = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = batch["s_name"].to_pylist()
        vk, vkey, vname = [], [], []
        for k, s in zip(keys, names):
            s = s or ""
            vk.append(s)
            vkey.append(k)
            vname.append(s)
            for i in range(len(s)):
                vk.append(s[:i] + s[i + 1 :])
                vkey.append(k)
                vname.append(s)
        out = pd.DataFrame({"variant": vk, "key": vkey, "name": vname})
        out["bucket"] = pd.util.hash_array(
            out["variant"].to_numpy(dtype=object)
        ).astype(np.int64) % _EDJ_BUCKETS
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["variant", "key"])
        m = g.merge(g, on="variant", suffixes=("_a", "_b"))
        m = m[m["key_a"] < m["key_b"]].drop_duplicates(["key_a", "key_b"])
        if m.empty:
            return pd.DataFrame(
                {"key_a": pd.Series(dtype=np.int64), "key_b": pd.Series(dtype=np.int64),
                 "dist": pd.Series(dtype=np.int64)}
            )
        na = m["name_a"].to_numpy(dtype=object)
        nb = m["name_b"].to_numpy(dtype=object)
        dist = np.empty(len(m), dtype=np.int64)
        for i, (a, b) in enumerate(zip(na, nb)):
            if len(a) == len(b):
                # equal lengths: levenshtein ≤ 1 ⟺ hamming ≤ 1 (a
                # single edit keeping length is a substitution), and
                # the distances agree on every kept pair
                dist[i] = sum(x != y for x, y in zip(a, b))
                if dist[i] > 1:
                    dist[i] = 2  # any value > 1 — dropped below
            else:
                dist[i] = levenshtein_distance(a, b)
        m = m.assign(dist=dist)
        m = m[m["dist"] <= 1]
        return m[["key_a", "key_b", "dist"]]

    pairs = (
        ds.map_batches(variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: bucket_pairs(g.drop(columns="bucket")), batch_format="pandas")
    )
    # a pair can collide in several variant buckets: one grouped fold
    # dedupes (dist is identical wherever the pair verified)
    out = grouped_aggregate(
        pairs, ["key_a", "key_b"], {"dist": ("min", "dist")}
    ).to_pandas()
    return (
        out.sort_values(["key_a", "key_b"]).reset_index(drop=True).astype(np.int64)
    )


SQL_EDIT_DISTANCE_JOIN = """
SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
ORDER BY key_a, key_b
"""


# ---------------------------------------------------------------------------
# End-to-end training-mix composite: temperature-weighted domain
# downsampling → sequence packing → deterministic epoch order
# ---------------------------------------------------------------------------

_TM_BUCKETS = 64
_TM_BUDGET = 512


def q_training_mix(sf_dir: str):
    """The make-a-training-mix composition a multi-domain run actually
    executes, value-oracled END TO END: (1) α=0.5 temperature
    downsampling per domain — keep exactly ⌈√(n_min·n_dom)⌉ docs
    (integer-exact, no float thresholds) chosen by deterministic md5
    rank, the no-RNG-state equalizer that up-weights rare domains
    relative to their share; (2) concat-pack the survivors into
    {budget}-token sequences per domain (distributed prefix scan);
    (3) a deterministic global epoch position per survivor (md5-rank
    TeraSort enumeration, the `epoch_shuffle` contract).  Domains are
    derived skewed on purpose (⌊√(doc_id % 100)⌋ → sizes 1:19) so the
    downsampling rule actually fires at every scale.

    Shapes: the rank selection is the `class_balance` geometry (one
    bounded (domain × md5-bucket) count fold, offsets broadcast, rows
    cross the wire once); packing is the `pack_sequences` prefix scan;
    the epoch rank is one fixed-boundary bucket exchange.  DuckDB
    replays all three stages in one CTE chain, so a lost survivor, a
    mis-packed sequence, or one displaced epoch position reds the
    value hash."""
    import pyarrow.compute as pc

    from ..stages.scan import pack_sequences
    from .tabular import md5_digest_words, shuffle_join

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dom = np.floor(np.sqrt((ids % 100).astype(np.float64))).astype(np.int64)
        n_tok = pc.cast(
            pc.list_value_length(pc.split_pattern(batch["text"], " ")), pa.int64()
        )
        hi, lo = md5_digest_words(batch["doc_id"])
        hb = (hi.astype(np.uint64) >> np.uint64(58)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "dom": pa.array(dom),
                "n_tok": n_tok,
                "__hi": pa.array(hi.astype(np.uint64)),
                "__lo": pa.array(lo.astype(np.uint64)),
                "__db": pa.array(dom * _TM_BUCKETS + hb),
            }
        )

    kd = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    db_counts = (
        kd.map_batches(
            lambda t: pd.DataFrame(
                pd.Series(t["__db"].to_numpy(zero_copy_only=False)).value_counts()
            ).reset_index().set_axis(["__db", "n"], axis=1),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("__db")["n"]
        .sum()
        .sort_index()
    )
    dom_sizes: dict[int, int] = {}
    db_offsets: dict[int, int] = {}
    for db, n in db_counts.items():
        d = int(db) // _TM_BUCKETS
        db_offsets[int(db)] = dom_sizes.get(d, 0)
        dom_sizes[d] = db_offsets[int(db)] + int(n)
    import math

    n_min = min(dom_sizes.values())
    keep_k = {}
    for d, n_d in dom_sizes.items():
        p = n_min * n_d
        r = math.isqrt(p)
        keep_k[d] = r if r * r == p else r + 1  # integer-exact ⌈√(n_min·n_d)⌉
    sel_bc = Broadcast((db_offsets, keep_k))

    def keep_ranked(df: pd.DataFrame) -> pd.DataFrame:
        offs, kk = sel_bc.get()
        db = int(df["__db"].iloc[0])
        df = df.sort_values(["__hi", "__lo", "doc_id"], kind="stable")
        rank = offs[db] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df.loc[rank <= kk[db // _TM_BUCKETS], ["doc_id", "dom", "n_tok"]]

    surv = kd.groupby("__db").map_groups(keep_ranked, batch_format="pandas").materialize()

    import os as _os

    import pyarrow.parquet as pqt

    meta = pqt.ParquetFile(_os.path.join(sf_dir, "documents.parquet")).metadata
    max_id = max(
        meta.row_group(i).column(0).statistics.max for i in range(meta.num_row_groups)
    )
    packed = pack_sequences(
        surv, _TM_BUDGET, order_col="doc_id", group_col="dom", tokens_col="n_tok",
        max_order=int(max_id),
    )

    # deterministic epoch position over the SURVIVORS: md5-rank TeraSort
    # enumeration with fixed top-bit boundaries (the epoch_shuffle shape)
    from ..stages.sketch_parity import md5_u64

    def ekeys(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_u64([f"0:{d}" for d in ids])
        return pd.DataFrame(
            {"doc_id": ids, "h": h,
             "b": (h >> np.uint64(58)).astype(np.int64)}
        )

    ek = surv.map_batches(ekeys, batch_format="pyarrow").materialize()
    bc_counts = (
        ek.map_batches(
            lambda df: df.groupby("b", as_index=False).agg(n=("doc_id", "size")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("b")["n"]
        .sum()
        .reindex(range(_TM_BUCKETS), fill_value=0)
        .to_numpy()
    )
    off_bc = Broadcast(np.concatenate(([0], np.cumsum(bc_counts)[:-1])))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["b"].iloc[0])
        df = df.sort_values(["h", "doc_id"], kind="stable")
        df["position"] = off_bc.get()[b] + np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "position"]]

    pos = ek.groupby("b").map_groups(rank_bucket, batch_format="pandas")

    out = shuffle_join(packed, pos, "doc_id").to_pandas()
    out["seq_id"] = out["cum_before"].to_numpy() // _TM_BUDGET
    out = out[["doc_id", "dom", "n_tok", "seq_id", "position"]].astype(np.int64)
    return out.sort_values("position").reset_index(drop=True)


q_training_mix.__doc__ = q_training_mix.__doc__.format(budget=_TM_BUDGET)


SQL_TRAINING_MIX = f"""
WITH t AS (
  SELECT doc_id,
         CAST(floor(sqrt(CAST(doc_id % 100 AS DOUBLE))) AS BIGINT) AS dom,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
counts AS (SELECT dom, count(*) AS n_d FROM t GROUP BY dom),
mn AS (SELECT min(n_d) AS n_min FROM counts),
k AS (
  SELECT dom, CAST(ceil(sqrt(CAST(n_min * n_d AS DOUBLE))) AS BIGINT) AS k_d
  FROM counts, mn
),
ranked AS (
  SELECT t.*, row_number() OVER (PARTITION BY dom ORDER BY h, doc_id) AS r
  FROM t
),
surv AS (
  SELECT ranked.doc_id, ranked.dom, ranked.n_tok
  FROM ranked JOIN k USING (dom) WHERE r <= k_d
),
packed AS (
  SELECT doc_id, dom, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY dom ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM surv
),
pos AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY md5_number_upper('0:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS position
  FROM surv
)
SELECT p.doc_id, p.dom, p.n_tok,
       CAST(p.cum_before // {_TM_BUDGET} AS BIGINT) AS seq_id, pos.position
FROM packed p JOIN pos USING (doc_id)
ORDER BY position
"""


SQL_SCC_MEMBERS = f"""
SELECT doc_id AS node,
       CASE WHEN md5(CAST(doc_id // {_SCC_BLOCK} AS VARCHAR)) < '8'
             AND (doc_id // {_SCC_BLOCK}) * {_SCC_BLOCK} + {_SCC_BLOCK - 1}
                 < (SELECT count(*) FROM documents)
            THEN (doc_id // {_SCC_BLOCK}) * {_SCC_BLOCK}
            ELSE doc_id END AS scc_id
FROM documents ORDER BY node
"""


QUERIES = {
    "cdc_chunk_dedup": q_cdc_chunk_dedup,
    "weighted_reservoir": q_weighted_reservoir,
    "exact_substr_rewrite": q_exact_substr_rewrite,
    "caption_pairs": q_caption_pairs,
    "span_interleave_stats": q_span_interleave_stats,
    "temperature_mix": q_temperature_mix,
    "hll_registers": q_hll_registers,
    "simhash_md5": q_simhash_md5,
    "minhash_sigs": q_minhash_sigs,
    "cms_registers": q_cms_registers,
    "bloom_bits": q_bloom_bits,
    "simhash_md5_pairs": q_simhash_md5_pairs,
    "zorder_box_rows": q_zorder_box_rows,
    "compact_checksum": q_compact_checksum,
    "media_ref_integrity": q_media_ref_integrity,
    "span_order_restore": q_span_order_restore,
    "token_budget_shards": q_token_budget_shards,
    "near_dedup_md5": q_near_dedup_md5,
    "epoch_shuffle": q_epoch_shuffle,
    "ann_recall_gates": q_ann_recall_gates,
    "span_corruption_gate": q_span_corruption_gate,
    "reach_pairs": q_reach_pairs,
    "hyperball_gate": q_hyperball_gate,
    "bpe_roundtrip_gate": q_bpe_roundtrip_gate,
    "unigram_roundtrip_gate": q_unigram_roundtrip_gate,
    "kmeans_quality_gate": q_kmeans_quality_gate,
    "pca_gate": q_pca_gate,
    "semantic_dedup_gate": q_semantic_dedup_gate,
    "isotonic_gate": q_isotonic_gate,
    "training_order_gate": q_training_order_gate,
    "quality_classifier_gate": q_quality_classifier_gate,
    "rag_recall_gate": q_rag_recall_gate,
    "incremental_dedup_gate": q_incremental_dedup_gate,
    "boilerplate_gate": q_boilerplate_gate,
    "pretokenize_gate": q_pretokenize_gate,
    "qa_extract_gate": q_qa_extract_gate,
    "eval_semantic_gate": q_eval_semantic_gate,
    "incremental_ingest_gate": q_incremental_ingest_gate,
    "cluster_topterms_gate": q_cluster_topterms_gate,
    "mmr_gate": q_mmr_gate,
    "scc_members": q_scc_members,
    "edit_distance_join": q_edit_distance_join,
    "training_mix": q_training_mix,
    "bitext_mine": q_bitext_mine,
    "rouge_pairs": q_rouge_pairs,
    "distinct_ngrams": q_distinct_ngrams,
    "pricing_summary": q_pricing_summary,
    "bm25_search": q_bm25_search,
    "dsir_select": q_dsir_select,
    "media_blob_dedup": q_media_blob_dedup,
    "curriculum_order": q_curriculum_order,
    "data_card": q_data_card,
    "quality_sample": q_quality_sample,
    "tokenizer_fertility": q_tokenizer_fertility,
    "label_noise_detect": q_label_noise_detect,
    "class_balance": q_class_balance,
    "media_phash_dedup": q_media_phash_dedup,
    "blocklist_filter": q_blocklist_filter,
    "normalized_dedup": q_normalized_dedup,
    "boilerplate_strip": q_boilerplate_strip,
    "interval_overlap_join": q_interval_overlap_join,
    "attribution_linear": q_attribution_linear,
    "source_overlap": q_source_overlap,
    "quality_classifier": q_quality_classifier,
    "unigram_train": q_unigram_train,
    "unigram_encode": q_unigram_encode,
    "incremental_agg": q_incremental_agg,
    "survivorship_merge": q_survivorship_merge,
    "adamic_adar": q_adamic_adar,
    "graph_diameter": q_graph_diameter,
    "random_walks": q_random_walks,
    "skipgram_pairs": q_skipgram_pairs,
    "negative_samples": q_negative_samples,
    "token_drift": q_token_drift,
    "skew_report": q_skew_report,
    "entity_resolution": q_entity_resolution,
    "sssp_weighted": q_sssp_weighted,
    "latest_event_per_user": q_latest_event_per_user,
    "late_events": q_late_events,
    "ohlc_resample": q_ohlc_resample,
    "weighted_mean": q_weighted_mean,
    "lexical_diversity": q_lexical_diversity,
    "share_of_total": q_share_of_total,
    "multi_format_union": q_multi_format_union,
    "span_corruption": q_span_corruption,
    "profile_table": q_profile_table,
    "contrastive_pairs": q_contrastive_pairs,
    "group_kfold": q_group_kfold,
    "cluster_topterms": q_cluster_topterms,
    "merge_upsert": q_merge_upsert,
    "scd2_history": q_scd2_history,
    "table_diff": q_table_diff,
    "zorder_prune": q_zorder_prune,
    "bloom_point_lookup": q_bloom_point_lookup,
    "q10_returned_items": q_q10_returned_items,
    "kcore_members": q_kcore_members,
    "ppr_scores": q_ppr_scores,
    "compact_roundtrip": q_compact_roundtrip,
    "rag_index_search": q_rag_index_search,
    "robust_zscore": q_robust_zscore,
    "validate_orders": q_validate_orders,
    "region_customer_stats": q_region_customer_stats,
    "hash_split_counts": q_hash_split_counts,
    "derived_physics": q_derived_physics,
    "url_resolve": q_url_resolve,
    "dedup_exact_prefix": q_dedup_prefix,
    "dedup_keep_best": q_dedup_keep_best,
    "token_stats": q_token_stats,
    "event_windows": q_event_windows,
    "top_orders": q_top_orders,
    "anti_join_resume": q_anti_join_resume,
    "knn_cosine": q_knn_cosine,
    "hardware_prep": q_hardware_prep,
    "numeric_suffix": q_numeric_suffix,
    "project_rename": q_project_rename,
    "fuzzy_country": q_fuzzy_country,
    "token_bpe": q_token_bpe,
    "content_fingerprint": q_content_fingerprint,
    "lang_id": q_lang_id,
    "quality_score": q_quality_score,
    "winnow_fingerprints": q_winnow_fingerprints,
    "minhash_dedup": q_minhash_dedup,
    "ssjoin_jaccard": q_ssjoin_jaccard,
    "minhash_recall_gate": q_minhash_recall_gate,
    "near_dedup_corpus": q_near_dedup_corpus,
    "simhash_pairs": q_simhash_pairs,
    "simhash_values": q_simhash_values,
    "embedding_dup_pairs": q_embedding_dup_pairs,
    "knn_lsh": q_knn_lsh,
    "media_decode": q_media_decode,
    "media_frames": q_media_frames,
    "information_extraction": q_information_extraction,
    "eval_char_metrics": q_eval_char_metrics,
    "eval_summary": q_eval_summary,
    "eval_semantic": q_eval_semantic,
    "gold_from_epoch": q_gold_from_epoch,
    "epoch_coerce": q_epoch_coerce,
    "token_quantiles": q_token_quantiles,
    "sessionize": q_sessionize,
    "props_extract": q_props_extract,
    "sample_seeded": q_sample_seeded,
    "expanding_mean": q_expanding_mean,
    "qa_extract": q_qa_extract,
    "qa_token_extract": q_qa_token_extract,
    "media_features": q_media_features,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "shuffle_join": q_shuffle_join,
    "sortmerge_join": q_sortmerge_join,
    "salted_join": q_salted_join,
    "rank_in_group": q_rank_in_group,
    "window_lag": q_window_lag,
    "distinct_users": q_distinct_users,
    "hll_distinct": q_hll_distinct,
    "hll_grouped": q_hll_grouped,
    "training_order": q_training_order,
    "weighted_sample": q_weighted_sample,
    "stratified_sample": q_stratified_sample,
    "sliding_window": q_sliding_window,
    "knn_lsh_shuffle": q_knn_lsh_shuffle,
    "grouped_quantiles": q_grouped_quantiles,
    "price_quantiles_tdigest": q_price_quantiles_tdigest,
    "tdigest_rank_check": q_tdigest_rank_check,
    "hll_rank_check": q_hll_rank_check,
    "cms_rank_check": q_cms_rank_check,
    "dedup_clusters": q_dedup_clusters,
    "kmeans_clusters": q_kmeans_clusters,
    "knn_ivf": q_knn_ivf,
    "knn_pq": q_knn_pq,
    "knn_ivfpq": q_knn_ivfpq,
    "pii_redact": q_pii_redact,
    "decontaminate": q_decontaminate,
    "repetition_stats": q_repetition_stats,
    "domain_cap": q_domain_cap,
    "pack_sequences": q_pack_sequences,
    "chunk_documents": q_chunk_documents,
    "cc_redact": q_cc_redact,
    "text_clean": q_text_clean,
    "bigram_pmi": q_bigram_pmi,
    "rag_prep": q_rag_prep,
    "heavy_tokens": q_heavy_tokens,
    "heavy_tokens_sketch": q_heavy_tokens_sketch,
    "anti_join_bloom": q_anti_join_bloom,
    "curate_corpus": q_curate_corpus,
    "value_histogram": q_value_histogram,
    "event_sequences": q_event_sequences,
    "outlier_filter": q_outlier_filter,
    "winsorize": q_winsorize,
    "melt_measures": q_melt_measures,
    "pivot_events": q_pivot_events,
    "bucketed_join": q_bucketed_join,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "rollup_orders": q_rollup_orders,
    "ntile_orders": q_ntile_orders,
    "tfidf_top_terms": q_tfidf_top_terms,
    "vocab_build": q_vocab_build,
    "inverted_index": q_inverted_index,
    "bigram_lm_score": q_bigram_lm_score,
    "perplexity_buckets": q_perplexity_buckets,
    "media_dims_gate": q_media_dims_gate,
    "domain_mixture": q_domain_mixture,
    "semantic_dedup": q_semantic_dedup,
    "passage_dedup": q_passage_dedup,
    "left_join_orders": q_left_join_orders,
    "incremental_dedup": q_incremental_dedup,
    "bpe_train": q_bpe_train,
    "grouped_regression": q_grouped_regression,
    "cube_orders": q_cube_orders,
    "full_outer_join": q_full_outer_join,
    "pagerank": q_pagerank,
    "triangle_count": q_triangle_count,
    "cohort_retention": q_cohort_retention,
    "zscore_normalize": q_zscore_normalize,
    "domain_quality_gate": q_domain_quality_gate,
    "fuzzy_name_join": q_fuzzy_name_join,
    "bpe_encode": q_bpe_encode,
    "knn_graph": q_knn_graph,
    "q3_shipping": q_q3_shipping,
    "moving_avg": q_moving_avg,
    "ewma": q_ewma,
    "cms_token_freq": q_cms_token_freq,
    "funnel_users": q_funnel_users,
    "fk_audit": q_fk_audit,
    "media_decode_bmp": q_media_decode_bmp,
    "media_decode_ppm": q_media_decode_ppm,
    "media_decode_wav": q_media_decode_wav,
    "global_rank": q_global_rank,
    "pretokenize_corpus": q_pretokenize_corpus,
    "grouped_mode": q_grouped_mode,
    "dense_rank": q_dense_rank,
    "rank_gaps": q_rank_gaps,
    "window_lead_cume": q_window_lead_cume,
    "event_islands": q_event_islands,
    "time_gap_fill": q_time_gap_fill,
    "corr_matrix": q_corr_matrix,
    "ngram_span_dedup": q_ngram_span_dedup,
    "pca_project": q_pca_project,
    "event_transitions": q_event_transitions,
    "interval_coverage": q_interval_coverage,
    "debounce_events": q_debounce_events,
    "q5_region_revenue": q_q5_region_revenue,
    "q17_small_quantity": q_q17_small_quantity,
    "q18_large_orders": q_q18_large_orders,
    "q4_order_priority": q_q4_order_priority,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q7_volume_shipping": q_q7_volume_shipping,
    "q8_market_share": q_q8_market_share,
    "q12_priority_lines": q_q12_priority_lines,
    "q13_order_counts": q_q13_order_counts,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q15_top_supplier": q_q15_top_supplier,
    "q16_supplier_variety": q_q16_supplier_variety,
    "q19_special_revenue": q_q19_special_revenue,
    "q22_dormant_customers": q_q22_dormant_customers,
    "q2_min_cost_supplier": q_q2_min_cost_supplier,
    "q9_product_profit": q_q9_product_profit,
    "q11_important_parts": q_q11_important_parts,
    "q20_dominant_suppliers": q_q20_dominant_suppliers,
    "q21_waiting_suppliers": q_q21_waiting_suppliers,
    "copurchase_pairs": q_copurchase_pairs,
    "ab_ttest": q_ab_ttest,
    "psi_drift": q_psi_drift,
    "type_entropy": q_type_entropy,
    "bfs_hops": q_bfs_hops,
    "label_propagation": q_label_propagation,
    "pareto_orders": q_pareto_orders,
    "auc_score": q_auc_score,
    "gini_revenue": q_gini_revenue,
    "rollup_revenue": q_rollup_revenue,
    "stream_self_join": q_stream_self_join,
    "attribution_last_touch": q_attribution_last_touch,
    "chi2_independence": q_chi2_independence,
    "clustering_coeff": q_clustering_coeff,
    "ngram_novelty": q_ngram_novelty,
    "rfm_segments": q_rfm_segments,
    "label_centroids": q_label_centroids,
    "mmr_select": q_mmr_select,
    "rolling_median": q_rolling_median,
    "decayed_value": q_decayed_value,
    "audience_segments": q_audience_segments,
    "user_paths": q_user_paths,
    "zipf_slope": q_zipf_slope,
    "rolling_distinct_users": q_rolling_distinct_users,
    "pareto_8020": q_pareto_8020,
    "hourly_anomaly": q_hourly_anomaly,
    "seq_patterns": q_seq_patterns,
    "snapshot_reads": q_snapshot_reads,
    "schema_evolution": q_schema_evolution,
    "cdc_apply": q_cdc_apply,
    "source_divergence": q_source_divergence,
    "readability_score": q_readability_score,
    "k_anonymity": q_k_anonymity,
    "part_recs": q_part_recs,
    "rapid_reorder": q_rapid_reorder,
    "acf_lags": q_acf_lags,
    "cusum_changepoint": q_cusum_changepoint,
    "seasonal_strength": q_seasonal_strength,
    "target_encoding": q_target_encoding,
    "woe_iv": q_woe_iv,
    "benford_digits": q_benford_digits,
    "naive_bayes_lang": q_naive_bayes_lang,
    "rrf_fusion": q_rrf_fusion,
    "ndcg_eval": q_ndcg_eval,
    "sprt_abtest": q_sprt_abtest,
    "ece_calibration": q_ece_calibration,
    "assoc_rules": q_assoc_rules,
    "seasonal_naive_mape": q_seasonal_naive_mape,
    "ks_test": q_ks_test,
    "mann_whitney": q_mann_whitney,
    "spearman_corr": q_spearman_corr,
    "kaplan_meier": q_kaplan_meier,
    "phrase_search": q_phrase_search,
    "dp_aggregate": q_dp_aggregate,
    "xcorr_lags": q_xcorr_lags,
    "media_probe": q_media_probe,
    "hll_setops": q_hll_setops,
    "isotonic_calibration": q_isotonic_calibration,
    "incremental_ingest": q_incremental_ingest,
    "periodogram": q_periodogram,
    "theilsen_trend": q_theilsen_trend,
    "conversion_lag": q_conversion_lag,
    "url_canonical_dedup": q_url_canonical_dedup,
    "mutual_information": q_mutual_information,
    "interleaved_pack": q_interleaved_pack,
    "stream_sessionize": q_stream_sessionize,
    "exact_median_2pass": q_exact_median_2pass,
    "containment_pairs": q_containment_pairs,
    "gdpr_delete": q_gdpr_delete,
    "quantile_normalize": q_quantile_normalize,
    "mutual_nn": q_mutual_nn,
    "hard_negatives": q_hard_negatives,
    "length_batching": q_length_batching,
    "feature_hashing": q_feature_hashing,
    "oov_rate": q_oov_rate,
    "decision_stump": q_decision_stump,
    "cohort_ltv": q_cohort_ltv,
    "new_returning_users": q_new_returning_users,
    "jaccard_weeks": q_jaccard_weeks,
}

ORACLE_SQL = {
    "cdc_chunk_dedup": SQL_CDC_CHUNK_DEDUP,
    "weighted_reservoir": SQL_WEIGHTED_RESERVOIR,
    "exact_substr_rewrite": SQL_EXACT_SUBSTR_REWRITE,
    "caption_pairs": SQL_CAPTION_PAIRS,
    "span_interleave_stats": SQL_SPAN_INTERLEAVE_STATS,
    "temperature_mix": SQL_TEMPERATURE_MIX,
    "hll_registers": SQL_HLL_REGISTERS,
    "hll_distinct": SQL_HLL_DISTINCT,
    "hll_grouped": SQL_HLL_GROUPED,
    "cms_token_freq": SQL_CMS_TOKEN_FREQ,
    "zorder_prune": SQL_ZORDER_PRUNE,
    "compact_roundtrip": SQL_COMPACT_ROUNDTRIP,
    "price_quantiles_tdigest": SQL_PRICE_QUANTILES_TDIGEST,
    "simhash_md5": SQL_SIMHASH_MD5,
    "minhash_sigs": SQL_MINHASH_SIGS,
    "cms_registers": SQL_CMS_REGISTERS,
    "bloom_bits": SQL_BLOOM_BITS,
    "simhash_md5_pairs": SQL_SIMHASH_MD5_PAIRS,
    "zorder_box_rows": SQL_ZORDER_BOX_ROWS,
    "compact_checksum": SQL_COMPACT_CHECKSUM,
    "media_ref_integrity": SQL_MEDIA_REF_INTEGRITY,
    "span_order_restore": SQL_SPAN_ORDER_RESTORE,
    "token_budget_shards": SQL_TOKEN_BUDGET_SHARDS,
    "near_dedup_md5": SQL_NEAR_DEDUP_MD5,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
    "ann_recall_gates": SQL_ANN_RECALL_GATES,
    "span_corruption_gate": SQL_SPAN_CORRUPTION_GATE,
    "reach_pairs": SQL_REACH_PAIRS,
    "hyperball_gate": SQL_HYPERBALL_GATE,
    "bpe_roundtrip_gate": SQL_BPE_ROUNDTRIP_GATE,
    "unigram_roundtrip_gate": SQL_UNIGRAM_ROUNDTRIP_GATE,
    "kmeans_quality_gate": SQL_KMEANS_QUALITY_GATE,
    "pca_gate": SQL_PCA_GATE,
    "semantic_dedup_gate": SQL_SEMANTIC_DEDUP_GATE,
    "isotonic_gate": SQL_ISOTONIC_GATE,
    "training_order_gate": SQL_TRAINING_ORDER_GATE,
    "quality_classifier_gate": SQL_QUALITY_CLASSIFIER_GATE,
    "rag_recall_gate": SQL_RAG_RECALL_GATE,
    "incremental_dedup_gate": SQL_INCREMENTAL_DEDUP_GATE,
    "boilerplate_gate": SQL_BOILERPLATE_GATE,
    "pretokenize_gate": SQL_PRETOKENIZE_GATE,
    "qa_extract_gate": SQL_QA_EXTRACT_GATE,
    "eval_semantic_gate": SQL_EVAL_SEMANTIC_GATE,
    "incremental_ingest_gate": SQL_INCREMENTAL_INGEST_GATE,
    "cluster_topterms_gate": SQL_CLUSTER_TOPTERMS_GATE,
    "mmr_gate": SQL_MMR_GATE,
    "scc_members": SQL_SCC_MEMBERS,
    "edit_distance_join": SQL_EDIT_DISTANCE_JOIN,
    "training_mix": SQL_TRAINING_MIX,
    "bitext_mine": SQL_BITEXT_MINE,
    "rouge_pairs": SQL_ROUGE_PAIRS,
    "distinct_ngrams": SQL_DISTINCT_NGRAMS,
    "bm25_search": SQL_BM25,
    "dsir_select": SQL_DSIR,
    "media_blob_dedup": SQL_MEDIA_BLOB_DEDUP,
    "curriculum_order": SQL_CURRICULUM_ORDER,
    "data_card": SQL_DATA_CARD,
    "quality_sample": SQL_QUALITY_SAMPLE,
    "tokenizer_fertility": SQL_TOKENIZER_FERTILITY,
    "label_noise_detect": SQL_LABEL_NOISE,
    "class_balance": SQL_CLASS_BALANCE,
    "media_phash_dedup": SQL_MEDIA_PHASH_DEDUP,
    "blocklist_filter": SQL_BLOCKLIST_FILTER,
    "normalized_dedup": SQL_NORMALIZED_DEDUP,
    "interval_overlap_join": SQL_INTERVAL_OVERLAP,
    "attribution_linear": SQL_ATTRIBUTION_LINEAR,
    "incremental_agg": SQL_INCREMENTAL_AGG,
    "survivorship_merge": SQL_SURVIVORSHIP,
    "adamic_adar": SQL_ADAMIC_ADAR,
    "random_walks": SQL_RANDOM_WALKS,
    "skipgram_pairs": SQL_SKIPGRAM,
    "negative_samples": SQL_NEGATIVE_SAMPLES,
    "token_drift": SQL_TOKEN_DRIFT,
    "skew_report": SQL_SKEW_REPORT,
    "acf_lags": SQL_ACF_LAGS,
    "cusum_changepoint": SQL_CUSUM_CHANGEPOINT,
    "seasonal_strength": SQL_SEASONAL_STRENGTH,
    "target_encoding": SQL_TARGET_ENCODING,
    "woe_iv": SQL_WOE_IV,
    "benford_digits": SQL_BENFORD_DIGITS,
    "naive_bayes_lang": SQL_NAIVE_BAYES_LANG,
    "rrf_fusion": SQL_RRF_FUSION,
    "ndcg_eval": SQL_NDCG_EVAL,
    "sprt_abtest": SQL_SPRT_ABTEST,
    "ece_calibration": SQL_ECE_CALIBRATION,
    "assoc_rules": SQL_ASSOC_RULES,
    "seasonal_naive_mape": SQL_SEASONAL_NAIVE_MAPE,
    "ks_test": SQL_KS_TEST,
    "mann_whitney": SQL_MANN_WHITNEY,
    "spearman_corr": SQL_SPEARMAN_CORR,
    "kaplan_meier": SQL_KAPLAN_MEIER,
    "phrase_search": SQL_PHRASE_SEARCH,
    "dp_aggregate": SQL_DP_AGGREGATE,
    "xcorr_lags": SQL_XCORR_LAGS,
    "media_probe": SQL_MEDIA_PROBE,
    "hll_setops": SQL_HLL_SETOPS,
    "periodogram": SQL_PERIODOGRAM,
    "theilsen_trend": SQL_THEILSEN_TREND,
    "conversion_lag": SQL_CONVERSION_LAG,
    "url_canonical_dedup": SQL_URL_CANONICAL_DEDUP,
    "mutual_information": SQL_MUTUAL_INFORMATION,
    "interleaved_pack": SQL_INTERLEAVED_PACK,
    "stream_sessionize": SQL_SESSIONIZE,
    "exact_median_2pass": SQL_EXACT_MEDIAN_2PASS,
    "containment_pairs": SQL_CONTAINMENT_PAIRS,
    "gdpr_delete": SQL_GDPR_DELETE,
    "quantile_normalize": SQL_QUANTILE_NORMALIZE,
    "mutual_nn": SQL_MUTUAL_NN,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "length_batching": SQL_LENGTH_BATCHING,
    "feature_hashing": SQL_FEATURE_HASHING,
    "oov_rate": SQL_OOV_RATE,
    "decision_stump": SQL_DECISION_STUMP,
    "cohort_ltv": SQL_COHORT_LTV,
    "new_returning_users": SQL_NEW_RETURNING,
    "jaccard_weeks": SQL_JACCARD_WEEKS,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "entity_resolution": SQL_ENTITY_RESOLUTION,
    "sssp_weighted": SQL_SSSP,
    "pricing_summary": SQL_PRICING,
    "latest_event_per_user": SQL_LATEST_EVENT,
    "late_events": SQL_LATE_EVENTS,
    "ohlc_resample": SQL_OHLC,
    "weighted_mean": SQL_WEIGHTED_MEAN,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "share_of_total": SQL_SHARE_OF_TOTAL,
    "multi_format_union": SQL_MULTI_FORMAT_UNION,
    "profile_table": SQL_PROFILE_TABLE,
    "contrastive_pairs": SQL_CONTRASTIVE,
    "group_kfold": SQL_GROUP_KFOLD,
    "table_diff": SQL_TABLE_DIFF,
    "robust_zscore": SQL_ROBUST_ZSCORE,
    "merge_upsert": SQL_MERGE_UPSERT,
    "scd2_history": SQL_SCD2,
    "validate_orders": SQL_VALIDATE_ORDERS,
    "region_customer_stats": SQL_REGION_CUSTOMER,
    "hash_split_counts": SQL_HASH_SPLIT,
    "derived_physics": SQL_PHYSICS,
    "url_resolve": SQL_URL,
    "dedup_exact_prefix": SQL_DEDUP,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "token_stats": SQL_TOKENS,
    "event_windows": SQL_WINDOWS,
    "top_orders": SQL_TOP_ORDERS,
    "anti_join_resume": SQL_ANTI_JOIN,
    "knn_cosine": SQL_KNN,
    "hardware_prep": SQL_HARDWARE_PREP,
    "numeric_suffix": SQL_SUFFIX,
    "project_rename": SQL_PROJECT,
    "fuzzy_country": SQL_FUZZY_COUNTRY,
    "token_bpe": SQL_TOKEN_BPE,
    "content_fingerprint": SQL_FINGERPRINT,
    "embedding_dup_pairs": SQL_EMB_DUP,
    "information_extraction": SQL_INFO_EXTRACT,
    "eval_char_metrics": SQL_EVAL_CHAR,
    "eval_summary": SQL_EVAL_SUMMARY,
    "gold_from_epoch": SQL_GOLD,
    "epoch_coerce": SQL_EPOCH_COERCE,
    "token_quantiles": SQL_TOKEN_QUANTILES,
    "sessionize": SQL_SESSIONIZE,
    "props_extract": SQL_PROPS,
    "sample_seeded": SQL_SAMPLE,
    "expanding_mean": SQL_EXPANDING,
    "quality_score": SQL_QUALITY,
    "asof_join": SQL_ASOF,
    "range_join": SQL_RANGE_JOIN,
    "shuffle_join": SQL_SHUFFLE_JOIN,
    "sortmerge_join": SQL_SORTMERGE_JOIN,
    "salted_join": SQL_SALTED_JOIN,
    "rank_in_group": SQL_RANK,
    "window_lag": SQL_WINDOW_LAG,
    "distinct_users": SQL_DISTINCT_USERS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
    "stratified_sample": SQL_STRATIFIED,
    "sliding_window": SQL_SLIDING_WINDOW,
    "grouped_quantiles": SQL_GROUPED_QUANTILES,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "ssjoin_jaccard": SQL_SSJOIN,
    "minhash_recall_gate": SQL_MINHASH_RECALL_GATE,
    "pii_redact": f"SELECT doc_id, {_sql_redact_expr()} AS text FROM documents",
    "decontaminate": SQL_DECONTAM,
    "repetition_stats": SQL_REPETITION,
    "domain_cap": SQL_DOMAIN_CAP,
    "pack_sequences": SQL_PACK,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "text_clean": SQL_TEXT_CLEAN,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "rag_prep": SQL_RAG_PREP,
    "heavy_tokens": SQL_HEAVY_TOKENS,
    "heavy_tokens_sketch": SQL_HEAVY_TOKENS,
    "anti_join_bloom": SQL_ANTI_JOIN,
    "curate_corpus": SQL_CURATE,
    "value_histogram": SQL_HISTOGRAM,
    "event_sequences": SQL_EVENT_SEQ,
    "outlier_filter": SQL_OUTLIER,
    "winsorize": SQL_WINSORIZE,
    "melt_measures": SQL_MELT,
    "pivot_events": SQL_PIVOT,
    "bucketed_join": SQL_BUCKETED_JOIN,
    "set_intersect": SQL_SET_INTERSECT,
    "set_except": SQL_SET_EXCEPT,
    "rollup_orders": SQL_ROLLUP,
    "ntile_orders": SQL_NTILE,
    "tfidf_top_terms": SQL_TFIDF,
    "vocab_build": SQL_VOCAB,
    "inverted_index": SQL_INVERTED_INDEX,
    "bigram_lm_score": SQL_BIGRAM_LM,
    "perplexity_buckets": SQL_PERPLEXITY_BUCKETS,
    "media_dims_gate": SQL_MEDIA_DIMS_GATE,
    "domain_mixture": SQL_DOMAIN_MIXTURE,
    "passage_dedup": SQL_PASSAGE_DEDUP,
    "left_join_orders": SQL_LEFT_JOIN,
    "grouped_regression": SQL_GROUPED_REGRESSION,
    "cube_orders": SQL_CUBE,
    "full_outer_join": SQL_FULL_OUTER,
    "zscore_normalize": SQL_ZSCORE,
    "domain_quality_gate": SQL_DOMAIN_GATE,
    "fuzzy_name_join": SQL_FUZZY_JOIN,
    "knn_graph": SQL_KNN_GRAPH,
    "q3_shipping": SQL_Q3,
    "moving_avg": SQL_MOVING_AVG,
    "ewma": SQL_EWMA,
    "tdigest_rank_check": SQL_TDIGEST_RANK_CHECK,
    "hll_rank_check": SQL_HLL_RANK_CHECK,
    "cms_rank_check": SQL_CMS_RANK_CHECK,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "cohort_retention": SQL_COHORT_RETENTION,
    "lang_id": SQL_LANG_ID,
    "cc_redact": SQL_CC_REDACT,
    "funnel_users": SQL_FUNNEL,
    "fk_audit": SQL_FK_AUDIT,
    "media_decode_bmp": SQL_MEDIA_BMP,
    "media_decode_ppm": SQL_MEDIA_PPM,
    "media_decode_wav": SQL_MEDIA_WAV,
    "global_rank": SQL_GLOBAL_RANK,
    "grouped_mode": SQL_GROUPED_MODE,
    "dense_rank": SQL_DENSE_RANK,
    "rank_gaps": SQL_RANK_GAPS,
    "window_lead_cume": SQL_WINDOW_LEAD_CUME,
    "event_islands": SQL_EVENT_ISLANDS,
    "time_gap_fill": SQL_TIME_GAP_FILL,
    "corr_matrix": SQL_CORR_MATRIX,
    "bloom_point_lookup": SQL_BLOOM_POINT_LOOKUP,
    "q10_returned_items": SQL_Q10,
    "kcore_members": SQL_KCORE,
    "ppr_scores": SQL_PPR,
    "ngram_span_dedup": SQL_NGRAM_SPAN_DEDUP,
    "event_transitions": SQL_EVENT_TRANSITIONS,
    "interval_coverage": SQL_INTERVAL_COVERAGE,
    "debounce_events": SQL_DEBOUNCE_EVENTS,
    "q5_region_revenue": SQL_Q5,
    "q17_small_quantity": SQL_Q17,
    "q18_large_orders": SQL_Q18,
    "q4_order_priority": SQL_Q4,
    "q6_forecast_revenue": SQL_Q6,
    "q7_volume_shipping": SQL_Q7,
    "q8_market_share": SQL_Q8,
    "q12_priority_lines": SQL_Q12,
    "q13_order_counts": SQL_Q13,
    "q14_promo_revenue": SQL_Q14,
    "q15_top_supplier": SQL_Q15,
    "q16_supplier_variety": SQL_Q16,
    "q19_special_revenue": SQL_Q19,
    "q22_dormant_customers": SQL_Q22,
    "q2_min_cost_supplier": SQL_Q2,
    "q9_product_profit": SQL_Q9,
    "q11_important_parts": SQL_Q11,
    "q20_dominant_suppliers": SQL_Q20,
    "q21_waiting_suppliers": SQL_Q21,
    "copurchase_pairs": SQL_COPURCHASE,
    "ab_ttest": SQL_AB_TTEST,
    "psi_drift": SQL_PSI_DRIFT,
    "type_entropy": SQL_TYPE_ENTROPY,
    "bfs_hops": SQL_BFS_HOPS,
    "pagerank": SQL_PAGERANK,
    "label_propagation": SQL_LABEL_PROP,
    "pareto_orders": SQL_PARETO,
    "auc_score": SQL_AUC,
    "gini_revenue": SQL_GINI,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "stream_self_join": SQL_STREAM_SELF_JOIN,
    "attribution_last_touch": SQL_ATTRIBUTION,
    "chi2_independence": SQL_CHI2,
    "clustering_coeff": SQL_CLUSTERING_COEFF,
    "ngram_novelty": SQL_NGRAM_NOVELTY,
    "rfm_segments": SQL_RFM,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "rolling_median": SQL_ROLLING_MEDIAN,
    "decayed_value": SQL_DECAYED_VALUE,
    "audience_segments": SQL_AUDIENCE,
    "user_paths": SQL_USER_PATHS,
    "zipf_slope": SQL_ZIPF,
    "rolling_distinct_users": SQL_ROLLING_DISTINCT,
    "pareto_8020": SQL_PARETO_8020,
    "hourly_anomaly": SQL_HOURLY_ANOMALY,
    "seq_patterns": SQL_SEQ_PATTERNS,
    "snapshot_reads": SQL_SNAPSHOT_READS,
    "schema_evolution": SQL_SCHEMA_EVOLUTION,
    "cdc_apply": SQL_CDC_APPLY,
    "source_divergence": SQL_SOURCE_DIVERGENCE,
    "readability_score": SQL_READABILITY,
    "k_anonymity": SQL_K_ANON,
    "part_recs": SQL_PART_RECS,
    "rapid_reorder": SQL_RAPID_REORDER,
    # mmr_select is rows-only: the greedy argmax recursion has no SQL
    # form; the greedy invariant is property-tested in
    # tests/test_queries_units.py::TestMmrGreedyInvariant.
    # pca_project is rows-only (no SQL eigendecomposition) — numpy-parity
    # pytest covers the values.
    # (hll_distinct / hll_grouped / cms_token_freq moved to value-checked
    # in round 5: md5-keyed registers are SQL-replayable integers;
    # price_quantiles_tdigest value-checks via quantile_cont bounds.)
    "winnow_fingerprints": SQL_WINNOW,
    # lang_id / minhash / simhash / knn_lsh / media_* are not
    # SQL-expressible → rows-only driver check; pytest goldens + recall
    # properties cover their semantics.  (winnow moved to value-checked
    # in round 4: polynomial-mod-2^31-1 gram hash is SQL-expressible.)
}


#: rows-only query → its driver-checkable companion (the gate or md5
#: twin whose green oracle pins the same kernel).  Used to keep each
#: pair ADJACENT in the registry iteration order so a sampler that
#: walks the dict re-checks them together (round-4 verdict item 5);
#: several ANN variants share one composite gate, which sits after the
#: first of them.
COMPANION_OF = {
    "boilerplate_strip": "boilerplate_gate",
    "quality_classifier": "quality_classifier_gate",
    "unigram_train": "unigram_roundtrip_gate",
    "graph_diameter": "hyperball_gate",
    "span_corruption": "span_corruption_gate",
    "cluster_topterms": "cluster_topterms_gate",
    "rag_index_search": "rag_recall_gate",
    "minhash_dedup": "minhash_recall_gate",
    "near_dedup_corpus": "near_dedup_md5",
    "simhash_values": "simhash_md5",
    "simhash_pairs": "simhash_md5_pairs",
    "knn_lsh": "ann_recall_gates",
    "media_decode": "media_dims_gate",
    "eval_semantic": "eval_semantic_gate",
    "qa_extract": "qa_extract_gate",
    "training_order": "training_order_gate",
    "kmeans_clusters": "kmeans_quality_gate",
    "semantic_dedup": "semantic_dedup_gate",
    "incremental_dedup": "incremental_dedup_gate",
    "bpe_train": "bpe_roundtrip_gate",
    "pretokenize_corpus": "pretokenize_gate",
    "pca_project": "pca_gate",
    "mmr_select": "mmr_gate",
    "isotonic_calibration": "isotonic_gate",
    "incremental_ingest": "incremental_ingest_gate",
}


def _reorder_companions(d: dict) -> dict:
    """Same keys, same callables — each base query immediately followed
    by its companion in iteration order (companions are deferred from
    their original position to just after their base)."""
    deferred = {g for b, g in COMPANION_OF.items() if b in d and g in d}
    out = {}
    for k in d:
        if k in out or k in deferred:
            continue
        out[k] = d[k]
        g = COMPANION_OF.get(k)
        if g in d and g not in out:
            out[g] = d[g]
    for k in d:  # companions whose base never appeared (defensive)
        if k not in out:
            out[k] = d[k]
    assert set(out) == set(d)
    return out


QUERIES = _reorder_companions(QUERIES)
