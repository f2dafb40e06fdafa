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

from ...functions.matching import build_country_index, select_country_id
from ...functions.numeric import parse_numeric
from ...functions.physics import DEFAULT_MFU, DEFAULT_PUE, derive_physics_arrays
from ...functions.urls import resolve_url
from ...state.broadcast import Broadcast
from ..tabular import (
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
    from ...sources.io import corpus_num_rows

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

        from ..tabular import shuffle_semi_filter

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
    from ...pipelines.eval import _HashEncoder

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

    from ...pipelines.eval import _HashEncoder
    from ...stages.clustering import kmeans_fit
    from ...stages.pq import knn_ivfpq, load_pq_index, pq_fit, save_pq_index

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

    from ...state.compact import compact_parquet

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

    from ...sources.zorder import write_zordered

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

    from ...sources.zorder import prune_files

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

    from ...state.bloom_index import point_lookup, write_bloom_indexed

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
    from ..tabular import shuffle_join

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

    from ..tabular import shuffle_join

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
    from ..tabular import shuffle_join

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

    from ...stages.clustering import kmeans_assign, kmeans_fit
    from ..tabular import shuffle_join

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
    from ...stages.denoise import span_corrupt

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

    from ..tabular import dedup_exact_min

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
    from ..tabular import shuffle_join

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
    from ..tabular import shuffle_join

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
    from ...stages.text_stats import quality_batch
    from ..tabular import dedup_keep_best

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
    from ...stages.text_stats import token_count_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


SQL_TOKEN_BPE = r"""
SELECT doc_id,
       CAST(coalesce(array_length(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens_ws,
       CAST(coalesce(array_length(regexp_extract_all(text, '\w+|[^\w\s]')), 0) AS BIGINT) AS n_tokens_bpe
FROM documents
"""


def q_content_fingerprint(sf_dir: str):
    from ...stages.text_stats import content_fingerprint_batch

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
    from ...stages.text_stats import LangIdStage

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow", concurrency=(1, 4))


def _sql_lang_id() -> str:
    from ...stages.text_stats import _PROFILES

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
    from ...stages.text_stats import quality_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow")


#: SQL mirror of stages.text_stats.quality_batch — same split rule
#: (\S+ runs), same ASCII-alpha predicate, same stopword set, identical
#: arithmetic order so the composite is bit-comparable.
def _sql_stops() -> str:
    from ...stages.text_stats import _STOP_EN

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
    from ...stages.text_stats import winnow_batch

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
    from ...stages.text_stats import _SHINGLE, _WINNOW_BASE, _WINNOW_MOD

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
    from ...stages.dedup import minhash_dup_pairs

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
    from ...stages.dedup import near_dedup_keep_min
    from ..tabular import grouped_aggregate

    corpus = _with_injected_dupes(sf_dir).materialize()
    # the one-call removal operator owns the whole routed pipeline:
    # exact-content pre-pass, PAIR_BUDGET-routed LSH pairs, size-routed
    # connected components, loser_budget-routed anti-filter
    survivors = near_dedup_keep_min(
        corpus, threshold=0.5, loser_budget=loser_budget
    )

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
    from ...stages.dedup import ssjoin_exact

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
    from ...stages.dedup import minhash_dup_pairs, ssjoin_exact

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
    from ...stages.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_with_injected_dupes(sf_dir), max_hamming=3)


def q_simhash_values(sf_dir: str):
    from ...stages.dedup import simhash_batch

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

    from ...stages.dedup import embedding_dup_pairs, embedding_dup_pairs_blocked

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

    from ...stages.similarity import knn_lsh

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
    from ...stages.similarity import knn_lsh_shuffle

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
    from ...stages.multimodal import ImageDecodeStage, synth_media_table

    import ray.data as rd

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        refs = [f"img://doc/{i}" for i in batch["doc_id"].to_pylist()]
        return synth_media_table(refs, "image")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    return media.map_batches(ImageDecodeStage, batch_format="pyarrow", concurrency=(1, 4))


def q_media_frames(sf_dir: str):
    from ...stages.multimodal import FrameSampleStage, synth_media_table

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
    from ...stages.field_extract import extract_information

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
    from ..eval import char_metrics_batch

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
    from ..eval import char_metrics_batch

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
    from ..eval import score_results

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
    from ..ingest import build_gold_information

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

