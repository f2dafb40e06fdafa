"""Query registry part4 ngram families — assembled into the
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
    from ...stages.clustering import pca_project

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
    from ..tabular import md5_lt_mask

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

    from ...stages.graph import _SWEEP_EDGE_BLOCKS

    e = (
        broadcast_join(li, orders.rename_columns(["l_orderkey", "o_custkey"]), "l_orderkey")
        .map_batches(edges, batch_format="pandas")
        .materialize()
    )
    # bound the per-hop re-scan task count (see graph._SWEEP_EDGE_BLOCKS)
    if e.num_blocks() > _SWEEP_EDGE_BLOCKS:
        e = e.repartition(_SWEEP_EDGE_BLOCKS).materialize()

    import ray.data as rd

    from ..tabular import shuffle_semi_filter

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
    from ...stages.graph import pagerank

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
    from ...stages.graph import label_propagation

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
    from ..tabular import md5_lt_mask

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
        from ..tabular import shuffle_semi_filter

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
            from ...stages.tdigest import tdigest_column, tdigest_quantile

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
    from ...stages.similarity import _as_matrix

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

    from ...stages.similarity import _as_matrix, _normalize
    from ..tabular import topk

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
    from ..tabular import topk

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
    from ...stages.sketch import hll_estimate, hll_merge, hll_partial

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
    from ..tabular import top_k_per_group

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
    from ..tabular import topk

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

    from ...state.snapshots import commit_snapshot, read_snapshot

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


