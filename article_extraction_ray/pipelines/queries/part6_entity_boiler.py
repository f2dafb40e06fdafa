"""Query registry part6 entity boiler — assembled into the
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

    from ...functions.strings import jaro_winkler_similarity
    from ...stages.graph import connected_components

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
    from ...stages.graph import sssp
    from ..tabular import md5_lt_mask

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

    from ..tabular import md5_digest_words

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
        from ..tabular import md5_digest_words

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

    from ...sources.io import corpus_num_rows

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

    from ...sources.synth import ensure_corpus_parquet
    from ...stages.boilerplate import DensityExtractStage

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
    from ..tabular import interval_join

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
    from ...stages.logreg import logreg_fit, logreg_score

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
    from ...stages.unigram_lm import unigram_lm_train

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
    from ...stages.hyperball import hyperball
    from ..tabular import md5_lt_mask

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
    from ...stages.unigram_lm import UnigramEncodeStage, unigram_lm_train

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

    from ..tabular import md5_digest_words, md5_lt_mask, shuffle_join

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
    from ..tabular import md5_digest_words

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


