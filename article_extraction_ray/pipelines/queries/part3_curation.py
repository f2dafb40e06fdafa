"""Query registry part3 curation — assembled into the
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
    from ...stages.curation import PII_PATTERNS, redact_patterns

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)
    return redact_patterns(ds, PII_PATTERNS + _REDACT_DEMO)


def _sql_redact_expr() -> str:
    from ...stages.curation import PII_PATTERNS

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
    from ...stages.curation import benchmark_gram_set, mark_contaminated

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
    from ...stages.curation import repetition_stats

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
    from ..tabular import top_k_per_group

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
    from ...stages.curation import (
        benchmark_gram_set,
        filter_by_repetition,
        mark_contaminated,
    )
    from ...stages.scan import pack_sequences
    from ..tabular import top_k_per_group

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
    from ..tabular import topk

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
    from ...stages.sketch import heavy_hitters_mg

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

    from ...stages.sketch import BloomFilter

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
    from ..tabular import shuffle_join

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

    from ...stages.curation import redact_credit_cards

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

    from ..tabular import dedup_exact_min, grouped_aggregate

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

    from ...stages.scan import pack_sequences

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

    from ...sources.bucketed import bucketed_join, write_bucketed

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
    from ..tabular import set_op

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
    from ..tabular import set_op

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
    from ..tabular import shuffle_join

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
    from ..tabular import shuffle_join

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

    from ..tabular import shuffle_join

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
    from ..tabular import shuffle_join

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
    from ..tabular import shuffle_join

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
    from ...stages.bpe import bpe_train

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

    from ...stages.dedup import minhash_dedup_incremental, write_minhash_index

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
    from ...stages.clustering import semantic_dedup

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
        from ...functions.strings import jaro_winkler_similarity

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
    from ...stages.bpe import bpe_train, encode_stage_task

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

    from ...stages.similarity import (
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

    from ..tabular import _BROADCAST_BUDGET_BYTES, join as join_route, topk

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
    from ...stages.sketch_parity import cms_md5_partial, md5_u64

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

    from ...stages.sketch import cms_build, cms_estimate

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

    from ...sources.io import corpus_num_rows
    from ..tabular import shuffle_semi_filter

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
    from ...stages.multimodal import ImageDecodeStage, make_bmp

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
    from ...stages.multimodal import ImageDecodeStage, make_ppm

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
    from ...stages.multimodal import AudioDecodeStage, make_wav

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
    from ...stages.bpe import bpe_train, encode_stage_task
    from ...stages.curation import benchmark_gram_set, filter_by_repetition, mark_contaminated
    from ...stages.scan import pack_sequences
    from ..tabular import top_k_per_group

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

    from ..tabular import grouped_aggregate, salted_join

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
    from ...stages.graph import triangle_count
    from ..tabular import md5_lt_mask

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

    from ..tabular import shuffle_semi_filter

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


