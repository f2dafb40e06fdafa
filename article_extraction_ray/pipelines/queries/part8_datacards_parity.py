"""Query registry part8 datacards parity — assembled into the
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

    from ..tabular import md5_digest_words

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
    from ...stages.text_stats import quality_batch

    from ..tabular import md5_digest_words

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
        from ...stages.similarity import knn_graph_blocked

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
    from ..tabular import md5_digest_words

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

    from ...stages.multimodal import make_bmp

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

    from ..tabular import md5_digest_words

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
    from ...stages.sketch_parity import hll_md5_partial

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
    from ...stages.sketch_parity import simhash_md5_batch

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
    from ...stages.sketch_parity import minhash_md5_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"], split=True)

    def mh(batch: pa.Table) -> pd.DataFrame:
        return minhash_md5_batch(
            batch["doc_id"].to_numpy(zero_copy_only=False),
            batch["text"].to_pylist(),
        )

    return ds.map_batches(mh, batch_format="pyarrow").sort(["doc_id", "perm"])


def _minhash_sql() -> str:
    from ...stages.sketch_parity import MINHASH_A, MINHASH_B, MINHASH_PRIME

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
    from ...stages.similarity import (
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


