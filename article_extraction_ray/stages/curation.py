"""Corpus-curation stages: pattern redaction, benchmark decontamination,
repetition statistics — the filter/rewrite layer a training-data
pipeline runs between raw ingestion and dedup.

All kernels are batch-vectorized: token work happens on the FLAT Arrow
token buffer of the whole batch (one ``pc.split_pattern`` call, one
``pd.util.hash_array`` pass, numpy window arithmetic over offsets) —
never a Python loop per document.  N-grams are compared as 64-bit
polynomial hashes of token hashes; at web scale the benchmark side
stays a broadcast ``np.searchsorted`` probe (benchmark suites are
small by construction — thousands of documents — while the corpus
streams).

Determinism: pandas' ``hash_array`` uses a fixed siphash key, so gram
hashes are stable across processes, block layouts, and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.broadcast import Broadcast

# ---------------------------------------------------------------------------
# pattern redaction (PII scrubbing shape)
# ---------------------------------------------------------------------------

# Production scrub list (RE2 syntax — the same dialect pyarrow and
# DuckDB compile, so the SQL oracle runs the identical automaton).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[- ]\d{2}[- ]\d{4}\b", "<SSN>"),
    (r"\b(?:\+?\d{1,2}[ -])?\(?\d{3}\)?[ -]\d{3}[ -]\d{4}\b", "<PHONE>"),
]


_CC_RE = r"\b\d(?:[ -]?\d){12,15}\b"  # separators only BETWEEN digits


def luhn_valid(digits: str) -> bool:
    """Luhn checksum over the digit characters of ``digits``."""
    ds_ = [int(c) for c in digits if c.isdigit()]
    if not 13 <= len(ds_) <= 19:
        return False
    total = 0
    for i, d in enumerate(reversed(ds_)):
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def redact_credit_cards(ds, *, column: str = "text", placeholder: str = "<CC>"):
    """Checksum-validated credit-card redaction: the 13–16-digit regex
    alone redacts every order number and timestamp-ish digit run; the
    Luhn check kills those false positives, exactly like production PII
    scrubbers.

    Shape: the RE2 scan finds candidates vectorized
    (``pc.extract_regex`` over the contiguous buffer); only MATCHES
    (rare by construction) reach the per-candidate Python checksum, so
    the hot path stays regex-bound.  Candidates failing Luhn are left
    untouched."""
    import re as _re

    rex = _re.compile(_CC_RE)

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch[column]
        has = pc.match_substring_regex(col, _CC_RE).to_numpy(zero_copy_only=False)
        if not has.any():
            return batch
        texts = col.to_pylist()
        for i in np.flatnonzero(has):
            texts[i] = rex.sub(
                lambda m: placeholder if luhn_valid(m.group(0)) else m.group(0),
                texts[i],
            )
        idx = batch.schema.get_field_index(column)
        return batch.set_column(idx, column, pa.array(texts, type=pa.string()))

    return ds.map_batches(scrub, batch_format="pyarrow")


def redact_patterns(ds, patterns: list[tuple[str, str]], *, column: str = "text"):
    """Replace every regex match with its placeholder, in order.

    One ``pc.replace_substring_regex`` call per pattern per batch — the
    RE2 scan runs over the contiguous string buffer, no per-row Python.
    Patterns apply sequentially (pattern i sees the output of i-1),
    matching chained ``regexp_replace(..., 'g')`` semantics.
    """

    idx_cache: dict[str, int] = {}

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch[column]
        for pat, repl in patterns:
            col = pc.replace_substring_regex(col, pattern=pat, replacement=repl)
        if column not in idx_cache:
            idx_cache[column] = batch.schema.get_field_index(column)
        return batch.set_column(idx_cache[column], column, col)

    return ds.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# flat token / n-gram kernels (shared by decontamination + repetition)
# ---------------------------------------------------------------------------

_GRAM_MULT = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _flat_tokens(col: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """Split a string column on single spaces → (token_hashes, offsets).

    ``offsets[i]:offsets[i+1]`` is row i's token slice in the flat hash
    array.  Single-space split (not ``\\s+``) mirrors SQL
    ``string_split(text, ' ')`` exactly, empty string → one empty token.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.split_pattern(col, " ")
    flat = lst.values
    offsets = np.asarray(lst.offsets, dtype=np.int64)
    hashes = pd.util.hash_array(np.asarray(flat)) if len(flat) else np.empty(0, np.uint64)
    return hashes, offsets


def _ngram_hashes(
    tok_hashes: np.ndarray, offsets: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """All length-``n`` token windows that stay inside one row.

    Returns ``(gram_hashes, row_of_gram)``.  The window hash is the
    degree-(n-1) polynomial of the n token hashes — n vectorized
    passes over the flat array, independent of row count.
    """
    total = len(tok_hashes)
    if total < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    n_win = total - n + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(n_win, dtype=np.uint64)
        for j in range(n):
            acc = acc * _GRAM_MULT + tok_hashes[j : n_win + j]
    widths = np.diff(offsets)
    row_of_tok = np.repeat(np.arange(len(widths), dtype=np.int64), widths)
    valid = row_of_tok[: n_win] == row_of_tok[n - 1 :]
    return acc[valid], row_of_tok[:n_win][valid]


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def benchmark_gram_set(bench_ds, *, n: int = 8, text_col: str = "text") -> np.ndarray:
    """Collect the benchmark side's distinct n-gram hashes, sorted.

    The benchmark suite is the SMALL side (eval sets, not the corpus):
    each batch emits its local distinct hashes; the driver unions the
    partials.  Output is a sorted uint64 array ready for
    ``np.searchsorted`` probes.
    """

    def partial(batch: pa.Table) -> pd.DataFrame:
        th, off = _flat_tokens(batch[text_col])
        grams, _ = _ngram_hashes(th, off, n)
        return pd.DataFrame({"gram": np.unique(grams)})

    parts = bench_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.unique(parts["gram"].to_numpy().astype(np.uint64))


def mark_contaminated(
    ds,
    bench_grams: np.ndarray,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = False,
):
    """Flag every corpus document sharing ≥1 n-gram with the benchmark.

    The standard eval-set decontamination rule (13-gram overlap in
    GPT-3/PaLM data work; ``n`` is configurable).  The benchmark hash
    set broadcasts once via ``ray.put``; each corpus batch computes its
    gram hashes and probes with one ``np.searchsorted`` — no shuffle,
    the corpus streams through untouched.
    Output: (id_col, contaminated bool) per input row — or, with
    ``keep_clean=True``, the input rows (full schema) minus the
    contaminated ones (the pipeline-filter form).
    """
    handle = Broadcast(np.asarray(bench_grams, dtype=np.uint64))

    def contaminated_mask(batch: pa.Table) -> np.ndarray:
        bench = handle.get()
        th, off = _flat_tokens(batch[text_col])
        grams, row_of = _ngram_hashes(th, off, n)
        hit = np.zeros(batch.num_rows, dtype=bool)
        if len(grams) and len(bench):
            pos = np.searchsorted(bench, grams)
            in_range = pos < len(bench)
            is_hit = np.zeros(len(grams), dtype=bool)
            is_hit[in_range] = bench[pos[in_range]] == grams[in_range]
            np.logical_or.at(hit, row_of[is_hit], True)
        return hit

    def flag(batch: pa.Table) -> pa.Table:
        hit = contaminated_mask(batch)
        return pa.Table.from_arrays(
            [batch[id_col], pa.array(hit)], names=[id_col, "contaminated"]
        )

    def drop(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~contaminated_mask(batch)))

    return ds.map_batches(drop if keep_clean else flag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def _repetition_metrics(
    col: "pa.ChunkedArray | pa.Array", n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_tok, n_distinct, top_bigram_count) per row, whole-batch
    vectorized: one lexsort of (row, token_hash) pairs for distinct
    counts, one of (row, bigram_hash) with run-length encoding +
    ``np.maximum.at`` for the top-bigram count."""
    th, off = _flat_tokens(col)
    n_tok = np.diff(off)
    row_of_tok = np.repeat(np.arange(n_rows, dtype=np.int64), n_tok)

    # distinct tokens per row: sort (row, hash), count group starts
    order = np.lexsort((th, row_of_tok))
    r_s, h_s = row_of_tok[order], th[order]
    new = np.ones(len(h_s), dtype=bool)
    if len(h_s) > 1:
        new[1:] = (r_s[1:] != r_s[:-1]) | (h_s[1:] != h_s[:-1])
    n_distinct = np.bincount(r_s[new], minlength=n_rows).astype(np.int64)

    # top bigram count per row
    grams, row_of_g = _ngram_hashes(th, off, 2)
    top = np.zeros(n_rows, dtype=np.int64)
    if len(grams):
        order = np.lexsort((grams, row_of_g))
        r_s, g_s = row_of_g[order], grams[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (r_s[1:] != r_s[:-1]) | (g_s[1:] != g_s[:-1])))
        )
        run_len = np.diff(np.append(starts, len(g_s)))
        np.maximum.at(top, r_s[starts], run_len)
    return n_tok, n_distinct, top


def filter_by_repetition(
    ds,
    *,
    min_distinct_ratio: float = 0.0,
    max_top_bigram_frac: float = 1.0,
    text_col: str = "text",
):
    """Drop rows failing the repetition quality rules (pipeline-filter
    form of :func:`repetition_stats`; ratios are the same single IEEE
    divisions, so thresholds cut identically to the SQL oracle)."""

    def flt(batch: pa.Table) -> pa.Table:
        n_tok, n_distinct, top = _repetition_metrics(batch[text_col], batch.num_rows)
        safe = np.maximum(n_tok, 1).astype(np.float64)
        keep = (n_distinct.astype(np.float64) / safe >= min_distinct_ratio) & (
            (top * 2).astype(np.float64) / safe <= max_top_bigram_frac
        )
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


def repetition_stats(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document repetition metrics: token count, distinct-token
    ratio, and the token fraction covered by the most frequent bigram
    (Rae et al. 2021 "Gopher" repetition filters, token-level).

    Whole-batch vectorized: one lexsort of (row, token_hash) pairs for
    distinct counts, one of (row, bigram_hash) with run-length
    encoding + ``np.maximum.at`` for the top-bigram count.  Float
    outputs are single IEEE divisions of exact integers — bit-identical
    to the SQL oracle, no rounding needed.
    """

    def stats(batch: pa.Table) -> pa.Table:
        n_tok, n_distinct, top = _repetition_metrics(batch[text_col], batch.num_rows)
        safe = np.maximum(n_tok, 1).astype(np.float64)
        return pa.Table.from_arrays(
            [
                batch[id_col],
                pa.array(n_tok),
                pa.array(n_distinct),
                pa.array(n_distinct.astype(np.float64) / safe),
                pa.array((top * 2).astype(np.float64) / safe),
            ],
            names=[id_col, "n_tok", "n_distinct", "distinct_ratio", "top_bigram_frac"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")
