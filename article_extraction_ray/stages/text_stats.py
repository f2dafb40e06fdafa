"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting — the per-document metadata a training-data
pipeline derives before filtering/dedup.

All stages are vectorized-or-cheap ``map_batches`` transforms; the
language identifier holds its compiled profiles in ``__init__`` (actor
pool shape).  Everything is deterministic: no model downloads, no RNG.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Small stopword profiles for an n-gram/stopword-voting heuristic.
_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it was for on are with as at by this have from or had not be".split()),
    "es": frozenset("el la de que y en un ser se no haber por con su para como estar tener le lo todo pero".split()),
    "fr": frozenset("le la de et les des en un une du que est pour qui dans par sur au avec ne se ce pas".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an".split()),
}

_WORD = re.compile(r"[^\W\d_]+", re.UNICODE)


class LangIdStage:
    """Stopword-voting language identifier (n-gram heuristic class).

    Ties and zero-evidence texts resolve to "und" (undetermined).
    """

    def __init__(self, profiles: dict[str, frozenset[str]] | None = None):
        self.profiles = profiles or _PROFILES
        self.langs = sorted(self.profiles)
        self.word = _WORD

    def classify(self, text: str) -> str:
        toks = [t.lower() for t in self.word.findall(text or "")]
        if not toks:
            return "und"
        best_lang, best_hits = "und", 0
        for lang in self.langs:
            hits = sum(1 for t in toks if t in self.profiles[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized vote: ONE regex split over the contiguous string
        buffer, one ``pc.is_in`` membership probe per language over the
        flattened token array, per-doc segment sums via ``reduceat`` —
        no per-document Python (``classify`` stays as the scalar
        reference for parity tests)."""
        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(col), r"[^\p{L}]+")
        flat = toks.values if len(toks) else pa.array([], type=pa.string())
        offsets = np.asarray(toks.offsets, dtype=np.int64) if len(toks) else np.zeros(1, np.int64)
        n = len(batch)
        hits = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(flat):
            starts = offsets[:-1]
            for j, lang in enumerate(self.langs):
                m = pc.is_in(
                    flat, value_set=pa.array(sorted(self.profiles[lang]), type=pa.string())
                ).to_numpy(zero_copy_only=False).astype(np.int64)
                # per-doc segment sums; empty docs (start == end) get 0
                sums = np.add.reduceat(np.r_[m, 0], np.minimum(starts, len(m)))
                hits[:, j] = np.where(starts == offsets[1:], 0, sums[: n])
        best = hits.argmax(axis=1)  # first max wins — same as classify()'s >
        langs_arr = np.array(self.langs, dtype=object)
        preds = np.where(hits.max(axis=1) > 0, langs_arr[best], "und")
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(preds, type=pa.string())],
            names=["doc_id", "lang_pred"],
        )


_STOP_EN = _PROFILES["en"]


def quality_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc quality signals: token count, mean word length, alpha
    ratio, stopword ratio, and a [0,1] composite score.

    The composite mirrors common pretraining-data heuristics (length in
    a sane band, words mostly alphabetic, some stopwords); the exact
    weights are this engine's own definition — documented, deterministic.
    """
    ids = batch[id_col]
    texts = batch[text_col].to_pylist()
    n_tokens = np.zeros(len(texts), dtype=np.int64)
    mean_word_len = np.zeros(len(texts))
    alpha_ratio = np.zeros(len(texts))
    stop_ratio = np.zeros(len(texts))
    for i, t in enumerate(texts):
        t = t or ""
        toks = t.split()
        n_tokens[i] = len(toks)
        if toks:
            mean_word_len[i] = sum(len(w) for w in toks) / len(toks)
            alpha_ratio[i] = sum(w.isalpha() for w in toks) / len(toks)
            stop_ratio[i] = sum(w.lower() in _STOP_EN for w in toks) / len(toks)
    length_ok = np.clip(n_tokens / 20.0, 0, 1) * np.clip((5000 - n_tokens) / 5000.0, 0, 1)
    word_ok = np.clip((mean_word_len - 2) / 4.0, 0, 1) * np.clip((12 - mean_word_len) / 6.0, 0, 1)
    score = 0.4 * length_ok + 0.3 * alpha_ratio + 0.2 * word_ok + 0.1 * np.clip(stop_ratio * 5, 0, 1)
    # raw doubles, no rounding: the arithmetic is order-identical to the
    # SQL oracle, so values compare bit-exact — a round(6) on both sides
    # was measured to diverge on genuine half-ties (banker's vs
    # half-away-from-zero)
    return pa.Table.from_arrays(
        [
            ids,
            pa.array(n_tokens),
            pa.array(mean_word_len),
            pa.array(alpha_ratio),
            pa.array(stop_ratio),
            pa.array(score),
        ],
        names=[id_col, "n_tokens", "mean_word_len", "alpha_ratio", "stop_ratio", "quality_score"],
    )


_BPEISH = re.compile(r"\w+|[^\w\s]")


def token_count_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Whitespace and BPE-ish (word/punct regex) token counts, vectorized
    via pyarrow compute kernels."""
    ws = pc.cast(pc.count_substring_regex(batch[text_col], r"\S+"), pa.int64())
    bpe = pc.cast(pc.count_substring_regex(batch[text_col], _BPEISH.pattern), pa.int64())
    return pa.Table.from_arrays(
        [batch[id_col], ws, bpe], names=[id_col, "n_tokens_ws", "n_tokens_bpe"]
    )


def content_fingerprint_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """md5 fingerprint of the whitespace-normalized, lowercased content —
    the exact-dup key.  SQL-oracle-able:
    md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))."""
    norm = pc.utf8_lower(pc.replace_substring_regex(pc.utf8_trim_whitespace(batch[text_col]), r"\s+", " "))
    digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm.to_pylist()]
    return pa.Table.from_arrays(
        [batch[id_col], pa.array(digests, type=pa.string())],
        names=[id_col, "fingerprint"],
    )


_WINNOW_WINDOW = 4
_SHINGLE = 5


#: Winnowing gram hash: polynomial hash of the k-gram's CODE POINTS,
#: mod the Mersenne prime 2^31-1 — chosen (over crc32/md5) because it
#: is BOTH numpy-vectorizable (one sliding-window dot product per doc)
#: AND bit-exactly expressible in ANSI SQL (unicode(substr(...)) terms;
#: see SQL_WINNOW in pipelines/queries.py), which moves the
#: `winnow_fingerprints` query from rows-only to value-oracled.
#: Overflow-safe: codepoint < 2^21, power < 2^31 → term < 2^52,
#: k-term sum < 2^55 < int64.
_WINNOW_MOD = 2_147_483_647  # 2^31 - 1
_WINNOW_BASE = 1_000_003
_WINNOW_POWS = np.array(
    [pow(_WINNOW_BASE, _SHINGLE - 1 - j, _WINNOW_MOD) for j in range(_SHINGLE)],
    dtype=np.int64,
)


def winnow_fingerprints(text: str, *, k: int = _SHINGLE, window: int = _WINNOW_WINDOW) -> list[int]:
    """Winnowing (rolling-hash min-sampling) fingerprint set: hash all
    k-grams of characters, keep the min hash of each sliding window
    (rightmost min wins ties), record each selected position once.
    Standard document fingerprinting à la Schleimer et al. (SIGMOD'03).

    Fully vectorized: code points via a utf-32 view, gram hashes as ONE
    sliding-window matmul, the rightmost-min rule as a packed
    ``hash*2^31 + (2^31-1-pos)`` key min (selected positions are
    non-decreasing across windows, so consecutive-dedupe == key change).
    """
    t = " ".join((text or "").lower().split())
    if len(t) < k:
        return []
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if k == _SHINGLE:
        pows = _WINNOW_POWS
    else:
        pows = np.array([pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)],
                        dtype=np.int64)
    grams = np.lib.stride_tricks.sliding_window_view(codes, k)
    h = (grams * pows).sum(axis=1) % _WINNOW_MOD
    m = len(h)
    if m < window:
        return [int(h.min())]
    pos = np.arange(m, dtype=np.int64)
    key = h * np.int64(1 << 31) + (np.int64((1 << 31) - 1) - pos)
    wmin = np.lib.stride_tricks.sliding_window_view(key, window).min(axis=1)
    keep = np.r_[True, wmin[1:] != wmin[:-1]]
    return list((wmin[keep] >> np.int64(31)).tolist())


def winnow_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    fps = [winnow_fingerprints(t or "") for t in batch[text_col].to_pylist()]
    return pa.Table.from_arrays(
        [batch[id_col], pa.array(fps, type=pa.list_(pa.int64()))],
        names=[id_col, "winnow_fps"],
    )
