"""Distributed unigram-LM tokenizer training (Kudo 2018,
arXiv 1804.10959 — the SentencePiece "unigram" estimator), the
second tokenizer trainer next to :mod:`stages.bpe`.

Deterministic hard-EM variant: the E-step segments every distinct word
with VITERBI under the current piece log-probs (ties broken toward the
longest last piece — fixed rule, no randomness), the M-step
renormalizes piece counts, and a pruning schedule shrinks the
candidate vocabulary geometrically toward the target size (single
characters are never pruned, so every word stays segmentable).

Distributed shape — the same "iterate on the small derived table"
argument as BPE/k-means: the corpus is touched ONCE (the distributed
word-count fold in stages/bpe._word_counts); every EM sweep runs over
the distinct-WORD dataset with the piece table broadcast via
``ray.put``, and each batch returns per-piece count partials (bounded
by piece vocabulary, not corpus size) that fold in one grouped sum.
Nothing corpus-sized touches the driver; the piece table itself is the
model being trained (vocab_size rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast

_NEG_INF = float("-inf")


def viterbi_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation under piece log-probs; ties break toward the
    longest last piece (candidates scan shortest-prefix first and only
    a STRICT improvement replaces, so the earliest — longest — piece
    wins equal scores).  Assumes every single char is in ``logp``."""
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    best[0] = 0.0
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            cand = best[i] + lp
            if cand > best[j]:
                best[j] = cand
                back[j] = i
    pieces = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces


def _seed_counts(words: list[str], cnts: np.ndarray, max_len: int) -> dict[str, float]:
    """Candidate substring counts (every position, weighted by word
    frequency) — the standard seed vocabulary."""
    counts: dict[str, float] = {}
    for w, c in zip(words, cnts):
        c = float(c)
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_len, n - i) + 1):
                piece = w[i : i + ln]
                counts[piece] = counts.get(piece, 0.0) + c
    return counts


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: float(np.log(c / total)) for p, c in counts.items()}


#: E-step floor for single characters that appear in no Viterbi
#: segmentation (a longer piece won everywhere): keeping them at a tiny
#: constant count preserves full coverage (any future word stays
#: segmentable) without letting them compete with real pieces.
CHAR_FLOOR = 0.5


def _refloor_chars(new: dict[str, float], chars: set[str]) -> dict[str, float]:
    for ch in chars:
        new.setdefault(ch, CHAR_FLOOR)
    return new


def _prune(counts: dict[str, float], keep: int) -> dict[str, float]:
    """Keep all single chars + the top multi-char pieces by count
    (ties by piece string, for determinism)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    kept = dict(chars)
    for p, c in multi[: max(0, keep - len(chars))]:
        kept[p] = c
    return kept


def unigram_lm_train_local(
    word_counts: dict[str, int],
    *,
    vocab_size: int = 200,
    rounds: int = 4,
    max_len: int = 6,
    min_count: float = 2.0,
    shrink: float = 0.75,
) -> pd.DataFrame:
    """Driver-kernel reference (the distributed fit is parity-tested
    against this): seed → (EM + prune) × rounds → final EM →
    DataFrame(piece, logp)."""
    words = sorted(word_counts)
    cnts = np.asarray([word_counts[w] for w in words], dtype=np.float64)
    counts = _seed_counts(words, cnts, max_len)
    counts = {p: c for p, c in counts.items() if len(p) == 1 or c >= min_count}
    chars = {p for p in counts if len(p) == 1}
    for r in range(rounds):
        logp = _normalize(counts)
        new: dict[str, float] = {}
        for w, c in zip(words, cnts):
            for piece in viterbi_segment(w, logp, max_len):
                new[piece] = new.get(piece, 0.0) + float(c)
        _refloor_chars(new, chars)
        keep = max(vocab_size, int(len(new) * shrink)) if r < rounds - 1 else vocab_size
        counts = _prune(new, keep)
    logp = _normalize(counts)
    out = pd.DataFrame(
        {"piece": sorted(logp), "logp": [round(logp[p], 6) for p in sorted(logp)]}
    )
    return out


def unigram_lm_train(
    ds,
    text_col: str = "text",
    *,
    vocab_size: int = 200,
    rounds: int = 4,
    max_len: int = 6,
    min_count: float = 2.0,
    shrink: float = 0.75,
) -> pd.DataFrame:
    """Distributed fit: ONE corpus pass (word counts), then every sweep
    broadcasts the piece table and folds per-piece count partials from
    the distinct-word dataset.  Bit-equal to
    :func:`unigram_lm_train_local` (integer-weighted counts, fixed tie
    rules; tests assert frame equality)."""
    from .bpe import _word_counts

    vocab = _word_counts(ds, text_col).materialize()

    def seed_partial(batch: pa.Table) -> pd.DataFrame:
        words = batch["word"].to_pylist()
        cnts = batch["cnt"].to_numpy(zero_copy_only=False)
        counts = _seed_counts(words, cnts, max_len)
        return pd.DataFrame({"piece": list(counts), "c": list(counts.values())})

    seed = (
        vocab.map_batches(seed_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("piece")["c"]
        .sum()
    )
    counts = {
        p: float(c) for p, c in seed.items() if len(p) == 1 or c >= min_count
    }
    chars = {p for p in counts if len(p) == 1}

    for r in range(rounds):
        handle = Broadcast(_normalize(counts))

        def em_partial(batch: pa.Table) -> pd.DataFrame:
            logp = handle.get()
            words = batch["word"].to_pylist()
            cnts = batch["cnt"].to_numpy(zero_copy_only=False)
            new: dict[str, float] = {}
            for w, c in zip(words, cnts):
                for piece in viterbi_segment(w, logp, max_len):
                    new[piece] = new.get(piece, 0.0) + float(c)
            return pd.DataFrame({"piece": list(new), "c": list(new.values())})

        got = (
            vocab.map_batches(em_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("piece")["c"]
            .sum()
        )
        new = _refloor_chars({p: float(c) for p, c in got.items()}, chars)
        keep = max(vocab_size, int(len(new) * shrink)) if r < rounds - 1 else vocab_size
        counts = _prune(new, keep)

    logp = _normalize(counts)
    return pd.DataFrame(
        {"piece": sorted(logp), "logp": [round(logp[p], 6) for p in sorted(logp)]}
    )


class UnigramEncodeStage:
    """Actor-pool ``map_batches`` encoder for a trained unigram-LM
    vocabulary (the apply half of :func:`unigram_lm_train`, mirroring
    ``bpe.BpeEncodeStage``): the (piece → logp) table arrives once per
    actor via ``ray.put`` and Viterbi segmentations memoize per DISTINCT
    word, so DP work scales with vocabulary, not corpus size.  Emits
    (doc_id, n_tokens, n_pieces, pieces_preview)."""

    def __init__(self, logp_bc: Broadcast, *, max_len: int = 6, preview: int = 8) -> None:
        self._logp: dict[str, float] = dict(logp_bc.get())
        self._max_len = max_len
        self._preview = preview
        self._memo: dict[str, list[str]] = {}

    def _pieces(self, word: str) -> list[str]:
        got = self._memo.get(word)
        if got is None:
            got = viterbi_segment(word, self._logp, self._max_len)
            self._memo[word] = got
        return got

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        col = batch["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        split = pc.split_pattern(col, " ")
        ids = batch["doc_id"].to_pylist()
        rows = []
        for did, words in zip(ids, split.to_pylist()):
            pieces: list[str] = []
            for w in words:
                pieces.extend(self._pieces(w))
            rows.append(
                {
                    "doc_id": did,
                    "n_tokens": len(words),
                    "n_pieces": len(pieces),
                    "pieces_preview": " ".join(pieces[: self._preview]),
                }
            )
        return pd.DataFrame(rows)
