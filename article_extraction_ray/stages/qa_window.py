"""Token-level QA sub-window internals (reference A3 inner contract,
/root/reference/models/qa_squad.py:90-161).

The outer QA loop (char windows, dedupe-keep-best, aggregation,
fallback) lives in :mod:`stages.field_extract`; this module reproduces
what happens INSIDE one ``call_qa`` invocation for a transformer QA
head:

1. tokenizer encoding with overflowing sub-windows — ``max_length``
   tokens per chunk, ``stride`` token overlap, question + context with
   "only_second" truncation (qa_squad.py:98-107);
2. per-chunk joint span scoring — ``start[:, None] + end[None, :]``
   over the context tokens only, masked to the upper triangle and to
   spans of ≤ ``lmax_tok`` tokens, argmax of the masked matrix
   (qa_squad.py:128-141);
3. char-offset span recovery from the winning token pair, empty/inverted
   spans skipped (qa_squad.py:142-150);
4. cross-chunk dedupe by answer text keeping the best score, ranked
   n-best (qa_squad.py:153-159).

The tokenizer and logit head are PLUGGABLE protocols; this sandbox ships
deterministic fakes (whitespace tokenizer, pattern-scoring head) so the
windowing / mask / argmax / offset math — the part a distributed engine
owns — is fully exercised without torch.  Production passes the HF fast
tokenizer and model forward behind the same two callables.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Sequence

import numpy as np

DEFAULT_MAX_LEN = 4096
DEFAULT_STRIDE = 1024
LMAX_TOK = 30

_TOKEN_RE = re.compile(r"\S+")


class TokenChunk:
    """One tokenizer sub-window: parallel token / sequence-id / char-offset
    lists.  ``seq_ids[t]`` is None for specials, 0 for question tokens,
    1 for context tokens; ``offsets[t]`` is (start_char, end_char) into
    the ORIGINAL context for context tokens, None otherwise."""

    __slots__ = ("tokens", "seq_ids", "offsets")

    def __init__(self, tokens: list[str], seq_ids: list[Optional[int]],
                 offsets: list[Optional[tuple[int, int]]]):
        self.tokens = tokens
        self.seq_ids = seq_ids
        self.offsets = offsets

    def __len__(self) -> int:
        return len(self.tokens)


class WhitespaceTokenizer:
    """Deterministic HF-shaped fake tokenizer: one token per whitespace
    run, exact char offsets, [CLS]/[SEP] specials, "only_second"
    truncation with overflowing context windows of ``max_length`` tokens
    and ``stride`` token overlap — the same windowing geometry the HF
    fast tokenizer produces (qa_squad.py:98-107)."""

    def __init__(self, model_max_length: int = DEFAULT_MAX_LEN):
        self.model_max_length = model_max_length

    def encode(self, question: str, context: str, *, max_length: int,
               stride: int) -> list[TokenChunk]:
        q_words = _TOKEN_RE.findall(question or "")
        ctx_spans = [(m.group(), m.start(), m.end()) for m in _TOKEN_RE.finditer(context or "")]
        # [CLS] q... [SEP] c... [SEP]
        head_tokens = ["[CLS]", *q_words, "[SEP]"]
        head_seq: list[Optional[int]] = [None, *([0] * len(q_words)), None]
        head_off: list[Optional[tuple[int, int]]] = [None] * len(head_tokens)
        budget = max_length - len(head_tokens) - 1  # trailing [SEP]
        if budget <= 0:
            raise ValueError("question longer than max_length")
        chunks: list[TokenChunk] = []
        start = 0
        while True:
            window = ctx_spans[start : start + budget]
            tokens = [*head_tokens, *(w for w, _, _ in window), "[SEP]"]
            seq_ids = [*head_seq, *([1] * len(window)), None]
            offsets = [*head_off, *(((s, e)) for _, s, e in window), None]
            chunks.append(TokenChunk(tokens, seq_ids, offsets))
            if start + budget >= len(ctx_spans):
                break
            start += budget - min(stride, budget - 1)
        return chunks


class PatternLogitHead:
    """Deterministic fake QA head: start logits reward tokens matching
    ``start_pattern``, end logits reward ``end_pattern``; a tiny
    position-decaying term breaks ties reproducibly.  Shaped exactly like
    a model forward: chunk → (start_logits, end_logits) over ALL chunk
    tokens (specials included, like a real head)."""

    def __init__(self, start_pattern: str = r"\d", end_pattern: str = r"\d$",
                 reward: float = 5.0):
        self.start_re = re.compile(start_pattern)
        self.end_re = re.compile(end_pattern)
        self.reward = reward

    def __call__(self, chunk: TokenChunk) -> tuple[np.ndarray, np.ndarray]:
        n = len(chunk)
        pos = np.arange(n, dtype=np.float64)
        tie = -pos * 1e-4  # earlier tokens win exact-score ties
        s = np.array(
            [self.reward if self.start_re.search(t) else 0.0 for t in chunk.tokens]
        ) + tie
        e = np.array(
            [self.reward if self.end_re.search(t) else 0.0 for t in chunk.tokens]
        ) + tie
        return s, e


def best_span_in_chunk(
    chunk: TokenChunk,
    start_logits: np.ndarray,
    end_logits: np.ndarray,
    *,
    lmax_tok: int = LMAX_TOK,
) -> Optional[tuple[int, int, float]]:
    """Joint argmax over context-token spans (qa_squad.py:128-141):
    restrict to context tokens with offsets, build the (N, N) joint
    score, mask to i ≤ j and span length ≤ lmax_tok, return the winning
    (start_char, end_char, score) or None when no valid span exists."""
    ctx_idx = [
        t for t, (sid, off) in enumerate(zip(chunk.seq_ids, chunk.offsets))
        if sid == 1 and off is not None
    ]
    if not ctx_idx:
        return None
    s = np.asarray(start_logits, dtype=np.float64)[ctx_idx]
    e = np.asarray(end_logits, dtype=np.float64)[ctx_idx]
    n = len(ctx_idx)
    ii = np.arange(n)
    joint = s[:, None] + e[None, :]
    valid = (ii[None, :] >= ii[:, None]) & ((ii[None, :] - ii[:, None] + 1) <= lmax_tok)
    if not valid.any():
        return None
    val = np.where(valid, joint, -np.inf)
    flat = int(np.argmax(val))
    i0, j0 = divmod(flat, n)
    st_char = chunk.offsets[ctx_idx[i0]][0]
    ed_char = chunk.offsets[ctx_idx[j0]][1]
    if ed_char <= st_char:
        return None
    return st_char, ed_char, float(val.reshape(-1)[flat])


def qa_candidates(
    question: str,
    context: str,
    *,
    tokenizer: WhitespaceTokenizer,
    logit_fn: Callable[[TokenChunk], tuple[np.ndarray, np.ndarray]],
    max_length: Optional[int] = None,
    stride: int = DEFAULT_STRIDE,
    lmax_tok: int = LMAX_TOK,
    n_best: int = 3,
    max_answer_chars: int = 200,
) -> list[tuple[str, float]]:
    """Full inner-QA pass: overflowing token sub-windows → per-chunk
    masked joint argmax → char recovery → dedupe-keep-best → ranked
    n-best (qa_squad.py:90-161).  The stride is capped at half the max
    length like the reference (qa_squad.py:95)."""
    tok_max = tokenizer.model_max_length
    max_length = max_length if max_length and max_length > 0 else (
        tok_max if isinstance(tok_max, int) and tok_max > 0 else DEFAULT_MAX_LEN
    )
    stride = min(stride, max_length // 2) if max_length else stride
    if stride <= 0:
        stride = DEFAULT_STRIDE
    chunks = tokenizer.encode(question, context, max_length=max_length, stride=stride)
    candidates: list[tuple[str, float]] = []
    for chunk in chunks:
        s_log, e_log = logit_fn(chunk)
        span = best_span_in_chunk(chunk, s_log, e_log, lmax_tok=lmax_tok)
        if span is None:
            continue
        st, ed, score = span
        ans = context[st:ed].strip()
        if not ans:
            continue
        candidates.append((ans[:max_answer_chars], score))
    best: dict[str, float] = {}
    for a, sc in candidates:
        if a not in best or sc > best[a]:
            best[a] = sc
    ranked = sorted(best.items(), key=lambda x: x[1], reverse=True)
    return ranked[: max(1, n_best)]


def make_qa_fn(
    *,
    tokenizer: Optional[WhitespaceTokenizer] = None,
    logit_fn: Optional[Callable] = None,
    max_length: int = 64,
    stride: int = 16,
    lmax_tok: int = LMAX_TOK,
    n_best: int = 3,
) -> Callable[[str, str], list[tuple[str, float]]]:
    """Adapter: the token-window internals as a ``call_qa`` callable for
    :func:`stages.field_extract.qa_extract` — the plug point where
    production swaps in the HF tokenizer/model pair."""
    tok = tokenizer or WhitespaceTokenizer(model_max_length=max_length)
    head = logit_fn or PatternLogitHead()

    def call_qa(question: str, chunk_text: str) -> list[tuple[str, float]]:
        return qa_candidates(
            question, chunk_text, tokenizer=tok, logit_fn=head,
            max_length=max_length, stride=stride, lmax_tok=lmax_tok, n_best=n_best,
        )

    return call_qa
