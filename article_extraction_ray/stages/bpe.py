"""Distributed BPE tokenizer training (Sennrich et al. 2016,
arXiv 1508.07909) — the merge-table learner of a training-data
pipeline, expressed in the same iterative broadcast shape as
:mod:`stages.clustering`'s Lloyd's k-means.

Shape per merge round:

1. every batch of the (word, symbols, count) vocabulary emits partial
   adjacent-pair counts (vectorized over the FLAT symbol array — pairs
   are ``flat[:-1] × flat[1:]`` masked to same-word positions, weighted
   by word count; no per-word Python);
2. ``grouped_aggregate`` folds partials; the argmax pair (ties broken
   lexicographically for determinism) is chosen driver-side from the
   tiny pair table;
3. the winning pair broadcasts and every batch rewrites its sequences
   (leftmost-greedy non-overlapping, the standard BPE rule).

The corpus itself is touched ONCE (word counting); all sweeps run over
the word VOCABULARY — orders of magnitude smaller than the corpus, the
same "iterate on the small derived table" argument as k-means on
embeddings.  Each sweep materializes the updated vocabulary so round
``m`` doesn't recompute rounds ``1..m-1`` lazily.

At web scale the pair-count partials are (distinct pairs/batch) rows —
bounded by vocabulary shape, not corpus size — and the vocabulary
dataset shards across the cluster; nothing here is driver-resident
except the per-round pair table (≤ distinct adjacent pairs, the thing
BPE is ranking anyway).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.broadcast import Broadcast

_END = "</w>"


def _word_counts(ds, text_col: str, *, driver_partial_budget: int = 2_000_000):
    """Corpus → Dataset(word, cnt): the single pass over raw text.

    Per-batch partial counts always run distributed (one row per
    distinct word per batch).  The cross-batch fold routes by the
    PARTIAL row count: under ``driver_partial_budget`` rows the fold is
    one driver-side pandas groupby over the materialized partials —
    skipping Ray's distributed sort-aggregate, whose fixed cost
    dominates when the vocabulary is small (the common case: natural-
    language vocabularies grow ~Heaps' law, far sublinear in corpus
    size).  Above the budget the fold is the distributed
    ``grouped_aggregate`` — nothing vocabulary-sized ever lands on the
    driver at web scale."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..pipelines.tabular import grouped_aggregate

    def partial(batch: pa.Table) -> pd.DataFrame:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(pc.split_pattern(col, " ").values)
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy()})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if partials.count() <= driver_partial_budget:
        df = partials.to_pandas().groupby("word", as_index=False, sort=False)["cnt"].sum()
        return rd.from_pandas(df)
    return grouped_aggregate(partials, ["word"], {"cnt": ("sum", "cnt")})


def _to_symbols(batch: pa.Table) -> pa.Table:
    """word → initial symbol sequence (chars + word-end marker)."""
    words = batch["word"].to_pylist()
    seqs = [list(w) + [_END] for w in words]
    return pa.Table.from_arrays(
        [batch["word"], pa.array(seqs, type=pa.list_(pa.string())), batch["cnt"]],
        names=["word", "symbols", "cnt"],
    )


def _flat_view(batch: pa.Table):
    """symbols list column → (flat symbols, same-word pair mask, weights)."""
    import pyarrow.compute as pc

    col = batch["symbols"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(col.values.to_pandas(), dtype=object)
    cnt = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(lens)
    same_word = np.ones(max(len(flat) - 1, 0), dtype=bool)
    if len(flat):
        same_word[ends[:-1] - 1] = False  # pair straddling two words
    w = np.repeat(cnt, lens)[:-1] if len(flat) else np.zeros(0, dtype=np.int64)
    return flat, same_word, w, lens


def _pair_partial(batch: pa.Table) -> pd.DataFrame:
    flat, same_word, w, _ = _flat_view(batch)
    if not len(flat):
        return pd.DataFrame({"a": [], "b": [], "c": []})
    a, b = flat[:-1][same_word], flat[1:][same_word]
    df = pd.DataFrame({"a": a, "b": b, "c": w[same_word]})
    return df.groupby(["a", "b"], as_index=False, sort=False)["c"].sum()


def _merge_pair(batch: pa.Table, pair: tuple[str, str]) -> pa.Table:
    """Rewrite every sequence replacing leftmost-greedy non-overlapping
    occurrences of ``pair`` with the fused symbol."""
    flat, same_word, _, lens = _flat_view(batch)
    pa_, pb = pair
    if not len(flat):
        return batch
    cand = np.zeros(len(flat), dtype=bool)
    cand[:-1] = (flat[:-1] == pa_) & (flat[1:] == pb) & same_word
    # leftmost-greedy: a candidate is taken only if the previous position
    # wasn't; runs of candidates are rare, resolve just those positions
    idx = np.flatnonzero(cand)
    take = np.zeros(len(flat), dtype=bool)
    last_end = -1  # last flat index consumed by a taken pair
    for i in idx:  # touches only candidate positions (rare)
        if i > last_end:
            take[i] = True
            last_end = i + 1
    merged = pa_ + pb
    out_flat = flat.copy()
    out_flat[take] = merged
    drop = np.zeros(len(flat), dtype=bool)
    drop[1:] = take[:-1]  # second element of each taken pair disappears
    word_id = np.repeat(np.arange(len(lens)), lens)
    keep = ~drop
    new_seqs = pd.Series(out_flat[keep]).groupby(word_id[keep], sort=False).agg(list).tolist()
    return pa.Table.from_arrays(
        [batch["word"], pa.array(new_seqs, type=pa.list_(pa.string())), batch["cnt"]],
        names=["word", "symbols", "cnt"],
    )


#: per-worker-process encode-stage cache keyed by the merge table's
#: object-store ref (same trade as dedup._STAGE_CACHE): the stage state
#: (merge list + word memo) builds once per worker and is shared by all
#: task batches — actor-pool "state once" without pool startup.
_ENCODE_CACHE: dict = {}


def encode_stage_task(batch: pa.Table, merges_bc: Broadcast,
                      text_col: str = "text",
                      passthrough: tuple[str, ...] = ()) -> pa.Table:
    key = (merges_bc.key(), text_col, passthrough)
    stage = _ENCODE_CACHE.get(key)
    if stage is None:
        stage = _ENCODE_CACHE.setdefault(
            key, BpeEncodeStage(merges_bc, text_col, passthrough)
        )
    return stage(batch)


def bpe_train(
    ds,
    *,
    num_merges: int = 16,
    text_col: str = "text",
    driver_vocab_budget: int = 262_144,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges → DataFrame(rank, left, right,
    pair_count), deterministic (count desc, then lexicographic).

    The corpus-sized pass (word counting) is always distributed.  The
    merge loop runs over the WORD VOCABULARY, which is orders of
    magnitude smaller than the corpus: when the distinct-word count fits
    ``driver_vocab_budget`` the loop runs driver-side on the weighted
    vocabulary (identical rules → bit-identical merges, no per-round
    scheduling overhead); otherwise each round is a distributed
    pair-count aggregate + broadcast rewrite.  Real web vocabularies
    (1e7–1e8 words) take the distributed branch; both paths are
    pytest-verified equal to the textbook reference."""
    from ..pipelines.tabular import grouped_aggregate

    counts = _word_counts(ds, text_col).materialize()  # vocab-sized, not corpus-sized
    n_words = counts.count()
    if n_words <= driver_vocab_budget:
        wc_df = counts.to_pandas()
        wc = dict(zip(wc_df["word"].astype(str), wc_df["cnt"].astype(int)))
        return _train_from_vocab(wc, num_merges)
    vocab = counts.map_batches(_to_symbols, batch_format="pyarrow")
    vocab = vocab.materialize()
    merges = []
    for rank in range(num_merges):
        pairs = (
            grouped_aggregate(
                vocab.map_batches(_pair_partial, batch_format="pyarrow"),
                ["a", "b"],
                {"c": ("sum", "c")},
            )
            .to_pandas()
        )
        if pairs.empty:
            break
        pairs = pairs.sort_values(["c", "a", "b"], ascending=[False, True, True], kind="stable")
        best = pairs.iloc[0]
        merges.append((rank, best["a"], best["b"], int(best["c"])))
        pair = Broadcast((str(best["a"]), str(best["b"])))
        vocab = vocab.map_batches(
            lambda t, p=pair: _merge_pair(t, p.get()), batch_format="pyarrow"
        ).materialize()
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


class BpeEncodeStage:
    """Apply a trained merge table to the corpus — the tokenize-for-
    training pass that follows :func:`bpe_train`.

    The merge list ships ONCE per actor via :class:`Broadcast`
    (``ray.put`` under the hood); each actor also holds a word→tokens
    memo, so the per-word merge loop runs once per DISTINCT word per
    actor, not once per occurrence (natural text repeats words heavily —
    the standard GPT-2 encoder cache).  Per batch, distinct words are
    encoded first and occurrences fan out via an integer take — the
    Python merge loop never runs in proportion to corpus size.
    """

    def __init__(
        self,
        merges_bc: Broadcast,
        text_col: str = "text",
        passthrough: tuple[str, ...] = (),
    ):
        self._merges = [tuple(m) for m in merges_bc.get()]
        self._text_col = text_col
        self._passthrough = tuple(passthrough)
        self._memo: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        toks = self._memo.get(w)
        if toks is None:
            seq = list(w) + [_END]
            for a, b in self._merges:  # rank order, leftmost-greedy
                if len(seq) < 2:
                    break
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            toks = seq
            self._memo[w] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[self._text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        split = pc.split_pattern(col, " ")
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        flat_words = np.asarray(split.values.to_pandas(), dtype=object)
        uniq, inv = np.unique(flat_words, return_inverse=True)
        tok_per_uniq = np.fromiter(
            (len(self._encode_word(w)) for w in uniq), dtype=np.int64, count=len(uniq)
        )
        per_word = tok_per_uniq[inv]
        doc_id = np.repeat(np.arange(len(batch)), lens)
        n_tokens = np.bincount(doc_id, weights=per_word, minlength=len(batch)).astype(np.int64)
        arrays = [batch["doc_id"], pa.array(lens), pa.array(n_tokens)]
        names = ["doc_id", "n_words", "n_tokens"]
        for col in self._passthrough:
            arrays.append(batch[col])
            names.append(col)
        return pa.Table.from_arrays(arrays, names=names)


def bpe_encode_local(texts: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Single-process reference encoder (test oracle): apply merges in
    rank order, leftmost-greedy, to every word of every text."""
    out = []
    for t in texts:
        toks: list[str] = []
        for w in t.split():
            seq = list(w) + [_END]
            for a, b in merges:
                s, i, n = [], 0, len(seq)
                while i < n:
                    if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                        s.append(a + b)
                        i += 2
                    else:
                        s.append(seq[i])
                        i += 1
                seq = s
            toks.extend(seq)
        out.append(toks)
    return out


def bpe_train_local(texts: list[str], num_merges: int = 16) -> pd.DataFrame:
    """Single-process reference implementation (test oracle): the
    textbook dict-of-tuples BPE loop, same determinism rule."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split())
    return _train_from_vocab(dict(wc), num_merges)


def _train_from_vocab(wc: dict[str, int], num_merges: int) -> pd.DataFrame:
    """Textbook merge loop over a weighted word vocabulary (the
    driver-side branch of :func:`bpe_train` and the test oracle)."""
    from collections import Counter

    vocab = {tuple(list(w) + [_END]): c for w, c in wc.items()}
    merges = []
    for rank in range(num_merges):
        pc: Counter = Counter()
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), cnt = best
        merges.append((rank, a, b, cnt))
        out = {}
        for seq, c in vocab.items():
            s, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == a and seq[i + 1] == b:
                    s.append(a + b)
                    i += 2
                else:
                    s.append(seq[i])
                    i += 1
            out[tuple(s)] = out.get(tuple(s), 0) + c
        vocab = out
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
