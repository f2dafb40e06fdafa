"""Span corruption — T5/UL2-style denoising-objective data prep.

Turns each document into an (inputs, targets) pair: ~15% of tokens are
masked in contiguous spans (mean length 3) and replaced by ordinal
sentinels; the targets sequence holds each sentinel followed by the
tokens it hides.  The op every encoder-decoder pretraining corpus needs
after packing.

Ray-Data shape: embarrassingly parallel ``map_batches`` — no shuffle,
no state.  Mask positions derive from a per-document blake2 seed, so
the corruption is DETERMINISTIC and layout-independent (the same doc
gets the same masks no matter which block or node processes it, which
makes the output reproducible and the pipeline resumable).  Per-doc
span selection is a bounded Python loop over that doc's spans (spans
per doc ≈ 0.15·n/3 — documents are bounded, the corpus dimension is
what parallelizes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MASK_FRACTION = 0.15
MEAN_SPAN = 3


def _doc_rng(doc_id: int, seed: int) -> np.random.Generator:
    digest = hashlib.blake2b(
        f"{doc_id}:{seed}".encode(), digest_size=8
    ).digest()
    return np.random.default_rng(int.from_bytes(digest, "big"))


def corrupt_spans(tokens: list[str], doc_id: int, seed: int = 17) -> tuple[str, str, int]:
    """One document → (inputs, targets, n_masked).

    Greedy non-overlapping span selection from the per-doc generator:
    draw (start, length≤2·MEAN_SPAN−1), skip overlaps, stop when the
    mask budget (⌈MASK_FRACTION·n⌉) is met or attempts run out."""
    n = len(tokens)
    if n < 2:
        return " ".join(tokens), "", 0
    budget = max(1, round(MASK_FRACTION * n))
    rng = _doc_rng(doc_id, seed)
    masked = np.zeros(n, dtype=bool)
    n_masked = 0
    for _ in range(4 * budget):  # bounded attempts
        if n_masked >= budget:
            break
        length = int(rng.integers(1, 2 * MEAN_SPAN))
        start = int(rng.integers(0, n))
        end = min(n, start + length)
        if masked[start:end].any():
            continue
        masked[start:end] = True
        n_masked += end - start
    inputs: list[str] = []
    targets: list[str] = []
    sentinel = 0
    i = 0
    while i < n:
        if masked[i]:
            tag = f"<extra_id_{sentinel}>"
            inputs.append(tag)
            targets.append(tag)
            while i < n and masked[i]:
                targets.append(tokens[i])
                i += 1
            sentinel += 1
        else:
            inputs.append(tokens[i])
            i += 1
    return " ".join(inputs), " ".join(targets), int(n_masked)


def span_corrupt_batch(batch: pa.Table, *, id_col: str = "doc_id",
                       text_col: str = "text", seed: int = 17) -> pd.DataFrame:
    """map_batches kernel: Dataset(id, text) → (id, inputs, targets, n_masked)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern(batch[text_col], " ").to_pylist()
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    rows = [corrupt_spans(t, int(d), seed) for t, d in zip(toks, ids)]
    return pd.DataFrame(
        {
            id_col: ids,
            "inputs": [r[0] for r in rows],
            "targets": [r[1] for r in rows],
            "n_masked": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


def span_corrupt(ds, *, id_col: str = "doc_id", text_col: str = "text", seed: int = 17):
    return ds.map_batches(
        lambda b: span_corrupt_batch(b, id_col=id_col, text_col=text_col, seed=seed),
        batch_format="pyarrow",
    )
