"""Evaluation harness (reference E3, /root/reference/results/t1/scores.py).

The reference scores predictions against references per (model,
category): semantic distance = cosine on L2-normalized embeddings with a
per-process text→vector cache (scores.py:47-167), character distances =
levenshtein / jaro / jaro-winkler on normalized cells (scores.py:175-294),
then per-category stats count/mean/median/std/min/max (scores.py:36-44)
and expanding means (scores.py:454,556-558).

Ray-native shape:
- ``load_results_json`` flattens the nested ``{model→category→{true[],
  predicted[]}}`` file (S8, scores.py:297-299) into rows.
- :class:`EvalEncoderStage` is an actor-pool stage holding the encoder
  and its in-memory cache (A4's cache-per-process, here cache-per-actor).
  The real EmbeddingGemma encoder is absent in this sandbox; the default
  backend is a deterministic blake2-seeded unit-vector encoder behind
  the same protocol (mean-pool + L2-normalize shape preserved).
- char metrics are a stateless vectorized ``map_batches``.
- per-(model, category) stats run as ``map_groups`` (group count is
  tiny: models × categories).
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.strings import (
    jaro_winkler_similarity,
    levenshtein_distance,
    normalise_cell,
    normalized_levenshtein_distance,
)

EPSILON = 1e-12


def load_results_json(path: str) -> pa.Table:
    """Nested eval JSON → flat (model, category, idx, true, predicted)."""
    with open(path, encoding="utf-8") as fh:
        nested = json.load(fh)
    rows = []
    for model, cats in nested.items():
        for category, pair in cats.items():
            trues = pair.get("true", [])
            preds = pair.get("predicted", [])
            for i, (t, p) in enumerate(zip(trues, preds)):
                rows.append(
                    {"model": model, "category": category, "idx": i, "true": t, "predicted": p}
                )
    return pa.Table.from_pylist(rows)


class _HashEncoder:
    """Deterministic stand-in encoder: blake2-seeded unit vector per
    text.  Production swaps in a transformer encoder behind the same
    ``encode(list[str]) -> np.ndarray`` protocol (batched, pooled,
    L2-normalized — scores.py:142-154)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim))
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            v = np.random.default_rng(seed).standard_normal(self.dim)
            out[i] = v / max(np.linalg.norm(v), EPSILON)
        return out


class EvalEncoderStage:
    """Actor-pool stage: rows (true, predicted) → + cosine_distance.

    Holds the encoder and a text→vector cache dict for the actor's
    lifetime (the reference's best-effort cache, scores.py:61,105-120).
    """

    def __init__(self, backend: str = "fake", dim: int = 64):
        if backend == "real":
            raise NotImplementedError(
                "transformer encoders are unavailable in this container; "
                "production constructs the HF model here (once per actor)"
            )
        self.encoder = _HashEncoder(dim)
        self.cache: dict[str, np.ndarray] = {}

    def _encode_cached(self, texts: list[str]) -> np.ndarray:
        missing = [t for t in texts if t not in self.cache]
        if missing:
            vecs = self.encoder.encode(missing)
            for t, v in zip(missing, vecs):
                self.cache[t] = v
        return np.stack([self.cache[t] for t in texts]) if texts else np.zeros((0, 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        trues = [normalise_cell(t) for t in batch["true"].to_pylist()]
        preds = [normalise_cell(p) for p in batch["predicted"].to_pylist()]
        tv = self._encode_cached(trues)
        pv = self._encode_cached(preds)
        cos = 1.0 - np.sum(tv * pv, axis=1)
        return batch.append_column("cosine_distance", pa.array(np.round(cos, 12)))


def char_metrics_batch(batch: pa.Table) -> pa.Table:
    """Normalized-cell levenshtein / normalized levenshtein / jaro-winkler
    distances (scores.py:190-294 semantics, M14 normalization)."""
    trues = [normalise_cell(t) for t in batch["true"].to_pylist()]
    preds = [normalise_cell(p) for p in batch["predicted"].to_pylist()]
    lev = [levenshtein_distance(a, b) for a, b in zip(trues, preds)]
    nlev = [normalized_levenshtein_distance(a, b) for a, b in zip(trues, preds)]
    jw = [1.0 - jaro_winkler_similarity(a, b) for a, b in zip(trues, preds)]
    return (
        batch.append_column("levenshtein", pa.array(lev, type=pa.int64()))
        .append_column("norm_levenshtein", pa.array(nlev, type=pa.float64()))
        .append_column("jaro_winkler_distance", pa.array(jw, type=pa.float64()))
    )


def _group_stats(df: pd.DataFrame) -> pd.DataFrame:
    """count/mean/median/std(ddof=0)/min/max per distance column —
    scores.py:36-44 definitions (population std)."""
    out = {"model": df["model"].iloc[0], "category": df["category"].iloc[0]}
    for col in ("cosine_distance", "levenshtein", "norm_levenshtein", "jaro_winkler_distance"):
        if col not in df.columns:
            continue
        v = df[col].to_numpy(dtype=float)
        out[f"{col}_count"] = float(v.size)
        out[f"{col}_mean"] = float(v.mean()) if v.size else float("nan")
        out[f"{col}_median"] = float(np.median(v)) if v.size else float("nan")
        out[f"{col}_std"] = float(v.std(ddof=0)) if v.size else float("nan")
        out[f"{col}_min"] = float(v.min()) if v.size else float("nan")
        out[f"{col}_max"] = float(v.max()) if v.size else float("nan")
    return pd.DataFrame([out])


def expanding_means(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """Per-(model, category) expanding mean in idx order (G5,
    scores.py:454,556-558) — an ordered scan within each group."""
    df = df.sort_values(["model", "category", "idx"]).copy()
    df[f"{col}_expanding_mean"] = df.groupby(["model", "category"])[col].expanding().mean().to_numpy()
    return df


def score_results(ds, *, encoder_backend: str = "fake", concurrency=(1, 4)):
    """rows (model, category, idx, true, predicted) → scored rows with
    cosine + char distances."""
    scored = ds.map_batches(
        EvalEncoderStage,
        fn_constructor_kwargs={"backend": encoder_backend},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    return scored.map_batches(char_metrics_batch, batch_format="pyarrow")


def score_summary(scored_ds):
    """Per-(model, category) stats frame (small group count)."""
    return scored_ds.groupby(["model", "category"]).map_groups(_group_stats, batch_format="pandas")
