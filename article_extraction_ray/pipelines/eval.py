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

    def __init__(self, backend: str = "fake", dim: int = 64, encoder=None):
        # ``encoder`` is the production seam: any object with
        # ``encode(list[str]) -> (n, d) array`` (a SentenceTransformer
        # instance satisfies it directly), constructed once per actor.
        if encoder is not None:
            self.encoder = encoder
        elif backend == "real":
            try:
                import sentence_transformers  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "transformer encoders are unavailable in this container; "
                    "production constructs the HF model here (once per actor) "
                    "or passes encoder=<model> — pytest -m real exercises the "
                    "seam when the dependency exists"
                ) from exc
            raise NotImplementedError(
                "pass encoder=SentenceTransformer(<model>) explicitly: model "
                "choice is deployment config, not library code"
            )
        else:
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


# ---------------------------------------------------------------------------
# metric sinks (reference S8 write side, scores.py:434-668): per-category
# incremental CSVs, per-model aggregated CSVs, upserted summary CSVs, and
# an optional histogram PNG behind a matplotlib gate.  The per-group
# files are written INSIDE map_groups — i.e. on workers, against a shared
# filesystem at cluster scale — only the tiny stats rows return to the
# driver for the summary upsert.
# ---------------------------------------------------------------------------

CHAR_METRICS = ("levenshtein", "norm_levenshtein", "jaro_winkler_distance")


def _safe_name(value: str) -> str:
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in str(value))


def _write_category_files(g: pd.DataFrame, out_dir: str, distance_col: str) -> pd.DataFrame:
    """One (model, category) group → two CSVs + one stats row.

    ``<model>_<category>.csv``: index, distance, rolling_mean
    (scores.py:434-462); ``<model>_<category>_char.csv``: index, true,
    predicted, each char metric and its ``_rolling_mean``
    (scores.py:465-517).  Returns the group's stats row for the driver's
    summary upsert."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    model, category = g["model"].iloc[0], g["category"].iloc[0]
    g = g.sort_values("idx")
    stem = f"{_safe_name(model)}_{_safe_name(category)}"

    if distance_col in g.columns:
        prog = pd.DataFrame(
            {
                "index": np.arange(1, len(g) + 1, dtype=int),
                "distance": g[distance_col].to_numpy(dtype=float),
            }
        )
        prog["rolling_mean"] = prog["distance"].expanding(min_periods=1).mean()
        prog.to_csv(os.path.join(out_dir, f"{stem}.csv"), index=False)

    char_cols = [m for m in CHAR_METRICS if m in g.columns]
    if char_cols:
        char = pd.DataFrame(
            {
                "index": np.arange(1, len(g) + 1, dtype=int),
                "true": g["true"].to_numpy(),
                "predicted": g["predicted"].to_numpy(),
            }
        )
        for m in char_cols:
            char[m] = g[m].to_numpy(dtype=float)
            char[f"{m}_rolling_mean"] = char[m].expanding(min_periods=1).mean()
        char.to_csv(os.path.join(out_dir, f"{stem}_char.csv"), index=False)

    return _group_stats(g)


def _write_model_csv(g: pd.DataFrame, out_dir: str, distance_col: str) -> pd.DataFrame:
    """One model group → ``<model>.csv`` with a distance column per
    category (NaN-padded to the longest category) plus
    ``<category>_mean`` expanding means (scores.py:518-565)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    model = g["model"].iloc[0]
    cats = {
        cat: sub.sort_values("idx")[distance_col].to_numpy(dtype=float)
        for cat, sub in g.groupby("category", sort=True)
        if distance_col in sub.columns
    }
    max_len = max((len(v) for v in cats.values()), default=0)
    data: dict[str, np.ndarray] = {}
    for cat, arr in cats.items():
        padded = np.full(max_len, np.nan)
        padded[: len(arr)] = arr
        data[cat] = padded
    df = pd.DataFrame(data)
    for cat in cats:
        df[f"{cat}_mean"] = df[cat].expanding(min_periods=1).mean()
    df.to_csv(os.path.join(out_dir, f"{_safe_name(model)}.csv"), index=False)
    return pd.DataFrame([{"model": model, "n_categories": len(cats), "rows": max_len}])


def upsert_summary_csv(summary_path: str, stats: pd.DataFrame) -> pd.DataFrame:
    """Upsert per-(model, category) stats rows into a persistent summary
    CSV, sorted for stability (scores.py:567-607) — re-running an eval
    updates rows in place instead of appending duplicates."""
    import os

    os.makedirs(os.path.dirname(summary_path) or ".", exist_ok=True)
    if os.path.exists(summary_path):
        try:
            existing = pd.read_csv(summary_path)
        except Exception:
            existing = pd.DataFrame(columns=stats.columns)
    else:
        existing = pd.DataFrame(columns=stats.columns)
    for col in stats.columns:
        if col not in existing.columns:
            existing[col] = np.nan
    keys = existing[["model", "category"]].apply(tuple, axis=1) if len(existing) else pd.Series(dtype=object)
    new_keys = set(stats[["model", "category"]].apply(tuple, axis=1))
    kept = existing[~keys.isin(new_keys)] if len(existing) else existing
    updated = pd.concat([kept, stats], ignore_index=True)
    updated = updated.sort_values(["model", "category"]).reset_index(drop=True)
    updated.to_csv(summary_path, index=False)
    return updated


def plot_distribution_png(scored_df: pd.DataFrame, out_path: str, *,
                          distance_col: str = "cosine_distance") -> bool:
    """Histogram grid (model rows × category cols) — scores.py:383-431.
    Returns False (and writes nothing) when matplotlib is unavailable,
    matching the reference's soft dependency."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    import os

    models = sorted(scored_df["model"].unique())
    cats = sorted(scored_df["category"].unique())
    fig, axes = plt.subplots(
        len(models), len(cats), figsize=(4 * len(cats), 3.5 * len(models)), squeeze=False
    )
    for r, m in enumerate(models):
        for c, cat in enumerate(cats):
            ax = axes[r][c]
            vals = scored_df[(scored_df["model"] == m) & (scored_df["category"] == cat)][
                distance_col
            ].to_numpy(dtype=float)
            if vals.size == 0:
                ax.set_axis_off()
                continue
            ax.hist(vals, bins=40, range=(0.0, 2.0))
            ax.axvline(float(vals.mean()), linestyle="--", linewidth=1.5)
            ax.set_title(f"{m}\n{cat}")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=200)
    plt.close(fig)
    return True


def write_eval_outputs(scored_ds, out_dir: str, *, distance_col: str = "cosine_distance"):
    """Scored rows → the reference's full sink layout under ``out_dir``:

    - ``categories/<model>_<category>.csv`` (+ ``_char.csv``) — written
      distributed, one file per group;
    - ``models/<model>.csv`` — per-model aggregate, written distributed;
    - ``summary.csv`` — per-(model, category) stats, upserted driver-side;
    - ``distributions.png`` — optional, only if matplotlib exists.

    Returns the summary DataFrame."""
    import os

    cat_dir = os.path.join(out_dir, "categories")
    model_dir = os.path.join(out_dir, "models")
    scored_ds = scored_ds.materialize()  # consumed by three sinks below
    stats = (
        scored_ds.groupby(["model", "category"])
        .map_groups(lambda g: _write_category_files(g, cat_dir, distance_col), batch_format="pandas")
        .to_pandas()
    )
    scored_ds.groupby("model").map_groups(
        lambda g: _write_model_csv(g, model_dir, distance_col), batch_format="pandas"
    ).to_pandas()
    summary = upsert_summary_csv(os.path.join(out_dir, "summary.csv"), stats)
    try:
        import matplotlib  # noqa: F401  (soft dependency — skip the plot pass entirely without it)

        plot_distribution_png(scored_ds.to_pandas(), os.path.join(out_dir, "distributions.png"),
                              distance_col=distance_col)
    except ImportError:
        pass
    return summary
