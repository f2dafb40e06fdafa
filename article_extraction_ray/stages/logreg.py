"""Distributed logistic regression — the "train a quality classifier
over the corpus, then filter with it" pair every large-scale curation
pipeline runs (FineWeb-Edu / DCLM-style fastText-ish gates, reduced to
the public textbook estimator).

Training is full-batch gradient descent with a fixed iteration count
and learning rate: each sweep broadcasts the weight vector, every batch
emits ONE (d+1)-float gradient partial (X'(σ(Xw) − y) over its rows —
fixed width at any corpus size), and the driver folds partials and
steps.  Deterministic: float64, fixed iters, no sampling.  The same
geometry as k-means / PageRank sweeps; checkpointing is unnecessary at
seconds-per-fit but the sweep count is tiny and fixed.

Scoring/filtering is a stateless broadcast-weights ``map_batches``
pass — the corpus streams once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically-stable logistic
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_fit_arrays(x: np.ndarray, y: np.ndarray, *, iters: int = 50, lr: float = 0.5,
                      l2: float = 1e-3) -> np.ndarray:
    """Driver-kernel reference: plain full-batch GD on (n×d) features.
    Returns weights of length d+1 (bias last).  The distributed fit is
    tested for parity against this."""
    n, d = x.shape
    xb = np.concatenate([x, np.ones((n, 1))], axis=1)
    w = np.zeros(d + 1)
    for _ in range(iters):
        g = xb.T @ (_sigmoid(xb @ w) - y) / n + l2 * w
        w = w - lr * g
    return w


def logreg_fit(ds, feature_fn, label_fn, *, d: int, iters: int = 50, lr: float = 0.5,
               l2: float = 1e-3) -> np.ndarray:
    """Distributed full-batch GD fit → weight vector (length d+1).

    ``feature_fn(batch) -> (n×d) float64`` and ``label_fn(batch) ->
    (n,) float64 in {0,1}`` run inside each task; the weight vector
    broadcasts per sweep and each batch returns one flat partial
    ``[gradient-sums (d+1), row count]`` — the driver folds and steps.
    Bit-parity with :func:`logreg_fit_arrays` is NOT exact (per-block
    partial sums reassociate the float reduction) but agrees to ~1e-12
    on sane scales; tests assert tight allclose + identical decisions.
    """
    from ..state.broadcast import Broadcast

    ds = ds.materialize()  # iters sweeps share blocks
    w = np.zeros(d + 1)
    for _ in range(iters):
        handle = Broadcast(w)

        def partial(batch: pa.Table) -> pd.DataFrame:
            wv = handle.get()
            x = feature_fn(batch)
            y = label_fn(batch)
            xb = np.concatenate([x, np.ones((len(y), 1))], axis=1)
            g = xb.T @ (_sigmoid(xb @ wv) - y)
            row = np.concatenate([g, [float(len(y))]])
            return pd.DataFrame({"i": np.arange(row.size), "v": row})

        got = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        folded = got.groupby("i")["v"].sum().to_numpy()
        g, n = folded[:-1], folded[-1]
        w = w - lr * (g / n + l2 * w)
    return w


def logreg_score(ds, weights: np.ndarray, feature_fn, *, out_col: str = "p"):
    """Stateless scoring pass: broadcast weights once, stream the
    corpus, append σ(Xw + b)."""
    from ..state.broadcast import Broadcast

    handle = Broadcast(np.asarray(weights, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        wv = handle.get()
        x = feature_fn(batch)
        p = _sigmoid(x @ wv[:-1] + wv[-1])
        return batch.append_column(out_col, pa.array(p))

    return ds.map_batches(score, batch_format="pyarrow")
