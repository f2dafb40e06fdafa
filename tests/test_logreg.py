"""Distributed logistic regression: parity vs the textbook driver
kernel, decision stability, and the scoring pass."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from article_extraction_ray.stages.logreg import (
    _sigmoid,
    logreg_fit,
    logreg_fit_arrays,
    logreg_score,
)


def _toy(seed=5, n=400, d=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    true_w = np.array([1.5, -2.0, 0.5])
    p = _sigmoid(x @ true_w + 0.25)
    y = (rng.random(n) < p).astype(np.float64)
    return x, y


class TestFit:
    def test_distributed_matches_driver_kernel(self, ray_session):
        import ray.data as rd

        x, y = _toy()
        df = pd.DataFrame({f"f{i}": x[:, i] for i in range(3)})
        df["y"] = y
        ds = rd.from_pandas(df).repartition(6)

        def feats(batch: pa.Table) -> np.ndarray:
            return np.column_stack(
                [batch[f"f{i}"].to_numpy(zero_copy_only=False) for i in range(3)]
            )

        def labels(batch: pa.Table) -> np.ndarray:
            return batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)

        w_dist = logreg_fit(ds, feats, labels, d=3, iters=30, lr=0.5)
        w_ref = logreg_fit_arrays(x, y, iters=30, lr=0.5)
        assert np.allclose(w_dist, w_ref, atol=1e-9)
        # identical decisions everywhere
        xb = np.concatenate([x, np.ones((len(y), 1))], axis=1)
        assert ((xb @ w_dist >= 0) == (xb @ w_ref >= 0)).all()

    def test_fit_learns_signal(self):
        x, y = _toy(seed=11, n=2000)
        w = logreg_fit_arrays(x, y, iters=200, lr=0.5)
        xb = np.concatenate([x, np.ones((len(y), 1))], axis=1)
        acc = (( _sigmoid(xb @ w) >= 0.5) == (y == 1.0)).mean()
        assert acc > 0.8
        assert np.sign(w[0]) == 1 and np.sign(w[1]) == -1


class TestScore:
    def test_score_appends_probability(self, ray_session):
        import ray.data as rd

        x, y = _toy(seed=7, n=100)
        df = pd.DataFrame({f"f{i}": x[:, i] for i in range(3)})
        ds = rd.from_pandas(df)

        def feats(batch: pa.Table) -> np.ndarray:
            return np.column_stack(
                [batch[f"f{i}"].to_numpy(zero_copy_only=False) for i in range(3)]
            )

        w = np.array([1.0, -1.0, 0.5, 0.1])
        out = logreg_score(ds, w, feats).to_pandas()
        want = _sigmoid(x @ w[:-1] + w[-1])
        assert np.allclose(np.sort(out["p"].to_numpy()), np.sort(want), atol=1e-12)
        assert ((out["p"] > 0) & (out["p"] < 1)).all()
