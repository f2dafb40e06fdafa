"""t-digest quantile sketch: rank accuracy, mergeability, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from article_extraction_ray.stages.tdigest import (
    tdigest_merge,
    tdigest_partial,
    tdigest_quantile,
)

_QS = np.array([0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def _rank_error(values: np.ndarray, digest: bytes, qs=_QS) -> float:
    """Max |actual rank of estimate − target rank| over the quantiles."""
    est = tdigest_quantile(digest, qs)
    sv = np.sort(values)
    ranks = np.searchsorted(sv, est, side="left") / len(sv)
    return float(np.max(np.abs(ranks - qs)))


@pytest.mark.parametrize(
    "dist",
    ["uniform", "lognormal", "bimodal", "integers"],
)
def test_rank_accuracy_single_pass(dist):
    rng = np.random.default_rng(11)
    n = 200_000
    if dist == "uniform":
        vals = rng.uniform(0, 1e6, n)
    elif dist == "lognormal":
        vals = rng.lognormal(3.0, 2.0, n)
    elif dist == "bimodal":
        vals = np.r_[rng.normal(0, 1, n // 2), rng.normal(100, 5, n // 2)]
    else:
        vals = rng.integers(0, 50, n).astype(np.float64)  # heavy ties
    err = _rank_error(vals, tdigest_partial(vals))
    assert err <= 0.01, err


def test_merge_accuracy_matches_single_pass():
    rng = np.random.default_rng(2)
    vals = rng.lognormal(0.0, 1.5, 300_000)
    parts = [tdigest_partial(c) for c in np.array_split(vals, 16)]
    merged = tdigest_merge(parts)
    assert _rank_error(vals, merged) <= 0.015


def test_merge_associative_accuracy():
    rng = np.random.default_rng(9)
    vals = rng.normal(0, 10, 120_000)
    chunks = np.array_split(vals, 12)
    left = tdigest_merge([tdigest_partial(c) for c in chunks[:6]])
    right = tdigest_merge([tdigest_partial(c) for c in chunks[6:]])
    two_level = tdigest_merge([left, right])
    flat = tdigest_merge([tdigest_partial(c) for c in chunks])
    # both merge trees hit the same accuracy bound (values differ
    # slightly — compression is order-sensitive, accuracy is not)
    assert _rank_error(vals, two_level) <= 0.015
    assert _rank_error(vals, flat) <= 0.015


def test_deterministic_and_compact():
    rng = np.random.default_rng(4)
    vals = rng.uniform(-5, 5, 50_000)
    d1 = tdigest_partial(vals)
    d2 = tdigest_partial(vals.copy())
    assert d1 == d2
    assert len(d1) <= (200 + 2) * 16  # ≤ delta+1 centroids × 2 float64


def test_nan_dropped_empty_safe():
    d = tdigest_partial(np.array([np.nan, np.nan]))
    assert np.isnan(tdigest_quantile(d, 0.5)).all()
    d2 = tdigest_partial(np.array([1.0, np.nan, 3.0]))
    assert 1.0 <= tdigest_quantile(d2, 0.5)[0] <= 3.0


def test_distributed_column_digest(ray_session):
    import pandas as pd
    import ray.data as rd

    from article_extraction_ray.stages.tdigest import tdigest_column

    rng = np.random.default_rng(6)
    vals = rng.lognormal(1.0, 1.0, 80_000)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    digest = tdigest_column(ds, "v")
    assert _rank_error(vals, digest) <= 0.015


def test_grouped_quantiles_close_to_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from article_extraction_ray.stages.tdigest import tdigest_grouped

    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {"g": rng.integers(0, 4, 80_000), "v": rng.lognormal(0, 1.2, 80_000)}
    )
    out = (
        tdigest_grouped(rd.from_pandas(df).repartition(8), "g", "v", [0.5, 0.9])
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        sv = np.sort(sub["v"].to_numpy())
        for q, col in [(0.5, "q_50"), (0.9, "q_90")]:
            rank = np.searchsorted(sv, out.loc[g, col]) / len(sv)
            assert abs(rank - q) <= 0.015
