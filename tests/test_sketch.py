"""HyperLogLog sketch: accuracy, mergeability, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from article_extraction_ray.stages.sketch import (
    hll_estimate,
    hll_merge,
    hll_partial,
)


@pytest.mark.parametrize("n", [100, 5_000, 200_000])
def test_accuracy_within_bound(n):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**62, n)
    exact = len(np.unique(vals))
    est = hll_estimate(hll_partial(vals, p=14))
    # theoretical stderr ~1.04/sqrt(2^14) = 0.8%; allow 4 sigma
    assert abs(est - exact) / exact < 0.04


def test_merge_equals_single_pass():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**62, 50_000)
    whole = hll_partial(vals, p=12)
    parts = [hll_partial(chunk, p=12) for chunk in np.array_split(vals, 7)]
    assert np.array_equal(hll_merge(parts), whole)


def test_duplicates_do_not_inflate():
    vals = np.tile(np.arange(500), 100)  # 50k rows, 500 distinct
    est = hll_estimate(hll_partial(vals, p=14))
    assert abs(est - 500) / 500 < 0.04


def test_deterministic():
    vals = np.arange(10_000)
    assert np.array_equal(hll_partial(vals), hll_partial(vals.copy()))


def test_distributed_matches_exact_tolerance(ray_session):
    import ray.data as rd

    from article_extraction_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 3_000, 40_000)
    exact = len(np.unique(vals))
    import pandas as pd

    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    est = hll_distinct(ds, "v", p=14)
    assert abs(est - exact) / exact < 0.04


def test_grouped_hll_close_to_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    from article_extraction_ray.stages.sketch import hll_distinct_grouped

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"g": rng.integers(0, 4, 60_000), "v": rng.integers(0, 2_000, 60_000)}
    )
    out = (
        hll_distinct_grouped(rd.from_pandas(df).repartition(8), "g", "v", p=12)
        .to_pandas()
        .set_index("g")["n_distinct_est"]
    )
    exact = df.groupby("g")["v"].nunique()
    for g in exact.index:
        assert abs(out[g] - exact[g]) / exact[g] < 0.08  # 4 sigma at p=12
