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


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


class TestMisraGries:
    def _zipf_stream(self, n=50_000, seed=9):
        rng = np.random.default_rng(seed)
        return rng.zipf(1.5, n).astype(np.int64) % 1000

    def test_bound_holds_through_merges(self):
        import pandas as pd

        from article_extraction_ray.stages.sketch import mg_merge, mg_reduce

        vals = self._zipf_stream()
        m = 64
        chunks = np.array_split(vals, 17)
        summaries = [mg_reduce(pd.Series(c).value_counts(), m) for c in chunks]
        merged = mg_merge(summaries, m)
        true = pd.Series(vals).value_counts()
        bound = len(vals) / (m + 1)
        for key, est in merged.items():
            assert est <= true[key]
            assert true[key] - est <= bound
        # every key more frequent than the bound must survive
        for key, cnt in true.items():
            if cnt > bound:
                assert key in merged.index, (key, cnt, bound)

    def test_distributed_matches_semantics(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.sketch import heavy_hitters_mg

        vals = self._zipf_stream(20_000, seed=3)
        df = pd.DataFrame({"v": vals})
        ds = rd.from_pandas(df).repartition(6)
        summ, total = heavy_hitters_mg(
            ds, 64, lambda b: b["v"].to_numpy(zero_copy_only=False)
        )
        assert total == len(vals)
        true = pd.Series(vals).value_counts()
        bound = total / 65
        for key, est in summ.items():
            assert est <= true[key] and true[key] - est <= bound


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class TestBloom:
    def test_no_false_negatives(self):
        from article_extraction_ray.stages.sketch import BloomFilter

        rng = np.random.default_rng(1)
        for trial in range(20):
            keys = rng.choice(10**9, 2000, replace=False)
            bf = BloomFilter.from_keys(keys, fpp=0.01)
            assert bf.might_contain(keys).all()

    def test_fp_rate_near_target(self):
        from article_extraction_ray.stages.sketch import BloomFilter

        rng = np.random.default_rng(2)
        keys = rng.choice(10**9, 10_000, replace=False)
        bf = BloomFilter.from_keys(keys, fpp=0.01)
        probe = rng.choice(10**9, 50_000, replace=False)
        probe = probe[~np.isin(probe, keys)]
        fp = bf.might_contain(probe).mean()
        assert fp < 0.03, fp

    def test_string_keys(self):
        from article_extraction_ray.stages.sketch import BloomFilter

        keys = np.array([f"url-{i}" for i in range(500)])
        bf = BloomFilter.from_keys(keys, fpp=0.01)
        assert bf.might_contain(keys).all()
        other = np.array([f"other-{i}" for i in range(5000)])
        assert bf.might_contain(other).mean() < 0.03

    def test_empty(self):
        from article_extraction_ray.stages.sketch import BloomFilter

        bf = BloomFilter.from_keys(np.array([], dtype=np.int64))
        assert bf.might_contain(np.array([1, 2, 3])).sum() == 0
        assert len(bf.might_contain(np.array([], dtype=np.int64))) == 0


class TestCountMin:
    def test_one_sided_and_bounded(self):
        import numpy as np

        from article_extraction_ray.stages.sketch import cms_estimate, cms_partial

        rng = np.random.default_rng(7)
        keys = rng.zipf(1.5, 20000).astype(str)
        keys = np.array([k for k in keys], dtype=object)
        d, w = 4, 1 << 12
        sk = cms_partial(keys, d=d, w=w)
        import pandas as pd

        true = pd.Series(keys).value_counts()
        probes = np.array(true.index[:50].tolist() + ["__absent__"], dtype=object)
        est = cms_estimate(sk, probes)
        exact = np.array([true.get(p, 0) for p in probes])
        assert (est >= exact).all()  # one-sided: never undercounts
        # the ε·N bound (w = e/ε) holds per key with prob 1−δ, δ = e^−d;
        # require it for ≥ 95% of probes rather than all (statistical)
        eps_n = np.e / w * len(keys)
        assert (est - exact <= eps_n).mean() >= 0.95

    def test_linearity_merge(self):
        import numpy as np

        from article_extraction_ray.stages.sketch import cms_partial

        rng = np.random.default_rng(11)
        a = rng.integers(0, 500, 5000)
        b = rng.integers(0, 500, 3000)
        sa = cms_partial(a)
        sb = cms_partial(b)
        sab = cms_partial(np.concatenate([a, b]))
        assert (sa + sb == sab).all()  # cms(A∪B) == cms(A)+cms(B) exactly

    def test_distributed_build_matches_local(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.sketch import cms_build, cms_partial

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 200, 4000)
        ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(7)
        got = cms_build(ds, lambda b: b["v"].to_numpy(), d=4, w=1 << 10)
        want = cms_partial(vals, d=4, w=1 << 10)
        assert (got == want).all()


class TestJoinSizeEstimate:
    def test_one_sided_and_tight(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.sketch import estimate_join_size

        rng = np.random.default_rng(8)
        left = pd.DataFrame({"k": rng.integers(0, 500, 20_000).astype(np.int64)})
        right = pd.DataFrame({"k": rng.integers(0, 500, 5_000).astype(np.int64)})
        exact = len(left.merge(right, on="k"))
        est = estimate_join_size(
            rd.from_pandas(left).repartition(6), rd.from_pandas(right).repartition(3), "k"
        )
        assert est >= exact  # one-sided: collisions only inflate
        assert est <= exact * 1.05  # w=16384 >> 500 keys → tight

    def test_disjoint_keys_estimate_near_zero(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.sketch import estimate_join_size

        left = pd.DataFrame({"k": np.arange(0, 1000, dtype=np.int64)})
        right = pd.DataFrame({"k": np.arange(10_000, 11_000, dtype=np.int64)})
        est = estimate_join_size(rd.from_pandas(left), rd.from_pandas(right), "k")
        assert est <= 1000 * 1000 / (1 << 14) * 4  # collision-bound small
