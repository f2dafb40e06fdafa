"""HyperBall neighborhood function: accuracy vs exact BFS, plan parity,
determinism, effective-diameter readout."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from article_extraction_ray.stages.hyperball import effective_diameter, hyperball


def _exact_nf(src, dst, t_max):
    """Exact neighborhood function by BFS from every node."""
    nodes = sorted(set(src) | set(dst))
    adj = {v: [] for v in nodes}
    for a, b in zip(src, dst):
        adj[a].append(b)
    out = []
    balls = {v: {v} for v in nodes}
    out.append(sum(len(b) for b in balls.values()))
    for _ in range(t_max):
        new = {}
        for v in nodes:
            s = set(balls[v])
            for w in adj[v]:
                s |= balls[w]
            new[v] = s
        balls = new
        out.append(sum(len(b) for b in balls.values()))
    return out


def _graph(seed=13, n=120, m_edges=360):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m_edges).astype(np.int64)
    dst = rng.integers(0, n, m_edges).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


class TestHyperball:
    def test_estimates_track_exact_bfs(self, ray_session):
        import ray.data as rd

        src, dst = self._edges()
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(4)
        nf = hyperball(eds, t_max=4, p=10)
        exact = _exact_nf(src, dst, 4)
        assert list(nf["t"]) == [0, 1, 2, 3, 4]
        for est, ex in zip(nf["n_pairs_est"], exact):
            assert abs(est - ex) / ex < 0.15  # p=10 → σ ≈ 3.25%
        # neighborhood function is monotone non-decreasing
        assert (np.diff(nf["n_pairs_est"].to_numpy()) >= -1e-9).all()

    def _edges(self):
        return _graph()

    def test_plans_agree_exactly(self, ray_session):
        import ray.data as rd

        src, dst = _graph(seed=29, n=60, m_edges=150)
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(3)
        a = hyperball(eds, t_max=3, p=6, path="broadcast")
        b = hyperball(eds, t_max=3, p=6, path="bucketed")
        pd.testing.assert_frame_equal(a, b)

    def test_deterministic(self, ray_session):
        import ray.data as rd

        src, dst = _graph(seed=31, n=50, m_edges=120)
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        a = hyperball(eds, t_max=3, p=8)
        b = hyperball(eds, t_max=3, p=8)
        pd.testing.assert_frame_equal(a, b)

    def test_effective_diameter_on_chain(self, ray_session):
        import ray.data as rd

        # directed chain 0→1→…→9: N(t) grows linearly until t=9
        src = np.arange(9, dtype=np.int64)
        dst = src + 1
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        nf = hyperball(eds, t_max=9, p=10)
        d = effective_diameter(nf, q=0.9)
        assert 7 <= d <= 9
