"""Connected components: numpy kernel, driver path, distributed path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from article_extraction_ray.stages.graph import _cc_numpy


def _cc_reference(src, dst, all_nodes):
    """Pure-Python union-find ground truth."""
    parent = {n: n for n in all_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to component minimum
    comp = {}
    for n in all_nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


class TestNumpyKernel:
    def test_chain(self):
        src = np.array([1, 2, 3, 10, 11], dtype=np.int64)
        dst = np.array([2, 3, 4, 11, 12], dtype=np.int64)
        nodes, comp = _cc_numpy(src, dst)
        got = dict(zip(nodes.tolist(), comp.tolist()))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    def test_long_path_and_cliques_random(self):
        rng = np.random.default_rng(3)
        # one long path (stresses pointer jumping) + random clutter
        path = np.arange(5000, dtype=np.int64) + 100_000
        src = [path[:-1]]
        dst = [path[1:]]
        src.append(rng.integers(0, 2000, 4000))
        dst.append(rng.integers(0, 2000, 4000))
        s, d = np.concatenate(src), np.concatenate(dst)
        keep = s != d
        s, d = s[keep], d[keep]
        nodes, comp = _cc_numpy(s, d)
        expect = _cc_reference(s.tolist(), d.tolist(), nodes.tolist())
        assert dict(zip(nodes.tolist(), comp.tolist())) == expect

    def test_direction_invariance(self):
        src = np.array([5, 3, 9], dtype=np.int64)
        dst = np.array([3, 1, 5], dtype=np.int64)
        n1, c1 = _cc_numpy(src, dst)
        n2, c2 = _cc_numpy(dst, src)
        assert np.array_equal(n1, n2) and np.array_equal(c1, c2)


@pytest.fixture()
def edge_frames():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 3000, 5000).astype(np.int64)
    dst = rng.integers(0, 3000, 5000).astype(np.int64)
    keep = src != dst
    return pd.DataFrame({"src": src[keep], "dst": dst[keep]})


class TestDatasetPaths:
    def _expect(self, df, all_nodes):
        return _cc_reference(df["src"].tolist(), df["dst"].tolist(), all_nodes)

    def test_driver_path_with_isolated_nodes(self, ray_session, edge_frames):
        import ray.data as rd

        from article_extraction_ray.stages.graph import connected_components

        nodes = rd.from_pandas(pd.DataFrame({"node": np.arange(3100, dtype=np.int64)}))
        out = (
            connected_components(rd.from_pandas(edge_frames).repartition(4), nodes=nodes)
            .to_pandas()
            .set_index("node")["component"]
            .to_dict()
        )
        expect = self._expect(edge_frames, list(range(3100)))
        assert out == expect  # isolated nodes are singletons labeled by self

    def test_distributed_path_matches_driver(self, ray_session, edge_frames):
        import ray.data as rd

        from article_extraction_ray.stages.graph import connected_components

        ds = rd.from_pandas(edge_frames).repartition(4)
        # force the distributed iterative path with a zero budget
        dist = (
            connected_components(ds, driver_edge_budget=0)
            .to_pandas()
            .set_index("node")["component"]
            .to_dict()
        )
        nodes = sorted(set(edge_frames["src"]) | set(edge_frames["dst"]))
        assert dist == self._expect(edge_frames, nodes)

    def test_distributed_multi_hop_chain(self, ray_session):
        import ray.data as rd

        # a 40-node path forces >1 propagation round
        df = pd.DataFrame({"src": np.arange(40, dtype=np.int64),
                           "dst": np.arange(1, 41, dtype=np.int64)})
        dist = (
            connected_components_import()(rd.from_pandas(df), driver_edge_budget=0)
            .to_pandas()
        )
        assert (dist["component"] == 0).all() and len(dist) == 41


def connected_components_import():
    from article_extraction_ray.stages.graph import connected_components

    return connected_components


class TestPageRank:
    """Distributed power iteration vs the single-process reference."""

    def _edges(self):
        rng = np.random.default_rng(31)
        src = rng.integers(0, 60, 400).astype(np.int64)
        dst = rng.integers(0, 60, 400).astype(np.int64)
        keep = src != dst
        return src[keep], dst[keep]

    def test_matches_reference(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank, pagerank_local

        src, dst = self._edges()
        ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(7)
        got = pagerank(ds, iters=12).reset_index(drop=True)
        want = pagerank_local(src, dst, iters=12)
        assert (got["node"].to_numpy() == want["node"].to_numpy()).all()
        assert np.allclose(got["rank"], want["rank"], atol=1e-9)
        # ranks are a probability distribution
        assert abs(got["rank"].sum() - 1.0) < 1e-6

    def test_dangling_nodes_handled(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank, pagerank_local

        # star into a sink: node 9 has no out-edges (dangling)
        src = np.array([0, 1, 2, 3], dtype=np.int64)
        dst = np.array([9, 9, 9, 9], dtype=np.int64)
        ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        got = pagerank(ds, iters=20).reset_index(drop=True)
        want = pagerank_local(src, dst, iters=20)
        assert np.allclose(got["rank"], want["rank"], atol=1e-12)
        assert got.loc[got["node"] == 9, "rank"].iloc[0] > got["rank"].min()


class TestLabelPropagation:
    def test_two_communities(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.graph import label_propagation

        # two chains: 0-1-2-3 and 10-11-12-13, seeds at the ends
        edges = pd.DataFrame(
            {"src": [0, 1, 2, 10, 11, 12], "dst": [1, 2, 3, 11, 12, 13]}
        )
        out = label_propagation(
            rd.from_pandas(edges).repartition(3), {0: 7, 10: 9}, max_iters=10
        )
        got = out.set_index("node")["label"].to_dict()
        assert {k: got[k] for k in [0, 1, 2, 3]} == {0: 7, 1: 7, 2: 7, 3: 7}
        assert {k: got[k] for k in [10, 11, 12, 13]} == {10: 9, 11: 9, 12: 9, 13: 9}

    def test_tie_breaks_to_smallest_label(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.graph import label_propagation

        # node 1 sits between two seeds with labels 5 and 3 → 3 wins
        edges = pd.DataFrame({"src": [0, 2], "dst": [1, 1]})
        out = label_propagation(rd.from_pandas(edges), {0: 5, 2: 3}, max_iters=5)
        assert out.set_index("node")["label"].to_dict()[1] == 3

    def test_seeds_never_flip(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.graph import label_propagation

        edges = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})  # triangle
        out = label_propagation(rd.from_pandas(edges), {0: 1, 1: 2}, max_iters=8)
        got = out.set_index("node")["label"].to_dict()
        assert got[0] == 1 and got[1] == 2


class TestPageRankCheckpoint:
    def test_resumed_equals_uninterrupted(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.graph import pagerank

        edges = pd.DataFrame({"src": [0, 1, 2, 3, 0], "dst": [1, 2, 0, 0, 2]})
        eds = rd.from_pandas(edges).repartition(2)
        full = pagerank(eds, iters=6)
        ck = str(tmp_path / "pr")
        pagerank(eds, iters=3, ckpt_dir=ck)       # "crash" after 3 sweeps
        resumed = pagerank(eds, iters=6, ckpt_dir=ck)
        pd.testing.assert_frame_equal(resumed, full)


class TestBucketedNodeState:
    """The web-scale node-state-as-Dataset plans must equal the
    broadcast plans exactly (the round-2 verdict's documented-swap ask)."""

    def _edges(self, seed=77, n_nodes=80, n_edges=600):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
        keep = src != dst
        return pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    def test_pagerank_bucketed_equals_broadcast(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank

        eds = rd.from_pandas(self._edges()).repartition(5)
        broad = pagerank(eds, iters=8, path="broadcast")
        buck = pagerank(eds, iters=8, path="bucketed")
        assert (broad["node"].to_numpy() == buck["node"].to_numpy()).all()
        # same formula, float64 both plans; round-10 output must agree
        assert np.allclose(broad["rank"], buck["rank"], atol=1e-10, rtol=0)

    def test_pagerank_bucketed_dangling(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank, pagerank_local

        src = np.array([0, 1, 2, 3], dtype=np.int64)
        dst = np.array([9, 9, 9, 9], dtype=np.int64)
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
        got = pagerank(eds, iters=15, path="bucketed")
        want = pagerank_local(src, dst, iters=15)
        assert np.allclose(got["rank"], want["rank"], atol=1e-10)

    def test_pagerank_auto_routes_by_budget(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank

        eds = rd.from_pandas(self._edges()).repartition(3)
        # node_budget below the node count forces the bucketed plan via
        # the auto router; result must match the broadcast plan
        auto_small = pagerank(eds, iters=5, node_budget=10)  # → bucketed
        broad = pagerank(eds, iters=5, path="broadcast")
        assert np.allclose(auto_small["rank"], broad["rank"], atol=1e-10)

    def test_pagerank_bucketed_checkpoint_resume(self, ray_session, tmp_path):
        import ray.data as rd
        from article_extraction_ray.stages.graph import pagerank

        eds = rd.from_pandas(self._edges(seed=5, n_nodes=20, n_edges=80)).repartition(2)
        full = pagerank(eds, iters=6, path="bucketed")
        ck = str(tmp_path / "prb")
        pagerank(eds, iters=3, path="bucketed", ckpt_dir=ck)  # "crash"
        resumed = pagerank(eds, iters=6, path="bucketed", ckpt_dir=ck)
        pd.testing.assert_frame_equal(resumed, full)

    def test_label_prop_bucketed_equals_broadcast(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import label_propagation

        edges = self._edges(seed=11, n_nodes=40, n_edges=120)
        seeds = {0: 7, 1: 9, 2: 3}
        eds = rd.from_pandas(edges).repartition(4)
        broad = label_propagation(eds, seeds, max_iters=6, path="broadcast")
        buck = label_propagation(eds, seeds, max_iters=6, path="bucketed")
        pd.testing.assert_frame_equal(
            broad.reset_index(drop=True), buck.reset_index(drop=True)
        )

    def test_label_prop_bucketed_tie_and_fixed(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.graph import label_propagation

        edges = pd.DataFrame({"src": [0, 2, 0, 1, 2], "dst": [1, 1, 2, 2, 0]})
        out = label_propagation(
            rd.from_pandas(edges), {0: 5, 2: 3}, max_iters=5, path="bucketed"
        )
        got = out.set_index("node")["label"].to_dict()
        assert got[1] == 3  # tie → smallest label
        assert got[0] == 5 and got[2] == 3  # seeds never flip


class TestTriangleCount:
    def test_distributed_equals_driver_kernel(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.graph import triangle_count

        rng = np.random.default_rng(21)
        src = rng.integers(0, 40, 300).astype(np.int64)
        dst = rng.integers(0, 40, 300).astype(np.int64)
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst})).repartition(4)
        fast = triangle_count(eds)                           # driver kernel
        dist = triangle_count(eds, driver_edge_budget=0)     # forced distributed
        assert fast == dist

        # closed form on a known graph: K4 has exactly 4 triangles
        k4 = pd.DataFrame(
            {"src": [0, 0, 0, 1, 1, 2], "dst": [1, 2, 3, 2, 3, 3]}
        )
        assert triangle_count(rd.from_pandas(k4)) == 4
        assert triangle_count(rd.from_pandas(k4), driver_edge_budget=0) == 4


class TestPersonalizedPageRank:
    """restart_node concentrates teleport + dangling mass on the source;
    both physical plans and the local reference must agree, and the
    standard uniform path must be byte-unchanged."""

    def _edges(self, rd):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(21)
        n = 400
        df = pd.DataFrame(
            {
                "src": rng.integers(0, 60, n).astype(np.int64),
                "dst": rng.integers(0, 60, n).astype(np.int64),
            }
        )
        df = df[df["src"] != df["dst"]].drop_duplicates()
        return df, rd.from_pandas(df).repartition(4)

    def test_plans_and_local_reference_agree(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.graph import pagerank, pagerank_local

        df, ds = self._edges(rd)
        src_node = int(df["src"].iloc[0])
        bc = pagerank(ds, iters=6, restart_node=src_node, path="broadcast")
        bu = pagerank(ds, iters=6, restart_node=src_node, path="bucketed")
        lo = pagerank_local(
            df["src"].to_numpy(), df["dst"].to_numpy(), iters=6, restart_node=src_node
        )
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True), bu.reset_index(drop=True), check_dtype=False
        )
        pd.testing.assert_frame_equal(
            bc.reset_index(drop=True), lo.reset_index(drop=True), check_dtype=False
        )
        # restart mass concentrates: the source outranks the median node
        ranks = bc.set_index("node")["rank"]
        assert ranks.loc[src_node] > ranks.median()

    def test_unknown_source_raises(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from article_extraction_ray.stages.graph import pagerank

        _df, ds = self._edges(rd)
        with _pytest.raises(ValueError, match="restart_node"):
            pagerank(ds, iters=2, restart_node=10**9, path="broadcast")


class TestSssp:
    @staticmethod
    def _reference(src, dst, w, seeds, n_nodes, iters):
        """Plain-python Bellman-Ford over ≤iters hops."""
        INF = float("inf")
        nodes = sorted(set(src) | set(dst))
        dist = {v: INF for v in nodes}
        for s in seeds:
            if s in dist:
                dist[s] = 0
        for _ in range(iters):
            new = dict(dist)
            for a, b, ww in zip(src, dst, w):
                if dist[a] < INF and dist[a] + ww < new[b]:
                    new[b] = dist[a] + ww
            if new == dist:
                break
            dist = new
        return {v: d for v, d in dist.items() if d < INF}

    def _graph(self, seed=7, n=60, m=240):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst
        w = rng.integers(1, 9, m).astype(np.int64)[keep]
        return src[keep], dst[keep], w

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.graph import sssp

        src, dst, w = self._graph()
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst, "w": w})).repartition(5)
        got = sssp(eds, [0, 17], iters=12)
        want = self._reference(src, dst, w, [0, 17], 60, 12)
        assert dict(zip(got["node"], got["dist"])) == want

    def test_bucketed_path_identical(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.graph import sssp

        src, dst, w = self._graph(seed=11)
        eds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst, "w": w})).repartition(5)
        a = sssp(eds, [3], iters=6, path="broadcast").reset_index(drop=True)
        b = sssp(eds, [3], iters=6, path="bucketed").reset_index(drop=True)
        a = a.sort_values("node").reset_index(drop=True)
        b = b.sort_values("node").reset_index(drop=True)
        assert (a["node"].to_numpy() == b["node"].to_numpy()).all()
        assert (a["dist"].to_numpy() == b["dist"].to_numpy()).all()

    def test_unreachable_excluded(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.graph import sssp

        # 0→1→2 and an island 5→6 never reached from seed 0
        eds = rd.from_pandas(
            pd.DataFrame({"src": [0, 1, 5], "dst": [1, 2, 6], "w": [4, 2, 1]})
        )
        got = sssp(eds, [0], iters=8)
        assert dict(zip(got["node"], got["dist"])) == {0: 0, 1: 4, 2: 6}
