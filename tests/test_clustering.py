"""k-means + IVF ANN: determinism, convergence, assignment, recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _blob_frame(n_per: int = 400, n_blobs: int = 6, d: int = 16, seed: int = 5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (n_blobs, d))
    vecs = np.concatenate(
        [centers[i] + rng.normal(0, 0.5, (n_per, d)) for i in range(n_blobs)]
    )
    ids = np.arange(len(vecs), dtype=np.int64)
    return pd.DataFrame({"vec_id": ids, "embedding": list(vecs.astype(np.float32))}), centers


@pytest.fixture(scope="module")
def blob_ds(ray_session):
    import ray.data as rd

    df, centers = _blob_frame()
    return rd.from_pandas(df).repartition(8), df, centers


class TestKMeans:
    def test_recovers_blob_centers(self, blob_ds):
        from article_extraction_ray.stages.clustering import kmeans_fit

        ds, df, centers = blob_ds
        cents = kmeans_fit(ds, 6, iters=15, seed=3)
        # every true center has a fitted centroid within blob radius
        d2 = np.linalg.norm(centers[:, None, :] - cents[None, :, :], axis=2)
        assert (d2.min(axis=1) < 1.0).all()

    def test_deterministic_across_layouts(self, blob_ds, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.clustering import kmeans_fit

        ds, df, _ = blob_ds
        c1 = kmeans_fit(ds, 4, iters=5, seed=9)
        # different block layout, same data → same centroids (init uses
        # hash priorities, accumulation folds per-cluster sums)
        ds2 = rd.from_pandas(df).repartition(3)
        c2 = kmeans_fit(ds2, 4, iters=5, seed=9)
        assert np.allclose(c1, c2, atol=1e-9)

    def test_assign_matches_numpy(self, blob_ds):
        from article_extraction_ray.stages.clustering import kmeans_assign, kmeans_fit

        ds, df, _ = blob_ds
        cents = kmeans_fit(ds, 5, iters=5, seed=1)
        out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
        mat = np.stack(df.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
        expect = np.argmax(mat @ cents.T - 0.5 * (cents * cents).sum(axis=1), axis=1)
        assert np.array_equal(out["cluster"].to_numpy(), expect)


class TestIVF:
    def test_recall_vs_brute_force(self, blob_ds):
        from article_extraction_ray.stages.clustering import knn_ivf
        from article_extraction_ray.stages.similarity import knn_brute_force

        ds, df, _ = blob_ds
        rng = np.random.default_rng(2)
        q_idx = rng.choice(len(df), 8, replace=False)
        queries = np.stack(df["embedding"].iloc[q_idx].to_numpy()).astype(np.float64)
        qids = df["vec_id"].iloc[q_idx].to_numpy()

        exact = knn_brute_force(ds, queries, qids, k=10).to_pandas()
        approx = knn_ivf(ds, queries, qids, k=10, nlist=12, nprobe=4,
                         kmeans_iters=5, seed=17).to_pandas()
        recalls = []
        for qid in qids:
            e = set(exact[exact["query_id"] == qid]["vec_id"])
            a = set(approx[approx["query_id"] == qid]["vec_id"])
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.9, recalls

    def test_prefit_centroids_reused(self, blob_ds):
        from article_extraction_ray.stages.clustering import kmeans_fit, knn_ivf

        ds, df, _ = blob_ds
        cents = kmeans_fit(ds, 6, iters=5, seed=17)
        queries = np.stack(df["embedding"].iloc[:2].to_numpy()).astype(np.float64)
        qids = df["vec_id"].iloc[:2].to_numpy()
        out1 = knn_ivf(ds, queries, qids, k=5, nprobe=3, centroids=cents).to_pandas()
        out2 = knn_ivf(ds, queries, qids, k=5, nprobe=3, centroids=cents).to_pandas()
        key = ["query_id", "rank"]
        pd.testing.assert_frame_equal(
            out1.sort_values(key).reset_index(drop=True),
            out2.sort_values(key).reset_index(drop=True),
        )
        assert set(out1["query_id"]) == set(qids)
        # self-hit: each query's own vector ranks first
        first = out1[out1["rank"] == 1]
        assert set(first["vec_id"]) == set(qids)


class TestSemanticDedup:
    """SemDeDup: planted near-duplicates are pruned, originals kept."""

    def _planted_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        base = rng.normal(0, 1, (300, 16))
        # ids 1000+ are near-copies of ids 0..99 (tiny perturbation)
        dups = base[:100] + rng.normal(0, 1e-4, (100, 16))
        vecs = np.concatenate([base, dups]).astype(np.float32)
        ids = np.concatenate([np.arange(300), np.arange(1000, 1100)]).astype(np.int64)
        df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
        return rd.from_pandas(df).repartition(6), df

    def test_planted_dups_pruned_originals_kept(self, ray_session):
        from article_extraction_ray.stages.clustering import semantic_dedup

        ds, df = self._planted_ds(ray_session)
        out = semantic_dedup(ds, k=12, threshold=0.99, iters=12, seed=3).to_pandas()
        assert len(out) == 400
        by_id = out.set_index("vec_id")
        # identical-direction copies always share a cluster with their
        # original (same argmax), so every planted dup must be dropped
        assert not by_id.loc[np.arange(1000, 1100), "keep"].any()
        # originals are greedy-first (smaller id) -> kept
        assert by_id.loc[np.arange(100), "keep"].all()
        # unrelated random vectors are far apart -> kept
        assert by_id.loc[np.arange(100, 300), "keep"].all()

    def test_deterministic_across_layouts(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.clustering import semantic_dedup

        _, df = self._planted_ds(ray_session)
        a = semantic_dedup(rd.from_pandas(df).repartition(3), k=12, threshold=0.99, seed=3).to_pandas()
        b = semantic_dedup(rd.from_pandas(df).repartition(13), k=12, threshold=0.99, seed=3).to_pandas()
        a = a.sort_values("vec_id").reset_index(drop=True)
        b = b.sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestKMeansCheckpoint:
    def test_resumed_fit_equals_uninterrupted(self, blob_ds, tmp_path):
        from article_extraction_ray.stages.clustering import kmeans_fit

        ds, df, centers = blob_ds
        full = kmeans_fit(ds, 6, iters=6, cache=False)
        # "crash" after 3 sweeps: checkpoints survive, rerun resumes
        ck = str(tmp_path / "ck")
        kmeans_fit(ds, 6, iters=3, cache=False, ckpt_dir=ck)
        resumed = kmeans_fit(ds, 6, iters=6, cache=False, ckpt_dir=ck)
        np.testing.assert_allclose(resumed, full, atol=1e-12)

    def test_checkpoint_prunes_old_iters(self, blob_ds, tmp_path):
        import os

        from article_extraction_ray.stages.clustering import kmeans_fit

        ds, _, _ = blob_ds
        ck = tmp_path / "ck2"
        kmeans_fit(ds, 6, iters=5, cache=False, ckpt_dir=str(ck))
        files = [f for f in os.listdir(ck) if f.endswith(".pkl")]
        assert 1 <= len(files) <= 2  # keep_last=2


class TestIterateWithCheckpoint:
    def test_resume_skips_done_steps(self, tmp_path):
        from article_extraction_ray.state.checkpoint import iterate_with_checkpoint

        calls = []

        def step(s, i):
            calls.append(i)
            return s + [i]

        ck = str(tmp_path / "it")
        out1 = iterate_with_checkpoint([], step, 3, ckpt_dir=ck)
        assert out1 == [0, 1, 2] and calls == [0, 1, 2]
        out2 = iterate_with_checkpoint([], step, 5, ckpt_dir=ck)
        assert out2 == [0, 1, 2, 3, 4]
        assert calls == [0, 1, 2, 3, 4]  # 0-2 never re-ran

    def test_early_stop(self, tmp_path):
        from article_extraction_ray.state.checkpoint import iterate_with_checkpoint

        out = iterate_with_checkpoint(
            0, lambda s, i: min(s + 1, 2), 100, should_stop=lambda a, b: a == b
        )
        assert out == 2


class TestKmeansDriverRoute:
    def test_driver_and_distributed_paths_agree(self, ray_session, monkeypatch):
        import ray.data as rd
        import numpy as np
        from article_extraction_ray.stages import clustering as C

        rng = np.random.default_rng(5)
        vecs = np.vstack([rng.normal(c, 0.05, size=(40, 8)) for c in (0.0, 1.0, 2.0)])
        df = __import__("pandas").DataFrame(
            {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
        )
        ds = rd.from_pandas(df).repartition(4)
        cents_driver = C.kmeans_fit(ds, 3, iters=6, seed=17)
        monkeypatch.setattr(C, "_KMEANS_DRIVER_FLOATS", 0)  # force distributed
        cents_dist = C.kmeans_fit(rd.from_pandas(df).repartition(4), 3, iters=6, seed=17)
        assert np.allclose(np.sort(cents_driver, axis=0), np.sort(cents_dist, axis=0), atol=1e-9)


class TestPCA:
    def _ds(self, n=200, d=16, seed=11):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        rng = np.random.default_rng(seed)
        # anisotropic cloud so the top components are well separated
        scales = np.linspace(5.0, 0.1, d)
        X = rng.normal(size=(n, d)) * scales
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X)})
        return rd.from_pandas(df).repartition(5), X

    def test_matches_numpy_pca(self, ray_session):
        import numpy as np
        from article_extraction_ray.stages.clustering import pca_fit, pca_project

        ds, X = self._ds()
        mean, comps = pca_fit(ds, n_components=3)
        assert np.allclose(mean, X.mean(axis=0), atol=1e-9)

        # exact numpy reference: eigh of the population covariance
        Xc = X - X.mean(axis=0)
        cov = Xc.T @ Xc / len(X)
        vals, vecs = np.linalg.eigh(cov)
        ref = vecs[:, ::-1][:, :3].T
        for i in range(3):
            j = int(np.argmax(np.abs(ref[i])))
            if ref[i, j] < 0:
                ref[i] = -ref[i]
        assert np.allclose(comps, ref, atol=1e-8)

        out = pca_project(ds, n_components=3).to_pandas().sort_values("vec_id")
        proj = out[["pc1", "pc2", "pc3"]].to_numpy()
        assert np.allclose(proj, Xc @ ref.T, atol=1e-7)

    def test_deterministic_across_block_orders(self, ray_session):
        import numpy as np
        from article_extraction_ray.stages.clustering import pca_fit

        ds, _ = self._ds(seed=23)
        m1, c1 = pca_fit(ds, n_components=2)
        ds2, _ = self._ds(seed=23)
        m2, c2 = pca_fit(ds2.repartition(9), n_components=2)
        assert np.allclose(m1, m2, atol=1e-9)
        assert np.allclose(c1, c2, atol=1e-9)
