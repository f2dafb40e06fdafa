"""Similarity search: brute-force exactness + LSH recall vs the baseline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from article_extraction_ray.stages.similarity import knn_brute_force, knn_lsh

N, D, K = 400, 32, 10


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(3)
    return rng.standard_normal((N, D))


@pytest.fixture(scope="module")
def corpus(ray_session, vectors):
    import ray.data as rd

    tbl = pa.table(
        {"vec_id": np.arange(N), "embedding": [list(map(float, v)) for v in vectors]}
    )
    return rd.from_arrow(tbl).repartition(4)


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors[:3], np.arange(3)


def _exact_topk(vectors, q, k):
    vn = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    sims = vn @ qn
    order = np.lexsort((np.arange(len(sims)), -sims))
    return list(order[:k])


def test_brute_force_matches_numpy(corpus, queries, vectors):
    qm, qids = queries
    out = knn_brute_force(corpus, qm, qids, k=K).to_pandas()
    for qi in qids:
        got = out[out.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert got == _exact_topk(vectors, qm[qi], K), f"query {qi}"


def test_lsh_recall(corpus, queries, vectors):
    qm, qids = queries
    out = knn_lsh(corpus, qm, qids, k=K, planes=8, probe_radius=2).to_pandas()
    recalls = []
    for qi in qids:
        got = set(out[out.query_id == qi]["vec_id"].tolist())
        truth = set(_exact_topk(vectors, qm[qi], K))
        recalls.append(len(got & truth) / K)
    assert np.mean(recalls) >= 0.5, f"mean LSH recall too low: {recalls}"


def test_lsh_self_hit(corpus, queries):
    qm, qids = queries
    out = knn_lsh(corpus, qm, qids, k=K, planes=8, probe_radius=1).to_pandas()
    for qi in qids:
        ranked = out[out.query_id == qi].sort_values("rank")
        assert ranked.iloc[0]["vec_id"] == qi  # the query itself is its own NN


def test_lsh_shuffle_recall_and_self_hit(ray_session, corpus, queries, vectors):
    """The bucketed-shuffle LSH path (big query sets, nothing broadcast)
    reaches the same recall as the broadcast-probe path."""
    import ray.data as rd

    from article_extraction_ray.stages.similarity import knn_lsh_shuffle

    qm, qids = queries
    qtbl = pa.table(
        {"query_id": qids, "embedding": [list(map(float, v)) for v in qm]}
    )
    out = knn_lsh_shuffle(
        corpus,
        rd.from_arrow(qtbl).repartition(2),
        k=K,
        planes=8,
        tables=8,
        probe_radius=2,
    ).to_pandas()
    recalls = []
    for qi in qids:
        ranked = out[out.query_id == qi].sort_values("rank")
        assert ranked.iloc[0]["vec_id"] == qi  # self-NN always collides
        got = set(ranked["vec_id"].tolist())
        truth = set(_exact_topk(vectors, qm[qi], K))
        recalls.append(len(got & truth) / K)
    assert np.mean(recalls) >= 0.5, f"mean shuffle-LSH recall too low: {recalls}"


def test_knn_graph_blocked_equals_broadcast(ray_session):
    """The no-driver-matrix blocked k-NN graph must reproduce the
    broadcast path's exact result (same deterministic tiebreak)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from article_extraction_ray.stages.similarity import (
        _normalize,
        knn_graph_blocked,
    )

    rng = np.random.default_rng(23)
    n, d, k = 200, 16, 3
    mat = rng.standard_normal((n, d))
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table(
        {"vec_id": ids, "embedding": pa.array([list(map(float, r)) for r in mat],
                                              type=pa.list_(pa.float32()))}
    )
    ds = rd.from_arrow(tab).repartition(7)
    got = (
        knn_graph_blocked(ds, k=k, n_blocks=3)
        .to_pandas()
        .sort_values(["src", "rank"])
        .reset_index(drop=True)
    )

    # brute-force reference with the same float32-storage precision
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                             for v in tab["embedding"].to_pylist()]))
    sims = m @ m.T
    rows = []
    for i in range(n):
        order = sorted(
            ((sims[i, j], j) for j in range(n) if j != i),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for r, (s, j) in enumerate(order, 1):
            rows.append((i, j, r))
    want = pd.DataFrame(rows, columns=["src", "dst", "rank"])
    pd.testing.assert_frame_equal(
        got.astype({"src": "int64", "dst": "int64", "rank": "int64"}), want
    )


# ---------------------------------------------------------------------------
# Product quantization (stages/pq.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def blob_vectors():
    # clustered data — the regime ANN indexes exist for
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 8, (6, D))
    return np.concatenate([centers[i] + rng.normal(0, 0.6, (80, D)) for i in range(6)])


@pytest.fixture(scope="module")
def blob_corpus(ray_session, blob_vectors):
    import ray.data as rd

    tbl = pa.table(
        {
            "vec_id": np.arange(len(blob_vectors)),
            "embedding": [list(map(float, v)) for v in blob_vectors],
        }
    )
    return rd.from_arrow(tbl).repartition(4)


class TestPQ:
    def test_codes_shape_and_dtype(self, blob_corpus):
        from article_extraction_ray.stages.pq import pq_encode, pq_fit

        books = pq_fit(blob_corpus, m=8, ksub=16, iters=4)
        assert books.shape == (8, 16, D // 8)
        enc = pq_encode(blob_corpus, books).to_pandas()
        assert len(enc) == 480
        codes = np.stack(enc["pq_code"].to_numpy())
        assert codes.shape == (480, 8) and codes.dtype == np.uint8
        assert codes.max() < 16

    def test_recall_vs_brute_force(self, blob_corpus, blob_vectors):
        from article_extraction_ray.stages.pq import knn_pq

        qm = blob_vectors[:4]
        qids = np.arange(4)
        # refine=8 → an 80-candidate shortlist per query, wide enough to
        # cover a whole 80-point blob whose members all tie under ADC;
        # the exact re-rank then recovers the true fine-grained order.
        out = knn_pq(blob_corpus, qm, qids, k=K, m=8, ksub=32, iters=6, refine=8).to_pandas()
        recalls = []
        for qi in qids:
            got = set(out[out.query_id == qi]["vec_id"].tolist())
            truth = set(_exact_topk(blob_vectors, qm[qi], K))
            recalls.append(len(got & truth) / K)
        assert np.mean(recalls) >= 0.9, f"mean PQ recall too low: {recalls}"
        # coarse shortlist alone (no re-rank) is strictly worse on tied,
        # quantized scores — the refine stage is what buys the recall
        raw = knn_pq(blob_corpus, qm, qids, k=K, m=8, ksub=32, iters=6, refine=0).to_pandas()
        raw_recalls = [
            len(set(raw[raw.query_id == qi]["vec_id"]) & set(_exact_topk(blob_vectors, qm[qi], K))) / K
            for qi in qids
        ]
        assert np.mean(recalls) >= np.mean(raw_recalls)

    def test_deterministic_across_layouts(self, ray_session, blob_vectors):
        import ray.data as rd

        from article_extraction_ray.stages.pq import knn_pq, pq_fit

        tbl = pa.table(
            {
                "vec_id": np.arange(len(blob_vectors)),
                "embedding": [list(map(float, v)) for v in blob_vectors],
            }
        )
        a_ds = rd.from_arrow(tbl).repartition(2)
        b_ds = rd.from_arrow(tbl).repartition(8)
        books_a = pq_fit(a_ds, m=4, ksub=16, iters=3)
        books_b = pq_fit(b_ds, m=4, ksub=16, iters=3)
        np.testing.assert_allclose(books_a, books_b, atol=1e-9)
        qm, qids = blob_vectors[:2], np.arange(2)
        out_a = (
            knn_pq(a_ds, qm, qids, k=5, codebooks=books_a)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        out_b = (
            knn_pq(b_ds, qm, qids, k=5, codebooks=books_b)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert out_a["vec_id"].tolist() == out_b["vec_id"].tolist()

    def test_prefit_codebooks_reused(self, blob_corpus, blob_vectors):
        from article_extraction_ray.stages.pq import knn_pq, pq_fit

        books = pq_fit(blob_corpus, m=8, ksub=16, iters=3)
        qm, qids = blob_vectors[:2], np.arange(2)
        out = knn_pq(blob_corpus, qm, qids, k=5, codebooks=books).to_pandas()
        assert set(out["query_id"]) == {0, 1}
        assert (out.groupby("query_id")["rank"].max() == 5).all()


class TestIVFPQ:
    def test_recall_vs_brute_force(self, blob_corpus, blob_vectors):
        from article_extraction_ray.stages.pq import knn_ivfpq

        qm = blob_vectors[:4]
        qids = np.arange(4)
        out = knn_ivfpq(
            blob_corpus, qm, qids, k=K, nlist=8, nprobe=3, m=8, ksub=32, refine=8
        ).to_pandas()
        recalls = []
        for qi in qids:
            got = set(out[out.query_id == qi]["vec_id"].tolist())
            truth = set(_exact_topk(blob_vectors, qm[qi], K))
            recalls.append(len(got & truth) / K)
        assert np.mean(recalls) >= 0.9, f"mean IVF-PQ recall too low: {recalls}"

    def test_prefit_index_reused(self, blob_corpus, blob_vectors):
        from article_extraction_ray.stages.clustering import kmeans_fit
        from article_extraction_ray.stages.pq import knn_ivfpq, pq_fit
        import pyarrow as pa
        import ray.data as rd

        # fit in normalized space exactly as knn_ivfpq does internally
        vn = blob_vectors / np.linalg.norm(blob_vectors, axis=1, keepdims=True)
        nds = rd.from_arrow(
            pa.table(
                {"vec_id": np.arange(len(vn)), "embedding": [list(map(float, v)) for v in vn]}
            )
        ).repartition(4)
        coarse = kmeans_fit(nds, 8, iters=4, cache=False)
        books = pq_fit(nds, m=8, ksub=16, iters=3, coarse=coarse)
        qm, qids = blob_vectors[:2], np.arange(2)
        out = knn_ivfpq(
            blob_corpus, qm, qids, k=5, nprobe=3, index=(coarse, books)
        ).to_pandas()
        assert set(out["query_id"]) == {0, 1}
        assert (out.groupby("query_id")["rank"].max() == 5).all()


class TestPQIndexPersistence:
    def test_save_load_roundtrip_and_search(self, blob_corpus, blob_vectors, tmp_path):
        from article_extraction_ray.stages.clustering import kmeans_fit
        from article_extraction_ray.stages.pq import (
            knn_ivfpq,
            load_pq_index,
            pq_fit,
            save_pq_index,
        )
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        vn = blob_vectors / np.linalg.norm(blob_vectors, axis=1, keepdims=True)
        nds = rd.from_arrow(
            pa.table(
                {"vec_id": np.arange(len(vn)), "embedding": [list(map(float, v)) for v in vn]}
            )
        ).repartition(4)
        coarse = kmeans_fit(nds, 8, iters=3, cache=False)
        books = pq_fit(nds, m=8, ksub=16, iters=3, coarse=coarse)
        p = tmp_path / "pq_index.parquet"
        save_pq_index(str(p), books, coarse)
        books2, coarse2 = load_pq_index(str(p))
        np.testing.assert_allclose(books2, books)
        np.testing.assert_allclose(coarse2, coarse)

        qm, qids = blob_vectors[:2], np.arange(2)
        a = knn_ivfpq(blob_corpus, qm, qids, k=5, nprobe=3, index=(coarse, books)).to_pandas()
        b = knn_ivfpq(blob_corpus, qm, qids, k=5, nprobe=3, index=(coarse2, books2)).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values(["query_id", "rank"]).reset_index(drop=True),
            b.sort_values(["query_id", "rank"]).reset_index(drop=True),
        )

    def test_pq_only_index(self, tmp_path):
        from article_extraction_ray.stages.pq import load_pq_index, save_pq_index

        rng = np.random.default_rng(2)
        books = rng.standard_normal((4, 8, 4))
        p = tmp_path / "pq.parquet"
        save_pq_index(str(p), books)
        books2, coarse2 = load_pq_index(str(p))
        np.testing.assert_allclose(books2, books)
        assert coarse2 is None


class TestScalarQuantization:
    def test_roundtrip_error_bounded_and_ranking_preserved(self, blob_corpus, blob_vectors):
        from article_extraction_ray.stages.pq import sq_decode_matrix, sq_encode, sq_fit

        lo, hi = sq_fit(blob_corpus)
        assert lo.shape == (D,) and (hi >= lo).all()
        enc = sq_encode(blob_corpus, lo, hi).to_pandas()
        codes = np.stack(enc["sq_code"].to_numpy())
        assert codes.dtype == np.uint8 and codes.shape == (len(blob_vectors), D)
        order = np.argsort(enc["vec_id"].to_numpy())
        rec = sq_decode_matrix(codes[order], lo, hi)
        # per-dim quantization error ≤ half a cell
        cell = (hi - lo) / 255.0
        assert (np.abs(rec - blob_vectors) <= cell / 2 + 1e-9).all()
        # cosine top-10 of a query against reconstructions ≈ exact top-10
        q = blob_vectors[0]
        exact = set(_exact_topk(blob_vectors, q, K))
        rn = rec / np.linalg.norm(rec, axis=1, keepdims=True)
        sims = rn @ (q / np.linalg.norm(q))
        approx = set(np.argsort(-sims)[:K].tolist())
        assert len(exact & approx) / K >= 0.8


class TestPQCodeTable:
    def test_search_from_codes_matches_inline(self, blob_corpus, blob_vectors, tmp_path):
        from article_extraction_ray.stages.pq import (
            knn_pq,
            knn_pq_from_codes,
            pq_fit,
            write_pq_codes,
        )

        books = pq_fit(blob_corpus, m=8, ksub=16, iters=3)
        codes_dir = str(tmp_path / "codes")
        write_pq_codes(blob_corpus, codes_dir, books)
        qm, qids = blob_vectors[:2], np.arange(2)
        from_codes = (
            knn_pq_from_codes(codes_dir, books, qm, qids, k=5)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        inline = (
            knn_pq(blob_corpus, qm, qids, k=5, codebooks=books, refine=0)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert from_codes["vec_id"].tolist() == inline["vec_id"].tolist()

    def test_incremental_append_without_refit(self, blob_corpus, blob_vectors, tmp_path, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from article_extraction_ray.stages.pq import (
            knn_pq_from_codes,
            pq_fit,
            write_pq_codes,
        )

        books = pq_fit(blob_corpus, m=8, ksub=16, iters=3)
        codes_dir = str(tmp_path / "codes")
        write_pq_codes(blob_corpus, codes_dir, books)
        # a later shard appends with the SAME codebooks — vectors along a
        # direction absent from the original corpus (querying it must
        # surface the APPENDED ids, proving both file sets are scanned)
        rng = np.random.default_rng(99)
        novel = rng.normal(0, 8, D)
        extra = novel + rng.normal(0, 0.1, (3, D))
        shard = rd.from_arrow(
            pa.table(
                {
                    "vec_id": np.arange(10_000, 10_003),
                    "embedding": [list(map(float, v)) for v in extra],
                }
            )
        )
        write_pq_codes(shard, codes_dir, books)
        out = knn_pq_from_codes(codes_dir, books, novel[None, :], np.array([0]), k=3).to_pandas()
        got = set(out["vec_id"].tolist())
        assert got == {10_000, 10_001, 10_002}, got


def test_knn_graph_lsh_recall_and_shape(ray_session):
    """The sublinear tier of the q_knn_graph router: the LSH self-join
    graph must (a) never emit self edges, (b) emit dense ranks 1..k per
    src, and (c) reach bounded recall vs the exact graph on clustered
    data (the regime LSH exists for)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from article_extraction_ray.stages.similarity import (
        _normalize,
        knn_graph_lsh,
    )

    rng = np.random.default_rng(9)
    n_clusters, per, d, k = 12, 25, 16, 3
    centers = rng.standard_normal((n_clusters, d)) * 4
    mat = np.concatenate(
        [centers[c] + 0.3 * rng.standard_normal((per, d)) for c in range(n_clusters)]
    )
    n = len(mat)
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(5)

    got = (
        knn_graph_lsh(ds, k=k, planes=8, tables=8, probe_radius=1)
        .to_pandas()
        .sort_values(["src", "rank"])
        .reset_index(drop=True)
    )

    assert (got["src"] != got["dst"]).all(), "self edges must be dropped"
    per_src = got.groupby("src")["rank"].agg(["min", "max", "count"])
    assert (per_src["min"] == 1).all() and (per_src["count"] <= k).all()
    # dense ranks: max == count for every src
    assert (per_src["max"] == per_src["count"]).all()

    # exact reference (same float32 storage precision)
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in tab["embedding"].to_pylist()])
    )
    sims = m @ m.T
    recalls = []
    for i in range(n):
        order = sorted(((-sims[i, j], j) for j in range(n) if j != i))
        truth = {j for _, j in order[:k]}
        approx = set(got.loc[got["src"] == i, "dst"].tolist())
        recalls.append(len(approx & truth) / k)
    assert np.mean(recalls) >= 0.7, f"mean LSH-graph recall too low: {np.mean(recalls)}"
