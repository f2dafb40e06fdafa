"""Dedup operator semantics: minhash accuracy, LSH recall on constructed
near-dupes, simhash hamming properties, exact jaccard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from article_extraction_ray.stages.dedup import (
    embedding_dup_pairs,
    estimated_jaccard,
    exact_jaccard,
    hamming64,
    minhash_dup_pairs,
    minhash_signature,
    simhash64,
    simhash_dup_pairs,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls on the "
    "green hills and the river flows quietly through the old stone bridge"
)
NEAR = BASE.replace("quietly", "swiftly")  # one token differs
FAR = "completely different content about training large models on many accelerators in data centers"


class TestMinHashCore:
    def test_shingles(self):
        assert word_shingles("a b c d", 3) == ["a b c", "b c d"]
        assert word_shingles("a b", 3) == ["a b"]
        assert word_shingles("", 3) == []

    def test_signature_deterministic(self):
        s1 = minhash_signature(BASE)
        s2 = minhash_signature(BASE)
        assert (s1 == s2).all()
        assert len(s1) == 64

    def test_estimate_tracks_exact(self):
        est = estimated_jaccard(minhash_signature(BASE), minhash_signature(NEAR))
        exact = exact_jaccard(BASE, NEAR)
        assert abs(est - exact) < 0.25
        assert exact > 0.6

    def test_unrelated_low(self):
        est = estimated_jaccard(minhash_signature(BASE), minhash_signature(FAR))
        assert est < 0.2

    def test_exact_jaccard_bounds(self):
        assert exact_jaccard(BASE, BASE) == 1.0
        assert exact_jaccard("", "") == 1.0
        assert 0.0 <= exact_jaccard(BASE, FAR) <= 0.1


@pytest.fixture(scope="module")
def dup_corpus(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": NEAR},
        {"doc_id": 3, "text": FAR},
        {"doc_id": 4, "text": BASE},  # exact dup of 1
        {"doc_id": 5, "text": "tiny"},
    ]
    return rd.from_items(rows)


class TestMinHashLSH:
    def test_finds_near_and_exact_dupes(self, dup_corpus):
        pairs = minhash_dup_pairs(dup_corpus, threshold=0.5)
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        assert (1, 4) in got  # exact dup
        assert (1, 2) in got  # near dup
        assert (2, 4) in got
        assert not any(3 in p or 5 in p for p in got)

    def test_verified_jaccard_values(self, dup_corpus):
        pairs = minhash_dup_pairs(dup_corpus, threshold=0.5)
        exact_row = pairs[(pairs.id_a == 1) & (pairs.id_b == 4)]
        assert exact_row["exact_jaccard"].iloc[0] == 1.0
        assert (exact_row["n_bands"].iloc[0]) == 16  # all bands collide
        near_row = pairs[(pairs.id_a == 1) & (pairs.id_b == 2)]
        assert 0.5 <= near_row["exact_jaccard"].iloc[0] < 1.0


class TestSimHash:
    def test_deterministic_and_near(self):
        assert simhash64(BASE) == simhash64(BASE)
        d_near = hamming64(simhash64(BASE), simhash64(NEAR))
        d_far = hamming64(simhash64(BASE), simhash64(FAR))
        assert d_near < d_far
        assert d_near <= 6

    def test_pairs_pipeline(self, dup_corpus):
        pairs = simhash_dup_pairs(dup_corpus, max_hamming=6).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        assert (1, 4) in got
        hamming_14 = pairs[(pairs.id_a == 1) & (pairs.id_b == 4)]["hamming"].iloc[0]
        assert hamming_14 == 0


class TestEmbeddingDup:
    def test_threshold_pairs(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(0)
        base = rng.standard_normal((20, 16))
        base[7] = base[3] + 0.01 * rng.standard_normal(16)  # near-dup pair (3,7)
        ids = np.arange(20)
        ds = rd.from_arrow(
            pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in base]})
        )
        pairs = embedding_dup_pairs(ds, base, ids, threshold=0.99).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
        assert got == {(3, 7)}


class TestEmbeddingScalePaths:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        base = rng.standard_normal((60, 16))
        # plant near-dup clusters
        base[11] = base[2] + 0.01 * rng.standard_normal(16)
        base[37] = base[20] + 0.005 * rng.standard_normal(16)
        ids = np.arange(60)
        ds = rd.from_arrow(
            pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in base]})
        )
        return ds, base, ids

    def test_blocked_matches_broadcast_exact(self, emb_ds):
        from article_extraction_ray.stages.dedup import embedding_dup_pairs_blocked

        ds, base, ids = emb_ds
        blocked = embedding_dup_pairs_blocked(ds, threshold=0.9, n_blocks=4).to_pandas()
        broadcast = embedding_dup_pairs(ds, base, ids, threshold=0.9).to_pandas()
        key = lambda df: {tuple(sorted((a, b))) for a, b in zip(df["id_a"], df["id_b"])}
        assert key(blocked) == key(broadcast) == {(2, 11), (20, 37)}
        # cosine values agree with the broadcast kernel
        bl = blocked.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        br = broadcast.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert np.allclose(bl["cos_sim"], br["cos_sim"], atol=1e-12)

    def test_lsh_recall_on_planted_dupes(self, emb_ds):
        from article_extraction_ray.stages.dedup import embedding_dup_pairs_lsh

        ds, _, _ = emb_ds
        got = embedding_dup_pairs_lsh(ds, threshold=0.9, planes=8, tables=12)
        pairs = {tuple(sorted((a, b))) for a, b in zip(got["id_a"], got["id_b"])}
        # planted near-identical pairs collide in ≥1 of 12 tables w.h.p.
        assert {(2, 11), (20, 37)} <= pairs
        # verify step is exact: no pair below threshold survives
        assert (got["cos_sim"] >= 0.9).all()


class TestIncrementalMinhash:
    """Persisted index: a new snapshot dedupes against history without
    touching historical text."""

    def _corpora(self):
        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(200)]
        hist_texts = [" ".join(rng.choice(vocab, 60)) for _ in range(80)]
        # new snapshot: 10 near-copies of history docs (one word changed)
        # + 40 fresh docs; id spaces disjoint
        near = []
        for i in range(10):
            toks = hist_texts[i].split()
            toks[5] = "CHANGED"
            near.append(" ".join(toks))
        fresh = [" ".join(rng.choice(vocab, 60)) for _ in range(40)]
        hist = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": hist_texts})
        new = pd.DataFrame(
            {"doc_id": np.arange(1000, 1050, dtype=np.int64), "text": near + fresh}
        )
        return hist, new

    def test_planted_cross_snapshot_dups_found(self, ray_session, tmp_path):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import (
            minhash_dedup_incremental,
            write_minhash_index,
        )

        hist, new = self._corpora()
        idx = str(tmp_path / "mh_index")
        write_minhash_index(rd.from_pandas(hist).repartition(4), idx)
        out = minhash_dedup_incremental(
            rd.from_pandas(new).repartition(3), idx, threshold=0.5
        )
        got = set(zip(out["id_new"], out["id_old"]))
        assert {(1000 + i, i) for i in range(10)} <= got
        # fresh docs never collide with history
        assert not (out["id_new"] >= 1010).any()
        # estimated jaccard of a 1-token edit is high
        assert (out["est_jaccard"] >= 0.5).all()

    def test_empty_when_no_overlap(self, ray_session, tmp_path):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import (
            minhash_dedup_incremental,
            write_minhash_index,
        )

        hist, new = self._corpora()
        idx = str(tmp_path / "mh_index2")
        write_minhash_index(rd.from_pandas(hist).repartition(2), idx)
        out = minhash_dedup_incremental(
            rd.from_pandas(new.iloc[20:]).repartition(2), idx, threshold=0.5
        )
        assert out.empty
        assert list(out.columns) == ["id_new", "id_old", "n_bands", "est_jaccard"]


class TestSsjoinExact:
    """Exact prefix-filtered set-similarity self-join vs brute force."""

    def _corpus(self, n_docs=60, seed=3):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(80)]
        texts = []
        for _ in range(n_docs):
            texts.append(" ".join(rng.choice(vocab, size=30)))
        # planted near-dups: single-token edits of the first 8 docs
        for i in range(8):
            toks = texts[i].split()
            toks[rng.integers(0, len(toks))] = "XX"
            texts.append(" ".join(toks))
        # planted exact dup + short docs
        texts.append(texts[0])
        texts.extend(["tiny doc", "tiny doc", "solo"])
        return pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )

    def _brute(self, df, threshold, n=3):
        from article_extraction_ray.stages.dedup import exact_jaccard

        out = set()
        rows = list(zip(df["doc_id"], df["text"]))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if not rows[i][1] or not rows[j][1]:
                    continue
                if exact_jaccard(rows[i][1], rows[j][1], n) >= threshold:
                    out.add((int(rows[i][0]), int(rows[j][0])))
        return out

    @pytest.mark.parametrize("threshold", [0.5, 0.8, 0.95])
    def test_matches_brute_force(self, ray_session, threshold):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import ssjoin_exact

        df = self._corpus()
        got = ssjoin_exact(rd.from_pandas(df).repartition(4), threshold=threshold)
        assert set(zip(got["id_a"].astype(int), got["id_b"].astype(int))) == \
            self._brute(df, threshold)
        assert (got["jaccard"] >= threshold).all()

    def test_exact_dup_pair_has_jaccard_one(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import ssjoin_exact

        df = self._corpus()
        got = ssjoin_exact(rd.from_pandas(df).repartition(2), threshold=0.99)
        exact_pairs = set(zip(got["id_a"].astype(int), got["id_b"].astype(int)))
        assert (0, len(df) - 4) in exact_pairs  # texts[0] repeated
        assert (got[got["jaccard"] < 1.0].empty or (got["jaccard"] >= 0.99).all())

    def test_empty_and_no_pairs(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import ssjoin_exact

        df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma", "delta eps zeta"]})
        got = ssjoin_exact(rd.from_pandas(df), threshold=0.5)
        assert got.empty
        assert list(got.columns) == ["id_a", "id_b", "jaccard"]


class TestDatasetPairRoute:
    """The Dataset-native pair path (dedup.py scale route): forced-route
    parity on an adversarial high-dup corpus, and the exact-dedupe
    pre-pass turning identical-doc groups from O(g²) pairs into O(g)
    edges with an IDENTICAL survivor set."""

    @staticmethod
    def _adversarial_corpus():
        """60% dup rate: 40 base texts, each with one exact copy and one
        near-dup mutant (last two words dropped) — the CommonCrawl shape
        where the pair list is corpus-order."""
        rng = np.random.default_rng(11)
        vocab = [f"tok{i}" for i in range(300)]
        rows = []
        for i in range(40):
            text = " ".join(rng.choice(vocab, size=40))
            rows.append({"doc_id": i, "text": text})
            rows.append({"doc_id": 1000 + i, "text": text})  # exact copy
            rows.append({"doc_id": 2000 + i, "text": " ".join(text.split()[:-2])})
        return pd.DataFrame(rows)

    @staticmethod
    def _survivors(edges_ds, all_ids):
        from article_extraction_ray.stages.graph import connected_components

        comp = connected_components(edges_ds).to_pandas()
        losers = set(comp.loc[comp["node"] != comp["component"], "node"].astype(int))
        return set(all_ids) - losers

    def test_forced_route_parity(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import (
            minhash_dup_pairs,
            minhash_dup_pairs_routed,
            near_dedup_edges,
        )

        df = self._adversarial_corpus()
        ds = rd.from_pandas(df).repartition(4)

        # 1) pair-level parity: dataset route == driver route, exactly
        route_a, pd_pairs = minhash_dup_pairs_routed(ds, threshold=0.5, force_route="driver")
        route_b, ds_pairs = minhash_dup_pairs_routed(ds, threshold=0.5, force_route="dataset")
        assert (route_a, route_b) == ("driver", "dataset")
        got = ds_pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        want = pd_pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["id_a", "id_b", "n_bands"]].astype(np.int64),
            want[["id_a", "id_b", "n_bands"]].astype(np.int64),
        )
        np.testing.assert_allclose(got["exact_jaccard"], want["exact_jaccard"])

        # 2) survivor-level parity: pre-pass + either route == plain LSH
        all_ids = df["doc_id"].astype(int).tolist()
        plain = minhash_dup_pairs(ds, threshold=0.5)
        plain_edges = rd.from_pandas(
            plain[["id_a", "id_b"]].rename(columns={"id_a": "src", "id_b": "dst"})
        )
        want_surv = self._survivors(plain_edges, all_ids)
        for force in ("driver", "dataset"):
            edges = near_dedup_edges(ds, threshold=0.5, force_route=force)
            assert self._survivors(edges, all_ids) == want_surv
        # tiny budget forces the auto router onto the dataset path
        edges_auto = near_dedup_edges(ds, threshold=0.5, pair_budget=3)
        assert self._survivors(edges_auto, all_ids) == want_surv

    def test_identical_doc_groups_are_linear(self, ray_session):
        """5k identical docs: the pre-pass emits g-1 rep edges instead of
        LSH's ~g²/2 pairs; survivors = {min id} plus the singletons."""
        import time

        import ray.data as rd
        from article_extraction_ray.stages.dedup import near_dedup_edges

        n = 5000
        rows = [{"doc_id": i, "text": "boiler plate legal footer repeated verbatim on every page"}
                for i in range(n)]
        rows += [{"doc_id": n + i, "text": f"unique document number {i} with distinct words w{i} x{i} y{i} z{i}"}
                 for i in range(20)]
        ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)
        t0 = time.monotonic()
        edges = near_dedup_edges(ds, threshold=0.5).materialize()
        elapsed = time.monotonic() - t0
        surv = self._survivors(edges, [r["doc_id"] for r in rows])
        assert surv == {0} | {n + i for i in range(20)}
        # O(g) edge count: g-1 exact edges (+ maybe a few LSH pairs among
        # the 21 representatives), nowhere near the ~12.5M all-pairs blowup
        assert edges.count() < n + 100
        assert elapsed < 60

    def test_exact_dup_assign(self, ray_session):
        import ray.data as rd
        from article_extraction_ray.stages.dedup import exact_dup_assign

        df = pd.DataFrame({
            "doc_id": [5, 3, 9, 1, 7],
            "text": ["aa", "bb", "aa", "bb", "cc"],
        })
        out = exact_dup_assign(rd.from_pandas(df).repartition(3)).to_pandas()
        got = dict(zip(out["doc_id"].astype(int), out["rep_id"].astype(int)))
        assert got == {5: 5, 9: 5, 3: 1, 1: 1, 7: 7}

    def test_dataset_route_no_dups_is_empty(self, ray_session):
        """A dup-free corpus through the Dataset route: the empty
        candidate set must short-circuit (an empty Dataset has no
        schema for the verify join) and every configuration must yield
        zero edges rather than crash."""
        import ray.data as rd
        from article_extraction_ray.stages.dedup import (
            minhash_dup_pairs_dataset,
            near_dedup_edges,
        )

        df = pd.DataFrame({
            "doc_id": range(6),
            "text": [f"completely distinct document number {i} alpha{i} beta{i} gamma{i} delta{i}"
                     for i in range(6)],
        })
        ds = rd.from_pandas(df).repartition(2)
        out = minhash_dup_pairs_dataset(ds, threshold=0.5)
        got = out.to_pandas()
        assert len(got) == 0
        # Ray's to_pandas may drop columns for a fully-empty dataset; the
        # schema contract is checked at the Dataset level instead
        schema = out.schema()
        if schema is not None and schema.names:
            assert schema.names == ["id_a", "id_b", "n_bands", "exact_jaccard"]
        for prepass in (True, False):
            edges = near_dedup_edges(
                ds, threshold=0.5, exact_prepass=prepass, force_route="dataset"
            )
            assert edges.count() == 0

    def test_keep_min_operator(self, ray_session):
        """The one-call removal operator: survivors = per-cluster min
        ids, payload columns untouched, identical on both routes and
        both loser-filter paths."""
        import ray.data as rd
        from article_extraction_ray.stages.dedup import near_dedup_keep_min

        df = self._adversarial_corpus()
        df["payload"] = df["doc_id"].astype(str) + "-extra"
        ds = rd.from_pandas(df).repartition(4)

        base = near_dedup_keep_min(ds, threshold=0.5).to_pandas()
        # every mutant/copy loses to its original (smaller id)
        assert (base["doc_id"] < 1000).all()
        # payload survives the filter untouched
        assert (base["payload"] == base["doc_id"].astype(str) + "-extra").all()
        want_ids = set(base["doc_id"].astype(int))
        for kwargs in (
            {"force_route": "dataset"},
            {"loser_budget": 0},            # force the shuffle anti-filter
            {"exact_prepass": False},
        ):
            got = near_dedup_keep_min(ds, threshold=0.5, **kwargs).to_pandas()
            assert set(got["doc_id"].astype(int)) == want_ids, kwargs
