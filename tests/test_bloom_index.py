"""Per-file Bloom index: pruning payoff, no-false-negative recall, and
the point-lookup query vs its SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestBloomIndex:
    def _write(self, ray_session, tmp_path, n=5000, files=16):
        import ray.data as rd

        from article_extraction_ray.state.bloom_index import write_bloom_indexed

        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": np.where(np.arange(n) % 3 == 0, "en", "de"),
            }
        )
        out = write_bloom_indexed(
            rd.from_pandas(df).repartition(8), tmp_path / "tbl", "doc_id", num_files=files
        )
        assert out["files"] == files and out["rows"] == n
        return df

    def test_lookup_exact_and_pruned(self, ray_session, tmp_path):
        from article_extraction_ray.state.bloom_index import (
            candidate_files,
            point_lookup,
        )

        df = self._write(ray_session, tmp_path)
        keys = np.array([3, 999, 4321], dtype=np.int64)
        got = point_lookup(tmp_path / "tbl", "doc_id", keys).to_pandas()
        want = df[df["doc_id"].isin(keys)]
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        assert got.sort_values("doc_id")["lang"].tolist() == want.sort_values("doc_id")["lang"].tolist()
        # payoff: a 3-key probe must not read all 16 files (each key
        # lives in 1 file; fp rate 1% ⇒ expected ≈3 candidates)
        assert len(candidate_files(tmp_path / "tbl", keys)) < 16

    def test_no_false_negatives_every_key_found(self, ray_session, tmp_path):
        from article_extraction_ray.state.bloom_index import point_lookup

        df = self._write(ray_session, tmp_path, n=2000)
        rng = np.random.default_rng(5)
        keys = rng.choice(2000, size=200, replace=False).astype(np.int64)
        got = point_lookup(tmp_path / "tbl", "doc_id", keys).to_pandas()
        assert sorted(got["doc_id"]) == sorted(keys)  # Bloom cannot miss

    def test_absent_keys_return_empty(self, ray_session, tmp_path):
        from article_extraction_ray.state.bloom_index import point_lookup

        self._write(ray_session, tmp_path, n=500)
        got = point_lookup(
            tmp_path / "tbl", "doc_id", np.array([-1, 10**9], dtype=np.int64)
        )
        assert got.num_rows == 0

    def test_query_matches_oracle(self, ray_session):
        import duckdb

        from article_extraction_ray.pipelines.queries import (
            SQL_BLOOM_POINT_LOOKUP,
            q_bloom_point_lookup,
        )

        sf = "/root/testdata/sf0.001"
        got = q_bloom_point_lookup(sf).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
        )
        want = con.execute(SQL_BLOOM_POINT_LOOKUP).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
        )
        assert len(got) == 3  # the two absent probes return nothing

    def test_concurrent_cache_builders_converge(self, ray_session, tmp_path, monkeypatch):
        """Two threads racing to build the per-scale index must both
        return correct rows — the atomic mkdtemp+rename publish means
        the loser adopts the winner's complete artifact, never a
        half-written one."""
        import shutil
        import tempfile
        import threading

        from article_extraction_ray.pipelines.queries import q_bloom_point_lookup

        sf = "/root/testdata/sf0.001"
        cache = tempfile.gettempdir() + "/ae_bloomidx_sf0.001"
        shutil.rmtree(cache, ignore_errors=True)

        results, errors = {}, {}

        def run(tid):
            try:
                results[tid] = q_bloom_point_lookup(sf)
            except Exception as exc:  # pragma: no cover - the assertion target
                errors[tid] = exc

        threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(results) == 2
        a, b = results[0].reset_index(drop=True), results[1].reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 3 and sorted(a["doc_id"]) == [1, 7, 123]
