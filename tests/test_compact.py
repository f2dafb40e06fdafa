"""Parquet compaction: row preservation, bin-pack determinism, atomicity."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_small_files(d, n_files=12, rows_per=200, seed=5):
    rng = np.random.default_rng(seed)
    all_rows = []
    for i in range(n_files):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(i * rows_per, (i + 1) * rows_per),
                "val": rng.standard_normal(rows_per),
            }
        )
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / f"part-{i:03d}.parquet")
        all_rows.append(df)
    return pd.concat(all_rows, ignore_index=True)


class TestPlanGroups:
    def test_deterministic_and_bounded(self):
        from article_extraction_ray.state.compact import plan_groups

        sizes = {"a": 40, "b": 60, "c": 25, "d": 25, "e": 100, "f": 10}
        g1 = plan_groups(sizes, 100)
        g2 = plan_groups(dict(reversed(list(sizes.items()))), 100)
        assert g1 == g2  # insertion order of the dict is irrelevant
        for g in g1:
            assert sum(sizes[n] for n in g) <= 100 or len(g) == 1
        assert sorted(n for g in g1 for n in g) == sorted(sizes)

    def test_oversized_file_passes_through(self):
        from article_extraction_ray.state.compact import plan_groups

        g = plan_groups({"big": 500, "s1": 10, "s2": 10}, 100)
        assert ["big"] in g


class TestCompactParquet:
    def test_rows_preserved_files_reduced(self, ray_session, tmp_path):
        from article_extraction_ray.state.compact import compact_parquet

        src = tmp_path / "src"
        dst = tmp_path / "dst"
        src.mkdir()
        want = _write_small_files(src)
        summary = compact_parquet(src, dst, target_bytes=64 * 1024)
        assert summary["files_in"] == 12
        assert summary["files_out"] < 12
        assert summary["rows"] == len(want)
        got = (
            pq.read_table(dst).to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want.sort_values("doc_id").reset_index(drop=True))
        assert not any(f.endswith(".tmp") for f in os.listdir(dst))

    def test_rerun_overwrites_not_duplicates(self, ray_session, tmp_path):
        from article_extraction_ray.state.compact import compact_parquet

        src = tmp_path / "src"
        dst = tmp_path / "dst"
        src.mkdir()
        want = _write_small_files(src, n_files=6)
        s1 = compact_parquet(src, dst, target_bytes=64 * 1024)
        s2 = compact_parquet(src, dst, target_bytes=64 * 1024)
        assert s1["files_out"] == s2["files_out"]
        assert len(pq.read_table(dst)) == len(want)
