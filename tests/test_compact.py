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
import pytest


class TestSnapshotLog:
    def test_commit_read_replace_expire(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from article_extraction_ray.state.snapshots import (
            commit_snapshot,
            expire_versions,
            latest_version,
            read_snapshot,
            snapshot_files,
            versions,
        )

        d = tmp_path / "tbl"
        (d / "data").mkdir(parents=True)
        pq.write_table(pa.table({"x": [1, 2, 3]}), d / "data" / "f1.parquet")
        v0 = commit_snapshot(d, ["data/f1.parquet"], op="append")
        assert v0 == 0
        pq.write_table(pa.table({"x": [4, 5]}), d / "data" / "f2.parquet")
        v1 = commit_snapshot(d, ["data/f1.parquet", "data/f2.parquet"], op="append")
        # replacement rewrite
        pq.write_table(pa.table({"x": [1, 2, 3, 4, 5]}), d / "data" / "c1.parquet")
        v2 = commit_snapshot(d, ["data/c1.parquet"], op="compact")
        assert versions(d) == [0, 1, 2] and latest_version(d) == 2

        # logical table identical across v1 and v2; v0 still readable
        assert sorted(r["x"] for r in read_snapshot(d, 0).take_all()) == [1, 2, 3]
        assert sorted(r["x"] for r in read_snapshot(d, 1).take_all()) == [1, 2, 3, 4, 5]
        assert sorted(r["x"] for r in read_snapshot(d, 2).take_all()) == [1, 2, 3, 4, 5]
        assert snapshot_files(d, 2) != snapshot_files(d, 1)

        # retention: keep only latest; old files gone, latest intact
        out = expire_versions(d, keep_latest=1)
        assert out["versions_dropped"] == [0, 1]
        assert set(out["files_deleted"]) == {"data/f1.parquet", "data/f2.parquet"}
        assert sorted(r["x"] for r in read_snapshot(d).take_all()) == [1, 2, 3, 4, 5]
        with pytest.raises(FileNotFoundError):
            read_snapshot(d, 0)

    def test_commit_refuses_missing_file(self, tmp_path):
        import pytest as _pytest

        from article_extraction_ray.state.snapshots import commit_snapshot

        with _pytest.raises(FileNotFoundError):
            commit_snapshot(tmp_path, ["nope.parquet"], op="append")

    def test_racing_commits_never_lose_a_version(self, tmp_path):
        """Optimistic-concurrency commit (ADVICE r3): two committers
        racing for the same version number must serialize into distinct
        versions — no silent manifest overwrite.  os.link's EEXIST is
        the arbiter; losers retry at N+1."""
        import json
        import threading

        from article_extraction_ray.state.snapshots import (
            commit_snapshot,
            read_manifest,
            versions,
        )

        d = tmp_path / "tbl"
        d.mkdir()
        n_threads, n_commits = 4, 8
        results: list[list[int]] = [[] for _ in range(n_threads)]
        barrier = threading.Barrier(n_threads)

        def committer(tid: int) -> None:
            barrier.wait()
            for i in range(n_commits):
                fname = f"t{tid}_{i}.parquet"
                (d / fname).write_bytes(b"")
                results[tid].append(commit_snapshot(d, [fname], op=f"t{tid}"))

        threads = [threading.Thread(target=committer, args=(t,)) for t in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        got = sorted(v for r in results for v in r)
        assert got == list(range(n_threads * n_commits))  # every commit kept
        # every manifest is intact valid JSON claiming its own version
        for v in versions(d):
            man = read_manifest(d, v)
            assert man["version"] == v and len(man["files"]) == 1
        # each version's file tag matches exactly one committer's op
        ops = {read_manifest(d, v)["op"] for v in versions(d)}
        assert ops == {f"t{t}" for t in range(n_threads)}
