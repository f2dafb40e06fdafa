"""Copy-on-write delete: footer-stat file pruning, atomic versioning,
time travel, and exact erasure."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def doc_table(ray_session, tmp_path):
    """A 4-file snapshot table over sf0.001 documents (contiguous
    doc_id ranges per file — repartition preserves read order)."""
    from article_extraction_ray.pipelines.tabular import read_table
    from article_extraction_ray.state.snapshots import commit_snapshot

    ds = read_table("/root/testdata/sf0.001", "documents", columns=["doc_id"])
    ds.repartition(4).write_parquet(str(tmp_path / "base"))
    files = sorted(
        os.path.join("base", f)
        for f in os.listdir(tmp_path / "base")
        if f.endswith(".parquet")
    )
    assert len(files) == 4
    commit_snapshot(tmp_path, files, op="append")
    return tmp_path


def test_delete_prunes_untouched_files(doc_table):
    """Targets confined to one file's doc_id range must rewrite exactly
    that file; the other three carry over by reference (same paths)."""
    from article_extraction_ray.state.deletes import delete_rows
    from article_extraction_ray.state.snapshots import read_manifest

    man0 = read_manifest(doc_table, 0)
    # pick targets inside the FIRST file's range only
    m = pq.ParquetFile(doc_table / man0["files"][0]).metadata
    lo = min(m.row_group(g).column(0).statistics.min for g in range(m.num_row_groups))
    targets = [lo, lo + 1]

    s = delete_rows(doc_table, "doc_id", targets)
    assert s["files_rewritten"] == 1
    assert s["files_carried"] == 3
    assert s["rows_deleted"] == 2

    man1 = read_manifest(doc_table, 1)
    carried = set(man0["files"]) & set(man1["files"])
    assert len(carried) == 3, "untouched files must carry over by reference"


def test_delete_is_exact_and_time_travels(doc_table, ray_session):
    from article_extraction_ray.state.deletes import delete_rows
    from article_extraction_ray.state.snapshots import read_snapshot

    before = read_snapshot(doc_table, 0)
    n0, sum0 = int(before.count()), int(before.sum("doc_id"))

    targets = list(range(0, 500, 7))
    s = delete_rows(doc_table, "doc_id", targets)
    assert s["version"] == 1

    after = read_snapshot(doc_table, 1)
    ids = sorted(r["doc_id"] for r in after.take_all())
    assert not any(i % 7 == 0 for i in ids if i in set(targets))
    assert set(ids).isdisjoint(targets)
    expected_deleted = sum(1 for i in range(n0) if i in set(targets))
    assert s["rows_deleted"] == expected_deleted
    assert len(ids) == n0 - expected_deleted
    assert sum(ids) == sum0 - sum(t for t in targets if t < n0)

    # time travel: v0 unchanged after the delete
    v0 = read_snapshot(doc_table, 0)
    assert int(v0.count()) == n0 and int(v0.sum("doc_id")) == sum0


def test_no_match_delete_commits_without_rewrite(doc_table):
    from article_extraction_ray.state.deletes import delete_rows

    s = delete_rows(doc_table, "doc_id", [10_000_000, 10_000_001])
    assert s == {
        "version": 1,
        "files_rewritten": 0,
        "files_carried": 4,
        "rows_deleted": 0,
    }
