"""Checkpoint/resume semantics of the lineage writer (reference J2 pattern:
anti-join on already-done work, /root/reference/tables/paper_text_table.py:108-110)."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from article_extraction_ray.pipelines.flagship import run_flagship
from article_extraction_ray.sources.synth import ensure_corpus_parquet
from article_extraction_ray.state.lineage import (
    clean_incomplete,
    done_partitions,
    partition_ids,
)

N_DOCS = 300
P = 8


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return ensure_corpus_parquet(root, N_DOCS, 42)


def _read_all(out_dir):
    import pyarrow.dataset as pads

    return pads.dataset(out_dir, format="parquet", partitioning="hive").to_table()


def test_partition_ids_stable():
    a = partition_ids(["doc-1", "doc-2", "doc-1"], 16)
    assert a[0] == a[2]
    assert (a >= 0).all() and (a < 16).all()


def test_write_then_resume_noop(ray_session, corpus, tmp_path):
    out = tmp_path / "out"
    s1 = run_flagship(str(corpus), str(out), num_partitions=P)
    assert s1["partitions_written"] == P
    rows1 = s1["rows"]
    assert rows1 > 0

    s2 = run_flagship(str(corpus), str(out), num_partitions=P)
    assert s2["partitions_written"] == 0
    assert s2["partitions_skipped"] == P
    assert _read_all(out).num_rows == rows1


def test_crash_recovery_no_duplicates(ray_session, corpus, tmp_path):
    out = tmp_path / "out"
    s1 = run_flagship(str(corpus), str(out), num_partitions=P)
    rows_full = s1["rows"]
    full = _read_all(out)
    ids_full = sorted(full["doc_id"].to_pylist())

    # simulate a crash: one partition's manifest missing + stale data dir
    victim = sorted(done_partitions(out))[0]
    (out / "_lineage" / f"part-{victim}.json").unlink()

    removed = clean_incomplete(out, P)
    assert removed == [victim]
    assert not (out / f"part_id={victim}").exists()

    s2 = run_flagship(str(corpus), str(out), num_partitions=P)
    assert s2["partitions_written"] == 1
    after = _read_all(out)
    assert after.num_rows == rows_full
    assert sorted(after["doc_id"].to_pylist()) == ids_full  # no dupes, no loss


def test_lineage_manifest_contents(ray_session, corpus, tmp_path):
    out = tmp_path / "out"
    run_flagship(str(corpus), str(out), num_partitions=P)
    manifests = sorted((out / "_lineage").glob("part-*.json"))
    assert len(manifests) == P
    m = json.loads(manifests[0].read_text())
    assert {"partition", "rows", "bytes", "wall_sec_job", "rows_per_sec_job"} <= set(m)
    # manifest row count equals the partition's parquet footprint
    pid = m["partition"]
    rows = sum(
        pq.ParquetFile(f).metadata.num_rows for f in (out / f"part_id={pid}").glob("*.parquet")
    )
    assert rows == m["rows"]
