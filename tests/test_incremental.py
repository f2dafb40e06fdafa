"""Incremental ingestion: delta-only extraction + snapshot publish.

The invariants under test are the ones a continuously-ingesting corpus
needs: (1) an increment extracts ONLY the new shards, (2) the latest
snapshot equals a from-scratch full extraction bit-for-bit, (3) the
call is idempotent when nothing is new, and (4) earlier versions stay
readable (time travel) after later increments."""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def sharded_corpus(ray_session, tmp_path_factory):
    """A 4-shard synthetic corpus, plus helpers to stage subsets."""
    from article_extraction_ray.sources.synth import ensure_corpus_parquet

    root = tmp_path_factory.mktemp("inc_corpus")
    full = ensure_corpus_parquet(str(root), 2000, 42)
    shards = sorted(f for f in Path(full).iterdir() if f.suffix == ".parquet")
    assert len(shards) >= 3, "need a multi-shard corpus for increments"
    return full, shards


def _stage(dst: Path, shards) -> str:
    dst.mkdir(parents=True, exist_ok=True)
    for s in shards:
        if not (dst / s.name).exists():
            shutil.copy(s, dst / s.name)
    return str(dst)


def _sorted_table(ds) -> pa.Table:
    import ray

    tabs = ray.get(ds.select_columns(["doc_id", "spans"]).sort("doc_id").to_arrow_refs())
    return pa.concat_tables([t for t in tabs if t.num_rows]).combine_chunks()


def test_incremental_matches_full_extraction(ray_session, sharded_corpus, tmp_path):
    import ray

    from article_extraction_ray.pipelines.incremental import ingest_increment
    from article_extraction_ray.pipelines.flagship import extract_corpus, CORPUS_COLUMNS
    from article_extraction_ray.sources.io import read_corpus
    from article_extraction_ray.state.snapshots import read_snapshot

    full, shards = sharded_corpus
    staged = tmp_path / "staged"
    table = tmp_path / "table"

    # increment 1: first two shards
    _stage(staged, shards[:2])
    s1 = ingest_increment(str(staged), table)
    assert s1["version"] == 0 and s1["new_shards"] == 2 and s1["rows"] > 0

    # idempotency: nothing new -> no new version
    s_idem = ingest_increment(str(staged), table)
    assert s_idem == {"version": 0, "new_shards": 0, "rows": 0}

    # increment 2: the remaining shards arrive
    _stage(staged, shards)
    s2 = ingest_increment(str(staged), table)
    assert s2["version"] == 1
    assert s2["new_shards"] == len(shards) - 2

    # the latest snapshot == a from-scratch full extraction, bit-for-bit
    snap = _sorted_table(read_snapshot(table))
    fullx = _sorted_table(
        extract_corpus(read_corpus(full, columns=CORPUS_COLUMNS), mode="hybrid")
    )
    assert len(snap) == len(fullx)
    assert snap.equals(fullx)

    # time travel: v0 still equals the two-shard extraction after v1
    v0 = _sorted_table(read_snapshot(table, 0))
    two = _sorted_table(
        extract_corpus(
            read_corpus([str(s) for s in shards[:2]], columns=CORPUS_COLUMNS),
            mode="hybrid",
        )
    )
    assert v0.equals(two)


def test_increment_reads_only_new_shards(ray_session, sharded_corpus, tmp_path):
    """The delta run's row count equals the delta shards' doc count
    after the drop rule — i.e. old shards were not re-extracted."""
    import pyarrow.parquet as pq

    from article_extraction_ray.pipelines.incremental import ingest_increment, ingested_inputs

    full, shards = sharded_corpus
    staged = tmp_path / "staged"
    table = tmp_path / "table"

    _stage(staged, shards[:1])
    ingest_increment(str(staged), table)
    _stage(staged, shards)
    s2 = ingest_increment(str(staged), table)

    delta_docs = sum(pq.ParquetFile(s).metadata.num_rows for s in shards[1:])
    assert s2["rows"] <= delta_docs  # drop rule can only shrink the delta
    assert s2["rows"] >= int(delta_docs * 0.8)  # ...but ~94% survive
    assert ingested_inputs(table) == {s.name for s in shards}
