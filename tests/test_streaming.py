"""Micro-batch streaming sessionization: batch-parity, watermark
finality, and crash-resume from the state checkpoint."""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _batch_sessions() -> pd.DataFrame:
    import __ray_entry__ as entry

    df = entry.queries()["sessionize"](SF).to_pandas()
    return df.sort_values(["user_id", "session_id"]).reset_index(drop=True)


def _assert_same(stream_df: pd.DataFrame, batch_df: pd.DataFrame):
    assert len(stream_df) == len(batch_df)
    for col in ["user_id", "session_id", "n_events", "sum_value", "t_start", "t_end"]:
        a = stream_df[col].reset_index(drop=True)
        b = batch_df[col].reset_index(drop=True)
        if str(a.dtype).startswith("datetime"):
            a = a.astype("datetime64[us]")
            b = b.astype("datetime64[us]")
        assert (a == b).all(), f"column {col} differs"


def test_stream_equals_batch(ray_session, tmp_path):
    from article_extraction_ray.pipelines.streaming import (
        read_emitted_sessions,
        run_sessionized_stream,
    )

    s = run_sessionized_stream(SF, tmp_path / "out", batch_hours=168)
    assert s["batches"] >= 3, "need several micro-batches for a meaningful test"
    assert s["resumed_from"] == 0
    _assert_same(read_emitted_sessions(tmp_path / "out"), _batch_sessions())


def test_stream_resume_mid_run(ray_session, tmp_path, monkeypatch):
    """Crash after batch k: a resumed run skips completed batches and
    the final output is still identical to the batch result."""
    import article_extraction_ray.pipelines.streaming as streaming

    # first run: process only the first 2 windows by truncating the
    # grid — emulated by a wrapper that raises after 2 checkpoints
    calls = {"n": 0}

    from article_extraction_ray.state import snapshots as snap_mod

    real_commit = snap_mod.commit_snapshot

    def crashing_commit(*args, **kwargs):
        v = real_commit(*args, **kwargs)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash after checkpoint 2")
        return v

    monkeypatch.setattr(snap_mod, "commit_snapshot", crashing_commit)
    # streaming.py imports commit_snapshot inside the function from the
    # module, so patch the module attribute it resolves at call time
    with pytest.raises(RuntimeError, match="injected crash"):
        streaming.run_sessionized_stream(SF, tmp_path / "out", batch_hours=168)
    monkeypatch.setattr(snap_mod, "commit_snapshot", real_commit)

    s2 = streaming.run_sessionized_stream(SF, tmp_path / "out", batch_hours=168)
    assert s2["resumed_from"] == 2, "resume must skip the 2 committed batches"
    _assert_same(
        streaming.read_emitted_sessions(tmp_path / "out"), _batch_sessions()
    )


def test_watermark_emissions_are_final(ray_session, tmp_path):
    """No session may be emitted twice across batches (exactly-once),
    and every emission is closed: its end precedes its batch's
    watermark or the end of stream."""
    from article_extraction_ray.pipelines.streaming import (
        read_emitted_sessions,
        run_sessionized_stream,
    )

    run_sessionized_stream(SF, tmp_path / "out", batch_hours=168)
    df = read_emitted_sessions(tmp_path / "out")
    dup = df.duplicated(subset=["user_id", "session_id"])
    assert not dup.any(), "a (user, session) pair was emitted twice"


@pytest.mark.parametrize("hours", [24, 720])
def test_stream_parity_across_window_sizes(ray_session, tmp_path, hours):
    """The batch-equality invariant must hold for ANY window size —
    30 one-day windows or a single giant window — or the watermark/
    carry logic has a boundary bug."""
    from article_extraction_ray.pipelines.streaming import (
        read_emitted_sessions,
        run_sessionized_stream,
    )

    run_sessionized_stream(SF, tmp_path / f"out{hours}", batch_hours=hours)
    _assert_same(read_emitted_sessions(tmp_path / f"out{hours}"), _batch_sessions())


def test_partitioned_reads_prune_and_match(ray_session, tmp_path):
    """The time-bucketed layout: each micro-batch must read ONLY its own
    window's shards (footer min/max pruning), and the emitted sessions
    must be byte-identical to the full-scan path."""
    from pathlib import Path

    from article_extraction_ray.pipelines.streaming import (
        ensure_time_partitioned,
        read_emitted_sessions,
        run_sessionized_stream,
        shards_for_window,
    )

    sf = "/root/testdata/sf0.001"
    full = run_sessionized_stream(sf, tmp_path / "full", batch_hours=168,
                                  partition_reads=False)
    part = run_sessionized_stream(sf, tmp_path / "part", batch_hours=168,
                                  partition_reads=True)
    assert part["shards_read"], "partitioned run must record pruned reads"
    assert part["sessions"] == full["sessions"]
    pd.testing.assert_frame_equal(
        read_emitted_sessions(tmp_path / "part"),
        read_emitted_sessions(tmp_path / "full"),
    )

    # budget=0 forces every window onto the distributed bucket-groupby
    # path; output must not move (same kernel, different execution)
    dist = run_sessionized_stream(sf, tmp_path / "dist", batch_hours=168,
                                  partition_reads=True, driver_window_budget=0)
    assert dist["sessions"] == full["sessions"]
    pd.testing.assert_frame_equal(
        read_emitted_sessions(tmp_path / "dist"),
        read_emitted_sessions(tmp_path / "full"),
    )

    # pruning is exact: batch k touches exactly the files of its wk dir
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf, "events.parquet")
    meta = pq.ParquetFile(path).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    ts_i = names.index("ts")
    lo = min(meta.row_group(g).column(ts_i).statistics.min
             for g in range(meta.num_row_groups))
    lo_us = int(pd.Timestamp(lo).value // 1_000)
    step_us = 168 * 3_600_000_000
    part_dir = ensure_time_partitioned(path, step_us=step_us, lo_us=lo_us)
    per_window = {
        int(d.name.split("=")[1]): sorted(str(f) for f in d.glob("*.parquet"))
        for d in Path(part_dir).iterdir() if d.is_dir() and d.name.startswith("wk=")
    }
    for k in range(part["batches"]):
        got = shards_for_window(part_dir, lo_us + k * step_us, lo_us + (k + 1) * step_us)
        assert sorted(got) == per_window.get(k, []), f"window {k} read wrong shards"
        assert part["shards_read"][k] == len(per_window.get(k, []))


def test_time_partition_publish_race(ray_session, tmp_path):
    """Two builders racing the same layout: one wins the atomic rename,
    the loser discards its stage; both callers must see one complete,
    identical layout (the shared atomic-publish discipline of every
    /tmp cache in this repo)."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from pathlib import Path

    import pyarrow.parquet as pq

    from article_extraction_ray.pipelines.streaming import ensure_time_partitioned

    src = "/root/testdata/sf0.001/events.parquet"
    meta = pq.ParquetFile(src).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    ts_i = names.index("ts")
    lo = min(meta.row_group(g).column(ts_i).statistics.min
             for g in range(meta.num_row_groups))
    lo_us = int(pd.Timestamp(lo).value // 1_000)
    step_us = 24 * 3_600_000_000  # daily grid → a cache key no other test uses
    cache = str(tmp_path / "parts")

    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(ensure_time_partitioned, src, step_us=step_us,
                      lo_us=lo_us, cache_root=cache)
            for _ in range(2)
        ]
        a, b = (f.result() for f in futs)
    assert a == b
    assert (Path(a) / "_DONE").exists()
    # no leftover half-built stage dirs
    leftovers = [d for d in Path(cache).iterdir() if ".tmp-" in d.name]
    assert not leftovers
    # the published layout is complete: row count matches the source
    total = sum(pq.ParquetFile(f).metadata.num_rows
                for f in Path(a).rglob("*.parquet"))
    assert total == meta.num_rows
