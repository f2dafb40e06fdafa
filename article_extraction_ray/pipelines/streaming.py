"""Micro-batch streaming: stateful sessionization over an event stream
processed in arrival-time windows, with watermark-closed emission and
snapshot-checkpointed state — the continuous-processing shape a
100-TB/day event pipeline runs (Structured-Streaming/Flink semantics,
expressed as a driver loop of small Ray Data jobs).

Per micro-batch ``[t0, t1)``:

1. events are read with the time predicate pushed into the parquet scan
   (``read_parquet(filter=...)`` — only the window's row groups leave
   storage on a time-partitioned corpus);
2. each user's events merge with that user's CARRIED OPEN SESSION from
   the previous batch (same gap rule as the batch ``sessionize`` query:
   floor-to-second gap > 1800 s starts a new session);
3. sessions whose last event is older than the watermark (an event at
   ``t1`` could no longer extend them) are CLOSED and emitted —
   emission is final, never retracted;
4. still-open sessions become the next batch's carried state — a
   user-bounded table, snapshot-committed (state/snapshots.py) so a
   crashed run RESUMES from the last completed batch without
   re-emitting or re-reading finished windows (emit dirs are rewritten
   idempotently if the crash landed between write and commit).

The end-to-end invariant (pytest): the union of all emitted sessions is
IDENTICAL to the one-shot batch sessionization of the whole table —
micro-batching is an execution strategy, not a semantics change.

State travels to workers as one ``ray.put`` broadcast (open sessions
are a small fraction of users); at a scale where even open-session
state outgrows a broadcast, the drop-in swap is a map_groups join
against a state Dataset co-partitioned on user_id (the
tabular.shuffle_join shape).
"""

from __future__ import annotations

import os
import shutil
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa

SESSION_GAP_SEC = 1800  # same rule as pipelines/queries.py:_SESSION_GAP_SEC

#: window row count under which a micro-batch runs as a DRIVER kernel
#: instead of a Ray job — the same size routing as the CC driver tier
#: (stages/graph.py): a 5-job loop over toy windows pays ~0.9 s of fixed
#: plan + sort-exchange floor PER WINDOW for kilobytes of work, while a
#: production window (billions of events) is far past this budget and
#: always takes the distributed bucket-groupby path.  2M rows × 4 int64
#: cols ≈ 64 MB driver heap, bounded by construction.  The kernel is the
#: SAME `_sessionize_group` either way, so output is identical.
DRIVER_WINDOW_BUDGET = 2_000_000

_STATE_COLS = ["user_id", "sess_idx", "start_us", "last_us", "n_events", "cents"]
_EMIT_COLS = ["user_id", "session_id", "n_events", "cents", "start_us", "end_us"]


def _sessionize_group(
    df: pd.DataFrame, state_rows: dict, t1_us: int, gap_sec: int
) -> pd.DataFrame:
    """One user-bucket's micro-batch work: merge carried open sessions
    with this window's events, emit watermark-closed sessions, return
    emitted rows + next-state rows (tagged by ``kind``).

    The per-user loop is the sessionization itself (inherently
    sequential per user, like the batch query's per-group pandas); the
    window's row volume per bucket is what bounds it."""
    out_emit: list[tuple] = []
    out_state: list[tuple] = []
    t1_sec = t1_us // 1_000_000

    df = df.sort_values(["user_id", "us", "event_id"])
    for user, grp in df.groupby("user_id", sort=False):
        secs = (grp["us"].to_numpy() // 1_000_000).astype(np.int64)
        us = grp["us"].to_numpy()
        cents = grp["cents"].to_numpy()
        st = state_rows.get(int(user))
        if st is None:
            sess_idx, start_us, last_us, n_ev, c_sum = 0, 0, None, 0, 0
        else:
            sess_idx, start_us, last_us, n_ev, c_sum = st
            if last_us < 0:  # counter-only state: no open session carried
                last_us = None
        last_sec = None if last_us is None else last_us // 1_000_000
        for i in range(len(grp)):
            if last_sec is None or secs[i] - last_sec > gap_sec:
                if last_us is not None:  # close the previous session
                    out_emit.append((user, sess_idx, n_ev, c_sum, start_us, last_us))
                sess_idx += 1
                start_us, n_ev, c_sum = int(us[i]), 0, 0
            last_us, last_sec = int(us[i]), int(secs[i])
            n_ev += 1
            c_sum += int(cents[i])
        # watermark: closed iff even an event AT t1 could not extend it.
        # The session-COUNTER survives the close (last_us = -1 marker) —
        # per-user session numbering is global, so the keyed counter
        # state is permanent even when no session is open (exactly the
        # keyed-state contract of a streaming engine).
        if t1_sec - last_sec > gap_sec:
            out_emit.append((user, sess_idx, n_ev, c_sum, start_us, last_us))
            out_state.append((user, sess_idx, 0, -1, 0, 0))
        else:
            out_state.append((user, sess_idx, start_us, last_us, n_ev, c_sum))

    emit = pd.DataFrame(out_emit, columns=_EMIT_COLS)
    emit["kind"] = "emit"
    state = pd.DataFrame(out_state, columns=_STATE_COLS).rename(
        columns={"sess_idx": "session_id", "start_us": "start_us",
                 "last_us": "end_us"}
    )
    state["kind"] = "state"
    both = pd.concat([emit, state[emit.columns]], ignore_index=True)
    for c in _EMIT_COLS:
        both[c] = both[c].astype(np.int64)
    return both


def _empty_state() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _STATE_COLS})


def ensure_time_partitioned(
    path: str,
    *,
    step_us: int,
    lo_us: int,
    ts_col: str = "ts",
    cache_root: str = "/tmp/ae_stream_parts",
) -> Path:
    """Re-materialize an event table TIME-BUCKETED: one hive partition
    per micro-batch window (``wk = (ts - lo) // step``), written once and
    cached by (source identity, grid).

    This is the corpus layout a production event stream already has
    (ingest writes hourly/daily directories); the sandbox's single-file
    testdata lacks it, so micro-batch jobs re-scanned the full file per
    window.  One distributed pass fixes the layout; every later window
    read prunes to its own shards via parquet footer min/max
    (:func:`shards_for_window`).  The write is atomic (temp dir +
    rename) so concurrent callers race safely."""
    import ray.data as rd

    st = os.stat(path)
    key_src = f"{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|{step_us}|{lo_us}|{ts_col}"
    import hashlib

    key = hashlib.md5(key_src.encode()).hexdigest()[:16]
    dest = Path(cache_root) / key
    if (dest / "_DONE").exists():
        return dest
    tmp = dest.with_name(f"{dest.name}.tmp-{uuid.uuid4().hex[:6]}")

    def assign_window(batch: pa.Table) -> pa.Table:
        us = (
            batch[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("int64")
        )
        wk = ((us - lo_us) // step_us).astype(np.int64)
        return batch.append_column("wk", pa.array(wk))

    # modest read-block count: every block emits one file per window it
    # touches, so files-per-window ≈ blocks — the read heuristic's 2×-CPU
    # count would shatter each window into dozens of tiny shards whose
    # per-file open cost then dominates the pruned micro-batch reads this
    # layout exists to speed up.  At production scale the 128 MiB target
    # block size governs instead and this floor is irrelevant.
    (
        rd.read_parquet(path, override_num_blocks=8)
        .map_batches(assign_window, batch_format="pyarrow")
        .write_parquet(str(tmp), partition_cols=["wk"])
    )
    dest.parent.mkdir(parents=True, exist_ok=True)
    try:
        os.rename(tmp, dest)
        (dest / "_DONE").touch()
    except OSError:
        # lost the publish race — another writer finished first
        shutil.rmtree(tmp, ignore_errors=True)
    return dest


def shards_for_window(part_dir: Path, t0_us: int, t1_us: int, *, ts_col: str = "ts") -> list[str]:
    """Parquet shards whose footer [min, max] of ``ts_col`` overlaps
    ``[t0_us, t1_us)`` — a pure metadata scan (no data decode), the
    min/max pruning a lakehouse reader does per predicate.  Shards
    without statistics are conservatively included."""
    import pyarrow.parquet as pq

    out: list[str] = []
    for f in sorted(Path(part_dir).rglob("*.parquet")):
        keep = True
        try:
            meta = pq.ParquetFile(f).metadata
            names = [meta.schema.column(i).name for i in range(meta.num_columns)]
            i = names.index(ts_col)
            mins, maxs = [], []
            for g in range(meta.num_row_groups):
                stats = meta.row_group(g).column(i).statistics
                if stats is None or stats.min is None:
                    raise ValueError("no stats")
                mins.append(stats.min)
                maxs.append(stats.max)
            lo = int(pd.Timestamp(min(mins)).value // 1_000)
            hi = int(pd.Timestamp(max(maxs)).value // 1_000)
            keep = hi >= t0_us and lo < t1_us
        except Exception:
            keep = True  # unknown metadata → cannot prune
        if keep:
            out.append(str(f))
    return out


def run_sessionized_stream(
    sf_dir: str,
    out_dir: str | os.PathLike,
    *,
    batch_hours: int = 168,
    gap_sec: int = SESSION_GAP_SEC,
    resume: bool = True,
    partition_reads: bool = True,
    driver_window_budget: int = DRIVER_WINDOW_BUDGET,
) -> dict:
    """Process the events table as arrival-time micro-batches; emit
    watermark-closed sessions per batch; checkpoint carried state.

    ``partition_reads=True`` (default) first ensures a time-bucketed
    shard layout (:func:`ensure_time_partitioned`, one distributed pass,
    cached) and then reads each window through footer min/max pruning
    (:func:`shards_for_window`) — each micro-batch touches ONLY its own
    shards instead of re-scanning the whole table, the layout a
    production ingest directory already has.  Output is byte-identical
    either way (the same time predicate applies on top).

    Returns ``{"batches", "resumed_from", "sessions", "shards_read"}``
    where ``sessions`` counts sessions emitted BY THIS RUN (a resumed
    run re-emits nothing for completed batches) and ``shards_read``
    lists the per-batch pruned shard counts (empty when
    ``partition_reads=False``)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..state.snapshots import commit_snapshot, latest_version, read_manifest

    out_dir = Path(out_dir)
    state_dir = out_dir / "_state"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = os.path.join(sf_dir, "events.parquet")

    # window grid from footer stats (no data read)
    meta = pq.ParquetFile(path).metadata
    names = [meta.schema.column(i).name for i in range(meta.num_columns)]
    ts_i = names.index("ts")
    lo = min(meta.row_group(g).column(ts_i).statistics.min for g in range(meta.num_row_groups))
    hi = max(meta.row_group(g).column(ts_i).statistics.max for g in range(meta.num_row_groups))
    lo_us = int(pd.Timestamp(lo).value // 1_000)
    hi_us = int(pd.Timestamp(hi).value // 1_000)
    step_us = batch_hours * 3_600_000_000
    bounds = list(range(lo_us, hi_us + 1, step_us)) + [hi_us + 1]
    n_batches = len(bounds) - 1

    part_dir = None
    shards_read: list[int] = []
    if partition_reads:
        part_dir = ensure_time_partitioned(path, step_us=step_us, lo_us=lo_us)

    # resume: restore carried state + completed-batch index
    done_batch = -1
    state_df = _empty_state()
    if resume and latest_version(state_dir) is not None:
        man = read_manifest(state_dir, latest_version(state_dir))
        done_batch = man["batch"]
        parts = [pq.read_table(state_dir / f).to_pandas() for f in man["files"]]
        live = [p for p in parts if len(p)]
        if live:
            state_df = pd.concat(live, ignore_index=True)
    resumed_from = done_batch + 1

    total_sessions = 0
    for k in range(n_batches):
        if k <= done_batch:
            continue  # finished in a previous run; outputs already on disk
        t0_us, t1_us = bounds[k], bounds[k + 1]

        state_map = {
            int(r.user_id): (int(r.sess_idx), int(r.start_us), int(r.last_us),
                             int(r.n_events), int(r.cents))
            for r in state_df.itertuples()
        }

        flt = (pc.field("ts") >= pa.scalar(t0_us * 1000, type=pa.timestamp("ns"))) & (
            pc.field("ts") < pa.scalar(t1_us * 1000, type=pa.timestamp("ns"))
        )
        cols = ["user_id", "ts", "event_id", "value"]

        def prep(batch: pa.Table) -> pd.DataFrame:
            us = batch["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")
            uid = batch["user_id"].to_numpy(zero_copy_only=False)
            return pd.DataFrame(
                {"user_id": uid,
                 "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
                 "us": us,
                 "cents": np.round(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64),
                 "bucket": (uid % 32).astype(np.int32)}
            )

        files = None
        window_rows = None
        if part_dir is not None:
            files = shards_for_window(part_dir, t0_us, t1_us)
            shards_read.append(len(files))
            # footer row counts decide the route — no data read yet
            window_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)

        if window_rows is not None and window_rows <= driver_window_budget:
            # small window: one driver kernel call, zero Ray jobs (see
            # DRIVER_WINDOW_BUDGET) — same kernel, same output
            if files:
                import pyarrow.dataset as pads

                tbl = pads.dataset(files, format="parquet").to_table(
                    columns=cols, filter=flt
                )
            else:  # silent window: no events, but carried state still ages
                tbl = pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "ts": pa.array([], type=pa.timestamp("ns")),
                    "event_id": pa.array([], type=pa.int64()),
                    "value": pa.array([], type=pa.float64()),
                })
            both = _sessionize_group(
                prep(tbl).drop(columns=["bucket"]), state_map, t1_us, gap_sec
            )
        else:
            if files is not None:
                ds = rd.read_parquet(files, columns=cols, filter=flt)
            else:
                ds = rd.read_parquet(path, columns=cols, filter=flt)

            # carried state ships once per DISTRIBUTED window only — the
            # driver route reads state_map in-process
            state_ref = ray.put(state_map)

            def per_group(df: pd.DataFrame, t1=t1_us) -> pd.DataFrame:
                import ray as _ray

                return _sessionize_group(
                    df.drop(columns=["bucket"]), _ray.get(state_ref), t1, gap_sec
                )

            both = (
                ds.map_batches(prep, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(per_group, batch_format="pandas")
                .to_pandas()
            )
        if len(both) == 0:
            both = pd.DataFrame({c: pd.Series(dtype=np.int64) for c in _EMIT_COLS}
                                ).assign(kind=pd.Series(dtype=str))
        emitted = both[both["kind"] == "emit"][_EMIT_COLS]
        new_state = both[both["kind"] == "state"].rename(
            columns={"session_id": "sess_idx", "end_us": "last_us"}
        )[_STATE_COLS]

        # users silent this whole window: carried state persists and may
        # now be watermark-closed
        seen = set(both["user_id"]) if len(both) else set()
        silent = state_df[~state_df["user_id"].isin(seen)]
        t1_sec = t1_us // 1_000_000
        if len(silent):
            is_open = silent["last_us"] >= 0
            closeable = is_open & (
                (silent["last_us"] // 1_000_000) < (t1_sec - gap_sec)
            )
            sil_close = silent[closeable]
            extra_emit = pd.DataFrame(
                {"user_id": sil_close["user_id"], "session_id": sil_close["sess_idx"],
                 "n_events": sil_close["n_events"], "cents": sil_close["cents"],
                 "start_us": sil_close["start_us"], "end_us": sil_close["last_us"]}
            )
            emitted = pd.concat([emitted, extra_emit], ignore_index=True)
            # closed silent users keep a counter-only row; the rest pass
            # through unchanged (still open, or already counter-only)
            closed_counters = pd.DataFrame(
                {"user_id": sil_close["user_id"], "sess_idx": sil_close["sess_idx"],
                 "start_us": 0, "last_us": -1, "n_events": 0, "cents": 0}
            )
            keep_silent = pd.concat(
                [silent[~closeable], closed_counters], ignore_index=True
            )
        else:
            keep_silent = silent
        state_df = pd.concat([new_state, keep_silent], ignore_index=True)
        if len(state_df):
            state_df = state_df.astype(np.int64)

        # idempotent publish: rewrite the batch's emit dir, THEN commit
        # state — a crash in between re-runs the batch into the same dir
        emit_sub = out_dir / f"emit-b{k:04d}"
        shutil.rmtree(emit_sub, ignore_errors=True)
        emit_sub.mkdir(parents=True)
        pq.write_table(
            pa.Table.from_pandas(emitted, preserve_index=False),
            emit_sub / "part-0.parquet",
        )
        total_sessions += len(emitted)

        state_dir.mkdir(parents=True, exist_ok=True)
        sf = f"state-b{k:04d}-{uuid.uuid4().hex[:8]}.parquet"
        pq.write_table(
            pa.Table.from_pandas(
                state_df if len(state_df) else _empty_state(), preserve_index=False
            ),
            state_dir / sf,
        )
        commit_snapshot(state_dir, [sf], op="checkpoint", rows=len(state_df),
                        extra={"batch": k})

    # final flush: everything still open closes at end-of-stream
    open_state = state_df[state_df["last_us"] >= 0] if len(state_df) else state_df
    if len(open_state):
        flush = pd.DataFrame(
            {"user_id": open_state["user_id"], "session_id": open_state["sess_idx"],
             "n_events": open_state["n_events"], "cents": open_state["cents"],
             "start_us": open_state["start_us"], "end_us": open_state["last_us"]}
        )
        import pyarrow.parquet as _pq

        final_sub = out_dir / "emit-final"
        shutil.rmtree(final_sub, ignore_errors=True)
        final_sub.mkdir(parents=True)
        _pq.write_table(pa.Table.from_pandas(flush, preserve_index=False),
                        final_sub / "part-0.parquet")
        total_sessions += len(flush)

    return {"batches": n_batches, "resumed_from": resumed_from,
            "sessions": total_sessions, "shards_read": shards_read}


def read_emitted_sessions(out_dir: str | os.PathLike) -> pd.DataFrame:
    """All emitted sessions across batches + final flush, in the batch
    ``sessionize`` query's output shape (sum_value back in currency)."""
    import pyarrow.parquet as pq

    frames = []
    for sub in sorted(Path(out_dir).glob("emit-*")):
        for f in sorted(sub.glob("*.parquet")):
            frames.append(pq.read_table(f).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    out = pd.DataFrame(
        {"user_id": df["user_id"], "session_id": df["session_id"],
         "n_events": df["n_events"],
         "sum_value": df["cents"].to_numpy(np.float64) / 100.0,
         "t_start": pd.to_datetime(df["start_us"], unit="us"),
         "t_end": pd.to_datetime(df["end_us"], unit="us")}
    )
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
