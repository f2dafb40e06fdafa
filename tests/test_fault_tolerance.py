"""Fault-injection: the engine's pipelines must survive worker-process
death mid-task — the everyday failure at 100-TB scale (preempted node,
OOM-killed worker) — with EXACT results, not just completion.

Ray Data retries tasks whose worker died (a system failure, as opposed
to a user exception, which correctly fails fast).  These tests kill a
worker hard (``os._exit``) on the first attempt — the marker file is
claimed with O_CREAT|O_EXCL so exactly one task dies — and assert the
retried pipeline's output is bit-identical to the no-fault run.
Together with ``test_resume`` (driver-level crash + partition-lineage
resume) this covers both failure domains the north rule's
checkpoint-resume criterion names.

All injected UDFs are SELF-CONTAINED locals defined inside the tests:
cloudpickle ships local functions/classes by value, but any reference
to a module-level name in THIS file would be pickled as an import of
``test_fault_tolerance``, which worker processes cannot resolve — so
the marker-claim logic is inlined into every UDF.
"""

from __future__ import annotations

import os

import pyarrow as pa


def test_task_retry_after_worker_death(ray_session, tmp_path):
    import ray

    marker = str(tmp_path / "task_died_once")

    def kill_once(batch: pa.Table) -> pa.Table:
        import os as _os

        try:
            fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            return batch
        _os.close(fd)
        _os._exit(1)  # simulated preemption: no cleanup, no exception

    ds = ray.data.range(10_000, override_num_blocks=8)
    out = ds.map_batches(
        kill_once,
        batch_format="pyarrow",
        max_retries=4,
    ).sum("id")
    assert os.path.exists(marker), "fault was never injected"
    assert out == 9_999 * 10_000 // 2


def test_actor_pool_restart_after_death(ray_session, tmp_path):
    """An actor-pool stage (the engine's stateful-stage shape) must be
    restarted after a hard death and its in-flight task retried."""
    import ray

    marker = str(tmp_path / "actor_died_once")

    class KillOnceStage:
        def __call__(self, batch):
            import os as _os

            import pyarrow.compute as _pc

            try:
                fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
            except FileExistsError:
                return batch.append_column("doubled", _pc.multiply(batch["id"], 2))
            _os.close(fd)
            _os._exit(1)

    ds = ray.data.range(10_000, override_num_blocks=8)
    out = ds.map_batches(
        KillOnceStage,
        batch_format="pyarrow",
        concurrency=2,
        max_restarts=4,
        max_task_retries=4,
    ).sum("doubled")
    assert os.path.exists(marker), "fault was never injected"
    assert out == 9_999 * 10_000  # 2 * sum(0..9999)


def _read_sorted(out_dir: str) -> pa.Table:
    import pyarrow.dataset as pads

    t = pads.dataset(out_dir, format="parquet", partitioning="hive").to_table()
    return t.select(["doc_id", "spans"]).sort_by("doc_id")


def test_flagship_survives_worker_death(ray_session, tmp_path):
    """End-to-end: the flagship extraction pipeline completes with
    bit-identical output when a parser worker dies mid-run (injected
    through the ``span_fn`` parser-kernel seam)."""
    from article_extraction_ray.pipelines.flagship import run_flagship
    from article_extraction_ray.sources.synth import ensure_corpus_parquet

    corpus = ensure_corpus_parquet(str(tmp_path / "corpus"), 800, 7)

    clean = run_flagship(
        corpus, str(tmp_path / "out_clean"), mode="hybrid", num_partitions=4
    )

    marker = str(tmp_path / "flagship_died_once")

    def dying_span_fn(batch):
        import os as _os

        from article_extraction_ray.stages.extract import extract_spans_task

        try:
            fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
        except FileExistsError:
            return extract_spans_task(batch)
        _os.close(fd)
        _os._exit(1)

    faulted = run_flagship(
        corpus,
        str(tmp_path / "out_fault"),
        mode="hybrid",
        num_partitions=4,
        span_fn=dying_span_fn,
    )

    assert os.path.exists(marker), "fault was never injected"
    assert faulted["rows"] == clean["rows"]
    a, b = _read_sorted(str(tmp_path / "out_clean")), _read_sorted(str(tmp_path / "out_fault"))
    assert a.equals(b), "faulted run's output differs from the clean run"
