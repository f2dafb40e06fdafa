"""Flagship pipeline: interleaved corpus → reconstructed span sequences.

Ray-Data-first equivalent of the reference's ``load_texts`` stage
(/root/reference/tables/paper_text_table.py:113-173), which reads every
document into one pandas frame and converts sequentially.  Here:

    read (Lance/Parquet, pruned columns)
      → [hybrid planner: route by n_bytes]
      → small docs: map_batches(SpanExtractor)              (no shuffle)
      → giant docs: explode → map_batches(PartExtractor)
                    → salted groupby reassembly             (2 shuffles,
                      giant docs only — typically <1% of rows)
      → union → write_partitioned (resumable, lineage)

Modes:
    "hybrid"  (default) — skew-mitigated: only giant docs shuffle.
    "fused"   — everything through the no-shuffle path (fastest when no
                document exceeds worker memory).
    "shuffle" — everything through explode/reassemble (stress-tests the
                salted shuffle; used by the equivalence property test).
"""

from __future__ import annotations

import pyarrow.compute as pc

from ..sources.io import read_corpus
from ..stages.extract import (
    DEFAULT_GIANT_BYTES,
    DEFAULT_SALT_BYTES,
    PartExtractor,
    SpanExtractor,
    explode_batch,
    extract_spans_task,
    reassemble,
)

CORPUS_COLUMNS = ["doc_id", "spans", "n_bytes"]




def _default_pool() -> int:
    """Actor-pool size for the parser stage: FIXED at a constant fraction
    of the cluster (AE_POOL_FRACTION, default 0.875).
    Fixed, because Ray fuses the upstream read into the actor
    operator (ReadParquet->...->MapBatches(SpanExtractor) runs ON the
    pool), which blinds the autoscaler — an autoscaling ``(1, N)`` pool
    was observed to stay at ONE actor for the whole job.  A fraction
    below 1.0, because the remaining CPUs must serve the giant-doc
    branch (elastic tasks), the sorts, and the writer concurrently in
    hybrid mode — a pool reserving every CPU starves them (0.875
    measured best on this box; the two phases run sequentially, so the
    writer overlap is the only concurrent consumer)."""
    import os

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    # uniform fraction of the cluster at any size: scaling measurements
    # compare cluster sizes, so the pool fraction must not depend on N
    # (AE_POOL_FRACTION overrides; bench --scaling pins it for both runs)
    frac = float(os.environ.get("AE_POOL_FRACTION", "0.875"))
    return max(1, int(cpus * frac))


def _env_force_pool() -> bool:
    """Opt into the actor-pool execution path for the parser stage
    (AE_FORCE_POOL=1).  Default is elastic tasks with a per-worker
    cached parser — see extract_corpus: with the fast kernel, pool
    startup stopped amortizing at bench scale, while a long-running
    production job with heavyweight parser contexts amortizes it and
    should set this."""
    import os

    return bool(os.environ.get("AE_FORCE_POOL"))


#: docs each parser actor should own before its process-start cost is
#: amortized (~6 s of parse at the measured ~1.3k docs/s/actor)
_DOCS_PER_ACTOR = 8_000


def _adaptive_pool(n_docs: int | None) -> int:
    """Actor count sized to the WORK, capped by the cluster fraction.

    A fixed fraction-of-cluster pool is right for long jobs but wrong
    for short ones: actor process start + scheduling dominates when
    each actor owns only a few hundred docs (measured on a 100k-doc
    phase: pool 28 → 18.6 s, pool 8 → 11.5 s; on a 300k-doc run the
    larger pool wins back — pool 16 → 29.8 s vs pool 10 → 42.4 s).
    So: one actor per AE_DOCS_PER_ACTOR documents (metadata row count,
    no data read), clamped to [1, fraction × cluster CPUs].  Unknown
    size falls back to the fraction pool.
    """
    import os

    pool = _default_pool()
    if n_docs is None:
        return pool
    per = int(os.environ.get("AE_DOCS_PER_ACTOR", str(_DOCS_PER_ACTOR)))
    return max(1, min(pool, -(-n_docs // per)))


def extract_corpus(
    ds,
    *,
    mode: str = "hybrid",
    giant_bytes: int = DEFAULT_GIANT_BYTES,
    salt_bytes: int = DEFAULT_SALT_BYTES,
    concurrency=None,
    batch_size: int | None = None,
    two_level: bool = False,
    span_fn=None,
):
    """Dataset of DOCUMENT_SCHEMA rows → Dataset of EXTRACTED_SCHEMA rows.

    ``concurrency=None`` (default) runs the parser as ELASTIC STATELESS
    TASKS with a per-worker-process cached extractor — "state once per
    worker" without actor-pool startup.  With the fast parse kernel the
    pool's process-spawn cost stopped amortizing at bench scale
    (measured, 100k docs/32 CPUs: pool-13 2.7 s vs tasks 1.4 s for the
    identical stage), and tasks let Ray fuse read → extract into one
    task per block.  Pass an int/tuple to host the stage as a
    ``map_batches`` actor pool instead — the right shape when the
    parser carries genuinely expensive per-process state (production
    lxml/pdfminer contexts, models) or the job runs long enough to
    amortize pool startup; both paths are span-equal by construction
    (same kernel object).

    ``batch_size=None`` processes whole blocks (no rebatch boundary,
    keeps operator fusion); set one only when payload × batch must be
    bounded below the block size.

    ``span_fn`` swaps the task-path parse kernel (default
    ``extract_spans_task``) — the plugin seam for alternative parser
    stacks and for fault-injection tests that wrap the kernel.
    """
    pool = concurrency

    def fused(d):
        if pool is None:
            return d.map_batches(
                span_fn or extract_spans_task,
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=batch_size,
            )
        return d.map_batches(
            SpanExtractor,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size if batch_size is not None else 256,
            concurrency=pool,
        )

    part_extractor = PartExtractor()

    def shuffled(d):
        # The giant-doc branch runs as STATELESS TASKS, not a second
        # actor pool: in hybrid mode two fixed pools would together
        # reserve more CPUs than the cluster has, and whichever pool is
        # idle at any moment still pins its reservation, starving the
        # other branch (measured: the whole giant branch degraded to
        # ~1.5 effective cores behind the fused pool's idle actors).
        # Giant parts are independent page/span units with no per-actor
        # state, so elastic tasks are semantically identical here; a
        # parser stack with real per-process state would instead share
        # one pool across branches.
        # no explicit batch_size: per-block processing lets Ray fuse
        # read → explode → extract into ONE task per input block (an
        # explicit batch size inserts a rebatch boundary that breaks
        # fusion and serializes the chain)
        exploded = d.map_batches(
            lambda t: explode_batch(t, salt_bytes=salt_bytes),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        flat = exploded.map_batches(
            lambda t: part_extractor(t),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return reassemble(flat, two_level=two_level)

    if mode == "fused":
        return fused(ds)
    if mode == "shuffle":
        return shuffled(ds)
    if mode == "hybrid":
        # Single-plan hybrid, kept for callers that hand in an arbitrary
        # Dataset.  NOTE: the giant branch's task flood can starve the
        # fused branch's actor-pool creation in one union plan (measured);
        # run_flagship routes around this with sequential phases — prefer
        # run_flagship(corpus_path, mode="hybrid") when reading a corpus.
        small = ds.filter(expr=f"n_bytes <= {giant_bytes}")
        giant = ds.filter(expr=f"n_bytes > {giant_bytes}")
        return fused(small).union(shuffled(giant))
    raise ValueError(f"unknown mode {mode!r}")


def _hybrid_sources(corpus_path: str, giant_bytes: int):
    """(giants_ds | None, smalls_ds) for the two-phase hybrid plan.

    Giant shards come from a metadata-only footer scan (skip the phase
    when no shard can contain giants); both reads push the n_bytes
    predicate into the scan."""
    from ..sources.io import files_with_giants

    giant_shards = (
        files_with_giants(corpus_path, giant_bytes)
        if not str(corpus_path).rstrip("/").endswith(".lance")
        else None  # lance path: no parquet footers; scan with filter only
    )
    if giant_shards is not None and not giant_shards:
        giants_ds = None
    else:
        giants_ds = read_corpus(
            giant_shards if giant_shards is not None else corpus_path,
            columns=CORPUS_COLUMNS,
            filter=pc.field("n_bytes") > giant_bytes,
            filter_sql=f"n_bytes > {giant_bytes}",
            # giants are <1% of rows: one block per pruned shard, not the
            # full-scan cpus*8 heuristic (which shatters this sparse read
            # into hundreds of near-empty blocks and the reassembly sort
            # then pays per-block scheduling for each)
            override_num_blocks=(len(giant_shards) if giant_shards is not None else None),
        )
    smalls_ds = read_corpus(
        corpus_path,
        columns=CORPUS_COLUMNS,
        filter=pc.field("n_bytes") <= giant_bytes,
        filter_sql=f"n_bytes <= {giant_bytes}",
    )
    return giants_ds, smalls_ds


def run_flagship(
    corpus_path: str,
    out_dir: str | None = None,
    *,
    mode: str = "hybrid",
    num_partitions: int = 64,
    resume: bool = True,
    **kwargs,
):
    """End-to-end: read → extract → (optionally) resumable partitioned write.

    Returns the extracted Dataset when ``out_dir`` is None, else the
    write summary dict from the lineage writer.
    """
    import pyarrow.compute as pc

    if out_dir is None:
        if mode == "hybrid":
            # Same sequential two-phase shape as the write path: the
            # giant (shuffle) phase materializes first — its output is
            # tiny (<1% of docs) and stays distributed in the object
            # store — then the fused small phase streams on consumption
            # with the actor pool to itself.  A single union plan was
            # measured to starve the pool (ONE actor for the whole job).
            giant_bytes = kwargs.get("giant_bytes", DEFAULT_GIANT_BYTES)
            giants_ds, smalls_ds = _hybrid_sources(corpus_path, giant_bytes)
            if "concurrency" not in kwargs and _env_force_pool():
                from ..sources.io import corpus_num_rows

                kwargs["concurrency"] = _adaptive_pool(corpus_num_rows(corpus_path))
            smalls = extract_corpus(smalls_ds, mode="fused", **kwargs)
            if giants_ds is None:
                return smalls
            giants = extract_corpus(giants_ds, mode="shuffle", **kwargs).materialize()
            return giants.union(smalls)
        ds = read_corpus(corpus_path, columns=CORPUS_COLUMNS)
        return extract_corpus(ds, mode=mode, **kwargs)
    ds = read_corpus(corpus_path, columns=CORPUS_COLUMNS)

    import time

    from ..state.lineage import (
        prepare_resume,
        skip_done_batch,
        write_manifests,
        write_partition_data,
    )

    done = prepare_resume(out_dir) if resume else set()

    def staged(d):
        # Input-side resume: assign partitions on doc_id and drop
        # completed partitions BEFORE extraction, so a resumed run
        # re-reads only cheap metadata for finished work.
        return d.map_batches(
            lambda t: skip_done_batch(t, done, num_partitions=num_partitions),
            batch_format="pyarrow",
        )

    giant_bytes = kwargs.get("giant_bytes", DEFAULT_GIANT_BYTES)
    start = time.perf_counter()

    if mode == "hybrid":
        # The two branches run as OVERLAPPED executions in two driver
        # threads (AE_PHASE_OVERLAP=0 forces sequential): the giant
        # phase touches <1% of docs and a handful of pruned shards, so
        # with the parser pool capped below the DRAM wall
        # (_default_pool) the cluster has idle CPUs to absorb it — its
        # wall time hides entirely behind the small phase (measured
        # ~14.7 s sequential vs ~13.6 s overlapped at sf0.1).  A single
        # UNION plan is still avoided: the giant branch's task flood
        # blocked the actor pool's creation (measured: ONE actor for
        # the whole job).  Each phase writes into the same partition
        # layout with a distinct file tag; manifests commit once at the
        # end, so a crash mid-job resumes whole partitions.
        import os
        import sys
        import threading

        import pandas as pd

        debug = bool(os.environ.get("AE_PHASE_DEBUG"))
        overlap = os.environ.get("AE_PHASE_OVERLAP", "1") != "0"

        t_phase = time.perf_counter()
        giants_ds, smalls_ds = _hybrid_sources(corpus_path, giant_bytes)
        if "concurrency" not in kwargs and _env_force_pool():
            from ..sources.io import corpus_num_rows

            kwargs["concurrency"] = _adaptive_pool(corpus_num_rows(corpus_path))

        giant_result: dict = {}

        def run_giant():
            try:
                if giants_ds is None:
                    giant_result["summary"] = pd.DataFrame(
                        {"part_id": [], "rows": [], "bytes": []}
                    )
                    if debug:
                        print(
                            "[flagship] giant phase skipped (no shard can "
                            "contain giants)",
                            file=sys.stderr,
                        )
                    return
                giants = extract_corpus(staged(giants_ds), mode="shuffle", **kwargs)
                giant_result["summary"] = write_partition_data(
                    giants, out_dir, num_partitions=num_partitions, done=done, tag="g"
                )
                if debug:
                    s_g = giant_result["summary"]
                    print(
                        f"[flagship] giant phase {time.perf_counter() - t_phase:.1f}s "
                        f"rows={int(s_g['rows'].sum()) if len(s_g) else 0}",
                        file=sys.stderr,
                    )
            except BaseException as exc:  # propagate into the main thread
                giant_result["error"] = exc

        # NOTE: fusing the file sink INTO the parser actors was measured
        # SLOWER (file I/O blocks the actors); the separate elastic
        # writer overlaps I/O with parsing.
        if overlap:
            tg = threading.Thread(target=run_giant, name="giant-phase")
            tg.start()
        else:
            run_giant()

        t_small = time.perf_counter()
        smalls = extract_corpus(staged(smalls_ds), mode="fused", **kwargs)
        s_s = write_partition_data(
            smalls, out_dir, num_partitions=num_partitions, done=done, tag="s"
        )
        if debug:
            print(f"[flagship] small phase {time.perf_counter() - t_small:.1f}s "
                  f"rows={int(s_s['rows'].sum()) if len(s_s) else 0}", file=sys.stderr)
        if overlap:
            tg.join()
        if "error" in giant_result:
            raise giant_result["error"]
        summaries = pd.concat([giant_result["summary"], s_s], ignore_index=True)
    else:
        extracted = extract_corpus(staged(ds), mode=mode, **kwargs)
        summaries = write_partition_data(
            extracted, out_dir, num_partitions=num_partitions, done=done, tag=mode[0]
        )

    wall = time.perf_counter() - start
    return write_manifests(out_dir, summaries, wall, num_partitions=num_partitions, done=done)
