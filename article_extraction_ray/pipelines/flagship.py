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
    reassemble,
)

CORPUS_COLUMNS = ["doc_id", "spans", "n_bytes"]


def _default_pool() -> int:
    """Actor-pool size for the parser stage: FIXED at ~60% of the
    cluster.  Fixed, because Ray fuses the upstream read into the actor
    operator (ReadParquet->...->MapBatches(SpanExtractor) runs ON the
    pool), which blinds the autoscaler — an autoscaling ``(1, N)`` pool
    was observed to stay at ONE actor for the whole job.  60%, because
    the remaining CPUs must serve the giant-doc branch (elastic tasks),
    the sorts, and the writer concurrently in hybrid mode — a pool
    reserving every CPU starves them."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    # uniform 7/8 of the cluster at any size: scaling measurements
    # compare cluster sizes, so the pool fraction must not depend on N
    return max(2, (cpus * 7) // 8)


def extract_corpus(
    ds,
    *,
    mode: str = "hybrid",
    giant_bytes: int = DEFAULT_GIANT_BYTES,
    salt_bytes: int = DEFAULT_SALT_BYTES,
    concurrency=None,
    batch_size: int = 256,
    two_level: bool = False,
):
    """Dataset of DOCUMENT_SCHEMA rows → Dataset of EXTRACTED_SCHEMA rows.

    ``batch_size`` applies to the fused (small-doc) path; the shuffle
    path uses smaller doc batches (payloads there are giant) and larger
    part-row batches.
    """
    pool = concurrency if concurrency is not None else _default_pool()

    def fused(d):
        return d.map_batches(
            SpanExtractor,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
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
        exploded = d.map_batches(
            lambda t: explode_batch(t, salt_bytes=salt_bytes),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=32,
        )
        flat = exploded.map_batches(
            lambda t: part_extractor(t),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
        )
        return reassemble(flat, two_level=two_level)

    if mode == "fused":
        return fused(ds)
    if mode == "shuffle":
        return shuffled(ds)
    if mode == "hybrid":
        # n_bytes is a tiny metadata column; the two filters each prune at
        # the read (predicate over one int column), so the payload column
        # is scanned once per branch but only for that branch's rows.
        small = ds.filter(expr=f"n_bytes <= {giant_bytes}")
        giant = ds.filter(expr=f"n_bytes > {giant_bytes}")
        return fused(small).union(shuffled(giant))
    raise ValueError(f"unknown mode {mode!r}")


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

    ds = read_corpus(corpus_path, columns=CORPUS_COLUMNS)
    if out_dir is None:
        return extract_corpus(ds, mode=mode, **kwargs)

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
        # The two branches run as SEPARATE executions (not one union
        # plan): under a single plan the giant branch's task flood was
        # observed to block the parser actor pool's creation, collapsing
        # the fused branch to ONE actor.  The small phase launches
        # FIRST, so the pool claims its CPUs before the giant phase's
        # elastic tasks backfill the remainder; the two executions then
        # overlap.  Each writes into the same partition layout with a
        # distinct file tag; manifests commit once at the end, so a
        # crash mid-job resumes whole partitions (no manifest → re-run).
        #
        # Predicate pushdown into the parquet scan: the giant phase must
        # not pay a full decode of the corpus to select <1% of rows.
        import threading

        giants_ds = read_corpus(
            corpus_path, columns=CORPUS_COLUMNS, filter=pc.field("n_bytes") > giant_bytes
        )
        smalls_ds = read_corpus(
            corpus_path, columns=CORPUS_COLUMNS, filter=pc.field("n_bytes") <= giant_bytes
        )

        results: dict[str, object] = {}
        errors: list[BaseException] = []

        def run_small():
            try:
                smalls = extract_corpus(staged(smalls_ds), mode="fused", **kwargs)
                results["s"] = write_partition_data(
                    smalls, out_dir, num_partitions=num_partitions, done=done, tag="s"
                )
            except BaseException as exc:  # noqa: BLE001 - re-raised below
                errors.append(exc)

        def run_giant():
            try:
                giants = extract_corpus(staged(giants_ds), mode="shuffle", **kwargs)
                results["g"] = write_partition_data(
                    giants, out_dir, num_partitions=num_partitions, done=done, tag="g"
                )
            except BaseException as exc:  # noqa: BLE001
                errors.append(exc)

        t_small = threading.Thread(target=run_small, name="flagship-small")
        t_giant = threading.Thread(target=run_giant, name="flagship-giant")
        t_small.start()
        time.sleep(1.0)  # let the parser pool win its CPU reservations
        t_giant.start()
        t_small.join()
        t_giant.join()
        if errors:
            raise errors[0]

        import pandas as pd

        summaries = pd.concat([results["g"], results["s"]], ignore_index=True)
    else:
        extracted = extract_corpus(staged(ds), mode=mode, **kwargs)
        summaries = write_partition_data(
            extracted, out_dir, num_partitions=num_partitions, done=done, tag=mode[0]
        )

    wall = time.perf_counter() - start
    return write_manifests(out_dir, summaries, wall, num_partitions=num_partitions, done=done)
