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


def extract_corpus(
    ds,
    *,
    mode: str = "hybrid",
    giant_bytes: int = DEFAULT_GIANT_BYTES,
    salt_bytes: int = DEFAULT_SALT_BYTES,
    concurrency=None,
    batch_size: int = 64,
):
    """Dataset of DOCUMENT_SCHEMA rows → Dataset of EXTRACTED_SCHEMA rows."""
    actor_kwargs = {}
    if concurrency is not None:
        actor_kwargs["concurrency"] = concurrency

    def fused(d):
        return d.map_batches(
            SpanExtractor,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=actor_kwargs.get("concurrency", (1, 8)),
        )

    def shuffled(d):
        exploded = d.map_batches(
            lambda t: explode_batch(t, salt_bytes=salt_bytes),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
        flat = exploded.map_batches(
            PartExtractor,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=max(batch_size * 4, 256),
            concurrency=actor_kwargs.get("concurrency", (1, 8)),
        )
        return reassemble(flat)

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
    ds = read_corpus(corpus_path, columns=CORPUS_COLUMNS)
    if out_dir is None:
        return extract_corpus(ds, mode=mode, **kwargs)

    from ..state.lineage import prepare_resume, skip_done_batch, write_partitioned

    done = prepare_resume(out_dir) if resume else set()
    # Input-side resume: assign partitions on doc_id and drop completed
    # partitions BEFORE extraction, so a resumed run re-reads only doc_id
    # + cheap metadata for finished work instead of re-extracting it.
    staged = ds.map_batches(
        lambda t: skip_done_batch(t, done, num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    extracted = extract_corpus(staged, mode=mode, **kwargs)
    return write_partitioned(
        extracted, out_dir, num_partitions=num_partitions, resume=resume, done=done
    )
