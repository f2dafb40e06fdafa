"""Extraction stages: fused per-document path and salted-shuffle path.

Both paths share the single-process oracle semantics
(:mod:`article_extraction_ray.oracle`) so their outputs are identical by
construction; a property test asserts it.

Fused path (default for normal-size documents)
    ``map_batches(SpanExtractor, batch_format="pyarrow")`` — each input
    row already holds the whole document's spans, so extraction + span
    reconstruction happen in one stage with **no shuffle**.

Salted-shuffle path (giant documents)
    explode → per-part extraction → two-level reassembly:

    1. ``explode_batch`` flattens each document into per-part rows (a
       whole span, or a single PDF page), assigning ``salt =
       cumulative_payload_bytes // salt_byte_budget``.  Salt is monotonic
       in document order, so partials concatenate back in salt order.
    2. ``PartExtractor`` (actor pool) maps each part to ≥0 flat output
       span rows keyed ``(doc_id, salt, span_idx, sub_idx)``.
    3. ``reassemble()`` groups by ``(doc_id, salt)`` → sorted partials,
       then by ``doc_id`` → merge partials in salt order, apply the
       whole-document drop rule, and assign final ``order``.

The skew-mitigation design (salted keys for giant documents, two-level
reduce) is required by BASELINE.json ``north_rule``; the reference has no
intra-job parallelism at all (SLURM 1 task, /root/reference/batch.sh:2-13).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..oracle import extract_pdf_pages
from .fast_html import (
    extract_document_spans_fast as extract_document_spans,
    extract_html_paragraphs_hybrid as extract_html_paragraphs,
)
from ..schema import EXTRACTED_SCHEMA, EXPLODED_SCHEMA, FLAT_SPAN_SCHEMA, SPAN_OUT_STRUCT

#: Documents whose total payload exceeds this go to the salted path.
#: Calibrated to the block budget: a multi-MB document still parses
#: comfortably inside one fused task (blocks are ~128 MiB), so skew
#: mitigation engages only where a document threatens task balance.
DEFAULT_GIANT_BYTES = 8 << 20  # 8 MiB
#: Cumulative-bytes bucket width for salt assignment within a giant doc.
DEFAULT_SALT_BYTES = 256 << 10  # 256 KiB


class SpanExtractor:
    """Actor-pool batch fn: whole-document extraction, no shuffle.

    Stateful-parser-stage shape per the north rule: construct once per
    actor (``__init__``), transform per batch (``__call__``).  The HTML
    parser contexts themselves are per-feed (html.parser is single-use),
    but the class shape keeps the stage swappable for heavier parser
    stacks (lxml/pdfminer contexts) without touching the pipeline.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        all_spans = batch["spans"].to_pylist()
        out_ids: list[str] = []
        out_spans: list[list[dict]] = []
        for doc_id, spans in zip(doc_ids, all_spans):
            extracted = extract_document_spans(spans or [])
            if not extracted:
                continue  # whole-document drop rule
            out_ids.append(doc_id)
            out_spans.append(
                [{"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "order": s.order} for s in extracted]
            )
        return pa.Table.from_arrays(
            [
                pa.array(out_ids, type=pa.string()),
                pa.array(out_spans, type=pa.list_(SPAN_OUT_STRUCT)),
            ],
            schema=EXTRACTED_SCHEMA,
        )


#: per-worker-process parser singleton for the elastic-task execution
#: path (same "state once per worker" trade as dedup._STAGE_CACHE): the
#: sandbox parser has no expensive context, so tasks skip actor-pool
#: process spawn entirely; a parser stack with real per-process state
#: (lxml/pdfminer/models) should run as an actor pool instead.
_SPAN_STAGE: "SpanExtractor | None" = None


def extract_spans_task(batch: pa.Table) -> pa.Table:
    global _SPAN_STAGE
    if _SPAN_STAGE is None:
        _SPAN_STAGE = SpanExtractor()
    return _SPAN_STAGE(batch)


def explode_batch(batch: pa.Table, *, salt_bytes: int = DEFAULT_SALT_BYTES) -> pa.Table:
    """Flatten documents into per-part rows with salted keys.

    PDF spans are split into per-page parts here (pages are independent
    units, /root/reference/tables/paper_text_table.py:75-78) so a single
    giant PDF span parallelizes; HTML spans stay whole because the
    paragraph state machine spans the full payload.
    """
    doc_ids: list[str] = []
    salts: list[int] = []
    span_idxs: list[int] = []
    part_idxs: list[int] = []
    kinds: list[str] = []
    texts: list[str] = []
    media_refs: list[str] = []

    for doc_id, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
        cum = 0
        ordered = sorted(spans or [], key=lambda s: s.get("offset", 0))
        for span_idx, span in enumerate(ordered):
            kind = (span.get("kind") or "").lower()
            text = span.get("text") or ""
            if kind == "pdf":
                parts = [("pdf_page", page, "") for page in extract_pdf_pages(text)]
            elif kind == "media":
                parts = [("media", "", span.get("media_ref") or "")]
            else:
                parts = [(kind, text, "")]
            for part_idx, (pkind, ptext, pref) in enumerate(parts):
                doc_ids.append(doc_id)
                salts.append(cum // salt_bytes)
                span_idxs.append(span_idx)
                part_idxs.append(part_idx)
                kinds.append(pkind)
                texts.append(ptext)
                media_refs.append(pref)
                cum += len(ptext)
    return pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.string()),
            pa.array(salts, type=pa.int32()),
            pa.array(span_idxs, type=pa.int32()),
            pa.array(part_idxs, type=pa.int32()),
            pa.array(kinds, type=pa.string()),
            pa.array(texts, type=pa.string()),
            pa.array(media_refs, type=pa.string()),
        ],
        schema=EXPLODED_SCHEMA,
    )


class PartExtractor:
    """Actor-pool batch fn: exploded part rows → flat output span rows.

    ``sub_idx`` enumerates output spans *within* an input part; the final
    document order is the lexicographic sort of (span_idx, part_idx
    folded into sub_idx for pdf pages, sub_idx).  To keep the key two
    columns wide, pdf pages carry ``sub_idx = part_idx`` (each page emits
    exactly one span) and html parts carry ``sub_idx = paragraph index``
    (html has a single part).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_doc: list[str] = []
        o_salt: list[int] = []
        o_span: list[int] = []
        o_sub: list[int] = []
        o_kind: list[str] = []
        o_text: list[str] = []
        o_ref: list[str] = []

        doc = batch["doc_id"].to_pylist()
        salt = batch["salt"].to_pylist()
        span_i = batch["span_idx"].to_pylist()
        part_i = batch["part_idx"].to_pylist()
        kind = batch["kind"].to_pylist()
        text = batch["text"].to_pylist()
        ref = batch["media_ref"].to_pylist()

        for d, sl, si, pi, k, t, r in zip(doc, salt, span_i, part_i, kind, text, ref):
            t = t or ""
            if k == "html":
                outs = [("text", p, "", j) for j, p in enumerate(extract_html_paragraphs(t))]
            elif k == "pdf_page":
                outs = [("text", t, "", pi)]  # one span per page, even when empty
            elif k == "media":
                outs = [("media", "", r or "", pi)]
            elif k in ("text", "txt", "json"):
                outs = [("text", t, "", pi)] if t != "" else []
            else:
                outs = []
            for ok, ot, orf, sub in outs:
                o_doc.append(d)
                o_salt.append(sl)
                o_span.append(si)
                o_sub.append(sub)
                o_kind.append(ok)
                o_text.append(ot)
                o_ref.append(orf)

        return pa.Table.from_arrays(
            [
                pa.array(o_doc, type=pa.string()),
                pa.array(o_salt, type=pa.int32()),
                pa.array(o_span, type=pa.int32()),
                pa.array(o_sub, type=pa.int32()),
                pa.array(o_kind, type=pa.string()),
                pa.array(o_text, type=pa.string()),
                pa.array(o_ref, type=pa.string()),
            ],
            schema=FLAT_SPAN_SCHEMA,
        )


_PARTIAL_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

#: coarse shuffle buckets for the reassembly levels — grouping on raw
#: (doc_id, salt) keys would pay per-group scheduling for every tiny
#: group; a bucket holds many groups and processes them vectorized.
_REASSEMBLY_BUCKETS = 64


def _hash_bucket(values: np.ndarray, extra: np.ndarray | None = None) -> np.ndarray:
    import pandas as pd

    h = pd.util.hash_array(values)
    if extra is not None:
        h = h ^ (extra.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    return (h % _REASSEMBLY_BUCKETS).astype(np.int32)


def _group_starts(*keys: np.ndarray) -> np.ndarray:
    """Indices where the (already sorted) composite key changes."""
    n = len(keys[0])
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.nonzero(change)[0]


def _combine_salt_bucket(group: pa.Table) -> pa.Table:
    """Level-1 combiner over a BUCKET of (doc_id, salt) groups: sort once,
    then build every group's partial span list via offsets (zero per-group
    Python)."""
    order = pa.compute.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("salt", "ascending"),
            ("span_idx", "ascending"),
            ("sub_idx", "ascending"),
        ],
    )
    g = group.take(order).combine_chunks()
    doc = g["doc_id"].to_numpy(zero_copy_only=False)
    salt = g["salt"].to_numpy()
    starts = _group_starts(doc, salt)
    offsets = np.append(starts, len(doc)).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [g["kind"].combine_chunks(), g["text"].combine_chunks(), g["media_ref"].combine_chunks()],
        ["kind", "text", "media_ref"],
    )
    parts = pa.ListArray.from_arrays(pa.array(offsets), struct)
    is_text = pa.compute.equal(g["kind"], "text").to_numpy(zero_copy_only=False)
    has_text = np.logical_or.reduceat(is_text, starts) if len(starts) else np.zeros(0, dtype=bool)
    return pa.Table.from_arrays(
        [
            pa.array(doc[starts], type=pa.string()),
            pa.array(salt[starts], type=pa.int32()),
            parts,
            pa.array(has_text),
        ],
        names=["doc_id", "salt", "parts", "has_text"],
    )


def _merge_doc_bucket(group: pa.Table) -> pa.Table:
    """Level-2 merger over a BUCKET of docs: concatenate each doc's salt
    partials in salt order, assign final span order, apply the
    whole-document drop rule — all via offset arithmetic."""
    order = pa.compute.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("salt", "ascending")]
    )
    g = group.take(order).combine_chunks()
    doc = g["doc_id"].to_numpy(zero_copy_only=False)
    parts = g["parts"].combine_chunks()
    counts = pa.compute.list_value_length(parts).to_numpy().astype(np.int64)
    starts = _group_starts(doc)
    row_offsets = np.append(starts, len(doc))
    flat = parts.flatten()

    # element offsets per doc
    cum = np.concatenate([[0], np.cumsum(counts)])
    doc_elem_offsets = cum[row_offsets]
    n_elems = int(cum[-1])
    # order within doc = global position − doc's first element position
    elem_doc_first = np.repeat(doc_elem_offsets[:-1], (doc_elem_offsets[1:] - doc_elem_offsets[:-1]))
    span_order = (np.arange(n_elems) - elem_doc_first).astype(np.int32)

    out_struct = pa.StructArray.from_arrays(
        [flat.field("kind"), flat.field("text"), flat.field("media_ref"), pa.array(span_order)],
        ["kind", "text", "media_ref", "order"],
    )
    lists = pa.ListArray.from_arrays(pa.array(doc_elem_offsets.astype(np.int32)), out_struct)
    has_text = g["has_text"].to_numpy(zero_copy_only=False)
    keep = np.logical_or.reduceat(has_text, starts) if len(starts) else np.zeros(0, dtype=bool)
    table = pa.Table.from_arrays(
        [pa.array(doc[starts], type=pa.string()), lists.cast(pa.list_(SPAN_OUT_STRUCT))],
        schema=EXTRACTED_SCHEMA,
    )
    return table.filter(pa.array(keep))


def _assemble_bucket(group: pa.Table) -> pa.Table:
    """Single-level assembler over a bucket of whole docs: sort by
    (doc_id, span_idx, sub_idx), then build every doc's final span list
    via offset arithmetic (no per-group Python)."""
    order = pa.compute.sort_indices(
        group,
        sort_keys=[("doc_id", "ascending"), ("span_idx", "ascending"), ("sub_idx", "ascending")],
    )
    g = group.take(order).combine_chunks()
    doc = g["doc_id"].to_numpy(zero_copy_only=False)
    starts = _group_starts(doc)
    offsets = np.append(starts, len(doc)).astype(np.int32)
    span_order = (np.arange(len(doc)) - np.repeat(starts, np.diff(np.append(starts, len(doc))))).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            g["kind"].combine_chunks(),
            g["text"].combine_chunks(),
            g["media_ref"].combine_chunks(),
            pa.array(span_order),
        ],
        ["kind", "text", "media_ref", "order"],
    )
    lists = pa.ListArray.from_arrays(pa.array(offsets), struct)
    is_text = pa.compute.equal(g["kind"], "text").to_numpy(zero_copy_only=False)
    keep = np.logical_or.reduceat(is_text, starts) if len(starts) else np.zeros(0, dtype=bool)
    table = pa.Table.from_arrays(
        [pa.array(doc[starts], type=pa.string()), lists.cast(pa.list_(SPAN_OUT_STRUCT))],
        schema=EXTRACTED_SCHEMA,
    )
    return table.filter(pa.array(keep))


def reassemble(flat_ds, *, two_level: bool = False):
    """Reassembly of flat span rows → extracted documents.

    Default: ONE ``groupby(hash(doc_id) % B)`` shuffle; every bucket
    assembles its docs in a single vectorized pass, and the coarse
    bucket bounds per-task bytes (≈ corpus_bytes / B), which is the
    skew control at this level.

    ``two_level=True`` enables the salted two-level reduce (combine per
    (doc_id, salt) bucket, then merge per doc bucket) for corpora whose
    single documents exceed a reducer's memory budget — the salt column
    is always present in the flat rows, so switching is free.  The extra
    shuffle costs one more barrier; property tests assert both paths are
    identical.
    """

    def add_l1_bucket(batch: pa.Table) -> pa.Table:
        b = _hash_bucket(
            batch["doc_id"].to_numpy(zero_copy_only=False), batch["salt"].to_numpy()
        )
        return batch.append_column("bucket", pa.array(b))

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        b = _hash_bucket(batch["doc_id"].to_numpy(zero_copy_only=False))
        return batch.append_column("bucket", pa.array(b))

    def drop_bucket(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["bucket"])

    if not two_level:
        return (
            flat_ds.map_batches(add_doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(lambda t: _assemble_bucket(drop_bucket(t)), batch_format="pyarrow")
        )

    partials = (
        flat_ds.map_batches(add_l1_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda t: _combine_salt_bucket(drop_bucket(t)), batch_format="pyarrow"
        )
    )
    return (
        partials.map_batches(add_doc_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(lambda t: _merge_doc_bucket(drop_bucket(t)), batch_format="pyarrow")
    )
