"""Declared Arrow schemas for every table the engine touches.

The reference declares a fixed relational schema with SQLAlchemy
(``/root/reference/tables/*.py``); we declare the equivalent pyarrow
schemas as constants and validate on read instead of inferring.

The flagship corpus schema comes from BASELINE.json ``input_hint``:
``doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Flagship interleaved text+media corpus (input) and extracted spans (output)
# ---------------------------------------------------------------------------

#: One input span: a raw payload chunk of the document in document order.
#: kind ∈ {"html", "pdf", "text", "media"}; ``text`` holds the raw payload
#: for html/pdf/text spans ("" for media); ``media_ref`` is "" except for
#: media spans; ``offset`` is the strictly-increasing document-order
#: position of the span.
SPAN_IN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_IN_STRUCT)),
        # total payload bytes across spans; lets the hybrid planner route
        # giant documents to the salted-shuffle path straight off the read
        # (row-group pushdown) without materializing span payloads twice.
        pa.field("n_bytes", pa.int64()),
    ]
)

#: One extracted output span. kind ∈ {"text", "media"}; ``order`` is the
#: 0-based position of the span in the reconstructed document.
SPAN_OUT_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("order", pa.int32()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_OUT_STRUCT)),
    ]
)

#: Flat exploded representation used between the explode and reassembly
#: stages of the shuffle path (one row per raw part: a whole span, or a
#: single PDF page of a span).
EXPLODED_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("salt", pa.int32()),
        pa.field("span_idx", pa.int32()),
        pa.field("part_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

#: Flat extracted span rows (post-extraction, pre-reassembly).
FLAT_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("salt", pa.int32()),
        pa.field("span_idx", pa.int32()),
        pa.field("sub_idx", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Tabular schemas mirroring the reference's relational model
# (SQLAlchemy declarations at /root/reference/tables/...)
# ---------------------------------------------------------------------------

#: hardware dim — /root/reference/tables/hardware_table.py:21-31
HARDWARE_SCHEMA = pa.schema(
    [
        pa.field("id_hardware", pa.int64()),
        pa.field("hardware", pa.string(), nullable=False),
        pa.field("compute", pa.float64()),
        pa.field("power", pa.float64()),
    ]
)

#: country dim — /root/reference/tables/country_table.py:20-28
COUNTRY_SCHEMA = pa.schema(
    [
        pa.field("id_country", pa.int64()),
        pa.field("country", pa.string(), nullable=False),
        pa.field("gco2_kwh", pa.float64(), nullable=False),
    ]
)

#: paper_information — /root/reference/tables/paper_information_table.py:16-43
PAPER_INFORMATION_SCHEMA = pa.schema(
    [
        pa.field("id_paper", pa.int64()),
        pa.field("model", pa.string()),
        pa.field("hardware_text", pa.string()),
        pa.field("abstract", pa.string()),
        pa.field("architecture", pa.string()),
        pa.field("parameters", pa.int64()),
        pa.field("id_country", pa.int64()),
        pa.field("id_hardware", pa.int64()),
        pa.field("h_compute", pa.float64()),
        pa.field("h_power", pa.float64()),
        pa.field("h_number", pa.int64()),
        pa.field("training_time_id_hardware", pa.int64()),
        pa.field("year", pa.int64()),
        pa.field("training_compute", pa.float64()),
        pa.field("training_time_hours", pa.float64()),
        pa.field("power_draw", pa.float64()),
        pa.field("co2eq", pa.float64()),
    ]
)


def validate_schema(table: pa.Table, expected: pa.Schema, *, allow_extra: bool = True) -> None:
    """Assert ``table`` carries the declared fields with the declared types.

    ``allow_extra`` tolerates additional columns (e.g. lineage columns).
    """
    for field in expected:
        idx = table.schema.get_field_index(field.name)
        if idx < 0:
            raise ValueError(f"missing column {field.name!r}; have {table.schema.names}")
        actual = table.schema.field(idx).type
        if actual != field.type:
            raise ValueError(f"column {field.name!r}: expected {field.type}, got {actual}")
    if not allow_extra:
        extra = set(table.schema.names) - {f.name for f in expected}
        if extra:
            raise ValueError(f"unexpected columns: {sorted(extra)}")
