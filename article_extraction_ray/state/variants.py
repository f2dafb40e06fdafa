"""Named output-table variants (reference
/root/reference/tables/paper_information_table.py:359-363: the same
declared schema materialized under different table names —
``paper_information``, ``paper_information_llm``, ``paper_information_qa``
etc. so gold / llm / qa outputs live side by side).

Lakehouse equivalent: one Arrow schema, one ROOT directory, one
variant-named resumable parquet dataset per name:

    <root>/<variant>/part_id=K/*.parquet  (+ _lineage manifests)

Every write validates the Dataset's schema against the declared one, so
a variant can never drift from its siblings — the property the
reference's ``tometadata(name=...)`` trick guarantees relationally.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import pyarrow as pa

from ..schema import PAPER_INFORMATION_SCHEMA, validate_schema
from .lineage import DEFAULT_NUM_PARTITIONS, write_partitioned

_VARIANT_RE = re.compile(r"^[A-Za-z][A-Za-z0-9_]*$")


def variant_path(root: str | Path, name: str) -> str:
    if not _VARIANT_RE.match(name):
        raise ValueError(f"invalid variant name {name!r} (want identifier-like)")
    return os.path.join(str(root), name)


def write_variant(
    ds,
    root: str | Path,
    name: str,
    *,
    schema: pa.Schema = PAPER_INFORMATION_SCHEMA,
    key: str = "id_paper",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    resume: bool = True,
) -> dict:
    """Resumable partitioned write of one named variant; schema-validated
    per batch so every variant under ``root`` carries the same columns."""

    def check(batch: pa.Table) -> pa.Table:
        validate_schema(batch, schema)
        return batch

    checked = ds.map_batches(check, batch_format="pyarrow")
    return write_partitioned(
        checked, variant_path(root, name), key=key,
        num_partitions=num_partitions, resume=resume,
    )


def read_variant(root: str | Path, name: str, *, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(variant_path(root, name), columns=columns)


def list_variants(root: str | Path) -> list[str]:
    """Variant names under ``root`` that have committed lineage manifests."""
    rootp = Path(root)
    if not rootp.is_dir():
        return []
    out = []
    for child in sorted(rootp.iterdir()):
        if child.is_dir() and _VARIANT_RE.match(child.name) and (child / "_lineage").is_dir():
            out.append(child.name)
    return out
