"""Corpus I/O: Lance in production, Parquet drop-in for the sandbox.

The reference persists documents as binary blobs in SQLite
(/root/reference/tables/paper_document_table.py:22-34); this engine
reads/writes columnar tables instead.  ``read_corpus`` dispatches on the
path: a ``.lance`` dataset uses ``ray.data.read_lance`` (the documented
production path per BASELINE.json input_hint), anything else is read as
Parquet with the identical schema.  ``pylance`` is not installed in this
sandbox, so tests exercise the Parquet branch only.
"""

from __future__ import annotations

import os


def _read_blocks() -> int | None:
    """Read-task count: ~2 tasks per CPU.

    Measured on the 100k-doc corpus (fast parse kernel, 32 CPUs): the
    old 8×-CPU setting cost 2.7 s of pure per-task scheduling/object
    overhead for the same scan that 2×-CPU finishes in 0.7 s — with the
    parse kernel no longer the bottleneck, fine-grained read tasks are
    all overhead.  2× keeps enough slack for the actor pool's load
    balance; at production scale the 128 MiB target block size governs
    and this count is just a floor."""
    import ray

    try:
        if ray.is_initialized():
            return max(32, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        pass
    return None


def read_corpus(
    path: str,
    *,
    columns: list[str] | None = None,
    filter=None,
    filter_sql: str | None = None,
    override_num_blocks: int | None = None,
):
    """Lazy Dataset over an interleaved-documents table (DOCUMENT_SCHEMA).

    ``filter`` is a pyarrow dataset expression pushed into the Parquet scan
    (row-group pruning + scan-level filtering) — measured ~3× cheaper
    than a post-read ``Dataset.filter`` for selective predicates.
    ``filter_sql`` is the same predicate as a SQL string; the Lance branch
    pushes it into ``read_lance(filter=...)`` (Lance filters are strings).
    Callers that may hit the Lance path must pass both forms; a pyarrow
    ``filter`` without ``filter_sql`` raises on the Lance branch rather
    than silently scanning the full corpus.
    """
    import ray.data as rd

    # The cpus*8 heuristic suits a full-corpus scan (wide list<struct>
    # decode is CPU-bound).  A sparse read — e.g. the giant phase over a
    # handful of metadata-pruned shards — must pass its own block count:
    # the heuristic would shatter it into hundreds of near-empty blocks
    # whose per-task scheduling then dominates every downstream stage.
    blocks = override_num_blocks if override_num_blocks is not None else _read_blocks()
    if str(path).rstrip("/").endswith(".lance"):
        if filter is not None and filter_sql is None:
            raise ValueError(
                "read_corpus on a .lance path needs filter_sql (a SQL predicate "
                "string) — pyarrow expressions cannot be pushed into a Lance scan"
            )
        try:
            ds = rd.read_lance(
                path, columns=columns, filter=filter_sql, override_num_blocks=blocks
            )
        except ImportError as exc:  # pragma: no cover - no pylance in sandbox
            raise RuntimeError(
                "reading .lance requires the pylance package; re-materialize the "
                "corpus as parquet or install pylance"
            ) from exc
        return ds
    return rd.read_parquet(path, columns=columns, override_num_blocks=blocks, filter=filter)


def write_corpus(ds, path: str, **kwargs):
    """Write a Dataset as an interleaved-documents table, dispatching on
    the path like :func:`read_corpus`: ``.lance`` → ``Dataset.write_lance``
    (the production sink per BASELINE.json input_hint), else partitioned
    Parquet.  Keyword args pass through to the underlying writer.

    The two branches share one schema contract (DOCUMENT_SCHEMA): a
    corpus written by either branch must round-trip through
    ``read_corpus`` identically — pinned by tests/test_lance_contract.py
    with a fake lance backend, since ``pylance`` is absent here."""
    if str(path).rstrip("/").endswith(".lance"):
        try:
            return ds.write_lance(path, **kwargs)
        except ImportError as exc:  # pragma: no cover - no pylance in sandbox
            raise RuntimeError(
                "writing .lance requires the pylance package; write parquet "
                "instead or install pylance"
            ) from exc
    return ds.write_parquet(path, **kwargs)


def corpus_num_rows(path: str) -> int | None:
    """Row count from parquet metadata only (no data decode); None when
    the format can't answer cheaply (e.g. lance without pylance)."""
    try:
        import pyarrow.dataset as pads

        if str(path).rstrip("/").endswith(".lance"):
            return None
        return pads.dataset(path, format="parquet").count_rows()
    except Exception:
        return None


def files_with_giants(path: str, giant_bytes: int, *, column: str = "n_bytes") -> list[str]:
    """Parquet shard files whose row-group statistics admit rows with
    ``column > giant_bytes`` — a pure metadata scan (footers only, no
    data decode).  Lets the giant-doc phase read only the shards that
    can contain giants, and be skipped entirely when none can.  At
    100 TB this is the standard pruning listing a lakehouse driver does;
    files lacking statistics are conservatively included."""
    import pyarrow.dataset as pads

    out: list[str] = []
    ds = pads.dataset(path, format="parquet")
    for frag in ds.get_fragments():
        keep = False
        try:
            frag.ensure_complete_metadata()
            meta = frag.metadata
            idx = None
            for i in range(meta.num_columns):
                if meta.row_group(0).column(i).path_in_schema == column:
                    idx = i
                    break
            if idx is None:
                keep = True
            else:
                for rg in range(meta.num_row_groups):
                    stats = meta.row_group(rg).column(idx).statistics
                    if stats is None or stats.max is None or stats.max > giant_bytes:
                        keep = True
                        break
        except Exception:
            keep = True  # unknown metadata → cannot prune
        if keep:
            out.append(frag.path)
    return out


def corpus_files(path: str) -> list[str]:
    """Parquet shard files of a corpus directory (deterministic order)."""
    entries = [
        os.path.join(path, f)
        for f in sorted(os.listdir(path))
        if f.endswith(".parquet")
    ]
    if not entries:
        raise FileNotFoundError(f"no parquet shards under {path}")
    return entries
