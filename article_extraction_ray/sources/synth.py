"""Deterministic synthetic interleaved text+media corpus.

Generates the flagship input table (schema.DOCUMENT_SCHEMA) described by
BASELINE.json ``input_hint`` / FIXTURES.md §F1.  Content is a pure
function of ``(seed, doc_index)`` — independent of batching, shard
layout, or parallelism — so any two runs (and the single-process oracle)
see byte-identical documents.

The generator deliberately exercises every reference edge case the
extractor must reproduce (citations into /root/reference/):

- nested ``<p>`` suppressed           (tables/paper_text_table.py:51-53)
- uppercase ``<P>`` handled           (tables/paper_text_table.py:50,55)
- empty paragraphs dropped            (tables/paper_text_table.py:57-59)
- data split across chunks by comments/entities (tables/paper_text_table.py:63-65)
- html docs with zero ``<p>`` → doc dropped     (tables/paper_text_table.py:86-87,153-155)
- pdf page order preserved, empty pages kept    (tables/paper_text_table.py:68-79)
- heavy-tailed sizes: ~0.5%% of docs are "giant" to exercise salted-key
  skew mitigation.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa

from ..schema import DOCUMENT_SCHEMA

_WORDS = (
    "model training compute data scale layer token batch gradient epoch "
    "attention transformer corpus parameter hardware cluster node shard "
    "stream spill shuffle merge sort join filter window extract span page "
    "paragraph article content media image figure table result method"
).split()

_BOILER = [
    '<nav><a href="/home">home</a> <a href="/about">about</a> <a href="/x">x</a></nav>',
    "<script>var t = 1; trackPageView();</script>",
    '<div class="ads"><a href="/buy">buy</a><a href="/now">now</a><a href="/z">z</a></div>',
    "<footer>© site — <a href='/tos'>tos</a> <a href='/priv'>privacy</a></footer>",
    "<style>.m{color:red}</style>",
]

GIANT_DOC_PROB = 0.0015
#: every MEGA_DOC_EVERY-th document is a "mega" doc (tens of MB,
#: pdf-heavy) — the true skew tail that exercises the salted-shuffle
#: reassembly path at realistic sizes
MEGA_DOC_EVERY = 20_000
#: bump when generator output changes — busts the on-disk corpus cache
GEN_VERSION = 4


def _rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence(entropy=seed, spawn_key=(idx,)))


def _sentence(rng: np.random.Generator, lo: int = 4, hi: int = 14) -> str:
    n = int(rng.integers(lo, hi))
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _html_payload(rng: np.random.Generator, idx: int, giant: bool) -> str:
    """Markup with <p> paragraphs interleaved with boilerplate + edge cases."""
    n_paras = int(rng.integers(150, 400)) if giant else int(rng.integers(0, 30))
    parts: list[str] = [_BOILER[int(rng.integers(0, len(_BOILER)))]]
    for p in range(n_paras):
        roll = int(rng.integers(0, 10))
        body = _sentence(rng, 6, 40 if giant else 20)
        if roll == 0:
            parts.append(f"<P>{body}</P>")  # uppercase tag
        elif roll == 1:
            parts.append(f"<p>{body} <p>nested {p}</p> tail-{p}</p>")  # nested <p>
        elif roll == 2:
            parts.append("<p>   </p>")  # whitespace-only paragraph → dropped
        elif roll == 3:
            parts.append(f"<p>{body} <!-- c{p} --> &amp; more {p}</p>")  # chunked data
        elif roll == 4:
            parts.append(f"<p><b>{body}</b> <a href='/r{p}'>ref</a> end</p>")
        else:
            parts.append(f"<p>{body}</p>")
        if roll == 5:
            parts.append(_BOILER[int(rng.integers(0, len(_BOILER)))])
    parts.append(_BOILER[int(rng.integers(0, len(_BOILER)))])
    return "\n".join(parts)


def _pdf_payload(rng: np.random.Generator, giant: bool) -> str:
    n_pages = int(rng.integers(60, 140)) if giant else int(rng.integers(1, 8))
    pages: list[str] = []
    for _ in range(n_pages):
        if int(rng.integers(0, 12)) == 0:
            pages.append("")  # empty page, preserved by the extractor
        else:
            n_lines = int(rng.integers(60, 160)) if giant else int(rng.integers(4, 30))
            pages.append("\n".join(_sentence(rng, 5, 12) for _ in range(n_lines)) + "\n")
    return "\f".join(pages)


def _mega_payload(rng: np.random.Generator) -> str:
    """A very large pdf payload (thousands of pages) for mega docs."""
    n_pages = int(rng.integers(1200, 1800))
    pages = []
    for _ in range(n_pages):
        n_lines = int(rng.integers(60, 120))
        pages.append("\n".join(_sentence(rng, 5, 12) for _ in range(n_lines)) + "\n")
    return "\f".join(pages)


def make_document(seed: int, idx: int) -> dict:
    """Deterministic document #idx: dict matching DOCUMENT_SCHEMA."""
    rng = _rng(seed, idx)
    doc_id = f"doc-{idx:08d}"
    if idx % MEGA_DOC_EVERY == MEGA_DOC_EVERY - 1:
        spans = [
            {"kind": "html", "text": _html_payload(rng, idx, True), "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": f"img://{doc_id}/0", "offset": 1},
            {"kind": "pdf", "text": _mega_payload(rng), "media_ref": "", "offset": 2},
            {"kind": "pdf", "text": _mega_payload(rng), "media_ref": "", "offset": 3},
            {"kind": "pdf", "text": _mega_payload(rng), "media_ref": "", "offset": 4},
        ]
        return {"doc_id": doc_id, "spans": spans, "n_bytes": sum(len(s["text"]) for s in spans)}
    giant = bool(rng.random() < GIANT_DOC_PROB)
    n_spans = int(rng.integers(6, 12)) if giant else int(rng.integers(1, 8))
    # ~2% of small docs are media-only (whole doc drops, like the
    # reference's binary docs → "" → skipped)
    media_only = (not giant) and int(rng.integers(0, 50)) == 0
    spans: list[dict] = []
    media_i = 0
    for s in range(n_spans):
        kind_roll = rng.random()
        if media_only or kind_roll < 0.15:
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"img://{doc_id}/{media_i}", "offset": s}
            )
            media_i += 1
        elif kind_roll < 0.55:
            spans.append(
                {"kind": "html", "text": _html_payload(rng, idx, giant), "media_ref": "", "offset": s}
            )
        elif kind_roll < 0.80:
            spans.append({"kind": "pdf", "text": _pdf_payload(rng, giant), "media_ref": "", "offset": s})
        else:
            text = "" if int(rng.integers(0, 15)) == 0 else _sentence(rng, 8, 30)
            spans.append({"kind": "text", "text": text, "media_ref": "", "offset": s})
    n_bytes = sum(len(sp["text"]) for sp in spans)
    return {"doc_id": doc_id, "spans": spans, "n_bytes": n_bytes}


def generate_table(seed: int, indices: "np.ndarray | list[int]") -> pa.Table:
    """Arrow table of documents for the given indices (any order/subset)."""
    docs = [make_document(seed, int(i)) for i in indices]
    return pa.Table.from_pylist(docs, schema=DOCUMENT_SCHEMA)


def corpus_dataset(num_docs: int, seed: int = 42, *, override_num_blocks: int | None = None):
    """Lazy Ray Dataset of ``num_docs`` synthetic documents.

    Uses ``ray.data.range`` → ``map_batches`` so generation itself is
    distributed; determinism holds because content is a function of the
    row index only.
    """
    import ray.data as rd

    base = rd.range(num_docs, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_table(seed, batch["id"].to_numpy())

    return base.map_batches(gen, batch_format="pyarrow", batch_size=256)


def ensure_corpus_parquet(
    root: str | os.PathLike,
    num_docs: int,
    seed: int = 42,
    *,
    shards: int | None = None,
) -> str:
    """Materialize the corpus as partitioned parquet once; reuse across runs.

    Layout: ``{root}/docs-n{num_docs}-s{seed}/`` with a ``_MANIFEST.json``
    marker written last (atomic-completion convention shared with the
    lineage writer).
    """
    out = Path(root) / f"docs-n{num_docs}-s{seed}-v{GEN_VERSION}"
    manifest = out / "_MANIFEST.json"
    if manifest.exists():
        return str(out)
    # build privately, publish with one atomic rename: a bare
    # check-then-write lets two concurrent first runs interleave their
    # differently-named shard files into ONE directory (doubled corpus)
    if shards is None:
        shards = max(1, min(256, num_docs // 500))
    out.parent.mkdir(parents=True, exist_ok=True)
    stage = Path(tempfile.mkdtemp(prefix=f"{out.name}-stage-", dir=str(out.parent)))
    ds = corpus_dataset(num_docs, seed, override_num_blocks=shards)
    ds.write_parquet(str(stage))
    digest = hashlib.md5(f"{num_docs}:{seed}".encode()).hexdigest()
    (stage / "_MANIFEST.json").write_text(
        json.dumps({"num_docs": num_docs, "seed": seed, "key": digest})
    )
    try:
        os.rename(stage, out)
    except OSError:
        # a racing builder published first; its corpus is identical
        # (deterministic seed) — discard ours
        shutil.rmtree(stage, ignore_errors=True)
        if not manifest.exists():
            raise
    return str(out)
