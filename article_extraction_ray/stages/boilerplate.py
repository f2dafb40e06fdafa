"""Density-based main-content extraction (generic boilerplate strip).

Implements the PUBLIC block-density family of heuristics — jusText
(Pomikálek 2011) / Boilerpipe (Kohlschütter et al., WSDM 2010) style:
segment HTML into text blocks at block-level tag boundaries, score each
block by length and link density, classify CONTENT vs BOILERPLATE with
deterministic thresholds, and resolve short blocks by context
inheritance.

This is deliberately a DIFFERENT extractor from the reference-parity
``<p>``-rule in :mod:`article_extraction_ray.oracle` (which reproduces
the reference's spans bit-for-bit — tables/paper_text_table.py:86-155):
this one is the generic main-content path a crawl pipeline runs on
arbitrary pages, where nav bars / ad units / footers must go regardless
of markup shape.  Stateless per document → embarrassingly parallel;
runs as a ``map_batches`` actor-pool stage (parser machinery built once
per actor in ``__init__``).
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pandas as pd
import pyarrow as pa

#: tags that terminate a text block (block-level boundaries)
BLOCK_TAGS = frozenset(
    """p div ul ol li h1 h2 h3 h4 h5 h6 table thead tbody tr td th
    blockquote pre header footer nav aside section article main form
    br hr""".split()
)

#: content skipped entirely (never contributes text)
_SKIP_TAGS = frozenset({"script", "style"})

#: link-density above this → boilerplate (jusText's classic bound)
LINK_DENSITY_MAX = 0.33
#: blocks shorter than this (chars, stripped) are "short" and inherit
#: the label of the nearest long neighbor (prev first, then next)
SHORT_BLOCK_CHARS = 25


class _BlockSegmenter(HTMLParser):
    """One pass over a document → list of (text, anchor_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._anchor_chars = 0
        self._a_depth = 0
        self._skip_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, self._anchor_chars))
        self._buf.clear()
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._a_depth:
            self._anchor_chars += len(" ".join(data.split()))

    def close(self) -> None:  # flush the trailing block
        super().close()
        self._flush()


def segment_blocks(html: str) -> list[tuple[str, int]]:
    """HTML → [(block text, anchor chars)] in document order."""
    seg = _BlockSegmenter()
    seg.feed(html)
    seg.close()
    return seg.blocks


def classify_blocks(blocks: list[tuple[str, int]]) -> list[dict]:
    """Block features + CONTENT/BOILERPLATE labels.

    Link-dense blocks (link_density > LINK_DENSITY_MAX) are boilerplate
    at ANY length — a three-word nav bar is exactly the case the rule
    exists for.  Remaining short blocks inherit the nearest decided
    neighbor's label (previous first, next otherwise; all-undecided
    documents → boilerplate) — the deterministic simplification of
    jusText's context pass.  Remaining long blocks are content.
    """
    feats = []
    for text, anchor in blocks:
        n = len(text)
        ld = anchor / n if n else 0.0
        feats.append({"n_chars": n, "link_density": ld})
    labels: list[str | None] = []
    for f in feats:
        if f["link_density"] > LINK_DENSITY_MAX:
            labels.append("boilerplate")
        elif f["n_chars"] < SHORT_BLOCK_CHARS:
            labels.append(None)  # resolved by inheritance below
        else:
            labels.append("content")
    # inherit: previous long label wins, else the next one
    prev = "boilerplate"
    fwd: list[str] = []
    for lb in labels:
        if lb is not None:
            prev = lb
        fwd.append(prev)
    nxt = "boilerplate"
    for i in range(len(labels) - 1, -1, -1):
        if labels[i] is not None:
            nxt = labels[i]
        else:
            # previous long neighbor first (document order), else next
            labels[i] = fwd[i - 1] if i > 0 and any(x is not None for x in labels[:i]) else nxt
    out = []
    for (text, _anchor), f, lb in zip(blocks, feats, labels):
        out.append(
            {
                "text": text,
                "n_chars": f["n_chars"],
                "link_density": round(f["link_density"], 6),
                "label": lb,
            }
        )
    return out


class DensityExtractStage:
    """Actor-pool ``map_batches`` stage: interleaved-corpus batches in
    (``doc_id`` + ``spans`` list<struct{kind,text,media_ref,offset}>,
    the BASELINE input_hint shape), per-document main-content summary
    out — block counts per label, content chars, and the stripped main
    text (content blocks of every html span, document order), the shape
    a training-data pipeline ingests.  The per-document HTML parse IS
    the work (same per-payload nature as the reference-parity
    extractor); batches stay small because payloads are large."""

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        rows = []
        for did, spans in zip(ids, spans_col):
            classified: list[dict] = []
            for sp in spans:
                if sp["kind"] == "html":
                    classified.extend(classify_blocks(segment_blocks(sp["text"])))
            content = [c for c in classified if c["label"] == "content"]
            rows.append(
                {
                    "doc_id": did,
                    "n_blocks": len(classified),
                    "content_blocks": len(content),
                    "boiler_blocks": len(classified) - len(content),
                    "content_chars": int(np.sum([c["n_chars"] for c in content], dtype=np.int64)),
                    "main_text": "\n".join(c["text"] for c in content),
                }
            )
        return pd.DataFrame(rows)
