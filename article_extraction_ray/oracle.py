"""Single-process oracle: the reference extractor's exact semantics.

This module is the conformance ground truth for span-sequence equality
(kind, text, media_ref, order).  It re-derives — does not copy — the
behavior of the reference's ``convert_to_txt`` stage:

- HTML paragraph extraction: capture character data inside **non-nested**
  ``<p>`` tags only (a ``<p>`` opened while already inside one is
  ignored), tag names compared case-insensitively, each paragraph
  ``strip()``-ed, empty paragraphs dropped
  (/root/reference/tables/paper_text_table.py:43-65).
- PDF: one text block per page, in page order; page texts are *not*
  stripped and empty pages are kept (the reference joins raw
  ``page.get_text()`` outputs with "\\n",
  /root/reference/tables/paper_text_table.py:68-79).  PyMuPDF is not
  available in this sandbox, so the engine defines the *pdf span payload
  contract*: pages are separated by form-feed ``"\\f"`` characters (the
  classic pdftotext page delimiter); a real PyMuPDF-backed parser slots
  in behind the same contract in production.
- txt/json: UTF-8 decode with ``errors="ignore"`` then pass-through
  (/root/reference/tables/paper_text_table.py:91-92,103-104).
- Whole-document drop rule: a document whose conversion yields a falsy
  text is skipped (/root/reference/tables/paper_text_table.py:153-155).
  In span terms: a document is kept iff extraction produced at least one
  ``kind=="text"`` output span (empty PDF-page spans count, mirroring the
  reference quirk that a multi-page PDF of empty pages joins to "\\n",
  which is truthy).
- Media spans pass through as ``(kind="media", text="", media_ref)`` at
  their original document position; they do not by themselves keep a
  document alive (the reference maps unknown/binary payloads to "" →
  dropped, /root/reference/tables/paper_text_table.py:105).
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

__all__ = [
    "OutSpan",
    "extract_html_paragraphs",
    "extract_pdf_pages",
    "extract_document_spans",
    "spans_to_text",
    "document_bytes_to_text",
]


@dataclass(frozen=True)
class OutSpan:
    kind: str
    text: str
    media_ref: str
    order: int


class _PTagCollector(HTMLParser):
    """SAX-style collector for top-level <p> paragraph text.

    Semantics mirror /root/reference/tables/paper_text_table.py:43-65:
    only the outermost <p> opens a capture buffer; nested <p> start tags
    are no-ops; the matching </p> closes capture, strips the accumulated
    data, and keeps it only when non-empty.  Character data arrives in
    multiple chunks around entities/comments and is concatenated raw.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._depth_open = False
        self._buf: list[str] = []
        self.out: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        if not self._depth_open and tag.lower() == "p":
            self._depth_open = True
            self._buf = []

    def handle_endtag(self, tag):  # noqa: ANN001
        if self._depth_open and tag.lower() == "p":
            para = "".join(self._buf).strip()
            if para:
                self.out.append(para)
            self._depth_open = False
            self._buf = []

    def handle_data(self, data):  # noqa: ANN001
        if self._depth_open:
            self._buf.append(data)


def extract_html_paragraphs(html: str) -> list[str]:
    """Paragraph texts of non-nested <p> elements, stripped, empties dropped."""
    collector = _PTagCollector()
    collector.feed(html)
    return collector.out


def extract_pdf_pages(payload: str) -> list[str]:
    """Page texts in page order; empty pages preserved.

    Pages are delimited by "\\f" per the engine's pdf span payload
    contract (see module docstring).  A zero-length payload has zero
    pages (the reference's empty PDF joins to "" → document dropped).
    """
    if payload == "":
        return []
    return payload.split("\f")


def _extract_one_span(kind: str, text: str, media_ref: str) -> list[tuple[str, str, str]]:
    """Extraction of a single input span → ordered (kind, text, media_ref) triples."""
    k = (kind or "").lower()
    if k == "html":
        return [("text", p, "") for p in extract_html_paragraphs(text)]
    if k == "pdf":
        return [("text", page, "") for page in extract_pdf_pages(text)]
    if k in ("text", "txt", "json"):
        return [("text", text, "")] if text != "" else []
    if k == "media":
        return [("media", "", media_ref or "")]
    # unknown kinds → nothing (reference maps unknown doc types to "",
    # /root/reference/tables/paper_text_table.py:105)
    return []


def extract_document_spans(spans: list[dict]) -> list[OutSpan]:
    """Full-document oracle: input spans (dicts with kind/text/media_ref/offset,
    in document order) → reconstructed output span sequence.

    Returns [] when the document should be dropped (no text spans).
    """
    ordered = sorted(spans, key=lambda s: s.get("offset", 0))
    triples: list[tuple[str, str, str]] = []
    for span in ordered:
        triples.extend(
            _extract_one_span(span.get("kind", ""), span.get("text") or "", span.get("media_ref") or "")
        )
    if not any(k == "text" for k, _, _ in triples):
        return []
    return [OutSpan(k, t, m, i) for i, (k, t, m) in enumerate(triples)]


def spans_to_text(out_spans: list[OutSpan]) -> str:
    """Doc-level text reconstruction: text-span payloads joined with "\\n".

    For a single-span document of each payload kind this equals the
    reference's ``_to_text`` output exactly
    (/root/reference/tables/paper_text_table.py:95-105): html paragraphs
    join with "\\n", pdf pages join with "\\n", txt/json pass through.
    """
    return "\n".join(s.text for s in out_spans if s.kind == "text")


def document_bytes_to_text(document_type: str, payload: bytes) -> str:
    """Byte-level parity API mirroring the reference's ``_to_text``
    (/root/reference/tables/paper_text_table.py:95-105) for html/txt/json.

    PDF bytes require PyMuPDF (absent here); callers use the pdf span
    payload contract instead.
    """
    kind = (document_type or "").lower()
    decoded = payload.decode("utf-8", errors="ignore")
    if kind == "html":
        return "\n".join(extract_html_paragraphs(decoded))
    if kind in ("txt", "json"):
        return decoded
    if kind == "pdf":
        raise NotImplementedError(
            "PyMuPDF is unavailable in this sandbox; use the '\\f'-delimited "
            "pdf span payload contract (extract_pdf_pages) instead"
        )
    return ""
