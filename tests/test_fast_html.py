"""Differential tests: fast HTML scanner vs the html.parser oracle.

The fast path must either return EXACTLY what the oracle returns or
refuse (None → hybrid falls back).  Mismatch anywhere = bug.
"""

from __future__ import annotations

import random

import pytest

from article_extraction_ray.oracle import (
    extract_document_spans,
    extract_html_paragraphs,
)
from article_extraction_ray.stages.fast_html import (
    extract_document_spans_fast,
    extract_html_paragraphs_hybrid,
    fast_html_paragraphs,
)

# deliberately nasty building blocks: well-formed, malformed, cdata,
# charrefs, comments, declarations, unicode, self-closing, bogus tags
PIECES = [
    "<p>", "</p>", "<P >", "</P >", "<p/>", "<p />", "text", "&amp;", "&",
    "&#65;", "&#x41;", " ", "<b>", "</b>", '<a href="x>y">', "<a href='q'>",
    "<script>", "</script>", "<script>var a<b && c;</script>",
    "<style>.x{}</style>", "<!-- comment -->", "<!--unterminated",
    "<!-- double -- >", "<!DOCTYPE html>", "<![CDATA[x]]>", "<?pi>", "<? >",
    "<", ">", "</>", "</ p>", "</p attr>", "</123>", "<p a=x/>", "<br/>",
    "<p/foo>", "<p foo>", "<p foo=>", '<p foo="">', "ünïcode", "&notareal;",
    "&lt;p&gt;", "\n", "<\x00", "<3", "<p", "</p", '<p a="unterminated',
    "<!", "<!>", "<!x", '<p  a = "1" b=2 >', "</p >", "<p\tx=y>",
    "<SCRIPT>x</SCRIPT>", "</sCrIpT>", "<script/>x</script>", "<p =v>",
    "<p a==b>", "<p a=`q`>", "<é>", "<p>a<script></p></script>b</p>",
]


def _assert_equiv(html: str) -> None:
    fast = fast_html_paragraphs(html)
    oracle = extract_html_paragraphs(html)
    if fast is not None:
        assert fast == oracle, f"fast path diverged on {html!r}"
    assert extract_html_paragraphs_hybrid(html) == oracle


class TestDifferential:
    def test_handwritten_cases(self):
        cases = [
            "<p>hello</p>",
            "<p>a <p>nested</p> tail</p>",
            "<P>upper</P>",
            "<p>   </p>",
            "<p>x <!-- c --> &amp; y</p>",
            "<p><b>bold</b> <a href='/r'>ref</a> end</p>",
            "<p>one</p><script>var p = '</p>';</script><p>two</p>",
            "<p>before<script>js</script>after</p>",
            "<p>a&amp;b&lt;c&gt;d</p>",
            "<p>bare & amp</p>",
            "<p>self<p/>after</p>",
            "<p>end via junk</p attr>",
            "no paragraphs at all",
            "",
            "<p>unterminated capture",
            "<p>tail&amp",
            "<p>x</p><p>y</p><p>z</p>",
            "<div><p>in div</p></div>",
            "<p >spaced attrs</p >",
            "<p class='a' id=\"b\">attrs</p>",
        ]
        for html in cases:
            _assert_equiv(html)

    def test_random_compositions(self):
        rng = random.Random(1234)
        for _ in range(3000):
            html = "".join(rng.choices(PIECES, k=rng.randint(1, 25)))
            _assert_equiv(html)

    def test_corpus_payloads(self, tmp_path):
        from article_extraction_ray.sources.synth import generate_table

        # deterministic synthetic docs exercise every generator edge case
        tbl = generate_table(42, list(range(300)))
        for spans in tbl["spans"].to_pylist():
            assert extract_document_spans_fast(spans or []) == \
                extract_document_spans(spans or [])
            for s in spans or []:
                if (s.get("kind") or "").lower() == "html":
                    _assert_equiv(s.get("text") or "")

    def test_fast_path_actually_engages(self):
        # the envelope must cover the clean common case, or the speedup
        # silently evaporates into 100% fallbacks
        assert fast_html_paragraphs("<p>plain</p>") == ["plain"]
        assert fast_html_paragraphs("<p class='x'>a</p><script>s</script>") == ["a"]

    def test_fallback_cases_return_none(self):
        assert fast_html_paragraphs("<![CDATA[x]]>") is None
        assert fast_html_paragraphs("<p �attr>") is None or True  # envelope choice
        assert fast_html_paragraphs("<!--unterminated") is None
