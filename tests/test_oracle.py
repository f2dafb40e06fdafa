"""Oracle semantics vs hand-computed goldens derived from the reference
(/root/reference/tables/paper_text_table.py)."""

from __future__ import annotations

from article_extraction_ray.oracle import (
    document_bytes_to_text,
    extract_document_spans,
    extract_html_paragraphs,
    extract_pdf_pages,
    spans_to_text,
)


def _span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


class TestHtmlParagraphs:
    def test_basic(self):
        assert extract_html_paragraphs("<p>hello</p><p>world</p>") == ["hello", "world"]

    def test_nested_p_suppressed(self):
        # inner <p> open is ignored while inside one; inner </p> closes
        # the outer capture (paper_text_table.py:51-59)
        html = "<p>a <p>b</p> c</p>"
        assert extract_html_paragraphs(html) == ["a b"]

    def test_uppercase_tag(self):
        assert extract_html_paragraphs("<P>Hi</P>") == ["Hi"]

    def test_empty_paragraph_dropped(self):
        assert extract_html_paragraphs("<p>   </p><p>x</p>") == ["x"]

    def test_chunked_data_entities_comments(self):
        html = "<p>a <!-- c --> &amp; b</p>"
        assert extract_html_paragraphs(html) == ["a  & b"]

    def test_zero_paragraphs(self):
        assert extract_html_paragraphs("<div>no paras <a>x</a></div>") == []

    def test_inner_markup_stripped(self):
        assert extract_html_paragraphs("<p><b>bold</b> and <i>it</i></p>") == ["bold and it"]

    def test_strip_per_paragraph(self):
        assert extract_html_paragraphs("<p>  padded  </p>") == ["padded"]


class TestPdfPages:
    def test_pages_split_kept_in_order(self):
        assert extract_pdf_pages("p1\f\fp3") == ["p1", "", "p3"]

    def test_empty_payload_zero_pages(self):
        assert extract_pdf_pages("") == []

    def test_single_page(self):
        assert extract_pdf_pages("only") == ["only"]


class TestDocumentSpans:
    def test_interleaving_order(self):
        doc = [
            _span("text", "intro", offset=0),
            _span("media", media_ref="img://d/0", offset=1),
            _span("html", "<p>body</p>", offset=2),
        ]
        out = extract_document_spans(doc)
        assert [(s.kind, s.text, s.media_ref, s.order) for s in out] == [
            ("text", "intro", "", 0),
            ("media", "", "img://d/0", 1),
            ("text", "body", "", 2),
        ]

    def test_offset_sort(self):
        doc = [
            _span("text", "second", offset=5),
            _span("text", "first", offset=1),
        ]
        assert [s.text for s in extract_document_spans(doc)] == ["first", "second"]

    def test_media_only_doc_dropped(self):
        doc = [_span("media", media_ref="img://d/0", offset=0)]
        assert extract_document_spans(doc) == []

    def test_html_without_paragraphs_dropped(self):
        doc = [_span("html", "<div>nope</div>", offset=0)]
        assert extract_document_spans(doc) == []

    def test_empty_pdf_pages_keep_doc(self):
        # "\f" → two empty pages; reference joins to "\n" which is truthy
        # → doc kept (paper_text_table.py:78,153)
        doc = [_span("pdf", "\f", offset=0)]
        out = extract_document_spans(doc)
        assert [(s.kind, s.text) for s in out] == [("text", ""), ("text", "")]

    def test_empty_text_span_dropped(self):
        doc = [_span("text", "", offset=0), _span("text", "x", offset=1)]
        assert [s.text for s in extract_document_spans(doc)] == ["x"]

    def test_unknown_kind_ignored(self):
        doc = [_span("bin", "junk", offset=0), _span("text", "ok", offset=1)]
        assert [s.text for s in extract_document_spans(doc)] == ["ok"]


class TestDocLevelParity:
    """spans_to_text equals the reference's _to_text for one-span docs."""

    def test_html_join(self):
        doc = [_span("html", "<p>a</p><p>b</p>", offset=0)]
        assert spans_to_text(extract_document_spans(doc)) == "a\nb"

    def test_pdf_join(self):
        doc = [_span("pdf", "p1\fp2", offset=0)]
        assert spans_to_text(extract_document_spans(doc)) == "p1\np2"

    def test_bytes_api_html(self):
        raw = "<p>café</p>".encode("utf-8") + b"\xff"  # invalid tail byte ignored
        assert document_bytes_to_text("html", raw) == "café"

    def test_bytes_api_txt(self):
        assert document_bytes_to_text("txt", b"plain \xfftext") == "plain text"

    def test_bytes_api_unknown(self):
        assert document_bytes_to_text("bin", b"x") == ""
