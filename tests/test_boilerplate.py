"""Density-based main-content extraction: classifier semantics on
planted markup + the corpus-level stage."""

from __future__ import annotations

import pandas as pd
import pytest

from article_extraction_ray.stages.boilerplate import (
    LINK_DENSITY_MAX,
    SHORT_BLOCK_CHARS,
    DensityExtractStage,
    classify_blocks,
    segment_blocks,
)

CONTENT = "this is a long enough paragraph of honest article prose for sure"


class TestSegmenter:
    def test_blocks_split_at_block_tags(self):
        html = f"<div><p>{CONTENT}</p><p>second {CONTENT}</p></div>"
        blocks = segment_blocks(html)
        assert [b[0] for b in blocks] == [CONTENT, f"second {CONTENT}"]

    def test_anchor_chars_counted(self):
        html = '<p>pre <a href="/x">click here</a> post</p>'
        blocks = segment_blocks(html)
        assert len(blocks) == 1
        text, anchor = blocks[0]
        assert text == "pre click here post"
        assert anchor == len("click here")

    def test_script_and_style_skipped(self):
        html = f"<script>var x=1;</script><p>{CONTENT}</p><style>.a{{}}</style>"
        blocks = segment_blocks(html)
        assert [b[0] for b in blocks] == [CONTENT]

    def test_whitespace_only_blocks_dropped(self):
        assert segment_blocks("<p>   </p><p>\n\t</p>") == []

    def test_trailing_text_flushed(self):
        blocks = segment_blocks(f"<p>{CONTENT}</p>tail words here")
        assert blocks[-1][0] == "tail words here"


class TestClassifier:
    def test_nav_is_boilerplate(self):
        html = '<nav><a href="/home">home</a> <a href="/about">about this site</a> <a href="/contact">contact the team</a></nav>'
        out = classify_blocks(segment_blocks(html))
        assert all(b["label"] == "boilerplate" for b in out)

    def test_long_prose_is_content(self):
        out = classify_blocks(segment_blocks(f"<p>{CONTENT}</p>"))
        assert [b["label"] for b in out] == ["content"]

    def test_link_density_threshold(self):
        # exactly at the bound stays content; above flips
        pad = "x" * 67
        link = "y" * 33
        html = f'<p>{pad}<a href="/z">{link}</a></p>'
        out = classify_blocks(segment_blocks(html))
        assert out[0]["link_density"] == pytest.approx(0.33)
        assert out[0]["label"] == "content"
        html2 = f'<p>{"x" * 60}<a href="/z">{"y" * 40}</a></p>'
        out2 = classify_blocks(segment_blocks(html2))
        assert out2[0]["label"] == "boilerplate"

    def test_short_block_inherits_previous_long(self):
        html = f"<p>{CONTENT}</p><p>tiny</p>"
        out = classify_blocks(segment_blocks(html))
        assert [b["label"] for b in out] == ["content", "content"]

    def test_short_block_inherits_next_when_no_previous(self):
        html = f"<p>ok</p><p>{CONTENT}</p>"
        out = classify_blocks(segment_blocks(html))
        assert [b["label"] for b in out] == ["content", "content"]

    def test_all_short_is_boilerplate(self):
        out = classify_blocks(segment_blocks("<p>a</p><p>b</p>"))
        assert [b["label"] for b in out] == ["boilerplate", "boilerplate"]

    def test_short_between_boiler_and_content(self):
        nav = '<div><a href="/a">aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa</a></div>'
        html = f"{nav}<p>mid</p><p>{CONTENT}</p>"
        out = classify_blocks(segment_blocks(html))
        # prev long neighbor (the nav) wins for the short block
        assert [b["label"] for b in out] == ["boilerplate", "boilerplate", "content"]

    def test_thresholds_are_public_constants(self):
        assert LINK_DENSITY_MAX == pytest.approx(0.33)
        assert SHORT_BLOCK_CHARS == 25


class TestStage:
    def test_synth_corpus_kills_planted_boilerplate(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.sources.synth import ensure_corpus_parquet

        corpus = ensure_corpus_parquet("/tmp/ae_corpora", 500, 42)
        ds = rd.read_parquet(str(corpus), columns=["doc_id", "spans"])
        out = ds.map_batches(
            DensityExtractStage, batch_size=64, concurrency=(1, 2), batch_format="pyarrow"
        ).to_pandas()
        assert len(out) == 500
        html_docs = out[out["n_blocks"] > 0]
        assert len(html_docs) > 100
        # every synthetic html payload is wrapped in nav/ads/footer
        # boilerplate, so stripped docs must report boiler blocks
        assert (html_docs["boiler_blocks"] > 0).mean() > 0.95
        # and the main text of content-bearing docs never contains the
        # planted nav/footer strings
        assert not out["main_text"].str.contains("tos").any()
        assert not out["main_text"].str.contains("trackPageView").any()

    def test_deterministic(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.sources.synth import ensure_corpus_parquet

        corpus = ensure_corpus_parquet("/tmp/ae_corpora", 500, 42)
        ds = rd.read_parquet(str(corpus), columns=["doc_id", "spans"])
        runs = []
        for _ in range(2):
            df = (
                ds.map_batches(
                    DensityExtractStage, batch_size=64, concurrency=(1, 2), batch_format="pyarrow"
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            runs.append(df)
        pd.testing.assert_frame_equal(runs[0], runs[1])
