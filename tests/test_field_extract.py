"""Field-extraction stage: windowing semantics, first-hit-wins, QA
aggregation (G3), rule extractor, per-cell coercion, hardware enrichment."""

from __future__ import annotations

import pyarrow as pa
import pytest

from article_extraction_ray.functions.matching import build_hardware_catalog
from article_extraction_ray.stages.field_extract import (
    FieldExtractionStage,
    aggregate_answers,
    dedupe_keep_best,
    extract_information,
    iter_char_windows,
    iter_token_windows,
    qa_extract,
    render_prompt,
    rule_extract_fn,
    windowed_first_hit,
)

ARTICLE = (
    "intro words here describing model GPT-X with 1.5 billion parameters "
    "trained in 2021 on 64 A100 GPUs for several weeks"
)


class TestWindows:
    def test_token_windows_non_overlapping(self):
        out = list(iter_token_windows("a b c d e", 2, 0))
        assert out == ["a b", "c d", "e"]

    def test_token_windows_stride(self):
        out = list(iter_token_windows("a b c d", 2, 1))
        assert out == ["a b", "b c", "c d"]

    def test_short_text_single_window(self):
        assert list(iter_token_windows("a b", 10, 0)) == ["a b"]
        assert list(iter_token_windows("", 10, 0)) == [""]

    def test_char_windows(self):
        assert list(iter_char_windows("abcdef", 4, 2)) == ["abcd", "cdef"]
        assert list(iter_char_windows("abc", 0, 0)) == ["abc"]

    def test_first_hit_early_exit(self):
        calls = []

        def fn(window, field):
            calls.append(window)
            return "hit" if "c" in window else ""

        out = windowed_first_hit("a b c d e f", "x", fn, window_tokens=2, stride_tokens=0)
        assert out == "hit"
        assert calls == ["a b", "c d"]  # stopped at first hit

    def test_first_hit_none(self):
        assert windowed_first_hit("a b", "x", lambda w, f: "", window_tokens=1) is None


class TestPrompt:
    def test_literal_replace(self):
        assert render_prompt("Q: {article_text}!", "body") == "Q: body!"

    def test_no_format_semantics(self):
        # braces elsewhere must survive untouched (llm.py:102-103 uses
        # str.replace, not str.format)
        assert render_prompt("{x} {article_text}", "t") == "{x} t"


class TestQA:
    def test_dedupe_keep_best(self):
        ranked = dedupe_keep_best([("a", 1.0), ("b", 3.0), ("a", 2.0)])
        assert ranked == [("b", 3.0), ("a", 2.0)]

    def test_aggregators(self):
        answers = [("short", 5.0), ("the longest answer", 1.0)]
        assert aggregate_answers(answers, "best") == "short"
        assert aggregate_answers(answers, "longest") == "the longest answer"
        assert aggregate_answers(answers, "concat") == "short the longest answer"

    def test_qa_extract_flow(self):
        def call_qa(question, chunk):
            return [("found " + question, 2.0)] if "target" in chunk else []

        out = qa_extract(
            "x" * 400 + " target " + "y" * 400,
            "model",
            call_qa,
            question_map={"model": "q1"},
            window=500,
            stride=200,
        )
        assert out == "found q1"

    def test_qa_fallback_snippet(self):
        out = qa_extract("plain text", "model", lambda q, c: [], question_map={"model": "q"})
        assert out == "plain text"  # first-200-chars fallback

    def test_qa_unmapped_field_null(self):
        assert qa_extract("text", "nope", lambda q, c: [], question_map={}) is None


class TestRuleExtractor:
    def test_fields(self):
        assert rule_extract_fn(ARTICLE, "model") == "GPT-X"
        assert rule_extract_fn(ARTICLE, "parameters") == "1.5b"
        assert rule_extract_fn(ARTICLE, "h_number") == "64"
        assert rule_extract_fn(ARTICLE, "year") == "2021"
        assert rule_extract_fn(ARTICLE, "hardware_text") == "A100"

    def test_no_match(self):
        assert rule_extract_fn("nothing here", "parameters") is None
        assert rule_extract_fn(ARTICLE, "unknown_field") is None


CATALOG = build_hardware_catalog(
    [1, 2], ["NVIDIA A100 80GB", "NVIDIA V100"], [312.0, 125.0], [0.4, 0.3]
)


class TestStage:
    def test_batch_extraction_with_enrichment(self):
        from article_extraction_ray.state.broadcast import Broadcast

        stage = FieldExtractionStage(hardware_catalog=Broadcast(CATALOG))
        batch = pa.Table.from_pylist([{"id_paper": 7, "text": ARTICLE}])
        row = stage(batch).to_pylist()[0]
        assert row["id_paper"] == 7
        assert row["model"] == "GPT-X"
        assert row["parameters"] == 1_500_000_000  # "1.5b" coerced
        assert row["h_number"] == 64
        assert row["year"] == 2021
        assert row["hardware_text"] == "A100"
        assert (row["id_hardware"], row["h_compute"], row["h_power"]) == (1, 312.0, 0.4)

    def test_empty_text_all_null(self):
        stage = FieldExtractionStage()
        row = stage(pa.Table.from_pylist([{"id_paper": 1, "text": ""}])).to_pylist()[0]
        assert all(row[f] is None for f in ("model", "parameters", "h_number", "year"))

    def test_pipeline(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"id_paper": i, "text": ARTICLE} for i in range(10)])
        out = extract_information(ds, hardware_catalog=CATALOG).to_pandas()
        assert len(out) == 10
        assert (out["parameters"] == 1_500_000_000).all()


class TestQATokenWindows:
    """Inner QA contract (reference models/qa_squad.py:90-161): token
    sub-windows, joint argmax with the ≤30-token upper-triangular mask,
    char recovery, cross-chunk dedupe-keep-best."""

    def _parts(self):
        from article_extraction_ray.stages.qa_window import (
            PatternLogitHead,
            WhitespaceTokenizer,
        )

        return WhitespaceTokenizer(model_max_length=16), PatternLogitHead()

    def test_overflow_windows_geometry(self):
        tok, _ = self._parts()
        ctx = " ".join(f"w{i}" for i in range(30))
        chunks = tok.encode("q1 q2", ctx, max_length=16, stride=4)
        # head = [CLS] q1 q2 [SEP] (4 tokens) + trailing [SEP] → 11 ctx/chunk
        assert all(len(c) <= 16 for c in chunks)
        ctx_counts = [sum(1 for s in c.seq_ids if s == 1) for c in chunks]
        assert ctx_counts[0] == 11
        # stride overlap: consecutive chunks share exactly 4 context tokens
        first = {chunks[0].offsets[t] for t, s in enumerate(chunks[0].seq_ids) if s == 1}
        second = {chunks[1].offsets[t] for t, s in enumerate(chunks[1].seq_ids) if s == 1}
        assert len(first & second) == 4
        # every context token appears in at least one chunk
        seen = set()
        for c in chunks:
            seen |= {c.offsets[t] for t, s in enumerate(c.seq_ids) if s == 1}
        assert len(seen) == 30

    def test_joint_argmax_upper_triangle_and_lmax(self):
        import numpy as np

        from article_extraction_ray.stages.qa_window import TokenChunk, best_span_in_chunk

        words = [f"t{i}" for i in range(8)]
        offs = [(i * 3, i * 3 + 2) for i in range(8)]
        chunk = TokenChunk(
            ["[CLS]", *words, "[SEP]"],
            [None, *([1] * 8), None],
            [None, *offs, None],
        )
        n = 10
        s = np.zeros(n); e = np.zeros(n)
        # decoys: huge END at ctx0 and huge START at ctx7 — the only way
        # to combine them (start ctx7, end ctx0) is inverted, so the
        # upper-triangular mask must reject the 20.0 pair
        e[1] = 10.0; s[8] = 10.0
        # best VALID pair: start@ctx1, end@ctx4 (span of 4 tokens) = 12
        s[2] = 6.0; e[5] = 6.0
        st, ed, score = best_span_in_chunk(chunk, s, e, lmax_tok=30)
        assert (st, ed) == (offs[1][0], offs[4][1])
        assert score == 12.0
        # lmax constraint: with lmax=2 the 4-token span is invalid; the
        # argmax falls to a single-token decoy span (score 10)
        st2, ed2, score2 = best_span_in_chunk(chunk, s, e, lmax_tok=2)
        assert score2 == 10.0
        assert (ed2 - st2) == 2  # one 2-char token

    def test_char_recovery_and_dedupe_keep_best(self):
        from article_extraction_ray.stages.qa_window import (
            PatternLogitHead,
            WhitespaceTokenizer,
            qa_candidates,
        )

        tok = WhitespaceTokenizer(model_max_length=12)
        head = PatternLogitHead()  # rewards digit tokens
        ctx = "alpha beta 1234 gamma delta " * 4 + "epsilon 1234 end"
        out = qa_candidates(
            "find the number?", ctx, tokenizer=tok, logit_fn=head,
            max_length=12, stride=4, n_best=3,
        )
        assert out, "expected at least one candidate"
        # the digit token wins in several overlapping chunks but dedupes
        # to ONE answer with the best score
        answers = [a for a, _ in out]
        assert answers.count("1234") == 1
        assert out[0][0] == "1234"

    def test_plugs_into_qa_extract(self):
        from article_extraction_ray.stages.field_extract import qa_extract
        from article_extraction_ray.stages.qa_window import make_qa_fn

        call_qa = make_qa_fn(max_length=32, stride=8)
        text = "the model used 2048 gpus for training on the big cluster"
        ans = qa_extract(
            text, "h_number", call_qa,
            question_map={"h_number": "how many gpus?"}, window=200, stride=100,
        )
        assert ans == "2048"
