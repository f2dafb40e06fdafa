"""Text-analysis stage goldens: langid, quality, token counts, fingerprints."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from article_extraction_ray.stages.text_stats import (
    LangIdStage,
    content_fingerprint_batch,
    quality_batch,
    token_count_batch,
    winnow_batch,
    winnow_fingerprints,
)


def _tbl(rows):
    return pa.Table.from_pylist(rows)


class TestLangId:
    def test_obvious_languages(self):
        stage = LangIdStage()
        assert stage.classify("the cat sat on the mat and it was happy") == "en"
        assert stage.classify("el perro es grande y no come nada de eso") == "es"
        assert stage.classify("le chat est dans la maison avec les enfants") == "fr"
        assert stage.classify("der Hund ist in dem Haus und die Katze auch") == "de"

    def test_undetermined(self):
        stage = LangIdStage()
        assert stage.classify("") == "und"
        assert stage.classify("zzz qqq xxx") == "und"

    def test_batch_shape(self):
        stage = LangIdStage()
        out = stage(_tbl([{"doc_id": 1, "text": "the of and to in"}]))
        assert out.column_names == ["doc_id", "lang_pred"]
        assert out["lang_pred"][0].as_py() == "en"


class TestQuality:
    def test_signals(self):
        out = quality_batch(_tbl([{"doc_id": 1, "text": "the model trains on the data"}]))
        row = out.to_pylist()[0]
        assert row["n_tokens"] == 6
        assert 0 < row["quality_score"] <= 1
        assert row["alpha_ratio"] == 1.0
        assert row["stop_ratio"] > 0

    def test_empty(self):
        row = quality_batch(_tbl([{"doc_id": 1, "text": ""}])).to_pylist()[0]
        assert row["n_tokens"] == 0
        assert row["quality_score"] == 0.0


class TestTokens:
    def test_counts(self):
        row = token_count_batch(_tbl([{"doc_id": 1, "text": "hello, world! x"}])).to_pylist()[0]
        assert row["n_tokens_ws"] == 3
        # hello , world ! x
        assert row["n_tokens_bpe"] == 5


class TestFingerprints:
    def test_md5_normalization(self):
        row = content_fingerprint_batch(
            _tbl([{"doc_id": 1, "text": "  A   b\tC  "}])
        ).to_pylist()[0]
        assert row["fingerprint"] == hashlib.md5(b"a b c").hexdigest()

    def test_winnow_deterministic_and_robust(self):
        a = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
        b = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
        assert a == b and len(a) > 0
        # whitespace/case normalization built in
        c = winnow_fingerprints("THE  quick   Brown fox jumps over the lazy dog")
        assert c == a

    def test_winnow_short_text(self):
        assert winnow_fingerprints("ab") == []
        assert len(winnow_fingerprints("abcdef")) == 1

    def test_winnow_batch_schema(self):
        out = winnow_batch(_tbl([{"doc_id": 1, "text": "some longer piece of text here"}]))
        assert out.column_names == ["doc_id", "winnow_fps"]
        assert len(out["winnow_fps"][0].as_py()) >= 1
