"""Curation stages (redact / decontaminate / repetition) + prefix scan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(parts)


class TestRedact:
    def test_pii_patterns_scrub_real_pii(self, ray_session):
        from article_extraction_ray.stages.curation import PII_PATTERNS, redact_patterns

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "mail me at jane.doe+x@example.co.uk today",
                    "server 192.168.001.1 then call 555-123-4567",
                    "ssn 123-45-6789 and +1 (415) 555-0000",
                    "nothing sensitive here",
                ],
            }
        )
        out = redact_patterns(_ds(df), PII_PATTERNS).to_pandas().sort_values("doc_id")
        texts = out["text"].tolist()
        assert texts[0] == "mail me at <EMAIL> today"
        assert "<IP>" in texts[1] and "<PHONE>" in texts[1]
        assert "<SSN>" in texts[2] and "<PHONE>" in texts[2]
        assert texts[3] == "nothing sensitive here"
        for t in texts[:3]:
            assert not any(ch.isdigit() for ch in t)

    def test_sequential_application(self, ray_session):
        from article_extraction_ray.stages.curation import redact_patterns

        df = pd.DataFrame({"doc_id": [0], "text": ["aaa bbb"]})
        out = redact_patterns(
            _ds(df, 1), [(r"aaa", "bbb"), (r"bbb", "ccc")]
        ).to_pandas()
        # pattern 2 sees pattern 1's output
        assert out["text"].iloc[0] == "ccc ccc"


class TestNgrams:
    def test_windows_stay_inside_rows(self):
        import pyarrow as pa

        from article_extraction_ray.stages.curation import _flat_tokens, _ngram_hashes

        col = pa.chunked_array([["a b c", "d e", "f g h i"]])
        th, off = _flat_tokens(col)
        grams, rows = _ngram_hashes(th, off, 2)
        # row0: (a b),(b c); row1: (d e); row2: 3 bigrams — never (c d) or (e f)
        assert list(rows) == [0, 0, 1, 2, 2, 2]
        th2, off2 = _flat_tokens(pa.chunked_array([["c d", "e f"]]))
        cross, _ = _ngram_hashes(th2, off2, 2)
        assert not set(cross) & set(grams)

    def test_identical_text_same_hash(self):
        import pyarrow as pa

        from article_extraction_ray.stages.curation import _flat_tokens, _ngram_hashes

        a, _ = (lambda t: _ngram_hashes(*_flat_tokens(t), 3))(pa.chunked_array([["x y z w"]]))
        b, _ = (lambda t: _ngram_hashes(*_flat_tokens(t), 3))(pa.chunked_array([["q", "x y z w"]]))
        assert set(a) <= set(b)


class TestDecontaminate:
    def test_overlap_flags(self, ray_session):
        from article_extraction_ray.stages.curation import (
            benchmark_gram_set,
            mark_contaminated,
        )

        bench = pd.DataFrame({"doc_id": [100], "text": ["alpha beta gamma delta"]})
        corpus = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "x alpha beta gamma y",  # shares the 3-gram "alpha beta gamma"
                    "alpha beta x gamma delta",  # only 2-token overlaps — clean at n=3
                    "totally unrelated words here",
                ],
            }
        )
        grams = benchmark_gram_set(_ds(bench, 1), n=3)
        out = (
            mark_contaminated(_ds(corpus), grams, n=3)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert out["contaminated"].tolist() == [True, False, False]

    def test_empty_benchmark(self, ray_session):
        from article_extraction_ray.stages.curation import mark_contaminated

        corpus = pd.DataFrame({"doc_id": [0], "text": ["a b c d"]})
        out = mark_contaminated(_ds(corpus, 1), np.empty(0, np.uint64), n=3).to_pandas()
        assert out["contaminated"].tolist() == [False]


class TestRepetition:
    def test_matches_python_reference(self, ray_session):
        from article_extraction_ray.stages.curation import repetition_stats

        rng = np.random.default_rng(7)
        vocab = ["aa", "bb", "cc", "dd"]
        texts = [
            " ".join(rng.choice(vocab, rng.integers(1, 30))) for _ in range(200)
        ]
        df = pd.DataFrame({"doc_id": np.arange(200), "text": texts})
        out = repetition_stats(_ds(df)).to_pandas().sort_values("doc_id").reset_index(drop=True)
        for i, t in enumerate(texts):
            toks = t.split(" ")
            bigrams = [(a, b) for a, b in zip(toks, toks[1:])]
            top = max([bigrams.count(g) for g in set(bigrams)], default=0)
            assert out.loc[i, "n_tok"] == len(toks)
            assert out.loc[i, "n_distinct"] == len(set(toks))
            assert out.loc[i, "distinct_ratio"] == len(set(toks)) / len(toks)
            assert out.loc[i, "top_bigram_frac"] == top * 2 / len(toks)

    def test_single_token_doc(self, ray_session):
        from article_extraction_ray.stages.curation import repetition_stats

        df = pd.DataFrame({"doc_id": [0], "text": ["solo"]})
        out = repetition_stats(_ds(df, 1)).to_pandas()
        assert out["n_tok"].iloc[0] == 1 and out["top_bigram_frac"].iloc[0] == 0.0


class TestTopKPerGroup:
    def test_matches_pandas(self, ray_session):
        from article_extraction_ray.pipelines.tabular import top_k_per_group

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 17, 1000),
                "o": rng.permutation(1000),
                "payload": rng.normal(size=1000),
            }
        )
        out = (
            top_k_per_group(_ds(df, 7), "g", "o", 5)
            .to_pandas()
            .sort_values(["g", "o"])
            .reset_index(drop=True)
        )
        expect = (
            df.sort_values(["g", "o"]).groupby("g").head(5).sort_values(["g", "o"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["g", "o", "payload"]], expect[["g", "o", "payload"]])

    def test_descending(self, ray_session):
        from article_extraction_ray.pipelines.tabular import top_k_per_group

        df = pd.DataFrame({"g": [0] * 10, "o": list(range(10))})
        out = top_k_per_group(_ds(df, 3), "g", "o", 3, descending=True).to_pandas()
        assert sorted(out["o"]) == [7, 8, 9]


class TestPrefixScan:
    def _frame(self, n=2000, groups=6, seed=11):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": rng.integers(0, groups, n).astype(str),
                "n_tok": rng.integers(1, 400, n).astype(np.int64),
            }
        )

    def test_matches_pandas_cumsum(self, ray_session):
        from article_extraction_ray.stages.scan import grouped_prefix_sum

        df = self._frame()
        out = (
            grouped_prefix_sum(
                _ds(df, 9),
                order_col="doc_id",
                group_col="source",
                value_col="n_tok",
                n_buckets=16,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expect = df.groupby("source")["n_tok"].cumsum() - df["n_tok"]
        assert np.array_equal(out["cum_before"].to_numpy(), expect.to_numpy())

    def test_layout_independent(self, ray_session):
        from article_extraction_ray.stages.scan import grouped_prefix_sum

        df = self._frame(500, seed=2)
        outs = []
        for parts in (2, 13):
            o = (
                grouped_prefix_sum(
                    _ds(df.sample(frac=1, random_state=parts), parts),
                    order_col="doc_id",
                    group_col="source",
                    value_col="n_tok",
                    n_buckets=8,
                )
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
            outs.append(o["cum_before"].to_numpy())
        assert np.array_equal(outs[0], outs[1])

    def test_pack_boundaries(self, ray_session):
        from article_extraction_ray.stages.scan import pack_sequences

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "source": ["a"] * 4,
                "n_tok": [300, 300, 300, 300],
            }
        )
        out = (
            pack_sequences(_ds(df, 2), 512, n_buckets=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["cum_before"].tolist() == [0, 300, 600, 900]
        assert out["seq_id"].tolist() == [0, 0, 1, 1]
        assert out["seq_offset"].tolist() == [0, 300, 88, 388]

    def test_max_order_hint_used(self, ray_session):
        from article_extraction_ray.stages.scan import grouped_prefix_sum

        df = self._frame(300, seed=5)
        out = (
            grouped_prefix_sum(
                _ds(df, 4),
                order_col="doc_id",
                group_col="source",
                value_col="n_tok",
                n_buckets=4,
                max_order=299,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expect = df.groupby("source")["n_tok"].cumsum() - df["n_tok"]
        assert np.array_equal(out["cum_before"].to_numpy(), expect.to_numpy())


class TestLuhnRedaction:
    def test_luhn_checksum(self):
        from article_extraction_ray.stages.curation import luhn_valid

        assert luhn_valid("4532015112830366")       # valid Visa test number
        assert luhn_valid("4532 0151 1283 0366")
        assert not luhn_valid("4532015112830367")   # off-by-one digit
        assert not luhn_valid("1234")               # too short

    def test_only_valid_cards_redacted(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from article_extraction_ray.stages.curation import redact_credit_cards

        df = pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "pay 4532015112830366 now",          # valid → redacted
                    "order 1234567890123456 shipped",    # fails Luhn → kept
                    "no digits here",
                ],
            }
        )
        out = (
            redact_credit_cards(rd.from_pandas(df))
            .to_pandas()
            .sort_values("doc_id")["text"]
            .tolist()
        )
        assert out[0] == "pay <CC> now"
        assert out[1] == "order 1234567890123456 shipped"
        assert out[2] == "no digits here"
