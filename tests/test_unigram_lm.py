"""Unigram-LM tokenizer trainer: distributed/driver-kernel parity,
Viterbi semantics, pruning invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from article_extraction_ray.stages.unigram_lm import (
    unigram_lm_train,
    unigram_lm_train_local,
    viterbi_segment,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick dog sleeps and the brown fox runs",
    "lazy dogs and quick foxes jump over rivers",
    "the river runs over the brown rocks",
]


class TestViterbi:
    def test_prefers_high_prob_long_piece(self):
        logp = {"a": -3.0, "b": -3.0, "ab": -1.0}
        assert viterbi_segment("ab", logp, 4) == ["ab"]

    def test_falls_back_to_chars(self):
        logp = {"a": -1.0, "b": -1.0}
        assert viterbi_segment("ab", logp, 4) == ["a", "b"]

    def test_tie_breaks_to_longest_last_piece(self):
        # "ab" as one piece scores exactly like "a"+"b"? make it so:
        # logp(ab) = logp(a)+logp(b) → tie → the longer piece wins
        logp = {"a": -1.0, "b": -1.0, "ab": -2.0}
        assert viterbi_segment("ab", logp, 4) == ["ab"]

    def test_respects_max_len(self):
        logp = {"a": -1.0, "aa": -0.1, "aaaa": -0.01}
        assert viterbi_segment("aaaa", logp, 2) == ["aa", "aa"]


class TestTrainer:
    def test_distributed_matches_local(self, ray_session):
        import ray.data as rd

        ds = rd.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(3)
        got = unigram_lm_train(ds, vocab_size=60, rounds=3, max_len=5)
        wc: dict[str, int] = {}
        for line in CORPUS:
            for w in line.split(" "):
                wc[w] = wc.get(w, 0) + 1
        want = unigram_lm_train_local(wc, vocab_size=60, rounds=3, max_len=5)
        pd.testing.assert_frame_equal(got, want)

    def test_single_chars_never_pruned(self):
        wc = {"abc": 5, "bcd": 3, "xyz": 1}
        out = unigram_lm_train_local(wc, vocab_size=5, rounds=3, max_len=3)
        pieces = set(out["piece"])
        for ch in "abcdxyz":
            assert ch in pieces

    def test_vocab_size_respected(self):
        wc = {"abcdef": 10, "abcxyz": 8, "defxyz": 6}
        out = unigram_lm_train_local(wc, vocab_size=12, rounds=4, max_len=4)
        n_chars = sum(1 for p in out["piece"] if len(p) == 1)
        assert len(out) <= max(12, n_chars)

    def test_probs_normalized(self):
        wc = {"aaa": 4, "aab": 2}
        out = unigram_lm_train_local(wc, vocab_size=8, rounds=2, max_len=3)
        assert abs(np.exp(out["logp"].to_numpy(dtype=float)).sum() - 1.0) < 1e-4

    def test_learns_frequent_substrings(self):
        wc = {"lowlow": 20, "lowest": 10, "newest": 10}
        out = unigram_lm_train_local(wc, vocab_size=14, rounds=4, max_len=4)
        assert "low" in set(out["piece"]) or "est" in set(out["piece"])


class TestEncodeStage:
    def test_memo_matches_direct_viterbi(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.state.broadcast import Broadcast
        from article_extraction_ray.stages.unigram_lm import UnigramEncodeStage

        wc: dict[str, int] = {}
        for line in CORPUS:
            for w in line.split(" "):
                wc[w] = wc.get(w, 0) + 1
        vocab = unigram_lm_train_local(wc, vocab_size=60, rounds=3, max_len=5)
        logp = dict(zip(vocab["piece"], vocab["logp"]))
        ds = rd.from_pandas(
            pd.DataFrame({"doc_id": range(len(CORPUS)), "text": CORPUS})
        ).repartition(2)
        bc = Broadcast(list(logp.items()))
        out = (
            ds.map_batches(
                UnigramEncodeStage,
                fn_constructor_args=(bc,),
                fn_constructor_kwargs={"max_len": 5},
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == len(CORPUS)
        # spot-check one doc against direct Viterbi
        want = []
        for w in CORPUS[0].split(" "):
            want.extend(viterbi_segment(w, logp, 5))
        assert out.loc[0, "n_pieces"] == len(want)
        assert out.loc[0, "pieces_preview"] == " ".join(want[:8])
        assert (out["n_pieces"] >= out["n_tokens"]).all()
