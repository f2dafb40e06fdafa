"""Distributed BPE training vs the single-process textbook reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

from article_extraction_ray.stages.bpe import bpe_train, bpe_train_local


def _texts():
    rng = np.random.default_rng(7)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new", "widest", "slow"]
    return [" ".join(rng.choice(vocab, rng.integers(3, 30))) for _ in range(120)]


def test_matches_reference_merges(ray_session):
    import ray.data as rd

    texts = _texts()
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    got = bpe_train(ds, num_merges=12)
    want = bpe_train_local(texts, num_merges=12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_deterministic_across_layouts(ray_session):
    import ray.data as rd

    texts = _texts()
    a = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})).repartition(2), num_merges=6)
    b = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})).repartition(9), num_merges=6)
    pd.testing.assert_frame_equal(a, b)


def test_overlapping_runs_leftmost_greedy(ray_session):
    import ray.data as rd

    # "aaaa" -> pair (a,a) merges leftmost-greedy: [aa, aa, </w>]
    texts = ["aaaa aaaa aaaa"]
    got = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})), num_merges=2)
    want = bpe_train_local(texts, num_merges=2)
    pd.testing.assert_frame_equal(got, want)
