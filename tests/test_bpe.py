"""Distributed BPE training vs the single-process textbook reference."""

from __future__ import annotations

import numpy as np
import pandas as pd

from article_extraction_ray.stages.bpe import bpe_train, bpe_train_local


def _texts():
    rng = np.random.default_rng(7)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new", "widest", "slow"]
    return [" ".join(rng.choice(vocab, rng.integers(3, 30))) for _ in range(120)]


import pytest


@pytest.mark.parametrize("budget", [0, 262_144])
def test_matches_reference_merges(ray_session, budget):
    # budget=0 forces the distributed merge-sweep branch; the default
    # takes the driver-side vocab branch — both must be bit-identical
    import ray.data as rd

    texts = _texts()
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(5)
    got = bpe_train(ds, num_merges=12, driver_vocab_budget=budget)
    want = bpe_train_local(texts, num_merges=12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_deterministic_across_layouts(ray_session):
    import ray.data as rd

    texts = _texts()
    a = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})).repartition(2), num_merges=6, driver_vocab_budget=0)
    b = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})).repartition(9), num_merges=6)
    pd.testing.assert_frame_equal(a, b)


def test_overlapping_runs_leftmost_greedy(ray_session):
    import ray.data as rd

    # "aaaa" -> pair (a,a) merges leftmost-greedy: [aa, aa, </w>]
    texts = ["aaaa aaaa aaaa"]
    got = bpe_train(rd.from_pandas(pd.DataFrame({"text": texts})), num_merges=2)
    want = bpe_train_local(texts, num_merges=2)
    pd.testing.assert_frame_equal(got, want)


def test_encode_matches_local_reference(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from article_extraction_ray.stages.bpe import (
        BpeEncodeStage,
        bpe_encode_local,
        bpe_train,
    )
    from article_extraction_ray.state.broadcast import Broadcast

    texts = _texts()
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ).repartition(4)
    merges_df = bpe_train(ds, num_merges=10)
    merges = list(zip(merges_df["left"].astype(str), merges_df["right"].astype(str)))

    got = (
        ds.map_batches(
            BpeEncodeStage,
            fn_constructor_args=(Broadcast(merges),),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_tokens = bpe_encode_local(texts, merges)
    assert got["n_tokens"].tolist() == [len(t) for t in want_tokens]
    assert got["n_words"].tolist() == [len(t.split()) for t in texts]


def test_encode_stage_token_lists_bit_equal():
    # driver-side stage call (Broadcast falls back to raw value when the
    # batch runs outside Ray workers): per-word memo path vs textbook
    from article_extraction_ray.stages.bpe import (
        BpeEncodeStage,
        bpe_encode_local,
        bpe_train_local,
    )
    from article_extraction_ray.state.broadcast import Broadcast

    texts = ["low lower lowest low", "new newer newest news", "aaaa aa a"]
    merges_df = bpe_train_local(texts, num_merges=8)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    stage = BpeEncodeStage(Broadcast(merges))
    want = bpe_encode_local(texts, merges)
    for t, w in zip(texts, want):
        toks = [tok for word in t.split() for tok in stage._encode_word(word)]
        assert toks == w
        # round-trip: stripping the end marker reconstructs the text
        assert "".join(toks).replace("</w>", " ").strip() == t
