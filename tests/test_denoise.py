"""Span corruption: determinism, budget, lossless reconstruction."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from article_extraction_ray.stages.denoise import MASK_FRACTION, corrupt_spans


def _reconstruct(inputs: str, targets: str) -> list[str]:
    """Splice each sentinel's target tokens back into the inputs."""
    spans: dict[str, list[str]] = {}
    cur = None
    for tok in targets.split() if targets else []:
        if re.fullmatch(r"<extra_id_\d+>", tok):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in inputs.split():
        if re.fullmatch(r"<extra_id_\d+>", tok):
            out.extend(spans[tok])
        else:
            out.append(tok)
    return out


class TestCorruptSpans:
    def test_lossless_and_budget(self):
        rng = np.random.default_rng(4)
        for doc_id in range(30):
            n = int(rng.integers(8, 300))
            tokens = [f"w{i}" for i in range(n)]
            inputs, targets, n_masked = corrupt_spans(tokens, doc_id)
            assert _reconstruct(inputs, targets) == tokens
            assert 1 <= n_masked <= max(1, round(MASK_FRACTION * n)) + 2 * 3

    def test_deterministic_per_doc(self):
        tokens = [f"w{i}" for i in range(100)]
        assert corrupt_spans(tokens, 7) == corrupt_spans(tokens, 7)
        assert corrupt_spans(tokens, 7) != corrupt_spans(tokens, 8)

    def test_sentinels_ordered(self):
        tokens = [f"w{i}" for i in range(200)]
        inputs, _, _ = corrupt_spans(tokens, 3)
        ids = [int(m.group(1)) for m in re.finditer(r"<extra_id_(\d+)>", inputs)]
        assert ids == list(range(len(ids)))


class TestSpanCorruptDistributed:
    def test_layout_independent(self, ray_session):
        import ray.data as rd

        from article_extraction_ray.stages.denoise import span_corrupt

        rng = np.random.default_rng(9)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(400),
                "text": [
                    " ".join(rng.choice(["alpha", "beta", "gamma", "delta"], rng.integers(5, 60)))
                    for _ in range(400)
                ],
            }
        )
        a = (
            span_corrupt(rd.from_pandas(df).repartition(2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            span_corrupt(rd.from_pandas(df).repartition(16))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # corpus-level mask rate lands near the target
        total = df["text"].str.split().str.len().sum()
        assert 0.08 <= a["n_masked"].sum() / total <= 0.22
