"""Eval harness (E3): JSON flattening, encoder cache, distances, stats."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from article_extraction_ray.pipelines.eval import (
    EvalEncoderStage,
    char_metrics_batch,
    expanding_means,
    load_results_json,
    score_results,
    score_summary,
)


def test_load_results_json(tmp_path):
    nested = {
        "modelA": {"year": {"true": ["2020", "2021"], "predicted": ["2020", "1999"]}},
        "modelB": {"params": {"true": ["1b"], "predicted": ["1 billion"]}},
    }
    p = tmp_path / "all_results.json"
    p.write_text(json.dumps(nested))
    t = load_results_json(str(p))
    assert t.num_rows == 3
    assert set(t.column_names) == {"model", "category", "idx", "true", "predicted"}


def test_encoder_stage_cache_and_determinism():
    stage = EvalEncoderStage()
    batch = pa.Table.from_pylist(
        [
            {"true": "alpha", "predicted": "alpha"},
            {"true": "alpha", "predicted": "beta"},
        ]
    )
    out = stage(batch)
    dists = out["cosine_distance"].to_pylist()
    assert dists[0] == pytest.approx(0.0, abs=1e-9)  # identical text → 0 distance
    assert dists[1] > 0
    assert len(stage.cache) == 2  # alpha + beta cached once


def test_real_backend_gated():
    with pytest.raises(NotImplementedError):
        EvalEncoderStage(backend="real")


def test_char_metrics_values():
    batch = pa.Table.from_pylist([{"true": "kitten", "predicted": "sitting"}])
    row = char_metrics_batch(batch).to_pylist()[0]
    assert row["levenshtein"] == 3
    assert row["norm_levenshtein"] == pytest.approx(3 / 7)
    assert 0 < row["jaro_winkler_distance"] < 1


def test_normalization_applied():
    batch = pa.Table.from_pylist([{"true": "  a  b ", "predicted": "a b"}])
    assert char_metrics_batch(batch).to_pylist()[0]["levenshtein"] == 0


def test_expanding_means():
    import pandas as pd

    df = pd.DataFrame(
        {
            "model": ["m"] * 3,
            "category": ["c"] * 3,
            "idx": [0, 1, 2],
            "dist": [1.0, 3.0, 5.0],
        }
    )
    out = expanding_means(df, "dist")
    assert out["dist_expanding_mean"].tolist() == [1.0, 2.0, 3.0]


def test_pipeline_and_summary(ray_session):
    import ray.data as rd

    rows = [
        {"model": "m", "category": "c", "idx": i, "true": f"text {i}", "predicted": f"text {i + i % 2}"}
        for i in range(20)
    ]
    scored = score_results(rd.from_items(rows))
    summary = score_summary(scored).to_pandas()
    assert len(summary) == 1
    assert summary["levenshtein_count"].iloc[0] == 20.0
    assert summary["cosine_distance_min"].iloc[0] >= 0.0
