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


class TestEvalSinks:
    """S8 write side (reference scores.py:434-668): per-category CSVs,
    per-model aggregates, upserted summary."""

    @pytest.fixture()
    def scored(self, ray_session):
        import ray.data as rd

        rows = []
        for m in ("modelA", "modelB"):
            for cat, n in (("year", 4), ("params", 2)):
                for i in range(n):
                    rows.append(
                        {"model": m, "category": cat, "idx": i,
                         "true": f"v{i}", "predicted": f"v{i + (i % 2)}"}
                    )
        return score_results(rd.from_items(rows))

    def test_layout_and_rolling_means(self, scored, tmp_path):
        import os
        import pandas as pd

        from article_extraction_ray.pipelines.eval import write_eval_outputs

        out = tmp_path / "eval_out"
        summary = write_eval_outputs(scored, str(out))
        # layout
        assert (out / "summary.csv").exists()
        assert (out / "categories" / "modelA_year.csv").exists()
        assert (out / "categories" / "modelA_year_char.csv").exists()
        assert (out / "models" / "modelA.csv").exists()
        # per-category rolling mean is the expanding mean of the distance
        cat = pd.read_csv(out / "categories" / "modelA_year.csv")
        assert cat["rolling_mean"].tolist() == pytest.approx(
            cat["distance"].expanding().mean().tolist()
        )
        # char CSV carries every metric + rolling mean
        char = pd.read_csv(out / "categories" / "modelA_year_char.csv")
        for m in ("levenshtein", "norm_levenshtein", "jaro_winkler_distance"):
            assert m in char.columns and f"{m}_rolling_mean" in char.columns
        # model aggregate: one column per category, NaN-padded + _mean
        mod = pd.read_csv(out / "models" / "modelA.csv")
        assert {"year", "params", "year_mean", "params_mean"} <= set(mod.columns)
        assert len(mod) == 4  # padded to longest category
        assert pd.isna(mod["params"].iloc[3])
        # summary has one row per (model, category)
        assert len(summary) == 4
        assert set(summary["model"]) == {"modelA", "modelB"}

    def test_summary_upsert_no_duplicates(self, scored, tmp_path):
        from article_extraction_ray.pipelines.eval import write_eval_outputs

        out = tmp_path / "eval_out"
        s1 = write_eval_outputs(scored, str(out))
        s2 = write_eval_outputs(scored, str(out))  # rerun = update in place
        assert len(s1) == len(s2) == 4
        assert s2.duplicated(["model", "category"]).sum() == 0
