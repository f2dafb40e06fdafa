"""E1 ingest lifecycle: epoch normalization, dim prep, gold build."""

from __future__ import annotations

import pandas as pd
import pytest

from article_extraction_ray.pipelines.ingest import (
    latest_per_country,
    normalize_epoch_frame,
    prepare_hardware_frame,
)


class TestNormalizeEpoch:
    def test_rename_pad_project(self):
        df = pd.DataFrame({"Model": ["m"], "Parameters": [5], "Extra": ["x"]})
        out = normalize_epoch_frame(df)
        assert list(out.columns)[0] == "id_paper"
        assert out["model"].iloc[0] == "m"
        assert out["parameters"].iloc[0] == 5
        assert pd.isna(out["link"].iloc[0])  # padded missing
        assert "Extra" not in out.columns  # projected away


class TestHardwarePrep:
    def test_reference_semantics(self):
        df = pd.DataFrame(
            {
                "Hardware name": [" A100 ", "B", "B", "", None],
                "Max performance": ["312", "bad", "1", "2", "3"],
                "TDP (W)": [400, -100, 250, 1, 1],
            }
        )
        out = prepare_hardware_frame(df)
        assert out["hardware"].tolist() == ["A100", "B", "None"]  # str() of None quirk tolerated
        a = out[out.hardware == "A100"].iloc[0]
        assert a["compute"] == 312.0
        assert a["power"] == pytest.approx(0.4)  # W → kW
        b = out[out.hardware == "B"].iloc[0]
        assert pd.isna(b["compute"])  # "bad" coerced, first occurrence kept
        assert b["power"] == 0.0  # negative clipped


class TestLatestPerCountry:
    def test_pick_max_year(self):
        df = pd.DataFrame(
            {
                "country": ["X", "X", "Y", "Y", "Z"],
                "year": [2000, 2020, "2010", None, 1999],
                "gco2_kwh": [1.0, 2.0, 3.0, 4.0, None],
            }
        )
        out = latest_per_country(df)
        assert out.set_index("country")["gco2_kwh"].to_dict() == {"X": 2.0, "Y": 3.0}


def test_gold_build_pipeline(ray_session):
    import ray.data as rd

    from article_extraction_ray.pipelines.ingest import build_gold_information

    epoch = rd.from_items(
        [
            {
                "id_paper": 1,
                "model": "  GPT  ",
                "abstract": None,
                "approach": "transformer",
                "parameters": "175,000",
                "training_compute": 3.1e23,
                "training_power_draw_w": "1200",
                "hardware_quantity": 64.0,
                "publication_date": "2020-05-28",
                "country_of_organization": "USA / Unspecified",
                "training_hardware": "V100",
            }
        ]
    )
    out = build_gold_information(
        epoch,
        [1, 2],
        ["United States", "China"],
        [(1, "NVIDIA A100", 312.0, 0.4), (2, "NVIDIA V100", 125.0, 0.3)],
    ).to_pandas()
    row = out.iloc[0]
    assert row["model"] == "GPT"
    assert pd.isna(row["abstract"])
    assert row["parameters"] == 175000
    assert row["year"] == 2020
    assert row["id_country"] == 1
    assert row["id_hardware"] == 2
    assert row["h_compute"] == 125.0
    assert row["power_draw"] == 1200.0
