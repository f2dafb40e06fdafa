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


class TestEpochCoercion:
    """Full 59-column mapping + class-dispatch coercion
    (reference tables/other/columns.py:7-95, convert.py:10-64)."""

    def test_mapping_shape_and_spot_values(self):
        from article_extraction_ray.pipelines.ingest import (
            EPOCH_ATTRS,
            EPOCH_BOOLEAN_COLUMNS,
            EPOCH_CSV_TO_ATTR,
            EPOCH_DATE_COLUMNS,
            EPOCH_FLOAT_COLUMNS,
            EPOCH_INTEGER_COLUMNS,
        )

        assert len(EPOCH_ATTRS) == 60  # 59 CSV columns + id_paper
        assert len(EPOCH_CSV_TO_ATTR) == 60
        # rule-derived
        assert EPOCH_CSV_TO_ATTR["Publication date"] == "publication_date"
        assert EPOCH_CSV_TO_ATTR["Notability criteria notes"] == "notability_criteria_notes"
        # irregulars
        assert EPOCH_CSV_TO_ATTR["Training compute (FLOP)"] == "training_compute"
        assert EPOCH_CSV_TO_ATTR["Country (of organization)"] == "country_of_organization"
        assert EPOCH_CSV_TO_ATTR["Possibly over 1e23 FLOP"] == "possibly_over_1e23_flop"
        assert EPOCH_CSV_TO_ATTR["Training chip-hours"] == "training_chip_hours"
        assert (
            EPOCH_CSV_TO_ATTR["Organization categorization (from Organization)"]
            == "organization_categorization_from_organization"
        )
        # class sets match the reference's counts
        assert EPOCH_DATE_COLUMNS == {"publication_date"}
        assert EPOCH_INTEGER_COLUMNS == {"id_paper", "citations"}
        assert len(EPOCH_FLOAT_COLUMNS) == 16
        assert EPOCH_BOOLEAN_COLUMNS == {"possibly_over_1e23_flop", "frontier_model"}

    def test_class_dispatch_semantics(self):
        from article_extraction_ray.pipelines.ingest import coerce_epoch_batch

        df = pd.DataFrame(
            {
                "id_paper": ["3", "x", "7"],
                "Publication date": ["2024-05-03", "junk", None],
                "Last modified": ["2024-05-03T10:11:12", "nope", "2023-01-01 00:00:00"],
                "Citations": ["12", "N/A", "0"],
                "Training compute (FLOP)": ["1e21", "", "2.5"],
                "Frontier model": ["true", "maybe", "NO"],
                "Possibly over 1e23 FLOP": [1.0, 0.0, None],
                "Model": ["m", None, 3],
            }
        )
        out = coerce_epoch_batch(df)
        assert list(out.columns)[0] == "id_paper"
        assert len(out.columns) == 60
        assert out["id_paper"].tolist() == [3, pd.NA, 7]
        assert out["publication_date"].iloc[0] == pd.Timestamp("2024-05-03")
        assert pd.isna(out["publication_date"].iloc[1])
        assert out["last_modified"].iloc[2] == pd.Timestamp("2023-01-01", tz="UTC")
        assert out["citations"].tolist() == [12, pd.NA, 0]
        assert out["training_compute"].iloc[0] == 1e21
        assert pd.isna(out["training_compute"].iloc[1])
        assert out["frontier_model"].tolist() == [True, pd.NA, False]
        assert out["possibly_over_1e23_flop"].tolist() == [True, False, pd.NA]
        # string class: non-strings coerced to str, NULLs kept
        assert out["model"].tolist() == ["m", None, "3"]
        # padded column exists and is all-NA but correctly typed
        assert out["batch_size"].isna().all()

    def test_boolean_numeric_truthiness(self):
        from article_extraction_ray.pipelines.ingest import _coerce_boolean_series

        s = pd.Series([2.7, 0.4, -1.0, None])
        out = _coerce_boolean_series(s)
        # reference to_boolean: bool(int(v)) — truncation, not rounding
        assert out.tolist() == [True, False, True, pd.NA]
