"""Corpus-build / ingest lifecycle (reference E1,
/root/reference/create_tables.py:10-59), Ray-Data-first.

Stages (reference file:line in each docstring):

1. dimension prep — hardware frame (M11) and latest-per-country (G1);
2. epoch normalization — rename/pad/project (M10) + typed coercion
   (tables/other/convert.py semantics via functions.numeric);
3. split assignment — exact seeded split (T3) for catalog-sized frames,
   hash-threshold split for the scale path (pipelines.tabular);
4. gold-information build — cleaners + year + fuzzy country/hardware
   broadcast lookups → PAPER_INFORMATION rows
   (tables/paper_information_table.py:74-148).

Dimension tables are driver-side pandas/pyarrow (they are ~100s of rows
in the reference; a row store is unnecessary), broadcast once; the epoch
fact side is a Dataset.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.matching import (
    build_country_index,
    build_hardware_catalog,
    select_country_id,
    select_hardware_info,
)
from ..functions.numeric import clean_value, to_float, to_int, to_year
from ..state.broadcast import Broadcast

#: the 59 epoch attributes, in the reference's declared order
#: (tables/other/columns.py:7-72).  CSV headers derive from the attribute
#: by rule — underscores→spaces, sentence case — plus the irregular
#: spellings below, so the whole mapping is the rule + its exceptions
#: rather than a 59-line restated table.
EPOCH_ATTRS = [
    "id_paper", "model", "domain", "task", "organization", "authors",
    "publication_date", "reference", "link", "citations",
    "notability_criteria", "notability_criteria_notes", "parameters",
    "parameters_notes", "training_compute", "training_compute_notes",
    "training_dataset", "training_dataset_notes",
    "training_dataset_size_datapoints", "dataset_size_notes",
    "training_time_hours", "training_time_notes", "training_hardware",
    "approach", "confidence", "abstract", "epochs", "benchmark_data",
    "model_accessibility", "country_of_organization", "base_model",
    "finetune_compute", "finetune_compute_notes", "hardware_quantity",
    "hardware_utilization_mfu", "last_modified",
    "training_cloud_compute_vendor", "training_data_center",
    "archived_links", "batch_size", "batch_size_notes",
    "organization_categorization", "foundation_model",
    "training_compute_lower_bound", "training_compute_upper_bound",
    "training_chip_hours", "training_code_accessibility",
    "accessibility_notes", "organization_categorization_from_organization",
    "possibly_over_1e23_flop", "training_compute_cost_2023_usd",
    "utilization_notes", "numerical_format", "frontier_model",
    "training_power_draw_w", "training_compute_estimation_method",
    "hugging_face_developer_id", "post_training_compute_flop",
    "post_training_compute_notes", "hardware_utilization_hfu",
]

_EPOCH_CSV_IRREGULAR = {
    "id_paper": "id_paper",
    "training_compute": "Training compute (FLOP)",
    "finetune_compute": "Finetune compute (FLOP)",
    "training_dataset_size_datapoints": "Training dataset size (datapoints)",
    "training_time_hours": "Training time (hours)",
    "hardware_utilization_mfu": "Hardware utilization (MFU)",
    "hardware_utilization_hfu": "Hardware utilization (HFU)",
    "country_of_organization": "Country (of organization)",
    "organization_categorization_from_organization": "Organization categorization (from Organization)",
    "possibly_over_1e23_flop": "Possibly over 1e23 FLOP",
    "training_compute_cost_2023_usd": "Training compute cost (2023 USD)",
    "training_power_draw_w": "Training power draw (W)",
    "training_chip_hours": "Training chip-hours",
    "hugging_face_developer_id": "Hugging Face developer id",
    "post_training_compute_flop": "Post-training compute (FLOP)",
    "post_training_compute_notes": "Post-training compute notes",
}


def _attr_to_csv(attr: str) -> str:
    return _EPOCH_CSV_IRREGULAR.get(attr, attr.replace("_", " ").capitalize())


EPOCH_CSV_TO_ATTR = {_attr_to_csv(a): a for a in EPOCH_ATTRS}
EPOCH_COLUMN_ORDER = list(EPOCH_ATTRS)

#: per-class dispatch sets (reference tables/other/columns.py:74-95);
#: attributes not listed stay strings.
EPOCH_DATE_COLUMNS = {"publication_date"}
EPOCH_DATETIME_COLUMNS = {"last_modified"}
EPOCH_INTEGER_COLUMNS = {"id_paper", "citations"}
EPOCH_FLOAT_COLUMNS = {
    "parameters", "training_compute", "training_dataset_size_datapoints",
    "training_time_hours", "epochs", "finetune_compute",
    "hardware_quantity", "hardware_utilization_mfu", "batch_size",
    "training_compute_lower_bound", "training_compute_upper_bound",
    "training_chip_hours", "training_compute_cost_2023_usd",
    "training_power_draw_w", "post_training_compute_flop",
    "hardware_utilization_hfu",
}
EPOCH_BOOLEAN_COLUMNS = {"possibly_over_1e23_flop", "frontier_model"}


def normalize_epoch_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Rename CSV headers to attribute names, add missing columns as NA,
    project to the declared order (reference M10,
    tables/other/split.py:12-17)."""
    df = df.rename(columns=EPOCH_CSV_TO_ATTR)
    for column in EPOCH_COLUMN_ORDER:
        if column not in df.columns:
            df[column] = pd.NA
    return df[EPOCH_COLUMN_ORDER]


_BOOL_TRUE = {"true", "1", "yes", "y", "t"}
_BOOL_FALSE = {"false", "0", "no", "n", "f"}


def _coerce_boolean_series(s: pd.Series) -> pd.Series:
    """Vectorized reference to_boolean (tables/other/convert.py:28-40):
    real bools pass through, numerics truthy by truncation, strings by
    the yes/no token sets, anything else → NULL."""
    if pd.api.types.is_bool_dtype(s):
        return s.astype("boolean")
    if pd.api.types.is_numeric_dtype(s):
        out = pd.Series(pd.NA, index=s.index, dtype="boolean")
        valid = s.notna()
        out[valid] = s[valid].astype(float).pipe(lambda v: v.astype("int64") != 0)
        return out
    low = s.astype("string").str.strip().str.lower()
    out = pd.Series(pd.NA, index=s.index, dtype="boolean")
    out[low.isin(_BOOL_TRUE)] = True
    out[low.isin(_BOOL_FALSE)] = False
    return out


def _to_datetime_vec(s: pd.Series, *, utc: bool = False) -> pd.Series:
    """to_date/to_datetime semantics, vectorized: one ISO8601 fast pass,
    then dateutil only for the non-null leftovers (a per-element dateutil
    fallback over the whole column is orders of magnitude slower)."""
    try:
        parsed = pd.to_datetime(s, errors="coerce", format="ISO8601", utc=utc)
    except (ValueError, TypeError):
        return pd.to_datetime(s, errors="coerce", utc=utc)
    rest = s.notna() & parsed.isna()
    if rest.any():
        import warnings

        with warnings.catch_warnings():
            # deliberate dateutil fallback — once per DISTINCT leftover
            # value, not per row (junk values repeat heavily)
            warnings.simplefilter("ignore")
            uniq = pd.Index(s[rest].unique())
            mapped = pd.Series(
                pd.to_datetime(uniq, errors="coerce", utc=utc), index=uniq
            )
            parsed.loc[rest] = s[rest].map(mapped).to_numpy()
    return parsed


def coerce_epoch_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Typed coercion of a normalized epoch frame: every column is
    dispatched on its class set and coerced with the vectorized pandas
    equivalent of the reference's scalar kernels (epoch_table.py:130-143
    dispatch; tables/other/convert.py:10-64 semantics — unparseable
    values become NULL, never raise)."""
    out = df.copy()
    for col in out.columns:
        if col in EPOCH_DATE_COLUMNS:
            out[col] = _to_datetime_vec(out[col]).dt.normalize()
        elif col in EPOCH_DATETIME_COLUMNS:
            out[col] = _to_datetime_vec(out[col], utc=True)
        elif col in EPOCH_BOOLEAN_COLUMNS:
            out[col] = _coerce_boolean_series(out[col])
        elif col in EPOCH_INTEGER_COLUMNS:
            num = pd.to_numeric(out[col], errors="coerce")
            out[col] = np.trunc(num.astype("float64")).astype("Int64")
        elif col in EPOCH_FLOAT_COLUMNS:
            out[col] = pd.to_numeric(out[col], errors="coerce").astype("float64")
        else:
            # string class: strip container types to str, keep NULLs
            vals = out[col]
            mask = vals.notna()
            coerced = vals.astype("object")
            coerced[mask] = coerced[mask].astype(str)
            out[col] = coerced
    return out


def coerce_epoch_batch(df: pd.DataFrame) -> pd.DataFrame:
    """map_batches(pandas) stage: normalize + coerce one epoch batch."""
    return coerce_epoch_frame(normalize_epoch_frame(df))


def read_epoch_csv(path: str):
    """Epoch CSV → typed Dataset: ray.data.read_csv then the
    normalize+coerce batch stage (reference EpochTable.load,
    epoch_table.py:130-166, re-expressed as a streaming transform)."""
    import ray.data as rd

    return rd.read_csv(path).map_batches(coerce_epoch_batch, batch_format="pandas")


def prepare_hardware_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Epoch hardware CSV → (hardware, compute, power) dim frame:
    project+rename, numeric coercion, TDP W→kW, drop blank names, exact
    dedupe keep-first, clip ≥0 (reference M11,
    tables/hardware_table.py:62-84)."""
    result = df[["Hardware name", "Max performance", "TDP (W)"]].copy()
    result.columns = ["hardware", "compute", "power"]
    result["hardware"] = result["hardware"].astype(str).str.strip()
    result["compute"] = pd.to_numeric(result["compute"], errors="coerce")
    result["power"] = pd.to_numeric(result["power"], errors="coerce") * 1e-3
    result = result[result["hardware"] != ""].dropna(subset=["hardware"])
    result = result.drop_duplicates(subset=["hardware"])
    result["compute"] = result["compute"].clip(lower=0)
    result["power"] = result["power"].clip(lower=0)
    return result.reset_index(drop=True)


def latest_per_country(df: pd.DataFrame) -> pd.DataFrame:
    """Per country, the emission factor of the max year; deterministic
    pre-sort; output sorted by country (reference G1,
    tables/country_table.py:61-74)."""
    df = df.dropna(subset=["gco2_kwh"])
    df = df.assign(year=pd.to_numeric(df["year"], errors="coerce"))
    df = df.dropna(subset=["year"]).copy()
    df["year"] = df["year"].astype(int)
    df = df.sort_values(["country", "year"])
    idx = df.groupby("country")["year"].idxmax()
    return df.loc[idx, ["country", "gco2_kwh"]].sort_values("country").reset_index(drop=True)


class GoldInformationStage:
    """Actor-pool batch fn: normalized epoch rows → gold
    paper-information rows (reference load_from_epoch,
    tables/paper_information_table.py:117-138): clean strings, coerce
    numerics, derive year, resolve fuzzy country + hardware ids.

    NOTE the reference quirk kept here: the gold build applies NO
    similarity threshold to the hardware match (argmax wins regardless;
    the 0.90 threshold exists only on the per-cell extraction path,
    paper_information_table.py:258).
    """

    def __init__(self, countries: Broadcast, hardware: Broadcast):
        self.countries = countries.get()
        self.hardware = hardware.get()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out: list[dict] = []
        for row in rows:
            hw_id, hw_compute, hw_power, _sim = select_hardware_info(
                row.get("training_hardware"), self.hardware
            )
            out.append(
                {
                    "id_paper": to_int(row.get("id_paper")),
                    "model": clean_value(row.get("model")),
                    "abstract": clean_value(row.get("abstract")),
                    "architecture": clean_value(row.get("approach")),
                    "parameters": to_int(row.get("parameters")),
                    "training_compute": to_float(row.get("training_compute")),
                    "power_draw": to_float(row.get("training_power_draw_w")),
                    "h_number": to_int(row.get("hardware_quantity")),
                    "year": to_year(row.get("publication_date")),
                    "id_country": select_country_id(
                        row.get("country_of_organization"), self.countries
                    ),
                    "id_hardware": hw_id,
                    "h_compute": hw_compute,
                    "h_power": hw_power,
                }
            )
        schema = pa.schema(
            [
                ("id_paper", pa.int64()),
                ("model", pa.string()),
                ("abstract", pa.string()),
                ("architecture", pa.string()),
                ("parameters", pa.int64()),
                ("training_compute", pa.float64()),
                ("power_draw", pa.float64()),
                ("h_number", pa.int64()),
                ("year", pa.int64()),
                ("id_country", pa.int64()),
                ("id_hardware", pa.int64()),
                ("h_compute", pa.float64()),
                ("h_power", pa.float64()),
            ]
        )
        return pa.Table.from_pylist(out, schema=schema)


def build_gold_information(
    epoch_ds,
    country_ids: Sequence[int],
    country_names: Sequence[str],
    hardware_rows: Sequence[tuple[int, str, Optional[float], Optional[float]]],
    *,
    concurrency=(1, 8),
):
    """Dataset of normalized epoch rows → Dataset of gold information rows."""
    countries = Broadcast(build_country_index(country_ids, country_names))
    hardware = Broadcast(
        build_hardware_catalog(
            [h[0] for h in hardware_rows],
            [h[1] for h in hardware_rows],
            [h[2] for h in hardware_rows],
            [h[3] for h in hardware_rows],
        )
    )
    return epoch_ds.map_batches(
        GoldInformationStage,
        fn_constructor_kwargs=dict(countries=countries, hardware=hardware),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
