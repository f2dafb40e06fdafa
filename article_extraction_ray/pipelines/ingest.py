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

#: minimal CSV→attribute mapping for the epoch columns this engine's
#: operators touch (the reference declares 59; the mapping mechanism is
#: identical — extend the dict to widen, tables/other/columns.py:7-72)
EPOCH_CSV_TO_ATTR = {
    "Model": "model",
    "Abstract": "abstract",
    "Approach": "approach",
    "Parameters": "parameters",
    "Training compute (FLOP)": "training_compute",
    "Training power draw (W)": "training_power_draw_w",
    "Hardware quantity": "hardware_quantity",
    "Publication date": "publication_date",
    "Country (of organization)": "country_of_organization",
    "Training hardware": "training_hardware",
    "Link": "link",
}

EPOCH_COLUMN_ORDER = ["id_paper", *EPOCH_CSV_TO_ATTR.values()]


def normalize_epoch_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Rename CSV headers to attribute names, add missing columns as NA,
    project to the declared order (reference M10,
    tables/other/split.py:12-17)."""
    df = df.rename(columns=EPOCH_CSV_TO_ATTR)
    for column in EPOCH_COLUMN_ORDER:
        if column not in df.columns:
            df[column] = pd.NA
    return df[EPOCH_COLUMN_ORDER]


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
