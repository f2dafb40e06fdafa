"""Derived physics columns, vectorized (reference M13).

Re-derived semantics from
/root/reference/tables/paper_information_table.py:275-354
(``complete_informations``), constants from /root/reference/config.py:8-9:

- ``training_time_hours`` (when null): training_compute /
  (h_number · h_compute · 1e12 · MFU) / 3600, guarded by >0 checks;
- ``energy_kwh``: (power_draw/1000) · hours · PUE when power_draw>0,
  else (h_power · h_number) · hours · PUE when h_power>0 and h_number>0;
- ``co2eq`` (when null): energy_kwh · (gco2_kwh/1000) via the country
  emission-factor lookup (broadcast dict, reference J5).

The reference iterates rows and upserts per cell; here the whole
derivation is a single vectorized numpy pass inside ``map_batches``.
"""

from __future__ import annotations

import numpy as np

DEFAULT_PUE = 1.20
DEFAULT_MFU = 0.30

__all__ = ["derive_physics_arrays", "DEFAULT_PUE", "DEFAULT_MFU"]


def _nan_to_none_mask(x: np.ndarray) -> np.ndarray:
    return ~np.isnan(x)


def derive_physics_arrays(
    training_compute: np.ndarray,
    h_compute: np.ndarray,
    h_number: np.ndarray,
    training_time_hours: np.ndarray,
    power_draw: np.ndarray,
    h_power: np.ndarray,
    co2eq: np.ndarray,
    gco2_kwh: np.ndarray,
    *,
    pue: float = DEFAULT_PUE,
    mfu: float = DEFAULT_MFU,
) -> dict[str, np.ndarray]:
    """All inputs are float64 arrays with NaN for null.  Returns
    {"training_time_hours", "energy_kwh", "co2eq"} float64 arrays
    (NaN = still null)."""
    tc = np.asarray(training_compute, dtype=np.float64)
    hc = np.asarray(h_compute, dtype=np.float64)
    hn = np.asarray(h_number, dtype=np.float64)
    tth = np.asarray(training_time_hours, dtype=np.float64).copy()
    pd_ = np.asarray(power_draw, dtype=np.float64)
    hp = np.asarray(h_power, dtype=np.float64)
    co2 = np.asarray(co2eq, dtype=np.float64).copy()
    gco2 = np.asarray(gco2_kwh, dtype=np.float64)

    with np.errstate(invalid="ignore", divide="ignore"):
        denom = hn * hc * 1e12 * mfu
        derivable = (
            np.isnan(tth)
            & _nan_to_none_mask(tc) & (tc > 0)
            & _nan_to_none_mask(hc) & (hc > 0)
            & _nan_to_none_mask(hn) & (hn > 0)
            & (mfu > 0)
            & (denom > 0)
        )
        derived_hours = tc / denom / 3600.0
        tth = np.where(derivable, derived_hours, tth)

        hours_ok = _nan_to_none_mask(tth) & (tth > 0)
        use_pd = hours_ok & _nan_to_none_mask(pd_) & (pd_ > 0)
        use_hp = (
            hours_ok
            & ~use_pd
            & _nan_to_none_mask(hp) & (hp > 0)
            & _nan_to_none_mask(hn) & (hn > 0)
        )
        energy = np.full_like(tth, np.nan)
        energy = np.where(use_pd, (pd_ / 1000.0) * tth * pue, energy)
        energy = np.where(use_hp, (hp * hn) * tth * pue, energy)

        can_co2 = (
            np.isnan(co2)
            & _nan_to_none_mask(energy)
            & _nan_to_none_mask(gco2) & (gco2 >= 0)
        )
        co2 = np.where(can_co2, energy * (gco2 / 1000.0), co2)

    return {"training_time_hours": tth, "energy_kwh": energy, "co2eq": co2}
