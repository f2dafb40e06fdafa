"""Numeric/temporal parsing + coercion kernels.

Re-derived semantics from:
- suffix numerics ("175B", "1.5m"): /root/reference/tables/paper_information_table.py:651-692
  — note only 1-character suffixes (k/m/b/t) are applied; the word
  multipliers are declared there but never consulted, a quirk we keep.
- value cleaners: paper_information_table.py:371-412 (_clean_value,
  _to_float comma-strip, _to_int, _to_year via date parse).
- LLM-output coercion: paper_information_table.py:695-719.
- CSV type coercion: /root/reference/tables/other/convert.py:10-64
  (to_date/to_datetime/to_boolean/to_float/to_int).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any, Optional

__all__ = [
    "parse_numeric",
    "clean_value",
    "to_float",
    "to_int",
    "to_year",
    "to_boolean",
    "to_date",
    "coerce_value",
]

_SUFFIX = {"k": 1e3, "m": 1e6, "b": 1e9, "t": 1e12}


def parse_numeric(value: Any) -> Optional[float]:
    """"175B" → 1.75e11; comma/space stripped; k/m/b/t suffix multipliers."""
    if value is None:
        return None
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return float(value)
    if not isinstance(value, str):
        return None
    cleaned = value.strip().lower().replace(",", "").replace(" ", "")
    if not cleaned:
        return None
    mult = _SUFFIX.get(cleaned[-1:])
    if mult is not None:
        try:
            return float(cleaned[:-1]) * mult
        except ValueError:
            return None
    try:
        return float(cleaned)
    except ValueError:
        return None


def clean_value(value: Any) -> Optional[str]:
    """Strip; empty/None/NaN → None; non-strings stringified."""
    if value is None:
        return None
    if isinstance(value, str):
        stripped = value.strip()
        return stripped or None
    if isinstance(value, float) and math.isnan(value):
        return None
    return str(value)


def to_float(value: Any) -> Optional[float]:
    """Plain float parse with comma-strip; NaN → None (no suffixes —
    this is the epoch-CSV path, paper_information_table.py:387-403)."""
    if value is None:
        return None
    try:
        if isinstance(value, str):
            value = value.strip().replace(",", "")
        f = float(value)
        return None if math.isnan(f) else f
    except (TypeError, ValueError):
        return None


def to_int(value: Any) -> Optional[int]:
    f = to_float(value)
    return int(f) if f is not None else None


def to_year(value: Any) -> Optional[int]:
    """Date-ish value → calendar year (pandas-parse semantics)."""
    if value is None:
        return None
    if isinstance(value, (datetime, date)):
        return value.year
    import pandas as pd

    parsed = pd.to_datetime(value, errors="coerce")
    if pd.isna(parsed):
        return None
    return int(parsed.year)


_TRUE = {"true", "1", "yes", "y", "t"}
_FALSE = {"false", "0", "no", "n", "f"}


def to_boolean(value: Any) -> Optional[bool]:
    if value is None or (isinstance(value, float) and math.isnan(value)):
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return bool(int(value))
    s = str(value).strip().lower()
    if s in _TRUE:
        return True
    if s in _FALSE:
        return False
    return None


def to_date(value: Any) -> Optional[date]:
    if value is None:
        return None
    if isinstance(value, datetime):
        return value.date()
    if isinstance(value, date):
        return value
    import pandas as pd

    if pd.isna(value):
        return None
    parsed = pd.to_datetime(value, errors="coerce")
    if pd.isna(parsed):
        return None
    return parsed.date()


def coerce_value(value: Any, target_type: type) -> Any:
    """Coerce a raw (often LLM-emitted) value to a column's Python type;
    unparseable → None, blank strings → None."""
    if value is None:
        return None
    if isinstance(value, str):
        stripped = value.strip()
        if not stripped:
            return None
        value = stripped
    if target_type is str:
        return str(value)
    if target_type is float:
        parsed = parse_numeric(value)
        return float(parsed) if parsed is not None else None
    if target_type is int:
        parsed = parse_numeric(value)
        return int(parsed) if parsed is not None else None
    try:
        return target_type(value)
    except (TypeError, ValueError):
        return None
