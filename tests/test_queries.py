"""Driver-shaped correctness gate: every Ray query vs its DuckDB oracle
on /root/testdata/sf0.001 — row count, column names, and sorted values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("AE_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result.reset_index(drop=True)
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')")
    return c


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), f"{name}: column mismatch"
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} vs {len(sql_df)}"
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            close = (av - bv).abs() <= (1e-9 + 1e-9 * bv.abs())
            ok = (both_nan | close).all()
        else:
            ok = av.astype(object).where(~av.isna(), None).equals(
                bv.astype(object).where(~bv.isna(), None)
            )
        assert ok, f"{name}: value mismatch in column {col}\nray:\n{a.head()}\nsql:\n{b.head()}"


def _all_query_names():
    import __ray_entry__ as entry

    return sorted(entry.oracle_sql().keys())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as entry

    ray_df = _to_pandas(entry.queries()[name](SF_DIR))
    sql_df = con.execute(entry.oracle_sql()[name]).df()
    _compare(ray_df, sql_df, name)


def _rows_only_names():
    import __ray_entry__ as entry

    return sorted(set(entry.queries()) - set(entry.oracle_sql()) - {"flagship_extract"})


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(ray_session, name):
    """Non-SQL-expressible queries: stable schema, runs end-to-end."""
    import __ray_entry__ as entry

    df = _to_pandas(entry.queries()[name](SF_DIR))
    assert len(df.columns) > 0
    assert len(df) >= 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as entry

    result = entry.entry()
    df = _to_pandas(result.limit(5))
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "spans"}
