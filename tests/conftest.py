"""Shared fixtures: ONE SparkSession for the whole test run (startup is
~10-13 s — per-test sessions would dominate runtime), a DuckDB connection
factory with the fixture views pre-registered (mirroring the driver's t2
harness), and the differential comparator."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from sql4pandas_spark.session import get_spark
from sql4pandas_spark.sources.parquet import TABLES

SF_SMALL = os.environ.get("S4PS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="s4ps-tests", shuffle_partitions=16)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive comparison: columns sorted by
    name, timestamps to datetime64[ns], rows sorted by every column."""
    out = pdf[sorted(pdf.columns)].copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[ns]")
        elif out[c].dtype == object:
            out[c] = out[c].map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v
            )
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, name: str = ""):
    """Row-count + column names + exact values (the driver additionally
    hash-compares — exactness here is the point)."""
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} vs {len(expected)}"
    )
    a, e = normalize(actual), normalize(expected)
    dtype_mism = [
        (c, str(a[c].dtype), str(e[c].dtype))
        for c in a.columns
        if str(a[c].dtype) != str(e[c].dtype)
    ]
    assert not dtype_mism, f"{name}: dtype mismatches (spark vs duckdb): {dtype_mism}"
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            ok = np.allclose(
                av.astype(float), ev.astype(float), rtol=0, atol=1e-9, equal_nan=True
            )
        else:
            ok = av.equals(ev)
        if not ok:
            diff = pd.DataFrame({"spark": av, "duckdb": ev})
            mism = diff[~(av.eq(ev) | (av.isna() & ev.isna()))].head(10)
            raise AssertionError(f"{name}: column '{c}' differs:\n{mism}")
