"""Differential comparison: Spark result vs DuckDB oracle result.

Mirrors the driver's check (row-count + schema + order-insensitive
values) but with an explicit float tolerance so we catch real logic
bugs locally without tripping on summation-order noise.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # sort columns by name (driver does the same), stabilize dtypes
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            # lists/arrays → tuples so they sort & compare
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.astype(object).where(~s.isna(), None)
    return df


def _sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return df
    key = df.apply(
        lambda row: tuple(
            "\0NULL" if v is None or (isinstance(v, float) and math.isnan(v)) else str(v)
            for v in row
        ),
        axis=1,
    )
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str, rtol: float = 1e-6
) -> None:
    a = _sort_rows(_normalize(spark_pdf))
    b = _sort_rows(_normalize(oracle_pdf))
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            both_nan = np.isnan(aa) & np.isnan(bb)
            close = np.isclose(aa, bb, rtol=rtol, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                raise AssertionError(
                    f"{name}: column {c} differs at row {i}: "
                    f"spark={aa[i]!r} oracle={bb[i]!r}"
                )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                raise AssertionError(
                    f"{name}: column {c} differs at row {i}: "
                    f"spark={av.iloc[i]!r} oracle={bv.iloc[i]!r}"
                )
