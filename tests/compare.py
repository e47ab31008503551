"""Differential comparison: Spark result vs DuckDB oracle result.

Two modes:

* ``strict`` (the default, driver-faithful): columns sorted by name,
  rows sorted via pandas ``sort_values`` over all columns (which raises
  ``TypeError: unhashable type`` on ARRAY/MAP cells — exactly like the
  driver's canonicalizer, so complex-typed edges fail HERE, not at the
  driver), then **exact** value equality — no float tolerance, no
  list→tuple coercion.  A query that needs tolerance is a query whose
  edge isn't deterministic enough; fix the edge (round on both sides).

* ``tolerant`` (opt-in via ``rtol``): the round-1 comparator, kept only
  for explicitly-annotated noisy aggregates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

# Queries whose oracle comparison is allowed float tolerance (must be a
# deliberate, documented exception — anything here is invisible to the
# driver's exact hash, so keep it empty unless truly unavoidable).
TOLERANT_QUERIES: dict[str, float] = {}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # sort columns by name (driver does the same), stabilize dtypes
    import datetime as _dt
    from decimal import Decimal as _Dec

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and isinstance(nn.iloc[0], (_dt.date, _dt.datetime)):
                # DuckDB returns DATE as datetime.date objects; Spark as
                # datetime64 — unify so strict equality is type-stable.
                df[c] = pd.to_datetime(s).dt.tz_localize(None)
            elif len(nn) and isinstance(nn.iloc[0], _Dec):
                df[c] = s.map(lambda v: float(v) if v is not None else None)
        elif pd.api.types.is_extension_array_dtype(s):
            df[c] = s.astype(object).where(~s.isna(), None)
    return df


def _canon_strict(df: pd.DataFrame, name: str) -> pd.DataFrame:
    """Driver-faithful canonicalization: pandas sort_values over every
    column.  Raises (like the driver) if any cell is unhashable."""
    df = _normalize(df)
    if df.empty:
        return df.reset_index(drop=True)
    try:
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    except TypeError as e:  # unhashable list/ndarray cell
        raise AssertionError(
            f"{name}: complex-typed edge column crashes driver canonicalizer: {e}"
        ) from e


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


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT


def _kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the representation class the driver's
    value hash distinguishes: int widths are interchangeable (str(5) is
    '5' for int8 and int64 alike) but int vs float is NOT (str(5) vs
    str(5.0) hash differently — bit us on math_suite's sign() edge,
    Spark DOUBLE vs DuckDB TINYINT, red in the r1 AND r4 driver windows
    while value-equality passed locally)."""
    k = s.dtype.kind
    return "i" if k in "iu" else k


def assert_frames_match_strict(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str
) -> None:
    """Exact, driver-faithful comparison — no tolerance of any kind."""
    a = _canon_strict(spark_pdf, name)
    b = _canon_strict(oracle_pdf, name)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}"
    )
    kinds_a = {c: _kind(a[c]) for c in a.columns}
    kinds_b = {c: _kind(b[c]) for c in b.columns}
    assert kinds_a == kinds_b, (
        f"{name}: dtype-kind mismatch (driver hash distinguishes int/float repr): "
        f"{ {c: (kinds_a[c], kinds_b[c]) for c in a.columns if kinds_a[c] != kinds_b[c]} }"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av = a[c].to_numpy(dtype=object)
        bv = b[c].to_numpy(dtype=object)
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if _is_null(x) and _is_null(y):
                continue
            if _is_null(x) != _is_null(y) or x != y:
                raise AssertionError(
                    f"{name}: column {c} differs (strict) at row {i}: "
                    f"spark={x!r} oracle={y!r}"
                )


def assert_frames_match_tolerant(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str, rtol: float = 1e-6
) -> None:
    """Round-1 comparator: float tolerance + list→tuple coercion.
    Only for queries in TOLERANT_QUERIES."""

    def _coerce(df: pd.DataFrame) -> pd.DataFrame:
        df = _normalize(df)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                )
        return df

    a = _sort_rows(_coerce(spark_pdf))
    b = _sort_rows(_coerce(oracle_pdf))
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


def assert_frames_match(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str, rtol: float = 1e-6
) -> None:
    """Dispatch: strict (driver-faithful) unless the query is explicitly
    annotated tolerant in TOLERANT_QUERIES."""
    if name in TOLERANT_QUERIES:
        assert_frames_match_tolerant(
            spark_pdf, oracle_pdf, name, rtol=TOLERANT_QUERIES[name]
        )
    else:
        assert_frames_match_strict(spark_pdf, oracle_pdf, name)
