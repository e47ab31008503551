"""Exact-integer decode helpers for cross-engine float determinism.

The r16 grid-average rule (CLAUDE.md float rules): aggregates of
exact-grain values (2dp money, 1e-6 score cells, 1e-9 ln cells) must
move through INTEGER units — an exact, summation-order-independent
integer sum followed by ONE FP division written identically in the
Spark expression and the DuckDB oracle — because a double avg/sum +
round/floor of a small-denominator rational lands exactly on rounding
half-boundaries, where engine round algorithms and summation order
disagree.

These helpers are the one canonical spelling of the decode step, in
both dialects. The decode `floor(x * scale + 0.5)` is safe for any
value on the 1/scale grid: true values sit mid-interval, a full 0.5
away from the floor boundary, so representation error (~ulp) can
never flip the decoded integer. Keep the two sides textually twinned
— a divergent copy is a silent cross-engine mismatch (the reason this
module exists; see also arrays._djoin / _djoin_sql for the
array-edge precedent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def units(col: Column, scale: int) -> Column:
    """Decode a value on the 1/scale decimal grid to exact BIGINT
    units: floor(col * scale + 0.5) AS LONG. `units(col, 100)` is
    money→cents; 1e6 is micro-units; 1e9 nano-units (ln cells)."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def units_sql(expr: str, scale: int) -> str:
    """The DuckDB twin of `units` — splice into oracle SQL."""
    return f"CAST(floor({expr} * {scale} + 0.5) AS BIGINT)"


def cents(col: Column) -> Column:
    """2dp money → exact BIGINT cents."""
    return units(col, 100)


def cents_sql(expr: str) -> str:
    """The DuckDB twin of `cents`."""
    return units_sql(expr, 100)


def disc_price_u4(price: Column, discount: Column) -> Column:
    """price*(1-discount) for 2dp price × 2dp discount — a TRUE 4dp
    value — as exact BIGINT 1e-4 units: cents(price)·(100−pct(disc)).
    Summing these integers is order-independent; the edge is ONE
    division by 1e4 (r18 float-edge unlock, VERDICT r17 item 3)."""
    return cents(price) * (F.lit(100) - units(discount, 100))


def disc_price_u4_sql(price: str, discount: str) -> str:
    """The DuckDB twin of `disc_price_u4`."""
    return f"{cents_sql(price)} * (100 - {units_sql(discount, 100)})"
