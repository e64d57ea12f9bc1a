"""Exact money arithmetic for cross-engine parity (SURVEY §3).

Summing 2-decimal money as doubles is order-dependent: Spark and the
DuckDB oracle accumulate in different orders, drift ~1e-8, and
`round(sum, 2)` flips at a boundary every few thousand groups.
The fix: convert to exact integer cents BEFORE aggregating —
integer sums are order-independent and bit-identical everywhere —
and convert back with a plain division (exact-input, no round()).

Ratio outputs use floor-truncation instead of round(): round() on
doubles disagrees across engines at .xx5 boundaries (Spark rounds
the shortest-decimal repr via BigDecimal, DuckDB rounds the binary
value); floor of bit-identical doubles can never disagree.

Headroom: cents·e2 (the revenue e4 path) bounds at ~9e14 dollars per
group sum in int64; the e6 charge path at ~9e12. Beyond that, flip
``set_decimal_mode(True)`` — the accumulator becomes DECIMAL(38,0)
(~1e34 dollars of headroom), same plan shape, same results below the
boundary. The same switch widens every Σx² accumulator (``sum_sq``:
variance windows, HHI, CUSUM) BEFORE the square, so the statistical
detectors hold unbounded at any plausible SF instead of failing loud
at their int64 ceilings (sf30-300, BASELINE.md R5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# When True, integer-unit accumulators are widened to DECIMAL(38,0)
# BEFORE the sum. int64 is the default: a long adder inside
# whole-stage codegen beats Decimal128 by ~30% on the scan-agg path,
# and the e4 path only overflows past ~9e14 dollars PER GROUP
# (≈ TPC-H sf50k for q1's biggest group) — flip this when group sums
# approach that boundary. Results are bit-identical below it (integer
# sums are exact in both representations; the final /scale division
# happens in double either way).
_DECIMAL_MODE = False


def set_decimal_mode(enabled: bool) -> None:
    """Widen money accumulators to DECIMAL(38,0) (see _DECIMAL_MODE).
    Affects sum_money / sum_revenue_e4 / sum_charge_e6 globally —
    set once at session start, not per-query."""
    global _DECIMAL_MODE
    _DECIMAL_MODE = bool(enabled)


def decimal_mode() -> bool:
    return _DECIMAL_MODE


def _acc(col: Column) -> Column:
    """Accumulator widening point: every money sum funnels its per-row
    integer term through here."""
    return col.cast("decimal(38,0)") if _DECIMAL_MODE else col


def acc(col: Column) -> Column:
    """Public widening funnel for integer accumulators outside the
    money helpers (linear sums whose grand total can approach int64)."""
    return _acc(col)


def sum_sq(col: Column) -> Column:
    """Σx² accumulator with the decimal-mode widening applied BEFORE
    the square: in decimal mode neither the per-row product nor the
    running sum can overflow (x² stays exact to x ~ 1e19, far past
    any plausible scale); in int64 mode the per-row product holds to
    x ~ 3e9 and the 31-term windowed sum to ~5.4e8 per term — the
    statistical detectors' documented sf-headroom. Use for every
    sum-of-squares (variance/z-score/HHI/CUSUM) accumulator; DuckDB
    oracles need no change (its BIGINT sums widen to HUGEINT
    natively), only their CAST(... AS BIGINT) wrappers bound them.

    Returns an un-windowed aggregate Column — call ``.over(w)`` for
    windowed forms."""
    t = _acc(col)
    return F.sum(t * t)


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal money column.
    DuckDB twin: CAST(round(x * 100) AS BIGINT)."""
    return F.round(col * 100, 0).cast("bigint")


def sum_money(col: Column) -> Column:
    """Exact sum of a 2-decimal money column, as dollars (double).
    DuckDB twin: sum(CAST(round(x*100) AS BIGINT)) / 100.0"""
    return (F.sum(_acc(cents(col))) / 100.0).cast("double")


def sum_revenue_e4(price: Column, discount: Column) -> Column:
    """Exact sum of price·(1-discount) — both 2-decimal — as dollars.
    Per-row term: cents(price)·(100 - cents(discount)) is an exact
    e4-scaled integer. DuckDB twin:
    sum(CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100) AS BIGINT))) / 10000.0
    """
    return (F.sum(_acc(cents(price) * (100 - cents(discount))))
            / 10000.0).cast("double")


def sum_charge_e6(price: Column, discount: Column, tax: Column) -> Column:
    """Exact sum of price·(1-discount)·(1+tax), as dollars (e6 ints).
    DuckDB twin: sum(... * (100 - ...) * (100 + ...)) / 1000000.0"""
    return (F.sum(_acc(cents(price) * (100 - cents(discount))
                       * (100 + cents(tax)))) / 1e6).cast("double")


def trunc(col: Column, places: int = 4) -> Column:
    """Floor-truncation at ``places`` decimals — deterministic across
    engines for bit-identical inputs (round() is not, at ties).
    DuckDB twin: floor(x * 1e{places}) / 1e{places}."""
    scale = float(10 ** places)
    return F.floor(col * scale) / scale


# DuckDB SQL fragment builders (keep the twins next to the exprs)

def sql_cents(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


def sql_sum_money(expr: str) -> str:
    return f"(sum({sql_cents(expr)}) / 100.0)"


def sql_sum_revenue(price: str, discount: str) -> str:
    return (f"(sum({sql_cents(price)} * (100 - {sql_cents(discount)}))"
            f" / 10000.0)")


def sql_sum_charge(price: str, discount: str, tax: str) -> str:
    return (f"(sum({sql_cents(price)} * (100 - {sql_cents(discount)})"
            f" * (100 + {sql_cents(tax)})) / 1000000.0)")


def sql_trunc(expr: str, places: int = 4) -> str:
    scale = float(10 ** places)
    return f"(floor(({expr}) * {scale}) / {scale})"
