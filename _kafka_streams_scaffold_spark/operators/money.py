"""Shared decimal-money helpers (cross-engine determinism rule: money
math in fixed-precision DECIMAL, cast to DOUBLE only at the end —
see ARCHITECTURE.md Principles #4).

Decimal shapes for TPC-H-ish money columns (all 2-decimal doubles in
the driver data): price fits decimal(12,2); discount/tax in [0,1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

PRICE = "decimal(12,2)"
RATE = "decimal(3,2)"


def dec(col: str, typ: str = PRICE) -> F.Column:
    return F.col(col).cast(typ)


def one_minus(col: str) -> F.Column:
    return F.lit(1).cast(RATE) - dec(col, RATE)


def one_plus(col: str) -> F.Column:
    return F.lit(1).cast(RATE) + dec(col, RATE)
