"""Exact-integer monetary aggregation helpers (round-6 discipline).

TPC-H money columns carry exactly two decimals, so per-row
`price * (1 - discount)` is an exact integer in 1e-4-dollar units:
summing those integers is order-free in any engine (raw double sums
fold in engine- and partition-order; a half-boundary ulp flakes the
rounded column — the round-6 EWMA lesson). One double division at the
end runs on bit-identical operands in Spark and DuckDB.

Decimal(38,0)/HUGEINT accumulation avoids int64 wrap (ANSI-off Spark
wraps silently at ~9e14 dollars of 1e-4 units).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def disc_revenue_sum(prefix: str = "") -> Column:
    """Spark: round(sum(price * (1-disc)), 2) in exact integer units."""
    cents = F.round(F.col(f"{prefix}l_extendedprice") * 100, 0).cast("bigint")
    disc_c = F.round(F.col(f"{prefix}l_discount") * 100, 0).cast("bigint")
    return F.round(
        F.sum((cents * (100 - disc_c)).cast("decimal(38,0)")).cast("double")
        / 10000.0,
        2,
    )


def disc_revenue_sum_sql(prefix: str = "") -> str:
    """DuckDB oracle text for the same exact-integer revenue sum."""
    return (
        f"round(CAST(sum(CAST(round({prefix}l_extendedprice * 100, 0) AS BIGINT)"
        f" * (100 - CAST(round({prefix}l_discount * 100, 0) AS BIGINT)))"
        " AS DOUBLE) / 10000.0, 2)"
    )
