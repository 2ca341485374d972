"""Deterministic float aggregation helpers — the oracle-parity convention.

Problem (SURVEY §2 inventory note): Spark and DuckDB sum doubles in different
orders, so ``sum(double)`` differs in the last ulps and can survive a naive
``round(x, 6)`` when the sum is large (abs error grows with magnitude).

Convention used by EVERY float aggregate in the contract:

1. compute the per-row expression in DOUBLE (IEEE ops — bit-identical in
   both engines for identical inputs);
2. cast to DECIMAL(38,18) (correctly-rounded decimal expansion of the
   double — identical in both engines);
3. SUM exactly in decimal (order-independent);
4. cast the total back to DOUBLE (correctly rounded — identical);
5. ``round(_, 6)`` as a final belt-and-braces.

The oracle SQL mirrors the same chain; see ``osum``/``oavg`` below.
Executed fully JVM-side (whole-stage codegen) — this is a correctness
convention, not a perf compromise: decimal sums are exact at any scale and
AQE still does partial aggregation map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(38,18)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double sum (see module doc), aliased."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), 6).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent double average: exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), 6).alias(alias)


def rnd(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 6).alias(alias)


# --- oracle-SQL (DuckDB) mirrors -------------------------------------------


def osum(expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,18))) AS DOUBLE), 6) AS {alias}"
    )


def oavg(expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(38,18))) AS DOUBLE)"
        f" / count({expr}), 6) AS {alias}"
    )


def ornd(expr: str, alias: str) -> str:
    return f"round(CAST(({expr}) AS DOUBLE), 6) AS {alias}"
