"""Deterministic float aggregation helpers — the oracle-parity convention.

Problem (SURVEY §2 inventory note): Spark and DuckDB sum doubles in different
orders, so ``sum(double)`` differs in the last ulps; with sums of magnitude
~1e8 the accumulated noise (~1e-6) crosses the ``round(x, 6)`` grid and the
value-hash gate flips nondeterministically.

Convention used by EVERY float aggregate in the contract — **fixed-point
micros**:

1. compute the per-row expression in DOUBLE (IEEE ops — bit-identical in
   both engines for identical inputs);
2. ``floor(x * 1e6)`` cast to LONG (floor of the identical double is
   identical; defines the value AS fixed-point micros);
3. SUM the longs — exact, order-independent, long-backed fast path in
   Spark's hash aggregate (measured ~2-4× faster than DECIMAL(38,18)
   accumulation, which falls off the codegen fast path into BigDecimal);
4. divide by 1e6 in double and ``round(_, 6)`` — the result is a grid
   point (k·1e-6), so rounding is unambiguous in both engines.

The oracle SQL mirrors the same chain (``osum``/``oavg``).

Range: |group sum| must stay below 2^63/1e6 ≈ 9.2e12 — holds through ~sf10
locally and for every contract group. ANSI mode turns an overflow into a
loud error, never silent wraparound; for extreme-scale deployments drop
MICROS to 1e4 (money is 2-decimal) or switch the handful of global sums to
DECIMAL — the helpers keep that a one-line change.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MICROS = 1_000_000

#: exact-decimal type for RUNNING (window-frame) sums, where both engines
#: must agree despite different internal association (DuckDB segment trees
#: vs Spark's running accumulation). Grouped aggregates use the faster
#: fixed-point micros path below.
DEC = "decimal(38,18)"


def _fx(c: Column) -> Column:
    """double → fixed-point micros (long)."""
    return F.floor(c * MICROS).cast("long")


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent double sum (see module doc), aliased."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(_fx(c)) / float(MICROS), 6).alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent double average, truncated to the micro grid.

    The mean is ``floor(sum_micros / n)`` micros: dividing by the count
    would otherwise land on half-grid values (x.xxxxxx5) where Spark
    (HALF_UP on the shortest decimal repr) and DuckDB (rounding the binary
    value) disagree — flooring first makes the result a grid point, where
    round(_, 6) is unambiguous in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    mean_micros = F.floor(F.sum(_fx(c)).cast("double") / F.count(c))
    return F.round(mean_micros / float(MICROS), 6).alias(alias)


def rnd(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 6).alias(alias)


# --- oracle-SQL (DuckDB) mirrors -------------------------------------------


def osum(expr: str, alias: str) -> str:
    return (
        f"round(CAST(sum(CAST(floor(({expr}) * {MICROS}) AS BIGINT)) AS DOUBLE)"
        f" / {MICROS}, 6) AS {alias}"
    )


def oavg(expr: str, alias: str) -> str:
    return (
        f"round(floor(CAST(sum(CAST(floor(({expr}) * {MICROS}) AS BIGINT)) AS DOUBLE)"
        f" / count({expr})) / {MICROS}, 6) AS {alias}"
    )


def ornd(expr: str, alias: str) -> str:
    return f"round(CAST(({expr}) AS DOUBLE), 6) AS {alias}"
