"""Deterministic float aggregation helpers.

Summing doubles is order-dependent; Spark's partial (map-side) +
final aggregation visits rows in a different order than DuckDB's
(multi-threaded) scan, so ``SUM(double)`` can differ in the last few
ulps between engines and break the driver's value-hash comparison.

Fix: cast each row's value to ``DECIMAL(38,10)`` (a deterministic
conversion) and sum exactly in decimal — order-independent — and
**return the decimal**.  Both engines expose the result as
arrow ``decimal128(38,10)`` with bit-identical values.  (Casting the
final sum back to double is NOT safe: Spark's BigDecimal.doubleValue
and DuckDB's int128→double conversion can differ by 1 ulp — observed
on the fixtures.)

Averages: the quotient must round somewhere, and decimal-division
rounding rules differ between engines, so averages are exposed as
``ROUND(CAST(dec_sum AS DOUBLE)/count, 6)`` — the two candidate
doubles differ by ≤1 ulp, which survives rounding to 6 places except
on astronomically unlikely boundary values.

At 100 TB this costs one widening per row inside codegen — decimal
aggregation is still a JVM-side hash aggregate with map-side partial
combine; no extra shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent exact SUM, exposed as DECIMAL(38,10)."""
    return F.sum(col.cast(DEC)).alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG (decimal sum / non-null count), rounded
    to 6 places as double."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), 6
    ).alias(alias)


def SQL_DSUM(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"SUM(CAST({expr} AS DECIMAL(38,10))) AS {alias}"


def SQL_DAVG(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )
