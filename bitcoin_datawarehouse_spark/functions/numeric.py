"""Deterministic float aggregation helpers.

Summing doubles is order-dependent; Spark's partial (map-side) +
final aggregation visits rows in a different order than DuckDB's
(multi-threaded) scan, so ``SUM(double)`` can differ in the last few
ulps between engines and break the driver's value-hash comparison.

Fix: cast each row's value to ``DECIMAL(38,10)`` and sum exactly in
decimal — order-independent.  The per-row cast itself must agree
across engines: Spark casts via the double's shortest decimal repr,
DuckDB's direct cast via the binary value — they diverge for
|value| ≳ 1e8, so every oracle-side cast goes through
:func:`SQL_DEC`'s string route (see its docstring for the
hypothesis-found counterexample).  The
*exposed* column is NOT the decimal (decimal128 canonicalization —
trailing-zero scale / string repr — differs between engine/driver
hashers even when the values are numerically equal; this was the
single cause of the 13 persistent driver hash-fails in rounds 1-2).
Instead the final surface is an engine-neutral DOUBLE produced by a
fully deterministic chain:

    decimal sum  --ROUND(2, half-away-from-zero)-->  DECIMAL(p,2)
                 --CAST-->  DOUBLE

* The decimal round is exact integer arithmetic and both engines
  round ties away from zero (Spark ``round`` = HALF_UP; DuckDB
  decimal ``ROUND`` verified half-away-from-zero), so both produce
  the identical 2-dp decimal.
* DECIMAL(p,2) → DOUBLE is correctly rounded in both engines as long
  as the value in cents fits in 2^53 (~90 trillion dollars) — far
  beyond any fixture or realistic aggregate.

(Rounding the DOUBLE instead — ``ROUND(CAST(sum AS DOUBLE), 2)`` —
is NOT safe: Spark rounds the double's shortest decimal repr while
the exact sum can sit on a ``.XX50`` half-way boundary, which for
4/6-dp money products happens ~1% of the time.)

Averages: the quotient must round somewhere, and decimal-division
rounding rules differ between engines, so averages are exposed as
``ROUND(CAST(dec_sum AS DOUBLE)/count, 6)`` — the two candidate
doubles differ by ≤1 ulp, which survives rounding to 6 places except
on astronomically unlikely boundary values.  (Driver-green for two
rounds; unchanged.)

At 100 TB this costs one widening per row inside codegen — decimal
aggregation is still a JVM-side hash aggregate with map-side partial
combine; no extra shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,10)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent exact SUM, exposed as a 2-dp-rounded DOUBLE."""
    return F.round(F.sum(col.cast(DEC)), 2).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG (decimal sum / non-null count), rounded
    to 6 places as double."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(col), 6
    ).alias(alias)


def dec_round2(col: Column, alias: str) -> Column:
    """Expose an already-decimal expression (e.g. a windowed decimal
    sum) as the engine-neutral 2-dp DOUBLE surface."""
    return F.round(col, 2).cast("double").alias(alias)


def SQL_DEC(expr: str) -> str:
    """DuckDB-side mirror of Spark's ``CAST(double AS DECIMAL(38,10))``.

    The two engines' direct casts diverge for |value| ≳ 1e8: Spark
    converts via the double's SHORTEST DECIMAL REPR (BigDecimal.valueOf
    → setScale HALF_UP) while DuckDB multiplies the BINARY value by
    10^10 in double arithmetic, which keeps the representation junk at
    that scale (hypothesis-found counterexample: 1006857039.85 →
    Spark 1006857039.8500000000, DuckDB 1006857039.8499999744).
    Routing DuckDB through a string cast uses ITS shortest-repr
    printer, so both engines round the same decimal string — verified
    tie-for-tie (both half-away-from-zero) and property-tested to
    ±1e12.  ``STRING`` (not bare VARCHAR) because some oracle
    fragments also execute on Spark via spark.sql, which rejects an
    unsized VARCHAR; both engines accept STRING.
    """
    return f"CAST(CAST({expr} AS STRING) AS DECIMAL(38,10))"


def SQL_DSUM(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"CAST(ROUND(SUM({SQL_DEC(expr)}), 2) AS DOUBLE) AS {alias}"


def SQL_DAVG(expr: str, alias: str) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM({SQL_DEC(expr)}) AS DOUBLE)"
        f" / COUNT({expr}), 6) AS {alias}"
    )
