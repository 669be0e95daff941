"""Scalar (1-row) frame attachment — the only sanctioned crossJoin.

A recurring plan shape in this engine: compute a tiny frame (a grand
total, a threshold, a trained constant, a codebook size) and attach it
to every row of a big frame.  The ONLY scalable physical plan for that
is ``BroadcastNestedLoopJoin`` with the 1-row side broadcast — a plain
``crossJoin`` without the hint rides on the planner's size estimate,
and a mis-estimate at 100 TB turns it into a shuffled cartesian
product (round-11 verdict caught exactly one site that had silently
dropped the hint its 9 siblings carried).

``scalar_cross`` makes the hint structural: every scalar attachment in
the package goes through here, and ``tests/test_plans.py::
test_no_bare_crossjoin_outside_scalars`` greps the tree so a bare
``.crossJoin(`` cannot reappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_cross(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach the single row of ``scalar`` to every row of ``df``.

    ``scalar`` must be a 1-row (or near-1-row, e.g. per-constant)
    aggregate/codebook frame; the broadcast hint pins the physical
    plan to BroadcastNestedLoopJoin regardless of planner estimates.
    """
    return df.crossJoin(F.broadcast(scalar))
