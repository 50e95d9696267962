"""Cross-engine-deterministic aggregate helpers.

Floating-point SUM/AVG are order-dependent: Spark's partial aggregation and
DuckDB's sequential scan sum in different orders, so raw double aggregates
differ in the last ulps and break exact value-hash comparison. Fix: sum in
DECIMAL (exact, associative — order-independent), then cast the final value
back to double (a single deterministic IEEE-754 conversion). Both engines
then produce bit-identical doubles.

A double can never sit exactly on a decimal half-way point finer than its
binary representation (5e-7 is not a dyadic rational), so the double→decimal
rounding step is unambiguous too.

Used by every plan in ``pm25ml_spark.plans`` and mirrored syntactically in
the DuckDB oracle SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG (exact decimal sum / non-null count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dsum_expr(sql_expr: str) -> str:
    """The SQL spelling of :func:`dsum` — identical in Spark SQL and DuckDB."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def davg_expr(sql_expr: str) -> str:
    """The SQL spelling of :func:`davg`."""
    return f"(CAST(SUM(CAST(({sql_expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({sql_expr}))"
