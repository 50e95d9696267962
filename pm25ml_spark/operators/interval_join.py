"""Interval (range-overlap) join — a custom operator Spark lacks natively.

Joining rows to the intervals containing them (`point BETWEEN start AND
end`) naively plans as a BroadcastNestedLoop/cartesian with a residual
range predicate — O(|L|·|R|), hopeless at corpus scale. The classic
distributed shape implemented here:

1. chunk time into fixed buckets;
2. each interval replicates to every bucket it overlaps (explode of a
   small ``sequence``), each point lands in exactly ONE bucket;
3. equi-join on the bucket key with the range predicate as a residual.

Because a point has exactly one bucket, an interval meets each matching
point exactly once — no post-join dedup. Cost is the equi-join shuffle
plus an interval replication factor of ``len/bucket + 1`` (pick
``bucket`` near the typical interval length; SCALING.md discussion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_div(col: str, b: int) -> Column:
    """Exact long floor-division ``floor(col / b)`` for b > 0.

    NOT ``(col / b).cast('long')``: that routes through DOUBLE division
    (misbuckets past 2^53) and truncates toward zero, merging buckets
    -1..0 and doubling replication near the origin. Integral ``div`` is
    exact at any magnitude; the correction term turns its
    truncate-toward-zero into a true floor for negative values.
    """
    c = F.col(col).cast("long")
    q = F.expr(f"CAST({col} AS BIGINT) div {b}")
    return q - F.when((c % b != 0) & (c < 0), 1).otherwise(0)


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start: str,
    end: str,
    point: str,
    bucket: int,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval with ``start <= point <= end``.

    ``start``/``end``/``point`` are integer-comparable columns in the
    same unit (e.g. epoch micros); ``bucket`` is the chunk width in that
    unit. ``how='inner'`` only; compose with a re-join for left
    semantics (see ``iv01``'s plan) — an outer bucketed join would
    duplicate unmatched intervals per bucket.
    """
    if how != "inner":
        raise ValueError("interval_join supports how='inner' only")
    b = int(bucket)
    iv = intervals.withColumn(
        "__bk",
        F.explode(F.sequence(_floor_div(start, b), _floor_div(end, b))),
    )
    pt = points.withColumn("__bk", _floor_div(point, b))
    return (
        iv.join(pt, "__bk")
        .filter((F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end)))
        .drop("__bk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
) -> DataFrame:
    """Join interval PAIRS that overlap: ``l_start <= r_end AND
    r_start <= l_end`` — the interval-interval sibling of
    :func:`interval_join` (both sides are ranges, so the naive plan is
    again a cartesian with a residual predicate).

    Both sides replicate to every bucket they overlap; the equi-join on
    the bucket key + residual overlap test finds each qualifying pair in
    EVERY bucket the pair shares, so emission is restricted to the pair's
    FIRST shared bucket — ``max(floor(l_start/b), floor(r_start/b))``,
    which both sides provably cover when the intervals overlap — making
    the join exactly-once with no post-join dedup shuffle. Replication
    factor is ``len/bucket + 1`` per side (same knob discussion as
    interval_join: pick bucket ≈ typical interval length).
    """
    b = int(bucket)
    lb = left.withColumn(
        "__bk",
        F.explode(F.sequence(_floor_div(l_start, b), _floor_div(l_end, b))),
    )
    rb = right.withColumn(
        "__bk",
        F.explode(F.sequence(_floor_div(r_start, b), _floor_div(r_end, b))),
    )
    first_shared = F.greatest(_floor_div(l_start, b), _floor_div(r_start, b))
    return (
        lb.join(rb, "__bk")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        .filter(F.col("__bk") == first_shared)
        .drop("__bk")
    )
