"""As-of (backward) temporal join without a range cross-product.

The reference's as-of logic is plan-level partition fallback
(`combiners/archive/combine_planner.py:118-163` — substitute the latest
earlier month). Generalized here to a data-plane operator: for each left
row, attach the latest right row with ``right.ts <= left.ts`` per key.

Implementation is the union+window trick: tag both sides, union, sort by
(key, ts, side) and carry the last right value forward with an
ignore-nulls window — one shuffle, no n×m candidate explosion, skew-safe
under AQE. This is the scalable Spark spelling; a broadcast-range join
would blow up on dense right sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Attach to each left row the payload of the latest right row at or
    before its timestamp (per key). Left columns are preserved; payload
    columns arrive as ``asof_<name>`` (null when no earlier right row).

    Row integrity: the payload travels as ONE struct per right row, so
    the matched values always come from the same right row — a per-column
    ignore-nulls carry would skip a genuine null in the latest row and
    substitute an older row's value, emitting a chimera of several rows.
    A null payload field in the matched right row surfaces as null.

    Ties: a right row with ts equal to the left row's ts IS matched
    (<=); among equal-ts right rows the largest payload struct (field-
    wise comparison) wins — a total, engine-portable order, so the result
    is deterministic even with duplicate right timestamps.
    """
    lcols = left.columns
    pstruct = F.struct(*[F.col(p).alias(p) for p in payload])
    pstruct_type = right.select(pstruct.alias("__p")).schema["__p"].dataType
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pstruct_type).alias("__p"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        pstruct.alias("__p"),
    )
    merged = l_tag.unionByName(r_tag)
    # right rows (__side=0) sort before left rows at equal ts → <= semantics;
    # __p as the final sort key makes equal-ts right rows deterministic
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn("__asof", F.last("__p", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__asof.{p}").alias(f"asof_{p}") for p in payload],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance=None,
) -> DataFrame:
    """Forward as-of: attach to each left row the EARLIEST right row with
    ``right.ts >= left.ts`` (per key), optionally only within
    ``left.ts + tolerance`` — pandas ``merge_asof(direction='forward')``
    / Flink temporal-join semantics, the "time to next conversion"
    primitive. Same union+window shape as the backward operator (one
    shuffle, no n×m candidate range join); the carry runs over the
    frame [current row → end] with ``first(ignorenulls)``.

    Payload arrives as ``asof_<name>`` (null when no right row at/after,
    or none inside the tolerance). The matched right row's own timestamp
    is always included as ``asof_ts`` — the tolerance test needs it and
    callers want the delta anyway. Ties: equal-ts right rows resolve to
    the SMALLEST (ts, payload) struct — total and engine-portable.
    ``tolerance`` must be in the units of the ts columns (pass numeric
    ts — e.g. unix_micros — for a numeric tolerance).
    """
    lcols = left.columns
    pstruct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(p).alias(p) for p in payload],
    )
    pstruct_type = right.select(pstruct.alias("__p")).schema["__p"].dataType
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pstruct_type).alias("__p"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        pstruct.alias("__p"),
    )
    merged = l_tag.unionByName(r_tag)
    # left rows (__side=0) sort before right rows at equal ts, so the
    # forward frame starting at the current row sees equal-ts matches
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__p")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = merged.withColumn(
        "__asof", F.first("__p", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        carried = carried.withColumn(
            "__asof",
            F.when(
                F.col("__asof.__rts") <= F.col("__ts") + F.lit(tolerance),
                F.col("__asof"),
            ),
        )
    return carried.filter(F.col("__side") == 0).select(
        *lcols,
        F.col("__asof.__rts").alias("asof_ts"),
        *[F.col(f"__asof.{p}").alias(f"asof_{p}") for p in payload],
    )
