"""Sequence packing: lay a document stream end-to-end into fixed-capacity
training sequences (the "concat-and-chunk" packing LLM trainers use).

Beyond-reference surface. Each document gets its global token offset in a
canonical order, and chunk ids fall out by integer division — so the
operator is really "exact distributed prefix-sum", the same two-pass
shape as ``sampling.decimate_partitioned``:

1. A ROW-PURE ``__bucket`` id (``bucketize.range_bucket_column`` — split
   keys sampled once and embedded as literals, NOT ``repartitionByRange``
   whose boundaries re-sample per job) + a per-bucket window gives each
   row its LOCAL cumulative token count — parallel everywhere, no
   single-task stage.
2. One tiny extra job emits the per-bucket token totals (≤ num_buckets
   rows to the driver); their running sum is each bucket's GLOBAL
   offset, joined back as a broadcast. Because the bucket id is a pure
   function of the row, the totals pass and the apply pass agree by
   construction no matter how Spark physically partitions either job.

All arithmetic is integer, so results are bit-identical to the
single-window spelling (equivalence-tested) and to any other engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pm25ml_spark.operators.bucketize import range_bucket_column


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: adds ``start_offset``,
    ``first_chunk``, ``last_chunk``, ``spans_boundary`` to ``df``.

    ``order_cols`` must be a unique key (same contract as decimation:
    ties make any engine's order arbitrary). Documents spanning a chunk
    boundary are flagged, not split — the downstream chunker decides
    whether to split or mask across the seam.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    bucket_expr, _ = range_bucket_column(df, order_cols, nparts)
    part = df.withColumn("__bucket", bucket_expr)
    # tiny driver pass: per-bucket token totals → global offsets
    totals = (
        part.groupBy("__bucket").agg(F.sum(token_col).alias("t")).collect()
    )
    offsets, acc = [], 0
    for r in sorted(totals, key=lambda r: r["__bucket"]):
        offsets.append((int(r["__bucket"]), acc))
        acc += int(r["t"])
    odf = spark.createDataFrame(offsets, "__bucket int, __off long")
    w = (
        Window.partitionBy("__bucket")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (
        F.col("__off") + F.sum(token_col).over(w) - F.col(token_col)
    ).alias("start_offset")
    out = part.join(F.broadcast(odf), "__bucket").select(
        *df.columns, start
    )
    first = F.expr(f"start_offset div {capacity}")
    last = F.expr(f"(start_offset + {token_col} - 1) div {capacity}")
    return out.select(
        *df.columns,
        "start_offset",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        F.when(first != last, 1).otherwise(0).alias("spans_boundary"),
    )


def pack_sequences_global(
    df: DataFrame, token_col: str, order_cols: list[str], capacity: int
) -> DataFrame:
    """Single global-window spelling — the mini-corpus reference that
    :func:`pack_sequences` is equivalence-tested against (funnels
    everything through one task; never the catalog/production path)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, 0
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias(
        "start_offset"
    )
    out = df.select(*df.columns, start)
    first = F.expr(f"start_offset div {capacity}")
    last = F.expr(f"(start_offset + {token_col} - 1) div {capacity}")
    return out.select(
        *df.columns,
        "start_offset",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        F.when(first != last, 1).otherwise(0).alias("spans_boundary"),
    )
