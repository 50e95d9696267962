"""Sequence packing: lay a document stream end-to-end into fixed-capacity
training sequences (the "concat-and-chunk" packing LLM trainers use).

Beyond-reference surface. Each document gets its global token offset in a
canonical order, and chunk ids fall out by integer division — so the
operator is really "exact distributed prefix-sum", the same two-pass
shape as ``sampling.decimate_partitioned`` — both now delegate to
``prefix.ordered_prefix_sum`` (row-pure range buckets, per-bucket
totals collected once, broadcast offsets + per-bucket window), the one
audited implementation of the deterministic two-pass pattern.

All arithmetic is integer, so results are bit-identical to the
single-window spelling (equivalence-tested) and to any other engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    capacity: int,
    num_partitions: int | None = None,
    bucket=None,
) -> DataFrame:
    """Concat-and-chunk packing plan: adds ``start_offset``,
    ``first_chunk``, ``last_chunk``, ``spans_boundary`` to ``df``.

    ``order_cols`` must be a unique key (same contract as decimation:
    ties make any engine's order arbitrary). Documents spanning a chunk
    boundary are flagged, not split — the downstream chunker decides
    whether to split or mask across the seam. ``bucket`` forwards a
    precomputed ``range_bucket_column`` pair to the prefix sum so
    composed plans sample split keys once.
    """
    from pm25ml_spark.operators.prefix import ordered_prefix_sum

    cum = ordered_prefix_sum(
        df,
        order_cols,
        token_col,
        "__cum",
        num_partitions=num_partitions,
        bucket=bucket,
    )
    out = cum.select(
        *df.columns,
        (F.col("__cum") - F.col(token_col))
        .cast("long")
        .alias("start_offset"),
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
