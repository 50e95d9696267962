"""Row-pure range bucketing — the deterministic replacement for
``repartitionByRange`` in multi-job operators.

Why this exists: Spark's ``RangePartitioner`` RE-SAMPLES its split
boundaries on every job, so a plan containing ``repartitionByRange`` can
land rows in DIFFERENT partitions when it is evaluated twice (e.g. once
to collect per-partition offsets, once to apply them). Any "two-pass
exact prefix-sum / zipWithIndex" operator built on it is therefore
nondeterministic: offsets computed against job 1's partitioning get
applied to job 2's.

The fix implemented here makes the bucket id a PURE FUNCTION OF THE ROW:

1. ONE sampling job collects ≤ ~2·rows_per_split evenly spaced order-key
   tuples per input partition (a single ``mapInPandas`` pass — no count
   job, no global sort).
2. The driver sorts the sample and picks ``num_buckets - 1`` split
   tuples; they are embedded as literals in a ``__bucket`` expression
   (a sum of ``key_struct >= split_struct`` comparisons — struct
   comparison is lexicographic, matching the multi-column sort order).
3. Every subsequent job derives ``__bucket`` from the SAME literals, so
   per-bucket counts computed in one job line up with rows streamed in
   another BY CONSTRUCTION — no matter how Spark physically partitions
   either job.

The split quality only affects balance, never correctness: a skewed
sample just means uneven buckets. NULLs in the key sort first (bucket
0), matching Spark's default NULLS FIRST.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_literal(v):
    """Normalize a sampled pandas/numpy scalar into something F.lit eats."""
    if v is None:
        return None
    # numpy scalars
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (bytes, str)):
        try:
            v = v.item()
        except (ValueError, AttributeError):
            pass
    # pandas.Timestamp -> datetime
    if hasattr(v, "to_pydatetime"):
        v = v.to_pydatetime()
    return v


def _numeric_fast_splits(
    df: DataFrame, col: str, dtype, num_buckets: int
) -> list[tuple] | None:
    """JVM-side split sampling for a SINGLE numeric key: one
    ``approxQuantile`` pass (Greenwald-Khanna inside codegen) instead of
    the Arrow ``mapInPandas`` sampler, which streams every row's key
    through Python — the difference between an O(N)-in-JVM and an
    O(N)-in-Python job at corpus scale. Split values are approximate,
    which only affects bucket BALANCE: they are embedded as literals, so
    every job still derives the identical bucket for the identical row.
    Returns None when the type has no safe double mapping (strings,
    timestamps) — callers fall back to the generic sampler.
    """
    import pyspark.sql.types as T

    integral = isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    if not integral and not isinstance(dtype, (T.FloatType, T.DoubleType)):
        return None
    c = F.col(col)
    probe = df.select(c.cast("double").alias("__q")).filter(
        c.isNotNull() & ~F.isnan(c.cast("double"))
    )
    ps = [0.0] + [i / num_buckets for i in range(1, num_buckets)]
    qs = probe.approxQuantile("__q", ps, 1.0 / (4 * num_buckets))
    if not qs:
        return []
    # a split <= the global minimum would only carve out an empty bucket
    # (the degenerate single-key contract: one bucket)
    lo = int(qs[0]) if integral else float(qs[0])
    out: list[tuple] = []
    for v in qs[1:]:
        v = int(v) if integral else float(v)
        if v > lo and (not out or v > out[-1][0]):
            out.append((v,))
    return out


def range_bucket_column(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int,
    rows_per_split: int = 128,
    splits: list[tuple] | None = None,
) -> tuple[Column, int]:
    """Return ``(bucket_expr, n_buckets)`` where ``bucket_expr`` assigns
    each row a bucket id in ``[0, n_buckets)`` that is monotone in the
    lexicographic ``order_cols`` order and depends ONLY on the row's own
    key values (never on physical partitioning). ``n_buckets`` can be
    smaller than requested when the sample has few distinct keys.

    ``splits``: optional caller-provided ascending split tuples — skips
    the sampling job entirely. Splits only affect bucket BALANCE, never
    correctness, so any ascending list over the key domain is valid
    (callers that already hold related splits — e.g. a09's MAD pass
    folding the value splits around each group median — drop one
    corpus pass per call, guide §1.2).
    """
    key_schema = df.select(*order_cols).schema
    col_types = {f.name: f.dataType for f in key_schema.fields}
    if splits is not None:
        return _splits_to_expr(splits, order_cols, col_types)
    return _splits_to_expr(
        range_bucket_splits(df, order_cols, num_buckets, rows_per_split),
        order_cols,
        col_types,
    )


def range_bucket_splits(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int,
    rows_per_split: int = 128,
) -> list[tuple]:
    """The sampling half of :func:`range_bucket_column`: one pass over
    ``df`` returning the ascending split tuples (numeric single keys take
    the JVM ``approxQuantile`` fast path). Exposed so multi-pass callers
    can sample once and share/derive splits across related bucketings."""
    key_schema = df.select(*order_cols).schema
    col_types = {f.name: f.dataType for f in key_schema.fields}

    if len(order_cols) == 1 and num_buckets > 1:
        fast = _numeric_fast_splits(
            df, order_cols[0], col_types[order_cols[0]], num_buckets
        )
        if fast is not None:
            return fast

    cap = max(rows_per_split, 8)

    def sampler(batches):
        import pandas as pd

        # vectorized stride sampling: every stride-th row by GLOBAL
        # offset (iloc slices, never per-row Python), halving the kept
        # set and doubling the stride whenever it exceeds 2*cap — the
        # Arrow batches stream through numpy, so the pass stays cheap
        # even when this generic path sees a corpus-sized frame
        kept: list[pd.DataFrame] = []
        n_kept, stride, i = 0, 1, 0
        for pdf in batches:
            first = (-i) % stride
            take = pdf.iloc[first::stride]
            i += len(pdf)
            if len(take):
                kept.append(take)
                n_kept += len(take)
            while n_kept >= 2 * cap:
                merged = pd.concat(kept, ignore_index=True).iloc[::2]
                kept, n_kept = [merged], len(merged)
                stride *= 2
        out = (
            pd.concat(kept, ignore_index=True)
            if kept
            else pd.DataFrame({c: [] for c in order_cols})
        )
        yield out

    sampled = df.select(*order_cols).mapInPandas(sampler, key_schema).collect()
    keys = sorted(
        tuple(_to_literal(v) for v in r)
        for r in sampled
        if all(v is not None for v in r)
    )

    splits: list[tuple] = []
    if keys and num_buckets > 1:
        n = len(keys)
        for i in range(1, num_buckets):
            cand = keys[min(n - 1, (i * n) // num_buckets)]
            # a split must exceed the previous one AND the sample minimum,
            # else it would only carve out an empty bucket
            if cand > (splits[-1] if splits else keys[0]):
                splits.append(cand)

    return splits


def _splits_to_expr(
    splits: list[tuple], order_cols: list[str], col_types: dict
) -> tuple[Column, int]:
    key_struct = F.struct(*[F.col(c) for c in order_cols])
    expr = F.lit(0)
    for s in splits:
        lit_struct = F.struct(
            *[
                F.lit(v).cast(col_types[c]).alias(c)
                for v, c in zip(s, order_cols)
            ]
        )
        expr = expr + F.when(key_struct >= lit_struct, 1).otherwise(0)
    return expr.cast("int"), len(splits) + 1
