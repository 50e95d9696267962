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


def range_bucket_column(
    df: DataFrame,
    order_cols: list[str],
    num_buckets: int,
    rows_per_split: int = 128,
) -> tuple[Column, int]:
    """Return ``(bucket_expr, n_buckets)`` where ``bucket_expr`` assigns
    each row a bucket id in ``[0, n_buckets)`` that is monotone in the
    lexicographic ``order_cols`` order and depends ONLY on the row's own
    key values (never on physical partitioning). ``n_buckets`` can be
    smaller than requested when the sample has few distinct keys.
    """
    key_schema = df.select(*order_cols).schema
    col_types = {f.name: f.dataType for f in key_schema.fields}

    cap = max(rows_per_split, 8)

    def sampler(batches):
        import pandas as pd

        kept: list[tuple] = []
        stride, i = 1, 0
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if i % stride == 0:
                    kept.append(tuple(row))
                    if len(kept) >= 2 * cap:
                        kept = kept[::2]
                        stride *= 2
                i += 1
        yield pd.DataFrame(kept, columns=list(order_cols))

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
