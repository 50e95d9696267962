"""Z-order (Morton) multi-dimensional clustering for file layouts.

A RANGE layout on one column gives tight per-file min/max for THAT
column only — every file still spans the full range of every other
column, so stats pruning on a second predicate dimension skips nothing.
Z-ordering interleaves the bits of several rank-normalized columns into
one sort key; range-partitioning + sorting on that key makes each file
cover a compact hyper-rectangle of the key space, so per-file min/max
stay tight in EVERY z-dimension and a box predicate on any subset of
them prunes files (Delta Lake's OPTIMIZE ZORDER BY, Iceberg's z-order
rewrite — same construction: bounded per-column ranks, interleaved
bits).

Everything here is a JVM expression (shift/and/or folds inside
whole-stage codegen): the z-key never touches Python, and the layout is
value-invariant — consumers' query RESULTS are identical under any
layout; only which files a predicate must open changes. That is what
keeps z-ordered catalog queries oracle-checkable: the DuckDB oracle
filters the raw table, Spark reads the pruned z-table, and the hash
compare proves layout moved bytes, never rows.

The reference stages its long-term archives as hive-partitioned
parquet keyed on one dimension (``export/archive_storage.py:31-44``);
z-order is the lakehouse-native generalization this engine adds for
multi-predicate analytics at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_scale(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column with known [lo, hi] bounds onto
    ``[0, 2**bits)``: ``trunc((x - lo) * (2^bits - 1) / (hi - lo))``.
    The product stays in LONG and the divide is double-precision —
    exact whenever ``(hi - lo) * (2^bits - 1) < 2^53`` (every catalog
    use: spans ≤ 2^33 at bits ≤ 12); beyond that the key degrades
    smoothly (a neighboring cell), which moves file boundaries, never
    rows — the z-key is layout-only. Out-of-bounds values clamp, so
    late-arriving outliers degrade pruning for their file instead of
    corrupting the key."""
    span = max(int(hi) - int(lo), 1)
    top = (1 << bits) - 1
    scaled = (
        (col.cast("long") - F.lit(int(lo)))
        * F.lit(top)
        / F.lit(span)
    ).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled))


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """The Morton key: bit i of column d lands at position
    ``i * len(cols) + d``. Each input must already be in
    ``[0, 2**bits)`` (see :func:`rank_scale`). Pure shift/and/sum —
    whole-stage-codegen-friendly, no UDF."""
    n = len(cols)
    parts = []
    for d, c in enumerate(cols):
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def column_bounds(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """Driver-side [min, max] per column — ONE tiny aggregate
    (2·len(cols) scalars, the same bounded collect every range
    partitioner performs). Shared by the batch z-key (zorder_key) and
    the streaming maintainer's fixed-bounds derivation so the two can
    never diverge in bounds semantics."""
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}


def zorder_key_fixed(
    df: DataFrame,
    bounds: dict[str, tuple[int, int]],
    bits: int = 12,
    key_col: str = "__z",
) -> DataFrame:
    """Z-key against FIXED per-column bounds — the streaming-ingest
    form. A micro-batch must key against the SAME bounds as the
    existing table (moving bounds would re-map every existing key and
    demand a full clustering rewrite — the z-analogue of the frozen IVF
    quantizer); late outliers clamp into the edge cells, degrading
    pruning for their file only, never correctness."""
    scaled = [
        rank_scale(F.col(c), lo, hi, bits) for c, (lo, hi) in bounds.items()
    ]
    return df.withColumn(key_col, interleave_bits(scaled, bits))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, key_col: str = "__z"
) -> DataFrame:
    """Append the z-key column for ``cols`` (integer-valued). Column
    bounds come from ONE tiny driver-side aggregate (2·len(cols)
    scalars — the same bounded collect every range partitioner performs
    to sample split points); the per-row key itself is computed
    distributed, JVM-side."""
    bounds = column_bounds(df, cols)
    return zorder_key_fixed(df, bounds, bits=bits, key_col=key_col)
