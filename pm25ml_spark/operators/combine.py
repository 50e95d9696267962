"""Wide-table combiner — the reference pipeline's spine.

Re-expresses `combiners/archive/combiner.py` (reference, see SURVEY §2.3
J1/J2 and §3.1 step 6) Spark-first:

- prefix-rename: value columns become ``{dataset}__{col}``
  (combiner.py:181-208).
- date-normalize: ``YYYY-MM-DDTHH:mm:ss`` → 10-char date string
  (combiner.py:115-128).
- N-way inner join on the intersection of id columns (combiner.py:133-179).
  The reference hand-builds a pairwise parallel join tree purely to
  parallelize eager Polars joins; on Spark we hand Catalyst the flat
  N-way join — AQE picks the order, and keyless-on-date (static) tables
  get broadcast hints since they are grid-sized (33k rows).
- Float32 downcast for storage parity (combiner.py:92-98).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INDEX_COLUMNS = ("grid_id", "date")


def prefix_rename(df: DataFrame, dataset: str, id_cols=INDEX_COLUMNS) -> DataFrame:
    """Rename every non-id column to ``{dataset}__{col}``."""
    mapping = {c: f"{dataset}__{c}" for c in df.columns if c not in id_cols}
    return df.withColumnsRenamed(mapping)


def normalize_date(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Truncate timestamps-as-strings to ``YYYY-MM-DD`` (10 chars)."""
    if date_col not in df.columns:
        return df
    return df.withColumn(date_col, F.substring(F.col(date_col), 1, 10))


def cast_values_float32(df: DataFrame, id_cols=INDEX_COLUMNS) -> DataFrame:
    """Force all value columns to float for storage parity with the
    reference's wide tables (combiner.py:92-98)."""
    casts = {
        c: F.col(c).cast("float") for c in df.columns if c not in id_cols
    }
    return df.withColumns(casts)


def wide_combine(
    datasets: dict[str, DataFrame],
    id_cols=INDEX_COLUMNS,
    downcast: bool = False,
    broadcast_static: bool = True,
) -> DataFrame:
    """Inner-join monthly long tables into one wide table.

    Join keys per pair are the intersection of ``id_cols`` with each
    table's columns — a static table (grid_id only) joins on grid_id and
    is broadcast (it is dimension-sized by construction, like the
    reference's 33k-row grid).
    """
    renamed = [
        (normalize_date(prefix_rename(df, name, id_cols)), set(df.columns))
        for name, df in datasets.items()
    ]

    def join_two(acc: DataFrame, item) -> DataFrame:
        right, orig_cols = item
        keys = [c for c in id_cols if c in acc.columns and c in right.columns]
        if not keys:
            # join(on=[]) is a silent cross join — a misnamed id column
            # would explode row counts multiplicatively with no error
            raise ValueError(
                f"wide_combine: dataset shares no id columns {id_cols} "
                f"with the accumulated table (its columns: {sorted(orig_cols)})"
            )
        if broadcast_static and "date" in id_cols and "date" not in orig_cols:
            right = F.broadcast(right)
        return acc.join(right, on=keys, how="inner")

    first, rest = renamed[0], renamed[1:]
    out = reduce(join_two, rest, first[0])
    return cast_values_float32(out, id_cols) if downcast else out


def regex_project(df: DataFrame, pattern: str, keep=INDEX_COLUMNS) -> DataFrame:
    """Runtime-regex column projection (SURVEY P2): keep the id columns
    plus every column whose name matches ``pattern``.

    The reference selects dataset families with ``pl.col("^era5__.*$")``
    (spatial_imputation_manager.py:54-59, regression_model_predictor.py:
    91-95). Spark schemas are known driver-side, so this is a plain list
    comprehension over ``df.columns`` — the projection is resolved before
    the plan is built and Catalyst prunes the parquet scan to exactly
    these columns.
    """
    import re

    rx = re.compile(pattern)
    cols = [c for c in keep if c in df.columns]
    cols += [c for c in df.columns if c not in cols and rx.match(c)]
    return df.select(*cols)


def scaffold_complete(
    data: DataFrame,
    scaffold: DataFrame,
    id_cols=INDEX_COLUMNS,
) -> DataFrame:
    """Left-join actual data onto the full key scaffold so every key
    combination exists (nulls elsewhere) — the reference's
    full-outer-join-with-coalesce (gee_export_pipeline.py:157-176),
    expressed as scaffold-left-join which is equivalent when the scaffold
    is a superset of the data keys."""
    return scaffold.join(data, on=list(id_cols), how="left")
