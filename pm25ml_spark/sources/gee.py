"""GEE export pipeline (SURVEY S16): task lifecycle + Spark post-process.

Reference (`collectors/gee/gee_export_pipeline.py:53-215`): define an
Earth Engine table-export task, poll it with exponential backoff until
COMPLETED (cancelling on the way out), read the intermediate CSV, then
post-process: validate/drop/rename columns, cast grid_id, scaffold-
complete the (date × grid_id) index, coerce value columns to float32,
reject all-null columns, sort.

The Earth Engine client itself is a proprietary service SDK — the task
object here is duck-typed (``start() / active() / status() / cancel()``)
so the real ``ee.batch.Task`` drops in unchanged while tests drive the
identical lifecycle with a stub. Everything after the export — the whole
``_process`` stage — is re-expressed as a Spark plan: the scaffold join
is J2 (broadcast full index), the casts and guards are JVM-side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GeeExportError(RuntimeError):
    pass


@dataclass(frozen=True)
class FeaturePlan:
    """What a GEE export is expected to produce (feature_planner shape)."""

    feature_name: str
    intermediate_columns: tuple[str, ...]
    column_mappings: dict[str, str] = field(default_factory=dict)
    expected_id_columns: tuple[str, ...] = ("grid_id", "date")
    expected_value_columns: tuple[str, ...] = ()
    dates: tuple[str, ...] = ()  # YYYY-MM-DDTHH:mm:ss scaffold index


def complete_task(
    task,
    *,
    initial_delay_s: float = 1.0,
    growth_factor: float = 1.5,
    max_delay_s: float = 10.0,
    sleep=time.sleep,
) -> None:
    """Run a duck-typed export task to completion with the reference's
    exponential backoff (gee_export_pipeline.py:112-133); raises unless
    the terminal state is COMPLETED, and always attempts a cancel so an
    abandoned task doesn't keep billing."""
    try:
        task.start()
        delay = initial_delay_s
        while task.active():
            sleep(delay)
            delay = min(max_delay_s, delay * growth_factor)
        status = task.status()
        if status.get("state") != "COMPLETED":
            msg = status.get("error_message", "No error message")
            raise GeeExportError(f"Task failed: {msg}")
    finally:
        try:
            task.cancel()
        except Exception:  # noqa: BLE001,S110 - best-effort, as reference
            pass


def process_gee_export(df: DataFrame, plan: FeaturePlan) -> DataFrame:
    """The reference's `_process` (gee_export_pipeline.py:134-215) as one
    Spark plan: validate → prune → rename → cast → scaffold-complete →
    float32 → all-null guard. The returned frame is unsorted (Spark sinks
    order with sortWithinPartitions/orderBy at write time)."""
    missing = [c for c in plan.intermediate_columns if c not in df.columns]
    if missing:
        raise ValueError(
            f"Table is missing expected columns: {', '.join(missing)}"
        )
    df = df.select(*[c for c in df.columns if c in plan.intermediate_columns])
    for old, new in plan.column_mappings.items():
        df = df.withColumnRenamed(old, new)
    if "grid_id" in df.columns:
        df = df.withColumn("grid_id", F.col("grid_id").cast("long"))

    if "date" in df.columns and "grid_id" in df.columns:
        if not plan.dates:
            raise ValueError(
                "Feature plan does not have dates defined but has a date "
                "column."
            )
        # J2 scaffold completion. The index carries ONLY the key columns,
        # so FULL OUTER JOIN index ≡ df ∪ (index keys absent from df with
        # nulls elsewhere) — and the union form never shuffles the big
        # side (a full outer can't use broadcast-hash, so the join form
        # would sort-merge-shuffle every payload column by (date,
        # grid_id); here only the key pairs are shuffled for distinct()
        # with map-side partial aggregation, and the anti-join runs
        # between two dimension-sized frames).
        dates_df = df.sparkSession.createDataFrame(
            [(d,) for d in plan.dates], "date string"
        )
        grid_df = df.select("grid_id").distinct()
        full_index = dates_df.crossJoin(grid_df)
        present = df.select("date", "grid_id").distinct()
        absent = full_index.join(
            F.broadcast(present), ["date", "grid_id"], "left_anti"
        )
        pad = absent.select(
            "date",
            "grid_id",
            *[
                F.lit(None).cast(df.schema[c].dataType).alias(c)
                for c in df.columns
                if c not in ("date", "grid_id")
            ],
        )
        df = df.unionByName(pad)

    for c in plan.expected_value_columns:
        df = df.withColumn(c, F.col(c).cast("float"))

    # all-null guard in ONE pass (reference loops columns; one aggregate
    # row serves every column at any scale)
    check_cols = [
        c
        for c in (*plan.expected_value_columns, *plan.expected_id_columns)
        if c in df.columns
    ]
    if check_cols:
        counts = df.agg(
            *[F.count(F.col(c)).alias(c) for c in check_cols]
        ).first()
        all_null = [c for c in check_cols if counts[c] == 0]
        if all_null:
            raise ValueError(
                "Table has columns with all null values: "
                + ", ".join(all_null)
            )
    return df


def run_gee_export(
    task,
    read_intermediate,
    plan: FeaturePlan,
    **poll_kwargs,
) -> DataFrame:
    """S16 composition (`upload`, gee_export_pipeline.py:53-86): run the
    export task to completion, read the intermediate CSV through the
    injected reader (GCS in production, any path in tests), post-process
    as a Spark plan. The caller writes the result through the archive
    sink (S2/S5) like every other stage."""
    complete_task(task, **poll_kwargs)
    return process_gee_export(read_intermediate(), plan)
