"""S16 GEE export tests: duck-typed task lifecycle (backoff, failure,
always-cancel) and the Spark post-process stage vs the reference's
`_process` semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from pm25ml_spark.sources.gee import (
    FeaturePlan,
    GeeExportError,
    complete_task,
    process_gee_export,
    run_gee_export,
)


class StubTask:
    def __init__(self, polls_until_done=3, final_state="COMPLETED"):
        self.polls_until_done = polls_until_done
        self.final_state = final_state
        self.started = False
        self.cancelled = False
        self.polls = 0

    def start(self):
        self.started = True

    def active(self):
        self.polls += 1
        return self.polls < self.polls_until_done

    def status(self):
        return {"state": self.final_state, "error_message": "boom"}

    def cancel(self):
        self.cancelled = True


def test_complete_task_backoff_and_cancel():
    delays = []
    task = StubTask(polls_until_done=5)
    complete_task(task, sleep=delays.append)
    assert task.started and task.cancelled
    # exponential 1.0 ×1.5 capped at 10 (reference constants)
    assert delays == [1.0, 1.5, 2.25, 3.375]


def test_complete_task_failure_still_cancels():
    task = StubTask(polls_until_done=1, final_state="FAILED")
    with pytest.raises(GeeExportError, match="boom"):
        complete_task(task, sleep=lambda s: None)
    assert task.cancelled


PLAN = FeaturePlan(
    feature_name="era5",
    intermediate_columns=("grid_id", "date", "temp_raw"),
    column_mappings={"temp_raw": "era5__temp"},
    expected_value_columns=("era5__temp",),
    dates=("2023-01-01T00:00:00", "2023-01-02T00:00:00"),
)


def _raw(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "grid_id": [1.0, 2.0, 1.0],
                "date": [
                    "2023-01-01T00:00:00",
                    "2023-01-01T00:00:00",
                    "2023-01-02T00:00:00",
                ],
                "temp_raw": [280.0, 281.5, 279.0],
                "system:index": ["a", "b", "c"],  # GEE noise column
            }
        )
    )


def test_process_scaffold_rename_and_types(spark):
    out = process_gee_export(_raw(spark), PLAN).toPandas()
    # full 2 dates × 2 grids scaffold; missing (01-02, grid 2) is null
    assert len(out) == 4
    assert set(out.columns) == {"grid_id", "date", "era5__temp"}
    assert str(out.dtypes["era5__temp"]) == "float32"
    assert out.grid_id.dtype.kind == "i"
    gap = out[(out.date == "2023-01-02T00:00:00") & (out.grid_id == 2)]
    assert gap["era5__temp"].isna().all()


def test_process_missing_column_rejected(spark):
    df = _raw(spark).drop("temp_raw")
    with pytest.raises(ValueError, match="missing expected columns"):
        process_gee_export(df, PLAN)


def test_process_all_null_value_column_rejected(spark):
    import pyspark.sql.functions as F

    df = _raw(spark).withColumn("temp_raw", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="all null values"):
        process_gee_export(df, PLAN)


def test_run_gee_export_composition(spark):
    task = StubTask()
    out = run_gee_export(
        task, lambda: _raw(spark), PLAN, sleep=lambda s: None
    )
    assert task.cancelled
    assert out.count() == 4
