"""End-to-end MLlib imputation: train on a sample, predict with the M7
stats columns (mirrors regression_model_predictor__test.py semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pm25ml_spark.ml.pipeline import (
    predict_with_stats,
    train_imputation_model,
)


@pytest.fixture(scope="module")
def training_frame(spark):
    # deterministic synthetic: target = 2*f1 + 3*f2 with some nulls
    rows = []
    for i in range(400):
        f1 = (i % 20) / 10.0
        f2 = ((i * 7) % 13) / 6.0
        target = 2.0 * f1 + 3.0 * f2 if i % 5 != 0 else None  # 20 % missing
        rows.append((i % 16, f"2023-01-{(i % 28) + 1:02d}", i // 25, f1, f2, target))
    return spark.createDataFrame(
        rows, "grid_id long, date string, id_50km long, f1 double, f2 double, aot double"
    )


def test_train_and_predict_with_stats(training_frame):
    imputer = train_imputation_model(
        training_frame, ["f1", "f2"], "aot", group_col="id_50km",
        n_folds=3, max_iter=10,
    )
    assert len(imputer.cv_r2) == 3
    assert imputer.mean_cv_r2 > 0.8  # clean functional relation → near-perfect fit

    out = predict_with_stats(training_frame, imputer)
    cols = set(out.columns)
    assert {
        "aot__predicted", "aot__imputed_flag", "aot__imputed",
        "aot__score", "aot__share_imputed_across_all_grids", "aot__imputed_r7d",
    } <= cols

    rows = out.collect()
    for r in rows:
        # flag marks exactly the null-target rows
        assert r.aot__imputed_flag == (1 if r.aot is None else 0)
        # imputed = coalesce(target, prediction)
        if r.aot is not None:
            assert r.aot__imputed == r.aot
            assert r.aot__score == r.aot
        else:
            assert r.aot__imputed == r.aot__predicted
            assert r.aot__score == pytest.approx(
                r.aot__predicted * imputer.mean_cv_r2
            )

    # share per date constant & equals the day's flag mean
    shares = (
        out.groupBy("date")
        .agg(
            F.countDistinct("aot__share_imputed_across_all_grids").alias("n"),
            F.avg("aot__imputed_flag").alias("m"),
            F.first("aot__share_imputed_across_all_grids").alias("s"),
        )
        .collect()
    )
    for r in shares:
        assert r.n == 1
        assert r.s == pytest.approx(r.m)
