"""M3 booster path tests: the collect/fit/broadcast/score plumbing is
driven with an injected sklearn-style stub (the container has neither
xgboost nor lightgbm); the real backends activate by import."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pm25ml_spark.ml.boosters import (
    LGBM_CO_PARAMS,
    LGBM_NO2_PARAMS,
    XGB_AOD_PARAMS,
    cross_validate_booster,
    train_booster_on_sample,
)


class LinearStub:
    """Deterministic least-squares 'booster' with the sklearn contract."""

    def fit(self, X, y):
        A = np.column_stack([np.asarray(X, dtype=float), np.ones(len(X))])
        self.coef_, *_ = np.linalg.lstsq(A, np.asarray(y, float), rcond=None)
        return self

    def predict(self, X):
        A = np.column_stack([np.asarray(X, dtype=float), np.ones(len(X))])
        return A @ self.coef_


def _frame(spark, n=200, seed=0):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "f1": rng.rand(n),
            "f2": rng.rand(n),
            "grp": rng.randint(0, 10, n),
        }
    )
    pdf["y"] = 3.0 * pdf.f1 - 2.0 * pdf.f2 + 0.5
    return spark.createDataFrame(pdf)


def test_fit_and_distributed_predict(spark):
    df = _frame(spark)
    imp = train_booster_on_sample(
        df, ["f1", "f2"], "y", model_factory=LinearStub
    )
    scored = imp.transform(df).toPandas()
    # exact linear data → stub recovers it; scoring ran in executors
    assert np.allclose(scored["y__predicted"], scored["y"], atol=1e-8)


def test_group_cv_scores(spark):
    df = _frame(spark)
    imp = cross_validate_booster(
        df, ["f1", "f2"], "y", "grp", n_folds=3, model_factory=LinearStub
    )
    assert len(imp.cv_r2) == 3
    assert imp.mean_cv_r2 == pytest.approx(1.0, abs=1e-9)


def test_null_target_rows_excluded(spark):
    pdf = pd.DataFrame(
        {"f1": [1.0, 2.0, 3.0], "f2": [0.0, 0.0, 0.0], "y": [2.0, 4.0, None]}
    )
    imp = train_booster_on_sample(
        spark.createDataFrame(pdf), ["f1", "f2"], "y",
        model_factory=LinearStub,
    )
    # fitted on the 2 labelled rows only: y = 2*f1
    out = imp.transform(spark.createDataFrame(pdf)).toPandas()
    assert out["y__predicted"].tolist() == pytest.approx([2.0, 4.0, 6.0])


def test_missing_backend_raises_cleanly(spark):
    df = _frame(spark, n=10)
    try:
        import xgboost  # noqa: F401

        pytest.skip("xgboost installed; error path not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="xgb"):
        train_booster_on_sample(df, ["f1"], "y", backend="xgb")


def test_paper_hyperparameters_pinned():
    """The reference's booster configs (setup/training.py:68-139) are the
    parity contract — pin the load-bearing values."""
    assert XGB_AOD_PARAMS["n_estimators"] == 1000
    assert XGB_AOD_PARAMS["max_depth"] == 20
    assert XGB_AOD_PARAMS["reg_lambda"] == 100
    assert LGBM_NO2_PARAMS["num_leaves"] == 1500
    assert LGBM_NO2_PARAMS["max_bin"] == 500
    assert LGBM_CO_PARAMS["max_bin"] == 1000
    assert LGBM_CO_PARAMS["num_iterations"] == 3000
