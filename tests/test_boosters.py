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


def _nonlinear_frame(spark, n=600, seed=3):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "f1": rng.uniform(-2, 2, n),
            "f2": rng.uniform(-2, 2, n),
            "grp": rng.randint(0, 8, n),
        }
    )
    pdf["y"] = (
        np.where(np.abs(pdf.f1) < 1, 2.0, -2.0) * np.sign(pdf.f2)
        + 0.3 * pdf.f2
        + 0.02 * rng.randn(n)
    )
    return spark.createDataFrame(pdf)


class TestNamedLearnerAnalogues:
    """M3 parity: both named learner families run numerically end-to-end
    through CV → gate via their translated paper hyperparameters, with
    n_estimators/num_iterations downscaled (the only override — the
    paper's 1000/3000-tree budgets are wall-clock, not semantics).
    Documented parity deltas vs the real backends: histogram quantile
    thresholds instead of exact greedy split points, no column
    subsampling; squared loss makes the hessian term degenerate, so the
    gain formula itself matches."""

    def test_xgb_family_cv_to_gate(self, spark):
        from pm25ml_spark.ml.boosters import numpy_params_from_xgb
        from pm25ml_spark.ml.pipeline import check_quality_gate

        df = _nonlinear_frame(spark)
        params = numpy_params_from_xgb(
            XGB_AOD_PARAMS, n_estimators=150, max_depth=6
        )
        assert params["growth"] == "depthwise"
        assert params["learning_rate"] == 0.1  # eta passthrough
        assert params["min_split_gain"] == 0.8  # gamma
        assert params["reg_lambda"] == 100
        assert params["subsample"] == 0.8
        imp = cross_validate_booster(
            df, ["f1", "f2"], "y", "grp", n_folds=2,
            backend="numpy", params=params,
        )
        assert imp.mean_cv_r2 > 0.8
        check_quality_gate(imp.mean_cv_r2, 0.5, 1.0)  # passes the gate

    def test_lgbm_family_cv_to_gate(self, spark):
        from pm25ml_spark.ml.boosters import numpy_params_from_lgbm
        from pm25ml_spark.ml.pipeline import check_quality_gate

        df = _nonlinear_frame(spark, seed=4)
        params = numpy_params_from_lgbm(
            LGBM_NO2_PARAMS, n_estimators=40, num_leaves=24, max_bin=64
        )
        assert params["growth"] == "leafwise"
        assert params["reg_lambda"] == 10  # lambda_l2
        assert params["min_child_weight"] == 10  # min_data_in_leaf
        assert params["max_depth"] == 10
        imp = cross_validate_booster(
            df, ["f1", "f2"], "y", "grp", n_folds=2,
            backend="numpy", params=params,
        )
        assert imp.mean_cv_r2 > 0.8
        check_quality_gate(imp.mean_cv_r2, 0.5, 1.0)

    def test_lgbm_co_max_bin_translation(self):
        from pm25ml_spark.ml.boosters import numpy_params_from_lgbm

        assert numpy_params_from_lgbm(LGBM_CO_PARAMS)["max_bin"] == 1000
        assert numpy_params_from_lgbm(LGBM_NO2_PARAMS)["max_bin"] == 500
        # paper budgets pass through untouched when not overridden
        assert numpy_params_from_lgbm(LGBM_NO2_PARAMS)["n_estimators"] == 3000
        assert numpy_params_from_lgbm(LGBM_NO2_PARAMS)["num_leaves"] == 1500
