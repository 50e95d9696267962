"""Measured parity bound for ml/numpy_gbm.NumpyHistGBM vs the real
boosters (xgboost/lightgbm), which are not installable in this container.

The trick that makes a bound measurable WITHOUT the reference libraries:
on a synthetic task y = f(x) + eps with known noise sigma, EVERY
learner's held-out RMSE is >= sigma (the Bayes floor). So if our model
reaches RMSE = sigma * (1 + e), its gap to real XGBoost/LightGBM under
the same config is AT MOST e * sigma — regardless of what the real
library would score. Small measured e == tight parity bound.

Two task shapes:

* TREE task — f is piecewise-constant on axis-aligned splits with an
  interaction (exactly representable by trees). A correct histogram GBM
  should drive estimation error toward 0, so e directly measures
  implementation quality.
* SMOOTH task — the reference-shaped surface (sin, products, hinges;
  the AOD-imputation character). Both our GBM and the real ones face
  the same approximation limits here, so e is reported for context,
  not as the bound.

Configs are the repo's pinned reference hyperparameters
(ml/boosters.py XGB_AOD_PARAMS / LGBM_NO2_PARAMS, verbatim from the
reference's setup/training.py:68-139) through the same
numpy_params_from_* translation the production path uses, with
n_estimators scaled down by the factor printed (runtime only; both
sides of the comparison would use identical configs).

Run: python tools/gbm_parity_bound.py
"""

from __future__ import annotations

import json
import time

import numpy as np

from pm25ml_spark.ml.boosters import (
    LGBM_NO2_PARAMS,
    XGB_AOD_PARAMS,
    numpy_params_from_lgbm,
    numpy_params_from_xgb,
)
from pm25ml_spark.ml.numpy_gbm import NumpyHistGBM

SIGMA = 0.5
N_TRAIN, N_TEST, D = 12_000, 6_000, 10
TREE_SCALE = {"xgb": 5, "lgbm": 20}  # n_estimators divisor (runtime only)


def tree_task(rng):
    X = rng.normal(size=(N_TRAIN + N_TEST, D))
    f = (
        2.0 * (X[:, 0] > 0)
        + 1.5 * ((X[:, 1] > 0.5) & (X[:, 2] < 0))
        - 1.0 * (X[:, 3] > 1.0)
        + 0.8 * ((X[:, 4] < -0.3) | (X[:, 5] > 0.7))
    )
    return X, f


def smooth_task(rng):
    X = rng.normal(size=(N_TRAIN + N_TEST, D))
    f = (
        np.sin(2 * X[:, 0])
        + 0.8 * X[:, 1] * X[:, 2]
        + 0.5 * np.abs(X[:, 3])
        + 0.3 * np.maximum(X[:, 4], 0) * X[:, 5]
    )
    return X, f


def run(task_name, make_task, cfg_name, params):
    rng = np.random.default_rng(42)
    X, f = make_task(rng)
    y = f + rng.normal(scale=SIGMA, size=len(f))
    Xtr, ytr = X[:N_TRAIN], y[:N_TRAIN]
    Xte, yte, fte = X[N_TRAIN:], y[N_TRAIN:], f[N_TRAIN:]
    t0 = time.time()
    m = NumpyHistGBM(**params)
    m.fit(Xtr, ytr)
    pred = m.predict(Xte)
    dt = time.time() - t0
    rmse = float(np.sqrt(np.mean((pred - yte) ** 2)))
    est_err = float(np.sqrt(np.mean((pred - fte) ** 2)))
    excess = rmse / SIGMA - 1.0
    return {
        "task": task_name,
        "config": cfg_name,
        "n_estimators": params["n_estimators"],
        "rmse": round(rmse, 4),
        "bayes_floor": SIGMA,
        "excess_vs_floor": round(excess, 4),
        "est_err": round(est_err, 4),
        "parity_bound_rmse": round(excess * SIGMA, 4),
        "fit_sec": round(dt, 1),
    }


def main():
    xgb = numpy_params_from_xgb(
        XGB_AOD_PARAMS,
        n_estimators=XGB_AOD_PARAMS["n_estimators"] // TREE_SCALE["xgb"],
        # depth 20 on 12k rows would memorize noise long before the tree
        # budget runs out at squared loss without early stopping; the
        # reference relies on xgboost's own regularizers at full data
        # scale. Depth 8 keeps the comparison about the ALGORITHM.
        max_depth=8,
    )
    lgbm = numpy_params_from_lgbm(
        LGBM_NO2_PARAMS,
        n_estimators=LGBM_NO2_PARAMS["num_iterations"] // TREE_SCALE["lgbm"],
        num_leaves=64,
    )
    rows = []
    for cfg_name, params in (("xgb_aod", xgb), ("lgbm_no2", lgbm)):
        for task_name, make in (("tree", tree_task), ("smooth", smooth_task)):
            r = run(task_name, make, cfg_name, params)
            rows.append(r)
            print(json.dumps(r))
    print()
    print("| task | config | RMSE | floor | excess | parity bound (RMSE) |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['task']} | {r['config']} | {r['rmse']} | "
            f"{r['bayes_floor']} | {r['excess_vs_floor']:.1%} | "
            f"<= {r['parity_bound_rmse']} |"
        )


if __name__ == "__main__":
    main()
