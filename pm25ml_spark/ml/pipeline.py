"""ML train/predict (SURVEY §2.12 M1-M7), Spark-native via MLlib.

The reference trains XGBoost/LightGBM single-node on a 2-3 % sample and
predicts per month (imputation_model_pipeline.py, regression_model_
predictor.py). Neither library is a dependency here; MLlib's GBTRegressor
is the Spark-native equivalent and *distributes* training — the scale-up
path SURVEY §7.3(5) names. The surrounding semantics are ported exactly:

- M1/M2: group-aware CV fold assignment (GroupKFold ≙ dense_rank of the
  group key mod k; stratified variant interleaves within strata).
- M5: R²/RMSE via SQL aggregates.
- M6: quality gate on mean CV R².
- M7: imputed-stats columns (flag/coalesce/score/share/rolling).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_group_folds(
    df: DataFrame, group_col: str, k: int = 10, fold_col: str = "fold"
) -> DataFrame:
    """GroupKFold (M1): all rows of a group land in one fold;
    dense_rank(group) % k balances groups across folds deterministically.

    The rank runs over the DISTINCT group keys (dimension-sized) and
    broadcast-joins back — a dense_rank over the full frame would funnel
    every row through one unpartitioned-window task."""
    groups = df.select(group_col).distinct()
    w = Window.orderBy(group_col)
    fold_map = groups.withColumn(fold_col, (F.dense_rank().over(w) - 1) % k)
    return df.join(F.broadcast(fold_map), on=group_col, how="left")


def assign_stratified_group_folds(
    df: DataFrame,
    group_col: str,
    stratum_col: str,
    k: int = 10,
    fold_col: str = "fold",
) -> DataFrame:
    """StratifiedGroupKFold (M2): groups are ranked within their stratum
    so each fold sees every stratum — and fold assignment is GROUP-atomic
    even when a group spans strata: each group is first reduced to one
    representative stratum (its minimum), then ranked. Ranking per
    (stratum, group) pair instead would hand the same group different
    folds in different strata, leaking the group across train/test."""
    groups = df.groupBy(group_col).agg(F.min(stratum_col).alias("__stratum"))
    w = Window.partitionBy("__stratum").orderBy(group_col)
    fold_map = groups.withColumn(fold_col, (F.row_number().over(w) - 1) % k).drop(
        "__stratum"
    )
    return df.join(F.broadcast(fold_map), on=group_col, how="left")


def regression_metrics(
    pred: DataFrame, label: str, prediction: str = "prediction"
) -> dict[str, float]:
    """M5: r2 + rmse via plain aggregates (one pass). An empty frame
    (e.g. a CV fold with no groups) yields NaN metrics, not a crash."""
    row = pred.agg(
        F.count(label).alias("n"),
        F.avg(label).alias("mean_y"),
        F.sum((F.col(label) - F.col(prediction)) ** 2).alias("ss_res"),
        F.sum(F.col(label) ** 2).alias("ss_y2"),
        F.sum(label).alias("s_y"),
    ).first()
    if not row.n or row.mean_y is None:
        return {"r2": float("nan"), "rmse": float("nan"), "n": row.n or 0}
    ss_tot = row.ss_y2 - row.n * row.mean_y**2
    r2 = 1.0 - row.ss_res / ss_tot if ss_tot else float("nan")
    rmse = (row.ss_res / row.n) ** 0.5
    return {"r2": r2, "rmse": rmse, "n": row.n}


class ModelQualityError(RuntimeError):
    pass


def check_quality_gate(mean_r2: float, lo: float, hi: float) -> None:
    """M6 (regression_model_predictor.py:104-130): fail outside [lo, hi]."""
    if not (lo <= mean_r2 <= hi):
        raise ModelQualityError(f"mean CV R² {mean_r2:.4f} outside [{lo}, {hi}]")


@dataclass
class TrainedImputer:
    model: object
    features: list[str]
    target: str
    cv_r2: list[float]

    @property
    def mean_cv_r2(self) -> float:
        return sum(self.cv_r2) / len(self.cv_r2)


def check_no_null_features(df: DataFrame, features: list[str], where: str) -> None:
    """P11 (imputation_model_pipeline.py:232-241): predictors must be
    fully non-null — GBT rejects the NaN the assembler would emit, so
    without this guard a single missing feature cell kills the job with
    an opaque executor error deep in training/scoring. Implemented as a
    limit-1 existence probe, not a full count."""
    any_null = F.lit(False)
    for f in features:
        any_null = any_null | F.col(f).isNull() | F.isnan(F.col(f))
    bad = df.filter(any_null).limit(1).count()
    if bad:
        raise ValueError(
            f"{where}: null/NaN in predictor columns {features} — run the "
            "interpolation/fill stages first (reference P11 contract)"
        )


# Partition sizing for the training sample: every GBT iteration runs
# treeAggregate jobs whose task count is the input's partition count, so
# a 2-3 % sample sharded into cluster-default partitions pays hundreds
# of near-empty task launches per fit. Size partitions to ROWS (tree
# stats aggregation is per-partition CPU), capped at the cluster
# parallelism — measured 7.3 s -> 2.8 s per 5-iteration fit on a 43k-row
# sample at local[32].
_TRAIN_ROWS_PER_PARTITION = 250_000


def train_imputation_model(
    df: DataFrame,
    features: list[str],
    target: str,
    group_col: str,
    n_folds: int = 3,
    max_iter: int = 20,
    seed: int = 42,
) -> TrainedImputer:
    """M1+M3: group-aware CV scores + final fit on all training rows.

    Training data is the stratified sample (2-3 % of the corpus) — small
    relative to the cluster, but the GBT still trains distributed.

    The n_folds CV fits and the final fit are INDEPENDENT jobs, so they
    run concurrently from a small driver thread pool (guide §2.6 —
    Spark's scheduler interleaves them, each fit's tail back-fills the
    executors the others leave idle); ``cv_r2`` keeps fold order.
    """
    check_no_null_features(df, features, "train_imputation_model")
    # persist: the fold-assigned frame is re-read n_folds+1 times (each
    # CV fold's train/test split + the final fit)
    data = (
        assign_group_folds(df, group_col, n_folds)
        .filter(F.col(target).isNotNull())
        .persist()
    )
    n = data.count()  # materializes the cache; sizes the fit partitions
    spark = df.sparkSession
    nparts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n // _TRAIN_ROWS_PER_PARTITION),
        ),
    )
    fit_df = (
        data.coalesce(nparts)
        if nparts < data.rdd.getNumPartitions()
        else data
    )
    assembler = VectorAssembler(
        inputCols=features, outputCol="features", handleInvalid="keep"
    )

    def fit_fold(fold: int | None):
        gbt = GBTRegressor(
            labelCol=target, featuresCol="features", maxIter=max_iter, seed=seed
        )
        if fold is None:
            return gbt.fit(assembler.transform(fit_df))
        train = assembler.transform(fit_df.filter(F.col("fold") != fold))
        test = assembler.transform(fit_df.filter(F.col("fold") == fold))
        m = gbt.fit(train)
        return regression_metrics(m.transform(test), target)["r2"]

    from concurrent.futures import ThreadPoolExecutor

    # 2-3 jobs in flight is plenty (guide §2.6): enough that each fit's
    # straggler tail back-fills with the next fit's tasks, not so many
    # that n_folds+1 concurrent GBT fits (11 at the reference's 10
    # folds) fight for executors and thrash the scheduler at cluster
    # scale. Results are order-pinned by the futures list either way.
    with ThreadPoolExecutor(max_workers=min(3, n_folds + 1)) as pool:
        futures = [pool.submit(fit_fold, f) for f in range(n_folds)]
        final_future = pool.submit(fit_fold, None)
        cv_r2 = [f.result() for f in futures]
        final = final_future.result()
    data.unpersist()
    return TrainedImputer(final, features, target, cv_r2)


def derive_imputed_stats(
    pred: DataFrame,
    target: str,
    mean_cv_r2: float,
    date_col: str = "date",
    key_col: str = "grid_id",
) -> DataFrame:
    """M7: the five imputed-stats columns
    (regression_model_predictor.py:132-229), given a frame that already
    carries ``{target}__predicted``. Engine-deterministic: the share is
    integer-sum/count, the 7-row rolling mean uses decimal sums — so the
    derivation is DuckDB-oracle-checkable independent of the model
    (plan ``d06_imputed_stats``)."""
    from pm25ml_spark.functions.exact import DEC

    t = target
    flag = F.col(t).isNull().cast("int")
    imputed = F.coalesce(F.col(t), F.col(f"{t}__predicted"))
    score = F.when(
        flag == 1, F.col(f"{t}__predicted") * mean_cv_r2
    ).otherwise(F.col(t))
    wd = Window.partitionBy(date_col)
    w7 = Window.partitionBy(key_col).orderBy(date_col).rowsBetween(-6, 0)
    imputed_col = f"{t}__imputed"
    return (
        pred.withColumn(f"{t}__imputed_flag", flag)
        .withColumn(imputed_col, imputed)
        .withColumn(f"{t}__score", score)
        .withColumn(
            f"{t}__share_imputed_across_all_grids",
            F.sum(f"{t}__imputed_flag").over(wd).cast("double")
            / F.count(F.lit(1)).over(wd),
        )
        .withColumn(
            f"{t}__imputed_r7d",
            F.sum(F.col(imputed_col).cast(DEC)).over(w7).cast("double")
            / F.count(imputed_col).over(w7),
        )
    )


def predict_with_stats(
    df: DataFrame,
    imputer: TrainedImputer,
    date_col: str = "date",
    key_col: str = "grid_id",
) -> DataFrame:
    """M4+M7: batch predict + the five imputed-stats columns
    (regression_model_predictor.py:132-229)."""
    t = imputer.target
    check_no_null_features(df, imputer.features, "predict_with_stats")
    assembler = VectorAssembler(
        inputCols=imputer.features, outputCol="features", handleInvalid="keep"
    )
    pred = (
        imputer.model.transform(assembler.transform(df))
        .withColumnRenamed("prediction", f"{t}__predicted")
        .drop("features")
    )
    return derive_imputed_stats(
        pred, t, imputer.mean_cv_r2, date_col=date_col, key_col=key_col
    )
