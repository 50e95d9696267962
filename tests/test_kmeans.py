"""Distributed Lloyd k-means vs an exact local numpy replica."""

from __future__ import annotations

import numpy as np
import pytest


def _local_lloyd(X, k, n_iter):
    C = X[:k].astype(np.float64).copy()  # ids 0..k-1 are the seeds
    for _ in range(n_iter):
        d2 = (X * X).sum(1, keepdims=True) - 2 * X @ C.T + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    return C, a


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 8)) * 5
    X = np.vstack([c + rng.normal(size=(30, 8)) for c in centers])
    return X


def test_kmeans_matches_local_reference(spark, corpus):
    from pm25ml_spark.operators.kmeans import kmeans_fit

    X = corpus
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    C, assigned = kmeans_fit(df, k=4, n_iter=3)
    C_ref, _ = _local_lloyd(X, k=4, n_iter=3)
    # float drift between distributed and local summation is ~1e-12;
    # centroids near-identical, and the returned assignment must be
    # consistent with the RETURNED centroids (final re-assign pass)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    d2 = (X * X).sum(1, keepdims=True) - 2 * X @ C_ref.T + (C_ref * C_ref).sum(1)[None, :]
    a_final = np.argmin(d2, axis=1)
    assert [got[i] for i in range(len(X))] == list(a_final)
    assert np.allclose(C, C_ref, atol=1e-9)


def test_kmeans_inertia_non_increasing(spark, corpus):
    from pm25ml_spark.operators.kmeans import kmeans_fit, kmeans_inertia

    X = corpus
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    inertias = []
    for it in (1, 2, 4):
        C, _ = kmeans_fit(df, k=4, n_iter=it)
        inertias.append(kmeans_inertia(df, C))
    assert inertias[0] >= inertias[1] - 1e-9 >= inertias[2] - 2e-9


@pytest.mark.slow
def test_kmeans_parallel_init_deterministic_and_better(spark):
    """k-means|| seeding: deterministic across runs, k rows, and the
    resulting fit's inertia is no worse than the naive lowest-id init on
    a clearly clustered corpus."""
    import numpy as np
    import pandas as pd
    from pm25ml_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_inertia,
        kmeans_parallel_init,
    )

    rng = np.random.RandomState(5)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0], [10.0, 0.0]])
    pts = np.vstack(
        [c + 0.3 * rng.randn(50, 2) for c in centers]
    )
    pdf = pd.DataFrame(
        {"vec_id": range(len(pts)), "embedding": [list(p) for p in pts]}
    )
    df = spark.createDataFrame(pdf)

    init1 = kmeans_parallel_init(df, k=4, rounds=3)
    init2 = kmeans_parallel_init(df, k=4, rounds=3)
    assert init1.shape == (4, 2)
    assert np.array_equal(init1, init2)  # hash-uniform draws → identical

    C_par, _ = kmeans_fit(df, k=4, n_iter=5, init_centroids=init1)
    C_naive, _ = kmeans_fit(df, k=4, n_iter=5)
    in_par = kmeans_inertia(df, C_par)
    in_naive = kmeans_inertia(df, C_naive)
    assert in_par <= in_naive * 1.0001
    # with well-separated blobs, k-means|| lands one center per blob
    matched = sorted(
        float(np.min(((C_par - c) ** 2).sum(axis=1))) for c in centers
    )
    assert matched[-1] < 1.0


def test_kmeans_parallel_init_degenerate_corpus(spark):
    """All-identical points: sampling probability collapses to zero and
    the init must still return k centers without error."""
    import numpy as np
    import pandas as pd
    from pm25ml_spark.operators.kmeans import kmeans_parallel_init

    pdf = pd.DataFrame(
        {"vec_id": range(10), "embedding": [[1.0, 2.0]] * 10}
    )
    init = kmeans_parallel_init(spark.createDataFrame(pdf), k=3, rounds=2)
    assert init.shape == (3, 2)
    assert np.allclose(init, [1.0, 2.0])
