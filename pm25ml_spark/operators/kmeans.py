"""Deterministic distributed k-means (Lloyd iterations).

MLlib's ``KMeans`` (k-means|| init) is the library path for production
clustering; this operator exists where the engine's determinism contract
matters — seeded-by-construction init (strided rows, like
``similarity.ivf_topk``'s coarse quantizer), engine-portable tie rules,
and reproducible centroids run-to-run — and as the composition proof for
the two catalog primitives: ss04's ASSIGN pass + ss05's UPDATE pass = one
Lloyd iteration.

Scale shape per iteration:
- centroids broadcast (k×d floats — dimension-table-sized),
- assignment is one narrow ``mapInPandas`` over the vectors (a single
  BLAS distance computation per Arrow batch, no shuffle),
- update is one map-side-combinable hash aggregate (sum + count per
  cluster, k·d running values), collected to the driver (k×d — small by
  definition) to form the next broadcast.

Nothing driver-side ever scales with the corpus; the only per-iteration
shuffle is the k-row aggregate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_batches(bc, vec_col, id_col):
    import pandas as pd

    def fn(batches):
        C = bc.value  # (k, d)
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            # squared L2 via the expansion trick: one BLAS matmul per batch
            d2 = (
                (V * V).sum(axis=1, keepdims=True)
                - 2.0 * (V @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            # argmin with lowest-cluster-index tie rule (np.argmin is
            # first-occurrence on ties — exactly that rule)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": np.argmin(d2, axis=1).astype(np.int32),
                }
            )

    return fn


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns (centroids (k,d) float64,
    final assignment DataFrame(id, cluster)).

    Init: the k rows with the smallest ids (deterministic, no RNG — swap
    in k-means|| for production quality; every downstream step is
    identical). Empty clusters keep their previous centroid.
    """
    spark = vectors.sparkSession
    sc = spark.sparkContext

    seed_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    C = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)
    vecs = vectors.select(id_col, vec_col)

    assigned = None
    prev_bc = None
    for _ in range(n_iter):
        bc = sc.broadcast(C)
        assigned = vecs.mapInPandas(
            _assign_batches(bc, vec_col, id_col),
            f"{id_col} long, cluster int",
        )
        # UPDATE: per-(cluster, dim) sums — map-side combinable, k·d rows out
        sums = (
            vecs.join(assigned, id_col)
            .select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        C = C.copy()
        for r in sums:
            C[r.cluster, r.dim] = r.s / r.n
        # the returned `assigned` plan is lazy and still references this
        # iteration's broadcast: only destroy superseded ones
        if prev_bc is not None:
            prev_bc.destroy()
        prev_bc = bc
    # re-assign against the FINAL centroids so the returned pair is
    # mutually consistent (the in-loop assignment used the previous
    # round's centroids — rows could sit closer to a different returned
    # centroid than their label)
    final_bc = sc.broadcast(C)
    assigned = vecs.mapInPandas(
        _assign_batches(final_bc, vec_col, id_col),
        f"{id_col} long, cluster int",
    )
    return C, assigned


def kmeans_inertia(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Sum of squared distances to the nearest centroid (the Lloyd
    objective; must be non-increasing over iterations)."""
    import pandas as pd

    sc = vectors.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def fn(batches):
        C = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (
                (V * V).sum(axis=1, keepdims=True)
                - 2.0 * (V @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            yield pd.DataFrame({"d2": np.maximum(d2.min(axis=1), 0.0)})

    part = vectors.select(id_col, vec_col).mapInPandas(fn, "d2 double")
    return part.agg(F.sum("d2")).first()[0]
