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
    init_centroids: np.ndarray | None = None,
) -> tuple[np.ndarray, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns (centroids (k,d) float64,
    final assignment DataFrame(id, cluster)).

    Init: ``init_centroids`` when given (pass
    :func:`kmeans_parallel_init`'s output for production-quality k-means||
    seeding), else the k lowest-id rows (deterministic, no RNG). Empty
    clusters keep their previous centroid.
    """
    spark = vectors.sparkSession
    sc = spark.sparkContext

    if init_centroids is not None:
        C = np.asarray(init_centroids, dtype=np.float64)
        if len(C) != k:
            raise ValueError(f"init_centroids has {len(C)} rows, expected {k}")
    else:
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


def _min_d2_frame(vecs: DataFrame, bc, id_col: str, vec_col: str) -> DataFrame:
    """(id, d2) — squared distance to the nearest current center."""
    import pandas as pd

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
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "d2": np.maximum(d2.min(axis=1), 0.0),
                }
            )

    return vecs.mapInPandas(fn, f"{id_col} long, d2 double")


def _hash_uniform(id_col: str, salt: str) -> F.Column:
    """Deterministic per-row uniform draw in [0, 1): 60 md5 bits of
    (salt || id) — the engine-portable replacement for rand(seed), immune
    to partitioning/row-order changes that make rand() non-reproducible
    across cluster layouts."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("double")
    return h / float(1 << 60)


def kmeans_parallel_init(
    vectors: DataFrame,
    k: int,
    rounds: int = 5,
    oversample: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """k-means|| initialization (Bahmani et al., VLDB 2012) — the
    production-quality seeding MLlib uses, deterministic here:

    1. seed with the lowest-id row;
    2. each round, every point joins the candidate set independently with
       probability min(1, l·d²/φ) (l ≈ 2k oversampling, φ = current
       cost) — the draw is a hash-uniform, so the sample is identical on
       any cluster layout;
    3. weight candidates by how many points they serve, then reduce the
       (small, ≈ l·rounds) weighted candidate set to k centers on the
       driver with deterministic farthest-first + weighted Lloyd.

    Each round is one broadcast + one narrow pass + one filter-collect of
    expected l rows — nothing driver-side scales with the corpus.
    """
    spark = vectors.sparkSession
    sc = spark.sparkContext
    l = float(oversample if oversample is not None else 2 * k)
    vecs = vectors.select(id_col, vec_col)

    first = vecs.orderBy(id_col).limit(1).collect()
    if not first:
        raise ValueError("kmeans_parallel_init: empty input")
    C = np.array([list(first[0][1])], dtype=np.float64)

    for r in range(rounds):
        bc = sc.broadcast(C)
        # persist the distance pass: both the φ aggregate and the
        # sampling filter consume it, and an unpersisted frame would
        # recompute the full V·Cᵀ kernel for the second action
        d2 = _min_d2_frame(vecs, bc, id_col, vec_col).persist()
        phi = d2.agg(F.sum("d2")).first()[0] or 0.0
        if phi <= 0.0:  # every point already coincides with a center
            d2.unpersist()
            bc.destroy()
            break
        # collect (id, vec) and sort by id client-side: collect() row order
        # depends on partition layout, and argmax/argmin tie-breaks in
        # _weighted_reduce_to_k would otherwise make the FINAL centers
        # layout-dependent even though sample membership never was.
        picked = (
            d2.filter(_hash_uniform(id_col, f"kmpar{r}:") * phi < l * F.col("d2"))
            .join(vecs, id_col)
            .select(id_col, vec_col)
            .collect()
        )
        d2.unpersist()
        bc.destroy()
        if picked:
            picked.sort(key=lambda p: p[0])
            C = np.vstack(
                [C, np.array([list(p[1]) for p in picked], dtype=np.float64)]
            )

    # weights: how many points each candidate serves (one distributed pass)
    bc = sc.broadcast(C)
    import pandas as pd

    def assign(batches):
        CC = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = (
                (V * V).sum(axis=1, keepdims=True)
                - 2.0 * (V @ CC.T)
                + (CC * CC).sum(axis=1)[None, :]
            )
            yield pd.DataFrame({"cand": np.argmin(d2, axis=1)})

    wrows = (
        vecs.mapInPandas(assign, "cand int")
        .groupBy("cand")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    weights = np.zeros(len(C))
    for row in wrows:
        weights[row.cand] = row.w

    return _weighted_reduce_to_k(C, weights, k)


def _weighted_reduce_to_k(C: np.ndarray, w: np.ndarray, k: int) -> np.ndarray:
    """Driver-side reduction of the weighted candidate set to k centers:
    deterministic weighted farthest-first seeding + weighted Lloyd to
    convergence. C is ≈ oversample·rounds rows — always tiny."""
    if len(C) <= k:
        # pad by repeating the heaviest candidates (degenerate corpus)
        order = np.argsort(-w, kind="stable")
        reps = [C[i] for i in order] * ((k // max(len(C), 1)) + 1)
        return np.array(reps[:k], dtype=np.float64)
    centers = [int(np.argmax(w))]  # heaviest candidate first
    d2 = ((C - C[centers[0]]) ** 2).sum(axis=1)
    while len(centers) < k:
        score = w * d2  # weighted farthest-first
        nxt = int(np.argmax(score))
        centers.append(nxt)
        d2 = np.minimum(d2, ((C - C[nxt]) ** 2).sum(axis=1))
    M = C[centers].copy()
    for _ in range(50):
        dist = ((C[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(dist, axis=1)
        newM = M.copy()
        for j in range(k):
            mask = lab == j
            if w[mask].sum() > 0:
                newM[j] = (C[mask] * w[mask, None]).sum(axis=0) / w[mask].sum()
        if np.allclose(newM, M):
            break
        M = newM
    return M
