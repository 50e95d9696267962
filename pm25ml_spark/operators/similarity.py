"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline: a broadcast of the (small)
query set against the candidate corpus, dot products computed JVM-side via
``zip_with`` + ``aggregate`` (no Python, no shuffle until the final top-k
window). For the billion-vector scale path, ``lsh_bucket_topk`` buckets
candidates by deterministic random-hyperplane signs so each query probes
only its bucket.

Determinism contract: scores are rounded to 6 dp and ranked with
(rounded score DESC, candidate id ASC) so ordering is reproducible across
engines; the 1e-13-level float divergence sits ~7 orders of magnitude
below the rounding step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    q_id: str = "qid",
    c_id: str = "cid",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector.

    The query side is broadcast (typical ANN workloads probe with a small
    batch); candidates stream through without a shuffle until the per-query
    top-k window, which is partitioned by query id — never a single-
    partition sort.
    """
    pairs = candidates.crossJoin(F.broadcast(queries)).filter(
        F.col(q_id) != F.col(c_id)
    )
    score = F.round(
        _dot(F.col(q_vec), F.col(c_vec)) / (_norm(F.col(q_vec)) * _norm(F.col(c_vec))),
        6,
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        pairs.select(q_id, c_id, score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score ≥ t).

    Exact all-pairs at corpus scale is O(n²·d); this baseline keeps the
    whole computation JVM-side (zip_with/aggregate, no Python) and prunes
    half the matrix with the id ordering. The scale path is the
    hyperplane-bucketed variant (:func:`lsh_bucket_topk` machinery):
    near-dup pairs at cos ≥ 0.99 collide in all low-resolution buckets
    with overwhelming probability, shrinking candidates ~2^n_planes-fold.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    score = F.round(
        _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6
    )
    return (
        pairs.withColumn("score", score)
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def plane_component(p: int, i: int) -> int:
    """Deterministic hyperplane component: 60-bit md5 of "p_i" mod 1000,
    shifted to [-500, 500). Seedless and engine-portable — Python hashlib,
    Spark md5() and DuckDB md5() all agree, so the SQL oracle can rebuild
    the identical planes (plans/similarity.py embeds these as literals)."""
    import hashlib

    return int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:15], 16) % 1000 - 500


def hyperplane_signature(vec, n_planes: int, dim: int) -> F.Column:
    """Deterministic random-hyperplane LSH signature (bigint bucket id).

    Components are precomputed driver-side and embedded as literals — the
    expression tree carries plain doubles instead of n_planes×dim folded
    md5 calls, which keeps plan compilation O(ms). The signature packs
    sign(v·plane_p) bits."""
    sig = None
    for p in range(n_planes):
        comps = F.array(
            *[F.lit(float(plane_component(p, i))) for i in range(dim)]
        )
        dot = _dot(vec, comps)
        bit = F.when(dot >= 0, F.lit(1 << p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = bit if sig is None else sig + bit
    return sig


def lsh_bucket_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 1,
    n_planes: int = 8,
    dim: int = 64,
    q_id: str = "qid",
    c_id: str = "cid",
    q_vec: str = "qe",
    c_vec: str = "ce",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's hyperplane bucket
    are scored. The bucket join replaces the cross join — at 10^9 vectors
    with 2^n_planes buckets the probe set shrinks ~2^n_planes-fold.

    Fully deterministic (hash-derived planes), so oracle-checkable.
    """
    qs = queries.withColumn("bucket", hyperplane_signature(F.col(q_vec), n_planes, dim))
    cs = candidates.withColumn(
        "bucket", hyperplane_signature(F.col(c_vec), n_planes, dim)
    )
    pairs = cs.join(F.broadcast(qs), "bucket").filter(F.col(q_id) != F.col(c_id))
    score = F.round(
        _dot(F.col(q_vec), F.col(c_vec)) / (_norm(F.col(q_vec)) * _norm(F.col(c_vec))),
        6,
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("score"), F.asc(c_id))
    return (
        pairs.select(q_id, c_id, score.alias("score"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
