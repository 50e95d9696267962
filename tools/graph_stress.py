"""Replication stress for the dup-graph family (gr03 shape).

Replicates the sf0.1 documents table k x (doc_id offset per replica) and
times the two phases of gr03_kcore_members separately:

  * pair build  — D.jaccard_pairs(...): shingle -> ranked prefix ->
    collision join -> exact verify.  Replicas of the same doc are
    near-identical, so TRUE pairs grow ~k^2 for every duplicate group —
    a deliberately adversarial densification of the graph.
  * k-core peel — _KCORE_ROUNDS degree-prune rounds over the edge set
    (node-keyed shuffles only).

Reported per k: docs, edges after the Jaccard-threshold filter, pair
build seconds, peel seconds.  The claim under test: peel cost scales
with the EDGE count (the real graph size), not the corpus, and the pair
build stays collision-bounded under quadratic true-pair growth.

Usage: python tools/graph_stress.py [sf_dir] [k k ...]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

from pm25ml_spark.catalog import load_table
from pm25ml_spark.operators import dedup as D
from pm25ml_spark.session import get_spark


def replicate(docs: DataFrame, k: int) -> DataFrame:
    n = docs.count()
    out = docs
    for i in range(1, k):
        out = out.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        )
    return out


def run(docs: DataFrame, k_core: int = 2, rounds: int = 3) -> tuple[int, float, float]:
    t0 = time.perf_counter()
    pairs = (
        D.jaccard_pairs(docs, n=3, t_num=3, t_den=5)
        .select("doc_a", "doc_b")
        .persist()
    )
    n_pairs = pairs.count()  # materializes the build
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    for _ in range(rounds):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.filter(F.col("c") >= k_core).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .persist()
        )
    edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("degree")
    ).write.format("noop").mode("overwrite").save()
    t_peel = time.perf_counter() - t0
    return n_pairs, t_build, t_peel


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ks = [int(a) for a in sys.argv[2:]] or [1, 2, 4]
    spark = get_spark("graph-stress")
    base = load_table(spark, sf_dir, "documents").persist()
    n0 = base.count()
    print(f"base docs: {n0}")
    for k in ks:
        docs = replicate(base, k).persist()
        docs.count()
        n_pairs, t_build, t_peel = run(docs)
        print(
            f"k={k} docs={n0 * k} pairs={n_pairs} "
            f"build={t_build:.1f}s peel={t_peel:.1f}s",
            flush=True,
        )
        spark.catalog.clearCache()
        base.persist()
        base.count()
    spark.stop()


if __name__ == "__main__":
    main()
