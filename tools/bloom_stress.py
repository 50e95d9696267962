"""Bloom decontamination stress: corpus replicated k×, measure the
suspected-row pruning factor and wall time vs the broadcast-set join.

Usage: python tools/bloom_stress.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pm25ml_spark.catalog import load_table  # noqa: E402
from pm25ml_spark.operators import dedup as D  # noqa: E402
from pm25ml_spark.operators.bloom import (  # noqa: E402
    bloom_might_contain,
    build_bloom_bitset,
    contamination_hits_bloom,
    optimal_params,
)
from pm25ml_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bloom-stress")
    docs = load_table(spark, sf_dir, "documents")
    for n, k in ((2, 1), (2, 4), (8, 1), (8, 4)):
        reps = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
            for i in range(k)
        ]
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        corpus = big.filter(F.col("source") != "src0")
        bench = docs.filter(F.col("source") == "src0")

        t0 = time.perf_counter()
        exact = D.contamination_hits(corpus, bench, n=n).count()
        t_exact = time.perf_counter() - t0

        t0 = time.perf_counter()
        bloom = contamination_hits_bloom(corpus, bench, n=n).count()
        t_bloom = time.perf_counter() - t0

        # pruning factor: corpus n-grams vs Bloom-suspected n-grams
        grams = D.word_ngrams("text", n)
        bench_g = bench.select(F.explode(grams).alias("gram")).distinct()
        m, kh = optimal_params(bench_g.count(), 0.01)
        bs = build_bloom_bitset(bench_g, "gram", m, kh)
        corp_g = corpus.select("doc_id", F.explode(grams).alias("gram"))
        total = corp_g.count()
        suspected = (
            bloom_might_contain(corp_g, "gram", bs, kh)
            .filter("maybe_member")
            .count()
        )
        print(
            f"n={n} k={k}: corpus_ngrams={total} suspected={suspected} "
            f"(prune {total / max(suspected, 1):.1f}x)  "
            f"exact={exact} rows {t_exact:.2f}s  "
            f"bloom={bloom} rows {t_bloom:.2f}s  match={exact == bloom}"
        )


if __name__ == "__main__":
    main()
