"""Sketch-operator plans over `documents` bigrams (beyond-reference ops).

sk01: exact heavy hitters via Misra-Gries prune + broadcast recount —
      the bounded-memory path to "frequent n-grams" at corpus scale,
      provably identical to the single-shuffle exact answer (which is
      the DuckDB oracle here).
sk02: HyperLogLog distinct-cardinality estimate, reported next to the
      exact distinct count and its relative error. The register pipeline
      is pure JVM bit-arithmetic on the portable 60-bit md5 hash, and the
      harmonic mean is computed on exact integers, so even the ESTIMATE
      is bit-identical across engines — the oracle re-derives the whole
      sketch in SQL, not just the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pm25ml_spark.catalog import load_table
from pm25ml_spark.operators import sketches as SK
from pm25ml_spark.plans.registry import query

# bigram SQL fragment shared by both oracles (instances, not distinct)
_BIGRAMS = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    bg AS (
        SELECT doc_id, ts[i] || ' ' || ts[i + 1] AS b
        FROM tok, UNNEST(range(1, len(ts))) AS u(i)
    )
"""

_HH_K = 800


def _bigram_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pm25ml_spark.operators.dedup import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(F.explode(word_ngrams("text", 2)).alias("b"))


@query(
    "sk01_heavy_hitters",
    f"""
    WITH {_BIGRAMS},
    c AS (SELECT b, COUNT(*) AS n FROM bg GROUP BY b),
    t AS (SELECT COUNT(*) AS n_total FROM bg)
    SELECT b, n FROM c CROSS JOIN t WHERE n * {_HH_K} > n_total
    """,
)
def sk01_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams with count > N/k, k = 800. The Spark plan is the two-pass
    sketch (operators.sketches.exact_heavy_hitters); the oracle is the
    naive full-shuffle aggregate — equality IS the superset proof."""
    return SK.exact_heavy_hitters(_bigram_instances(spark, sf_dir), "b", _HH_K)


def _hll_oracle() -> str:
    # mirror operators.sketches numerics exactly: same hash, same bit
    # splits, same integer register combine, same double literals.
    p, m = 6, 64
    rest_bits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    top2 = float(1 << rest_bits) * 2.0  # 2^55 as an exact double
    return f"""
    WITH {_BIGRAMS},
    h AS (SELECT ('0x' || substr(md5(b), 1, 15))::BIGINT AS h FROM bg),
    r AS (
        SELECT h & {m - 1} AS bucket,
               CASE WHEN (h >> {p}) = 0 THEN {rest_bits + 1}
                    ELSE {rest_bits + 1} - len(bin(h >> {p}))
               END AS rho
        FROM h
    ),
    reg AS (SELECT bucket, MAX(rho) AS max_rho FROM r GROUP BY bucket),
    agg AS (
        SELECT SUM(1::BIGINT << ({rest_bits + 1} - max_rho)) AS s_present,
               COUNT(*) AS n_present
        FROM reg
    ),
    est AS (
        SELECT n_present,
               CAST({alpha!r} AS DOUBLE) * {m} * {m} * CAST({top2!r} AS DOUBLE)
                 / CAST(s_present
                        + ({m} - n_present) * (1::BIGINT << {rest_bits + 1})
                        AS DOUBLE) AS raw,
               {m} - n_present AS zeros
        FROM agg
    ),
    ex AS (SELECT COUNT(DISTINCT b) AS exact_distinct FROM bg),
    fin AS (
        SELECT exact_distinct,
               CAST(n_present AS BIGINT) AS n_buckets_hit,
               ROUND(CASE WHEN raw <= {2.5 * m!r} AND zeros > 0
                          THEN {m} * ln({float(m)!r} / CAST(zeros AS DOUBLE))
                          ELSE raw END, 6) AS estimate
        FROM est CROSS JOIN ex
    )
    SELECT exact_distinct, n_buckets_hit, estimate,
           ROUND(abs(estimate - exact_distinct) / exact_distinct, 6) AS rel_err
    FROM fin
    """


@query("sk02_hll_distinct", _hll_oracle())
def sk02_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL(p=6) estimate of distinct bigrams vs the exact count.

    The exact count is reported for the accuracy column only — at corpus
    scale a user runs just the register pipeline (m rows out, map-side
    combinable) and skips the exact distinct entirely.
    """
    bg = _bigram_instances(spark, sf_dir)
    est = SK.hll_distinct(bg, "b", p=6)
    exact = bg.agg(F.count_distinct("b").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact)).select(
        "exact_distinct",
        "n_buckets_hit",
        "estimate",
        F.round(
            F.abs(F.col("estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ).alias("rel_err"),
    )
