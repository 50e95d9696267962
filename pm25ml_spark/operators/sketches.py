"""Streaming-sketch operators: Misra-Gries heavy hitters and HyperLogLog.

Beyond-reference surface (the reference pipeline has no frequency/sketch
operators — its aggregates are plain means/quantiles, SURVEY §2.4): these
are the bounded-memory primitives a 100 TB training-data pipeline uses
where an exact hash aggregate would shuffle the full key space.

Scale shapes:

- **Heavy hitters** (`exact_heavy_hitters`): the naive plan
  ``groupBy(key).count().filter(n·k > N)`` shuffles EVERY distinct key —
  at web scale that is a shuffle the size of the vocabulary (billions of
  n-grams). The two-pass plan here is the classic fix: pass 1 runs a
  Misra-Gries summary per partition inside ``mapInPandas`` (bounded O(k)
  state, ZERO shuffle — only ≤ k candidate keys leave each partition);
  pass 2 recounts the tiny candidate set exactly via a broadcast semi
  join. Per-partition MG with capacity k retains every key whose local
  count exceeds n_p/k, and a global heavy hitter (count·k > N) must be
  partition-local-heavy in at least one partition (pigeonhole), so the
  candidate union is a SUPERSET of the true answer and the recount makes
  the final output exact — the sketch only prunes, it never decides.

- **HyperLogLog** (`hll_distinct`): count-distinct with m registers
  instead of a distinct shuffle. Implemented entirely with JVM built-ins
  on the engine's portable 60-bit md5 hash: bucket = h mod m, rho =
  leading-zero-rank of the remaining 54 bits via ``bin()`` string length
  (both engines print minimal binary digits, so rho = 55 − len(bin(rest))
  with the rest = 0 case pinned to 55). The register combine is
  ``groupBy(bucket).max(rho)`` — map-side combinable, m rows out — and
  the harmonic mean uses the integer identity sum(2^-rho) = S / 2^55
  with S = Σ 2^(55−rho) a BIGINT, so the estimate is bit-deterministic
  across engines (no float summation anywhere before the final single
  division). Flajolet's bias constant and the linear-counting small-range
  correction are the standard ones.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pm25ml_spark.operators.dedup import _md5_long

# the portable hash is 15 hex digits = 60 bits; 6 go to the bucket (m=64)
# leaving 54 bits of "rest", so rho ranges 1..55.
_HASH_BITS = 60


def mg_summarizer(col: str, k: int):
    """The per-partition Misra-Gries pass as a ``mapInPandas`` function
    (shared by the batch operator and the streaming candidate dual):
    O(k) state per task, emits the surviving candidate keys."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[col].values:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeros. dict-comp keeps it
                    # O(k) per eviction round, amortized O(1) per element.
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({col: list(counters.keys())})

    return summarize


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate keys (capacity ``k``).

    Returns a DataFrame with one column ``col`` holding the distinct
    union of every partition's surviving MG keys — a superset of all
    keys with global count > N/k, in bounded memory and with no shuffle
    of the input (only the ≤ k·partitions candidate rows move).
    """
    return (
        df.select(col)
        .mapInPandas(mg_summarizer(col, k), f"{col} string")
        .distinct()
    )


def exact_heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Keys with count·k > N, exactly, via MG-prune + broadcast recount.

    Output columns: ``col``, ``n`` (exact global count). Identical to
    the single-shuffle ``groupBy.count.filter`` answer (the oracle), but
    the only aggregation over the full key space happens inside the
    bounded-memory sketch; the exact hash aggregate touches candidate
    keys only.
    """
    cand = mg_candidates(df, col, k)
    total = df.select(F.count(F.lit(1)).alias("n_total"))
    counts = (
        df.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * k > F.col("n_total"))
        .select(col, "n")
    )


def _rho(rest: F.Column, rest_bits: int) -> F.Column:
    """Leading-zero rank (position of the first 1-bit, 1-based) of a
    ``rest_bits``-wide non-negative integer. ``bin()`` prints minimal
    binary digits in Spark and DuckDB alike, so bitlen(x) = len(bin(x))
    for x ≥ 1; the all-zero word is pinned to rest_bits + 1."""
    return (
        F.when(rest == 0, rest_bits + 1)
        .otherwise(rest_bits + 1 - F.length(F.bin(rest)))
        .cast("int")
    )


def hll_registers(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """HLL register table: (bucket, max_rho) over ``m = 2**p`` buckets.

    Map-side combinable (max), at most m rows out — THE shape for
    distinct-cardinality at 100 TB. Mergeable across partitions, days,
    or corpora by a further groupBy(bucket).max(max_rho).
    """
    m = 1 << p
    rest_bits = _HASH_BITS - p
    h = _md5_long(F.col(col))
    # bit ops, not arithmetic: h spans 60 bits, and a double division
    # (the / operator) would silently lose the low bits past 2^53.
    hashed = df.select(
        h.bitwiseAND(m - 1).alias("bucket"),
        _rho(F.shiftright(h, p), rest_bits).alias("rho"),
    )
    return hashed.groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Single-row cardinality estimate from an HLL register table.

    Exact-integer register combine: S = Σ 2^(55−max_rho) (+ 2^55 per
    empty bucket), then one double division E = α·m²·2^55 / S, with
    Flajolet's linear-counting correction when E ≤ 5m/2 and empty
    buckets exist. Bit-deterministic: the only float ops are the final
    division/ln, applied to exact integers in a fixed expression shape.
    """
    m = 1 << p
    rest_bits = _HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    top = float(1 << rest_bits)  # 2^54... exact power-of-two double
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(1L, {rest_bits + 1} - max_rho)")).alias(
            "s_present"
        ),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_total = F.col("s_present") + (m - F.col("n_present")) * F.lit(
        1 << (rest_bits + 1)
    )
    raw = (
        F.lit(alpha)
        * m
        * m
        * F.lit(top * 2.0)
        / s_total.cast("double")
    )
    zeros = m - F.col("n_present")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        m * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("n_present").cast("long").alias("n_buckets_hit"),
        F.round(est, 6).alias("estimate"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """End-to-end HLL distinct-count estimate for one column."""
    return hll_estimate(hll_registers(df, col, p), p)
