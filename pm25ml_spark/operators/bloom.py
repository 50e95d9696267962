"""Distributed Bloom filter: JVM-side build, broadcast-bitset probe.

The 100 TB evolution of `dedup.contamination_hits`: that operator
broadcasts the benchmark's distinct n-grams as a hash-join build side —
right while the benchmark is eval-suite-sized, impossible once the
"disallowed set" is itself web-scale (a blocklist corpus, a prior
training run's shingles, a licensing denylist: 10^8-10^9 members, tens
of GB as strings). A Bloom bitset represents the same membership test in
m bits (~10-12 bits/member at 1% fpr — 1.25 GB for 10^9 members, still
broadcastable) with NO false negatives, so recall stays exact; the
false-positive side is repaired by an exact verification join whose
input is only the suspected rows — the classic Bloom + verify shape.

Everything hot stays JVM-side:
- build: ``xxhash64(value, seed_i) pmod m`` position columns → word
  index + ``shiftleft`` bit mask → ``bit_or`` hash aggregate (map-side
  combinable; shuffle volume = O(occupied 64-bit words), NOT O(rows)) →
  collect the sparse nonzero words into a dense numpy bitset.
- probe: the same position expressions computed JVM-side; one
  vectorized fancy-index lookup against the broadcast bitset inside
  ``mapInPandas`` (numpy, no per-row Python).

Determinism: xxhash64 with literal seeds — same bits every run, any
layout.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_position_cols(col, m_bits: int, k_hashes: int) -> list:
    """k JVM-side bit positions for ``col`` (xxhash64 seeded 0..k-1)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)).alias(f"p{i}")
        for i in range(k_hashes)
    ]


def optimal_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """Classic Bloom sizing: m = -n ln p / (ln 2)^2 bits, k = m/n ln 2.
    Returned m is rounded up to a multiple of 64 (whole words)."""
    if not 0 < fpr < 1:
        raise ValueError("fpr must be in (0, 1)")
    n = max(int(n_items), 1)
    m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
    m = -(-m // 64) * 64
    k = max(1, round(m / n * np.log(2)))
    return m, int(k)


def build_bloom_bitset(
    df: DataFrame, col: str, m_bits: int, k_hashes: int
) -> np.ndarray:
    """Build the bitset distributed: every member row contributes k
    (word_index, bit_mask) pairs, folded by a map-side-combinable
    ``bit_or`` aggregate; only OCCUPIED words (≤ n·k ≪ m/64 when sparse,
    ≤ m/64 always) are shuffled and collected. Returns uint64[m/64]."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = df.select(*bloom_position_cols(F.col(col), m_bits, k_hashes))
    stacked = pos.select(
        F.explode(F.array(*[F.col(f"p{i}") for i in range(k_hashes)])).alias("p")
    )
    words = (
        stacked.select(
            F.shiftright("p", 6).alias("w"),
            # F.shiftleft only takes a literal shift; the SQL form
            # accepts a column expression for the variable bit position
            F.expr("shiftleft(1L, int(pmod(p, 64)))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    bitset = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        bitset[int(r["w"])] = np.uint64(np.int64(r["bits"]).view(np.uint64))
    return bitset


def bloom_might_contain(
    df: DataFrame,
    col: str,
    bitset: np.ndarray,
    k_hashes: int,
    flag_col: str = "maybe_member",
) -> DataFrame:
    """Append a boolean: all k bits set in the broadcast bitset. False ⇒
    definitely not a member (the guarantee the verify join relies on)."""
    m_bits = len(bitset) * 64
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bitset)
    cols = list(df.columns)
    with_pos = df.select(
        *cols,
        F.array(*bloom_position_cols(F.col(col), m_bits, k_hashes)).alias("__pos"),
    )

    def probe(batches):
        bits = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            P = np.array(pdf["__pos"].tolist(), dtype=np.int64)  # (rows, k)
            w = (P >> 6).astype(np.int64)
            b = np.uint64(1) << (P & 63).astype(np.uint64)
            hit = ((bits[w] & b) != 0).all(axis=1)
            out = pdf[cols].copy()
            out[flag_col] = hit
            yield out

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    return with_pos.mapInPandas(probe, f"{schema}, {flag_col} boolean")


def contamination_hits_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpr: float = 0.01,
) -> DataFrame:
    """`dedup.contamination_hits` with a Bloom prefilter — IDENTICAL
    output (the exact verification join removes every false positive;
    Bloom has no false negatives), different 100 TB shape: the benchmark
    travels as an m-bit bitset instead of a string hash set, and the
    exact join's probe side shrinks from the whole exploded corpus to
    only the suspected n-grams (~fpr × corpus + true hits).

    The verify join below still broadcasts the true n-gram set because
    the catalog benchmark is tiny; at a web-scale denylist the same
    verify is a shuffle join — on ~1% of the corpus instead of 100% of
    it, which is the entire point.
    """
    from pm25ml_spark.operators.cache import release_with
    from pm25ml_spark.operators.dedup import word_ngrams

    grams = word_ngrams(text_col, n)
    # persisted: the distinct benchmark n-gram set is consumed THREE
    # times (the sizing count, the bitset build, the exact-verify
    # broadcast) — without the cache each consumer re-runs the
    # benchmark explode + distinct shuffle (guide §1.2)
    bench = benchmark.select(F.explode(grams).alias("gram")).distinct().persist()
    n_bench = bench.count()  # one count of the (already distinct) set
    m_bits, k = optimal_params(n_bench, fpr)
    bitset = build_bloom_bitset(bench, "gram", m_bits, k)

    corp = corpus.select(F.col(id_col), F.explode(grams).alias("gram"))
    suspects = bloom_might_contain(corp, "gram", bitset, k).filter(
        F.col("maybe_member")
    )
    out = (
        suspects.join(F.broadcast(bench), "gram")  # exact verify: fpr → 0
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("gram").alias("n_spans"),
        )
    )
    return release_with(out, bench)  # cache lives as long as the plan
