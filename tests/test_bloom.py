"""Distributed Bloom filter (operators/bloom.py): build/probe mechanics,
the no-false-negative guarantee, and exact equivalence of the
Bloom-prefiltered decontamination against the broadcast-set original."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pm25ml_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom_bitset,
    contamination_hits_bloom,
    optimal_params,
)
from pm25ml_spark.operators.dedup import contamination_hits


def test_optimal_params_math():
    m, k = optimal_params(1000, 0.01)
    assert m % 64 == 0
    assert 9 * 1000 <= m <= 11 * 1000  # ~9.6 bits/member at 1% fpr
    assert 6 <= k <= 8  # k = m/n ln2 ≈ 6.6
    with pytest.raises(ValueError):
        optimal_params(10, 1.5)


def test_build_and_probe_no_false_negatives(spark):
    members = spark.createDataFrame(
        [(f"member_{i}",) for i in range(500)], "g string"
    )
    m, k = optimal_params(500, 0.01)
    bitset = build_bloom_bitset(members, "g", m, k)
    assert bitset.dtype == np.uint64 and len(bitset) == m // 64
    # every member must test positive (the Bloom guarantee)
    out = bloom_might_contain(members, "g", bitset, k).toPandas()
    assert out["maybe_member"].all()
    # non-members: false-positive rate in the designed ballpark
    probe = spark.createDataFrame(
        [(f"other_{i}",) for i in range(2000)], "g string"
    )
    fp = bloom_might_contain(probe, "g", bitset, k).toPandas()["maybe_member"].sum()
    assert fp / 2000 < 0.05  # target 0.01, generous margin for variance


def test_build_is_deterministic_across_layouts(spark):
    rows = [(f"x{i}",) for i in range(300)]
    a = spark.createDataFrame(rows, "g string")
    b = spark.createDataFrame(list(reversed(rows)), "g string").repartition(7)
    m, k = optimal_params(300, 0.01)
    assert (build_bloom_bitset(a, "g", m, k) == build_bloom_bitset(b, "g", m, k)).all()


def test_contamination_bloom_equals_broadcast_set(spark):
    """The headline contract: Bloom prefilter + exact verify returns the
    IDENTICAL frame to the broadcast-hash-set original — false positives
    repaired by the verify join, no false negatives to repair."""
    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        (i, " ".join(rng.choice(vocab, 12)), "bench" if i % 5 == 0 else "corp")
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    corpus = df.filter(F.col("source") == "corp")
    bench = df.filter(F.col("source") == "bench")
    exact = {
        (r.doc_id, r.n_hits, r.n_spans)
        for r in contamination_hits(corpus, bench, n=2).collect()
    }
    bloom = {
        (r.doc_id, r.n_hits, r.n_spans)
        for r in contamination_hits_bloom(corpus, bench, n=2, fpr=0.05).collect()
    }
    assert exact == bloom and len(exact) > 0


def test_rejects_unaligned_bitset_size(spark):
    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom_bitset(df, "g", 100, 3)
