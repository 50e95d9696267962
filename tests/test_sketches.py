"""Unit + property tests for the sketch operators (Misra-Gries, HLL).

The registered sk01/sk02 plans are value-pinned by the DuckDB oracle in
test_oracle_parity; these tests exercise the operators directly on
synthetic data whose skew/cardinality the sf fixtures can't produce:
MG's superset guarantee under heavy skew, sketch-vs-naive equality, HLL
error across cardinalities, and HLL register mergeability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pm25ml_spark.operators import sketches as SK


def _skewed(spark, n_heavy=5000, n_tail=20000):
    """A few very hot keys over a long uniform tail, spread over many
    partitions so per-partition MG actually has to work."""
    heavy = spark.range(n_heavy).select(
        F.concat(F.lit("hot"), (F.col("id") % 3)).alias("k")
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), (F.col("id") % 4000)).alias("k")
    )
    return heavy.unionAll(tail).repartition(16)


def test_mg_candidates_superset_and_exactness(spark):
    df = _skewed(spark)
    k = 50
    naive = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(df.agg(F.count(F.lit(1)).alias("t")))
        .filter(F.col("n") * k > F.col("t"))
        .select("k", "n")
    )
    sketched = SK.exact_heavy_hitters(df, "k", k)
    want = {(r.k, r.n) for r in naive.collect()}
    got = {(r.k, r.n) for r in sketched.collect()}
    assert want, "fixture must actually contain heavy hitters"
    assert got == want
    # and the candidate set really is a superset of the answer keys
    cand = {r.k for r in SK.mg_candidates(df, "k", k).collect()}
    assert {k_ for k_, _ in want} <= cand


def test_mg_bounded_output(spark):
    # uniform data, tiny capacity: every partition emits at most k keys
    df = spark.range(100_000).select(
        F.concat(F.lit("u"), (F.col("id") % 10_000)).alias("k")
    ).repartition(8)
    cand = SK.mg_candidates(df, "k", 10)
    assert cand.count() <= 10 * 8


@pytest.mark.parametrize("true_n", [100, 1000, 20000])
def test_hll_accuracy_band(spark, true_n):
    df = spark.range(true_n * 3).select(
        F.concat(F.lit("v"), (F.col("id") % true_n)).alias("k")
    )
    est = SK.hll_distinct(df, "k", p=6).collect()[0].estimate
    # standard error for m=64 is ~13%; allow 4 sigma
    assert abs(est - true_n) / true_n < 0.52


def test_hll_registers_merge(spark):
    """Registers from two halves, merged by max, equal whole-data
    registers — the property that makes HLL a distributed/streamable
    aggregate."""
    df = spark.range(5000).select(
        F.concat(F.lit("m"), (F.col("id") % 1234)).alias("k")
    )
    a = SK.hll_registers(df.filter(F.col("k") < "m5"), "k")
    b = SK.hll_registers(df.filter(F.col("k") >= "m5"), "k")
    merged = (
        a.unionAll(b)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = SK.hll_registers(df, "k")
    assert {(r.bucket, r.max_rho) for r in merged.collect()} == {
        (r.bucket, r.max_rho) for r in whole.collect()
    }
    # and identical registers give the identical estimate
    e1 = SK.hll_estimate(merged).collect()[0].estimate
    e2 = SK.hll_estimate(whole).collect()[0].estimate
    assert e1 == e2


def test_hll_insensitive_to_duplication(spark):
    """Estimate depends only on the distinct set (multiset invariance)."""
    df = spark.range(800).select(
        F.concat(F.lit("d"), F.col("id")).alias("k")
    )
    dup = df.unionAll(df).unionAll(df)
    e1 = SK.hll_distinct(df, "k").collect()[0].estimate
    e2 = SK.hll_distinct(dup, "k").collect()[0].estimate
    assert e1 == e2


# ---- sequence packing (operators/packing.py) -----------------------------


def test_pack_sequences_matches_global_window(spark):
    """Two-pass distributed prefix-sum == single global window, row for
    row, on a many-partition corpus with awkward sizes."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.packing import (
        pack_sequences,
        pack_sequences_global,
    )

    df = (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.col("id") * 37, 91) + 1).alias("n_tokens"),
        )
        .repartition(16)
    )
    a = pack_sequences(df, "n_tokens", ["doc_id"], 128, num_partitions=11)
    b = pack_sequences_global(df, "n_tokens", ["doc_id"], 128)
    rows_a = {tuple(r) for r in a.collect()}
    rows_b = {tuple(r) for r in b.collect()}
    assert rows_a == rows_b


def test_pack_sequences_invariants(spark, sf_dir):
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()

    rows = sorted(
        QUERIES["t13_sequence_packing"](spark, sf_dir).collect(),
        key=lambda r: r.doc_id,
    )
    # offsets are a gapless prefix sum in doc_id order
    expect = 0
    for r in rows:
        assert r.start_offset == expect
        expect += r.n_tokens
        assert r.first_chunk == r.start_offset // 256
        assert (r.first_chunk != r.last_chunk) == bool(r.spans_boundary)


def test_t13_no_single_partition_stage(spark, sf_dir):
    from tests.test_plan_quality import physical_plan
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()

    plan = physical_plan(QUERIES["t13_sequence_packing"](spark, sf_dir))
    # the whole point: no Exchange SinglePartition anywhere (the global
    # window spelling would need one); prefix-sum runs range-partitioned
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
