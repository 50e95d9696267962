"""Unit tests for the similarity operators' edge semantics.

Parity tests (tests/test_oracle_parity.py) check the registered plans
value-for-value against DuckDB; these cover the operator-level edges the
plans don't reach: k larger than the candidate set, tie-breaking, self-
exclusion, and regex projection column rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pm25ml_spark.operators.combine import regex_project
from pm25ml_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
)


def _vec_df(spark, name_id, name_vec, rows):
    return spark.createDataFrame(
        rows, f"{name_id} long, {name_vec} array<float>"
    )


def test_cosine_topk_k_exceeds_candidates(spark):
    # 3 candidates, one of which is the query itself -> only 2 rows,
    # both emitted even though k=5 (the kth-threshold branch must not
    # drop rows when a batch holds fewer than k candidates).
    q = _vec_df(spark, "qid", "qe", [(1, [1.0, 0.0])])
    c = _vec_df(
        spark, "cid", "ce", [(1, [1.0, 0.0]), (2, [1.0, 0.1]), (3, [0.0, 1.0])]
    )
    out = cosine_topk(q, c, k=5).orderBy("rk").collect()
    assert [r.cid for r in out] == [2, 3]
    assert out[0].rk == 1 and out[0].score > 0.99
    assert out[1].score == 0.0


def test_cosine_topk_tie_broken_by_candidate_id(spark):
    # two identical candidates: equal rounded score, lower cid ranks first
    q = _vec_df(spark, "qid", "qe", [(10, [1.0, 0.0])])
    c = _vec_df(
        spark, "cid", "ce", [(7, [2.0, 0.0]), (5, [3.0, 0.0]), (9, [0.5, 0.5])]
    )
    out = cosine_topk(q, c, k=2).orderBy("rk").collect()
    assert [(r.cid, r.rk) for r in out] == [(5, 1), (7, 2)]
    assert out[0].score == 1.0 == out[1].score


def test_cosine_neardup_pairs_symmetric_and_ordered(spark):
    # pair emitted once with id_a < id_b regardless of block placement
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(20)]
    emb = _vec_df(spark, "vec_id", "embedding", rows)
    out = cosine_neardup_pairs(
        emb, threshold=0.999, id_col="vec_id", vec_col="embedding", n_blocks=4
    ).collect()
    assert len(out) == 190  # all C(20,2) pairs are near-identical
    assert all(r.id_a < r.id_b for r in out)
    assert len({(r.id_a, r.id_b) for r in out}) == 190


def test_cosine_neardup_threshold_excludes(spark):
    emb = _vec_df(
        spark,
        "vec_id",
        "embedding",
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, [0.0, 1.0])],
    )
    out = cosine_neardup_pairs(emb, threshold=0.99, n_blocks=2).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]


def test_ivf_topk_excludes_self_and_ranks(spark):
    # centroid = id 0 (stride 10, offset 0); all vectors in one list
    rows = [(i, [1.0, float(i) / 100.0]) for i in range(5)]
    q = spark.createDataFrame(
        [(0, [1.0, 0.0])], "qid long, qe array<float>"
    )
    c = _vec_df(spark, "cid", "ce", rows)
    out = ivf_topk(
        q, c, k=10, nprobe=1, centroid_stride=10, centroid_offset=0
    ).orderBy("rk").collect()
    assert [r.cid for r in out] == [1, 2, 3, 4]  # self (cid=0) excluded
    assert [r.rk for r in out] == [1, 2, 3, 4]  # closest angle first


def test_regex_project_keeps_ids_and_matches_in_schema_order(spark):
    df = spark.createDataFrame(
        [(1, "d", 1.0, 2.0, 3.0)],
        "grid_id long, date string, era5__t float, era5__rh float, gee__x float",
    )
    out = regex_project(df, r"^era5__.*$")
    assert out.columns == ["grid_id", "date", "era5__t", "era5__rh"]
    # keep columns absent from the frame are skipped, not invented
    out2 = regex_project(df.drop("date"), r"^gee__.*$")
    assert out2.columns == ["grid_id", "gee__x"]


def test_csv_source_roundtrip_with_declared_schema(spark, tmp_path):
    # SURVEY S8: CSV read with declared schema (no inference scan).
    p = str(tmp_path / "stations.csv")
    with open(p, "w") as f:
        f.write("location_id,value,date\n")
        f.write("7,12.5,2024-01-02\n")
        f.write("8,,2024-01-03\n")
    df = (
        spark.read.option("header", True)
        .schema("location_id long, value double, date string")
        .csv(p)
    )
    rows = df.orderBy("location_id").collect()
    assert [r.location_id for r in rows] == [7, 8]
    assert rows[0].value == 12.5 and rows[1].value is None
    assert df.schema.simpleString() == (
        "struct<location_id:bigint,value:double,date:string>"
    )
