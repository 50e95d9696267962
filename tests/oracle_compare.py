"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark plan and its oracle SQL over the same sf dir,
sorts columns by name and rows by value, and asserts exact equality —
stricter than approximate compare on purpose: the driver hash-compares, so
any value drift is a failure there too.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from pm25ml_spark.catalog import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark DATE columns arrive as object-of-datetime.date while
            # DuckDB DATE fetches as datetime64[us]; the driver hash
            # treats these as the same (w13/w15 are driver-green), so
            # normalize date-like object columns to datetime64[us]
            # instead of string
            nonnull = df[c].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_kind(dtype) -> str:
    """Coarse dtype kind for driver-parity checks: the driver's value
    hash is type-sensitive, so an int column and a float column with
    equal values (32 vs 32.0) still hash-mismatch. Width differences
    (int32 vs int64) do NOT matter — only the kind."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "object"


def assert_match(spark_df, oracle_df: pd.DataFrame, name: str) -> None:
    got = canon(spark_df.toPandas())
    want = canon(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        gk, wk = dtype_kind(got[c].dtype), dtype_kind(want[c].dtype)
        assert gk == wk, (
            f"{name}: col {c} dtype-kind mismatch: spark={got[c].dtype} ({gk}) "
            f"oracle={want[c].dtype} ({wk}) — the driver's typed value-hash "
            f"would fail even if every value is equal (HUGEINT→float64 from a "
            f"bare SUM(BIGINT) in the oracle is the usual culprit; CAST it)"
        )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                ok = (math.isnan(a) and math.isnan(b)) or a == b
                assert ok, f"{name}: col {c} row {i}: spark={a!r} oracle={b!r}"
        else:
            diff = g[g.astype(str) != w.astype(str)]
            assert diff.empty, (
                f"{name}: col {c} mismatch at rows {diff.index[:5].tolist()}: "
                f"spark={g[diff.index[:3]].tolist()} oracle={w[diff.index[:3]].tolist()}"
            )
