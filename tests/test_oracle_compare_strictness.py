"""The local oracle mirror must be as strict as the driver's typed value
hash — this is the regression suite for the failure class that shipped
t13/m09 red twice: a DuckDB oracle leaving SUM(BIGINT)-derived columns as
HUGEINT (fetched as float64) while Spark returns bigint. Values equal,
dtypes differ, driver hash red — the old mirror compared
``float(a) == float(b)`` and stayed green.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_compare import assert_match, canon, dtype_kind


class _FakeSparkDF:
    """Minimal stand-in exposing .toPandas() — assert_match needs nothing
    else, and a real Spark plan would make this a JVM test for no reason."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf.copy()


def test_int_vs_float_same_values_is_red():
    spark_side = _FakeSparkDF(pd.DataFrame({"k": ["a", "b"], "n": [32, 7]}))
    oracle = pd.DataFrame({"k": ["a", "b"], "n": [32.0, 7.0]})
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        assert_match(spark_side, oracle, "fake")


def test_float_vs_int_other_direction_is_red():
    spark_side = _FakeSparkDF(pd.DataFrame({"n": [1.5, 2.0]}))
    oracle = pd.DataFrame({"n": [1, 2]})
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        assert_match(spark_side, oracle, "fake")


def test_matching_kinds_and_values_green():
    spark_side = _FakeSparkDF(
        pd.DataFrame({"k": ["a"], "n": [32], "x": [1.5]})
    )
    oracle = pd.DataFrame({"k": ["a"], "n": [32], "x": [1.5]})
    assert_match(spark_side, oracle, "fake")


def test_int_width_does_not_matter():
    spark_side = _FakeSparkDF(
        pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    )
    oracle = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert_match(spark_side, oracle, "fake")


def test_date_object_vs_datetime64_is_green():
    """Spark DATE -> object-of-datetime.date; DuckDB DATE -> datetime64.
    The driver hash treats them as equal (w13/w15 driver-green), so the
    mirror must too."""
    import datetime

    d = [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]
    spark_side = _FakeSparkDF(pd.DataFrame({"day": d}))
    oracle = pd.DataFrame({"day": pd.to_datetime(pd.Series(d))})
    assert_match(spark_side, oracle, "fake")


def test_dtype_kind_buckets():
    assert dtype_kind(pd.Series([1]).dtype) == "int"
    assert dtype_kind(pd.Series([1.0]).dtype) == "float"
    assert dtype_kind(pd.Series([True]).dtype) == "bool"
    assert dtype_kind(pd.Series(["x"]).dtype) == "object"
    assert (
        dtype_kind(pd.to_datetime(pd.Series(["2024-01-01"])).dtype)
        == "datetime"
    )


def test_canon_normalizes_dates_to_datetime64():
    import datetime

    pdf = pd.DataFrame({"day": [datetime.date(2024, 1, 1), None]})
    out = canon(pdf)
    assert dtype_kind(out["day"].dtype) == "datetime"
