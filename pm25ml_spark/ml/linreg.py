"""Distributed closed-form linear regression + higher-moment aggregates.

The reference's model pipeline (training/imputation_model_pipeline.py) fits
gradient boosters; the classical baseline it reports against is a per-group
linear fit.  Both of these operators are ONE hash aggregate producing a
handful of sufficient statistics per group — the canonical "embarrassingly
aggregable" ML shape:

* map-side combine does almost all the work (each task emits one partial
  per group), so the shuffle carries |groups| rows regardless of input
  size — the same plan at 100 TB;
* the sums are DECIMAL(38,6) (exact, associative), so the statistics are
  bit-identical no matter how Spark splits the data, and match any other
  engine computing the same decimal sums — the final slope/intercept/R²
  arithmetic is a fixed chain of IEEE-754 double ops both engines round
  identically.

No iteration, no driver collect, no UDF — pure JVM aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pm25ml_spark.functions.exact import dsum


def _d(col: str) -> Column:
    return F.col(col).cast("double")


def group_ols(
    df: DataFrame, x: str, y: str, groups: list[str], ndigits: int = 6
) -> DataFrame:
    """Per-group simple OLS of ``y`` on ``x``: slope, intercept, R².

    Closed form from exact decimal sufficient statistics
    ``(n, Σx, Σy, Σx², Σy², Σxy)``:

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        R² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    The per-row products (``x·x`` etc.) are single IEEE double ops —
    deterministic everywhere; only the SUM is order-sensitive, and that
    runs in decimal.  One shuffle keyed by ``groups``.
    """
    xd, yd = _d(x), _d(y)
    stats = df.groupBy(*groups).agg(
        F.count(xd).alias("__n"),
        dsum(xd).alias("__sx"),
        dsum(yd).alias("__sy"),
        dsum(xd * xd).alias("__sxx"),
        dsum(yd * yd).alias("__syy"),
        dsum(xd * yd).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return stats.select(
        *groups,
        F.col("__n").alias("n"),
        F.round(slope, ndigits).alias("slope"),
        F.round((sy - slope * sx) / n, ndigits).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x * var_y), ndigits).alias("r2"),
    )


def ols_sql(x: str, y: str, groups: list[str], table: str) -> str:
    """The DuckDB spelling of :func:`group_ols` — textually the same
    expression tree so every double op rounds identically."""
    gcols = ", ".join(groups)

    def ds(e: str) -> str:
        return f"CAST(SUM(CAST(({e}) AS DECIMAL(38,6))) AS DOUBLE)"

    return f"""
    WITH stats AS (
        SELECT {gcols},
               COUNT({x}) AS n,
               {ds(x)} AS sx, {ds(y)} AS sy,
               {ds(f"{x} * {x}")} AS sxx,
               {ds(f"{y} * {y}")} AS syy,
               {ds(f"{x} * {y}")} AS sxy
        FROM {table} GROUP BY {gcols}
    )
    SELECT {gcols}, n,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(((CAST(n AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
    FROM stats
    """


def group_moments(
    df: DataFrame, col: str, groups: list[str], ndigits: int = 6
) -> DataFrame:
    """Per-group mean / population variance / skewness / excess kurtosis
    from exact decimal power sums ``(n, Σx, Σx², Σx³, Σx⁴)`` — a single
    map-side-combinable aggregate (the "method of moments" profile every
    data-quality sweep wants, e.g. spotting heavy-tailed token counts).

        m = Σx/n
        m2 = Σx²/n − m²                       (population variance)
        skew = (Σx³/n − 3m·Σx²/n + 2m³) / (m2·sqrt(m2))
        kurt = (Σx⁴/n − 4m·Σx³/n + 6m²·Σx²/n − 3m⁴) / (m2·m2) − 3

    ``sqrt`` is correctly rounded under IEEE-754, so the whole chain is
    engine-portable; powers are spelled as explicit products.
    """
    xd = _d(col)
    stats = df.groupBy(*groups).agg(
        F.count(xd).alias("__n"),
        dsum(xd).alias("__s1"),
        dsum(xd * xd).alias("__s2"),
        dsum(xd * xd * xd).alias("__s3"),
        dsum(xd * xd * xd * xd).alias("__s4"),
    )
    n = F.col("__n").cast("double")
    s1, s2, s3, s4 = (F.col(c) for c in ("__s1", "__s2", "__s3", "__s4"))
    m = s1 / n
    m2 = s2 / n - m * m
    skew = (s3 / n - F.lit(3.0) * m * (s2 / n) + F.lit(2.0) * m * m * m) / (
        m2 * F.sqrt(m2)
    )
    kurt = (
        s4 / n
        - F.lit(4.0) * m * (s3 / n)
        + F.lit(6.0) * m * m * (s2 / n)
        - F.lit(3.0) * m * m * m * m
    ) / (m2 * m2) - F.lit(3.0)
    return stats.select(
        *groups,
        F.col("__n").alias("n"),
        F.round(m, ndigits).alias("mean"),
        F.round(m2, ndigits).alias("var_pop"),
        F.round(skew, ndigits).alias("skew"),
        F.round(kurt, ndigits).alias("kurt_excess"),
    )


def moments_sql(col: str, groups: list[str], table: str) -> str:
    """The DuckDB spelling of :func:`group_moments`."""
    gcols = ", ".join(groups)

    def ds(e: str) -> str:
        return f"CAST(SUM(CAST(({e}) AS DECIMAL(38,6))) AS DOUBLE)"

    x = col
    return f"""
    WITH stats AS (
        SELECT {gcols},
               COUNT({x}) AS n,
               {ds(x)} AS s1,
               {ds(f"{x} * {x}")} AS s2,
               {ds(f"{x} * {x} * {x}")} AS s3,
               {ds(f"{x} * {x} * {x} * {x}")} AS s4
        FROM {table} GROUP BY {gcols}
    ),
    m AS (
        SELECT {gcols}, n,
               s1 / CAST(n AS DOUBLE) AS mean,
               s2 / CAST(n AS DOUBLE)
                 - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) AS m2,
               s1 / CAST(n AS DOUBLE) AS mu, s2, s3, s4
        FROM stats
    )
    SELECT {gcols}, n,
           ROUND(mean, 6) AS mean,
           ROUND(m2, 6) AS var_pop,
           ROUND((s3 / CAST(n AS DOUBLE) - 3.0 * mu * (s2 / CAST(n AS DOUBLE))
                  + 2.0 * mu * mu * mu) / (m2 * sqrt(m2)), 6) AS skew,
           ROUND((s4 / CAST(n AS DOUBLE) - 4.0 * mu * (s3 / CAST(n AS DOUBLE))
                  + 6.0 * mu * mu * (s2 / CAST(n AS DOUBLE))
                  - 3.0 * mu * mu * mu * mu) / (m2 * m2) - 3.0, 6)
             AS kurt_excess
    FROM m
    """
