"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew by splitting oversized partitions.
These helpers cover the cases AQE cannot: a *logical* hot key whose rows
must still meet every matching row of the other side (AQE can split the
probe side, but a shuffled build side still ships all hot-key rows to one
task tree), and hot-key aggregations where one reducer would otherwise
absorb a whole celebrity key.

Both transforms are semantics-preserving (verified in
tests/test_operators_misc.py against the unsalted results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys fanned out over
    ``n_salts`` sub-keys.

    Left rows get ``salt = pmod(xxhash64(whole row id-ish), n)`` — a
    deterministic spread; the (small-ish) right side is exploded
    ``n_salts``-fold so every (key, salt) bucket still sees all matching
    right rows. The join key becomes (key, salt): a key holding p% of the
    left table now lands on ``n_salts`` reducers instead of one.

    Use when the RIGHT side is replicable (dimension-sized or already
    filtered); for two huge skewed fact tables prefer AQE skew-join or
    isolate the hot keys into a broadcast sub-join.

    Only ``inner`` and ``left`` are legal: the exploded right side would
    emit each UNMATCHED right row ``n_salts`` times under a right/full
    join, silently corrupting the result.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — the "
            "exploded right side duplicates unmatched right rows"
        )
    salted_left = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_left.join(salted_right, on=[on, "__salt"], how=how).drop("__salt")


def salted_agg_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase sum aggregation for hot keys: partial sum per
    (key, salt), then final sum per key. Spark's hash aggregate already
    map-side-combines, so this only pays off when a single key's
    *combined* partials still overwhelm one reducer — i.e. extreme
    cardinality skew with many map partitions. Semantics identical to
    ``groupBy(key).sum(value)``.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__psum"))
    return partial.groupBy(key).agg(F.sum("__psum").alias(f"sum_{value}"))
