"""Typed loaders for the benchmark parquet tables.

Each loader pushes an explicit projection-friendly read through
``spark.read.parquet`` so Catalyst can prune columns and push predicates
into the scan. The only special case is ``events``: its ``ts`` column is
TIMESTAMP(NANOS) parquet, which Spark reads only as a raw long
(``spark.sql.legacy.parquet.nanosAsLong``); we convert to a microsecond
timestamp with integer division (lossless — the generator emits whole
microseconds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pm25ml_spark.session import ensure_runtime_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one benchmark table; normalizes types where Spark needs help."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros must use integer division: float division loses
        # precision above 2^53 (epoch-nanos ≈ 1.7e18).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() plans."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
