"""SparkSession factory and runtime-conf hardening.

The engine targets a large multi-executor cluster; locally we run
``local[N]``. Everything here is cluster-neutral: AQE handles runtime
re-planning and skew, Arrow accelerates the pandas-UDF boundary, and the
UTC session timezone keeps timestamp semantics engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that must be set before the JVM starts.
_BUILDER_CONFS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}

# Confs that are runtime-settable; applied defensively even to sessions we
# did not create (the verification driver owns its own SparkSession).
_RUNTIME_CONFS = {
    # Benchmark events.parquet stores TIMESTAMP(NANOS); Spark has no native
    # nanos type — read as long and convert (catalog.load_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some builds
            pass
    return spark


def get_spark(app_name: str = "pm25ml_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit with ``spark-submit --master yarn/k8s``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _BUILDER_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_runtime_confs(spark)
