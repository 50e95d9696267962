from pm25ml_spark.plans.registry import QUERIES, ORACLES, query  # noqa: F401
