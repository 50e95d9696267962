from pm25ml_spark.functions.exact import davg, dsum, dsum_expr, davg_expr  # noqa: F401
