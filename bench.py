"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion via the noop sink
(``write.format("noop")``): every output row and expression is fully
evaluated with zero sink cost. A ``count()`` instead would let Catalyst
PRUNE the projected expressions (a windowed projection collapses to
``Aggregate [count(1)] <- Relation`` — the window never runs), silently
benchmarking a row-count scan instead of the operator. One untimed
warm-up (JVM + parquet footers + Python worker pool) precedes timing.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0  # non-sf-suffixed dir: still run and emit the JSON line

    from pm25ml_spark.plans.registry import QUERIES, load_all_plans
    from pm25ml_spark.session import get_spark

    load_all_plans()
    spark = get_spark("pm25ml_spark-bench")

    # Warm up: JVM JIT + file listing; untimed.
    QUERIES["q01_pricing_summary"](spark, sf_dir).collect()
    # Warm up the Python worker pool (spark.python.worker.reuse keeps the
    # daemons alive): first pandas-UDF stage otherwise pays ~7 s of
    # one-time worker forking that is not query cost.
    from pyspark.sql import functions as F

    warm = spark.range(64).withColumn("g", F.col("id") % 32)
    warm.groupBy("g").applyInPandas(lambda p: p, "id long, g long").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Best-of-2 per query: single-shot numbers on a shared box swing ±25%
    # with neighbor load; the min of two runs is a far more stable
    # estimate of the query's actual cost.
    for _pass in range(2):
        for name in sorted(QUERIES):
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                elapsed = round(time.perf_counter() - t0, 4)
                timings[name] = min(timings.get(name, elapsed), elapsed)
            except Exception as exc:  # keep the suite result even if one dies
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                timings.pop(name, None)
            # operators may persist() intermediates; isolate queries so one
            # query's cache does not pressure the next one's executors
            spark.catalog.clearCache()
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "pm25ml_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    spark.stop()
    raise SystemExit(1 if errors else 0)


if __name__ == "__main__":
    main()
