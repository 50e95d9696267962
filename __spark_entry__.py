"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All plans live in ``pm25ml_spark.plans`` (one module per operator family,
registered via the @query decorator); this file only adapts them to the
driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the pricing-summary plan (scan → pushed filter → hash aggregate
    with exact decimal sums), the engine's spine query.
    """
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def sample_order(names: list[str]) -> list[str]:
    """Explicit coverage rotation for the driver's prefix sample.

    The external correctness driver verifies the FIRST ~50 entries of the
    dict this module returns; with 72 registered queries a fixed order
    would leave the same tail permanently unverified. The rotation lives
    HERE (the driver-facing adapter), not in the registry, so the catalog
    itself stays in hermetic registration order for every other consumer.

    Policy (deterministic given the committed repo state):
    1. Every query NOT verified green in the most recent
       ``CORRECTNESS_r{N}.json`` — absent from the sample, red, or
       errored — is promoted to the front, in registration order. Since
       at most 22 of 72 can be absent from a 50-query sample, all of
       them land inside the next sample: no query goes unverified for
       two consecutive rounds, and a regression re-enters the sample
       immediately.
    2. The remaining (recently-green) queries follow, round-robin rotated
       by ``round_number * 28 (mod count)`` so the ~28 repeat slots cycle
       through the green set instead of re-sampling a fixed subset —
       a regression in ANY green query is re-caught within ~2 rounds.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent
    latest_round, latest = 0, None
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        if rnd <= latest_round:
            continue
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            latest_round, latest = rnd, data
    if latest is None:
        return list(names)

    def green(name: str) -> bool:
        res = latest.get(name)
        if not isinstance(res, dict):
            return False
        if res.get("hash_match") is None:  # rows-only check
            return res.get("rows_match") is True
        return res.get("hash_match") is True

    due = [n for n in names if not green(n)]
    rest = [n for n in names if green(n)]
    if rest:
        off = (latest_round * 28) % len(rest)
        rest = rest[off:] + rest[:off]
    return due + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    return {n: QUERIES[n] for n in sample_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    from pm25ml_spark.plans.registry import ORACLES, QUERIES, load_all_plans

    load_all_plans()
    order = sample_order(list(QUERIES))
    return {n: ORACLES[n] for n in order if n in ORACLES}
