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
    dict this module returns; with 94+ registered queries a fixed order
    would leave the same tail permanently unverified. The rotation lives
    HERE (the driver-facing adapter), not in the registry, so the catalog
    itself stays in hermetic registration order for every other consumer.

    Policy — STALENESS ordering over the union of every committed
    ``CORRECTNESS_r{N}.json`` (deterministic given the repo state):
    queries sort by the round they were last verified GREEN, ascending
    (ties broken by registration order). Consequences:

    * A query red or errored in its latest check keeps its old
      ``last_green`` round, so it re-enters the sample immediately.
    * A brand-new query has ``last_green = 0`` and leads the very next
      sample.
    * A green query sampled this round moves to the back; greens past
      the prefix keep aging until they bubble into it — so with sample
      size S and catalog size N, every query is re-verified at least
      once every ``ceil(N / S)`` rounds (the information-theoretic
      floor; = 2 rounds up to N = 2S = 100, degrading gracefully
      beyond). The policy never needs to know the driver's exact S.
    """
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent
    rounds: dict[int, dict] = {}
    for p in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", p.name)
        rnd = int(m.group(1)) if m else 0
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if isinstance(data, dict) and rnd > 0:
            rounds[rnd] = data
    if not rounds:
        return list(names)

    def green_in(res) -> bool:
        if not isinstance(res, dict):
            return False
        if res.get("hash_match") is None:  # rows-only check
            return res.get("rows_match") is True
        return res.get("hash_match") is True

    last_green = {n: 0 for n in names}
    for rnd in sorted(rounds):
        for n in names:
            if green_in(rounds[rnd].get(n)):
                last_green[n] = rnd

    reg_pos = {n: i for i, n in enumerate(names)}
    # Queries whose latest green is KNOWN-suspect (e.g. flagged flaky by a
    # round verdict) are treated as never-verified so they lead the next
    # sample; remove entries once re-verified green.
    force_next = {
        # r13 (optimization round): every query whose PHYSICAL plan or
        # lifecycle changed this round — results invariant by design,
        # verify that. Txlog write path (observed row counts, footer
        # stats, one-job upsert validation):
        "d12_txlog_upsert_merge",
        "d13_txlog_time_travel",
        "d20_vacuum_lifecycle",
        # r13: m10 dual prefix sums share one scan; sk01 MG pass shares
        # candidates+totals via one cached frame.
        "m10_ks_drift",
        "sk01_heavy_hitters",
        # r13: frozen hash-order prefix filter (row-local array_sort
        # prefix, broadcast batch probe) across the exact-Jaccard
        # family and its incremental/streaming lifecycles.
        "dd03_jaccard_pairs",
        "dd15_incremental_dedup",
        "gr08_incremental_edges",
        "st09_stream_dedup_graph",
        # r13: commit audits ride the write job's Observation (drift
        # counters, IVF assignment audits) — one job per commit.
        "st10_stream_zorder_maintain",
        "st11_stream_typed_zorder",
        "ss13_incremental_ivf_top2",
        "ss17_ivf_retrain_lifecycle",
        # (t12's mid-round tally fold was REVERTED after a paired A/B —
        # final code is byte-identical to its r12-green shape, so it
        # rotates normally instead of burning a forced slot.)
    }
    return sorted(
        names,
        key=lambda n: (0 if n in force_next else last_green[n], reg_pos[n]),
    )


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
