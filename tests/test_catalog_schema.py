"""Schema-drift guard for the benchmark catalog.

The testdata generator has already changed the physical type of
``events.ts`` once (TIMESTAMP(NANOS) → TIMESTAMP_NTZ micros), which broke
every event-time plan for two rounds before anyone noticed. This test pins
the NORMALIZED schema `catalog.load_table` must hand to plans, so the next
physical-format drift fails here — loudly, on day one — instead of deep
inside a query.
"""

from __future__ import annotations

import pytest

from pm25ml_spark.catalog import TABLE_NAMES, load_table

# column -> normalized dtype every plan is allowed to rely on, as observed
# from the current generator output. Only load-bearing columns are pinned
# (generators may add columns freely). Date columns in orders/lineitem are
# TIMESTAMP_NTZ today — plans access them exclusively via to_date()/CAST,
# which is NTZ-safe, so NTZ is acceptable THERE; ``events.ts`` is not,
# because event-time plans need unix_micros/withWatermark.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_regionkey": "int",
        "n_name": "string",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_mktsegment": "string",
        "c_acctbal": "double",
    },
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_type": "string"},
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        # the one the generator keeps changing: MUST normalize to a
        # session-TZ timestamp (withWatermark/unix_micros both reject
        # TIMESTAMP_NTZ, and bigint nanos silently breaks date functions)
        "ts": "timestamp",
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_table_loads_with_pinned_schema(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    dtypes = dict(df.dtypes)
    expected = EXPECTED[name]
    missing = {c: t for c, t in expected.items() if dtypes.get(c) != t}
    got = {c: dtypes.get(c) for c in missing}
    assert not missing, (
        f"{name}: normalized schema drifted — expected {missing}, "
        f"got {got} (full: {dtypes})"
    )


def test_events_ts_is_watermarkable(spark, sf_dir):
    """The exact failure mode that bit us: NTZ event time is rejected by
    withWatermark. Guard the batch-loaded type end-to-end."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # unix_micros requires TIMESTAMP (not NTZ, not bigint)
    ev.select(F.unix_micros("ts")).limit(1).collect()
