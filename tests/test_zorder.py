"""Z-order layout (operators/zorder.py) + multi-column stats pruning
(TxTable.read_pruned_multi): the Morton key is bit-exact, the staged
z-table skips files for box predicates on EITHER dimension — the skip a
linear range layout can only give its leading column — and the pruned
read equals the filtered full scan (layout moves bytes, never rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_interleave_bits_known_values(spark):
    """Morton interleave of (x, y) at 4 bits: bit i of column d lands at
    position i*2 + d — checked against hand-computed values."""
    from pm25ml_spark.operators.zorder import interleave_bits

    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (15, 15)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")], 4)
    )
    got = {(r.x, r.y): r.z for r in df.collect()}

    def morton(x, y):
        z = 0
        for i in range(4):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_rank_scale_bounds_and_clamp(spark):
    from pm25ml_spark.operators.zorder import rank_scale

    df = spark.createDataFrame(
        [(v,) for v in (-5, 0, 50, 100, 200)], "v long"
    ).withColumn("s", rank_scale(F.col("v"), 0, 100, 8))
    got = {r.v: r.s for r in df.collect()}
    assert got[0] == 0 and got[100] == 255
    assert got[-5] == 0 and got[200] == 255  # outliers clamp, never wrap
    assert 0 < got[50] < 255


def test_zorder_key_is_deterministic_and_jvm_only(spark):
    """Same input → same keys across invocations, and the key plan has
    no Python stages (pure shift/and arithmetic)."""
    from pm25ml_spark.catalog import load_table
    from pm25ml_spark.operators.zorder import zorder_key

    ev = load_table(spark, SF, "events").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int")
    )
    a = zorder_key(ev, ["user_id", "day_int"], bits=8)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    b = zorder_key(ev, ["user_id", "day_int"], bits=8)
    assert sorted(r["__z"] for r in a.collect()) == sorted(
        r["__z"] for r in b.collect()
    )


def _kept_files(t, preds):
    _v, live = t.snapshot()
    stats = t.file_stats()
    kept = []
    for f in live:
        ok = True
        for col, (lo, hi) in preds.items():
            st = stats.get(f, {}).get(col)
            if st is None or st[0] is None:
                continue
            if st[1] < lo or st[0] > hi:
                ok = False
                break
        if ok:
            kept.append(f)
    return kept, live


def test_zordered_events_prune_on_both_dimensions(spark):
    """THE z-order payoff: box predicates on user-only, day-only, and
    both dimensions each open strictly fewer files than the snapshot
    holds. A linear layout on user_id passes the first check and fails
    the second — every file spans all 30 days. Results must equal the
    filtered full scan regardless of pruning."""
    from pm25ml_spark.plans.artifacts import staged_table_handle
    from pm25ml_spark.plans.live import _D18_BITS, zorder_events_staged

    zorder_events_staged(spark, SF)
    t = staged_table_handle(spark, SF, "events_zorder", (_D18_BITS,))

    for preds in (
        {"user_id": (3, 5)},
        {"day_int": (19730, 19733)},
        {"user_id": (3, 5), "day_int": (19730, 19733)},
    ):
        kept, live = _kept_files(t, preds)
        assert len(live) > 4, "not enough files to demonstrate pruning"
        assert len(kept) < len(live), (
            f"no skip for {preds}: {len(kept)}/{len(live)} files kept — "
            "z-layout lost its per-file rectangle stats"
        )
        got = t.read_pruned_multi(preds)
        full = t.read()
        for col, (lo, hi) in preds.items():
            full = full.filter(F.col(col).between(lo, hi))
        key = lambda r: (r["user_id"], r["day_int"], r["value"])
        assert sorted(map(key, got.collect())) == sorted(
            map(key, full.collect())
        )


def test_read_pruned_multi_empty_box_right_schema(spark):
    from pm25ml_spark.plans.artifacts import staged_table_handle
    from pm25ml_spark.plans.live import _D18_BITS, zorder_events_staged

    zorder_events_staged(spark, SF)
    t = staged_table_handle(spark, SF, "events_zorder", (_D18_BITS,))
    out = t.read_pruned_multi({"user_id": (10**9, 10**9 + 1)})
    assert out.count() == 0
    assert set(out.columns) == {"user_id", "day_int", "value", "__z"}


def test_zorder_table_compaction_preserves_box_skip(spark, tmp_path):
    """Maintenance must not undo clustering: a z-laid-out table
    compacted with cluster_col='__z' keeps per-file rectangles, so box
    predicates on either dimension still skip files afterwards — and
    the stats are re-recorded (no file becomes unknowable)."""
    from pm25ml_spark.catalog import load_table
    from pm25ml_spark.operators.zorder import zorder_key
    from pm25ml_spark.sources.txlog import TxTable

    ev = load_table(spark, SF, "events").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int"), "value"
    )
    z = zorder_key(ev, ["user_id", "day_int"], bits=8)
    t = TxTable(spark, str(tmp_path / "zt"))
    # several small z-ranged appends (streaming-sink accretion shape)
    for i in range(4):
        part = z.filter(F.col("user_id") % 4 == i).repartitionByRange(
            4, F.col("__z")
        )
        t.append(part, stats_cols=["user_id", "day_int"])
    before = {
        (r.user_id, r.day_int, r.value) for r in t.read().collect()
    }
    import os

    total = sum(
        os.path.getsize(os.path.join(t.path, f)) for f in t.snapshot()[1]
    )
    # target ≈ total/4 → everything is "small", merged into ~4 z-ranged
    # files (a 1-file merge would leave nothing to skip)
    v = t.compact(target_file_bytes=total // 4, cluster_col="__z")
    assert v is not None
    _, live = t.snapshot()
    stats = t.file_stats()
    assert set(stats) == set(live)  # nothing unknowable post-compact
    after = {(r.user_id, r.day_int, r.value) for r in t.read().collect()}
    assert after == before
    # both dimensions still skip
    for col, lo, hi in (("user_id", 0, 3), ("day_int", 19730, 19733)):
        kept = [
            f
            for f in live
            if not (stats[f][col][1] < lo or stats[f][col][0] > hi)
        ]
        assert len(live) > 2 and len(kept) < len(live), (col, len(kept), len(live))


def test_st10_streaming_maintenance_lifecycle(spark):
    """The maintained copy's commit log must show the real lifecycle:
    one stats-tracked append per micro-batch, then one compact; box
    pruning still skips files after maintenance; and re-running the
    drain from the same checkpoint is a no-op (AvailableNow replay
    protocol)."""
    from pm25ml_spark.plans.live import (
        _ST10_DAYS,
        _ST10_U,
        st10_maintained_table,
    )

    t = st10_maintained_table(spark, SF)
    ops = [h["op"] for h in t.history()]
    assert ops[:2] == ["append", "append"], ops  # one commit per batch
    assert "compact" in ops, ops
    _, live = t.snapshot()
    stats = t.file_stats()
    assert set(stats) == set(live)  # maintenance kept every file tracked
    preds = {"user_id": _ST10_U, "day_int": _ST10_DAYS}
    kept, live2 = _kept_files(t, preds)
    if len(live2) > 2:  # sf0.001 may compact into very few files
        assert len(kept) < len(live2)
    # pruned read equals filtered full scan
    got = sorted(
        (r.user_id, r.day_int, float(r.value))
        for r in t.read_pruned_multi(preds).collect()
    )
    full = t.read()
    for col, (lo, hi) in preds.items():
        full = full.filter(F.col(col).between(lo, hi))
    want = sorted(
        (r.user_id, r.day_int, float(r.value)) for r in full.collect()
    )
    assert got == want and got
