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


def test_rank_scale_null_propagates_not_top_cell(spark):
    """greatest/least skip NULLs in Spark — without the explicit guard
    a NULL input would silently rank as the TOP cell and skew edge-file
    stats. NULL must stay NULL through rank and interleaved key."""
    from pm25ml_spark.operators.zorder import interleave_bits, rank_scale

    df = spark.createDataFrame(
        [(None, 3), (7, None), (7, 3)], "x long, y long"
    )
    ranked = df.select(
        rank_scale(F.col("x"), 0, 10, 4).alias("rx"),
        rank_scale(F.col("y"), 0, 10, 4).alias("ry"),
    ).withColumn("z", interleave_bits([F.col("rx"), F.col("ry")], 4))
    rows = ranked.collect()
    assert rows[0].rx is None and rows[0].z is None
    assert rows[1].ry is None and rows[1].z is None
    assert rows[2].rx is not None and rows[2].z is not None


def test_zorder_key_fixed_rejects_all_null_bounds(spark):
    import pytest

    from pm25ml_spark.operators.zorder import zorder_key_fixed

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="all-NULL|NULL"):
        zorder_key_fixed(df, {"a": (None, None), "b": (0, 5)}, bits=4)


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
    # one STAMPED commit per micro-batch (exactly-once protocol), each
    # carrying its drift audit counters
    assert ops[:2] == ["stream-append", "stream-append"], ops
    for h in t.history():
        if h["op"] == "stream-append":
            assert h.get("stream_batch"), h
            d = h.get("zorder_drift")
            assert d and d["n_rows"] > 0 and d["clamped"] == 0, d
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


def _drain(spark, stage, t, bounds, chk, qname):
    import time

    from pm25ml_spark.streaming.events import read_events_stream
    from pm25ml_spark.streaming.zorder_maintain import maintain_zorder_stream

    stream = read_events_stream(
        spark, stage, max_files_per_trigger=1, glob="events_*.parquet"
    )
    proj = stream.select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int"), "value"
    )
    q = maintain_zorder_stream(
        proj, t, bounds, checkpoint_dir=chk, bits=8, query_name=qname
    )
    # a terminated AvailableNow query deregisters from the session's
    # active list ASYNCHRONOUSLY; a restart on the same checkpoint
    # before that lands trips Spark's concurrent-checkpoint guard
    for _ in range(100):
        if all(a.name != qname for a in spark.streams.active):
            break
        time.sleep(0.1)
    return q


def test_zorder_maintainer_exactly_once_under_replay(spark, tmp_path):
    """THE crash-replay pin (round-11 ask #1): a failure between a
    batch's txlog append and its checkpoint record replays that batch
    on restart — the (query, epoch) stamp must recognize the replay and
    skip the append, so the clustered copy never double-counts.
    Simulated by deleting the checkpoint's LAST commit marker after a
    full drain (exactly the partially-checkpointed crash state), then
    re-draining with the same query name; a fully-checkpointed restart
    must likewise be a no-op; and the final table must still equal the
    staged source rows."""
    import os

    from pm25ml_spark.catalog import load_table
    from pm25ml_spark.operators.zorder import column_bounds
    from pm25ml_spark.plans.live import _stage_chronological_halves
    from pm25ml_spark.sources.txlog import TxTable

    stage = _stage_chronological_halves(spark, SF, "zx1")
    base = load_table(spark, SF, "events").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int")
    )
    bounds = column_bounds(base, ["user_id", "day_int"])
    chk = str(tmp_path / "chk")
    t = TxTable(spark, str(tmp_path / "zt"))
    qname = "zx1_maintain"

    _drain(spark, stage, t, bounds, chk, qname)
    n_full = t.read().count()
    appends = [h for h in t.history() if h["op"] == "stream-append"]
    assert len(appends) == 2 and n_full > 0

    # crash state: offsets/1 exists, commits/1 deleted → restart
    # replays epoch 1 with the same deterministic batch content
    last_commit = os.path.join(chk, "commits", "1")
    assert os.path.exists(last_commit), os.listdir(os.path.join(chk, "commits"))
    os.remove(last_commit)
    # the local checksum FS leaves a stale .crc sidecar; a rename onto
    # it reads as a concurrent-writer conflict, not a crash restart
    crc = os.path.join(chk, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _drain(spark, stage, t, bounds, chk, qname)
    # the engine restores commits/1 ONLY by re-running epoch 1 end-to-
    # end — its reappearance proves the replay actually happened (the
    # pin is not vacuous)
    assert os.path.exists(last_commit), "replay never happened — vacuous pin"
    assert t.read().count() == n_full, "replayed epoch duplicated rows"
    assert (
        len([h for h in t.history() if h["op"] == "stream-append"]) == 2
    ), "replayed epoch committed a second stamped append"

    # fully-checkpointed restart: no batches at all, still a no-op
    _drain(spark, stage, t, bounds, chk, qname)
    assert t.read().count() == n_full

    # and the maintained copy still equals the staged source exactly
    src = spark.read.parquet(f"{stage}/events_*.parquet").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int"), "value"
    )
    key = lambda r: (r["user_id"], r["day_int"], float(r["value"]))
    assert sorted(
        map(key, t.read().drop("__z").collect())
    ) == sorted(map(key, src.collect()))


def test_zorder_drift_flag_on_out_of_bounds_ingest(spark, tmp_path):
    """Frozen-bounds drift monitoring (round-11 ask #6): an ingest
    whose values fall outside the fixed bounds must raise the recluster
    flag through the per-commit clamped counters while the table's ROWS
    stay exactly right (drift is a pruning-health signal, never a
    correctness event)."""
    from pm25ml_spark.plans.live import _stage_chronological_halves
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.zorder_maintain import zorder_drift_report

    stage = _stage_chronological_halves(spark, SF, "zx2")
    # bounds frozen on a user range far narrower than the data: a large
    # clamped fraction is guaranteed
    bounds = {"user_id": (0, 1), "day_int": (19700, 19800)}
    chk = str(tmp_path / "chk2")
    t = TxTable(spark, str(tmp_path / "zt2"))
    _drain(spark, stage, t, bounds, chk, "zx2_maintain")

    rep = zorder_drift_report(t)
    assert rep["commits"] == 2 and rep["n_rows"] > 0
    assert rep["clamped"] > 0 and rep["recluster"] is True
    # correctness unaffected by drift: every staged row is present once
    src = spark.read.parquet(f"{stage}/events_*.parquet")
    assert t.read().count() == src.count()

    # healthy-bounds control: report stays quiet
    t2 = TxTable(spark, str(tmp_path / "zt3"))
    from pm25ml_spark.catalog import load_table
    from pm25ml_spark.operators.zorder import column_bounds

    base = load_table(spark, SF, "events").select(
        "user_id", F.unix_date(F.to_date("ts")).alias("day_int")
    )
    ok = column_bounds(base, ["user_id", "day_int"])
    _drain(spark, stage, t2, ok, str(tmp_path / "chk3"), "zx3_maintain")
    rep2 = zorder_drift_report(t2)
    assert rep2["clamped"] == 0 and rep2["recluster"] is False


def test_typed_zorder_date_and_string_dims(spark):
    """Typed z-dims (round-11 ask #2): date + string columns key
    directly — the rank spec is JSON-able, the key expression stays
    JVM-only, dictionary rank preserves lexicographic order, and NULLs
    in either dim produce NULL keys."""
    import datetime as dt
    import json

    from pm25ml_spark.operators.zorder import (
        typed_zorder_key,
        typed_zorder_key_fixed,
    )

    rows = [
        (dt.date(2024, 1, 1), "click", 1.0),
        (dt.date(2024, 1, 15), "login", 2.0),
        (dt.date(2024, 1, 30), "view", 3.0),
        (None, "click", 4.0),
        (dt.date(2024, 1, 10), None, 5.0),
    ]
    df = spark.createDataFrame(rows, "d date, et string, v double")
    keyed, spec = typed_zorder_key(df, ["d", "et"], bits=8)
    # spec is plain JSON (storable in a txlog commit entry)
    json.dumps(spec)
    assert spec["d"]["kind"] == "date" and spec["et"]["kind"] == "string"
    got = {r.v: r["__z"] for r in keyed.collect()}
    assert got[4.0] is None and got[5.0] is None  # NULL dim → NULL key
    assert None not in (got[1.0], got[2.0], got[3.0])
    # JVM-only plan
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # fixed-spec form reproduces identical keys (streaming contract)
    again = typed_zorder_key_fixed(df, spec, bits=8)
    assert {r.v: r["__z"] for r in again.collect()} == got
    # dictionary rank preserves lexicographic order on the string dim:
    # for a fixed date, earlier strings get smaller keys
    one_day = spark.createDataFrame(
        [(dt.date(2024, 1, 15), s, 0.0) for s in ("click", "login", "view")],
        "d date, et string, v double",
    )
    ks = [
        r["__z"]
        for r in typed_zorder_key_fixed(one_day, spec, bits=8)
        .orderBy("et")
        .collect()
    ]
    assert ks == sorted(ks)


def test_typed_zorder_double_quantile_and_timestamp(spark):
    """Double dims rank by quantile cuts (skew-robust) and timestamp
    dims by epoch seconds; unseen string values clamp to the top cell
    instead of erroring (ingest drift is layout-only)."""
    import datetime as dt

    from pm25ml_spark.operators.zorder import (
        typed_bounds,
        typed_zorder_key_fixed,
    )

    base = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 0, 0, 0), float(x), "a" if x < 50 else "b")
            for x in range(100)
        ],
        "ts timestamp, x double, s string",
    )
    spec = typed_bounds(base, ["ts", "x", "s"])
    assert spec["x"]["kind"] == "double" and len(spec["x"]["cuts"]) >= 1
    assert spec["ts"]["kind"] == "timestamp"
    keyed = typed_zorder_key_fixed(base, spec, bits=8)
    assert keyed.filter(F.col("__z").isNull()).count() == 0
    # quantile rank is monotone in x (same ts/s ⇒ key ordered by x)
    sub = keyed.filter(F.col("s") == "a").orderBy("x").collect()
    zs = [r["__z"] for r in sub]
    assert zs == sorted(zs)
    # unseen dictionary value → top cell, not an error
    drift = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1.0, "zzz-new")], "ts timestamp, x double, s string"
    )
    assert typed_zorder_key_fixed(drift, spec, bits=8).collect()[0]["__z"] is not None


def test_d19_typed_zorder_prunes_on_date_and_string(spark):
    """d19's payoff pin: the typed z-layout (date × string dims) skips
    files for date-only, string-only, and box predicates — and the
    pruned read equals the filtered full scan."""
    import datetime as dt

    from pm25ml_spark.plans.artifacts import staged_table_handle
    from pm25ml_spark.plans.live import _D19_BITS, zorder_events_typed_staged

    zorder_events_typed_staged(spark, SF)
    t = staged_table_handle(spark, SF, "events_zorder_typed", (_D19_BITS,))

    d0, d1 = dt.date(2024, 1, 8), dt.date(2024, 1, 14)
    for preds in (
        {"day": (d0, d1)},
        {"event_type": ("error", "purchase")},
        {"day": (d0, d1), "event_type": ("error", "purchase")},
    ):
        _v, live = t.snapshot()
        # date bounds must be ISO-encoded for the raw stat compare here
        kept = []
        stats = t.file_stats()
        for f in live:
            ok = True
            for col, (lo, hi) in preds.items():
                st = stats.get(f, {}).get(col)
                if st is None or st[0] is None:
                    continue
                elo = lo.isoformat() if isinstance(lo, dt.date) else lo
                ehi = hi.isoformat() if isinstance(hi, dt.date) else hi
                if st[1] < elo or st[0] > ehi:
                    ok = False
                    break
            if ok:
                kept.append(f)
        assert len(live) > 4, "not enough files to demonstrate pruning"
        assert len(kept) < len(live), (
            f"no skip for {preds}: {len(kept)}/{len(live)} files kept"
        )
        got = t.read_pruned_multi(preds)
        full = t.read()
        for col, (lo, hi) in preds.items():
            full = full.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
        key = lambda r: (r["day"], r["event_type"], r["value"])
        assert sorted(map(key, got.collect())) == sorted(
            map(key, full.collect())
        )


def test_typed_zorder_streaming_maintenance_and_dict_drift(spark, tmp_path):
    """The typed clustered copy (d19 layout) is stream-maintainable
    with the same exactly-once stamp protocol, records typed drift
    counters, and an ingest batch carrying a string value OUTSIDE the
    frozen dictionary raises the recluster flag while the rows stay
    exactly right (unseen values clamp to the top cell — layout-only)."""
    import datetime as dt

    from pm25ml_spark.plans.live import _stage_chronological_halves
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.events import read_events_stream
    from pm25ml_spark.streaming.zorder_maintain import (
        maintain_zorder_stream,
        zorder_drift_report,
    )

    stage = _stage_chronological_halves(spark, SF, "zx4")

    def drain(spec, table, chk, qname):
        stream = read_events_stream(
            spark, stage, max_files_per_trigger=1, glob="events_*.parquet"
        )
        proj = stream.select(
            F.to_date("ts").alias("day"), "event_type", "value"
        )
        maintain_zorder_stream(
            proj,
            table,
            spec=spec,
            checkpoint_dir=chk,
            bits=8,
            query_name=qname,
        )

    # healthy: spec frozen over the full dictionary/date range
    full_spec = {
        "day": {"kind": "date", "lo": 19723, "hi": 19752},
        "event_type": {
            "kind": "string",
            "dict": ["click", "error", "purchase", "signup", "view"],
        },
    }
    t = TxTable(spark, str(tmp_path / "tz"))
    drain(full_spec, t, str(tmp_path / "c1"), "zx4_a")
    rep = zorder_drift_report(t)
    assert rep["commits"] == 2 and rep["clamped"] == 0, rep
    # typed stats recorded (date as ISO strings, string min/max)
    stats = t.file_stats()
    assert stats and all("day" in s and "event_type" in s for s in stats.values())
    # a typed box over the maintained copy equals the raw staging data
    box = t.read_pruned_multi(
        {"day": (dt.date(2024, 1, 5), dt.date(2024, 1, 9)),
         "event_type": ("click", "error")}
    )
    src = spark.read.parquet(f"{stage}/events_*.parquet").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    ).filter(
        F.col("day").between(dt.date(2024, 1, 5), dt.date(2024, 1, 9))
        & F.col("event_type").between("click", "error")
    )
    key = lambda r: (r["day"], r["event_type"], float(r["value"]))
    assert sorted(map(key, box.collect())) == sorted(map(key, src.collect()))

    # drift: the frozen dictionary predates the 'view' and 'signup'
    # event types — the ingest raises the recluster flag, rows intact
    stale_spec = {
        "day": {"kind": "date", "lo": 19723, "hi": 19752},
        "event_type": {"kind": "string", "dict": ["click", "error", "purchase"]},
    }
    t2 = TxTable(spark, str(tmp_path / "tz2"))
    drain(stale_spec, t2, str(tmp_path / "c2"), "zx4_b")
    rep2 = zorder_drift_report(t2)
    assert rep2["clamped"] > 0 and rep2["recluster"] is True, rep2
    assert t2.read().count() == spark.read.parquet(
        f"{stage}/events_*.parquet"
    ).count()


def test_recluster_repairs_drift_and_restores_skip(spark, tmp_path):
    """The full drift loop, detect → repair → clean slate: a maintained
    copy whose frozen bounds predate the data raises the recluster
    flag; recluster_zorder re-derives the model, atomically rewrites
    with fresh stats in the SAME commit, rows are untouched, box
    pruning works against the new layout, the drift report resets at
    the model boundary, and a maintainer resumed with the returned
    model ingests clean."""
    from pm25ml_spark.plans.live import _stage_chronological_halves
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.zorder_maintain import (
        recluster_zorder,
        zorder_drift_report,
    )

    stage = _stage_chronological_halves(spark, SF, "zx5")
    stale = {"user_id": (0, 1), "day_int": (19725, 19727)}
    t = TxTable(spark, str(tmp_path / "t"))
    _drain(spark, stage, t, stale, str(tmp_path / "c1"), "zx5_a")
    assert zorder_drift_report(t)["recluster"] is True
    before = sorted(
        (r.user_id, r.day_int, float(r.value))
        for r in t.read().drop("__z").collect()
    )

    v, model = recluster_zorder(t, ["user_id", "day_int"], bits=8)
    assert t.history()[-1]["zorder_model"]["cols"] == ["user_id", "day_int"]
    # rows identical, old layout still time-travels
    after = sorted(
        (r.user_id, r.day_int, float(r.value))
        for r in t.read().drop("__z").collect()
    )
    assert after == before
    assert t.read(version=v - 1).count() == len(before)
    # fresh stats make the box skip real again
    _, live = t.snapshot()
    stats = t.file_stats()
    assert set(stats) == set(live)
    kept, live2 = _kept_files(t, {"user_id": (0, 3)})
    if len(live2) > 2:
        assert len(kept) < len(live2)
    # the fold reset: drift is measured against the NEW model only
    rep = zorder_drift_report(t)
    assert rep["commits"] == 0 and rep["recluster"] is False
    # a maintainer resumed with the returned model ingests clean
    stage2 = _stage_chronological_halves(spark, SF, "zx5b")
    _drain(spark, stage2, t, model, str(tmp_path / "c2"), "zx5_b")
    rep2 = zorder_drift_report(t)
    assert rep2["commits"] == 2 and rep2["clamped"] == 0, rep2


def test_string_join_zorder_thousand_value_dimension(spark, tmp_path):
    """Round-12 ask #6: past STRING_DICT_MAX the rank strategy switches
    to a broadcast dictionary join (kind "string_join") — clustering on
    a thousand-value column (e.g. domain) must work at 100 TB without a
    thousand-entry literal expression. The pin: typed_bounds picks the
    join kind, the keyed plan stays JVM-only, and a string box over the
    laid-out table opens fewer files than the table has."""
    from pm25ml_spark.operators.zorder import (
        STRING_DICT_MAX,
        typed_bounds,
        typed_zorder_key_fixed,
    )
    from pm25ml_spark.sources.txlog import TxTable

    df = spark.range(8000).select(
        F.format_string("dom%04d", F.col("id") % 1000).alias("s"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    spec = typed_bounds(df, ["s"])
    assert spec["s"]["kind"] == "string_join"
    assert len(spec["s"]["dict"]) == 1000 > STRING_DICT_MAX

    keyed = typed_zorder_key_fixed(df, spec, bits=10)
    assert keyed.columns == ["s", "v", "__z"]  # temp rank col dropped
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    # rank strategy is a broadcast hash join, not a shuffle
    assert "BroadcastHashJoin" in plan, plan

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(
        keyed.repartitionByRange(8, F.col("__z")), stats_cols=["s"]
    )
    kept, live = _kept_files(t, {"s": ("dom0100", "dom0149")})
    assert len(live) > 4 and len(kept) < len(live), (len(kept), len(live))
    got = t.read_pruned_multi({"s": ("dom0100", "dom0149")})
    full = t.read().filter(F.col("s").between("dom0100", "dom0149"))
    key = lambda r: (r["s"], r["v"])
    assert sorted(map(key, got.collect())) == sorted(
        map(key, full.collect())
    )

    # below the threshold the literal-map path is still chosen
    small = spark.range(100).select(
        F.format_string("k%d", F.col("id") % 5).alias("s")
    )
    assert typed_bounds(small, ["s"])["s"]["kind"] == "string"


def test_string_join_rank_equals_literal_rank(spark):
    """Crossing STRING_DICT_MAX changes the physical rank strategy,
    never a key value: the same frozen dictionary evaluated through the
    literal-map kind and the broadcast-join kind yields identical
    Morton keys — including the unseen-value top-cell clamp and the
    NULL → NULL-key contract."""
    from pm25ml_spark.operators.zorder import typed_zorder_key_fixed

    d = sorted(f"v{i:03d}" for i in range(300))
    rows = [(x,) for x in d[::7]] + [("zzz-unseen",), (None,)]
    df = spark.createDataFrame(rows, "s string")
    lit_keys = {
        r["s"]: r["__z"]
        for r in typed_zorder_key_fixed(
            df, {"s": {"kind": "string", "dict": d}}, bits=10
        ).collect()
    }
    join_keys = {
        r["s"]: r["__z"]
        for r in typed_zorder_key_fixed(
            df, {"s": {"kind": "string_join", "dict": d}}, bits=10
        ).collect()
    }
    assert join_keys == lit_keys
    assert join_keys[None] is None
    assert join_keys["zzz-unseen"] == max(
        v for v in join_keys.values() if v is not None
    )


def test_double_occupancy_drift_flag_and_recluster_reset(spark, tmp_path):
    """Round-12 ask #5: double z-dims never clamp (their quantile rank
    is total over the reals), so heavy-tailed drift that collapses new
    rows into one cut bucket was invisible. The maintainer now records
    per-commit cut-bucket occupancy; the report folds it into an
    occupancy-skew signal that flags the recluster, and
    recluster_zorder(typed=True) resets it at the model boundary."""
    from pm25ml_spark.plans.live import _stage_chronological_halves
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.events import read_events_stream
    from pm25ml_spark.streaming.zorder_maintain import (
        maintain_zorder_stream,
        recluster_zorder,
        zorder_drift_report,
    )

    stage = _stage_chronological_halves(spark, SF, "zx6")

    def drain(spec, table, chk, qname):
        stream = read_events_stream(
            spark, stage, max_files_per_trigger=1, glob="events_*.parquet"
        )
        proj = stream.select(
            F.to_date("ts").alias("day"), "event_type", "value"
        )
        maintain_zorder_stream(
            proj, table, spec=spec, checkpoint_dir=chk, bits=8,
            query_name=qname,
        )

    # frozen cuts that predate the data's range: every ingested value
    # exceeds every cut, so the whole stream lands in the TOP bucket —
    # zero clamping, maximal occupancy skew
    stale = {
        "day": {"kind": "date", "lo": 19723, "hi": 19752},
        "value": {"kind": "double", "cuts": [-3.0, -2.0, -1.0]},
    }
    t = TxTable(spark, str(tmp_path / "t"))
    drain(stale, t, str(tmp_path / "c1"), "zx6_a")
    rep = zorder_drift_report(t)
    assert rep["clamped"] == 0, "double dims must not clamp"
    assert rep["occupancy_skew"]["value"] > 0.99, rep
    assert rep["recluster"] is True, rep

    # the repair verb re-derives equal-mass cuts and resets the fold
    _v, model = recluster_zorder(
        t, ["day", "value"], bits=8, typed=True
    )
    assert len(model["value"]["cuts"]) > 4
    rep2 = zorder_drift_report(t)
    assert rep2["commits"] == 0 and rep2["recluster"] is False

    # maintenance resumed with the fresh model: occupancy re-balances
    # (equal-mass cuts over the same distribution), signal stays clear
    stage2 = _stage_chronological_halves(spark, SF, "zx6b")
    stream2_stage = stage2

    def drain2(spec, table, chk, qname):
        stream = read_events_stream(
            spark, stream2_stage, max_files_per_trigger=1,
            glob="events_*.parquet",
        )
        proj = stream.select(
            F.to_date("ts").alias("day"), "event_type", "value"
        )
        maintain_zorder_stream(
            proj, table, spec=spec, checkpoint_dir=chk, bits=8,
            query_name=qname,
        )

    drain2(model, t, str(tmp_path / "c2"), "zx6_b")
    rep3 = zorder_drift_report(t)
    assert rep3["commits"] == 2
    assert rep3["worst_occupancy_skew"] < 0.5, rep3
    assert rep3["recluster"] is False, rep3


def test_string_join_drift_counters_and_recluster(spark, tmp_path):
    """The high-cardinality path composes with the maintenance loop:
    typed_drift_row detects unseen values for a string_join dim through
    the broadcast membership join (never a dictionary-sized literal),
    and recluster_zorder(typed=True) on a >256-cardinality column
    re-derives a string_join spec, rewrites atomically, and restores
    the skip with fresh stats."""
    from pm25ml_spark.operators.zorder import typed_bounds
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.zorder_maintain import (
        recluster_zorder,
        typed_drift_row,
    )

    corpus = spark.range(4000).select(
        F.format_string("dom%04d", F.col("id") % 400).alias("s"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    spec = typed_bounds(corpus, ["s"])
    assert spec["s"]["kind"] == "string_join"

    # a refresh batch carrying values OUTSIDE the frozen dictionary
    batch = spark.createDataFrame(
        [("dom0001", 1.0), ("zzz-new-a", 2.0), ("zzz-new-b", 3.0),
         (None, 4.0)],
        "s string, v double",
    )
    d = typed_drift_row(batch, spec)
    assert d["n_rows"] == 4 and d["clamped"] == 2 and d["nulls"] == 1, d

    # recluster over a high-cardinality column: fresh string_join spec,
    # rows invariant, stats skip works against the new layout
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(corpus.repartition(8))
    n_before = t.read().count()
    _v, model = recluster_zorder(t, ["s"], bits=10, typed=True)
    assert model["s"]["kind"] == "string_join"
    assert len(model["s"]["dict"]) == 400
    assert t.read().count() == n_before
    kept, live = _kept_files(t, {"s": ("dom0010", "dom0039")})
    assert len(live) > 4 and len(kept) < len(live), (len(kept), len(live))
    got = t.read_pruned_multi({"s": ("dom0010", "dom0039")})
    full = t.read().filter(F.col("s").between("dom0010", "dom0039"))
    assert got.count() == full.count() > 0
