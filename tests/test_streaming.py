"""Structured Streaming operators drained with AvailableNow and checked
against their batch duals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pm25ml_spark.catalog import load_table
from pm25ml_spark.streaming.events import (
    read_events_stream,
    run_available_now,
    session_windows,
    sliding_user_activity,
    windowed_counts,
)


@pytest.fixture()
def events_stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def test_windowed_counts_match_batch(spark, sf_dir, events_stream, tmp_path):
    out = windowed_counts(events_stream, window="6 hours", watermark="1 hour")
    run_available_now(out, "win_counts", str(tmp_path))
    got = spark.table("win_counts")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert got.count() == batch.count()
    assert got.agg(F.sum("n")).first()[0] == load_table(spark, sf_dir, "events").count()


def test_sliding_windows_run(spark, events_stream, tmp_path):
    out = sliding_user_activity(events_stream, "12 hours", "6 hours", "1 hour")
    run_available_now(out, "sliding", str(tmp_path))
    got = spark.table("sliding")
    assert got.count() > 0
    assert set(got.columns) == {"window_start", "user_id", "n", "mean_value"}


def test_session_windows_match_batch_sessionize(spark, sf_dir, events_stream, tmp_path):
    out = session_windows(events_stream, gap="30 minutes", watermark="1 hour")
    run_available_now(out, "sessions", str(tmp_path))
    got = spark.table("sessions")
    # total events conserved across sessions
    assert got.agg(F.sum("n_events")).first()[0] == load_table(
        spark, sf_dir, "events"
    ).count()
    # session count equals the batch w09 sessionize plan's count
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    batch_sessions = QUERIES["w09_sessionize"](spark, sf_dir).count()
    assert got.count() == batch_sessions


def test_streaming_dedup_across_microbatches(spark, sf_dir, tmp_path):
    """The same file fed twice as two micro-batches: every event_id is a
    cross-batch duplicate, so the dedup state (bounded by the watermark)
    must drop the entire second batch."""
    import shutil

    from pm25ml_spark.streaming.events import dedup_stream

    src = f"{sf_dir}/events.parquet"
    shutil.copy(src, str(tmp_path / "events1.parquet"))
    shutil.copy(src, str(tmp_path / "events2.parquet"))
    stream = read_events_stream(
        spark, str(tmp_path), max_files_per_trigger=1, glob="events*.parquet"
    )
    out = dedup_stream(stream, watermark="10 days", keys=("event_id",))
    run_available_now(out, "dedup_stream", str(tmp_path), output_mode="append")
    got = spark.table("dedup_stream")
    n_distinct = (
        load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    )
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_stateful_user_totals_accumulate_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: the same file fed as two micro-batches must
    produce running totals that end at exactly 2x the single-file batch
    aggregate (state carries across batches)."""
    import shutil

    from pm25ml_spark.streaming.events import stateful_user_totals

    src = f"{sf_dir}/events.parquet"
    shutil.copy(src, str(tmp_path / "ev1.parquet"))
    shutil.copy(src, str(tmp_path / "ev2.parquet"))
    stream = read_events_stream(
        spark, str(tmp_path), max_files_per_trigger=1, glob="ev*.parquet"
    )
    out = stateful_user_totals(stream)
    run_available_now(out, "stateful_totals", str(tmp_path), output_mode="update")
    got = spark.table("stateful_totals")
    # last (= max n_events) update per user is the final running total
    final = {
        r.user_id: (r.n_events, r.total_value)
        for r in got.orderBy("n_events").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("tv"),
        )
    )
    for r in batch.collect():
        n, tv = final[r.user_id]
        assert n == 2 * r.n, (r.user_id, n, r.n)
        assert abs(tv - 2 * r.tv) < 1e-6


def test_contamination_stream_matches_batch(spark, tmp_path, sf_dir):
    """Stream-static decontamination drains to the same per-doc hit
    counts as the batch cp02 operator."""
    from pm25ml_spark.operators.dedup import contamination_hits
    from pm25ml_spark.streaming.events import (
        contamination_stream,
        read_documents_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    corpus_stream = read_documents_stream(spark, sf_dir).filter(
        F.col("source") != "src0"
    )
    stream = contamination_stream(corpus_stream, bench, n=2)
    run_available_now(
        stream, "contam", str(tmp_path), output_mode="append"
    )
    got = (
        spark.table("contam")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("gram").alias("n_spans"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = (
        contamination_hits(
            docs.filter(F.col("source") != "src0"), bench, n=2
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(expect)


def test_contamination_stream_bloom_matches_plain_stream(spark, tmp_path, sf_dir):
    """The Bloom-prefiltered streaming dual emits EXACTLY the rows the
    broadcast-set streaming dual does (no false negatives; verify join
    removes false positives), micro-batch by micro-batch."""
    from pm25ml_spark.operators.bloom import build_bloom_bitset, optimal_params
    from pm25ml_spark.operators.dedup import word_ngrams
    from pm25ml_spark.streaming.events import (
        contamination_stream,
        contamination_stream_bloom,
        read_documents_stream,
        run_available_now,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    bench_g = bench.select(F.explode(word_ngrams("text", 2)).alias("gram")).distinct()
    m, k = optimal_params(bench_g.count(), 0.01)
    bitset = build_bloom_bitset(bench_g, "gram", m, k)

    corpus_stream = read_documents_stream(spark, sf_dir).filter(
        F.col("source") != "src0"
    )
    run_available_now(
        contamination_stream(corpus_stream, bench, n=2),
        "contam_plain_b", str(tmp_path / "a"), output_mode="append",
    )
    corpus_stream2 = read_documents_stream(spark, sf_dir).filter(
        F.col("source") != "src0"
    )
    run_available_now(
        contamination_stream_bloom(corpus_stream2, bitset, k, bench, n=2),
        "contam_bloom_b", str(tmp_path / "b"), output_mode="append",
    )
    plain = {
        (r.doc_id, r.gram) for r in spark.table("contam_plain_b").collect()
    }
    bloom = {
        (r.doc_id, r.gram) for r in spark.table("contam_bloom_b").collect()
    }
    assert plain == bloom and len(plain) > 0


@pytest.mark.slow
def test_hll_register_stream_matches_batch(spark, tmp_path, sf_dir):
    """HLL registers maintained over a 3-micro-batch document stream
    equal the batch registers over the same corpus — the streaming-agg
    spelling of the merge property, with state fixed at m rows."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.dedup import word_ngrams
    from pm25ml_spark.operators.sketches import hll_estimate, hll_registers
    from pm25ml_spark.streaming.events import (
        hll_register_stream,
        run_available_now,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    # split the corpus into 3 files → 3 micro-batches
    docs.withColumn("part", F.col("doc_id") % 3).repartition(
        "part"
    ).write.partitionBy("part").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    regs = hll_register_stream(stream, n=2, p=6)
    run_available_now(regs, "hll_regs", str(tmp_path), output_mode="complete")
    got = {
        (r.bucket, r.max_rho) for r in spark.table("hll_regs").collect()
    }
    bg = docs.select(F.explode(word_ngrams("text", 2)).alias("b"))
    want_regs = hll_registers(bg, "b", 6)
    want = {(r.bucket, r.max_rho) for r in want_regs.collect()}
    assert got == want
    # identical registers → identical estimate at any point-in-time read
    est_stream = hll_estimate(spark.table("hll_regs")).collect()[0].estimate
    est_batch = hll_estimate(want_regs).collect()[0].estimate
    assert est_stream == est_batch


def test_heavy_hitter_stream_candidates_recount_exact(spark, tmp_path, sf_dir):
    """Union of per-micro-batch MG candidates, recounted exactly against
    the static corpus, equals the batch heavy-hitter answer — the
    pigeonhole superset argument across stream segmentation."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.dedup import word_ngrams
    from pm25ml_spark.operators.sketches import exact_heavy_hitters
    from pm25ml_spark.streaming.events import (
        heavy_hitter_candidate_stream,
        run_available_now,
    )

    k = 800
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_hh")
    docs.withColumn("part", F.col("doc_id") % 3).repartition(
        "part"
    ).write.partitionBy("part").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cands = heavy_hitter_candidate_stream(stream, k=k, n=2)
    run_available_now(cands, "hh_cands", str(tmp_path), output_mode="append")
    cand = spark.table("hh_cands").distinct()
    bg = docs.select(F.explode(word_ngrams("text", 2)).alias("b"))
    total = bg.agg(F.count(F.lit(1)).alias("n_total"))
    recount = (
        bg.join(F.broadcast(cand), "b")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n") * k > F.col("n_total"))
        .select("b", "n")
    )
    want = {(r.b, r.n) for r in exact_heavy_hitters(bg, "b", k).collect()}
    got = {(r.b, r.n) for r in recount.collect()}
    assert want and got == want


@pytest.mark.slow
def test_cm_counter_stream_matches_batch(spark, tmp_path, sf_dir):
    """Count-Min counters maintained over a 3-micro-batch stream equal
    the batch counter table over the same corpus (sum-mergeability as a
    streaming aggregate), so point estimates agree snapshot-for-batch."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.dedup import word_ngrams
    from pm25ml_spark.operators.sketches import cm_counters, cm_estimate
    from pm25ml_spark.streaming.events import (
        cm_counter_stream,
        run_available_now,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.withColumn("part", F.col("doc_id") % 3).repartition(
        "part"
    ).write.partitionBy("part").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    d, w = 4, 256
    counters = cm_counter_stream(stream, n=2, d=d, w=w)
    run_available_now(counters, "cm_cnt", str(tmp_path), output_mode="complete")
    got = {(r.r, r.c, r.n) for r in spark.table("cm_cnt").collect()}
    bg = docs.select(F.explode(word_ngrams("text", 2)).alias("b"))
    batch = cm_counters(bg, "b", d=d, w=w)
    assert got == {(r.r, r.c, r.n) for r in batch.collect()}
    probes = bg.distinct().limit(30)
    est_s = cm_estimate(probes, spark.table("cm_cnt"), "b", d=d, w=w)
    est_b = cm_estimate(probes, batch, "b", d=d, w=w)
    assert {(r.b, r.cm_est) for r in est_s.collect()} == {
        (r.b, r.cm_est) for r in est_b.collect()
    }


@pytest.mark.slow
def test_kmv_sketch_stream_matches_batch_bottomk(spark, tmp_path, sf_dir):
    """The stateful bottom-k stream (O(k) state per group) converges to
    the batch kmv_bottomk over the same rows — the KMV merge is
    order-independent, so micro-batch segmentation must not matter."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.sketches import kmv_bottomk
    from pm25ml_spark.streaming.events import (
        kmv_sketch_stream,
        run_available_now,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.withColumn("part", F.col("doc_id") % 3).repartition(
        "part"
    ).write.partitionBy("part").parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    k = 32
    sk = kmv_sketch_stream(stream, k=k, n=2, group="source")
    run_available_now(sk, "kmv_sk", str(tmp_path), output_mode="update")
    # the documented consumption contract: per group, take the max-seq
    # emission (update sinks accumulate every emission) and explode h
    final: dict[str, list] = {}
    best_seq: dict[str, int] = {}
    for r in spark.table("kmv_sk").collect():
        if r.seq > best_seq.get(r.source, -1):
            best_seq[r.source] = r.seq
            final[r.source] = sorted(r.h)

    from pm25ml_spark.operators.dedup import word_ngrams

    sbg = docs.select(
        "source", F.explode(word_ngrams("text", 2)).alias("b")
    )
    want = kmv_bottomk(sbg, "b", "source", k)
    want_by_g: dict[str, list] = {}
    for r in want.collect():
        want_by_g.setdefault(r.source, []).append(r.h)
    for g, hs in want_by_g.items():
        assert final[g] == sorted(hs), f"group {g} sketch mismatch"

    # and the exploded max-seq rows feed the batch theta consumer
    # directly, as the docstring promises
    from pyspark.sql import Row

    from pm25ml_spark.operators.sketches import kmv_theta

    exploded = spark.createDataFrame(
        [Row(source=g, h=int(h)) for g, hs in final.items() for h in hs]
    )
    th_stream = {r.source: (r.n_k, r.theta, r.est_distinct)
                 for r in kmv_theta(exploded, "source", k).collect()}
    th_batch = {r.source: (r.n_k, r.theta, r.est_distinct)
                for r in kmv_theta(want, "source", k).collect()}
    assert th_stream == th_batch


@pytest.mark.slow
def test_stream_stream_attribution_matches_batch(spark, tmp_path, sf_dir):
    """Stream-stream watermarked interval join == the static join, with
    the events deliberately split across 3 micro-batches (time-ordered
    files, generous watermark) so cross-batch state buffering is
    actually exercised: a view in batch 1 must still match a purchase
    arriving in batch 3."""
    from pm25ml_spark.streaming.events import (
        read_events_stream,
        view_purchase_attribution,
    )

    ev = load_table(spark, sf_dir, "events")
    # three time-ordered FLAT files (path order == arrival order): write
    # each slice to a scratch dir, then move its single part file into
    # the source dir under an ordered name
    import glob as _glob
    import os
    import shutil

    cuts = ["2024-01-11", "2024-01-21"]
    src = str(tmp_path / "src")
    os.makedirs(src)
    slices = [
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    ]
    for i, sl in enumerate(slices):
        scratch = str(tmp_path / f"scratch{i}")
        sl.coalesce(1).write.parquet(scratch)
        (part,) = _glob.glob(f"{scratch}/part-*.parquet")
        shutil.move(part, f"{src}/{i:02d}.parquet")

    stream = read_events_stream(spark, src, glob="*.parquet")
    out = view_purchase_attribution(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        horizon="1 hour",
        watermark="31 days",  # exact-equality drain: never drop state
    )
    run_available_now(out, "attribution", str(tmp_path), output_mode="append")
    got = {
        tuple(r)
        for r in spark.table("attribution")
        .select("user_id", "view_event", "purchase_event", "lag_us")
        .collect()
    }

    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event"),
    )
    want = {
        tuple(r)
        for r in v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 hour")),
        )
        .select(
            F.col("v_user").alias("user_id"),
            "view_event",
            "purchase_event",
            (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("lag_us"),
        )
        .collect()
    }
    assert len(want) > 0  # the fixture data must actually produce matches
    assert got == want


def test_catalog_drain_never_mutates_caller_session(spark):
    """The st-family queries build their streams in an isolated child
    session (plans/live._isolated): the caller's shuffle-partition conf
    must be bit-identical before/after a drain, and no streaming query
    may remain active on the caller's session."""
    from pm25ml_spark.plans.registry import QUERIES, load_all_plans

    load_all_plans()
    before = spark.conf.get("spark.sql.shuffle.partitions")
    out = QUERIES["st02_stream_hourly_volume"](spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert not spark.streams.active  # drain ran on the child, not here
    # the result frame is bound to the child session, proving isolation
    assert out.sparkSession is not spark


@pytest.mark.slow
def test_stream_maintained_dup_edges(spark, tmp_path):
    """Streaming foreachBatch maintenance of the dup-edge artifact:
    after draining a 3-way split of the corpus, the edge table equals
    the from-scratch pair list; every edge's src_batch is the batch of
    its later-arriving endpoint; one commit per micro-batch on both
    tables; and restarting the drained query from its checkpoint is a
    no-op (no duplicate appends)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pm25ml_spark.catalog import load_table
    from pm25ml_spark.operators import dedup as D
    from pm25ml_spark.sources.txlog import TxTable
    from pm25ml_spark.streaming.dedup_maintain import (
        maintain_dup_edges_stream,
        read_documents_stream,
    )

    sf = "/root/testdata/sf0.001"
    stage = str(tmp_path / "src")
    os.makedirs(stage)
    tbl = pq.read_table(f"{sf}/documents.parquet")
    # 3-way split by doc_id % 3, mtime-ordered
    rem = pc.subtract(
        tbl["doc_id"], pc.multiply(pc.divide(tbl["doc_id"], 3), 3)
    )
    for i in range(3):
        dst = f"{stage}/documents_{i}.parquet"
        pq.write_table(tbl.filter(pc.equal(rem, i)), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    shingle_t = TxTable(spark, str(tmp_path / "sh"))
    edges_t = TxTable(spark, str(tmp_path / "ed"))
    chk = str(tmp_path / "chk")
    stream = read_documents_stream(
        spark, stage, max_files_per_trigger=1, glob="documents_*.parquet"
    )
    maintain_dup_edges_stream(
        stream, shingle_t, edges_t, query_name="maint_t", checkpoint_dir=chk
    )

    rows = edges_t.read().collect()
    got = {
        (r.doc_a, r.doc_b, r.shared, round(r.jaccard, 9)) for r in rows
    }
    docs = load_table(spark, sf, "documents")
    want = {
        (r.doc_a, r.doc_b, r.shared, round(r.jaccard, 9))
        for r in D.jaccard_pairs(docs, n=3, t_num=3, t_den=5).collect()
    }
    assert got == want and got

    # provenance: batch of the later-arriving endpoint (batch = id % 3,
    # arrival order = mtime order = 0,1,2)
    for r in rows:
        assert r.src_batch == max(r.doc_a % 3, r.doc_b % 3), r

    # one commit per micro-batch on both tables
    assert len(shingle_t.versions()) == 3
    assert len(edges_t.versions()) == 3
    # the store shingled each doc exactly once
    ids = [r.doc_id for r in shingle_t.read().select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == docs.count()

    # restart from the drained checkpoint: AvailableNow finds nothing
    stream2 = read_documents_stream(
        spark, stage, max_files_per_trigger=1, glob="documents_*.parquet"
    )
    maintain_dup_edges_stream(
        stream2, shingle_t, edges_t, query_name="maint_t2", checkpoint_dir=chk
    )
    assert len(edges_t.versions()) == 3  # no duplicate appends
