"""Physical-plan assertions — the scale contract, enforced in CI.

A plan that passes row-count checks but scans every column, shuffles
needlessly, or sort-merge-joins a dimension table is wrong at 100 TB even
if correct at sf0.001. These tests pin the properties that matter:
predicate pushdown into the parquet scan, column pruning, broadcast joins
for dimensions, and exchange reuse across window frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pm25ml_spark.plans.registry import QUERIES, load_all_plans

load_all_plans()


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q06_filters_pushed_to_scan(spark, sf_dir):
    df = QUERIES["q06_forecast_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan
    # the range predicates must reach the parquet reader
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_q01_column_pruning(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    plan = physical_plan(df)
    # ReadSchema must not include columns the query never touches
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_q02_dimensions_broadcast(spark, sf_dir):
    df = QUERIES["q02_region_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # nation and region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q14_part_broadcast_no_smj(spark, sf_dir):
    df = QUERIES["q14_promo_share"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_w01_single_exchange_for_both_frames(spark, sf_dir):
    """Both rolling frames share one (user_id, ts) sort/partition — the
    plan must not shuffle twice."""
    df = QUERIES["w01_rolling_means"](spark, sf_dir)
    plan = physical_plan(df)
    n_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_exchanges == 1, plan[:2000]


def test_metadata_profile_never_reads_payload(spark):
    from pm25ml_spark.sources.multimodal import (
        metadata_only_profile,
        synthesize_media_table,
    )

    media = synthesize_media_table(spark, n=8)
    plan = optimized_plan(metadata_only_profile(media))
    before_agg = plan.split("Aggregate", 1)[0]
    assert "payload" not in before_agg


def test_whole_stage_codegen_on_agg_path(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes THIS dataframe's plan on execution
    plan = physical_plan(df)
    assert "isFinalPlan=true" in plan
    # "*(N)" prefixes mark WholeStageCodegen stages in the compact form
    assert "*(1)" in plan and "*(2)" in plan
    # partial aggregation (map-side combine) before the exchange
    assert "partial_sum" in plan


@pytest.mark.parametrize("name", ["q09_user_day_scaffold", "d03_feature_chain"])
def test_scaffold_day_side_broadcast(spark, sf_dir, name):
    """The day scaffold (≤ a few thousand rows) must be the broadcast side
    of the cross join, never a shuffled one."""
    df = QUERIES[name](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ss04_probe_table_broadcast(spark, sf_dir):
    """The (query, centroid) probe table is tiny; the inverted-list join
    must broadcast it — a shuffled probe join would move every candidate
    row at 10^9-vector scale."""
    df = QUERIES["ss04_ivf_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dd03_no_cartesian_product(spark, sf_dir):
    """Prefix-filtered Jaccard must candidate-join on the shingle key —
    never fall back to a cartesian pair explosion."""
    df = QUERIES["dd03_jaccard_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dd06_tiles_not_cross_join(spark, sf_dir):
    """Blocked all-pairs cosine: block-pair replication is ONE broadcast
    join of the 36-row pair table (OR-condition → BroadcastNestedLoop
    over 36 rows, then a side-explode); the n x n cross product must
    never appear, and the embeddings subtree must be scanned once."""
    df = QUERIES["dd06_embedding_neardup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Scan parquet") == 1  # single pass over embeddings


def test_d05_regex_projection_prunes_scan(spark, sf_dir):
    """Regex projection resolves driver-side, so Catalyst must prune the
    events scan to the columns the projected families need."""
    df = QUERIES["d05_regex_projection"](spark, sf_dir)
    plan = physical_plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "user_id" in read_schema
    # payload columns never touched by the projected families
    assert "props" not in read_schema and "event_id" not in read_schema


def test_bucketed_join_eliminates_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed+sorted on the join key must SortMergeJoin with
    ZERO Exchange — the write-time shuffle is amortized against every
    downstream join (the wide-combine/feature stages join the same keys
    repeatedly)."""
    from pm25ml_spark.sources.archive import BucketedStorage

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    bs = BucketedStorage(spark)
    bs.write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    bs.write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8)
    # disable broadcast so the test exercises the big-table plan shape the
    # bucketing exists for (at sf0.001 everything fits a broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bs.read_table("b_orders").join(
            bs.read_table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan, plan[:1500]
        assert "Exchange" not in plan, plan[:1500]
        # sanity: the join actually returns the right rows
        assert joined.count() == orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dd09_blocking_is_equi_join(spark, sf_dir):
    """dd09's candidate generation must hash-join on the block key.

    The Levenshtein threshold and the doc_id< inequality are residual
    predicates ON an equi join — if they leaked into the join strategy
    the plan would degrade to BroadcastNestedLoop/Cartesian, which is
    quadratic shuffle at corpus scale.
    """
    df = QUERIES["dd09_editdist_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_cp02_decontamination_broadcasts_benchmark(spark, sf_dir):
    """The benchmark n-gram side is eval-suite-sized by contract: the
    flagging join must be a broadcast hash join (zero corpus shuffle)."""
    df = QUERIES["cp02_decontamination"](spark, sf_dir)
    assert "BroadcastHashJoin" in physical_plan(df)


def test_ss06_nn_join_no_cartesian(spark, sf_dir):
    """The bucketed NN join must stay an equi-join on the cell key — a
    cartesian/BNL product here is the exact failure mode the operator
    exists to avoid."""
    df = QUERIES["ss06_nn_bucketed_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_m01_fold_map_broadcasts(spark, sf_dir):
    """The fold map is distinct-group-sized: its join back onto the full
    frame must broadcast, never shuffle the corpus."""
    df = QUERIES["m01_group_folds"](spark, sf_dir)
    assert "BroadcastHashJoin" in physical_plan(df)


def test_iv01_interval_join_no_cartesian(spark, sf_dir):
    """The interval join must be a bucketed equi-join with the range
    predicate residual — the cartesian/BNL plan it exists to avoid."""
    df = QUERIES["iv01_session_error_overlap"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cp03_within_cluster_join_is_equi(spark, sf_dir):
    """SemDeDup's whole point is the candidate restriction: the pair
    join must be an equi-join on the cluster id. The only BNL allowed is
    the intentional centroid-assignment broadcast (centroids are
    corpus/stride-sized); a CartesianProduct anywhere means the
    restriction was lost."""
    df = QUERIES["cp03_semantic_dedup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_w08_decimation_has_no_single_partition_window(spark, sf_dir):
    """W7's catalog query must run the partitioned exact form: a global
    Window.orderBy here would funnel the whole input through one task."""
    df = QUERIES["w08_decimate_100"](spark, sf_dir)
    plan = physical_plan(df)
    # every window must be the per-__bucket local rank (parallel), never
    # a global orderBy frame
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    assert specs, "expected the per-bucket local rank window"
    for spec in specs:
        assert "__bucket" in spec, f"unpartitioned window in w08: {spec}"
    # row-pure bucket exchange, not repartitionByRange (whose per-job
    # boundary resample caused the r6 w08 red)
    assert "hashpartitioning(__bucket" in plan
    assert "rangepartitioning" not in plan.lower()


def test_cp03_assignment_has_no_window(spark, sf_dir):
    """The centroid argmax must be the map-side-combinable max(struct)
    aggregate, NOT row_number over the exploded n×k frame: a Window
    there shuffles corpus×centroids rows (round-5 finding). Any Window
    in cp03's plan means the assignment regressed."""
    df = QUERIES["cp03_semantic_dedup"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Window" not in plan
    # partial aggregation proof: HashAggregate appears on both sides of
    # the exchange for the argmax (merge_max + partial_max)
    assert "partial_max" in plan or "HashAggregate" in plan


def test_sk01_recount_join_is_broadcast(spark, sf_dir):
    """The heavy-hitter recount must semi-join the corpus against the
    BROADCAST candidate set — a sort-merge join there would re-shuffle
    the full token stream and defeat the sketch's purpose."""
    df = QUERIES["sk01_heavy_hitters"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the MG summarizer runs ONCE: since r13 the candidates+totals frame
    # is persisted and its two consumers (candidate set, global N) read
    # the cache, so explain prints the MapInPandas node once per
    # InMemoryRelation DEFINITION — every occurrence must sit inside a
    # cached subtree, never as a live re-execution path
    n_mg = plan.count("MapInPandas")
    assert n_mg >= 1
    assert n_mg == plan.count("InMemoryRelation"), plan


def test_sk02_hll_is_jvm_only(spark, sf_dir):
    """The HLL register pipeline is pure JVM bit arithmetic: no Python
    workers anywhere, and the register combine is a partial-aggregable
    hash aggregate (map-side max before the m-row exchange)."""
    df = QUERIES["sk02_hll_distinct"](spark, sf_dir)
    plan = physical_plan(df)
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_ss07_pq_is_broadcast_pipeline_with_one_prune_kernel(spark, sf_dir):
    """PQ ADC over the STAGED code index (r9): the query plan reads the
    staged codes table — ZERO Python kernels at query time (the encode
    near-argmin prune runs once in the index build, pinned below) — and
    the LUT join broadcasts; no cartesian, no sort-merge. The corpus
    side moves through narrow map + partial-agg stages only."""
    df = QUERIES["ss07_pq_adc_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 0  # index staged, not rebuilt
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the index BUILD plan keeps exactly ONE Arrow kernel (the K×
    # near-argmin winnower); the decision fold stays JVM-side, visible
    # as the broadcast join after the kernel
    from pm25ml_spark.operators import similarity as S
    from pm25ml_spark.plans.similarity import (
        _PQ_M,
        _PQ_OFFSET,
        _PQ_SD,
        _PQ_STRIDE,
        _qc,
    )

    _, _, c = _qc(spark, sf_dir)
    csubs = S.pq_codebook_subspaces(c, _PQ_M, _PQ_SD, _PQ_STRIDE, _PQ_OFFSET)
    build_plan = physical_plan(S.pq_encode(c, csubs, _PQ_M, _PQ_SD))
    assert build_plan.count("MapInPandas") == 1
    assert "BroadcastHashJoin" in build_plan
    assert "SortMergeJoin" not in build_plan


def test_ss08_rerank_fetch_is_broadcast(spark, sf_dir):
    """Stage-2 exact re-rank must FETCH shortlisted vectors via broadcast
    joins (shortlist and probe sides both tiny) — never rescan/shuffle
    the corpus a second time."""
    df = QUERIES["ss08_pq_rerank_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_t15_fim_is_pure_projection(spark, sf_dir):
    """FIM is row-local: the plan must contain NO exchange at all — a
    100 TB corpus is transformed at scan speed with zero shuffle."""
    df = QUERIES["t15_fim_transform"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_sk03_probe_join_is_broadcast(spark, sf_dir):
    """The d·w counter table (bounded size by construction) must reach
    the probe side as a BroadcastHashJoin, never a sort-merge."""
    df = QUERIES["sk03_countmin"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sk04_kmv_joins_are_equi(spark, sf_dir):
    """Sketch-sketch intersection joins on h (hash-equi); the only
    cross-join is over the per-group theta frame (|groups|² rows)."""
    df = QUERIES["sk04_kmv_intersection"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_t11_repetition_no_cartesian(spark, sf_dir):
    df = QUERIES["t11_repetition_signals"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan


def test_ss09_multitable_join_is_bucket_equi(spark, sf_dir):
    """The L-table union must still reach the corpus through a (tbl,
    bucket) equi-join with the probe side broadcast — never a cartesian,
    never a corpus-side sort-merge."""
    df = QUERIES["ss09_lsh_multitable_top1"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.slow
def test_lsh_query_plans_read_staged_postings(spark, sf_dir):
    """ss03/ss09 read the build-once staged postings table (r10): the
    query-time plan must scan the raw embeddings parquet exactly ONCE
    (the query side) — the corpus-side L×n_planes signature pass runs in
    the index build, once per corpus version, never per query. Two plans
    per query pin both halves: scan count at query time, and postings
    built exactly once across repeated invocations."""
    from pm25ml_spark.plans.artifacts import BUILD_COUNTS

    for name, n_planes, n_tables in [
        ("ss03_lsh_bucket_top1", 6, 1),
        ("ss09_lsh_multitable_top1", 8, 4),
    ]:
        df = QUERIES[name](spark, sf_dir)
        plan = physical_plan(df)
        # one scan of embeddings.parquet (queries) + one of the staged
        # postings TxTable — never a second raw-corpus scan
        assert plan.count("Scan parquet") == 2, name
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
        art = f"lsh_postings_p{n_planes}x{n_tables}"
        builds_before = BUILD_COUNTS.get(art, 0)
        assert builds_before >= 1, art
        QUERIES[name](spark, sf_dir)  # re-plan: must hit the stage memo
        assert BUILD_COUNTS.get(art, 0) == builds_before, art
        # postings carry `cl` for the filtered consumer; unfiltered
        # probes must not read it — Catalyst prunes it from the scan
        read_schemas = [
            seg.split("\n", 1)[0]
            for seg in plan.split("ReadSchema:")[1:]
        ]
        assert read_schemas and not any("cl" in s for s in read_schemas), name


def test_ss15_filtered_probe_shares_ss03_artifact(spark, sf_dir):
    """Filtered search (ss15) must read the SAME staged postings build
    as ss03 (one index, two probe shapes — no second corpus signing),
    keep the label predicate inside the bucket join (pre-filter: a
    Filter on ql = cl below the ranking window), and stay Python-free
    with broadcast-only joins."""
    from pm25ml_spark.plans.artifacts import BUILD_COUNTS

    QUERIES["ss03_lsh_bucket_top1"](spark, sf_dir)
    builds_before = BUILD_COUNTS.get("lsh_postings_p6x1", 0)
    df = QUERIES["ss15_filtered_lsh_top2"](spark, sf_dir)
    assert BUILD_COUNTS.get("lsh_postings_p6x1", 0) == builds_before
    plan = physical_plan(df)
    assert plan.count("Scan parquet") == 2
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the metadata predicate reaches the index: Catalyst folds ql = cl
    # into the JOIN KEYS (candidates of the wrong label never leave the
    # hash join) and pushes the implied isnotnull(cl) into the postings
    # scan — the pre-filter evaluated at the index, not after ranking
    import re

    assert re.search(r"BroadcastHashJoin \[cl#\d+, tbl#", plan), plan[:600]
    assert "isnotnull(cl#" in plan


# ---- catalog-wide unpartitioned-window audit ------------------------------
#
# An unpartitioned WindowExec funnels its whole input through ONE task — a
# corpus-cardinality frame there is the single worst scale bug a plan can
# hide (round-6 finding on t10). This audit walks the physical plan of
# EVERY catalog query and fails on any unpartitioned WindowExec unless the
# query is allowlisted with a bounded-input justification, turning the
# bench-tail "No Partition Defined for Window" warnings into signal.

# query -> (max allowed unpartitioned WindowExec nodes, why it's bounded)
_BOUNDED_GLOBAL_WINDOWS = {
    # final top-k over ≤ k·salts lane survivors (two-level prune)
    "a04_weighted_sample": (1, "A-ES final top-k over ≤ k·64 lane survivors"),
    "t10_bm25_top10": (1, "BM25 final top-10 over ≤ 10·64 lane survivors"),
    "sk03_countmin": (2, "top-20 probes over ≤ 20·32 lane survivors"),
    # dimension-sized frames
    "w13_cumulative_unique_users": (1, "day-keyed aggregate (calendar-bounded)"),
    "m01_group_folds": (1, "dense_rank over DISTINCT group keys (dimension)"),
    "m06_lift_table": (3, "cumulative gain over the 10 decile rows + r9 in-plan bucket offsets (≤ num_buckets rows; 2 window nodes per prefix sum after exchange reuse)"),
    "m04_roc_auc": (1, "bucket-offset running sum over ≤ num_buckets rows"),
    "gr04_bfs_hops": (1, "seed top-3 over ≤ 3·64 lane survivors"),
    # r9: ordered_prefix_sum computes bucket offsets IN-PLAN — the
    # exclusive running sum over the ≤ num_buckets per-bucket totals is
    # an unpartitioned window over a bounded (≤ 32-row) frame, replacing
    # the former driver-side totals collect (one fewer job per prefix
    # sum). One window per prefix sum in the plan.
    "t13_sequence_packing": (1, "bucket-offset running sum over ≤ num_buckets rows"),
    "t14_chunk_language_mix": (1, "bucket-offset running sum over ≤ num_buckets rows"),
    "w08_decimate_100": (1, "bucket-offset running sum over ≤ num_buckets rows"),
    "m10_ks_drift": (2, "two composed prefix sums, each ≤ num_buckets offset rows"),
    "dd14_sorted_neighborhood": (1, "bucket-offset running sum over ≤ num_buckets rows"),
}


def _walk_physical(node):
    yield node
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # initialPlan (post-EnsureRequirements), NOT inputPlan: the
        # pre-preparation tree hides exchanges, so audits that count
        # Exchange-adjacent structure would see a truncated plan.
        # WindowExec/CartesianProductExec exist in both, but walk the
        # fuller tree so future audits inherit the right basis.
        yield from _walk_physical(node.initialPlan())
        return
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk_physical(it.next())


@pytest.fixture(scope="module")
def catalog_plan_census(spark, sf_dir):
    """Per-query physical-plan node counts for the catalog-wide audits,
    built ONCE and shared: building a lifecycle query's plan RUNS its
    setup (txlog commits, stream drains), so walking the whole catalog
    costs ~100 s — the two audits below used to pay it twice (the single
    largest item in the verify driver's pytest budget)."""
    census = {}
    for name, fn in QUERIES.items():
        cart = unpart = 0
        for n in _walk_physical(
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        ):
            simple = n.getClass().getSimpleName()
            if simple == "CartesianProductExec":
                cart += 1
            elif simple == "WindowExec" and n.partitionSpec().size() == 0:
                unpart += 1
        census[name] = {"cartesians": cart, "unpart_windows": unpart}
    return census


def test_no_unbounded_unpartitioned_windows_anywhere(catalog_plan_census):
    offenders = {}
    for name, counts in catalog_plan_census.items():
        allowed = _BOUNDED_GLOBAL_WINDOWS.get(name, (0, ""))[0]
        if counts["unpart_windows"] > allowed:
            offenders[name] = counts["unpart_windows"]
    assert not offenders, (
        f"unpartitioned WindowExec over a potentially unbounded frame in: "
        f"{offenders} — either repartition the window, apply the "
        f"global_topk two-level prune, or allowlist with a bounded-input "
        f"justification"
    )


def test_m03_a08_single_aggregate_with_partial(spark, sf_dir):
    """The sufficient-statistics aggregates must be ONE hash aggregate
    with map-side combine (partial_count/partial_sum before the single
    exchange) — the shuffle carries |groups| rows, not the input."""
    for name in ("m03_ols_by_flag", "a08_group_moments"):
        df = QUERIES[name](spark, sf_dir)
        plan = physical_plan(df)
        assert plan.count("Exchange") == 1, name
        assert "partial_sum" in plan or "partial_count" in plan, name
        assert "SortMergeJoin" not in plan and "Window" not in plan, name


def test_q22_scalar_threshold_broadcast_anti_join(spark, sf_dir):
    """Q22 shape: the 1-row scalar threshold joins via broadcast (never a
    shuffled NLJ) and the "never ordered" test is a broadcast/shuffled
    ANTI join, not a cartesian."""
    df = QUERIES["q22_sales_opportunity"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_k03_idw_is_bucketed_equi_join(spark, sf_dir):
    """IDW candidates come from the 3x3 cell equi-join — never a
    cartesian or a broadcast nested loop over the source table."""
    df = QUERIES["k03_idw_regrid"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_t17_chunker_is_pure_narrow_projection(spark, sf_dir):
    """The sliding-window chunker must be shuffle-free: split + sequence
    + explode + slice are all narrow — zero Exchange at any corpus size."""
    df = QUERIES["t17_sliding_chunks"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_t16_novelty_no_cartesian(spark, sf_dir):
    df = QUERIES["t16_ngram_novelty"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ss10_ivfpq_corpus_joins_are_equi_lut_broadcast(spark, sf_dir):
    """IVFADC: the two corpus-sized joins (codes x assignment on cid,
    scoring vs the probe LUT on (cen,s,code)) must be equi-joins with
    the LUT broadcast; nothing quadratic, no cartesian."""
    df = QUERIES["ss10_ivfpq_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_d07_forward_asof_is_single_shuffle_union_window(spark, sf_dir):
    """The forward as-of must stay the union+window shape: no range
    join, no cartesian — one Window over the key partitioning."""
    df = QUERIES["d07_next_purchase_asof"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1
    assert "Union" in plan


def test_gr03_kcore_never_broadcasts_node_tables(spark, sf_dir):
    """Every peel round shuffles on node id; the keep-set joins are
    semi joins, and no node-sized table rides a broadcast nested loop."""
    df = QUERIES["gr03_kcore_members"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_m04_auc_has_no_unpartitioned_window(spark, sf_dir):
    """The rank-sum AUC must get its cum-counts from the bucketed
    prefix-sum operator — no global WindowExec, so the plan survives an
    unbounded score domain."""
    df = QUERIES["m04_roc_auc"](spark, sf_dir)
    plan = physical_plan(df)
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    assert specs, "expected the per-bucket local prefix-sum window"
    for spec in specs:
        assert "__bucket" in spec, f"unpartitioned window in m04 plan: {spec}"


def test_dd12_no_cartesian_product(spark, sf_dir):
    """Containment candidates must equi-join contained-side prefixes
    against the full shingle index on the shingle key — never a
    cartesian pair explosion (the probe side cannot prefix-prune, so
    the ONLY thing keeping this sub-quadratic is the keyed join)."""
    df = QUERIES["dd12_containment_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d09_stack_feeds_hash_aggregates(spark, sf_dir):
    """The full stacked frame (|rows| x |columns|) must meet HASH
    aggregates only: a combined countDistinct + string min/max agg
    degenerates into a (column, value)-keyed SortAggregate sorting the
    whole stacked frame serially per input split (measured 30 s vs
    ~4 s at sf0.1). String min/max (immutable agg buffer — never
    hash-able) is allowed only downstream of the hash-distinct, where
    the sort touches |distinct| rows. Structural check: every
    Generate(stack) node's direct consumer is a HashAggregate."""
    import re

    df = QUERIES["d09_column_profile"](spark, sf_dir)
    lines = physical_plan(df).splitlines()

    def indent(ln):
        return len(ln) - len(ln.lstrip(" +-:*"))

    gen_rows = [i for i, ln in enumerate(lines) if "Generate stack" in ln]
    assert gen_rows, "stack/Generate node not found"
    for i in gen_rows:
        # walk up the ancestor chain (strictly decreasing indentation)
        # past row-narrow pass-throughs to the first aggregate node
        cur = indent(lines[i])
        agg = None
        for ln in reversed(lines[:i]):
            if indent(ln) >= cur:
                continue
            cur = indent(ln)
            node = re.sub(r"^[\s+\-:*]*", "", ln)
            if "Aggregate" in node:
                agg = node
                break
            assert node.startswith(("Filter", "Project", "ColumnarToRow")), (
                f"unexpected node between stack and its aggregate: {node!r}"
            )
        assert agg is not None and agg.startswith("HashAggregate"), (
            f"stacked frame meets {agg!r}, not a HashAggregate"
        )


def test_gr05_assortativity_equi_joins_only(spark, sf_dir):
    """Degree attachment must be node-keyed equi-joins (deg is
    node-sized — broadcasting it is the gr01 round-6 wart); the
    sufficient-stats aggregate is one scalar row."""
    df = QUERIES["gr05_degree_assortativity"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is legal: the 1-row sufficient-stats
    # frame crossed with the 1-row (n_nodes, max_deg) summary — both
    # scalar by construction. The deg-attach joins must stay keyed.
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_a10_weighted_median_is_window_free(spark, sf_dir):
    """The whole point of the bucketed weighted median: NO window sort
    anywhere — the oracle's cumulative-weight window is replaced by
    range buckets + a single-bucket kernel."""
    df = QUERIES["a10_weighted_median_price"](spark, sf_dir)
    assert "WindowExec" not in physical_plan(df)


def test_d10_join_runs_on_salted_key(spark, sf_dir):
    """The hot-key join must actually execute on the composite
    (event_type, __salt) key — if the salt column were dropped before
    the join the query would still be CORRECT (the oracle is the plain
    join) while silently losing the skew spread."""
    df = QUERIES["d10_salted_hot_join"](spark, sf_dir)
    assert "__salt" in physical_plan(df)


def test_dd13_no_cartesian_product(spark, sf_dir):
    """Winnowing-pair candidates must equi-join on the fingerprint key
    after the df-cap prune — never a cartesian pair explosion."""
    df = QUERIES["dd13_winnowing_pairs"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dd14_rank_join_is_equi_and_window_free(spark, sf_dir):
    """Sorted-neighborhood pairs come from an EQUI-join on the global
    rank (rank+j explode), never a cartesian or range self-join; the
    rank itself comes from ordered_prefix_sum (bucket-partitioned
    windows only — the catalog-wide audit enforces the rest)."""
    df = QUERIES["dd14_sorted_neighborhood"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mm01_payload_never_leaves_python_boundary(spark, sf_dir):
    """The multimodal pipeline must scan ONLY doc_id from documents (the
    payload is synthesized executor-side) — at 100 TB the text column
    would be dead I/O on every media pass."""
    df = QUERIES["mm01_image_decode_stats"](spark, sf_dir)
    plan = physical_plan(df)
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "doc_id" in read_schema
    assert "text" not in read_schema and "lang" not in read_schema


def test_sk05_windows_all_partitioned(spark, sf_dir):
    """The quantile sketch's rank windows run per (group, lane) and per
    group over ≤ k sampled rows — never an unpartitioned corpus frame."""
    df = QUERIES["sk05_sample_quantiles"](spark, sf_dir)
    jplan = df._jdf.queryExecution().executedPlan()
    for n in _walk_physical(jplan):
        if n.getClass().getSimpleName() == "WindowExec":
            assert n.partitionSpec().size() > 0, "unpartitioned window in sk05"


def test_q24_dims_broadcast_no_cartesian(spark, sf_dir):
    """Q7 shape: every dimension side broadcasts; the only shuffle join
    is lineitem ⋈ orders on orderkey; the disjunctive cross-nation
    predicate must never degrade to a cartesian."""
    df = QUERIES["q24_volume_shipping"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # supp, cust, n1, n2


def test_q25_dims_broadcast_no_cartesian(spark, sf_dir):
    df = QUERIES["q25_market_share"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # part, cust-in-region, supp


def test_q26_threshold_broadcast_no_extra_shuffle(spark, sf_dir):
    """Q17 shape: the per-part threshold frame must broadcast back onto
    the fact scan (decorrelated correlated-subquery plan)."""
    df = QUERIES["q26_small_qty_revenue"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- catalog-wide no-CartesianProduct audit --------------------------------
#
# Per-query no-cartesian pins exist for the pair-emitting families above;
# this audit extends the guarantee to EVERY catalog query: a
# CartesianProduct anywhere means a blocking/banding/broadcast strategy
# silently degraded (e.g. a join condition stopped being an equi-join
# after a refactor) — at corpus scale that's a |n|² explosion. Scalar
# one-row cross joins compile to BroadcastNestedLoopJoin with a 1-row
# build side, which is fine and NOT flagged by this audit; only true
# CartesianProductExec nodes fail.
def test_no_cartesian_product_anywhere(catalog_plan_census):
    offenders = {
        name: counts["cartesians"]
        for name, counts in catalog_plan_census.items()
        if counts["cartesians"]
    }
    assert not offenders, (
        f"CartesianProduct in: {offenders} — a join lost its equi-key or "
        f"a broadcast hint was dropped; restore the blocked/banded/"
        f"broadcast strategy"
    )


def test_w23_rank_filter_becomes_window_group_limit(spark, sf_dir):
    """The rank<=k filter must compile to the two-phase WindowGroupLimit
    (a Partial limit keeping a k-row heap per map partition BEFORE the
    exchange, plus the Final after): the shuffle then carries <= k rows
    per (group, input partition) instead of every purchase. Losing this
    rewrite (e.g. by materializing rk before filtering) silently turns
    a top-k query back into a full-corpus shuffle."""
    df = QUERIES["w23_top3_per_user"](spark, sf_dir)
    nodes = [
        n.getClass().getSimpleName()
        for n in _walk_physical(
            df._jdf.queryExecution().executedPlan()
        )
    ]
    n_wgl = sum(1 for s in nodes if s == "WindowGroupLimitExec")
    assert n_wgl == 2, (
        f"expected Partial+Final WindowGroupLimitExec, got {n_wgl} in {nodes}"
    )


def test_plan_census_is_fresh():
    """PLAN_CENSUS.json must cover the whole current catalog — a new
    @query without a census walk means the 0-cartesian / allowlisted-
    window audit silently excludes it (the r8 gap: 4 queries added
    after the last census run). Regenerate with
    `python tools/plan_census.py`."""
    import json
    import pathlib

    census_path = (
        pathlib.Path(__file__).resolve().parents[1] / "PLAN_CENSUS.json"
    )
    doc = json.loads(census_path.read_text())
    missing = sorted(set(QUERIES) - set(doc["queries"]))
    assert doc["n_queries"] == len(QUERIES) and not missing, (
        f"census covers {doc['n_queries']}/{len(QUERIES)} queries; "
        f"missing: {missing[:10]} — rerun tools/plan_census.py"
    )
    errs = {
        n: c["error"] for n, c in doc["queries"].items() if "error" in c
    }
    assert not errs, f"census walk errored on: {errs}"


def test_ss04_ivf_query_plan_is_python_free(spark, sf_dir):
    """IVF over the STAGED inverted-list table (r10): the query-time
    plan reads staged lists — zero Python kernels (the assign kernel
    runs once in the index build), broadcast probe + query joins, JVM
    cosine, no cartesian/sort-merge."""
    df = QUERIES["ss04_ivf_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 0
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the index BUILD is exactly the one Arrow assign kernel
    from pm25ml_spark.operators import similarity as S
    from pm25ml_spark.plans.similarity import _qc

    _, _, c = _qc(spark, sf_dir)
    build_plan = physical_plan(
        S.ivf_assign(c, centroid_stride=100, centroid_offset=7)
    )
    assert build_plan.count("MapInPandas") == 1


def test_ss10_ivfpq_query_plan_is_python_free(spark, sf_dir):
    """IVFADC over the STAGED residual codebook + code table (r10):
    query-time is LUT broadcast join + decimal ADC aggregate + window —
    zero Python kernels; the coarse-assign and PQ-encode kernels live in
    the one-time staged builds."""
    df = QUERIES["ss10_ivfpq_top3"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 0
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ss13_incremental_ivf_query_plan_is_python_free(spark, sf_dir):
    """IVF over the INCREMENTALLY-maintained staged lists (r10): same
    Python-free broadcast query shape as ss04."""
    df = QUERIES["ss13_incremental_ivf_top2"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 0
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_lsh_probe_expression_stays_subquadratic(spark, sf_dir):
    """r11 regression pin for the probe-side expression blowup: the
    multi-table probe must compute its L signatures once per row
    (signature array + posexplode + mask explode = exactly TWO Generate
    nodes). The old shape — tables × masks probe structs each inlining
    the ~(planes × dim)-term signature tree via CollapseProject — was a
    ~76k-node expression at (4 tables, h=2) and an 8× query-time
    regression; one Generate with a giant struct array would recreate
    it."""
    df = QUERIES["ss09_lsh_multitable_top1"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Generate ") == 2, plan.count("Generate ")
