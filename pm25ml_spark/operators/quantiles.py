"""Exact distributed quantiles — order statistics WITHOUT a global sort.

``approxQuantile`` trades error for speed; the reference's Polars stack
computes exact quantiles in-memory. This operator gets EXACT order
statistics at cluster scale with two narrow jobs and no corpus-wide
sort, built on the row-pure range buckets of
:mod:`pm25ml_spark.operators.bucketize` (the same primitive that fixed
the r6 prefix-sum nondeterminism):

1. Bucket counts (one aggregation job, ≤ num_buckets rows to the
   driver) → cumulative offsets locate WHICH bucket holds each
   requested global rank, and the rank's offset within it.
2. A second job filters to ONLY the rank-containing buckets (≤ one per
   requested quantile — the other buckets are never scanned past the
   filter), sorts each within its task, and picks the local ranks.

The value at global rank k under ``ORDER BY value`` is well-defined
even with duplicate values (any tie order yields the same k-th VALUE),
so the result is engine-portable with no tie-break column. Rank
convention: ``k_p = max(1, ceil(p * n))`` — p = 0 → minimum, p = 1 →
maximum, matching ``SELECT v ... ORDER BY v LIMIT 1 OFFSET k-1``.

Memory per task is one bucket (tunable via ``num_buckets``), never the
frame; at 100 TB the plan reads the column once for counts and once
filtered down to the probed buckets.
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pm25ml_spark.operators.bucketize import range_bucket_column
from pm25ml_spark.operators.cache import release_with

# Above this many (bucket, group) tally rows the bucketed algorithm's
# driver collect stops being "a few MB" — but a group count that large
# also means each group is SMALL (corpus/|groups| rows), which is
# exactly the regime where a per-group window sort is the right plan:
# every window partition fits a task and the sort parallelizes across
# groups. The two plans trade off on the same axis, so the tally count
# is the natural switch.
DEFAULT_MAX_DRIVER_TALLIES = 1_000_000


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    ps: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Return a DataFrame ``(p double, value <col type>)`` with the
    exact ``max(1, ceil(p*n))``-rank order statistic per requested p.
    Null values are excluded (SQL aggregate semantics)."""
    import pandas as pd

    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    vals = df.select(value_col).filter(F.col(value_col).isNotNull())
    # three scans (split sampling, bucket counts, pick) — persist the
    # single-column projection so upstream work evaluates once (same
    # rationale as operators/prefix.py; spillable, value column only)
    vals = vals.persist(StorageLevel.MEMORY_AND_DISK)
    bucket_expr, _ = range_bucket_column(vals, [value_col], nparts)
    tagged = vals.withColumn("__bucket", bucket_expr)
    counts = (
        tagged.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    sizes = {int(r["__bucket"]): int(r["n"]) for r in counts}
    n = sum(sizes.values())
    out_schema = f"p double, value {dict(df.dtypes)[value_col]}"
    if n == 0:
        vals.unpersist(False)  # the empty result never reads the cache
        return spark.createDataFrame([], out_schema)

    # driver-side rank → (bucket, local_rank); dict keeps ≤ len(ps) rows
    targets: dict[int, list[tuple[float, int]]] = {}
    for p in ps:
        k = min(max(1, math.ceil(p * n)), n)
        acc = 0
        for b in sorted(sizes):
            if k <= acc + sizes[b]:
                targets.setdefault(b, []).append((float(p), k - acc))
                break
            acc += sizes[b]
    btargets = spark.sparkContext.broadcast(targets)
    needed = sorted(targets)

    def pick(key, pdf):
        b = int(key[0])
        want = btargets.value.get(b, [])
        if not want:
            return pd.DataFrame({"p": [], "value": []})
        v = pdf[value_col].sort_values(kind="mergesort").to_numpy()
        return pd.DataFrame(
            {"p": [p for p, _ in want], "value": [v[r - 1] for _, r in want]}
        )

    out = (
        tagged.filter(F.col("__bucket").isin(needed))
        .groupBy("__bucket")
        .applyInPandas(pick, out_schema)
    )
    return release_with(out, vals)  # cache lives as long as the plan


def _canon_key(x):
    """Canonicalize NaN group keys: nan != nan would fragment one logical
    group (Spark groupBy normalizes NaN) into many dict keys with partial
    tallies."""
    return "\0nan" if isinstance(x, float) and math.isnan(x) else x


def _attach_gid(df, gkey: DataFrame, group_cols) -> DataFrame:
    """Attach the driver-assigned ``__gid`` via a broadcast null-safe
    equi-join on the group columns.

    The pick kernels must NOT match group values inside pandas: Arrow
    renders SQL NULL as NaN for float columns, so a NULL-key and a
    NaN-key group become indistinguishable there and can steal each
    other's rows. Spark-side ``<=>`` distinguishes them exactly
    (NULL <=> NULL true, NaN = NaN true per Spark semantics,
    NULL <=> NaN false). A broadcast hash join on the |groups|-row gid
    frame costs O(1) per row regardless of group count — a CASE chain
    over the groups would be O(|groups|) per row and blow up codegen
    at the documented ~10^5-group bound.
    """
    cond = None
    for c in group_cols:
        e = df[c].eqNullSafe(gkey[c])
        cond = e if cond is None else cond & e
    out = df.join(F.broadcast(gkey), cond)
    for c in group_cols:
        out = out.drop(gkey[c])
    return out


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    num_partitions: int | None = None,
    max_driver_tallies: int = DEFAULT_MAX_DRIVER_TALLIES,
    splits: list[tuple] | None = None,
) -> DataFrame:
    """Per-GROUP exact order statistics — ``(group_cols..., p double,
    value <col type>)`` with the same ``max(1, ceil(p*n))`` rank
    convention as :func:`exact_quantiles`, computed WITHOUT a per-group
    window sort (few-large-groups path) or WITH one (many-small-groups
    fallback — see ``max_driver_tallies``).

    Why not ``row_number() OVER (PARTITION BY group)``: with few large
    groups (the common profiling shape — a handful of event types over
    the whole corpus) each window partition is corpus/|groups| rows
    through ONE task. Here the range buckets are keyed on the VALUE
    column alone: the algorithm only needs bucket ids monotone in value
    WITHIN each group (per-bucket tallies are keyed ``(bucket,
    group_cols...)`` and the pick kernel filters by group inside the
    bucket), so group columns never enter the bucket key. That keeps
    every group spread across many buckets, removes any NULL-group-key
    hot bucket, and — for numeric values — routes split sampling
    through the JVM ``approxQuantile`` fast path instead of the generic
    Arrow sampler (measured 3.6 s → sub-second on the sf0.1 lineitem
    key). The driver holds the per-(bucket, group) tallies (≤
    num_buckets × |groups| rows — the one driver-size term that grows
    with group count). When the tally count exceeds
    ``max_driver_tallies`` the operator switches to the per-group
    WINDOW formulation instead of collecting: that many tallies means
    many small groups, where one window partition per group is the
    scale-correct plan (each partition ≈ corpus/|groups| rows). The
    collect is bounded by ``take(max_driver_tallies + 1)`` either way,
    so the driver never materializes an unbounded tally set.
    NULL and NaN group keys each form their own single group (SQL
    GROUP BY / Spark NaN-normalization semantics); NULL values are
    excluded (aggregate semantics).
    """
    import pandas as pd

    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    vals = df.select(*group_cols, value_col).filter(
        F.col(value_col).isNotNull()
    )
    # sampled + tallied + picked: persist the keys+value projection so
    # a derived input (e.g. the MAD pass's |x - median| broadcast join)
    # evaluates once instead of three times
    vals = vals.persist(StorageLevel.MEMORY_AND_DISK)
    # caller-provided splits skip the sampling pass (balance-only knob;
    # see range_bucket_column)
    bucket_expr, _ = range_bucket_column(vals, [value_col], nparts, splits=splits)
    tagged = vals.withColumn("__bucket", bucket_expr)
    counts = (
        tagged.groupBy("__bucket", *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .take(max_driver_tallies + 1)
    )
    dtypes = dict(df.dtypes)
    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in group_cols]
        + ["p double", f"value {dtypes[value_col]}"]
    )
    if not counts:
        vals.unpersist(False)
        return spark.createDataFrame([], out_schema)
    if len(counts) > max_driver_tallies:
        return release_with(
            _grouped_quantiles_windowed(vals, group_cols, value_col, ps),
            vals,
        )

    per_group: dict[tuple, list[tuple[int, int]]] = {}
    raw_key: dict[tuple, tuple] = {}
    for r in counts:
        g_raw = tuple(r[c] for c in group_cols)
        g = tuple(_canon_key(x) for x in g_raw)
        raw_key.setdefault(g, g_raw)
        per_group.setdefault(g, []).append((int(r["__bucket"]), int(r["n"])))
    # Group keys round-trip through a DRIVER-built gid table, not the
    # pandas output: pandas→Arrow treats float NaN as missing, so a NaN
    # group key emitted from pick() would silently become NULL (and
    # collide with a genuine NULL-key group). Rows carry the gid as a
    # Spark-computed int attached by _attach_gid; the |groups|-row gid frame
    # re-attaches the keys exactly on the way out.
    gids = {g: i for i, g in enumerate(per_group)}
    # bucket -> [(gid, p, local_rank)]
    targets: dict[int, list[tuple[int, float, int]]] = {}
    for g, lst in per_group.items():
        lst.sort()
        n = sum(c for _, c in lst)
        for p in ps:
            k = min(max(1, math.ceil(p * n)), n)
            acc = 0
            for b, c in lst:
                if k <= acc + c:
                    targets.setdefault(b, []).append(
                        (gids[g], float(p), k - acc)
                    )
                    break
                acc += c
    btargets = spark.sparkContext.broadcast(targets)
    needed = sorted(targets)

    def pick(key, pdf):
        want = btargets.value.get(int(key[0]), [])
        cols = ["__gid", "p", "value"]
        if not want:
            return pd.DataFrame(columns=cols)
        rows = []
        for gid, p, lr in want:
            v = (
                pdf.loc[pdf["__gid"] == gid, value_col]
                .sort_values(kind="mergesort")
                .to_numpy()
            )
            rows.append((gid, p, v[lr - 1]))
        return pd.DataFrame(rows, columns=cols)

    gdf = spark.createDataFrame(
        [(i, *raw_key[g]) for g, i in gids.items()],
        ", ".join(["__gid int"] + [f"`{c}` {dtypes[c]}" for c in group_cols]),
    )
    picked = (
        _attach_gid(tagged.filter(F.col("__bucket").isin(needed)), gdf, group_cols)
        .groupBy("__bucket")
        .applyInPandas(pick, f"__gid int, p double, value {dtypes[value_col]}")
    )
    out = picked.join(F.broadcast(gdf), "__gid").select(
        *group_cols, "p", "value"
    )
    return release_with(out, vals)


def _grouped_quantiles_windowed(
    vals: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
) -> DataFrame:
    """Many-small-groups fallback: one window partition per group.

    Identical contract and rank convention as the bucketed path —
    ``k_p = min(max(1, ceil(p*n)), n)`` — spelled as ``row_number``
    per group joined against a broadcast p-list. Every window is
    PARTITIONED BY the group columns (the plan-quality audit's
    requirement); with |groups| ≫ cores each partition is small and the
    sort parallelizes across groups, which is exactly the regime this
    path is selected for. Duplicate values yield the same k-th VALUE
    under any tie order, so no tie-break column is needed.
    """
    spark = vals.sparkSession
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    gw = Window.partitionBy(*group_cols)
    ranked = vals.select(
        *group_cols,
        F.col(value_col).alias("value"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(gw).alias("__n"),
    )
    pdf = spark.createDataFrame([(float(p),) for p in ps], "p double")
    k = F.least(
        F.greatest(F.lit(1).cast("long"), F.ceil(F.col("p") * F.col("__n"))),
        F.col("__n"),
    )
    return (
        ranked.join(F.broadcast(pdf))
        .filter(F.col("__rn") == k)
        .select(*group_cols, "p", "value")
    )


def _grouped_weighted_median_windowed(
    vals: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Many-small-groups fallback for the weighted median: per-group
    window over the pre-rounded DECIMAL(38,6) weights. The inclusive
    cumulative decimal sum is order-independent at the crossing VALUE
    (intra-tie order can move which ROW crosses, never which value),
    and the single decimal→double conversion for ``w_total`` matches
    the bucketed path's one-rounding contract. Expects ``vals`` to
    already carry ``__w6`` and be filtered to positive finite weights.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(value_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gw = Window.partitionBy(*group_cols)
    marked = vals.select(
        *group_cols,
        F.col(value_col),
        (F.sum("__w6").over(w) * 2 >= F.sum("__w6").over(gw)).alias("__hit"),
        F.count(F.lit(1)).over(gw).alias("__n"),
        F.sum("__w6").over(gw).alias("__tot"),
    )
    return (
        marked.filter(F.col("__hit"))
        .groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("wmedian"),
            F.max("__n").cast("bigint").alias("n"),
            F.max("__tot").cast("double").alias("w_total"),
        )
    )


def grouped_weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    num_partitions: int | None = None,
    max_driver_tallies: int = DEFAULT_MAX_DRIVER_TALLIES,
) -> DataFrame:
    """Per-group WEIGHTED median — the smallest value ``v`` whose
    inclusive cumulative weight reaches half the group total
    (``2·cumw(v) >= totw``), computed without a per-group window sort.

    The length-weighted median document, the quantity-weighted median
    price: the weighted generalization every mixture audit needs, with
    the same scale shape as :func:`grouped_exact_quantiles` — range
    buckets keyed on the VALUE alone (monotone-in-value within every
    group is all the walk needs; tallies are keyed (bucket, group)),
    so one corpus-sized group spans many buckets, no task ever sorts
    more than a bucket, and numeric values take the JVM
    ``approxQuantile`` split fast path.

    Exactness: weights are rounded to 6 dp and summed as DECIMAL(38,6)
    (order-independent), then compared as scaled int64 micro-units in
    the per-bucket kernel — every comparison is integer-exact, so the
    crossing value is engine-portable bit-for-bit. Rows with
    non-positive or NULL weight carry no mass and are excluded up
    front (a negative weight would make cumulative weight non-monotone
    and the median ill-defined). Returns
    ``(group_cols..., wmedian <value type>, n bigint, w_total double)``.
    """
    import pandas as pd

    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    # NaN weights sort above 0 in Spark comparisons, so `> 0` alone
    # would let them through to poison the decimal sums — exclude them
    # with the NULLs and non-positives
    wd = F.col(weight_col).cast("double")
    vals = df.select(*group_cols, value_col, weight_col).filter(
        F.col(value_col).isNotNull() & (wd > 0) & ~F.isnan(wd)
    )
    vals = vals.persist(StorageLevel.MEMORY_AND_DISK)
    w6 = F.round(F.col(weight_col), 6).cast("decimal(38,6)")
    bucket_expr, _ = range_bucket_column(vals, [value_col], nparts)
    tagged = vals.withColumn("__bucket", bucket_expr).withColumn("__w6", w6)
    counts = (
        tagged.groupBy("__bucket", *group_cols)
        .agg(F.sum("__w6").alias("w"), F.count(F.lit(1)).alias("n"))
        .take(max_driver_tallies + 1)
    )
    dtypes = dict(df.dtypes)
    out_cols = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in group_cols]
        + [f"wmedian {dtypes[value_col]}", "n bigint", "w_total double"]
    )
    if not counts:
        vals.unpersist(False)
        return spark.createDataFrame([], out_cols)
    if len(counts) > max_driver_tallies:
        return release_with(
            _grouped_weighted_median_windowed(
                tagged.drop("__bucket"), group_cols, value_col
            ),
            vals,
        )

    def _micro(dec) -> int:
        # DECIMAL(38,6) -> exact integer micro-units (scale 6, so
        # dec * 10^6 is integral by construction)
        return int((dec * 1_000_000).to_integral_value())

    per_group: dict[tuple, list[tuple[int, int, int]]] = {}
    raw_key: dict[tuple, tuple] = {}
    dec_total: dict[tuple, object] = {}
    for r in counts:
        g_raw = tuple(r[c] for c in group_cols)
        g = tuple(_canon_key(x) for x in g_raw)
        raw_key.setdefault(g, g_raw)
        per_group.setdefault(g, []).append(
            (int(r["__bucket"]), _micro(r["w"]), int(r["n"]))
        )
        dec_total[g] = r["w"] if g not in dec_total else dec_total[g] + r["w"]
    gids = {g: i for i, g in enumerate(per_group)}
    # bucket -> [(gid, offset_micro, total_micro)]
    targets: dict[int, list[tuple[int, int, int]]] = {}
    stats: dict[int, tuple[int, int]] = {}
    for g, lst in per_group.items():
        lst.sort()
        tot = sum(w for _, w, _ in lst)
        n_rows = sum(n for _, _, n in lst)
        stats[gids[g]] = (n_rows, tot)
        acc = 0
        for b, w, _ in lst:
            if 2 * (acc + w) >= tot:
                targets.setdefault(b, []).append((gids[g], acc, tot))
                break
            acc += w
    btargets = spark.sparkContext.broadcast(targets)
    needed = sorted(targets)

    def pick(key, pdf):
        import numpy as np

        want = btargets.value.get(int(key[0]), [])
        cols = ["__gid", "wmedian"]
        if not want:
            return pd.DataFrame(columns=cols)
        rows = []
        for gid, offset, tot in want:
            sub = pdf[pdf["__gid"] == gid].sort_values(
                value_col, kind="mergesort"
            )
            # micro-units from the SAME __w6 decimals the driver summed
            # — re-rounding the raw float here would use numpy's
            # half-even rule against Spark's HALF_UP and the crossing
            # row could miss the driver-computed threshold entirely
            wi = np.fromiter(
                (_micro(d) for d in sub["__w6"]),
                dtype=np.int64,
                count=len(sub),
            )
            cum = offset + np.cumsum(wi)
            hit = sub[value_col].to_numpy()[2 * cum >= tot]
            rows.append((gid, hit[0]))
        return pd.DataFrame(rows, columns=cols)

    # w_total: one correctly-rounded Decimal->double conversion — the
    # same rounding DuckDB's CAST(SUM(...) AS DOUBLE) performs
    gdf = spark.createDataFrame(
        [
            (i, *raw_key[g], stats[i][0], float(dec_total[g]))
            for g, i in gids.items()
        ],
        ", ".join(
            ["__gid int"]
            + [f"`{c}` {dtypes[c]}" for c in group_cols]
            + ["n bigint", "w_total double"]
        ),
    )
    picked = (
        _attach_gid(
            tagged.filter(F.col("__bucket").isin(needed)),
            gdf.select("__gid", *group_cols),
            group_cols,
        )
        .groupBy("__bucket")
        .applyInPandas(pick, f"__gid int, wmedian {dtypes[value_col]}")
    )
    out = picked.join(F.broadcast(gdf), "__gid").select(
        *group_cols, "wmedian", "n", "w_total"
    )
    return release_with(out, vals)
