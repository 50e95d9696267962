"""Window-function plans (SURVEY §2.5 W1-W7 + §2.4 A6/A7) over `events`.

The reference's windows are all partition-by + physical-row frames over
date-sorted data (Polars ``rolling_mean(n).over(key)``); Spark's window spec
subsumes the explicit pre-sorts. Frame means use the decimal-sum/count
split so ``min_samples=1`` (Polars default in W1/W2) and cross-engine
determinism both hold.

Every window orders by ``(ts, event_id)`` — event_id breaks timestamp ties
so both engines see identical frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pm25ml_spark.catalog import load_table
from pm25ml_spark.functions.exact import DEC, davg, dsum, dsum_expr
from pm25ml_spark.plans.registry import query

_WIN = "PARTITION BY user_id ORDER BY ts, event_id"


def _user_window():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def _frame_mean(col: str, w: Window, lo: int) -> "F.Column":
    """Rolling mean over rows [lo, 0] with min_samples=1 (W1 semantics:
    feature_generation/generate.py:71-79 — mean of whatever is present)."""
    frame = w.rowsBetween(lo, 0)
    return F.sum(F.col(col).cast(DEC)).over(frame).cast("double") / F.count(col).over(
        frame
    )


# --------------------------------------------------------------------------
# W1/W2 — short + long rolling means per key (generate.py:71-89).
@query(
    "w01_rolling_means",
    f"""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w7 AS DOUBLE) / COUNT(value) OVER w7 AS roll7,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w30 AS DOUBLE) / COUNT(value) OVER w30 AS roll30
    FROM events
    WINDOW w7 AS ({_WIN} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
           w30 AS ({_WIN} ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def w01_rolling_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = _user_window()
    return ev.select(
        "event_id",
        _frame_mean("value", w, -6).alias("roll7"),
        _frame_mean("value", w, -29).alias("roll30"),
    )


# --------------------------------------------------------------------------
# W5 — rolling mean with min_samples=window_size + repeat-detector flag
# (setup/pm25_filters.py:26-44): null until the frame is full, then flag
# rows whose value sits within 0.05 of the 5-row mean.
@query(
    "w02_repeat_detector",
    f"""
    SELECT event_id,
           CASE WHEN COUNT(value) OVER w5 = 5
                THEN CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w5 AS DOUBLE) / 5
                ELSE NULL END AS roll5,
           CASE WHEN COUNT(value) OVER w5 = 5
                 AND ABS(value - CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w5 AS DOUBLE) / 5) < 0.05
                THEN 1 ELSE 0 END AS is_repeat
    FROM events
    WINDOW w5 AS ({_WIN} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
)
def w02_repeat_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    frame = _user_window().rowsBetween(-4, 0)
    cnt = F.count("value").over(frame)
    roll5 = F.sum(F.col("value").cast(DEC)).over(frame).cast("double") / 5
    roll5_guarded = F.when(cnt == 5, roll5)
    return ev.select(
        "event_id",
        roll5_guarded.alias("roll5"),
        F.when(
            (cnt == 5) & (F.abs(F.col("value") - roll5) < 0.05), 1
        )
        .otherwise(0)
        .alias("is_repeat"),
    )


# --------------------------------------------------------------------------
# W3/W4/A6 — unbounded partition means (generate.py:91-99: per-cell-year
# and all-time per-cell means as window columns, not grouped aggregates).
@query(
    "w03_partition_means",
    """
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id) AS user_mean,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id, event_type) AS DOUBLE)
             / COUNT(value) OVER (PARTITION BY user_id, event_type) AS user_type_mean
    FROM events
    """,
)
def w03_partition_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    wut = Window.partitionBy("user_id", "event_type")
    mean_over = lambda w: F.sum(F.col("value").cast(DEC)).over(w).cast(  # noqa: E731
        "double"
    ) / F.count("value").over(w)
    return ev.select(
        "event_id",
        mean_over(wu).alias("user_mean"),
        mean_over(wut).alias("user_type_mean"),
    )


# --------------------------------------------------------------------------
# A7 — share-of-flag per date as a window aggregate
# (regression_model_predictor.py:181-183: share imputed per day).
@query(
    "w04_error_share_per_day",
    """
    SELECT event_id,
           strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                OVER (PARTITION BY CAST(ts AS DATE)) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY CAST(ts AS DATE)) AS share_error
    FROM events
    """,
)
def w04_error_share_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    wd = Window.partitionBy("day")
    share = (
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(wd)
        .cast("double")
        / F.count(F.lit(1)).over(wd)
    )
    return ev.select(
        "event_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        share.alias("share_error"),
    )


# --------------------------------------------------------------------------
# W1 fills — forward fill then backward fill of nulls
# (generate.py:73-79 backward_fill + forward_fill after rolling).
# `error` events' values are treated as missing to create a null pattern.
@query(
    "w05_gap_fill",
    f"""
    SELECT event_id,
           last_value(v IGNORE NULLS)
             OVER ({_WIN} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
           COALESCE(
             last_value(v IGNORE NULLS)
               OVER ({_WIN} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             first_value(v IGNORE NULLS)
               OVER ({_WIN} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           ) AS filled
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
    """,
)
def w05_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    )
    w = _user_window()
    ff = F.last("v", ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
    bf = F.first("v", ignorenulls=True).over(
        w.rowsBetween(0, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id", ff.alias("ffill"), F.coalesce(ff, bf).alias("filled")
    )


# --------------------------------------------------------------------------
# lag/delta — event-over-event change per user, re-aggregated.
@query(
    "w06_event_deltas",
    f"""
    SELECT user_id,
           COUNT(delta) AS n_deltas,
           CAST(SUM(CAST(delta AS DECIMAL(38,6))) AS DOUBLE) / COUNT(delta) AS avg_delta
    FROM (
        SELECT user_id,
               value - lag(value) OVER ({_WIN}) AS delta
        FROM events
    )
    GROUP BY user_id
    """,
)
def w06_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    delta = F.col("value") - F.lag("value").over(_user_window())
    return (
        ev.withColumn("delta", delta)
        .groupBy("user_id")
        .agg(F.count("delta").alias("n_deltas"), davg("delta").alias("avg_delta"))
    )


# --------------------------------------------------------------------------
# top-k per group (rank + filter; the distributed form of O3 "top-1 by key").
@query(
    "w07_top3_per_user",
    """
    SELECT user_id, event_id, value, rk FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
        FROM events)
    WHERE rk <= 3
    """,
)
def w07_top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            # cast to long so the dtype matches the oracle's BIGINT exactly
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# W7 — systematic decimation (gather_every(n),
# setup/dependency_injection.py:340-346). Round 6: runs the PARTITIONED
# exact form (range-exchange parallel sort + per-partition offsets) —
# output is identical to the global row_number the oracle spells, but no
# single-partition WindowExec appears anywhere in the plan; the mini-
# sample-only `sampling.decimate` remains for tiny inputs.
@query(
    "w08_decimate_100",
    """
    SELECT event_id, value FROM (
        SELECT event_id, value,
               row_number() OVER (ORDER BY event_id) AS rn
        FROM events)
    WHERE (rn - 1) % 100 = 0
    """,
)
def w08_decimate_100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pm25ml_spark.operators.sampling import decimate_partitioned

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    return decimate_partitioned(ev, 100, ["event_id"])


# --------------------------------------------------------------------------
# sessionization — gap>30min starts a new session; cumulative-sum window
# then grouped per session. (Beyond-reference: the batch dual of the
# streaming session-window operator.)
@query(
    "w09_sessionize",
    f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({_WIN}) > 1800000000
                     OR lag(epoch_us(ts)) OVER ({_WIN}) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def w09_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        (F.col("ts_us") - prev > 1_800_000_000) | prev.isNull(), 1
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        )
    )


# --------------------------------------------------------------------------
# w10 — ntile ranking buckets: quartile of each order within its priority
# class by total price (ties broken by orderkey for engine determinism).
@query(
    "w10_ntile_quartiles",
    """
    SELECT o_orderpriority, quartile, COUNT(*) AS n,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM (
        SELECT o_orderpriority, o_totalprice,
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    GROUP BY o_orderpriority, quartile
    """,
)
def w10_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# w11 — RANGE frame (value-based, not row-based): 30-day trailing order
# total per customer. Distinct from every ROWS frame above: gaps in the
# date axis mean a 30-row frame and a 30-day frame differ whenever a
# customer skips days. Ordered by epoch-day int so both engines use
# integer RANGE offsets.
@query(
    "w11_range_frame",
    """
    SELECT o_custkey, day_int,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
               PARTITION BY o_custkey ORDER BY day_int
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY day_int
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS n_in_window
    FROM (
        SELECT o_custkey,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_int,
               o_totalprice
        FROM orders
    )
    """,
)
def w11_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_int"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_int")
        .rangeBetween(-29, 0)
    )
    return orders.select(
        "o_custkey",
        "day_int",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias(
            "trailing_30d"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    )


# --------------------------------------------------------------------------
# w12 — relative-rank windows: percent_rank ((rank-1)/(N-1)) and
# cume_dist (rows ≤ current / N) of each order inside its priority
# class. Both are pure integer-ratio doubles over an identical total
# order (o_totalprice, o_orderkey unique tiebreak), so the IEEE results
# are bit-identical across engines — no rounding needed.
@query(
    "w12_relative_rank",
    """
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS cume
    FROM orders
    """,
)
def w12_relative_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# iv01 — interval-overlap join (the range-join custom operator): each user
# session, joined to every 'error' event from ANY user whose timestamp
# falls inside the session's [start, end] — genuinely many-to-many, the
# shape Spark would otherwise plan as a cartesian with a residual range
# predicate. Bucketed equi-join (operators/interval_join.py) + a re-join
# for left semantics (sessions with zero errors keep n_errors = 0).
@query(
    "iv01_session_error_overlap",
    f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({_WIN}) > 1800000000
                     OR lag(epoch_us(ts)) OVER ({_WIN}) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               MIN(ts_us) AS s_start, MAX(ts_us) AS s_end
        FROM numbered GROUP BY user_id, session_id
    ),
    err AS (SELECT epoch_us(ts) AS e_us FROM events WHERE event_type = 'error')
    SELECT s.user_id, s.session_id,
           CAST(COUNT(e.e_us) AS BIGINT) AS n_errors
    FROM sessions s
    LEFT JOIN err e ON e.e_us BETWEEN s.s_start AND s.s_end
    GROUP BY s.user_id, s.session_id
    """,
)
def iv01_session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pm25ml_spark.operators.interval_join import interval_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        (F.col("ts_us") - prev > 1_800_000_000) | prev.isNull(), 1
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("ts_us").alias("e_us")
    )
    # bucket = the 30-min session gap: intervals rarely span many buckets
    hits = interval_join(
        sessions, errors, "s_start", "s_end", "e_us", bucket=1_800_000_000
    ).groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        sessions.join(hits, ["user_id", "session_id"], "left")
        .select(
            "user_id",
            "session_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_errors"),
        )
    )


# --------------------------------------------------------------------------
# iv02 — interval-INTERVAL overlap join (the range-join family's second
# shape): concurrent session pairs across users, aggregated per user
# pair with the total concurrency duration. Naively a cartesian with a
# residual predicate over ~10^5 sessions; here both interval sets bucket
# (operators/interval_join.interval_overlap_join), join on the bucket
# key, and emit each pair exactly once via the first-shared-bucket rule.
@query(
    "iv02_concurrent_sessions",
    f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER ({_WIN}) > 1800000000
                     OR lag(epoch_us(ts)) OVER ({_WIN}) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               MIN(ts_us) AS s_start, MAX(ts_us) AS s_end
        FROM numbered GROUP BY user_id, session_id
    ),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               LEAST(a.s_end, b.s_end) - GREATEST(a.s_start, b.s_start)
                 AS ov_us
        FROM sessions a JOIN sessions b
          ON a.s_start <= b.s_end AND b.s_start <= a.s_end
         AND a.user_id < b.user_id
    )
    SELECT user_a, user_b,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(SUM(ov_us) AS BIGINT) AS total_overlap_us
    FROM pairs
    GROUP BY user_a, user_b
    """,
)
def iv02_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pm25ml_spark.operators.interval_join import interval_overlap_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(w)
    is_new = F.when(
        (F.col("ts_us") - prev > 1_800_000_000) | prev.isNull(), 1
    ).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end"))
    )
    a = sessions.select(
        F.col("user_id").alias("user_a"),
        F.col("s_start").alias("a_start"),
        F.col("s_end").alias("a_end"),
    )
    b = sessions.select(
        F.col("user_id").alias("user_b"),
        F.col("s_start").alias("b_start"),
        F.col("s_end").alias("b_end"),
    )
    pairs = interval_overlap_join(
        a, b, "a_start", "a_end", "b_start", "b_end", bucket=1_800_000_000
    ).filter(F.col("user_a") < F.col("user_b"))
    ov = F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
    return pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.sum(ov).cast("bigint").alias("total_overlap_us"),
    )


# --------------------------------------------------------------------------
# w13 — cumulative distinct users by day ("total unique users to date"):
# the windows-family op a naive port writes as COUNT(DISTINCT) OVER a
# growing frame — state linear in users PER ROW, hopeless at scale. The
# scalable identity: cumulative distinct at day d = users whose FIRST
# event day ≤ d, so the plan is groupBy(user).min(day) (one narrow
# map-side-combinable shuffle) → per-day first-appearance counts → one
# running sum over the tiny day-keyed frame. Also reports the per-day
# active count for the new/returning split.
@query(
    "w13_cumulative_unique_users",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    per_day AS (
        SELECT day, COUNT(DISTINCT user_id) AS n_active FROM daily GROUP BY day
    ),
    firsts AS (
        SELECT user_id, MIN(day) AS first_day FROM daily GROUP BY user_id
    ),
    news AS (
        SELECT first_day AS day, COUNT(*) AS n_new FROM firsts GROUP BY first_day
    )
    SELECT p.day, p.n_active,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY p.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_unique
    FROM per_day p LEFT JOIN news n ON p.day = n.day
    """,
)
def w13_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    per_day = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    news = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    # the running sum's frame is the day-keyed aggregate (≤ a few
    # thousand rows at any corpus size) — a global window here is cheap
    # by construction, unlike the per-event frame it replaces
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.join(news, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn(
            "cumulative_unique",
            F.sum("n_new").over(w).cast("bigint"),
        )
    )


# --------------------------------------------------------------------------
# w14 — funnel analysis (view → click → purchase): each user's chained
# first-occurrence times — first view, first click strictly AFTER that
# view, first purchase strictly after that click — and the funnel depth
# reached. The product-analytics staple. The plan is three conditional
# MIN-aggregates chained by user-keyed left joins: every shuffle is keyed
# user_id (co-partitioned end-to-end, AQE coalesces the re-use), the
# event_type filters push into the scan, and nothing ever sorts the raw
# event stream — at 100 TB the heavy frame moves exactly once per stage,
# already keyed.
@query(
    "w14_funnel",
    """
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS view_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS click_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.view_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.click_us
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
           CAST(CASE WHEN p.purchase_us IS NOT NULL THEN 3
                     WHEN c.click_us IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS funnel_depth
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def w14_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("view_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    depth = (
        F.when(F.col("purchase_us").isNotNull(), 3)
        .when(F.col("click_us").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_us",
            "click_us",
            "purchase_us",
            depth.cast("bigint").alias("funnel_depth"),
        )
    )


# --------------------------------------------------------------------------
# w15 — retention cohorts: bucket users by first-activity day, then count
# distinct active users per (cohort_day, day_offset) — the retention
# triangle every product-analytics stack computes. Plan shape: one
# per-user MIN (keyed user_id), joined back onto the distinct
# (user, day) activity set (same user_id key — co-partitioned), then a
# (cohort, offset)-keyed count. The raw event stream is never sorted and
# each shuffle key is either user_id or the calendar-bounded cohort pair.
@query(
    "w15_retention_cohorts",
    """
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, day_offset
    """,
)
def w15_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )


# --------------------------------------------------------------------------
# w16 — per-user TIME-weighted average (trapezoidal rule over irregular
# samples — TimescaleDB's time_weight / industrial-historian semantics):
# uneven gaps mean a plain AVG over-weights bursts; the trapezoid
# integral Σ (vᵢ+vᵢ₊₁)/2·Δtᵢ / (t_n−t₁) is the right mean. One
# user-partitioned window (lead) — per-key cardinality is bounded, no
# global frame; per-pair terms are fixed double chains summed in
# decimal. Single-event users drop (zero-length support).
@query(
    "w16_time_weighted_avg",
    """
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
               lead(value) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS nv,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS nt
        FROM events WHERE value IS NOT NULL
    ),
    terms AS (
        SELECT user_id,
               (value + nv) / 2 * (CAST(nt AS DOUBLE) - CAST(ts_us AS DOUBLE))
                 AS area
        FROM seq WHERE nt IS NOT NULL
    ),
    spans AS (
        SELECT user_id, MAX(ts_us) - MIN(ts_us) AS span_us
        FROM seq GROUP BY user_id
    )
    SELECT t.user_id,
           ROUND(CAST(SUM(CAST(area AS DECIMAL(38,6))) AS DOUBLE)
                 / CAST(span_us AS DOUBLE), 6) AS twa,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM terms t JOIN spans USING (user_id)
    WHERE span_us > 0
    GROUP BY t.user_id, span_us
    """,
)
def w16_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn("ts_us", F.unix_micros("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "ts_us",
        "value",
        F.lead("value").over(w).alias("nv"),
        F.lead("ts_us").over(w).alias("nt"),
    )
    terms = seq.filter(F.col("nt").isNotNull()).select(
        "user_id",
        (
            (F.col("value") + F.col("nv")) / 2
            * (F.col("nt").cast("double") - F.col("ts_us").cast("double"))
        ).alias("area"),
    )
    spans = seq.groupBy("user_id").agg(
        (F.max("ts_us") - F.min("ts_us")).alias("span_us")
    )
    return (
        terms.join(spans, "user_id")
        .filter(F.col("span_us") > 0)
        .groupBy("user_id", "span_us")
        .agg(
            F.round(
                F.sum(F.col("area").cast("decimal(38,6)")).cast("double")
                / F.col("span_us").cast("double"),
                6,
            ).alias("twa"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        )
        .select("user_id", "twa", "n_segments")
    )


# --------------------------------------------------------------------------
# w17 — EWMA (exponentially weighted moving average, α = 1/2) over each
# user's trailing 20 events — pandas ewm(alpha=.5).mean() semantics
# truncated to a 20-row frame so the operator has bounded state (the
# streaming-friendly form). α = 1/2 makes every weight 2^(19-j) an EXACT
# integer, so term products are pure power-of-two scalings (no rounding
# error introduced by the weights themselves); terms sum in decimal and
# one final divide by the integer weight mass yields a cross-engine
# bit-identical double. The plan is ONE user-partitioned window carrying
# 20 lag expressions — no arrays, no Python, frames bounded per key.
_EWMA_LAGS = 20


def _ewma_sql() -> str:
    terms = " + ".join(
        f"COALESCE(CAST(lag(value, {j}) OVER w * {1 << (_EWMA_LAGS - 1 - j)}"
        f" AS DECIMAL(38,6)), 0)"
        for j in range(_EWMA_LAGS)
    )
    mass = " + ".join(
        f"CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0 "
        f"ELSE {1 << (_EWMA_LAGS - 1 - j)} END"
        for j in range(_EWMA_LAGS)
    )
    return f"""
    SELECT event_id,
           ROUND(CAST(({terms}) AS DOUBLE) / ({mass}), 6) AS ewma
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """


@query("w17_ewma", _ewma_sql())
def w17_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn("ts_us", F.unix_micros("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(_EWMA_LAGS)]
    weights = [1 << (_EWMA_LAGS - 1 - j) for j in range(_EWMA_LAGS)]
    num = None
    mass = None
    for lg, wt in zip(lags, weights):
        t = F.coalesce((lg * wt).cast(DEC), F.lit(0).cast(DEC))
        m = F.when(lg.isNull(), 0).otherwise(wt)
        num = t if num is None else num + t
        mass = m if mass is None else mass + m
    return ev.select(
        "event_id",
        F.round(num.cast("double") / mass, 6).alias("ewma"),
    )


# --------------------------------------------------------------------------
# w19 — OHLC bars (open/high/low/close per event_type x day): the
# first/last-in-order aggregate family (time-series downsampling,
# TimescaleDB first()/last(), candlestick rollups). Open/close are
# picked values, not arithmetic — exact in any engine; the tie-break is
# (ts, event_id), a total order. Shape: ONE shuffle onto the bounded
# (type, day) key; the rank window partitions on that same key
# (dimension-bounded frames), and high/low/volume ride the identical
# grouping — no second shuffle. At 100 TB the window's per-bar frame is
# bar-sized, never corpus-sized; with billions of rows per bar the
# first/last pick would move to a min_by/max_by aggregate instead.
@query(
    "w19_ohlc_bars",
    f"""
    WITH v AS (
        SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               ts, event_id, value
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT event_type, day, value,
               row_number() OVER (PARTITION BY event_type, day
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type, day
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM v
    )
    SELECT event_type, day,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n,
           {dsum_expr('value')} AS volume
    FROM r GROUP BY 1, 2
    """,
)
def w19_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
            "ts",
            "event_id",
            "value",
        )
    )
    wa = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = ev.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("volume"),
    )


# --------------------------------------------------------------------------
# w20 — rolling MEDIAN over a trailing 7-event frame per user: the
# order-statistic window the plain SUM/AVG frames (w01) can't express.
# Spark computes it declaratively — sort_array(collect_list(...)) over
# the frame, then element_at at the lower-middle rank ((n+1) div 2) —
# all JVM expressions, no UDF; the frame holds ≤ 7 values so the
# per-row array work is O(1). DuckDB's quantile_disc(0.5) picks the
# same lower-middle element, and the 2-dp event values make every
# median engine-portable with no rounding step at all.
@query(
    "w20_rolling_median",
    f"""
    SELECT user_id, event_id,
           quantile_disc(value, 0.5) OVER (
               {_WIN} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS med7
    FROM events WHERE value IS NOT NULL
    """,
)
def w20_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    med = F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
    return ev.select("user_id", "event_id", med.alias("med7"))


# --------------------------------------------------------------------------
# w21 — exponential smoothing (EWMA, alpha = 1/2) over each user's last
# 4 events: the decayed-activity feature every behavioral model wants
# and the reference's window family (W1-W6: lags/means/fills) lacks.
# Engine-exactness without a rounding step: the smoothed value is ONE
# explicit arithmetic expression over lag() terms — v + c1·lag1 +
# c2·lag2 + c3·lag3 normalized by the weights actually present — with
# the coefficients 0.5/0.25/0.125 all dyadic (exact doubles) and the
# SAME evaluation tree spelled on both sides, so every intermediate
# IEEE rounding is identical. Window is PARTITIONED by user (audit-
# clean) and the frame is 4 lags — O(1) state per row at any scale.
@query(
    "w21_ewma_activity",
    f"""
    WITH l AS (
        SELECT user_id, event_id, value,
               lag(value, 1) OVER ({_WIN}) AS l1,
               lag(value, 2) OVER ({_WIN}) AS l2,
               lag(value, 3) OVER ({_WIN}) AS l3
        FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, event_id,
           (value + COALESCE(l1, 0) * 0.5
                  + COALESCE(l2, 0) * 0.25
                  + COALESCE(l3, 0) * 0.125)
           / (1 + CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END
                + CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END
                + CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END) AS ewma
    FROM l
    """,
)
def w21_ewma_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    l1, l2, l3 = (F.lag("value", i).over(w) for i in (1, 2, 3))
    num = (
        F.col("value")
        + F.coalesce(l1, F.lit(0.0)) * 0.5
        + F.coalesce(l2, F.lit(0.0)) * 0.25
        + F.coalesce(l3, F.lit(0.0)) * 0.125
    )
    den = (
        F.lit(1.0)
        + F.when(l1.isNull(), 0.0).otherwise(0.5)
        + F.when(l2.isNull(), 0.0).otherwise(0.25)
        + F.when(l3.isNull(), 0.0).otherwise(0.125)
    )
    return ev.select(
        "user_id", "event_id", (num / den).alias("ewma")
    )


# --------------------------------------------------------------------------
# w22 — the ranking-window class (ntile / percent_rank / cume_dist) the
# catalog's window family lacked: per-user event ranking by value with
# the unique (value, event_id) order both engines share. percent_rank =
# (rank−1)/(n−1) and cume_dist = rank/n are single IEEE divisions of
# exact integers — identical in both engines; ntile(4) is pure integer
# bucketing. User-partitioned windows, one exchange, O(1) per row.
@query(
    "w22_rank_distribution",
    f"""
    SELECT user_id, event_id,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def w22_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


# --------------------------------------------------------------------------
# w23 — top-3 purchases per user by value (the per-entity top-k shape):
# row_number over a user-partitioned order, filtered to rank ≤ 3. The
# scale story is the plan, not the algebra: Spark ≥ 3.5 rewrites the
# rank filter into WindowGroupLimit, which keeps a 3-row heap PER
# PARTITION on the map side BEFORE the shuffle — the exchange carries
# ≤ 3 rows per (user, input partition) instead of every purchase, the
# difference between shuffling top-k candidates and shuffling the
# corpus. Pinned in tests/test_plan_quality.py. Ties are impossible by
# construction (the order key ends with the unique event_id).
@query(
    "w23_top3_per_user",
    f"""
    SELECT user_id, event_id, value, rk FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rk
        FROM events
        WHERE event_type = 'purchase' AND value IS NOT NULL
    ) WHERE rk <= 3
    """,
)
def w23_top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .select("user_id", "event_id", "value")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "value", "rk")
    )
