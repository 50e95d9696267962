"""Streaming maintenance of a z-ordered clustered copy.

The batch side (``plans/live.zorder_events_staged``) builds the
clustered analytics copy once; THIS module keeps it fresh from a real
Structured Streaming source — the ingest lifecycle a 100 TB deployment
runs. Every micro-batch:

1. projects the analytics columns and computes the Morton key against
   the table's FIXED bounds (``operators.zorder.zorder_key_fixed`` —
   the z-analogue of the frozen IVF quantizer: moving bounds would
   re-map every existing key and force a full clustering rewrite;
   out-of-bounds drift clamps into edge cells, degrading pruning for
   the affected files only, never correctness);
2. range-partitions its own rows on the key and appends them with
   per-file min/max on the predicate columns (one commit per batch —
   each batch's files are tight rectangles of its own key range);
3. optionally compacts after the drain: small per-batch files merge
   into ~target-size files, re-clustered on the z-key with stats
   re-recorded, so maintenance never silently disables the box skip
   (``TxTable.compact(cluster_col="__z")``).

Invariant (the oracle-checked claim of st10): after draining ANY split
of the events table through this sink — and compacting — a stats-pruned
box query over the maintained copy equals the same box aggregate over
the raw table. Layout, batching, and maintenance move bytes, never
rows.

Delivery is EXACTLY-ONCE: each append carries the (query, epoch) stamp
through ``sink_stream_exactly_once``'s pinned-commit protocol, so a
crash BETWEEN a batch's txlog append and its checkpoint record replays
the batch but the replayed commit is recognized and skipped — the
clustered copy can never double-count a micro-batch
(``tests/test_zorder.py`` re-drains a partially-checkpointed stream to
pin this).

DRIFT MONITORING: the fixed bounds are a frozen model of the key
distribution. Values outside them still land correctly (clamped into
edge cells — layout-only degradation), but a growing clamped fraction
means the edge files' stat rectangles are widening and the box skip is
silently eroding. Each commit therefore records
``zorder_drift = {n_rows, clamped, nulls}`` (one micro-batch-sized
aggregate over the batch's already-written files), and
:func:`zorder_drift_report` folds the log into a recluster signal a
deployment would alert on — results stay oracle-green either way; the
signal is about PRUNING health, not correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# clamped fraction (across the commits inspected) above which
# zorder_drift_report recommends re-deriving bounds + reclustering
DRIFT_RECLUSTER_THRESHOLD = 0.05
# double dims never clamp (quantile rank is total over the reals), so
# their drift signal is cut-bucket OCCUPANCY skew instead: the frozen
# cuts were equal-mass at build time (every bucket ≈ 1/cells of the
# data), so a heavy-tailed drift shows up as one bucket's cumulative
# share ballooning. Flag when any bucket holds more than this share of
# the maintained rows — far above the ~1.6% equal-mass baseline at 64
# cells, far below the ~100% a collapsed tail produces.
OCCUPANCY_SKEW_THRESHOLD = 0.5


def _drift_counters(bounds: dict[str, tuple[int, int]]):
    """Aggregates over a keyed batch: rows whose ANY z-dim fell outside
    its fixed bound (clamped into an edge cell) and rows whose ANY
    z-dim was NULL (key NULL → nulls-first files). Pure JVM exprs."""
    oob = F.lit(False)
    nul = F.lit(False)
    for c, (lo, hi) in bounds.items():
        oob = oob | (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        nul = nul | F.col(c).isNull()
    return _counter_aggs(oob, nul)


def _counter_aggs(oob, nul):
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(nul, 0).otherwise(F.when(oob, 1).otherwise(0))).alias(
            "clamped"
        ),
        F.sum(F.when(nul, 1).otherwise(0)).alias("nulls"),
    ]


def _drift_counters_typed(spec: dict[str, dict]):
    """Typed-dimension drift: the "clamped" notion follows each rank
    adapter's frozen model — int/date/timestamp values outside [lo, hi]
    clamp to edge cells; STRING values absent from the frozen
    dictionary map to the top cell (the classic ingest-drift case: a
    new enum value appears — ``string_join`` dims detect this from the
    broadcast-joined rank being NULL, never a dictionary-sized literal
    expression); DOUBLE quantile ranks are total over the reals
    (rank = #cuts ≤ x), so they never clamp and are monitored by
    cut-bucket OCCUPANCY instead (:func:`typed_drift_row`)."""
    from pm25ml_spark.operators.zorder import _join_rank_col

    oob = F.lit(False)
    nul = F.lit(False)
    for c, s in spec.items():
        col = F.col(c)
        kind = s["kind"]
        if kind == "int":
            oob = oob | (col < F.lit(s["lo"])) | (col > F.lit(s["hi"]))
        elif kind == "date":
            d = F.unix_date(col)
            oob = oob | (d < F.lit(s["lo"])) | (d > F.lit(s["hi"]))
        elif kind == "timestamp":
            tsec = col.cast("long")
            oob = oob | (tsec < F.lit(s["lo"])) | (tsec > F.lit(s["hi"]))
        elif kind == "string":
            if s["dict"]:
                oob = oob | (~col.isin(*s["dict"]) & col.isNotNull())
        elif kind == "string_join":
            if s["dict"]:
                oob = oob | (
                    F.col(_join_rank_col(c)).isNull() & col.isNotNull()
                )
        nul = nul | col.isNull()
    return _counter_aggs(oob, nul)


def typed_drift_row(written: DataFrame, spec: dict[str, dict]) -> dict:
    """Per-commit typed drift audit over a micro-batch's already-written
    files: the clamped/null counters plus, for every DOUBLE dimension,
    its cut-bucket occupancy histogram — a bounded groupBy (≤ cuts+1
    rows collected) on exactly the layout's cells
    (:func:`operators.zorder._double_bucket`), giving the skew signal
    double dims need because their total quantile rank never clamps.
    ``string_join`` dims get their frozen dictionary broadcast-joined
    first, so unseen-value detection also stays O(1) in expression
    size."""
    from pm25ml_spark.operators.zorder import (
        _double_bucket,
        with_string_join_ranks,
    )

    probe, _tmp = with_string_join_ranks(written, spec, bits=1)
    r = probe.agg(*_drift_counters_typed(spec)).collect()[0]
    out = {
        "n_rows": int(r["n"]),
        "clamped": int(r["clamped"] or 0),
        "nulls": int(r["nulls"] or 0),
    }
    occ: dict[str, dict[str, int]] = {}
    for c, s in spec.items():
        if s["kind"] != "double" or not s["cuts"]:
            continue
        hist = (
            written.filter(F.col(c).isNotNull())
            .groupBy(_double_bucket(F.col(c), s["cuts"]).alias("__cell"))
            .count()
            .collect()
        )
        occ[c] = {str(int(row["__cell"])): int(row["count"]) for row in hist}
    if occ:
        out["double_occupancy"] = occ
    return out


def _counters_to_drift(m: dict) -> dict:
    return {
        "zorder_drift": {
            "n_rows": int(m["n"]),
            "clamped": int(m["clamped"] or 0),
            "nulls": int(m["nulls"] or 0),
        }
    }


def _drift_entry_extra(bounds, spec):
    """The per-commit drift audit as an entry_extra. Whenever the
    counters are plain global aggregates (always for integer bounds;
    for typed specs without ``string_join`` dictionaries or double
    cut-bucket histograms — both need a join/groupBy the write job
    cannot observe), they ride the commit's write job via
    :class:`~pm25ml_spark.sources.txlog.ObservedEntryExtra`: one Spark
    job per micro-batch commit instead of two. Otherwise the classic
    read-back callable runs (:func:`typed_drift_row`)."""
    from pm25ml_spark.sources.txlog import ObservedEntryExtra

    def as_exprs(aggs) -> dict:
        # _counter_aggs aliases are stable: n / clamped / nulls
        return dict(zip(("n", "clamped", "nulls"), aggs))

    if bounds is not None:
        return ObservedEntryExtra(
            as_exprs(_drift_counters(bounds)), _counters_to_drift
        )
    needs_readback = any(
        (s["kind"] == "string_join" and s["dict"])
        or (s["kind"] == "double" and s["cuts"])
        for s in spec.values()
    )
    if needs_readback:
        return lambda written: {"zorder_drift": typed_drift_row(written, spec)}
    return ObservedEntryExtra(
        as_exprs(_drift_counters_typed(spec)), _counters_to_drift
    )


def maintain_zorder_stream(
    stream_df: DataFrame,
    table,
    bounds: dict[str, tuple[int, int]] | None = None,
    checkpoint_dir: str = "",
    bits: int = 10,
    key_col: str = "__z",
    query_name: str = "zorder_maintain",
    timeout_s: int = 300,
    spec: dict[str, dict] | None = None,
):
    """Drain ``stream_df`` with AvailableNow, appending z-keyed,
    stats-tracked, (query, epoch)-stamped commits to ``table`` (a
    TxTable). ``bounds`` are the table's fixed per-column key bounds
    (insertion order = interleave order); pass ``spec`` instead (a
    ``typed_bounds`` rank spec) to maintain a TYPED clustered copy —
    date/timestamp/double/string dimensions, the d19 layout — with the
    same frozen-model contract. ``checkpoint_dir`` is REQUIRED: the
    stamp protocol is defined relative to the epoch ids the checkpoint
    makes deterministic, and an implicit temp dir would silently break
    restart semantics (and accrete dirs across bench invocations).
    Returns the finished StreamingQuery."""
    if not checkpoint_dir:
        raise ValueError(
            "maintain_zorder_stream requires an explicit checkpoint_dir: "
            "epoch ids (and therefore exactly-once stamps) are only "
            "stable relative to one checkpoint location"
        )
    if (bounds is None) == (spec is None):
        raise ValueError(
            "pass exactly one of bounds (integer dims) or spec (typed dims)"
        )
    from pm25ml_spark.operators.zorder import (
        typed_zorder_key_fixed,
        zorder_key_fixed,
    )
    from pm25ml_spark.sources.txlog import sink_stream_exactly_once

    nparts = stream_df.sparkSession.sparkContext.defaultParallelism
    stats_cols = list(bounds) if bounds is not None else list(spec)

    def transform(batch_df: DataFrame) -> DataFrame:
        if bounds is not None:
            keyed = zorder_key_fixed(
                batch_df, bounds, bits=bits, key_col=key_col
            )
        else:
            keyed = typed_zorder_key_fixed(
                batch_df, spec, bits=bits, key_col=key_col
            )
        return keyed.repartitionByRange(nparts, F.col(key_col))

    q = sink_stream_exactly_once(
        stream_df,
        table,
        query_name=query_name,
        checkpoint_dir=checkpoint_dir,
        transform=transform,
        stats_cols=stats_cols,
        entry_extra=_drift_entry_extra(bounds, spec),
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"z-order maintenance '{query_name}' did not drain within "
            f"{timeout_s}s"
        )
    return q


def recluster_zorder(
    table,
    cols: list[str],
    bits: int = 10,
    key_col: str = "__z",
    typed: bool = False,
):
    """The REPAIR verb the drift signal recommends (Delta's OPTIMIZE
    ZORDER as a full rewrite): re-derive fresh bounds (or a fresh typed
    spec — new dictionary entries, new date range) from the table's
    CURRENT rows, re-key every row against the new model, and atomically
    overwrite with the new layout's file stats recorded in the same
    commit. Old snapshots still time-travel to the old layout; the
    commit carries the new model (``zorder_model``) so maintainers can
    resume with it and the audit shows when and why the model moved.

    Returns ``(version, model)`` where ``model`` is the bounds dict
    (``typed=False``) or the typed spec (``typed=True``) to hand to
    :func:`maintain_zorder_stream`. Cost is one full rewrite — which is
    exactly why drift is MONITORED instead of re-deriving bounds per
    batch: the signal decides when the rewrite is worth it."""
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.zorder import (
        column_bounds,
        typed_bounds,
        typed_zorder_key_fixed,
        zorder_key_fixed,
    )

    current = table.read().drop(key_col)
    if typed:
        model = typed_bounds(current, cols)
        keyed = typed_zorder_key_fixed(current, model, bits=bits, key_col=key_col)
    else:
        model = column_bounds(current, cols)
        keyed = zorder_key_fixed(current, model, bits=bits, key_col=key_col)
    nparts = current.sparkSession.sparkContext.defaultParallelism
    v = table.overwrite(
        keyed.repartitionByRange(nparts, F.col(key_col)),
        stats_cols=cols,
        entry_extra=lambda _w: {
            "zorder_model": {
                "cols": cols,
                "bits": bits,
                "typed": typed,
                "model": {
                    c: (list(b) if not typed else b)
                    for c, b in model.items()
                },
            }
        },
    )
    return v, model


def zorder_drift_report(
    table,
    threshold: float = DRIFT_RECLUSTER_THRESHOLD,
    occupancy_threshold: float = OCCUPANCY_SKEW_THRESHOLD,
) -> dict:
    """Fold the table's ``zorder_drift`` commit stats into a health
    signal: total/clamped/null row counts across maintenance commits,
    the worst single-commit clamped fraction, per-double-dimension
    cut-bucket occupancy, and ``recluster`` — True when the cumulative
    clamped fraction crosses ``threshold`` OR any double dimension's
    most-occupied cut bucket holds more than ``occupancy_threshold`` of
    the maintained rows (the skew drift a total quantile rank can never
    surface as clamping: frozen cuts were equal-mass at build time, so
    a dominant bucket means the box skip is quietly eroding). Reads the
    commit LOG only — never the data.

    A ``zorder_model`` entry (a :func:`recluster_zorder` rewrite) RESETS
    the fold: drift is always measured against the CURRENT frozen
    model, so the signal clears once the repair lands instead of
    permanently remembering pre-recluster history."""
    total = clamped = nulls = 0
    worst = 0.0
    commits = 0
    occ: dict[str, dict[str, int]] = {}
    for e in table.history():
        if e.get("zorder_model"):
            total = clamped = nulls = 0
            worst = 0.0
            commits = 0
            occ = {}
        d = e.get("zorder_drift")
        if not d:
            continue
        commits += 1
        total += d["n_rows"]
        clamped += d["clamped"]
        nulls += d["nulls"]
        if d["n_rows"]:
            worst = max(worst, d["clamped"] / d["n_rows"])
        for c, hist in (d.get("double_occupancy") or {}).items():
            cell_counts = occ.setdefault(c, {})
            for cell, n in hist.items():
                cell_counts[cell] = cell_counts.get(cell, 0) + int(n)
    frac = (clamped / total) if total else 0.0
    skew = {
        c: max(h.values()) / max(sum(h.values()), 1)
        for c, h in occ.items()
        if h
    }
    worst_skew = max(skew.values(), default=0.0)
    return {
        "commits": commits,
        "n_rows": total,
        "clamped": clamped,
        "nulls": nulls,
        "clamped_frac": frac,
        "worst_commit_frac": worst,
        "occupancy_skew": skew,
        "worst_occupancy_skew": worst_skew,
        "recluster": frac > threshold or worst_skew > occupancy_threshold,
    }
