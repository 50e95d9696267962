"""Z-order (Morton) multi-dimensional clustering for file layouts.

A RANGE layout on one column gives tight per-file min/max for THAT
column only — every file still spans the full range of every other
column, so stats pruning on a second predicate dimension skips nothing.
Z-ordering interleaves the bits of several rank-normalized columns into
one sort key; range-partitioning + sorting on that key makes each file
cover a compact hyper-rectangle of the key space, so per-file min/max
stay tight in EVERY z-dimension and a box predicate on any subset of
them prunes files (Delta Lake's OPTIMIZE ZORDER BY, Iceberg's z-order
rewrite — same construction: bounded per-column ranks, interleaved
bits).

Everything here is a JVM expression (shift/and/or folds inside
whole-stage codegen): the z-key never touches Python, and the layout is
value-invariant — consumers' query RESULTS are identical under any
layout; only which files a predicate must open changes. That is what
keeps z-ordered catalog queries oracle-checkable: the DuckDB oracle
filters the raw table, Spark reads the pruned z-table, and the hash
compare proves layout moved bytes, never rows.

The reference stages its long-term archives as hive-partitioned
parquet keyed on one dimension (``export/archive_storage.py:31-44``);
z-order is the lakehouse-native generalization this engine adds for
multi-predicate analytics at 100 TB.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = _dt.date(1970, 1, 1)


def _clamp(scaled: Column, col: Column, top: int) -> Column:
    """Clamp ``scaled`` into [0, top], PROPAGATING NULL: Spark's
    greatest/least skip NULL arguments, so a bare
    greatest(0, least(top, NULL)) would silently map a NULL input to
    the TOP cell — skewing edge-file stats. A NULL in any z-dimension
    instead yields a NULL rank (and, through interleave_bits' NULL
    arithmetic, a NULL key), so NULL-dim rows cluster into the
    nulls-first files of the range layout; their columns' file stats
    ignore NULLs and the exact row filter excludes them from box
    results either way — placement is documented, never accidental."""
    clamped = F.greatest(F.lit(0), F.least(F.lit(top), scaled))
    return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(clamped)


def rank_scale(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer column with known [lo, hi] bounds onto
    ``[0, 2**bits)``: ``trunc((x - lo) * (2^bits - 1) / (hi - lo))``.
    The product stays in LONG and the divide is double-precision —
    exact whenever ``(hi - lo) * (2^bits - 1) < 2^53`` (every catalog
    use: spans ≤ 2^33 at bits ≤ 12); beyond that the key degrades
    smoothly (a neighboring cell), which moves file boundaries, never
    rows — the z-key is layout-only. Out-of-bounds values clamp, so
    late-arriving outliers degrade pruning for their file instead of
    corrupting the key; NULLs yield a NULL rank (see :func:`_clamp`)."""
    span = max(int(hi) - int(lo), 1)
    top = (1 << bits) - 1
    scaled = (
        (col.cast("long") - F.lit(int(lo)))
        * F.lit(top)
        / F.lit(span)
    ).cast("long")
    return _clamp(scaled, col, top)


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """The Morton key: bit i of column d lands at position
    ``i * len(cols) + d``. Each input must already be in
    ``[0, 2**bits)`` (see :func:`rank_scale`). Pure shift/and/sum —
    whole-stage-codegen-friendly, no UDF."""
    n = len(cols)
    parts = []
    for d, c in enumerate(cols):
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def column_bounds(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """Driver-side [min, max] per column — ONE tiny aggregate
    (2·len(cols) scalars, the same bounded collect every range
    partitioner performs). Shared by the batch z-key (zorder_key) and
    the streaming maintainer's fixed-bounds derivation so the two can
    never diverge in bounds semantics."""
    row = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in cols}


def zorder_key_fixed(
    df: DataFrame,
    bounds: dict[str, tuple[int, int]],
    bits: int = 12,
    key_col: str = "__z",
) -> DataFrame:
    """Z-key against FIXED per-column bounds — the streaming-ingest
    form. A micro-batch must key against the SAME bounds as the
    existing table (moving bounds would re-map every existing key and
    demand a full clustering rewrite — the z-analogue of the frozen IVF
    quantizer); late outliers clamp into the edge cells, degrading
    pruning for their file only, never correctness."""
    for c, (lo, hi) in bounds.items():
        if lo is None or hi is None:
            raise ValueError(
                f"z-order bounds for '{c}' are ({lo}, {hi}) — the bounds "
                f"aggregate saw only NULLs. An all-NULL dimension cannot "
                f"be rank-scaled; drop it from the key or backfill it."
            )
    scaled = [
        rank_scale(F.col(c), lo, hi, bits) for c, (lo, hi) in bounds.items()
    ]
    return df.withColumn(key_col, interleave_bits(scaled, bits))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, key_col: str = "__z"
) -> DataFrame:
    """Append the z-key column for ``cols`` (integer-valued). Column
    bounds come from ONE tiny driver-side aggregate (2·len(cols)
    scalars — the same bounded collect every range partitioner performs
    to sample split points); the per-row key itself is computed
    distributed, JVM-side."""
    bounds = column_bounds(df, cols)
    return zorder_key_fixed(df, bounds, bits=bits, key_col=key_col)


# --------------------------------------------------------------------------
# TYPED z-dimensions. Production clustered copies key on whatever the
# dominant predicates use — the reference's long-term predicate columns
# are dates and strings (month/date/grid_id hive keys,
# ``combiners/combined_storage.py:130-144``), not pre-converted ints.
# Each adapter maps a typed column to a bounded integer rank with a
# JVM-only expression, so interleave_bits stays inside whole-stage
# codegen regardless of dimension type. The rank SPEC is plain JSON
# (storable in a txlog commit, reusable by a streaming maintainer) and
# frozen exactly like integer bounds: late values outside it clamp into
# edge cells — layout drift, never row wrongness.

# string dictionaries are embedded as a literal CASE/map expression;
# past this cardinality the expression itself becomes the planner
# bottleneck and the rank switches to a broadcast dictionary JOIN
# (kind "string_join"): the frozen dictionary rides along as a small
# DataFrame on the build side of a BroadcastHashJoin instead of a
# create_map literal — same frozen-spec contract, same rank values
STRING_DICT_MAX = 256
# hard cap for the join variant: the dictionary must still be a
# bounded, JSON-able frozen model (a commit entry carries it); past
# this, cluster on a hash of the column instead of its identity
STRING_JOIN_MAX = 65536
# double dimensions rank by quantile cut points (robust to skew where
# a linear scale would collapse a heavy-tailed column into one cell);
# the per-row rank is an O(cuts) fold, so cuts stay modest and the
# rank is left-shifted up to the full bit width
DOUBLE_QUANTILE_CELLS = 64


def typed_bounds(df: DataFrame, cols: list[str]) -> dict[str, dict]:
    """Derive a JSON-able rank spec per column from its Spark type:

    - int types → ``{"kind": "int", "lo", "hi"}`` (min/max aggregate);
    - date → ``{"kind": "date", "lo", "hi"}`` as epoch days;
    - timestamp → ``{"kind": "timestamp", "lo", "hi"}`` as epoch
      seconds (second resolution is a LAYOUT choice: finer would only
      move file boundaries);
    - float/double → ``{"kind": "double", "cuts": [...]}`` — quantile
      cut points from ``approxQuantile`` (one bounded driver collect,
      the same sampling every range partitioner does);
    - string → ``{"kind": "string", "dict": [...]}`` — the sorted
      distinct values, as a literal map expression up to
      :data:`STRING_DICT_MAX`; between that and
      :data:`STRING_JOIN_MAX` the kind is ``"string_join"`` (same
      frozen dictionary, ranked via a broadcast dictionary join —
      the 100 TB path for e.g. a thousand-domain clustering column);
      past the join cap it raises (hash the column instead).

    Cost: one aggregate over df for min/max dims + one approxQuantile
    pass per double dim + one capped distinct per string dim — all
    driver results are O(cells), never O(rows)."""
    dtypes = dict(df.dtypes)
    intish = ("tinyint", "smallint", "int", "bigint")
    mm_cols = [
        c for c in cols
        if dtypes[c] in intish or dtypes[c] in ("date", "timestamp")
    ]
    row = None
    if mm_cols:
        row = df.agg(
            *[F.min(c).alias(f"lo_{c}") for c in mm_cols],
            *[F.max(c).alias(f"hi_{c}") for c in mm_cols],
        ).collect()[0]
    spec: dict[str, dict] = {}
    for c in cols:
        dt = dtypes.get(c)
        if dt in intish:
            spec[c] = {"kind": "int", "lo": row[f"lo_{c}"], "hi": row[f"hi_{c}"]}
        elif dt == "date":
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            spec[c] = {
                "kind": "date",
                "lo": None if lo is None else (lo - _EPOCH).days,
                "hi": None if hi is None else (hi - _EPOCH).days,
            }
        elif dt == "timestamp":
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            spec[c] = {
                "kind": "timestamp",
                "lo": None if lo is None else int(lo.timestamp()),
                "hi": None if hi is None else int(hi.timestamp()),
            }
        elif dt in ("float", "double"):
            n = DOUBLE_QUANTILE_CELLS
            cuts = df.approxQuantile(c, [i / n for i in range(1, n)], 0.001)
            spec[c] = {"kind": "double", "cuts": sorted(set(cuts))}
        elif dt == "string":
            vals = [
                r[c]
                for r in df.select(c).distinct().limit(
                    STRING_JOIN_MAX + 1
                ).collect()
                if r[c] is not None
            ]
            if len(vals) > STRING_JOIN_MAX:
                raise ValueError(
                    f"string z-dimension '{c}' exceeds {STRING_JOIN_MAX} "
                    f"distinct values — a frozen identity dictionary is "
                    f"no longer a bounded model; hash the column and "
                    f"z-order on the hash instead"
                )
            kind = "string" if len(vals) <= STRING_DICT_MAX else "string_join"
            spec[c] = {"kind": kind, "dict": sorted(vals)}
        else:
            raise ValueError(
                f"unsupported z-dimension type for '{c}': {dt}"
            )
    return spec


def _string_rank_values(d: list, top: int) -> list[int]:
    """Pre-scaled rank per sorted-dictionary position — ONE formula
    shared by the literal-map and broadcast-join variants, so crossing
    :data:`STRING_DICT_MAX` changes the physical rank strategy but
    never a single key value. Monotone in dictionary order; when the
    dictionary outnumbers the cells, tail values share the top cell
    (layout-only coarsening, same as any rank clamp)."""
    if not d:
        return []
    step = max(top // max(len(d) - 1, 1), 1) if len(d) > 1 else 0
    return [min(i * step, top) if step else 0 for i in range(len(d))]


def _join_rank_col(c: str) -> str:
    """Name of the temporary broadcast-joined rank column for dim c."""
    return f"__zrank_{c}"


def with_string_join_ranks(
    df: DataFrame, spec: dict[str, dict], bits: int
) -> tuple[DataFrame, list[str]]:
    """Attach ``__zrank_<c>`` for every ``string_join`` dimension via a
    LEFT broadcast join against the frozen dictionary (a 2-column,
    ≤ :data:`STRING_JOIN_MAX`-row build side — BroadcastHashJoin, no
    shuffle, no literal expression of dictionary size). Unseen values
    and NULLs surface as a NULL rank for the rank expression to
    resolve (top cell / NULL key respectively). Original column order
    is preserved; returns the added column names for the caller to
    drop after interleaving."""
    top = (1 << bits) - 1
    added: list[str] = []
    for c, s in spec.items():
        if s.get("kind") != "string_join":
            continue
        d = s["dict"]
        rc = _join_rank_col(c)
        if not d:
            df = df.withColumn(rc, F.lit(0).cast("long"))
            added.append(rc)
            continue
        ranks = _string_rank_values(d, top)
        dict_df = df.sparkSession.createDataFrame(
            list(zip(d, [int(r) for r in ranks])),
            f"`{c}` string, `{rc}` long",
        )
        cols = df.columns
        df = df.join(F.broadcast(dict_df), on=c, how="left").select(
            *cols, rc
        )
        added.append(rc)
    return df, added


def _double_bucket(col: Column, cuts: list[float]) -> Column:
    """Quantile-cut bucket of a double value: ``#cuts ≤ x``, an
    O(cuts) JVM fold in [0, len(cuts)]. Shared by the rank expression
    and the drift monitor's occupancy histogram so the monitored
    buckets are exactly the layout's cells."""
    return F.aggregate(
        F.array(*[F.lit(float(q)) for q in cuts]),
        F.lit(0).cast("long"),
        lambda acc, q: acc
        + F.when(col >= q, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )


def _typed_rank(c: str, s: dict, bits: int) -> Column:
    """The JVM rank expression for one typed dimension (NULL → NULL
    rank, out-of-spec values clamp — identical contracts to
    :func:`rank_scale`). ``string_join`` dims read the rank their
    broadcast dictionary join attached (:func:`with_string_join_ranks`
    must have run) — the expression itself stays O(1) regardless of
    dictionary size."""
    col = F.col(c)
    top = (1 << bits) - 1
    kind = s["kind"]
    if kind == "int":
        return rank_scale(col, s["lo"], s["hi"], bits)
    if kind == "date":
        return rank_scale(F.unix_date(col), s["lo"], s["hi"], bits)
    if kind == "timestamp":
        return rank_scale(col.cast("long"), s["lo"], s["hi"], bits)
    if kind == "double":
        cuts = s["cuts"]
        if not cuts:  # constant column: every row in cell 0
            return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        # rank = #cuts ≤ x; spread the ≤cells quantile rank across the
        # full 2^bits key space so mixed-type interleaves stay balanced
        rank = _double_bucket(col, cuts)
        stretch = max(top // len(cuts), 1)
        return _clamp(rank * F.lit(stretch), col, top)
    if kind == "string":
        d = s["dict"]
        if not d:
            return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        # dictionary rank pre-scaled into the key space at build time;
        # unseen values (ingest drift) clamp via coalesce to the top
        # cell — same edge-cell degradation as numeric outliers
        ranks = _string_rank_values(d, top)
        pairs = []
        for v, r in zip(d, ranks):
            pairs += [F.lit(v), F.lit(r)]
        looked = F.element_at(F.create_map(*pairs), col)
        mapped = F.coalesce(looked, F.lit(top)).cast("long")
        return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(mapped)
    if kind == "string_join":
        # unseen value → joined rank NULL → top cell; NULL input → NULL
        mapped = F.coalesce(F.col(_join_rank_col(c)), F.lit(top)).cast("long")
        return F.when(col.isNull(), F.lit(None).cast("long")).otherwise(mapped)
    raise ValueError(f"unknown z-dimension kind: {kind}")


def typed_zorder_key_fixed(
    df: DataFrame,
    spec: dict[str, dict],
    bits: int = 10,
    key_col: str = "__z",
) -> DataFrame:
    """Z-key against a FIXED typed rank spec (the streaming-ingest
    form — same frozen-bounds contract as :func:`zorder_key_fixed`,
    generalized to date/timestamp/double/string dimensions)."""
    for c, s in spec.items():
        if s["kind"] in ("int", "date", "timestamp") and (
            s.get("lo") is None or s.get("hi") is None
        ):
            raise ValueError(
                f"z-order spec for '{c}' has NULL bounds — the bounds "
                f"aggregate saw only NULLs; drop the dimension or "
                f"backfill it."
            )
    joined, tmp = with_string_join_ranks(df, spec, bits)
    ranks = [_typed_rank(c, s, bits) for c, s in spec.items()]
    out = joined.withColumn(key_col, interleave_bits(ranks, bits))
    return out.drop(*tmp) if tmp else out


def typed_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 10, key_col: str = "__z"
) -> tuple[DataFrame, dict[str, dict]]:
    """Derive the typed spec from ``df`` and key it; returns
    ``(keyed_df, spec)`` so callers can persist the spec (txlog commit
    metadata) and hand it to a streaming maintainer unchanged."""
    spec = typed_bounds(df, cols)
    return typed_zorder_key_fixed(df, spec, bits=bits, key_col=key_col), spec

