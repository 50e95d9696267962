"""Session-scoped staged-table registry — build-once-analyze-many.

The general mechanism behind ``plans/dup_graph.py``: a corpus-derived
intermediate that several catalog queries share (duplicate-pair edges,
winnowing fingerprints, trained codebooks) is materialized ONCE per
(session, corpus, params) into a transaction-log table under a
process-local temp dir and read from parquet by every later consumer —
the reference stages intermediate artifacts the same way
(``combiners/data_artifact.py:10-44``). At 100 TB these artifacts live
on the object store next to the corpus, refreshed by the ingest
pipeline rather than per analytics query; the session memo here is the
local-mode stand-in for that lifecycle.

Correctness stays oracle-checked end-to-end: every consumer's DuckDB
oracle recomputes the artifact's content from the raw corpus, so a
stale or wrong staged table cannot hide behind the cache.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# (applicationId, sf_dir, name, params, input_fingerprint) -> TxTable path
_ARTIFACTS: dict[tuple, str] = {}
# (applicationId, sf_dir, name, params) -> path of the LATEST staged
# version (whatever input fingerprint it was built against) — the lookup
# table-level verbs use, since handle callers don't re-derive inputs
_LATEST: dict[tuple, str] = {}
# observability + test pin: from-scratch builds per artifact name
BUILD_COUNTS: dict[str, int] = {}
# honest-bench accounting: wall seconds spent building each artifact
# this process (bench.py folds these into the reported suite total —
# min-of-two-passes timing would otherwise hide the one-time build)
BUILD_SECONDS: dict[str, float] = {}
# concurrent consumers (e.g. parallel test workers sharing a session)
# must not each pay the build: one lock serializes first-build races —
# the loser re-checks the memo and reads the winner's table. REENTRANT:
# a build step may itself stage a sub-artifact (the incremental edge
# table's base build reads the staged corpus-shingle store), and a
# plain Lock would self-deadlock on that nested acquisition.
_LOCK = threading.RLock()


def _input_fingerprint(sf_dir: str, inputs: tuple[str, ...] | None) -> str:
    """Cheap snapshot-version fingerprint of the artifact's source data:
    md5 over the sorted (path, size, mtime_ns) listing of each input
    table (or of every table file under ``sf_dir`` when ``inputs`` is
    None). Folding this into the memo key means an in-place mutation of
    the corpus under the SAME path triggers a rebuild instead of serving
    a stale artifact for the rest of the session.

    At 100 TB the input is a lakehouse table and this is its snapshot/
    version id — one metadata read from the transaction log, never a
    full object listing; the stat-walk here is the local-parquet
    stand-in (a handful of files per sf_dir)."""
    import hashlib

    if inputs is None:
        paths = sorted(
            os.path.join(sf_dir, f)
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
    else:
        paths = [
            t if os.path.isabs(t) else os.path.join(sf_dir, f"{t}.parquet")
            for t in inputs
        ]
    h = hashlib.md5()
    for p in paths:
        files = []
        if os.path.isdir(p):
            for root, _dirs, names in os.walk(p):
                files.extend(os.path.join(root, n) for n in names)
        elif os.path.exists(p):
            files.append(p)
        for f in sorted(files):
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns};".encode())
    return h.hexdigest()


def staged_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    params: tuple,
    build: Callable[[], DataFrame],
    partition_col: str | None = None,
    range_col: str | None = None,
    stats_cols: list[str] | None = None,
    inputs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Return the staged table for ``(sf_dir, name, params)``, building
    it with ``build()`` on first use. ``partition_col`` hash-partitions
    the write (uniform files regardless of upstream skew); ``range_col``
    RANGE-partitions it instead, which makes the per-file min/max of
    that column TIGHT — the layout that turns ``stats_cols`` +
    ``TxTable.read_pruned`` into real data skipping (a hash layout puts
    the full key range in every file, so its stats prune nothing).
    ``stats_cols`` records per-file min/max for pruned point lookups.
    ``inputs`` names the source tables whose content version is folded
    into the memo key (see :func:`_input_fingerprint`); None fingerprints
    every table under ``sf_dir``."""
    from pyspark.sql import functions as F

    from pm25ml_spark.sources.txlog import TxTable

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
        params,
        _input_fingerprint(sf_dir, inputs),
    )
    path = _ARTIFACTS.get(key)
    if path is None:
        with _LOCK:
            path = _ARTIFACTS.get(key)  # re-check: a racer may have built
            if path is None:
                import time

                t0 = time.perf_counter()
                base = tempfile.mkdtemp(prefix=f"pm25ml_stage_{name}_")
                atexit.register(shutil.rmtree, base, True)
                path = os.path.join(base, name)
                df = build()
                nparts = spark.sparkContext.defaultParallelism
                if range_col is not None:
                    # single write job: repartitionByRange's per-job
                    # boundary resample can't bite here (content is
                    # identical either way; only the file layout
                    # depends on the sample)
                    df = df.repartitionByRange(nparts, F.col(range_col))
                elif partition_col is not None:
                    df = df.repartition(nparts, F.col(partition_col))
                TxTable(spark, path).append(df, stats_cols=stats_cols)
                BUILD_COUNTS[name] = BUILD_COUNTS.get(name, 0) + 1
                BUILD_SECONDS[name] = (
                    BUILD_SECONDS.get(name, 0.0) + time.perf_counter() - t0
                )
                _ARTIFACTS[key] = path
    _LATEST[key[:4]] = path
    return TxTable(spark, path).read()


def staged_incremental_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    params: tuple,
    steps: list[tuple[str, Callable[[], DataFrame]]],
    partition_col: str | None = None,
    range_col: str | None = None,
    stats_cols: list[str] | None = None,
    inputs: tuple[str, ...] | None = None,
    entry_extra=None,
) -> DataFrame:
    """INCREMENTALLY-MAINTAINED staged artifact: each ``(step, build)``
    appends one transaction-log commit on first use — the base build
    plus ingest-refresh lifecycle a production corpus artifact runs
    (full rebuilds only on bootstrap; every later refresh is an
    append-only delta commit). The table's log therefore ends at
    version ``len(steps)``, one commit per step, and
    ``BUILD_COUNTS[f"{name}.{step}"]`` pins that each step ran exactly
    once per (session, corpus-version, params) — the test hook proving
    a delta refresh did NOT re-run the base build.

    Same memo/locking/layout semantics as :func:`staged_table`; every
    step's output is laid out with the shared ``range_col``/
    ``partition_col`` policy so later commits keep the table's pruning
    contract. ``entry_extra`` (``written_df -> dict``) is forwarded to
    every step's :meth:`TxTable.append` — the hook maintained indices
    use to record per-commit drift audits (e.g.
    ``operators.similarity.ivf_commit_audit``) so a retrain signal can
    be read from the log alone."""
    import time

    from pyspark.sql import functions as F

    from pm25ml_spark.sources.txlog import TxTable

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
        params,
        _input_fingerprint(sf_dir, inputs),
    )
    path = _ARTIFACTS.get(key)
    if path is None:
        with _LOCK:
            path = _ARTIFACTS.get(key)
            if path is None:
                base = tempfile.mkdtemp(prefix=f"pm25ml_stage_{name}_")
                atexit.register(shutil.rmtree, base, True)
                path = os.path.join(base, name)
                table = TxTable(spark, path)
                nparts = spark.sparkContext.defaultParallelism
                for step, build in steps:
                    t0 = time.perf_counter()
                    df = build()
                    if range_col is not None:
                        df = df.repartitionByRange(nparts, F.col(range_col))
                    elif partition_col is not None:
                        df = df.repartition(nparts, F.col(partition_col))
                    table.append(
                        df, stats_cols=stats_cols, entry_extra=entry_extra
                    )
                    skey = f"{name}.{step}"
                    BUILD_COUNTS[skey] = BUILD_COUNTS.get(skey, 0) + 1
                    BUILD_SECONDS[skey] = (
                        BUILD_SECONDS.get(skey, 0.0)
                        + time.perf_counter()
                        - t0
                    )
                _ARTIFACTS[key] = path
    _LATEST[key[:4]] = path
    return TxTable(spark, path).read()


def staged_table_handle(
    spark: SparkSession, sf_dir: str, name: str, params: tuple
):
    """The TxTable handle of an ALREADY-STAGED artifact — for consumers
    that need table-level verbs (``read_pruned`` point lookups) instead
    of the full scan. Resolves to the LATEST staged version for the
    (sf_dir, name, params) triple. Raises if the artifact was never
    built this session (call the staging accessor first)."""
    from pm25ml_spark.sources.txlog import TxTable

    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        name,
        params,
    )
    path = _LATEST.get(key)
    if path is None:
        raise KeyError(
            f"staged artifact {name}{params} not built for {sf_dir} — "
            "call its staging accessor first"
        )
    return TxTable(spark, path)
