"""Plan-scoped cache lifetime for operators that persist an internal frame.

Several multi-pass operators (``prefix.ordered_prefix_sum``, the exact
quantile family) persist a projection of their input because the
deterministic two-pass shape scans it 2-3 times: once for split-key
sampling, once for per-bucket tallies, once in the returned plan. The
persisted frame must stay cached until the RETURNED plan has run — the
function cannot unpersist before returning without re-deriving the whole
upstream subtree in the final job.

``release_with(result, cached)`` ties the cached frame's lifetime to the
returned DataFrame's Python object: a ``weakref.finalize`` unpersists the
cached frame (non-blocking) when the result is garbage-collected. Library
callers that build a plan, materialize it, and drop the handle therefore
release executor memory/disk without any explicit call; sessions that
keep the handle keep the cache, which is the behavior a re-runnable plan
wants. ``spark.catalog.clearCache()`` remains the big hammer (bench.py
uses it between queries).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame


def release_with(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` (non-blocking) when ``result`` is GC'd.

    Holds only the JVM handle in the closure so the finalizer does not
    keep the Python ``cached`` object alive. Unpersisting a frame whose
    blocks are in use is safe in Spark — downstream tasks recompute from
    lineage — so a late job on a resurrected plan degrades to recompute,
    never to a wrong result.
    """
    jdf = cached._jdf

    def _release() -> None:
        try:
            jdf.unpersist(False)
        except Exception:
            pass  # JVM gateway already shut down at interpreter exit

    weakref.finalize(result, _release)
    return result
