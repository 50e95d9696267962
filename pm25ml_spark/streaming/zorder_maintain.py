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

Delivery is AT-LEAST-ONCE, same caveat as
``streaming/dedup_maintain.py``: the checkpoint makes batch ids
deterministic and a fully-drained AvailableNow restart is a no-op, but
a crash BETWEEN a batch's txlog append and its checkpoint record
replays that batch on restart and duplicates its rows — true
exactly-once would need (query, epoch) commit fencing in the table,
which ``sink_stream_upsert`` implements for keyed sinks; an append-only
clustered copy would carry the batch id and dedup on read, or accept
the standard foreachBatch contract, as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_zorder_stream(
    stream_df: DataFrame,
    table,
    bounds: dict[str, tuple[int, int]],
    bits: int = 10,
    key_col: str = "__z",
    query_name: str = "zorder_maintain",
    checkpoint_dir: str | None = None,
    timeout_s: int = 300,
):
    """Drain ``stream_df`` with AvailableNow, appending z-keyed,
    stats-tracked commits to ``table`` (a TxTable). ``bounds`` are the
    table's fixed per-column key bounds (insertion order = interleave
    order). Returns the finished StreamingQuery."""
    import tempfile

    from pm25ml_spark.operators.zorder import zorder_key_fixed

    nparts = stream_df.sparkSession.sparkContext.defaultParallelism
    stats_cols = list(bounds)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keyed = zorder_key_fixed(batch_df, bounds, bits=bits, key_col=key_col)
        table.append(
            keyed.repartitionByRange(nparts, F.col(key_col)),
            stats_cols=stats_cols,
        )

    q = (
        stream_df.writeStream.foreachBatch(apply)
        .queryName(query_name)
        .option(
            "checkpointLocation",
            checkpoint_dir or tempfile.mkdtemp(prefix=f"{query_name}_chk_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"z-order maintenance '{query_name}' did not drain within "
            f"{timeout_s}s"
        )
    return q
