"""Measure streaming state-store size across micro-batches.

SCALING.md claims the streaming operators hold O(rate × watermark
horizon) state, not O(stream length). This probe MEASURES it: the
events table is split into chronological slices (one micro-batch each,
mtimes staggered so the file source replays them in time order), the
watermarked operators run with Trigger.AvailableNow, and each batch's
`stateOperators.numRowsTotal` is read off the StreamingQuery progress.
Bounded state shows as a plateau (or decline) while cumulative input
keeps growing; state that tracked stream length would grow linearly
with batch number.

Run:  python tools/streaming_state_probe.py [sf_dir] [n_slices]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _slice_events(spark, sf_dir: str, out_dir: str, n: int) -> None:
    """Write n chronological slices of events as separate parquet files
    with increasing mtimes (the file source orders batches by mtime)."""
    from pm25ml_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    # ntile over ts would be a global sort; the probe corpus is small,
    # but stay honest: slice by time range instead.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n
    base = None
    for i in range(n):
        s, e = lo + i * span, lo + (i + 1) * span
        part = ev.filter(
            (F.col("ts") >= F.lit(s)) & (F.col("ts") < F.lit(e))
            if i < n - 1
            else (F.col("ts") >= F.lit(s))
        )
        tmp = os.path.join(out_dir, f"_stage_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(out_dir, f"events_{i:02d}.parquet")
        shutil.move(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp)
        if base is None:
            base = os.path.getmtime(dst)
        os.utime(dst, (base + i, base + i))


def _drain_and_probe(stream_df, name: str, mode: str) -> list[dict]:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"{name}_chk_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    rows = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        rows.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_removed": sum(o.get("numRowsRemoved", 0) for o in ops),
            }
        )
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from pm25ml_spark.session import get_spark
    from pm25ml_spark.streaming.events import (
        dedup_stream,
        read_events_stream,
        session_windows,
    )

    spark = get_spark("streaming-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    stage = tempfile.mkdtemp(prefix="state_probe_")
    _slice_events(spark, sf_dir, stage, n)

    def stream():
        return read_events_stream(
            spark, stage, max_files_per_trigger=1, glob="events_*.parquet"
        )

    report = {"sf_dir": sf_dir, "n_slices": n, "operators": {}}
    sess = session_windows(stream(), gap="30 minutes", watermark="1 day")
    report["operators"]["session_windows(wm=1d)"] = _drain_and_probe(
        sess, "probe_sessions", "append"
    )
    ded = dedup_stream(stream(), watermark="1 day", keys=("event_id",))
    report["operators"]["dedup(wm=1d)"] = _drain_and_probe(
        ded, "probe_dedup", "append"
    )
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
