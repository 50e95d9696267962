"""Streaming maintenance of the duplicate-pair edge artifact.

The batch side of the incremental lifecycle (``plans/dup_graph.
dup_edges_incremental``) models ingest batches as predetermined doc_id
slices; THIS module runs the same lifecycle from a real Structured
Streaming source: every micro-batch of new documents

1. is shingled ONCE (``operators.dedup.shingle_arrays``) and appended
   to the transaction-log shingle store (one commit per batch);
2. probes the store's PRE-BATCH snapshot (a time-travel read — earlier
   batches included, text never re-shingled) with the asymmetric
   prefix-filtered join (``jaccard_pairs_between``,
   O(batch × collisions), never O(corpus²));
3. appends its delta — cross pairs + batch-internal pairs, tagged with
   the micro-batch id — to the edge table as one commit.

Invariant (the oracle-checked claim): after draining ANY split of a
corpus through this sink, the edge table equals the from-scratch
``jaccard_pairs`` over the full corpus — ingest order and batch
boundaries cannot change an exact pair set, only each pair's
``src_batch`` provenance (= the batch in which its later-arriving
endpoint landed, which the test pins).

This is the ``foreachBatch`` composition of the engine's streaming and
storage layers: the reference stages corpus-derived artifacts the same
build-once way (``combiners/data_artifact.py:10-44``); at 100 TB this
sink IS the ingest pipeline that keeps those artifacts fresh.

Exactly-once: the streaming checkpoint makes batch delivery
at-least-once with deterministic batch ids; a REPLAYED batch re-runs
``apply`` — the txlog appends are idempotent-per-batch only through the
checkpoint's replay protocol (a fully-drained AvailableNow run restarts
as a no-op, which the test pins). Cross-run dedup of partially-applied
batches would need commit-id fencing in the table, the standard
foreachBatch caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pm25ml_spark.session import ensure_runtime_confs


def read_documents_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int = 1,
    glob: str = "documents*.parquet",
) -> DataFrame:
    """File-source stream over a documents directory (one micro-batch
    per file at the default trigger size)."""
    ensure_runtime_confs(spark)
    static = spark.read.option("pathGlobFilter", glob).parquet(dir_path)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", glob)
        .parquet(dir_path)
    )


def maintain_dup_edges_stream(
    stream_docs: DataFrame,
    shingle_table,
    edges_table,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    query_name: str = "dup_edges_maintain",
    checkpoint_dir: str | None = None,
    timeout_s: int = 300,
):
    """Drain ``stream_docs`` (columns incl. ``doc_id``, ``text``) with
    AvailableNow, maintaining the shingle store and edge TxTables one
    commit per micro-batch. Returns the finished StreamingQuery."""
    import tempfile

    from pm25ml_spark.operators import dedup as D

    nparts = stream_docs.sparkSession.sparkContext.defaultParallelism

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.select("doc_id", "text")
        if batch_df.isEmpty():
            return
        # persisted: the shingle frame feeds the store append AND both
        # delta joins; unpersisted in the same batch (no LRU needed —
        # the jobs run eagerly inside foreachBatch)
        batch_sh = D.shingle_arrays(batch_df, n=n)
        try:
            post_version = shingle_table.append(
                batch_sh.repartitionByRange(nparts, F.col("doc_id")),
                stats_cols=["doc_id"],
            )
            # one probe of batch vs (pre-batch store ∪ batch) yields the
            # full delta — internal + cross pairs — in a single
            # df-aggregate/prefix/candidate/verify pipeline instead of
            # the two jaccard_pairs + jaccard_pairs_between pipelines.
            # The store-∪-batch side reads the POST-append snapshot —
            # the identical row set as one parquet scan (bootstrap
            # included: empty store + batch = the snapshot), so the
            # verify join's second broadcast becomes a ReusedExchange
            # instead of a second store-wide collect (see
            # jaccard_delta_pairs).
            delta = D.jaccard_delta_pairs(
                batch_sh,
                None,
                t_num=t_num,
                t_den=t_den,
                sh_combined=shingle_table.read(version=post_version),
            )
            edges_table.append(
                delta.withColumn(
                    "src_batch", F.lit(int(batch_id))
                ).repartitionByRange(nparts, F.col("doc_a")),
                stats_cols=["doc_a", "doc_b"],
            )
        finally:
            batch_sh.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(apply)
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
            f"dup-edge maintenance '{query_name}' did not drain within "
            f"{timeout_s}s"
        )
    return q
