"""Build-once duplicate-pair graph artifact (the 100 TB topology).

Round-8 bench read: gr01-gr05 + dd08/dd11/cp09 each rebuilt the exact
n-gram-Jaccard pair list from the raw corpus — correct, but at corpus
scale recomputing a corpus-wide MinHash/shingle join per analytics query
is the wrong shape. Production dedup pipelines stage the pair graph ONCE
(the reference stages intermediate artifacts the same way —
``combiners/data_artifact.py:10-44``) and every downstream analysis
(PageRank, triangles, k-core, BFS, assortativity, soft-dedup weights,
canonical selection) reads the staged edge list.

``dup_edges`` is that stage: the first caller in a session materializes
``operators.dedup.jaccard_pairs`` into a transaction-log table (our own
lakehouse layer — atomic swap, snapshot reads, per-file ``doc_a``/
``doc_b`` min-max stats for pruned seed lookups) under a process-local
temp dir; every later caller gets a parquet scan. At 100 TB the artifact
would live on the object store next to the corpus and be refreshed by
the ingest pipeline, not per query — the session-scoped memo here is the
local-mode stand-in for that lifecycle.

The artifact is partitioned by ``doc_a`` hash so the edge files are
uniform regardless of upstream skew; graph queries that start from a
node set can prune files via the recorded stats instead of scanning the
full edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pm25ml_spark.catalog import load_table
from pm25ml_spark.plans.artifacts import staged_table


def dup_edges(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """The staged duplicate-pair edge list for ``sf_dir``'s documents.

    Columns: ``(doc_a, doc_b, shared, jaccard)`` with ``doc_a < doc_b``
    — exactly :func:`pm25ml_spark.operators.dedup.jaccard_pairs`, built
    once per (session, corpus, params) and served from the staged table
    afterwards (``plans/artifacts.staged_table``).
    """
    from pm25ml_spark.operators import dedup as D

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return D.jaccard_pairs(docs, n=n, t_num=t_num, t_den=t_den)

    return staged_table(
        spark,
        sf_dir,
        "dup_edges",
        (n, t_num, t_den),
        build,
        # RANGE layout on doc_a: per-file [min, max] stats are tight, so
        # seed-targeted reads (gr07 ego lookup) skip every non-matching
        # file via TxTable.read_pruned — the point-lookup shape a 100 TB
        # edge artifact must support
        range_col="doc_a",
        stats_cols=["doc_a", "doc_b"],
        # key the stage to the corpus's content version: an in-place
        # mutation of documents.parquet triggers a rebuild, never a
        # stale artifact served for the rest of the session
        inputs=("documents",),
    )


def dup_edges_pruned(
    spark: SparkSession,
    sf_dir: str,
    lo,
    hi,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """Stats-pruned point lookup on the staged edge list: only files
    whose recorded doc_a range intersects [lo, hi] are opened."""
    from pm25ml_spark.plans.artifacts import staged_table_handle

    t = staged_table_handle(spark, sf_dir, "dup_edges", (n, t_num, t_den))
    return t.read_pruned("doc_a", lo, hi)


# dd15's ingest-batch model: doc_id % 10 == 7 is the incoming slice,
# everything else is the pre-existing corpus.
_BATCH_MOD, _BATCH_REM = 10, 7


def corpus_shingles_staged(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    batch_mod: int = _BATCH_MOD,
    batch_rem: int = _BATCH_REM,
) -> DataFrame:
    """Build-once staged shingle store for the PRE-BATCH corpus
    (``doc_id % batch_mod != batch_rem``): one row per doc with its
    60-bit shingle-hash array (``operators.dedup.shingle_arrays``).
    Production dedup keeps exactly this table next to the corpus so an
    ingest refresh probes staged hashes instead of re-tokenizing 100 TB
    of text — both the base edge build and every batch delta read it
    (``BUILD_COUNTS['corpus_shingles'] == 1`` is the not-re-shingled
    pin)."""
    from pm25ml_spark.operators import dedup as D

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % batch_mod != batch_rem
        )
        # .unpersist() immediately: the staged write materializes the
        # frame exactly once, so the operator's internal cache would
        # only hold memory past the build
        return D.shingle_arrays(docs, n=n).unpersist()

    return staged_table(
        spark,
        sf_dir,
        "corpus_shingles",
        (n, batch_mod, batch_rem),
        build,
        range_col="doc_id",
        stats_cols=["doc_id"],
        inputs=("documents",),
    )


def dup_edges_incremental(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
    batch_mod: int = _BATCH_MOD,
    batch_rem: int = _BATCH_REM,
) -> DataFrame:
    """INCREMENTALLY-MAINTAINED duplicate-pair edge artifact — the
    refresh lifecycle a 100 TB dedup pipeline actually runs, closing
    the loop dd15 opened:

    - commit 1 (``base``): the corpus-only pair list
      (:func:`pm25ml_spark.operators.dedup.jaccard_pairs` over the
      pre-batch docs, consuming the staged shingle store).
    - commit 2 (``delta_batch``): the ingest batch arrives; ONLY the
      delta is computed — batch-vs-corpus cross pairs via the
      asymmetric prefix-filtered probe (``jaccard_pairs_between``,
      corpus side read from the staged shingles, O(batch × collisions))
      plus the batch-internal pairs — and APPENDED as one
      transaction-log commit.

    The exact-Jaccard pair set partitions cleanly into corpus×corpus ∪
    batch×corpus ∪ batch×batch, so the incrementally-maintained table
    EQUALS a from-scratch rebuild over the full corpus — which is
    exactly what the gr08 oracle recomputes. The corpus is never
    re-shingled and the O(corpus × corpus) join never re-runs at
    refresh time (pinned via BUILD_COUNTS in ``tests/test_dup_graph``).

    Output columns match :func:`dup_edges`: ``(doc_a, doc_b, shared,
    jaccard)`` with ``doc_a < doc_b``.
    """
    from pm25ml_spark.operators import dedup as D
    from pm25ml_spark.plans.artifacts import staged_incremental_table

    docs = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % batch_mod == batch_rem

    def build_base() -> DataFrame:
        sh_cor = corpus_shingles_staged(spark, sf_dir, n, batch_mod, batch_rem)
        return D.jaccard_pairs(
            docs.filter(~is_batch), n=n, t_num=t_num, t_den=t_den, sh=sh_cor
        )

    def build_delta() -> DataFrame:
        batch = docs.filter(is_batch)
        sh_cor = corpus_shingles_staged(spark, sf_dir, n, batch_mod, batch_rem)
        cross = D.jaccard_pairs_between(
            batch,
            docs.filter(~is_batch),
            n=n,
            t_num=t_num,
            t_den=t_den,
            sh_cor=sh_cor,
        ).select(
            F.least("new_id", "corpus_id").alias("doc_a"),
            F.greatest("new_id", "corpus_id").alias("doc_b"),
            "shared",
            "jaccard",
        )
        internal = D.jaccard_pairs(
            batch, n=n, t_num=t_num, t_den=t_den
        ).select("doc_a", "doc_b", "shared", "jaccard")
        return cross.unionByName(internal)

    return staged_incremental_table(
        spark,
        sf_dir,
        "dup_edges_incr",
        (n, t_num, t_den, batch_mod, batch_rem),
        [("base", build_base), ("delta_batch", build_delta)],
        range_col="doc_a",
        stats_cols=["doc_a", "doc_b"],
        inputs=("documents",),
    )


def dup_edges_symmetric(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    t_num: int = 3,
    t_den: int = 5,
) -> DataFrame:
    """Both orientations of the staged edge list: ``(src, dst)`` with
    every undirected pair appearing twice — the adjacency shape the
    iterative graph plans (PageRank, k-core, BFS, assortativity) start
    from. Two scans of the staged parquet, no recompute."""
    pairs = dup_edges(spark, sf_dir, n=n, t_num=t_num, t_den=t_den).select(
        "doc_a", "doc_b"
    )
    return pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
