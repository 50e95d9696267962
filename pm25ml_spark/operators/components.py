"""Distributed connected components (min-label propagation).

The last step of every dedup pipeline: near-dup PAIRS form a graph whose
connected components are the duplicate CLUSTERS (keep one doc per
component). This is the canonical iterative Spark algorithm done with
DataFrames only:

- each node starts labeled with its own id,
- every iteration each node takes the min label among itself and its
  neighbors (one join + one map-side-combinable min aggregate),
- stop when no label changed (or ``max_iter``).

Converges in O(graph diameter) iterations — near-dup graphs are
overwhelmingly small star-shaped clusters, so 3-5 iterations finish real
corpora. Each iteration eagerly ``localCheckpoint``s its labels (truncating the
lineage) and unpersists the previous round — the standard trap of
iterative DataFrame algorithms is a lazily-persisted label frame whose
plan, and therefore every convergence check, grows with each round.

Execution is size-adaptive (the AQE philosophy applied to an iterative
algorithm): an edge list at or below ``small_graph_edges`` collapses to
a driver-side union-find — the same flip a broadcast join makes, since
a pruned near-dup edge list is almost always tiny relative to the
corpus even when the corpus is 100 TB; the distributed min-label loop
engages above the threshold. Both paths emit identical labels.

Deterministic (min over longs), so oracle-checkable: the DuckDB dual is
a recursive-CTE transitive closure + min-reachable-id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    small_graph_edges: int = 500_000,
) -> DataFrame:
    """Return (node, component) where component = min node id in the
    node's connected component. Nodes are the edge endpoints.

    Size-adaptive execution: the edge list is counted first (it must be
    materialized anyway — every propagation round re-joins it). At or
    below ``small_graph_edges`` the graph collapses to a driver-side
    union-find — near-dup edge lists are tiny relative to the corpus
    (pairs that SURVIVED similarity pruning), and a sub-second
    union-find beats O(diameter) full shuffle rounds by ~10× even
    locally. Above the threshold the distributed min-label loop runs.
    Both paths produce identical labels (min id per component), so the
    flip is invisible to every oracle."""
    base = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).persist()
    n_edges = base.count()
    if n_edges <= small_graph_edges:
        rows = base.collect()  # contract-small: ≤ small_graph_edges rows
        base.unpersist()
        return _driver_union_find(edges.sparkSession, rows)
    sym = base.union(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # the edge list is re-joined every iteration (plus the convergence
    # count) — persist it or the ENTIRE upstream pipeline (e.g. the
    # prefix-filtered Jaccard join) re-executes once per iteration.
    sym = sym.persist()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).persist()
    labels.count()
    prev_materialized = labels  # whatever holds the previous round's blocks

    converged = False
    for _it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_label"))
        )
        # localCheckpoint EVERY iteration: eager materialization truncates
        # the lineage, so the convergence count and the next round read a
        # flat plan. Lazy persist() instead lets the plan (and the
        # convergence-check job) grow with every round — measured 10-20×
        # slower on the same graph. The ``changed`` flag is computed
        # INSIDE the same plan so convergence is a filter-count over the
        # checkpointed rows — joining new labels back to old ones for the
        # check would add a second shuffle join per iteration.
        new_component = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_label"), F.col("component")),
        )
        checkpointed = (
            labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
            .select(
                "node",
                new_component.alias("component"),
                (new_component < F.col("component")).alias("changed"),
            )
            .localCheckpoint()
        )
        n_changed = checkpointed.filter("changed").count()
        prev_materialized.unpersist()
        prev_materialized = checkpointed
        labels = checkpointed.select("node", "component")
        if n_changed == 0:
            converged = True
            break
    sym.unpersist()
    base.unpersist()
    if not converged:
        # silently-wrong labels (a long chain split into several
        # components) would silently KEEP duplicates downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations — raise max_iter (diameter exceeds it)"
        )
    return labels


def _driver_union_find(spark, rows) -> DataFrame:
    """Union-find with path halving over a collected edge list; labels
    are the min node id per component (same contract as the loop)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r[0], r[1]
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    minimum: dict[int, int] = {}
    for n in parent:
        root = find(n)
        minimum[root] = min(minimum.get(root, n), n)
    out = [(n, minimum[find(n)]) for n in parent]
    return spark.createDataFrame(out, "node long, component long")


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs → duplicate clusters: (doc_id, cluster_id,
    cluster_size, is_keeper). cluster_id = min doc id in the component;
    the keeper is that minimum (the reference-style "keep lowest id"
    policy used by exact dedup)."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    # NO broadcast hint on sizes: component cardinality is corpus-
    # proportional (one row per duplicate cluster) — let AQE pick the
    # join strategy from the actual size
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).cast("int").alias("is_keeper"),
        )
    )
