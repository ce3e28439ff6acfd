"""Connected components over duplicate-pair edges (dedup clustering).

Pair generators (exact sha groups, Jaccard, MinHash-LSH, embedding
near-dup) emit EDGES; deduplication needs the transitive CLUSTERS —
"keep one document per component". This is the step between "found
339 near-dup pairs" and an actual keep/drop decision list.

Spark-first shape: iterative min-label propagation —

    label(v) ← min(label(v), min over neighbors' label)

repeated to fixpoint. Each round is one join + one aggregation,
both keyed by vertex id (no hot axis beyond the graph's own degree
skew, which the aggregation absorbs as partial min). Convergence in
O(component diameter) rounds — dup clusters are shallow (near-clique
chains), so single digits in practice; ``max_iterations`` bounds the
worst case and the loop stops as soon as a round changes nothing.
Every round persists its labels and unpersists the previous round,
so lineage stays O(1) and a failed executor recomputes one round,
not the whole history. At extreme diameters, the two-phase
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves round count; the per-round plan
here is the same join shape, so it drops in without changing callers.

Determinism: labels are ids and every step is a min — the fixpoint
is the component-minimum id regardless of partitioning or round
interleaving, so the output is oracle-checkable (DuckDB recursive
CTE computes the same min-reachable-id closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iterations: int = 25,
) -> DataFrame:
    """[a, b] edge pairs → [id, cluster_id] with cluster_id = the
    minimum id reachable from ``id``.

    ``vertices`` (optional, one ``id_col`` column) adds isolated
    nodes — they come back as their own singleton clusters. Raises
    if the propagation hasn't converged after ``max_iterations``
    (never legitimate for dedup clusters; a graph with that diameter
    needs the large-star variant documented above).
    """
    edges = (
        pairs.select(
            F.col(a_col).alias("src"), F.col(b_col).alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col(b_col).alias("src"), F.col(a_col).alias("dst")
            )
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias(id_col)).distinct()
    if vertices is not None:
        nodes = nodes.unionByName(
            vertices.select(F.col(id_col))
        ).distinct()
    edges = edges.persist()
    # each round's frame is localCheckpoint'ed: lineage TRUNCATION,
    # not just caching — labels appears twice in every round's plan
    # (join probe + label compare), so an uncut plan tree doubles per
    # round and the driver OOMs analyzing it long before data is a
    # problem. On a cluster, swap for checkpoint() on a reliable dir
    # if executor loss during the loop must be recoverable.
    labels = nodes.withColumn(
        "cluster_id", F.col(id_col)
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed(id_col, "src"), "src"
            )
            .groupBy("dst")
            .agg(F.min("cluster_id").alias("_nmin"))
            .withColumnRenamed("dst", id_col)
        )
        new_labels = (
            labels.join(neighbor_min, id_col, "left")
            .select(
                id_col,
                F.least(
                    F.col("cluster_id"), F.coalesce("_nmin", "cluster_id")
                ).alias("cluster_id"),
                (
                    F.coalesce("_nmin", "cluster_id")
                    < F.col("cluster_id")
                ).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.agg(
            F.sum(F.col("_chg").cast("long")).alias("n")
        ).collect()[0]["n"]
        labels = new_labels
        if not changed:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iterations} "
            "rounds — use the large-star/small-star variant for this graph"
        )
    edges.unpersist()
    return labels.drop("_chg")


def dedup_decisions(
    components: DataFrame, id_col: str = "id"
) -> DataFrame:
    """[id, cluster_id] → add ``keep`` (true for the cluster minimum —
    the deterministic survivor) and ``cluster_size``."""
    from pyspark.sql import Window as W

    w = W.partitionBy("cluster_id")
    return components.select(
        id_col,
        "cluster_id",
        (F.col(id_col) == F.min(id_col).over(w)).alias("keep"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
