"""Connected components over duplicate-pair edges (dedup clustering).

Pair generators (exact sha groups, Jaccard, MinHash-LSH, embedding
near-dup) emit EDGES; deduplication needs the transitive CLUSTERS —
"keep one document per component". This is the step between "found
339 near-dup pairs" and an actual keep/drop decision list.

Spark-first shape: iterative min-label propagation —

    label(v) ← min(label(v), min over neighbors' label)

plus POINTER JUMPING (label(v) ← label(label(v)) — labels are node
ids, so the label table maps its own values), repeated to fixpoint.
Each round is two joins + one aggregation, all keyed by vertex id
(no hot axis beyond the graph's own degree skew, which the
aggregation absorbs as partial min). The jump gives O(log diameter)
convergence — a path graph of 200 nodes closes in ~8 rounds, a
1M-chain in ~20 — the same doubling trick as large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond").
``max_iterations`` bounds the worst case and the loop stops as soon
as a full round changes nothing. Every round localCheckpoints its
labels, so the logical plan stays O(1) (labels appear three times
per round's plan; an uncut tree doubles per iteration and the
driver OOMs on plan analysis long before data is a problem).

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

    def _label_sum(frame: DataFrame):
        # labels only ever decrease, so the exact decimal sum is a
        # strictly-decreasing convergence witness — no compare join
        return frame.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(labels)
    # try/finally: the persisted edge table must not outlive the loop
    # even when the fixpoint check raises (or any round fails)
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(
                    labels.withColumnRenamed(id_col, "src"), "src"
                )
                .groupBy("dst")
                .agg(F.min("cluster_id").alias("_nmin"))
                .withColumnRenamed("dst", id_col)
            )
            # checkpointed BEFORE the self-join below, which would
            # otherwise evaluate the step plan (a shuffle join + agg)
            # once per side. This is the round's ONLY eager barrier:
            stepped = (
                labels.join(neighbor_min, id_col, "left")
                .select(
                    id_col,
                    F.least(
                        F.col("cluster_id"), F.coalesce("_nmin", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            # pointer jump: cluster_id ← label(cluster_id). Labels are
            # node ids, so the label table maps its own values; one
            # extra self-join per round turns O(diameter) convergence
            # into O(log diameter) — a 1M chain is ~20 rounds, not 1M.
            labels = (
                stepped.alias("a")
                .join(
                    stepped.select(
                        F.col(id_col).alias("_jid"),
                        F.col("cluster_id").alias("_jlab"),
                    ),
                    F.col("a.cluster_id") == F.col("_jid"),
                    "left",
                )
                .select(
                    F.col(f"a.{id_col}").alias(id_col),
                    F.least(
                        F.col("a.cluster_id"),
                        F.coalesce("_jlab", F.col("a.cluster_id")),
                    ).alias("cluster_id"),
                )
                # lazy: the convergence-sum collect below doubles as
                # this checkpoint's materializing action — 2 job
                # barriers per round, not 3
                .localCheckpoint(eager=False)
            )
            cur_sum = _label_sum(labels)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
        else:
            raise RuntimeError(
                f"connected_components: no fixpoint after {max_iterations} "
                "rounds — use the large-star/small-star variant for this "
                "graph"
            )
    finally:
        edges.unpersist()
    return labels


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
