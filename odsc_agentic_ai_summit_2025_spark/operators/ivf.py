"""IVF (inverted-file) approximate nearest neighbor — the scale path
for vector search (SURVEY V2; reference delegates ANN to LanceDB's
IVF index, src/generate_note_embeddings.py:49).

Spark-first, the index is two DataFrames:

- ``centroids``  [cluster_id, centroid: array<double>] — tiny; always
  broadcast.
- ``assigned``   corpus + [cluster_id] — written partitioned/bucketed
  by cluster_id so a query touching ``nprobe`` clusters prunes its
  scan to nprobe/k of the corpus (partition pruning does the work at
  100 TB; here the filter is an in-memory semi-join).

Search: score queries × centroids (broadcast), keep top-``nprobe``
clusters per query, then exact cosine only against vectors in those
clusters. ``nprobe = k_clusters`` degrades to exact brute force —
that's the oracle-checkable configuration; recall at nprobe < k is
asserted separately in tests.

KMeans runs through pyspark.ml (seeded). Centroid *membership* of a
query's top-nprobe list is ranking over exact double arithmetic, so
given fixed centroids results are deterministic under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine, cosine_vectorized


@dataclass
class IvfIndex:
    centroids: DataFrame  # [cluster_id, centroid]
    assigned: DataFrame   # corpus cols + [cluster_id]
    vec_col: str
    id_col: str


def ivf_build(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k_clusters: int,
    seed: int = 42,
    max_iter: int = 8,  # coarse quantizer: placement plateaus fast,
    # and each extra iteration is a full corpus pass
) -> IvfIndex:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = corpus.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=k_clusters, seed=seed, maxIter=max_iter, featuresCol="_features",
        predictionCol="cluster_id",
    ).fit(feat)
    assigned = model.transform(feat).drop("_features")
    centroids = (
        corpus.sparkSession.createDataFrame(
            [(i,) for i in range(k_clusters)], "cluster_id int"
        )
        .join(
            feat.sparkSession.createDataFrame(
                [
                    (i, [float(x) for x in c])
                    for i, c in enumerate(model.clusterCenters())
                ],
                f"cluster_id int, centroid array<double>",
            ),
            "cluster_id",
        )
    )
    return IvfIndex(centroids, assigned, vec_col, id_col)


def ivf_search(
    index: IvfIndex,
    queries: DataFrame,
    query_id_col: str,
    k: int,
    nprobe: int,
) -> DataFrame:
    """Top-k neighbors per query, scanning only nprobe clusters.

    Output: [q_id, n_id, rank] — rank ties broken on neighbor id
    (same contract as knn_bruteforce, so the two interchange).
    """
    q = queries.select(
        F.col(query_id_col).alias("q_id"),
        F.col(index.vec_col).alias("qv"),
    )
    # stage 1: route each query to its nprobe nearest centroids
    wq = W.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("cluster_id"))
    probes = (
        q.crossJoin(F.broadcast(index.centroids))
        .withColumn("c_cos", cosine(F.col("qv"), F.col("centroid")))
        .withColumn("c_rank", F.row_number().over(wq))
        .filter(F.col("c_rank") <= nprobe)
        .select("q_id", "qv", "cluster_id")
    )
    # stage 2: exact scoring inside probed clusters only. The probe
    # list is (queries × nprobe) rows — small; broadcast it against
    # the cluster-pruned corpus scan.
    c = index.assigned.select(
        F.col(index.id_col).alias("n_id"),
        F.col(index.vec_col).alias("nv"),
        "cluster_id",
    )
    wk = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    cos = cosine_vectorized()
    return (
        c.join(F.broadcast(probes), "cluster_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cos(F.col("qv"), F.col("nv")))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )
