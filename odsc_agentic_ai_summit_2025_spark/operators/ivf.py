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

    def release(self) -> None:
        """Drop the persisted assignment (the in-memory index
        storage). The handle stays usable — the assignment plan just
        recomputes on next use. Long-lived sessions call this when
        the index is retired (the materialized-artifact analog is
        deleting the parquet)."""
        from ..cache import release_frame

        release_frame(self.assigned)


TRAIN_SAMPLE_CAP = 50_000


def lloyd_gemm(x, k: int, seed: int, max_iter: int):
    """Seeded Lloyd iterations with the (n,k)-GEMM distance identity
    argmin‖x−c‖² = argmin(‖c‖² − 2x·c) — shared by the IVF coarse
    quantizer and the PQ sub-quantizers (operators/pq.py). The naive
    broadcasted (n,k,dim) difference tensor materialized 1.6 GB per
    iteration at the 50k sample cap (38.7 s → ~1 s, r3 profile).
    Deterministic: seeded init, fixed iteration count."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(max_iter):
        d2 = (centers * centers).sum(1)[None, :] - 2.0 * (x @ centers.T)
        lab = d2.argmin(1)
        for j in range(len(centers)):
            pts = x[lab == j]
            if len(pts):
                centers[j] = pts.mean(0)
    return centers


def ivf_build(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k_clusters: int,
    seed: int = 42,
    max_iter: int = 15,
    train_sample: int = TRAIN_SAMPLE_CAP,
) -> IvfIndex:
    """Train the coarse quantizer on a bounded SAMPLE (collected to
    the driver, seeded Lloyd iterations in numpy), then assign the
    full corpus in one distributed GEMM pass.

    This is the 100 TB shape: nobody runs Lloyd over the full corpus —
    centroid quality converges with a few-hundred-points-per-centroid
    sample, and the only full-corpus work is a single mapInPandas
    assignment (vs. max_iter full passes for cluster-side KMeans).
    Deterministic: seeded sample, seeded init, fixed iteration count.
    """
    import numpy as np

    n = corpus.count()
    frac = min(1.0, train_sample / max(n, 1))
    sampled = (
        corpus.select(vec_col).sample(frac, seed)
        if frac < 1.0
        else corpus.select(vec_col)
    )
    # Arrow transfer (toPandas), not row collect: 50k array<double>
    # rows through py4j deserialize one cell at a time
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sampled.toPandas()[vec_col]]
    )
    centers = lloyd_gemm(x, k_clusters, seed, max_iter)

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
        "cluster_id int, centroid array<double>",
    )
    bc = spark.sparkContext.broadcast(centers)

    def assign(batches):
        import numpy as np
        import pandas as pd

        cts = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # argmin of ||v-c||² = argmax of 2v·c - ||c||²
            scores = 2 * (m @ cts.T) - (cts * cts).sum(1)[None, :]
            out = pdf.copy()
            out["cluster_id"] = scores.argmax(1).astype("int32")
            yield out

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(corpus.schema.fields)
        + [T.StructField("cluster_id", T.IntegerType())]
    )
    from ..sources.io import ensure_min_partitions

    # An IVF index is a MATERIALIZED artifact: at scale `assigned` is
    # written out partitioned by cluster_id (see module docstring); the
    # in-memory analog is persist(), which also keeps a search from
    # re-running the assignment kernel per action.
    assigned = (
        ensure_min_partitions(corpus).mapInPandas(assign, out_schema).persist()
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
    # stage 1: route each query to its nprobe nearest centroids.
    # (crossJoin + broadcast plans as a nested-loop join by
    # construction — correct here: the centroid side is K rows.)
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
