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


def lloyd_gemm(x, k: int, seed: int, max_iter: int, spherical: bool = False):
    """Seeded Lloyd iterations with the (n,k)-GEMM distance identity
    argmin‖x−c‖² = argmin(‖c‖² − 2x·c) — shared by the IVF coarse
    quantizer and the PQ sub-quantizers (operators/pq.py). The naive
    broadcasted (n,k,dim) difference tensor materialized 1.6 GB per
    iteration at the 50k sample cap (38.7 s → ~1 s, r3 profile).
    Deterministic: seeded init, fixed iteration count.

    ``spherical=True`` renormalizes centers to the unit sphere each
    round (spherical k-means): with unit inputs, L2 argmin ≡ cosine
    argmax, which is what a cosine-probed index (IVF) needs. PQ keeps
    the plain L2 form — its sub-quantizers minimize reconstruction
    error, not angular distance."""
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
        if spherical:
            centers /= np.maximum(
                np.linalg.norm(centers, axis=1, keepdims=True), 1e-300
            )
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
    # SPHERICAL k-means over normalized vectors: the index is probed
    # by cosine (ivf_search ranks centroids by cosine), so assignment
    # must use the same metric — plain L2 argmin over unnormalized
    # vectors can put a vector's cluster outside its own query's
    # top-nprobe when magnitudes vary (an exact duplicate missed at
    # cos=1). For unit-norm corpora (the embeddings fixture) the two
    # metrics coincide and this is a no-op.
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    centers = lloyd_gemm(x, k_clusters, seed, max_iter, spherical=True)

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
        "cluster_id int, centroid array<double>",
    )
    bc = spark.sparkContext.broadcast(centers)

    def assign(batches):
        # Arrow-native (guide §4.2): the vector column decodes to an
        # (n, dim) matrix via one flatten+reshape instead of a Python
        # loop per cell — value-identical float64s, ~4 µs/row cheaper
        import numpy as np
        import pyarrow as pa

        from ..functions import arrowkit as ak

        cts = bc.value
        for b in batches:
            if b.num_rows == 0:
                continue
            m = ak.fixed_matrix(b.column(b.schema.get_field_index(vec_col)))
            # cosine assignment (matching the spherical training and
            # the cosine probe): normalize, then argmin ||v-c||² over
            # unit vectors ≡ argmax v·c
            m = m / np.maximum(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-300
            )
            scores = 2 * (m @ cts.T) - (cts * cts).sum(1)[None, :]
            yield b.append_column(
                "cluster_id",
                pa.array(scores.argmax(1).astype(np.int32)),
            )

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
        ensure_min_partitions(corpus).mapInArrow(assign, out_schema).persist()
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


def knn_self_join(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    k_clusters: int,
    nprobe: int,
    include_score: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Top-k nearest neighbors for EVERY corpus row — the kNN-JOIN
    that builds embedding graphs (semantic-dedup neighborhoods, graph
    clustering, label propagation inputs). ``knn_bruteforce`` cannot
    express this: it collects the query set to the driver, and here
    the query set IS the corpus.

    Fully distributed IVF shape: build the coarse quantizer once,
    route every row to its ``nprobe`` nearest centroids in the same
    map pass style as the corpus assignment (broadcast K-row centroid
    matrix, per-batch GEMM — no driver collect of vectors), then join
    probe rows against the cluster-keyed lists, score with one
    vectorized row-wise dot per Arrow batch, and window-prune to
    top-k per row. Candidate volume is n · nprobe · avg_cluster
    ≈ n²·nprobe/K — K ≈ √n makes it n^1.5·nprobe, the standard
    IVF-join trade; cluster-key skew is AQE-splittable.

    Shuffle-bytes note: probe rows carry their query VECTOR, so each
    vector crosses the cluster shuffle nprobe times. The ids-only
    alternative (route ids, join vectors back per side) is not free —
    it replaces an nprobe× fan-out of one shuffle with an additional
    full-corpus hash join and loses single-pass scoring; revisit only
    if nprobe grows past ~10 or vectors past ~1 KB/row.

    ``nprobe = k_clusters`` degrades to the exact all-pairs kNN join
    (every pair scored once — q81's oracle configuration); recall at
    nprobe < K is asserted in tests. Output [q_id, n_id, rank], rank
    ties by neighbor id, self-pairs excluded. The IvfIndex built
    internally is released before returning — the returned plan
    carries its own cache handles (``cache.own``).
    """
    import numpy as np

    from ..cache import own
    from ..sources.io import ensure_min_partitions

    index = ivf_build(corpus, vec_col, id_col, k_clusters, seed=seed)
    centers = np.stack(
        [
            np.asarray(r["centroid"], dtype=np.float64)
            for r in index.centroids.orderBy("cluster_id").collect()
        ]
    )
    # normalized rows × normalized centroids ranks by cosine; ties by
    # cluster id (argsort is stable) — same order as ivf_search's
    # window
    cn = centers / np.maximum(
        np.linalg.norm(centers, axis=1, keepdims=True), 1e-300
    )
    bc = corpus.sparkSession.sparkContext.broadcast(cn)
    np_probe = nprobe

    def route(batches):
        # Arrow-native decode + encode (guide §4.2): flatten+reshape
        # in, np.repeat of matrix rows out — no per-cell Python
        import numpy as np
        import pyarrow as pa

        from ..functions import arrowkit as ak

        c = bc.value
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            raw = ak.fixed_matrix(b.column(b.schema.get_field_index(vec_col)))
            m = raw / np.maximum(
                np.linalg.norm(raw, axis=1, keepdims=True), 1e-300
            )
            sims = m @ c.T  # (n, K)
            # stable argsort on -sims → cosine desc, cluster id asc
            order = np.argsort(-sims, axis=1, kind="stable")[:, :np_probe]
            ids = ak.i64(b.column(b.schema.get_field_index(id_col)))
            yield ak.batch(
                q_id=np.repeat(ids, order.shape[1]),
                qv=ak.list_f64(np.repeat(raw, order.shape[1], axis=0)),
                cluster_id=pa.array(order.reshape(-1).astype(np.int32)),
            )

    probes = ensure_min_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        route, "q_id long, qv array<double>, cluster_id int"
    )
    lists = index.assigned.select(
        F.col(index.id_col).alias("n_id"),
        F.col(index.vec_col).alias("nv"),
        "cluster_id",
    )

    kk = k

    def cluster_topk(left: "pa.Table", right: "pa.Table") -> "pa.Table":
        # Per-cluster GEMM + per-cluster top-k (guide §2.3/§8): the
        # previous shape joined probes × member lists FIRST, shipping
        # every candidate row with BOTH vectors through the Python
        # boundary (n·nprobe·avg_cluster rows × ~1 KB — 4.8 s, ~1 GB
        # of Arrow transfer at the q82 gate config, r13 profile).
        # Cogrouping by cluster ships each vector ONCE per probe/
        # member row, scores a cluster with one (chunked) matmul, and
        # pre-reduces to per-cluster top-k before anything shuffles —
        # the global top-k of a union is the top-k of per-group
        # top-ks, so the window downstream sees min(k, |cluster|)
        # rows per (query, probed cluster) instead of |cluster|.
        import numpy as np
        import pyarrow as pa

        from ..functions import arrowkit as ak

        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table(
                {
                    "q_id": pa.array([], type=pa.int64()),
                    "n_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        q_ids = ak.i64(left.column("q_id"))
        A = ak.fixed_matrix(left.column("qv"))
        n_ids = ak.i64(right.column("n_id"))
        B = ak.fixed_matrix(right.column("nv"))
        # pre-sort members by id: stable argsort on -cos then breaks
        # exact-cos ties by n_id ascending — the window's tie order
        ordb = np.argsort(n_ids, kind="stable")
        n_ids, B = n_ids[ordb], B[ordb]
        A = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        B = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
        out_q, out_n, out_c = [], [], []
        take = min(kk, len(n_ids))
        # chunk the query side so per-group memory stays bounded at
        # scale (chunk × |cluster| floats, not |probes| × |cluster|)
        for lo in range(0, len(q_ids), 4096):
            qa, aa = q_ids[lo : lo + 4096], A[lo : lo + 4096]
            sims = aa @ B.T  # (chunk, nc)
            sims[qa[:, None] == n_ids[None, :]] = -np.inf  # self-pairs
            idx = np.argsort(-sims, axis=1, kind="stable")[:, :take]
            picked = np.take_along_axis(sims, idx, axis=1)
            live = np.isfinite(picked)
            out_q.append(np.repeat(qa, take)[live.ravel()])
            out_n.append(n_ids[idx.ravel()][live.ravel()])
            out_c.append(picked.ravel()[live.ravel()])
        return pa.table(
            {
                "q_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "n_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    scored = (
        probes.groupBy("cluster_id")
        .cogroup(lists.groupBy("cluster_id"))
        .applyInArrow(cluster_topk, "q_id long, n_id long, cos double")
    )
    wk = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    # include_score adds the raw cosine — for DOWNSTREAM thresholding
    # (semantic dedup), never for oracle comparison: raw float scores
    # are the one column the determinism conventions exclude
    cols = ["q_id", "n_id", "rank"] + (["cos"] if include_score else [])
    out = (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(*cols)
    )
    return own(out, index.assigned)
