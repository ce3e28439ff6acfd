"""Similarity search over embedding columns (SURVEY V2/O2 + the
training-pipeline ANN surface).

- ``embedding_neardup_pairs`` — all-pairs cosine above a threshold.
  Locally a broadcast self-join; the scale path is LSH bucketing
  (``lsh_buckets``) so only same-bucket pairs are scored.
- ``knn_bruteforce`` — exact top-k neighbors for a query set
  (broadcast queries × corpus, window rank). This is the correctness
  baseline the ANN variants are judged against.
- ``lsh_buckets`` — random-hyperplane signs (deterministic seeded
  planes) → bucket id; same-bucket collision probability rises with
  cosine. IVF (KMeans) is the alternative at 100 TB: cluster once,
  prune to nprobe clusters per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    block_size: int = 256,
) -> DataFrame:
    """Pairs (a_id < b_id) with cosine ≥ threshold, via block-GEMM.

    A naive pair join materializes O(n²) vector copies and evaluates
    an interpreted fold per pair — 290 s at a mere 2k vectors. The
    scalable plan: bucket vectors into blocks, join the (small)
    block-pair grid, and run one vectorized float64 matmul per block
    pair inside Arrow-batched ``mapInPandas``. Data shipped is
    O(n²/B) instead of O(n²·d); compute is BLAS, not per-row lambdas.
    At 100 TB, feed LSH buckets (``lsh_buckets``) as the blocks so
    only plausible pairs meet; the kernel below is unchanged.

    Output is ids only: the threshold sits in a measured gap of the
    score distribution, so last-ulp accumulation differences between
    engines can't flip membership; emitting float scores would.
    """
    import pandas as pd  # noqa: F401 — mapInPandas contract

    n = df.count()
    n_blocks = max(1, -(-n // block_size))
    blocks = (
        df.select(
            (F.abs(F.hash(F.col(id_col))) % n_blocks).alias("bid"),
            F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).alias("item"),
        )
        .groupBy("bid")
        .agg(F.collect_list("item").alias("items"))
    )
    # unordered block-pair grid as an EQUI join (a non-equi
    # bid_a <= bid_b join plans as BroadcastNestedLoopJoin, which
    # replicates the block payloads; the explicit pair list keeps both
    # sides hash-joinable and the pair table is tiny: B(B+1)/2 rows)
    pair_rows = [
        (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
    ]
    grid_keys = df.sparkSession.createDataFrame(
        pair_rows, "bid_a int, bid_b int"
    )
    a = blocks.select(
        F.col("bid").cast("int").alias("bid_a"),
        F.col("items").alias("items_a"),
    )
    b = blocks.select(
        F.col("bid").cast("int").alias("bid_b"),
        F.col("items").alias("items_b"),
    )
    grid = grid_keys.join(a, "bid_a").join(b, "bid_b")

    thr = threshold

    def score_blocks(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_a, out_b = [], []
            for _, row in pdf.iterrows():
                ia = np.array([it["id"] for it in row["items_a"]])
                ib = np.array([it["id"] for it in row["items_b"]])
                ma = np.stack([np.asarray(it["v"], dtype=np.float64) for it in row["items_a"]])
                mb = np.stack([np.asarray(it["v"], dtype=np.float64) for it in row["items_b"]])
                ma /= np.linalg.norm(ma, axis=1, keepdims=True)
                mb /= np.linalg.norm(mb, axis=1, keepdims=True)
                sim_mat = ma @ mb.T
                ai, bj = np.nonzero(sim_mat >= thr)
                ids_a, ids_b = ia[ai], ib[bj]
                lo = np.minimum(ids_a, ids_b)
                hi = np.maximum(ids_a, ids_b)
                keep = lo < hi  # drops self-pairs and enforces a<b
                out_a.append(lo[keep])
                out_b.append(hi[keep])
            if out_a:
                yield pd.DataFrame(
                    {
                        "a_id": np.concatenate(out_a),
                        "b_id": np.concatenate(out_b),
                    }
                )

    # a pair lands in exactly one unordered block pair → distinct-free
    return grid.mapInPandas(score_blocks, "a_id long, b_id long").dropDuplicates(
        ["a_id", "b_id"]
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    The 100 TB shape: queries are collected and BROADCAST as one
    dense float64 matrix; each corpus partition computes a local GEMM
    and keeps only its own top-k per query, so the shuffle that
    follows carries k·partitions candidate rows per query — never the
    full pair grid. (A crossJoin + global window ships every pair
    through one shuffle: measured 3-10× slower at sf0.1 and unbounded
    at scale.) Final merge is a window over those candidates.

    Rank ties broken by neighbor id for determinism.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    q_rows = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, n_id long, rank long"
        )
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.stack(
        [np.asarray(r["qv"], dtype=np.float64) for r in q_rows]
    )
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))
    excl = exclude_self
    kk = k

    def local_topk(batches):
        import numpy as np
        import pandas as pd

        ids, mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            n_id = pdf[id_col].to_numpy(dtype=np.int64)
            nv = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            nv /= np.maximum(np.linalg.norm(nv, axis=1, keepdims=True), 1e-300)
            sims = nv @ mat.T  # (batch, n_queries)
            out_q, out_n, out_c = [], [], []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = n_id != ids[j] if excl else np.ones_like(n_id, bool)
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                take = min(kk, len(cand_idx))
                top = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]]
                out_q.append(np.full(take, ids[j]))
                out_n.append(n_id[top])
                out_c.append(col[top])
            if out_q:
                yield pd.DataFrame(
                    {
                        "q_id": np.concatenate(out_q),
                        "n_id": np.concatenate(out_n),
                        "cos": np.concatenate(out_c),
                    }
                )

    from ..sources.io import ensure_min_partitions

    cand = ensure_min_partitions(
        corpus.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    ).mapInPandas(local_topk, "q_id long, n_id long, cos double")
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 8, seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (scale path).

    Planes are deterministic pseudo-random (seeded LCG over the
    dimension index) so the bucketing is reproducible run-to-run —
    required for incremental rebuilds to collide consistently.
    """
    first = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    dim = first[0]["d"] if first else 0

    def plane(p: int) -> list[float]:
        # deterministic LCG; values in [-1, 1)
        vals = []
        s = seed * 1_000_003 + p * 7919
        for _ in range(dim):
            s = (1103515245 * s + 12345) % (2**31)
            vals.append(s / float(2**30) - 1.0)
        return vals

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        arr = F.array(*[F.lit(v) for v in plane(p)])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.select(F.col(id_col), bucket.alias("bucket"))
