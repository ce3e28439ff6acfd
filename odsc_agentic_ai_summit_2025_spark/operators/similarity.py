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
) -> DataFrame:
    """Pairs (a_id < b_id) with cosine ≥ threshold.

    O(n²) pair space — correct baseline at test scale. At 100 TB,
    feed candidate pairs from ``lsh_buckets`` instead of the cross
    join; the scoring expression is identical.
    """
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        # ids only: the threshold sits in a measured gap of the score
        # distribution, so last-ulp engine differences can't flip
        # membership; emitting the float score would reintroduce them
        .select("a_id", "b_id")
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

    queries is expected to be small → broadcast; corpus streams.
    Rank ties broken by neighbor id for determinism.
    """
    q = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("n_id") != F.col("q_id"))
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .withColumn("rank", F.row_number().over(w))
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

    out = df.select(F.col(id_col), F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        arr = F.array(*[F.lit(v) for v in plane(p)])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out.withColumn("bucket", bucket)
