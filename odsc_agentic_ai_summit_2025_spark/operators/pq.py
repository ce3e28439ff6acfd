"""Product-quantization ANN (PQ/ADC) — the MEMORY-bounded vector tier.

IVF (operators/ivf.py) prunes COMPUTE: scan nprobe clusters instead
of the corpus. PQ prunes MEMORY/IO, the other half of the 100 TB ANN
problem: a 64-dim float64 vector is 512 bytes; its PQ code at the
defaults (m=16 subspaces × 32 codewords — recall@3 = 0.92 at a 6%
shortlist on the gate embeddings, swept r4) is 16 small ints ≈ 10-16
bytes — a 30-60× smaller scan-side artifact, small enough that a 10-billion-vector index fits the page
cache of a modest cluster. (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the public
method behind FAISS's IVF-PQ family; the reference delegates its ANN
to LanceDB, whose default index is the same IVF_PQ construction,
src/generate_note_embeddings.py:49.)

Spark-first decomposition:

- **Train** (driver, bounded): split the dimension axis into ``m``
  subspaces; run the shared seeded GEMM-Lloyd (ivf.lloyd_gemm) per
  subspace on a bounded Arrow-collected sample. Codebooks are
  m × k × (dim/m) floats — a few KB, broadcast everywhere.
- **Encode** (one distributed map pass): per Arrow batch, one GEMM
  per subspace → argmin codeword id; output is ``array<int>`` codes.
  This is the artifact a 100 TB pipeline persists (m log₂k bits per
  row — 10 bytes at the defaults) instead of raw vectors.
- **Search** (ADC — asymmetric distance computation): queries stay
  FLOAT; per query build the m × k table of subspace inner products
  against the codebooks (tiny GEMM, broadcast), then a corpus-code
  scan scores each row as a pure TABLE-LOOKUP SUM — no float vector
  is read. Each partition keeps its local top-``shortlist`` per
  query, the shortlist re-ranks EXACTLY against the true vectors
  (hash join on id), and the final top-k is a window over
  shortlist·partitions candidate rows — same shuffle shape as
  knn_bruteforce, but the scan side reads codes, not vectors.

Correctness contract: with ``shortlist`` ≥ corpus size the ADC
ordering becomes irrelevant (every row reaches the exact re-rank) and
the output equals exact brute-force kNN bit-for-bit — the
oracle-checkable configuration, same trick as IVF's nprobe=k (q47).
Recall at realistic shortlists is asserted separately in tests.

Determinism: seeded sample + seeded init + fixed iterations make the
codebooks a pure function of (corpus, seed); encoding breaks argmin
ties toward the lower codeword id (numpy argmin) and the final
ranking breaks ties by neighbor id.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .ivf import TRAIN_SAMPLE_CAP, lloyd_gemm


@dataclass
class PqIndex:
    codebooks: object  # np.ndarray (m, k, dim/m)
    codes: DataFrame   # [id_col, code: array<int>] — persisted
    vec_col: str
    id_col: str
    dim: int

    def release(self) -> None:
        """Drop the persisted code table (the in-memory index). The
        handle stays usable — codes recompute on next use."""
        from ..cache import release_frame

        release_frame(self.codes)


def pq_build(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m_subspaces: int = 16,
    k_codewords: int = 32,
    seed: int = 42,
    max_iter: int = 15,
    train_sample: int = TRAIN_SAMPLE_CAP,
) -> PqIndex:
    """Train per-subspace codebooks on a bounded sample, then encode
    the corpus in one distributed pass. Vectors are L2-normalized
    before quantization so ADC inner products approximate cosine."""
    import numpy as np

    n = corpus.count()
    frac = min(1.0, train_sample / max(n, 1))
    sampled = (
        corpus.select(vec_col).sample(frac, seed)
        if frac < 1.0
        else corpus.select(vec_col)
    )
    x = np.stack(
        [np.asarray(v, dtype=np.float64) for v in sampled.toPandas()[vec_col]]
    )
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    dim = x.shape[1]
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    dsub = dim // m_subspaces
    books = np.stack(
        [
            lloyd_gemm(
                np.ascontiguousarray(x[:, j * dsub : (j + 1) * dsub]),
                k_codewords,
                seed + 31 * j,  # independent init per subspace
                max_iter,
            )
            for j in range(m_subspaces)
        ]
    )  # (m, k, dsub)

    codes = pq_encode(corpus, books, vec_col, id_col).persist()
    return PqIndex(books, codes, vec_col, id_col, dim)


def pq_encode(
    corpus: DataFrame, codebooks, vec_col: str, id_col: str
) -> DataFrame:
    """Encode vectors to PQ codes under FROZEN codebooks — one
    distributed map pass, one GEMM per subspace per Arrow batch.
    Pure function of (rows, codebooks): incremental index adds use it
    on just the new rows and are provably identical to a re-encode
    (test_pq.py)."""
    import numpy as np

    m = int(codebooks.shape[0])
    dd = int(codebooks.shape[0] * codebooks.shape[2])
    bc = corpus.sparkSession.sparkContext.broadcast(np.asarray(codebooks))

    def encode(batches):
        # Arrow-native decode (guide §4.2): one flatten+reshape per
        # batch, ids pass through zero-copy; argmin math unchanged
        import numpy as np

        from ..functions import arrowkit as ak

        cb = bc.value  # (m, k, dsub)
        for b in batches:
            if b.num_rows == 0:
                continue
            sch = b.schema
            v = ak.fixed_matrix(b.column(sch.get_field_index(vec_col)))
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
            sub = v.reshape(len(v), m, dd // m)
            codes = np.empty((len(v), m), dtype=np.int32)
            for j in range(m):
                c = cb[j]
                # argmin ‖s−c‖² = argmin(‖c‖² − 2s·c), ties → low id
                d2 = (c * c).sum(1)[None, :] - 2.0 * (sub[:, j, :] @ c.T)
                codes[:, j] = d2.argmin(1)
            yield ak.batch(
                **{
                    id_col: b.column(sch.get_field_index(id_col)),
                    "code": ak.list_i32(codes),
                }
            )

    from ..sources.io import ensure_min_partitions

    return ensure_min_partitions(corpus.select(id_col, vec_col)).mapInArrow(
        encode, f"{id_col} long, code array<int>"
    )


def pq_search(
    index: PqIndex,
    corpus: DataFrame,
    queries: DataFrame,
    query_id_col: str,
    k: int,
    shortlist: int = 256,
) -> DataFrame:
    """ADC shortlist over the code table, exact re-rank over the true
    vectors. Output [q_id, n_id, rank] — the knn_bruteforce contract,
    so the two interchange (and are equal when ``shortlist`` covers
    the corpus — the oracle configuration). Self-matches excluded.

    ``corpus`` supplies the exact vectors for the re-rank join; at
    scale it is the same table the codes were built from, and only
    ``shortlist × queries`` rows of it are ever read — the scan-side
    IO is the 8-byte codes."""
    import numpy as np
    import pandas as pd  # noqa: F401

    q_rows = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(index.vec_col).alias("qv")
    ).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, n_id long, rank int"
        )
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    m, dsub = index.codebooks.shape[0], index.codebooks.shape[2]
    # per-query ADC tables: table[q, j, c] = q_sub_j · codebook[j][c]
    tables = np.einsum(
        "qjd,jkd->qjk", q_mat.reshape(len(q_ids), m, dsub), index.codebooks
    )  # (nq, m, k)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, tables))
    sl = shortlist
    id_col = index.id_col

    def adc_topn(batches):
        import numpy as np

        from ..functions import arrowkit as ak

        ids, tbl = bc.value
        jj = np.arange(m)[None, :]
        for b in batches:
            if b.num_rows == 0:
                continue
            sch = b.schema
            n_id = ak.i64(b.column(sch.get_field_index(id_col)))
            codes = ak.fixed_matrix(
                b.column(sch.get_field_index("code")), dtype=np.int64
            )
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids)):
                # gather-sum: approx ip = Σ_j table[qi, j, code[:, j]]
                scores = tbl[qi][jj, codes].sum(axis=1)
                mask = n_id != ids[qi]
                cand = np.nonzero(mask)[0]
                if not len(cand):
                    continue
                take = min(sl, len(cand))
                # partition-local cut must be deterministic: an
                # argpartition alone splits equal-ADC ties at the
                # boundary arbitrarily, making shortlist membership
                # (hence the re-ranked top-k) partitioning-dependent.
                # Cut by score, widen to every boundary tie, then
                # order ties by neighbor id and truncate.
                part = cand[np.argpartition(-scores[cand], take - 1)[:take]]
                boundary = scores[part].min()
                ext = cand[scores[cand] >= boundary]
                order = np.lexsort((n_id[ext], -scores[ext]))
                top = ext[order[:take]]
                out_q.append(np.full(take, ids[qi]))
                out_n.append(n_id[top])
                out_s.append(scores[top])
            if out_q:
                yield ak.batch(
                    q_id=np.concatenate(out_q),
                    n_id=np.concatenate(out_n),
                    adc=np.concatenate(out_s),
                )

    cand = index.codes.mapInArrow(adc_topn, "q_id long, n_id long, adc double")
    return _shortlist_and_rerank(
        cand, corpus, q_ids, q_mat, index, shortlist, k
    )


def _shortlist_and_rerank(
    cand: DataFrame,
    corpus: DataFrame,
    q_ids,
    q_mat,
    index: PqIndex,
    shortlist: int,
    k: int,
) -> DataFrame:
    """Global ADC shortlist window + exact cosine re-rank against the
    true vectors — shared by flat PQ and IVF-PQ search.

    Owns NO caches: the only persisted frames in the plan
    (``index.codes``, and ``assigned`` for IVF-PQ) belong to the
    INDEX lifetime — callers release them via ``PqIndex.release()`` /
    ``IvfIndex.release()``, not via ``cache.release(result)``, so a
    caller following the release-the-result convention can keep
    searching the same index without re-encoding the corpus."""
    from ..functions.vectors import cosine

    wl = W.partitionBy("q_id").orderBy(F.desc("adc"), F.asc("n_id"))
    short = (
        cand.withColumn("_r", F.row_number().over(wl))
        .filter(F.col("_r") <= shortlist)
        .select("q_id", "n_id")
    )
    qdf = corpus.sparkSession.createDataFrame(
        [(int(i), [float(v) for v in q_mat[j]]) for j, i in enumerate(q_ids)],
        "q_id long, _qv array<double>",
    )
    nv = corpus.select(
        F.col(index.id_col).alias("n_id"), F.col(index.vec_col).alias("_nv")
    )
    wr = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        short.join(F.broadcast(qdf), "q_id")
        .join(nv, "n_id")
        .withColumn("cos", cosine(F.col("_qv"), F.col("_nv")))
        .withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def ivfpq_search(
    ivf_index,
    pq_index: PqIndex,
    corpus: DataFrame,
    queries: DataFrame,
    query_id_col: str,
    k: int,
    nprobe: int,
    shortlist: int = 256,
) -> DataFrame:
    """IVF-PQ: coarse cluster pruning THEN code-level ADC — the
    composed index the reference actually delegates to (LanceDB's
    default vector index is IVF_PQ,
    /root/reference/src/generate_note_embeddings.py:49). IVF cuts the
    scanned fraction to ~nprobe/K; PQ cuts the bytes per scanned row
    to the code width; the exact re-rank restores true-cosine
    ordering over the shortlist.

    Plan shape: probe routing is the q47 stage (queries × broadcast
    K-row centroid table); the code table joins its cluster id once
    (id-keyed hash join — at scale the codes are WRITTEN partitioned
    by cluster, making this free partition pruning); the tiny
    (queries × nprobe) probe list broadcasts against it; ADC scores
    stream per Arrow batch; shortlist + re-rank as in flat PQ.

    Oracle configuration (q79): nprobe = K and shortlist ≥ corpus ⇒
    every row reaches the exact re-rank ⇒ output equals exact kNN —
    both approximations degrade away, independently testable.
    """
    import numpy as np
    import pandas as pd  # noqa: F401

    from ..functions.vectors import cosine

    q_rows = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(pq_index.vec_col).alias("qv")
    ).collect()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "q_id long, n_id long, rank int"
        )
    q_ids = np.array([r["q_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-300)
    m, dsub = pq_index.codebooks.shape[0], pq_index.codebooks.shape[2]
    tables = np.einsum(
        "qjd,jkd->qjk", q_mat.reshape(len(q_ids), m, dsub), pq_index.codebooks
    )
    # id → table-row mapping as sorted arrays so the kernel can
    # vectorize the lookup (searchsorted) instead of a dict probe per
    # row
    qsort = np.argsort(q_ids)
    bc = corpus.sparkSession.sparkContext.broadcast(
        (q_ids[qsort], qsort.astype(np.int64), tables)
    )

    # stage 1 — probe routing (same shape as ivf_search stage 1)
    qdf = corpus.sparkSession.createDataFrame(
        [(int(i), [float(v) for v in q_mat[j]]) for j, i in enumerate(q_ids)],
        "q_id long, _qv array<double>",
    )
    wq = W.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("cluster_id"))
    probes = (
        qdf.crossJoin(F.broadcast(ivf_index.centroids))
        .withColumn("c_cos", cosine(F.col("_qv"), F.col("centroid")))
        .withColumn("c_rank", F.row_number().over(wq))
        .filter(F.col("c_rank") <= nprobe)
        .select("q_id", "cluster_id")
    )
    # stage 2 — cluster-tagged codes, pruned to probed clusters
    id_col = pq_index.id_col
    tagged = pq_index.codes.join(
        ivf_index.assigned.select(F.col(ivf_index.id_col).alias(id_col), "cluster_id"),
        id_col,
    )
    scan = (
        tagged.join(F.broadcast(probes), "cluster_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select("q_id", F.col(id_col).alias("n_id"), "code")
    )

    def adc_score(batches):
        import numpy as np

        from ..functions import arrowkit as ak

        sorted_ids, perm, tbl = bc.value
        jj = np.arange(m)[None, :]
        for b in batches:
            if b.num_rows == 0:
                continue
            sch = b.schema
            q_col = b.column(sch.get_field_index("q_id"))
            # every q_id here came from the probe table built from
            # q_ids, so searchsorted is an exact (vectorized) lookup
            qi = perm[np.searchsorted(sorted_ids, ak.i64(q_col))]
            codes = ak.fixed_matrix(
                b.column(sch.get_field_index("code")), dtype=np.int64
            )
            scores = tbl[qi[:, None], jj, codes].sum(axis=1)
            yield ak.batch(
                q_id=q_col,
                n_id=b.column(sch.get_field_index("n_id")),
                adc=scores,
            )

    cand = scan.mapInArrow(adc_score, "q_id long, n_id long, adc double")
    return _shortlist_and_rerank(
        cand, corpus, q_ids, q_mat, pq_index, shortlist, k
    )
