"""Vector / FTS / hybrid retrieval inventory (SURVEY §2.8) — the
LanceDB surface (vector top-k, BM25 FTS, RRF hybrid) as oracle-checked
batch DataFrame programs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import fts, rrf, similarity as sim
from ..sources.io import read_table
from .registry import Query

_TOKS = "string_split_regex(text, '\\s+')"
QUERY_TERMS = ["spark", "join", "window"]


# ---------------------------------------------------------------------------
# q39 — exact vector top-k (V2/O2: table.search(...).limit(5))
# ---------------------------------------------------------------------------

def q39_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sim.knn_bruteforce(
        emb, queries, "embedding", "vec_id", "vec_id", k=3, exclude_self=True
    )


Q39_SQL = """
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS cos
      FROM c, q WHERE n_id != q_id)
SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q_id, n_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# q40/q41 — FTS index build + BM25 top-k (V3, A10)
# ---------------------------------------------------------------------------

def q40_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return fts.bm25_topk(docs, "text", "doc_id", QUERY_TERMS, k=10)


def _bm25_sql(terms: list[str], k: int) -> str:
    from collections import Counter

    qtf_rows = ", ".join(
        f"('{t}', {n})" for t, n in sorted(Counter(terms).items())
    )
    return f"""
WITH toks AS (SELECT doc_id AS doc, unnest({_TOKS}) AS term FROM documents),
postings AS (SELECT term, doc, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dls AS (SELECT doc_id AS doc, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents),
stats AS (SELECT COUNT(*) AS n,
                 (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dls) AS avgdl
          FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY 1),
qtf(term, qtf) AS (VALUES {qtf_rows}),
hit AS (
  SELECT p.doc, p.tf, f.df, d.dl, q.qtf FROM postings p
  JOIN dfreq f USING (term) JOIN dls d USING (doc) JOIN qtf q USING (term)
),
scored AS (
  SELECT doc,
         SUM( ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5)
                 / (df + 0.5) + 1.0)
              * (tf * {fts.K1 + 1!r})
                / (tf + {fts.K1!r} * ({1 - fts.B!r}
                   + {fts.B!r} * dl / (SELECT avgdl FROM stats)))
              * qtf ) AS score
  FROM hit GROUP BY doc
)
SELECT doc AS doc_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT doc, ROW_NUMBER() OVER (ORDER BY score DESC, doc ASC) AS rank FROM scored
) WHERE rank <= {k}
"""


def q41_fts_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return fts.build_postings(docs, "text", "doc_id")


Q41_SQL = f"""
SELECT term, doc_id AS doc, COUNT(*) AS tf
FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q42 — hyperplane LSH bucket assignment (V2 scale path)
# ---------------------------------------------------------------------------

def q42_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.lsh_buckets(emb, "embedding", "vec_id", n_planes=8, seed=7)


def _lsh_sql(dim: int = 64, n_planes: int = 8, seed: int = 7) -> str:
    # the operator's own plane generator, not a restated copy: a
    # change to the seeded LCG in similarity.py must flow into this
    # oracle or the mismatch would read as an engine bug. The floats
    # are dyadic rationals, so repr() round-trips them exactly into
    # DuckDB doubles.
    planes = sim._lsh_planes(dim, n_planes, seed)
    projs = []
    for p in range(n_planes):
        terms = " + ".join(
            f"e[{i + 1}] * {planes[p][i]!r}" for i in range(dim)
        )
        projs.append(
            f"(CASE WHEN 0.0 + {terms} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        )
    total = " + ".join(projs)
    return f"""
WITH e_t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT vec_id, {total} AS bucket FROM e_t
"""


# ---------------------------------------------------------------------------
# q43 — hybrid search with RRF fusion (V4/V5/J5: rag.py:88-95)
# ---------------------------------------------------------------------------

def q43_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship retrieval: FTS ranking + vector
    ranking fused with RRF, top-k. Docs and vectors share the id
    domain in the testdata (doc_id ≡ vec_id)."""
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    bm = fts.bm25_topk(docs, "text", "doc_id", QUERY_TERMS, k=20)
    queries = emb.filter(F.col("vec_id") == 0)
    vec = sim.knn_bruteforce(
        emb, queries, "embedding", "vec_id", "vec_id", k=20, exclude_self=True
    ).select(F.col("n_id").alias("doc_id"), "rank")
    return rrf.rrf_fuse([bm, vec], id_col="doc_id", top_k=10).select(
        "doc_id", "rrf_rank"
    )


def _hybrid_sql() -> str:
    bm = _bm25_sql(QUERY_TERMS, 20).strip().rstrip()
    return f"""
WITH bm AS ({bm}),
vecq AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vec AS (
  SELECT n_id AS doc_id, CAST(rank AS BIGINT) AS rank FROM (
    SELECT e.vec_id AS n_id,
           ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             (SELECT qv FROM vecq)) DESC,
                      e.vec_id ASC) AS rank
    FROM embeddings e WHERE e.vec_id != 0
  ) WHERE rank <= 20
),
fused AS (
  SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id,
         (CASE WHEN bm.rank IS NOT NULL THEN 1.0 / (60 + bm.rank) ELSE 0.0 END)
       + (CASE WHEN vec.rank IS NOT NULL THEN 1.0 / (60 + vec.rank) ELSE 0.0 END)
         AS rrf_score
  FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id
)
SELECT doc_id, CAST(rrf_rank AS BIGINT) AS rrf_rank FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS rrf_rank
  FROM fused
) WHERE rrf_rank <= 10
"""


def q76_pq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): train per-subspace
    codebooks, encode the corpus to 16-int codes, ADC-shortlist, exact
    re-rank. Registered in its oracle-checkable configuration — the
    shortlist covers the corpus, so the output equals exact kNN
    bit-for-bit (the same degrade-to-exact trick as q47's nprobe=k);
    recall at realistic shortlists is asserted in tests/test_pq.py."""
    from ..cache import own
    from ..operators.pq import pq_build, pq_search

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    idx = pq_build(emb, "embedding", "vec_id", m_subspaces=16, k_codewords=32)
    out = pq_search(idx, emb, queries, "vec_id", k=5, shortlist=1_000_000)
    # the index is query-local here, so ITS lifetime (idx.codes) is
    # tied to the result — a long-lived caller would hold PqIndex and
    # release it separately
    return own(out, idx.codes)


Q76_SQL = """
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
s AS (SELECT q_id, n_id, list_cosine_similarity(qv, nv) AS cos
      FROM c, q WHERE n_id != q_id)
SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q_id, n_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM s
) WHERE rank <= 5
"""


def q79_ivfpq_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed index (the reference's LanceDB default) in the
    oracle configuration: nprobe = K and shortlist ≥ corpus, so both
    approximations degrade away and the output equals exact kNN.
    Recall at realistic (nprobe, shortlist) is tested in
    tests/test_pq.py."""
    from ..cache import own
    from ..operators.ivf import ivf_build
    from ..operators.pq import ivfpq_search, pq_build

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_build(emb, "embedding", "vec_id", k_clusters=8)
    pq = pq_build(emb, "embedding", "vec_id")
    out = ivfpq_search(
        ivf, pq, emb, queries, "vec_id", k=5, nprobe=8, shortlist=1_000_000
    )
    # both indexes are query-local: tie their lifetimes to the result
    return own(out, ivf.assigned, pq.codes)


def q81_knn_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed kNN self-join — top-3 neighbors for EVERY row (the
    embedding-graph primitive; no driver-side query collect anywhere).
    Registered with nprobe = K, where every pair is scored exactly
    once and the output equals the brute-force all-pairs kNN the
    DuckDB oracle computes; recall at nprobe < K is tested. The gate
    corpus is bounded to the first 500 vectors (the q35 pattern —
    the exact nprobe=K configuration is inherently quadratic, so the
    GATE cost must not scale with SF; the sub-quadratic partial-probe
    path is what runs at scale and is tested separately)."""
    from ..operators.ivf import knn_self_join

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500
    )
    return knn_self_join(
        emb, "embedding", "vec_id", k=3, k_clusters=8, nprobe=8
    )


Q81_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < 500),
s AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             list_cosine_similarity(a.e, b.e) AS cos
      FROM v a, v b WHERE a.vec_id != b.vec_id)
SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT q_id, n_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM s
) WHERE rank <= 3
"""


QUERIES = [
    Query("q39_knn_bruteforce", q39_knn_bruteforce, Q39_SQL,
          ("V2", "O2"), "exact cosine top-k neighbors"),
    Query("q81_knn_self_join", q81_knn_self_join, Q81_SQL,
          ("V2", "O2", "J1"), "distributed kNN self-join (embedding graph)"),
    Query("q76_pq_knn", q76_pq_knn, Q76_SQL,
          ("V2", "O2"), "product-quantization ANN with exact re-rank"),
    Query("q79_ivfpq_knn", q79_ivfpq_knn, Q76_SQL,
          ("V2", "O2"), "IVF-PQ composed index (coarse prune + code scan)"),
    Query("q40_bm25_topk", q40_bm25_topk, _bm25_sql(QUERY_TERMS, 10),
          ("V3", "A10", "O2"), "BM25 top-k retrieval"),
    Query("q41_fts_postings", q41_fts_postings, Q41_SQL,
          ("V3", "A10"), "FTS postings index build"),
    Query("q42_lsh_buckets", q42_lsh_buckets, _lsh_sql(),
          ("V2",), "hyperplane LSH bucket assignment"),
    Query("q43_hybrid_rrf", q43_hybrid_rrf, _hybrid_sql(),
          ("V4", "V5", "J5", "O3"), "hybrid FTS+vector RRF fusion"),
]
