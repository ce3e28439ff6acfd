"""Reciprocal-rank fusion (SURVEY V5, J5).

The reference fuses LanceDB's vector and FTS rankings with
``RRFReranker()`` (src/rag.py:85-90): score = Σ 1/(k + rank_i) over
the rankings that contain the doc. Spark-first this is a full-outer
join of rank DataFrames + a sum — exactly the J5 "rank-fusion outer
join" the survey identifies.

Determinism: ranks are ints, so every RRF score is the same sum of
the same rationals in every engine; ties (symmetric rank pairs)
break on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

RRF_K = 60


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = RRF_K,
    top_k: int | None = None,
) -> DataFrame:
    """Fuse rank lists: full-outer join on id, Σ 1/(k+rank).

    Each input must have (id_col, rank_col). Missing membership
    contributes 0 — matching LanceDB's RRF semantics.
    """
    fused: DataFrame | None = None
    for i, r in enumerate(rankings):
        cur = r.select(
            F.col(id_col), F.col(rank_col).alias(f"rank_{i}")
        )
        fused = cur if fused is None else fused.join(cur, id_col, "full_outer")
    assert fused is not None, "need at least one ranking"

    score = None
    for i in range(len(rankings)):
        term = F.when(
            F.col(f"rank_{i}").isNotNull(),
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i}")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    out = fused.withColumn("rrf_score", score)
    if top_k is not None:
        # limit-then-rank: the candidate set is already small (union
        # of the input top-k lists) but keep the scale-safe shape —
        # TakeOrdered first, window over top_k rows only
        w = W.orderBy(F.desc("rrf_score"), F.asc(id_col))
        out = (
            out.orderBy(F.desc("rrf_score"), F.asc(id_col))
            .limit(top_k)
            .withColumn("rrf_rank", F.row_number().over(w))
        )
    return out
