"""Deterministic text embedding (SURVEY §2.8 V1; reference
src/generate_note_embeddings.py:13-23 embeds with
ollama/nomic-embed-text).

Tests must be reproducible without a model server (SURVEY §7 tier B),
so the default embedder is a **feature-hashing bag-of-words**: token →
``xxhash64`` bucket in [0, dim), sign ±1 from a second bit of the same
hash, summed per bucket, then L2-normalized. Properties that matter:

- Pure Spark built-ins, expressed as explode → groupBy — the shape
  that scales: per-token work is one hash, the per-document reduction
  is an integer-weighted sum (order-free, so deterministic under any
  partitioning), and the whole job is a single shuffle by doc id.
  (A per-row ``transform(sequence(0,dim))`` fold computes the same
  thing but is O(dim·tokens) interpreted expression evals per row —
  measured 100× slower at corpus scale.)
- The exact same expression embeds a 100 TB corpus and a single query
  row, so query/document vectors agree bit-for-bit by construction.
- Cosine over these vectors ≈ token-overlap similarity, which is all
  the correctness suite needs from retrieval ranking.

A real embedding model drops in as a pandas UDF with the same
(text → array<float>) signature; every downstream operator
(kNN, IVF, LSH, RRF) is embedding-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 64
TOKEN_PATTERN = r"[a-z0-9]+"


def tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


def _zero_vec(dim: int) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)
    )


def embed(
    df: DataFrame,
    text_col: str,
    out_col: str = "vector",
    dim: int = DEFAULT_DIM,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Append an L2-normalized hash-embedding column.

    V1 as an explicit column op (S8: LanceDB's implicit
    embed-on-insert becomes embed + write). ``id_cols`` defaults to
    every column but ``text_col`` — they key the groupBy, so they must
    identify rows (true for every table here).
    """
    ids = id_cols or [c for c in df.columns if c != text_col]

    tok = df.select(
        *ids, F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    h = F.xxhash64("_tok")
    contrib = tok.select(
        *ids,
        F.pmod(h, F.lit(dim)).cast("int").alias("_bucket"),
        (F.pmod(F.shiftright(h, 8), F.lit(2)) * 2 - 1)
        .cast("double")
        .alias("_sign"),
    )
    sparse = (
        contrib.groupBy(*ids, "_bucket")
        .agg(F.sum("_sign").alias("_val"))
        .groupBy(*ids)
        .agg(
            F.map_from_arrays(
                F.collect_list("_bucket"), F.collect_list("_val")
            ).alias("_m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("_m")[i], F.lit(0.0)),
    )
    nrm_expr = F.aggregate(
        F.col("_raw"), F.lit(0.0), lambda acc, v: acc + v * v
    )
    vec = sparse.withColumn("_raw", dense).select(
        *ids,
        F.when(
            F.sqrt(nrm_expr) > 0,
            F.transform(F.col("_raw"), lambda v: v / F.sqrt(nrm_expr)),
        )
        .otherwise(F.col("_raw"))
        .alias(out_col),
    )
    # rows whose text had zero tokens vanish at explode — restore them
    # with the zero vector so the operator is row-preserving
    return df.join(vec, ids, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), _zero_vec(dim))
    )
