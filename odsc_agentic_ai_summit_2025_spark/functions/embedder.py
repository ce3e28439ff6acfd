"""Deterministic text embedding (SURVEY §2.8 V1; reference
src/generate_note_embeddings.py:13-23 embeds with
ollama/nomic-embed-text).

Tests must be reproducible without a model server (SURVEY §7 tier B),
so the default embedder is a **feature-hashing bag-of-words**: token →
``xxhash64`` bucket in [0, dim), sign ±1 from a second bit of the same
hash, summed per bucket, then L2-normalized. Properties that matter:

- Map-only and shuffle-free: token hashing is JVM-side codegen, the
  per-row scatter-add is one vectorized ``np.bincount`` per Arrow
  batch. The reduction is an integer-weighted sum — order-free, so
  vectors are deterministic under any partitioning. (Both an
  explode→groupBy formulation — two shuffles — and a per-row
  ``transform(sequence(0,dim))`` fold — O(dim·tokens) interpreted
  evals — were measured slower by 2× and 100×.)
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


def embed(
    df: DataFrame,
    text_col: str,
    out_col: str = "vector",
    dim: int = DEFAULT_DIM,
    id_cols: list[str] | None = None,  # kept for API compat; unused
) -> DataFrame:
    """Append an L2-normalized hash-embedding column.

    V1 as an explicit column op (S8: LanceDB's implicit
    embed-on-insert becomes embed + write). Two-stage, SHUFFLE-FREE:

    1. JVM side: tokenize and hash each token to its (bucket, sign)
       pair with ``xxhash64`` — one array column, whole-stage codegen.
    2. Arrow batch side: per-row ``np.bincount`` scatter-add into the
       dense vector + L2 normalize — vectorized, row-local.

    No explode, no groupBy: the operator is map-only, so it pipelines
    into whatever shuffle the downstream plan needs. Sums are exact
    integer ±1 counts in float64, so vectors are bit-identical under
    any partitioning (and identical to a groupBy formulation).
    """
    from pyspark.sql import types as T

    from ..sources.io import ensure_min_partitions

    # fan out BEFORE the tokenize+hash projection: on an under-split
    # input both the JVM expression and the Arrow kernel would
    # otherwise run on one core (the exchange sits above any project
    # added after it, so ordering here decides where the work lands)
    df = ensure_min_partitions(df)

    h = lambda t: F.xxhash64(t)
    contrib = F.transform(
        tokens(F.col(text_col)),
        lambda t: F.struct(
            F.pmod(h(t), F.lit(dim)).cast("int").alias("b"),
            (F.pmod(F.shiftright(h(t), 8), F.lit(2)) * 2 - 1)
            .cast("double")
            .alias("s"),
        ),
    )
    with_contrib = df.withColumn("_contrib", contrib)

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def densify(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for cs in pdf["_contrib"]:
                if len(cs):
                    b = np.fromiter((c["b"] for c in cs), dtype=np.int64)
                    s = np.fromiter((c["s"] for c in cs), dtype=np.float64)
                    v = np.bincount(b, weights=s, minlength=dim)
                    nrm = np.sqrt((v * v).sum())
                    vecs.append((v / nrm if nrm else v).tolist())
                else:
                    vecs.append([0.0] * dim)
            out = pdf.drop(columns=["_contrib"])
            out[out_col] = vecs
            yield out

    return with_contrib.mapInPandas(densify, out_schema)
