"""Vector math as JVM-side array expressions (SURVEY V1/V2/O2).

The reference delegates vector scoring to LanceDB's Rust kernels
(src/rag.py:88-95). Here: sequential left-fold dot products in
double — deterministic element order, so results are reproducible
across engines (the DuckDB oracles cast to DOUBLE[] for the same
accumulation semantics). No Python UDFs in the hot path.
"""

from __future__ import annotations

# module-level (not function-local) on purpose: the type-hint pandas
# UDF form resolves the stringified `pd.Series` annotations (PEP 563,
# active via the __future__ import) against MODULE globals
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i, elementwise in declaration order, double accum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_vectorized():
    """Arrow-batched cosine for hot paths scoring many pairs: numpy
    float64 row-wise dot — 10-100× the interpreted fold. Use where
    only the resulting RANKING is emitted (GEMM summation order
    differs from the sequential fold in last-ulp ways)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / np.maximum(den, 1e-300))

    return _cos
