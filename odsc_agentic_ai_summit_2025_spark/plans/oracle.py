"""Local DuckDB-oracle comparison harness.

Mirrors the driver's t2 gate: run the Spark query and the oracle SQL
on the same parquet tables, sort columns by name, compare row count,
column names, and values order-insensitively. Used by tests/ so a
hash mismatch is caught locally before the driver sees it.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


# DuckDB→Spark result-type compatibility, calibrated to the DRIVER's
# observed hash behavior (not a guess):
#   - integer WIDTHS are interchangeable — 12 queries (q03/q20 rn,
#     the rank columns of every kNN/BM25/RRF query, q44 n_bytes,
#     q56 decile) have been driver-green for 2+ rounds with DuckDB
#     BIGINT against Spark int;
#   - integer vs DECIMAL is NOT — DuckDB widens SUM(BIGINT),
#     including window sums, to HUGEINT → Arrow decimal128(38,0),
#     and that hash-mismatched Spark's int64 in q80 for two rounds
#     even with every value equal. This harness fetches cells into
#     Python ints, so only a TYPE check can catch the class.
_INT_FAMILY_DUCK = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
_INT_FAMILY_SPARK = {"tinyint", "smallint", "int", "bigint"}
_SCALAR_TYPE_MAP = {
    "BOOLEAN": "boolean",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "BLOB": "binary",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}


def _types_compatible(duck: str, spark: str) -> bool:
    duck = duck.strip().upper()
    spark = spark.strip().lower()
    if duck.endswith("[]") and spark.startswith("array<") and spark.endswith(">"):
        return _types_compatible(duck[:-2], spark[6:-1])
    if duck in _INT_FAMILY_DUCK:
        return spark in _INT_FAMILY_SPARK
    if duck.startswith("DECIMAL(") and spark.startswith("decimal("):
        return (duck[len("DECIMAL("):-1].replace(" ", "")
                == spark[len("decimal("):-1].replace(" ", ""))
    return _SCALAR_TYPE_MAP.get(duck) == spark


def compare_types(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Result-TYPE parity: bind (don't run) the oracle SQL and check
    every column's DuckDB type maps onto the Spark dtype under the
    exact-tier table above. Catches the HUGEINT/DECIMAL widening
    class the value compare is blind to."""
    rel = con.sql(sql)
    d_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    s_types = dict(spark_df.dtypes)
    if sorted(d_types) != sorted(s_types):
        return False, (
            f"columns differ: spark={sorted(s_types)} duckdb={sorted(d_types)}"
        )
    bad = [
        f"{c}: duckdb={d_types[c]} spark={s_types[c]}"
        for c in sorted(s_types)
        if not _types_compatible(d_types[c], s_types[c])
    ]
    if bad:
        return False, "type mismatch — " + "; ".join(bad)
    return True, "types ok"


def _norm_cell(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            # a tuple sentinel: can't collide with a genuine string
            # cell 'NaN' the way a string mapping would
            return ("__float_nan__",)
        # exact compare — queries are written to be bit-deterministic.
        # +0.0 folds -0.0 into 0.0: the two compare equal but repr
        # differently, and the repr-based row sort below would align
        # the two engines' rows differently → spurious mismatch.
        return v + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _rows_to_set(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr)


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[bool, str]:
    """Return (match, detail). Detail explains the first divergence."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    cur = con.execute(sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    ok, detail = compare_types(spark_df, con, sql)
    if not ok:
        return False, detail
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    a = _rows_to_set(s_cols, s_rows)
    b = _rows_to_set(d_cols, d_rows)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"first differing row (sorted) #{i}: spark={ra!r} duckdb={rb!r}"
    return True, f"ok ({len(s_rows)} rows)"


def run_inventory(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, tuple[bool, str]]:
    from .registry import all_queries

    con = duckdb_connect(sf_dir)
    queries = all_queries()
    if names:
        unknown = sorted(set(names) - set(queries))
        if unknown:
            # a typo'd names filter must not silently pass as "green"
            raise ValueError(f"unknown query names: {unknown}")
    results: dict[str, tuple[bool, str]] = {}
    for name, q in queries.items():
        if names and name not in names:
            continue
        if q.oracle is None:
            df = q.spark(spark, sf_dir)
            results[name] = (df.count() >= 0, "rows-only (no oracle)")
            continue
        try:
            results[name] = compare(q.spark(spark, sf_dir), con, q.oracle)
        except Exception as e:  # surface per-query failures without aborting
            results[name] = (False, f"exception: {e}")
    return results
