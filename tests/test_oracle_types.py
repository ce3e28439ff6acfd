"""Result-TYPE parity harness (plans/oracle.compare_types).

The driver hash is type-sensitive in exactly one place the value
compare can't see: DuckDB widens SUM(BIGINT) — including window sums —
to HUGEINT (Arrow decimal128(38,0)), which hash-mismatches Spark's
int64 even when every value is equal. q80 was driver-red for two
rounds on this class while the local value gate stayed green, because
fetchall() erases the type. These tests pin the mechanism:

  - the PRE-round-6 uncast Q80_SQL must FAIL compare_types;
  - the round-6 cast Q80_SQL must pass;
  - integer widths are interchangeable (12 driver-green queries ship
    DuckDB BIGINT against Spark int), DECIMAL-vs-integer is not.

The full 92-query sweep runs through compare() in test_inventory.py —
compare() now calls compare_types() before the value pass.
"""

from __future__ import annotations

import pytest

from odsc_agentic_ai_summit_2025_spark.plans.oracle import (
    _types_compatible,
    compare_types,
    duckdb_connect,
)
from odsc_agentic_ai_summit_2025_spark.plans.registry import all_queries

# The r4/r5 oracle, verbatim minus the round-6 casts: every column
# derived from the window SUM comes back HUGEINT.
Q80_SQL_UNCAST = r"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
         sha256(text) AS _h
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id, n_tokens, _h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens, tok_offset,
       tok_offset // 512 AS first_chunk,
       (tok_offset + n_tokens - 1) // 512 AS last_chunk,
       (tok_offset + n_tokens - 1) // 512 - tok_offset // 512 + 1 AS n_chunks
FROM c
"""


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    return duckdb_connect(sf_dir)


def test_uncast_q80_fails_type_parity(spark, sf_dir, oracle_con):
    q80 = all_queries()["q80_pack_sequences"]
    df = q80.spark(spark, sf_dir)
    ok, detail = compare_types(df, oracle_con, Q80_SQL_UNCAST)
    assert not ok
    assert "HUGEINT" in detail and "tok_offset" in detail


def test_cast_q80_passes_type_parity(spark, sf_dir, oracle_con):
    q80 = all_queries()["q80_pack_sequences"]
    df = q80.spark(spark, sf_dir)
    ok, detail = compare_types(df, oracle_con, q80.oracle)
    assert ok, detail


@pytest.mark.parametrize(
    "duck,spark_t,want",
    [
        # integer widths interchangeable (driver-green evidence)
        ("BIGINT", "int", True),
        ("INTEGER", "bigint", True),
        ("BIGINT", "bigint", True),
        # HUGEINT / DECIMAL vs integer: the q80 class, must fail
        ("HUGEINT", "bigint", False),
        ("DECIMAL(38,0)", "bigint", False),
        ("BIGINT", "decimal(38,0)", False),
        # decimal matches only at identical precision/scale
        ("DECIMAL(38,6)", "decimal(38,6)", True),
        ("DECIMAL(38,6)", "decimal(20,6)", False),
        # non-numerics exact
        ("VARCHAR", "string", True),
        ("VARCHAR", "binary", False),
        ("DOUBLE", "double", True),
        ("DOUBLE", "float", False),
        ("BOOLEAN", "boolean", True),
        ("TIMESTAMP WITH TIME ZONE", "timestamp", True),
        # arrays recurse
        ("BIGINT[]", "array<int>", True),
        ("HUGEINT[]", "array<bigint>", False),
        ("VARCHAR[]", "array<string>", True),
    ],
)
def test_type_mapping(duck, spark_t, want):
    assert _types_compatible(duck, spark_t) is want


# ---------------------------------------------------------------------------
# Folded from test_review_r5c: oracle cell normalization
# ---------------------------------------------------------------------------


def test_oracle_norm_handles_signed_zero_and_nan():
    from odsc_agentic_ai_summit_2025_spark.plans.oracle import _norm_cell

    assert repr(_norm_cell(-0.0)) == repr(_norm_cell(0.0))
    assert _norm_cell(float("nan")) != "NaN"  # no string collision
    assert _norm_cell(float("nan")) == _norm_cell(float("nan"))
