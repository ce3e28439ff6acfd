"""Inventory queries for the observability surface (guardrail traces
+ judge metrics), both pure column expressions and therefore fully
DuckDB-oracle-checkable.

q64 exercises the per-rule guardrail trace table (reference
src/enhanced_guardrail_integration.py:53-147) over documents with a
synthesized, doc_id-keyed email injection that makes every action
branch (LOG / WARN / BLOCK) occur. q65 exercises the four judge
metrics (reference src/baml_instrumentation.py:125-163) over a
synthesized answers table built from overlapping text windows, so
recall/relevance/similarity take non-trivial values and some answers
leak an email (moderation hits both classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.guardrails import (
    EMAIL_PATTERN as _EMAIL_RE_SQL,
    IPV4_PATTERN as _IPV4_RE_SQL,
    PHONE_PATTERN as _PHONE_RE_SQL,
    SSN_PATTERN as _SSN_RE_SQL,
    _MASK_PATTERN as _MASK_RE_SQL,
    _SHORT_MASK_PATTERN as _SHORT_MASK_RE_SQL,
    guardrail_trace_df,
)
from ..llm.judge import judge_metrics
from ..sources.io import read_table
from .registry import Query


# ---------------------------------------------------------------------------
# q64 — guardrail trace table with varied actions
# ---------------------------------------------------------------------------

def _with_varied_contact(docs: DataFrame) -> DataFrame:
    """doc_id % 5 == 0 → no email (LOG); % 5 in {1,2} → one (WARN);
    else three (BLOCK at the default threshold)."""
    one = F.concat(
        F.lit(" Contact: user."),
        F.col("doc_id").cast("string"),
        F.lit("@example.org."),
    )
    three = F.concat(
        F.lit(" Contact: user."),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or admin."),
        F.col("doc_id").cast("string"),
        F.lit("@corp.example.com or root."),
        F.col("doc_id").cast("string"),
        F.lit("@ops.example.net."),
    )
    m = F.col("doc_id") % 5
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(m == 0, F.lit(""))
            .when(m.isin(1, 2), one)
            .otherwise(three),
        ).alias("text"),
    )


def q64_guardrail_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_varied_contact(read_table(spark, sf_dir, "documents"))
    return guardrail_trace_df(docs, "text", "doc_id", validation_type="input")


_INJECT_SQL = """
text || CASE
  WHEN doc_id % 5 = 0 THEN ''
  WHEN doc_id % 5 IN (1, 2) THEN ' Contact: user.' || doc_id || '@example.org.'
  ELSE ' Contact: user.' || doc_id || '@example.org or admin.' || doc_id
       || '@corp.example.com or root.' || doc_id || '@ops.example.net.'
END
""".strip()

# the guardrails module's own patterns (imported above, not
# restated): they are RE2-safe by construction, and importing keeps
# one source of truth — a pattern fix there flows into these oracles
# instead of silently desynchronizing them.

Q64_SQL = rf"""
WITH injected AS (SELECT doc_id, {_INJECT_SQL} AS text FROM documents),
scored AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{_EMAIL_RE_SQL}')) AS INT) AS n,
         regexp_replace(
           regexp_replace(text, '{_MASK_RE_SQL}', '\1***\3@\4', 'g'),
           '{_SHORT_MASK_RE_SQL}', '\1***@\3', 'g') AS masked
  FROM injected)
SELECT doc_id,
       'email' AS rule,
       'input' AS validation_type,
       CASE WHEN n >= 3 THEN 'BLOCK'
            WHEN n >= 1 THEN 'WARN'
            ELSE 'LOG' END AS action,
       n > 0 AS triggered,
       n AS n_matches,
       masked <> text AS masking_applied,
       CAST(length(text) AS INT) AS original_length,
       CAST(length(masked) AS INT) AS masked_length
FROM scored
"""


# ---------------------------------------------------------------------------
# q65 — judge metrics over synthesized answers
# ---------------------------------------------------------------------------

def _answers_table(docs: DataFrame) -> DataFrame:
    """question/answer/context as overlapping windows of the text;
    every 7th answer leaks an email so moderation varies."""
    return docs.select(
        "doc_id",
        F.substring("text", 1, 40).alias("question"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.substring("text", 30, 80),
                F.lit(" reach me at leak."),
                F.col("doc_id").cast("string"),
                F.lit("@leak.example.com"),
            ),
        )
        .otherwise(F.substring("text", 30, 80))
        .alias("answer"),
        F.substring("text", 1, 120).alias("context"),
    )


def q65_judge_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = judge_metrics(_answers_table(docs), sample_rate=1.0)
    return scored.select(
        "doc_id",
        F.round("context_recall", 4).alias("context_recall"),
        F.round("answer_relevance", 4).alias("answer_relevance"),
        "moderation",
        F.round("answer_similarity", 4).alias("answer_similarity"),
    )


def _ws(col: str) -> str:
    return f"list_distinct(regexp_extract_all(lower({col}), '[a-z0-9]+'))"


Q65_SQL = rf"""
WITH answers AS (
  SELECT doc_id,
         substr(text, 1, 40) AS question,
         CASE WHEN doc_id % 7 = 0
              THEN substr(text, 30, 80) || ' reach me at leak.' || doc_id
                   || '@leak.example.com'
              ELSE substr(text, 30, 80) END AS answer,
         substr(text, 1, 120) AS context
  FROM documents),
sets AS (
  SELECT doc_id,
         {_ws('question')} AS qw,
         {_ws('answer')} AS aw,
         {_ws('context')} AS cw,
         answer
  FROM answers)
SELECT doc_id,
       ROUND(CASE WHEN len(aw) > 0
                  THEN len(list_intersect(aw, cw)) / len(aw)
                  ELSE 1.0 END, 4) AS context_recall,
       ROUND(CASE WHEN len(qw) > 0
                  THEN len(list_intersect(qw, aw)) / len(qw)
                  ELSE 0.0 END, 4) AS answer_relevance,
       CAST(len(regexp_extract_all(answer, '{_EMAIL_RE_SQL}')) > 0
            AS DOUBLE) AS moderation,
       ROUND(CASE WHEN greatest(len(aw), len(cw)) > 0
                  THEN len(list_intersect(aw, cw)) / greatest(len(aw), len(cw))
                  ELSE 0.0 END, 4) AS answer_similarity
FROM sets
"""


# ---------------------------------------------------------------------------
# q67 — multi-rule PII trace (email + phone + SSN)
# ---------------------------------------------------------------------------

def _with_pii(docs: DataFrame) -> DataFrame:
    """Inject rule-hitting PII keyed by doc_id so every rule fires on
    a different subset: %3==0 → phone, %4==0 → ssn, %5∈{1,2} → one
    email, %5∉{0,1,2} → three emails."""
    m3, m4, m5 = (F.col("doc_id") % k for k in (3, 4, 5))
    phone = F.when(
        m3 == 0, F.lit(" Call (555) 123-4567 or 555-987-6543.")
    ).otherwise(F.lit(""))
    ssn = F.when(m4 == 0, F.lit(" SSN 123-45-6789.")).otherwise(F.lit(""))
    email = (
        F.when(m5 == 0, F.lit(""))
        .when(
            m5.isin(1, 2),
            F.concat(
                F.lit(" Contact user."),
                F.col("doc_id").cast("string"),
                F.lit("@example.org."),
            ),
        )
        .otherwise(
            F.concat(
                F.lit(" Contact user."),
                F.col("doc_id").cast("string"),
                F.lit("@example.org admin."),
                F.col("doc_id").cast("string"),
                F.lit("@corp.example.com root."),
                F.col("doc_id").cast("string"),
                F.lit("@ops.example.net."),
            )
        )
    )
    return docs.select(
        "doc_id", F.concat("text", phone, ssn, email).alias("text")
    )


def q67_pii_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.guardrails import pii_trace_df

    docs = _with_pii(read_table(spark, sf_dir, "documents"))
    return pii_trace_df(docs, "text", "doc_id", validation_type="input")


_PII_INJECT_SQL = """
text
|| CASE WHEN doc_id % 3 = 0 THEN ' Call (555) 123-4567 or 555-987-6543.' ELSE '' END
|| CASE WHEN doc_id % 4 = 0 THEN ' SSN 123-45-6789.' ELSE '' END
|| CASE
     WHEN doc_id % 5 = 0 THEN ''
     WHEN doc_id % 5 IN (1, 2) THEN ' Contact user.' || doc_id || '@example.org.'
     ELSE ' Contact user.' || doc_id || '@example.org admin.' || doc_id
          || '@corp.example.com root.' || doc_id || '@ops.example.net.'
   END
""".strip()

# _PHONE_RE_SQL/_SSN_RE_SQL are the guardrails module's own guarded
# numeric rules, imported at the top. The masked chain carries the
# IPv4 replace too (r8): mask_pii applies it, so the oracle must be
# the SAME function — it is a no-op on this fixture (no dotted quads
# injected), but q67 must not depend on that data property.

Q67_SQL = rf"""
WITH injected AS (SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents),
scored AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{_EMAIL_RE_SQL}')) AS INT) AS n_email,
         CAST(len(regexp_extract_all(text, '{_PHONE_RE_SQL}', 2)) AS INT) AS n_phone,
         CAST(len(regexp_extract_all(text, '{_SSN_RE_SQL}', 2)) AS INT) AS n_ssn,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{_MASK_RE_SQL}', '\1***\3@\4', 'g'),
                 '{_SHORT_MASK_RE_SQL}', '\1***@\3', 'g'),
               '{_SSN_RE_SQL}', '\1XXX-XX-XXXX\3', 'g'),
             '{_PHONE_RE_SQL}', '\1XXX-XXX-XXXX\4', 'g'),
           '{_IPV4_RE_SQL}', '\1\2***\5', 'g') AS masked
  FROM injected),
rules AS (
  SELECT doc_id, text, masked, 'email' AS rule, n_email AS n FROM scored
  UNION ALL
  SELECT doc_id, text, masked, 'phone', n_phone FROM scored
  UNION ALL
  SELECT doc_id, text, masked, 'ssn', n_ssn FROM scored)
SELECT doc_id,
       rule,
       'input' AS validation_type,
       CASE WHEN n >= 3 THEN 'BLOCK'
            WHEN n >= 1 THEN 'WARN'
            ELSE 'LOG' END AS action,
       n > 0 AS triggered,
       n AS n_matches,
       n > 0 AS masking_applied,
       CAST(length(text) AS INT) AS original_length,
       CAST(length(masked) AS INT) AS masked_length
FROM rules
"""


# ---------------------------------------------------------------------------
# q68 — extraction usage accounting (the metering data plane)
# ---------------------------------------------------------------------------

def q68_extract_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record LLM usage columns from the metered extraction pass
    (3 protocol calls per record; prompt tokens are the deterministic
    offline estimate ceil(chars/4) of each call's string args —
    exactly reproducible in SQL, so the metering path gets a hard
    oracle; completion tokens depend on the mock's output repr and
    stay pytest-covered)."""
    from ..llm.extract import extract_fhir_with_usage

    notes = read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id AS record_id", "text AS note"
    )
    return extract_fhir_with_usage(notes).select(
        "record_id", "n_llm_calls", "prompt_tokens"
    )


Q68_SQL = """
SELECT doc_id AS record_id,
       3 AS n_llm_calls,
       CAST(3 * CAST(ceil(length(text) / 4.0) AS BIGINT) AS INT)
         AS prompt_tokens
FROM documents
"""


QUERIES: list[Query] = [
    Query(
        "q64_guardrail_trace",
        q64_guardrail_trace,
        Q64_SQL,
        covers=("L11",),
        description="per-rule guardrail trace table, all action branches",
    ),
    Query(
        "q65_judge_scores",
        q65_judge_scores,
        Q65_SQL,
        covers=("L10", "U2"),
        description="judge metric columns over synthesized answers",
    ),
    Query(
        "q67_pii_trace",
        q67_pii_trace,
        Q67_SQL,
        covers=("L11", "F3", "F4"),
        description="multi-rule PII trace (email/phone/ssn)",
    ),
    Query(
        "q68_extract_usage",
        q68_extract_usage,
        Q68_SQL,
        covers=("L1", "A9"),
        description="metered extraction usage columns",
    ),
]
