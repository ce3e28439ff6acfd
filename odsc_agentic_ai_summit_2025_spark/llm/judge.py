"""Batch eval metrics over an answers DataFrame (SURVEY §2.9 L10,
§2.6 U2; reference src/baml_instrumentation.py:84-229 +
src/rag_obs_eval.py:249-394).

The reference computes Hallucination / AnswerRelevance / Moderation /
Usefulness with LLM-judge calls on a 5% sample, plus two heuristics:
``Contains`` (expected substring in answer) and word-overlap answer
similarity (rag_obs_eval.py:330-334). Spark-first:

- the heuristic metrics are pure column expressions (JVM-side);
- the LLM-judge metrics go through the same injectable client as
  every other L-operator, batched with ``mapInPandas`` — here scored
  by deterministic proxies so eval runs are reproducible;
- sampling is ``df.sample(fraction, seed)`` (METRICS_SAMPLE_RATE,
  rag_obs_eval.py:38).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

METRICS_SAMPLE_RATE = 0.05  # rag_obs_eval.py:38


def _words(c: Column) -> Column:
    return F.array_distinct(
        F.regexp_extract_all(F.lower(c), F.lit(r"[a-z0-9]+"), 0)
    )


def answer_similarity(a: Column, b: Column) -> Column:
    """U2: |A∩B| / max(|A|,|B|) over word sets
    (rag_obs_eval.py:330-334)."""
    inter = F.size(F.array_intersect(_words(a), _words(b)))
    denom = F.greatest(F.size(_words(a)), F.size(_words(b)))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def contains_metric(answer: Column, expected: Column) -> Column:
    """Contains: expected value appears in the answer
    (case-insensitive substring — baml_instrumentation.py Contains)."""
    return F.lower(answer).contains(F.lower(expected)).cast("double")


def context_recall(answer: Column, context: Column) -> Column:
    """Share of answer words grounded in the retrieved context —
    the deterministic proxy for the Hallucination judge (1.0 = fully
    grounded)."""
    aw = _words(answer)
    inter = F.size(F.array_intersect(aw, _words(context)))
    return F.when(F.size(aw) > 0, inter / F.size(aw)).otherwise(F.lit(1.0))


def answer_relevance(answer: Column, question: Column) -> Column:
    """Share of question content-words echoed in the answer — proxy
    for the AnswerRelevance judge."""
    qw = _words(question)
    inter = F.size(F.array_intersect(qw, _words(answer)))
    return F.when(F.size(qw) > 0, inter / F.size(qw)).otherwise(F.lit(0.0))


def moderation_flag(answer: Column) -> Column:
    """Moderation: PII leak detector (emails are the reference's
    guardrail category; 0.0 = clean)."""
    from ..functions.guardrails import email_count

    return (email_count(answer) > 0).cast("double")


def judge_metrics(
    answers: DataFrame,
    question_col: str = "question",
    answer_col: str = "answer",
    context_col: str = "context",
    expected_col: str | None = None,
    sample_rate: float = METRICS_SAMPLE_RATE,
    seed: int = 42,
) -> DataFrame:
    """Score a (sampled) answers table with every metric column.

    ``sample_rate=1.0`` scores everything (tests); the default mirrors
    the reference's 5% cost bound.
    """
    df = answers if sample_rate >= 1.0 else answers.sample(sample_rate, seed)
    q, a, c = F.col(question_col), F.col(answer_col), F.col(context_col)
    out = df.withColumns(
        {
            "context_recall": context_recall(a, c),
            "answer_relevance": answer_relevance(a, q),
            "moderation": moderation_flag(a),
            "answer_similarity": answer_similarity(a, c),
        }
    )
    if expected_col is not None:
        out = out.withColumn(
            "contains", contains_metric(a, F.col(expected_col))
        )
    return out


def metrics_summary(scored: DataFrame) -> DataFrame:
    """Mean of every metric column — the report row the reference
    logs per run."""
    metric_cols = [
        c
        for c in (
            "context_recall",
            "answer_relevance",
            "moderation",
            "answer_similarity",
            "contains",
        )
        if c in scored.columns
    ]
    return scored.agg(
        *[F.round(F.avg(c), 4).alias(f"avg_{c}") for c in metric_cols],
        F.count(F.lit(1)).alias("n_scored"),
    )
