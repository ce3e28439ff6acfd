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
    # null-safe: a NULL question/answer/context scores exactly like
    # the empty string, matching HeuristicJudge's `(s or "")` — the
    # raw column would null-propagate through intersect/size and make
    # the column path return NULL where the judge path returns 0.0
    # (skewing metrics_summary averages, which skip NULLs)
    return F.array_distinct(
        F.regexp_extract_all(
            F.lower(F.coalesce(c, F.lit(""))), F.lit(r"[a-z0-9]+"), 0
        )
    )


def answer_similarity(a: Column, b: Column) -> Column:
    """U2: |A∩B| / max(|A|,|B|) over word sets
    (rag_obs_eval.py:330-334)."""
    inter = F.size(F.array_intersect(_words(a), _words(b)))
    denom = F.greatest(F.size(_words(a)), F.size(_words(b)))
    return F.when(denom > 0, inter / denom).otherwise(F.lit(0.0))


def contains_metric(answer: Column, expected: Column) -> Column:
    """Contains: expected value appears in the answer
    (case-insensitive substring — baml_instrumentation.py Contains).
    NULL expected scores 0.0; NULL answer behaves as empty."""
    return F.when(
        expected.isNull(), F.lit(0.0)
    ).otherwise(
        F.lower(F.coalesce(answer, F.lit("")))
        .contains(F.lower(expected))
        .cast("double")
    )


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

    return (email_count(F.coalesce(answer, F.lit(""))) > 0).cast("double")


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


# ---------------------------------------------------------------------------
# Judge-client routing (L10): the reference scores Hallucination /
# AnswerRelevance / Moderation / Usefulness with LLM-judge *calls*
# (src/baml_instrumentation.py:125-163, one metric object per type,
# each backed by its own judge model). The batched path below routes
# every metric through an injectable JudgeClient, so a real judge
# swaps in without new code; HeuristicJudge is the deterministic twin
# of the column proxies (tests assert exact parity).
# ---------------------------------------------------------------------------

import re as _re
from collections.abc import Callable
from typing import Protocol

#: metric names, mirroring baml_instrumentation.py:125-163
JUDGE_METRICS = (
    "context_recall",
    "answer_relevance",
    "moderation",
    "answer_similarity",
)


class JudgeClient(Protocol):
    """One scoring call per metric (0.0-1.0), like the reference's
    per-metric judge objects."""

    def score(
        self,
        metric: str,
        question: str | None,
        answer: str | None,
        context: str | None,
    ) -> float:
        ...


def _wordset(s: str | None) -> frozenset[str]:
    return frozenset(_re.findall(r"[a-z0-9]+", (s or "").lower()))


class HeuristicJudge:
    """Deterministic judge: the same formulas as the column proxies,
    so routed and column-expression scoring agree bit-for-bit."""

    def score(
        self,
        metric: str,
        question: str | None,
        answer: str | None,
        context: str | None,
    ) -> float:
        aw, qw, cw = _wordset(answer), _wordset(question), _wordset(context)
        if metric == "context_recall":
            return len(aw & cw) / len(aw) if aw else 1.0
        if metric == "answer_relevance":
            return len(qw & aw) / len(qw) if qw else 0.0
        if metric == "moderation":
            from ..functions.guardrails import find_emails

            return 1.0 if find_emails(answer or "") else 0.0
        if metric == "answer_similarity":
            denom = max(len(aw), len(cw))
            return len(aw & cw) / denom if denom else 0.0
        raise ValueError(f"unknown metric {metric!r}")


class HttpJudge:
    """LLM judge over the same OpenAI-compatible transport as
    ``HttpLLMClient`` — the live analog of the reference's
    model-backed metric objects (each scored by a judge model at
    temperature 0, baml_instrumentation.py:129-163). Opt-in; never
    used by the correctness suite."""

    def __init__(self, client=None, **client_kwargs) -> None:
        if client is None:
            from .http_client import HttpLLMClient

            client = HttpLLMClient(**client_kwargs)
        self._client = client

    def score(
        self,
        metric: str,
        question: str | None,
        answer: str | None,
        context: str | None,
    ) -> float:
        out = self._client._chat(
            f"Judge:{metric}",
            f"You are an evaluation judge for the metric '{metric}'. "
            "Score the answer between 0.0 and 1.0. Reply with ONLY the "
            "number.",
            f"<question>{question or ''}</question>\n"
            f"<answer>{answer or ''}</answer>\n"
            f"<context>{context or ''}</context>",
        )
        m = _re.search(r"\d*\.?\d+", out)
        return min(1.0, max(0.0, float(m.group(0)))) if m else 0.0


def judge_metrics_via_client(
    answers: DataFrame,
    judge_factory: Callable[[], JudgeClient] = HeuristicJudge,
    question_col: str = "question",
    answer_col: str = "answer",
    context_col: str = "context",
    sample_rate: float = METRICS_SAMPLE_RATE,
    seed: int = 42,
) -> DataFrame:
    """Score the (sampled) answers table through a JudgeClient.

    Arrow-batched ``mapInPandas``; one judge per partition (judges
    may hold sockets — never pickled from the driver). Output schema
    matches :func:`judge_metrics` so the two paths interchange.
    """
    df = answers if sample_rate >= 1.0 else answers.sample(sample_rate, seed)
    fields = ", ".join(f"{m} double" for m in JUDGE_METRICS)
    out_ddl = ", ".join(
        f"{name} {dt}" for name, dt in df.dtypes
    ) + ", " + fields

    def run(batches):
        import pandas as pd

        judge = judge_factory()
        for pdf in batches:
            scores = {m: [] for m in JUDGE_METRICS}
            for q, a, c in zip(
                pdf[question_col], pdf[answer_col], pdf[context_col]
            ):
                for m in JUDGE_METRICS:
                    scores[m].append(judge.score(m, q, a, c))
            yield pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(scores)], axis=1
            )

    return df.mapInPandas(run, out_ddl)


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
