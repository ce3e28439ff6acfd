"""Deterministic golden-answer E2E suite (mirrors the reference's
src/tests/test_graphrag.py + test_data.py, LLM removed).

Pipeline under test: reference extracted_fhir.json → normalize →
graph build → register views → golden SQL → expected values.
The reference documents 9/10 passing with a live LLM
(src/README.md:142-151); with the deterministic graph branch all 10
must pass.
"""

from __future__ import annotations

import os

import pytest

EXTRACTED = "/root/reference/data/extracted_fhir.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXTRACTED), reason="reference data not present"
)


@pytest.fixture(scope="module")
def graph_views(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.graph import build_graph
    from odsc_agentic_ai_summit_2025_spark.schemas import EXTRACTED_FHIR
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_json_records

    extracted = read_json_records(spark, EXTRACTED, EXTRACTED_FHIR)
    g = build_graph(extracted)
    # materialize once; the 10 cases then query cached tables
    for name, df in g.tables().items():
        df.cache().createOrReplaceTempView(name)
    return g


def _case_ids():
    from odsc_agentic_ai_summit_2025_spark.plans.golden import GOLDEN_CASES

    return list(range(len(GOLDEN_CASES)))


@pytest.mark.parametrize("idx", _case_ids())
def test_golden_case(spark, graph_views, idx):
    from odsc_agentic_ai_summit_2025_spark.plans.golden import (
        GOLDEN_CASES,
        answer_strings,
    )

    from odsc_agentic_ai_summit_2025_spark.functions.text import (
        number_variants,
    )

    case = GOLDEN_CASES[idx]
    got = answer_strings(spark, case)
    # membership semantics, matching the reference's assertions
    # (test_graphrag.py:38-53): every expected value appears in the
    # answer (any number-word variant counts); extra rows are allowed.
    for expected in case.expected:
        accepted = [
            v
            for e in (expected, *case.also_accepts)
            for v in number_variants(e)
        ]
        assert any(v in got for v in accepted), (
            f"{case.question!r}: expected {expected!r} in {got!r}"
        )
    if idx == 3:  # category enumeration is exact in both engines
        assert sorted(got) == sorted(case.expected), got
