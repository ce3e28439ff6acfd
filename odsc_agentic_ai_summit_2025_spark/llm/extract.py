"""Batched LLM extraction as a data-plane operator (SURVEY §2.9
L1-L4; reference driver src/baml_extract.py:52-81).

The reference fans out one async LLM call per record in 100-row
chunks (src/run.sh:6-18). Spark-first, extraction is a
``mapInPandas`` over the notes table: Arrow-batched, one client per
partition, no driver-side loop — concurrency is just partitioning
(``repartition(n)`` replaces the chunked shell loop), so the same
code scales from 2,726 notes to billions.

The client is injected as a zero-arg factory so the executor builds
it locally (clients hold sockets/models — never pickle those from
the driver).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..schemas import EXTRACTED_FHIR
from .client import LLMClient, MockLLMClient


def default_client_factory() -> LLMClient:
    return MockLLMClient()


def extract_fhir(
    notes: DataFrame,
    client_factory: Callable[[], LLMClient] = default_client_factory,
) -> DataFrame:
    """notes[record_id, note] → EXTRACTED_FHIR rows.

    Mirrors process_record (src/baml_extract.py:52-63): patient +
    practitioner + immunization extraction per note, allergy arriving
    nested inside the patient struct (the reference's ExtractAllergy
    exists but is not called — extract_fhir.baml:32).
    """

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rid, note in zip(pdf["record_id"], pdf["note"]):
                patient = client.extract_patient(note)
                rows.append(
                    {
                        "record_id": int(rid),
                        **patient,
                        "immunization": client.extract_immunizations(note),
                        "practitioner": client.extract_practitioner(note),
                    }
                )
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in rows] for f in EXTRACTED_FHIR.fields}
            )

    from ..sources.io import ensure_min_partitions

    return ensure_min_partitions(
        notes.select("record_id", "note")
    ).mapInPandas(run, EXTRACTED_FHIR)


def guarded_extract_fhir(
    notes: DataFrame,
    client_factory: Callable[[], LLMClient] = default_client_factory,
) -> DataFrame:
    """Extraction with the input guardrail applied first (L11 →
    L1-L4): emails in the raw note are masked before any LLM sees
    them (src/guardrails.py:103-237 applied at the pipeline mouth)."""
    from ..functions.guardrails import mask_emails

    from pyspark.sql import functions as F

    masked = notes.select(
        "record_id", mask_emails(F.col("note")).alias("note")
    )
    return extract_fhir(masked, client_factory)
