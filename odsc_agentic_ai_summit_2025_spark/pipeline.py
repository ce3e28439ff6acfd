"""End-to-end corpus → queryable RAG pipeline (the reference's
``run.sh`` sequence as one Spark program).

The reference orchestrates its pipeline as shell steps over 100-row
chunks (src/run.sh: baml_extract.py ranges → baml_extract_eval.py →
build_graph.py → generate_note_embeddings.py), because each step is a
separate single-process tool. Spark-first, the chunked shell loop IS
the partitioning, and the steps are one lazy program:

    notes ──ex──▶ extracted ──▶ graph tables ──▶ registered views
       │                                            ▲
       └────────▶ embeddings + FTS index ──▶ HybridRag.ask(question)

``build_rag_pipeline`` wires it with optional guardrails, metering,
and tracing; everything downstream (golden QA, judge metrics, usage
tables) consumes the returned handle. Each stage is also usable on
its own — this module adds no logic, only the composition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RagPipeline:
    """Handle to the built artifacts."""

    extracted: DataFrame  # EXTRACTED_FHIR rows (lazy)
    graph: object  # operators.graph.FhirGraph (views registered)
    rag: object  # llm.rag.HybridRag — call .ask(question)
    collector: object | None  # metering.UsageCollector when metered
    tracer: object  # metering.SpanTracer

    def usage_df(self, spark: SparkSession):
        if self.collector is None:
            raise ValueError("pipeline built with meter=False")
        return self.collector.to_df(spark)

    def spans_df(self, spark: SparkSession):
        return self.tracer.to_df(spark)


def build_rag_pipeline(
    spark: SparkSession,
    notes: DataFrame,
    client=None,
    client_factory=None,
    extracted: DataFrame | None = None,
    guard_input: bool = True,
    meter: bool = True,
    top_k: int = 2,
) -> RagPipeline:
    """notes[record_id, note] → extraction → graph → hybrid RAG.

    ``client`` serves the driver-side RAG calls; ``client_factory``
    (zero-arg, pickled to executors) builds the data-plane extraction
    clients — clients hold sockets, so the factory ships, never the
    object. Both default to the deterministic mock. ``extracted``
    short-circuits the extraction stage when the records already
    exist (the reference's idempotent re-ingest of
    extracted_fhir.json); extraction stays lazy either way — the
    graph build materializes it exactly once.
    """
    from .llm.client import MockLLMClient
    from .llm.extract import extract_fhir, guarded_extract_fhir
    from .llm.metering import SpanTracer, UsageCollector
    from .llm.rag import HybridRag
    from .operators.graph import build_graph

    client = client or MockLLMClient()
    client_factory = client_factory or MockLLMClient
    collector = UsageCollector() if meter else None
    tracer = SpanTracer()

    with tracer.span("extract"):
        if extracted is None:
            runner = guarded_extract_fhir if guard_input else extract_fhir
            extracted = runner(notes, client_factory=client_factory)
    with tracer.span("build_graph"):
        graph = build_graph(extracted)
    with tracer.span("build_rag"):
        rag = HybridRag(
            spark,
            graph,
            notes.selectExpr("record_id", "note"),
            client=client,
            top_k=top_k,
            collector=collector,
            tracer=tracer,
        )
    return RagPipeline(
        extracted=extracted,
        graph=graph,
        rag=rag,
        collector=collector,
        tracer=tracer,
    )
