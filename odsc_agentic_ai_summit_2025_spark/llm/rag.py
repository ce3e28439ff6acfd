"""Hybrid Graph-RAG query path, end-to-end (SURVEY §3.1; reference
run_hybrid_rag, src/rag.py:120-158).

Driver-side orchestration around Spark-built artifacts:

1. input guardrail (mask emails in the question)        rag_obs_eval.py:268-288
2. schema introspection → XML                           utils.py:37-105
3. LLM schema pruning                                   rag.py:29-39
4. LLM entity-keyword extraction                        rag.py:114-127
5a. graph branch: text2sql → spark.sql over the views   rag.py:48-75
5b. vector branch: hybrid FTS+vector search, RRF top-k  rag.py:83-96
6. synthesis (graph wins on counts)                     rag.py:147-150
7. output guardrail                                     rag_obs_eval.py:357-379

Steps 2-4/6 are one LLM round-trip each (driver-side, injectable
client); 5a/5b are Spark jobs. The reference runs 5a/5b as concurrent
asyncio tasks; submitting the two Spark actions sequentially computes
the same result (latency overlap is a serving concern, and both
branches read only precomputed artifacts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from ..functions import guardrails
from ..functions.embedder import embed, DEFAULT_DIM
from ..functions.schema_xml import fhir_graph_schema_xml
from ..operators import fts, rrf
from ..operators import similarity as sim
from ..operators.graph import FrontierExplosionError, variable_length_paths
from .client import LLMClient, MockLLMClient


@dataclass
class HybridRagAnswer:
    question: str
    masked_question: str
    guardrail_action: str
    pruned_schema: str
    entities: list[dict[str, str]]
    sql: str
    graph_answer: str
    vector_answer: str
    final_answer: str
    graph_rows: list[tuple] = field(default_factory=list)
    context_ids: list[int] = field(default_factory=list)


class HybridRag:
    """Holds the precomputed artifacts (graph views + note/vector
    tables) and answers questions through the 7-step path."""

    def __init__(
        self,
        spark: SparkSession,
        graph,
        notes: DataFrame,
        client: LLMClient | None = None,
        top_k: int = 2,  # reference default, rag.py:80
        dim: int = DEFAULT_DIM,
        collector=None,  # metering.UsageCollector → per-call metrics
        tracer=None,  # metering.SpanTracer → per-step spans
        trail_guard_factor: int = 100,  # max_frontier_rows = factor × |E|
    ) -> None:
        self.spark = spark
        self.graph = graph
        self.client = client or MockLLMClient()
        self.guardrail_traces: list = []
        #: FrontierExplosionError messages from refused star patterns
        self.graph_refusals: list[str] = []
        self.trail_guard_factor = trail_guard_factor
        # name -> (trails frame, max_hops it was expanded to): the
        # memo is valid only for the SAME hop depth — a caller asking
        # for a different max_hops must not be served the stale view
        self._trail_views: dict[str, tuple[DataFrame, int]] = {}
        if collector is not None:
            from .metering import MeteredClient

            self.client = MeteredClient(self.client, collector)
        self.collector = collector
        if tracer is None:
            from .metering import SpanTracer

            tracer = SpanTracer()
        self.tracer = tracer
        self.top_k = top_k
        self.dim = dim
        self.schema_xml = fhir_graph_schema_xml(graph)
        graph.register(spark)
        # S8: embed-on-insert as an explicit column op; cache both
        # retrieval artifacts — they serve every question.
        self.notes = embed(notes, "note", "vector", dim).cache()
        # FTS index built ONCE (generate_note_embeddings.py:49); every
        # ask() only scores its own query-term slice. Index and query
        # share ONE normalization (lowercase alnum runs) — a raw
        # whitespace index is case/punctuation-sensitive, so lowercased
        # query terms would miss capitalized entity terms ('Rosenbaum')
        # and hybrid retrieval silently degrades to vector-only.
        self.fts_index = fts.build_fts_index(
            self.notes, "note", "record_id", cache=True,
            tokenizer=fts.normalized_tokens,
        )

    # -- graph star patterns (Cypher `-[*1..4]-`, rag.py graph branch) -----
    def _materialize_trail_views(self, sql: str, max_hops: int = 4) -> None:
        """The text2sql surface for Cypher variable-length patterns:
        generated SQL may reference ``<edge_table>_trails`` views
        (columns start, end, hops — the reference executes ``*1..N``
        natively in Kuzu, src/rag.py:56). Each referenced view is
        materialized on demand via ``variable_length_paths`` with the
        hub guard ON — ``max_frontier_rows`` defaults to 100× the
        edge count — so a generated star pattern aimed at a
        power-law/hub-heavy graph refuses in seconds with
        :class:`FrontierExplosionError` (recorded in
        ``graph_refusals`` by ``ask``) instead of launching an
        effectively unbounded trail-expansion job.

        Views are memoized per edge table: the graph is immutable per
        :class:`HybridRag` instance, so the first question that
        mentions a trails view pays the guarded expansion (plus the
        eager edge count) and every later one reuses it. Nothing is
        released or re-registered until a NEW frame exists, so a
        guard refusal mid-build leaves no stale view behind."""
        tables = self.graph.tables()
        for name in sorted({
            m.group(1)
            for m in re.finditer(r"\b(\w+)_trails\b", sql)
        }):
            memo = self._trail_views.get(name)
            if memo is not None and memo[1] == max_hops:
                continue
            edges = tables.get(name)
            if edges is None or not {"src", "dst"} <= set(edges.columns):
                continue
            n_edges = edges.count()
            trails = variable_length_paths(
                edges, "src", "dst", 1, max_hops,
                undirected=True,
                max_frontier_rows=max(
                    1_000, self.trail_guard_factor * n_edges
                ),
            )
            # replace-only-after-success: the new frame exists before
            # the old one is released or the view re-registered, so a
            # guard refusal above leaves the prior state intact
            trails.createOrReplaceTempView(f"{name}_trails")
            if memo is not None:
                cache.release(memo[0])
            self._trail_views[name] = (trails, max_hops)

    # -- vector branch (rag.py:83-96) --------------------------------------
    def _vector_context(self, entities: list[dict[str, str]]) -> DataFrame:
        query_text = " ".join(e["value"] for e in entities)
        terms = fts.normalize_query_terms(query_text)
        bm = fts.bm25_topk_indexed(self.fts_index, terms, k=20)
        qdf = embed(
            self.spark.createDataFrame(
                [(0, query_text)], "qid long, q string"
            ),
            "q",
            "vector",
            self.dim,
        )
        vec = sim.knn_bruteforce(
            self.notes, qdf, "vector", "record_id", "qid", k=20,
            exclude_self=False,  # query id domain is disjoint from record_ids
        ).select(F.col("n_id").alias("record_id"), "rank")
        fused = rrf.rrf_fuse(
            [bm.withColumnRenamed("doc_id", "record_id"), vec],
            id_col="record_id",
            top_k=self.top_k,
        )
        return fused.join(
            self.notes.select("record_id", "note"), "record_id"
        ).orderBy("rrf_rank")

    def ask(self, question: str) -> HybridRagAnswer:
        with self.tracer.span("ask"):
            # 1. input guardrail (traced per rule —
            # enhanced_guardrail_integration.py:53-147)
            with self.tracer.span("input_guardrail"):
                gr, traces = guardrails.validate_text_traced(
                    question, validation_type="input"
                )
                self.guardrail_traces.extend(traces)
            q = gr.masked_text

            # 2-4. prune schema, extract entities (one LLM call each)
            with self.tracer.span("prune_schema"):
                pruned = self.client.prune_schema(self.schema_xml, q)
            with self.tracer.span("extract_entities"):
                entities = self.client.extract_entity_keywords(q, pruned)

            # 5a. graph branch: generated SQL over the registered views
            with self.tracer.span("graph_branch"):
                sql = self.client.text2sql(q, pruned, entities)
                graph_rows: list[tuple] = []
                graph_answer = ""
                sql_ok = True
                try:
                    self._materialize_trail_views(sql)
                    graph_rows = [
                        tuple(r) for r in self.spark.sql(sql).collect()
                    ]
                except FrontierExplosionError as e:
                    # hub-guard refusal: the generated star pattern
                    # would explode on this graph — fail fast with
                    # the clear message, keep serving the vector
                    # branch (graph side degrades like bad SQL)
                    self.graph_refusals.append(str(e))
                    sql_ok = False
                except Exception:
                    # bad generated SQL ≡ reference's Q10 failure mode.
                    # ONLY the SQL execution is guarded: a client
                    # failure in answer() below is a transport error
                    # that must surface, not be misclassified as bad
                    # SQL and silently discard correct graph rows.
                    sql_ok = False
                if sql_ok:
                    graph_answer = self.client.answer(
                        q,
                        "; ".join(
                            ", ".join(str(v) for v in row)
                            for row in graph_rows
                        ),
                    )

            # 5b. vector branch: hybrid top-k context → answer
            with self.tracer.span("vector_branch"):
                hits = self._vector_context(entities).collect()
                context_ids = [int(r["record_id"]) for r in hits]
                vec_context = "\n\n".join(r["note"] for r in hits)
                vector_answer = self.client.answer(q, vec_context)

            # 6. synthesis + 7. output guardrail (traced)
            with self.tracer.span("synthesize"):
                final = self.client.synthesize(
                    q, vector_answer, graph_answer
                )
            with self.tracer.span("output_guardrail"):
                _, out_traces = guardrails.validate_text_traced(
                    final, validation_type="output"
                )
                self.guardrail_traces.extend(out_traces)
                final = guardrails.mask_emails_text(final)

        return HybridRagAnswer(
            question=question,
            masked_question=q,
            guardrail_action=gr.action,
            pruned_schema=pruned,
            entities=entities,
            sql=sql,
            graph_answer=graph_answer,
            vector_answer=vector_answer,
            final_answer=final,
            graph_rows=graph_rows,
            context_ids=context_ids,
        )
