"""PySpark-native analytics engine with the query/data-processing
capabilities of graphgeeks-lab/odsc-agentic-ai-summit-2025.

The reference is a hybrid Graph-RAG pipeline (Polars + Kuzu + LanceDB +
BAML/LLM). This package re-expresses every capability Spark-first:

- ``session``      SparkSession factory tuned for scale-out defaults.
- ``schemas``      Explicit StructTypes for every table (no inference).
- ``sources``      Parquet/JSON readers + writers (SURVEY S1-S9).
- ``operators``    Normalization, graph build, dedup, similarity, FTS,
                   RRF fusion, eval (SURVEY P*/J*/A*/O*/U*/V*).
- ``functions``    Column-level helpers: text stats, vector math,
                   string/guardrail ops (SURVEY F1-F13).
- ``llm``          Injectable LLM client abstraction + deterministic
                   mock (SURVEY L1-L11) so tests need no network.
- ``plans``        Declared query inventory + golden-question plans.
- ``streaming``    Structured Streaming variants of the batch ops.
"""

__version__ = "0.1.0"
