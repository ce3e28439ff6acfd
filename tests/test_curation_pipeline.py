"""End-to-end curation pipeline composition: stages shrink
monotonically, verdicts are deterministic, and the final corpus
carries the split column."""

from __future__ import annotations

from pyspark.sql import functions as F

from odsc_agentic_ai_summit_2025_spark.pipeline import build_curation_pipeline
from odsc_agentic_ai_summit_2025_spark.sources.io import read_table


def test_curation_pipeline_end_to_end(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    n_corpus = corpus.count()

    p = build_curation_pipeline(corpus, bench)
    counts = p.stage_counts()
    assert n_corpus >= counts["admitted"] >= counts["exact_unique"]
    assert counts["exact_unique"] >= counts["neardup_kept"] >= counts["final"]
    assert counts["final"] > 0

    # deterministic: a rebuild yields identical stage counts
    assert build_curation_pipeline(corpus, bench).stage_counts() == counts

    final = p.final
    splits = {r["split"] for r in final.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    # survivors are a subset of the input ids, no duplicates
    ids = [r["doc_id"] for r in final.select("doc_id").collect()]
    assert len(ids) == len(set(ids))


def test_curation_pipeline_drops_planted_dupe_and_contaminated(spark):
    bench = spark.createDataFrame(
        [(1000, "held out benchmark question wording")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog today"),
            (2, "the quick brown fox jumps over a lazy dog today"),  # exact dupe
            (3, "completely different text with many varied unique words here"),
            (4, "prefix held out benchmark question wording suffix"),  # contaminated
        ],
        ["doc_id", "text"],
    )
    p = build_curation_pipeline(docs, bench)
    final_ids = {r["doc_id"] for r in p.final.select("doc_id").collect()}
    assert 2 not in final_ids  # exact dupe dropped, min id kept
    assert 4 not in final_ids  # contaminated doc gated out
    assert 1 in final_ids and 3 in final_ids
