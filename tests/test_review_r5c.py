"""Regression tests for the second round-5 numeric/graph review batch:

- variable_length_paths must use Cypher trail semantics (no edge
  reused within a path), not walk reachability;
- jaccard_pairs' e4 threshold must round, not truncate (truncation
  admitted pairs strictly below thresholds like 0.57);
- simhash_table / exact_dedup_groups must tolerate NULL text (kernel
  crash / bogus NULL-digest duplicate group);
- FtsIndex.release must drop the cached index frames;
- the oracle compare must not false-flag on -0.0 vs 0.0, and
  run_inventory must reject unknown query names.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_variable_length_paths_trail_semantics(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        variable_length_paths,
    )

    # mutual edges a<->b: the only 3-walk a->b->a->b reuses edge a->b,
    # so Cypher *3..3 matches nothing
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], ["src", "dst"]
    )
    assert variable_length_paths(edges, "src", "dst", 3, 3).count() == 0
    got = {
        (r["start"], r["end"], r["hops"])
        for r in variable_length_paths(edges, "src", "dst", 1, 2).collect()
    }
    assert got == {
        ("a", "b", 1), ("b", "a", 1), ("a", "a", 2), ("b", "b", 2),
    }
    # a triangle's 3-hop trails close the cycle without edge reuse
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    got3 = {
        (r["start"], r["end"])
        for r in variable_length_paths(tri, "src", "dst", 3, 3).collect()
    }
    assert got3 == {("a", "a"), ("b", "b"), ("c", "c")}


def test_jaccard_threshold_rounds_not_truncates(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import jaccard_pairs

    # inter=110, union=193: jaccard_e4 = 1100000 div 193 = 5699 — one
    # e4 below 0.57. int(0.57*10000)==5699 (double product lands low),
    # so the truncating form admitted this pair; round() must not.
    shared = [f"t{i}" for i in range(110)]
    only_a = [f"a{i}" for i in range(41)]
    only_b = [f"b{i}" for i in range(42)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(shared + only_a)),
            (2, " ".join(shared + only_b)),
        ],
        ["doc_id", "text"],
    )
    out = jaccard_pairs(docs, "text", "doc_id", threshold=0.57)
    rows = out.collect()
    release(out)
    assert rows == []

    # sanity: the same pair IS admitted once the threshold allows it
    out2 = jaccard_pairs(docs, "text", "doc_id", threshold=0.5699)
    rows2 = out2.collect()
    release(out2)
    assert [(r["a_id"], r["b_id"], r["jaccard_e4"]) for r in rows2] == [
        (1, 2, 5699)
    ]


def test_simhash_and_exact_dedup_tolerate_null_text(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        exact_dedup_groups,
        simhash_table,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, None), (4, "alpha beta")],
        ["doc_id", "text"],
    )
    sh = simhash_table(docs, "text", "simhash").collect()
    assert {r["doc_id"] for r in sh} == {1, 4}  # null rows dropped, no crash

    groups = exact_dedup_groups(docs, "text", "doc_id").collect()
    # one real group for the duplicate content; NO bogus NULL-digest
    # group collapsing the two null-text docs
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["n_copies"] == 2


def test_fts_index_release_drops_cache(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.fts import build_fts_index

    docs = spark.createDataFrame(
        [(i, f"term{i} shared word") for i in range(20)], ["doc_id", "text"]
    )
    idx = build_fts_index(docs, "text", "doc_id", cache=True)
    idx.postings.count()  # materialize the caches
    assert idx.postings.storageLevel.useMemory
    idx.release()
    assert not idx.postings.storageLevel.useMemory
    assert not idx.dls.storageLevel.useMemory
    assert not idx.dfreq.storageLevel.useMemory


def test_oracle_norm_handles_signed_zero_and_nan():
    from odsc_agentic_ai_summit_2025_spark.plans.oracle import _norm_cell

    assert repr(_norm_cell(-0.0)) == repr(_norm_cell(0.0))
    assert _norm_cell(float("nan")) != "NaN"  # no string collision
    assert _norm_cell(float("nan")) == _norm_cell(float("nan"))


def test_run_inventory_rejects_unknown_names(spark):
    from odsc_agentic_ai_summit_2025_spark.plans.oracle import run_inventory

    with pytest.raises(ValueError, match="unknown query names"):
        run_inventory(spark, "/root/testdata/sf0.001", names=["q999_typo"])


def test_q47_release_returns_block_census_to_baseline(spark, sf_dir):
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.plans.extended import q47_ivf_knn

    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    out = q47_ivf_knn(spark, sf_dir)
    out.count()
    assert jsc.getPersistentRDDs().size() > base  # the IVF assignment
    release(out)
    assert jsc.getPersistentRDDs().size() == base
