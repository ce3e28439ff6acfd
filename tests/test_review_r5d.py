"""Regression tests for the third round-5 review batch (plan oracles
and latent data-drift hazards):

- the q72 oracle must keep sub-2-token docs (LEFT JOIN, not inner);
- connected_components must release its label checkpoint on the
  minlabel non-convergence raise, and propagate a caller-supplied
  pair generator's caches into the result;
- curriculum_order must exclude NULL-text docs (Spark and DuckDB
  disagree on NULL placement under DESC ordering);
- asof_join must not match NULL keys to each other;
- IVF must assign corpus vectors by the same cosine metric its
  search probes with (magnitude-varying corpora).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_q72_oracle_keeps_short_docs(spark):
    import duckdb

    from odsc_agentic_ai_summit_2025_spark.operators import curation as ops
    from odsc_agentic_ai_summit_2025_spark.plans.curation import Q72_SQL

    rows = [(1, "hello"), (2, ""), (3, "a a b")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup2_frac_e4"])
        for r in ops.repetition_stats(docs, "text", "doc_id").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    oracle = {
        r[0]: (r[1], r[4])
        for r in con.execute(Q72_SQL).fetchall()
    }
    # columns: doc_id, n_tokens, top_tok_n, top_frac_e4, dup2_frac_e4
    assert set(got) == {1, 2, 3}
    assert oracle == got  # short docs present on BOTH sides, dup2=0


def test_components_release_on_minlabel_raise(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    # a 12-node chain cannot converge in 1 round even with the jump
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["a_id", "b_id"]
    )
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(
            chain, algorithm="minlabel", max_iterations=1
        ).count()
    assert jsc.getPersistentRDDs().size() == base  # no leaked labels


def test_components_propagate_generator_caches(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "unrelated words entirely here"),
        ],
        ["doc_id", "text"],
    )
    jsc = spark.sparkContext._jsc
    base = jsc.getPersistentRDDs().size()
    comp = connected_components(jaccard_pairs(docs, "text", "doc_id", 0.8))
    labels = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert labels == {1: 1, 2: 1}
    release(comp)
    # the jaccard prefix persist AND the label checkpoint both freed
    assert jsc.getPersistentRDDs().size() == base


def test_curriculum_excludes_null_text(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        curriculum_order,
    )

    docs = spark.createDataFrame(
        [(1, "good long document with many words"), (2, None), (3, "short")],
        ["doc_id", "text"],
    )
    out = curriculum_order(docs, "text", "doc_id", n_buckets=2)
    rows = out.collect()
    release(out)
    assert {r["doc_id"] for r in rows} == {1, 3}
    assert sorted(r["train_pos"] for r in rows) == [0, 1]  # dense


def test_asof_null_keys_never_match(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, None, 10), (2, 7, 10)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 99.0), (7, 5, 42.0)], "user_id long, pts long, v double"
    )
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="pts",
            value_cols=["v"],
        ).collect()
    }
    # NULL = NULL never matches (equi-join semantics); real key does
    assert got == {1: None, 2: 42.0}


def test_ivf_cosine_assignment_on_unnormalized_corpus(spark):
    from odsc_agentic_ai_summit_2025_spark.operators import ivf

    # same directions at wildly different magnitudes: cosine clusters
    # by direction; L2 would split by magnitude and an exact-direction
    # duplicate could land outside its query's top-nprobe cluster
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for d in range(20):
        v = rng.normal(size=16)
        for mag in (0.01, 1.0, 100.0):
            rows.append((vid, (mag * v).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vid long, vec array<double>")
    index = ivf.ivf_build(df, "vec", "vid", k_clusters=4, seed=1)
    by_cluster = {
        r["vid"]: r["cluster_id"] for r in index.assigned.collect()
    }
    index.release()
    # exactly-parallel vectors share a cluster regardless of
    # magnitude — the invariance the cosine probe requires (the old
    # L2 assignment binned by magnitude instead)
    for d in range(20):
        trio = {by_cluster[3 * d + j] for j in range(3)}
        assert len(trio) == 1, (d, trio)
