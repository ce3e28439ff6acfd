"""Regression tests for the round-5 numeric-core review findings:

- knn_bruteforce local top-k must be tie-complete and id-tiebroken
  (argpartition alone forwarded an arbitrary subset of cosine ties);
- fixed-point ×10000 must widen to long BEFORE the multiply (ANSI
  int32 overflow on degenerate ~215k-dup-gram documents);
- portable HLL must ignore NULL values (a null row inflated the
  missing-bucket count without feeding the register sum);
- byte_histogram must reject non-power-of-two bin counts (silent
  empty-top-bins degeneracy);
- embedding_neardup_pairs must tolerate zero-norm vectors in the
  scoring kernel (guarded like every other kernel in the file).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_knn_bruteforce_ties_break_by_neighbor_id(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.similarity import (
        knn_bruteforce,
    )

    # 40 identical corpus vectors → every candidate ties at cosine 1.0;
    # the only correct top-3 under the documented contract is the three
    # smallest neighbor ids. Spread over many partitions so the local
    # cut (not just the global window) is exercised.
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(40)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(8)
    queries = spark.createDataFrame(rows[:2], ["vec_id", "embedding"])
    got = {
        (r["q_id"], r["rank"]): r["n_id"]
        for r in knn_bruteforce(
            corpus, queries, "embedding", "vec_id", "vec_id", k=3
        ).collect()
    }
    assert got == {
        (0, 1): 1, (0, 2): 2, (0, 3): 3,  # id 0 excluded (self)
        (1, 1): 0, (1, 2): 2, (1, 3): 3,  # id 1 excluded (self)
    }


def test_fixed_point_dup2_survives_giant_repetitive_doc(spark):
    from odsc_agentic_ai_summit_2025_spark.operators import curation as ops

    # > 214748 duplicate 2-grams: (n2 - n2d) * 10000 overflows int32
    # unless the operands are widened first. Under ANSI mode (pyspark 4
    # default) the unwidened form throws; with ANSI off it wrapped
    # negative and ADMITTED the worst repetitive documents.
    text = "spam " * 230_000
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])

    stats = ops.repetition_stats(docs, "text", "doc_id").collect()[0]
    assert stats.dup2_frac_e4 == 9999  # (n2-1)/n2 in e4 fixed point
    assert stats.repetitive

    gate = ops.ingest_gate(docs, ["zz yy xx"], "text", "doc_id").collect()[0]
    assert gate.dup2_frac_e4 == 9999
    assert not gate.admit


def test_hll_ignores_nulls(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.sketches import (
        hll_approx_distinct,
        hll_sql,
    )

    vals = [("g1", f"v{i}") for i in range(200)]
    clean = spark.createDataFrame(vals, ["g", "v"])
    noisy = spark.createDataFrame(
        vals + [("g1", None)] * 5 + [("g2", None)] * 3, ["g", "v"]
    )
    est_clean = {
        r["g"]: r["approx"]
        for r in hll_approx_distinct(clean, ["g"], "v").collect()
    }
    est_noisy = {
        r["g"]: r["approx"]
        for r in hll_approx_distinct(noisy, ["g"], "v").collect()
    }
    # nulls must not perturb the estimate, and an all-null group has
    # no registers at all → absent (matching the oracle twin)
    assert est_noisy == est_clean
    assert "g2" not in est_noisy

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        vals + [("g1", None), ("g2", None)],
    )
    oracle = dict(con.execute(hll_sql("t", "g", "v")).fetchall())
    assert oracle == est_clean


def test_byte_histogram_rejects_non_power_of_two_bins(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.multimodal import (
        byte_histogram,
    )

    media = spark.createDataFrame([(1, bytearray(b"abc"))], ["media_id", "payload"])
    with pytest.raises(ValueError, match="power of two"):
        byte_histogram(media, n_bins=10)


def test_neardup_pairs_tolerate_zero_vector(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    rows = [
        (0, [0.0, 0.0, 0.0]),  # zero norm: must not NaN the block GEMM
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 1e-4, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, ["doc_id", "embedding"])
    out = embedding_neardup_pairs(df, "embedding", "doc_id", threshold=0.95)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    release(out)
    assert pairs == {(1, 2)}
