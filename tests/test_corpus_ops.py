"""Unit tests for the round-5 corpus operators (substring-span dedup,
tf-idf top terms) on crafted inputs with hand-computable answers; the
DuckDB oracle sweep (test_inventory) covers them on the gate corpus.
"""

from __future__ import annotations

from odsc_agentic_ai_summit_2025_spark.operators.dedup import ngram_span_dupes
from odsc_agentic_ai_summit_2025_spark.operators.textops import tfidf_top_terms


def test_ngram_span_dupes_planted(spark):
    rep = " ".join(["a b c d e f g h"] * 2)  # 16 toks; gram repeats in-doc
    rows = [
        (1, "a b c d e f g h i j"),   # 3 spans; spans of doc 2 overlap all 3
        (2, "a b c d e f g h i j"),   # exact copy of doc 1
        (3, "q r s t u v w x y z"),   # unique: 3 spans, 0 dup
        (4, "too short"),             # < 8 tokens: 0 spans
        (5, rep),                     # 9 spans; the (a..h) gram occurs twice
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ratio_e4"])
        for r in ngram_span_dupes(df, "text", "doc_id", l=8).collect()
    }
    assert got[1] == (3, 3, 10000)
    assert got[2] == (3, 3, 10000)
    assert got[3] == (3, 0, 0)
    assert got[4] == (0, 0, 0)
    # doc 5: spans at positions 1..9; position 1 and 9 are both
    # 'a b c d e f g h' (in-doc repeat, also in docs 1/2) → dup; the
    # 7 straddling spans are unique to doc 5
    assert got[5] == (9, 2, 2222)


def test_ngram_span_dupes_partitioning_invariant(spark):
    rows = [(i, f"w{i % 3} x y z p q r s t u") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, ngram_span_dupes(df, "text", "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            ngram_span_dupes(
                df.repartition(7, "text"), "text", "doc_id"
            ).collect(),
        )
    )
    assert a == b and len(a) == 40


def test_tfidf_top_terms_manual(spark):
    rows = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, "text", "doc_id", k=2).collect()
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df_t"], r["score_e4"])
        for r in out
    }
    # n_docs=3 → idf_e4 = 30000 // df
    assert got[(1, 1)] == ("apple", 2, 1, 60000)   # 2 * 30000
    assert got[(1, 2)] == ("banana", 1, 2, 15000)  # 1 * 15000
    assert got[(2, 1)] == ("banana", 1, 2, 15000)  # tie → term asc
    assert got[(2, 2)] == ("cherry", 1, 2, 15000)
    assert got[(3, 1)] == ("cherry", 3, 2, 45000)
    assert got[(3, 2)] == ("date", 1, 1, 30000)


def test_weighted_resample_skewed_mix(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        weighted_resample,
    )

    rows = (
        [(i, "A") for i in range(10)]
        + [(100 + i, "B") for i in range(20)]
        + [(200 + i, "C") for i in range(70)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = weighted_resample(df, "source", "doc_id").collect()
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), r["copy_idx"])
    # weights (e4): A 33333, B 16666, C 4761 → copies 3-4 / 1-2 / 0-1
    for i in range(10):
        assert per_doc[i] in (3, 4)
    for i in range(20):
        assert per_doc[100 + i] in (1, 2)
    for i in range(70):
        assert per_doc.get(200 + i, 0) in (0, 1)
    # expectation: totals per source near n * weight (hash buckets are
    # not i.i.d. but must land inside the hard combinatorial bounds)
    n_a = sum(1 for r in out if r["source"] == "A")
    assert 30 <= n_a <= 40
    # deterministic under repartitioning
    again = weighted_resample(df.repartition(7, "doc_id"), "source", "doc_id")
    assert sorted(map(tuple, out)) == sorted(map(tuple, again.collect()))


def test_dedup_admit_equals_rebuild(spark, sf_dir):
    """Incremental admission must equal re-running full keep-first
    dedup on existing ∪ batch, restricted to batch ids (batch ids are
    larger than existing ids here, so history always wins ties — the
    CDC invariant that admitted docs are never retroactively
    un-admitted)."""
    from pyspark.sql import functions as F

    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        dedup_admit_incremental,
        exact_dedup_groups,
    )
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)

    admitted = {
        r["doc_id"]
        for r in dedup_admit_incremental(
            existing, batch, "text", "doc_id"
        ).collect()
        if r["admitted"]
    }
    rebuild_keeps = {
        r["keep_id"]
        for r in exact_dedup_groups(docs, "text", "doc_id").collect()
    }
    assert admitted == {i for i in rebuild_keeps if i >= 250}
    assert len(admitted) > 0


def test_stratified_sample_exact_and_stable(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        stratified_sample,
    )

    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", "doc_id", n_per_group=7).collect()
    per_grp: dict[str, int] = {}
    for r in out:
        per_grp[r["source"]] = per_grp.get(r["source"], 0) + 1
    assert per_grp == {f"s{i}": 7 for i in range(4)}
    # deterministic under partitioning
    again = stratified_sample(
        df.repartition(9, "doc_id"), "source", "doc_id", n_per_group=7
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a group smaller than N yields the whole group
    tiny = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    got = stratified_sample(tiny, "source", "doc_id", n_per_group=5).collect()
    assert len(got) == 3


def test_ngram_novelty_planted(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import ngram_novelty

    rows = [
        (1, "a b c d e f g h i j"),   # 3 grams, all first seen here
        (2, "a b c d e f g h i j"),   # exact copy: 0 novel
        (3, "q r s t u v w x y z"),   # 3 grams, all novel
        (4, "too short"),             # < 8 tokens: no grams
        (5, " ".join(["a b c d e f g h"] * 2)),  # 9 grams: pos1/pos9
        # are doc-1's gram (not novel); the 7 straddling grams are new
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_e4"])
        for r in ngram_novelty(df, "text", "doc_id", l=8).collect()
    }
    assert got[1] == (3, 3, 10000)
    assert got[2] == (3, 0, 0)
    assert got[3] == (3, 3, 10000)
    assert got[4] == (0, 0, 0)
    assert got[5] == (9, 7, 7777)


def test_ngram_novelty_owner_repeat_counts_novel(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import ngram_novelty

    # A gram repeated INSIDE its first-owner doc is novel on every
    # occurrence (document-granularity attribution).
    rep = " ".join(["m n o p q r s t"] * 3)  # 24 toks, 17 grams
    df = spark.createDataFrame([(7, rep)], "doc_id long, text string")
    (r,) = ngram_novelty(df, "text", "doc_id", l=8).collect()
    assert (r["n_grams"], r["n_novel"], r["novelty_e4"]) == (17, 17, 10000)


def test_ngram_novelty_partitioning_invariant(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import ngram_novelty

    rows = [(i, f"w{i % 3} x y z p q r s t u") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, ngram_novelty(df, "text", "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            ngram_novelty(df.repartition(7, "text"), "text", "doc_id").collect(),
        )
    )
    assert a == b and len(a) == 40


def test_dedup_admit_null_text_audited(spark):
    """NULL-text docs must appear in the admission audit (rejected,
    reason='null_text') — before the r5 fix their NULL digest fell
    out of the equi-joins and they vanished from the output."""
    from odsc_agentic_ai_summit_2025_spark.operators.dedup import (
        dedup_admit_incremental,
    )

    existing = spark.createDataFrame(
        [(1, "kept doc"), (2, None)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "kept doc"), (11, None), (12, "fresh"), (13, "fresh")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["admitted"], r["reason"])
        for r in dedup_admit_incremental(
            existing, batch, "text", "doc_id"
        ).collect()
    }
    assert set(rows) == {10, 11, 12, 13}  # one row per new doc
    assert rows[10] == (False, "in_corpus")
    assert rows[11] == (False, "null_text")
    assert rows[12] == (True, "new")
    assert rows[13] == (False, "dup_in_batch")


def test_vocab_coverage_manual_and_invariant(spark):
    from odsc_agentic_ai_summit_2025_spark import cache
    from odsc_agentic_ai_summit_2025_spark.operators.textops import (
        vocab_coverage,
    )

    rows = [(1, "b b b a a c"), (2, "a d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_coverage(df, "text", top_v=3)
    got = sorted(map(tuple, out.collect()), key=lambda t: t[2])
    cache.release(out)
    # totals: a=3, b=3, c=1, d=1 (8 occurrences); rank ties by term
    assert got == [
        ("a", 3, 1, 3, 3750),
        ("b", 3, 2, 6, 7500),
        ("c", 1, 3, 7, 8750),
    ]

    big = spark.createDataFrame(
        [(i, f"w{i % 5} x y common common") for i in range(60)],
        "doc_id long, text string",
    )
    a = vocab_coverage(big, "text", top_v=10)
    ra = sorted(map(tuple, a.collect()))
    cache.release(a)
    b = vocab_coverage(big.repartition(7, "text"), "text", top_v=10)
    rb = sorted(map(tuple, b.collect()))
    cache.release(b)
    assert ra == rb and len(ra) == 8  # w0..w4, x, y, common


# ---------------------------------------------------------------------------
# Folded from test_review_r5b/d: repetition-stats fixed-point and
# short-doc oracle regressions
# ---------------------------------------------------------------------------


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
