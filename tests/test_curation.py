"""Behavioral tests for the corpus-curation operators (q71–q74):
planted contamination is found, repetition flags fire on crafted
repeats, mix weights invert the source shares, and a planted
far-from-centroid vector is flagged. Oracle parity for the same four
queries is covered by test_inventory.py's registry sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odsc_agentic_ai_summit_2025_spark.operators import curation as ops


def test_contamination_finds_planted_copy(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words alpha beta gamma delta epsilon zeta suffix"),
            (11, "totally unrelated content with no overlap whatsoever"),
        ],
        ["doc_id", "text"],
    )
    out = ops.contamination_pairs(corpus, bench, "text", "doc_id", n=3)
    rows = {(r.corpus_id, r.bench_id): r.n_shared for r in out.collect()}
    # the planted copy shares all 4 sliding 3-grams of the bench doc
    assert rows == {(10, 1): 4}


def test_contamination_broadcasts_benchmark_side(spark):
    bench = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    corpus = spark.createDataFrame([(2, "a b c d e")], ["doc_id", "text"])
    plan = ops.contamination_pairs(
        corpus, bench, "text", "doc_id", n=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the corpus side must not shuffle


def test_repetition_stats_flags_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one token dominates
            (2, "all words here are unique tokens"),  # clean
            (3, "x"),  # single token: no 2-grams, division guarded
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in ops.repetition_stats(docs, "text", "doc_id").collect()}
    assert out[1].top_frac_e4 == 10000 and out[1].repetitive
    assert out[1].dup2_frac_e4 == 7500  # 4 grams, 1 distinct → 3/4 repeats
    assert out[2].top_frac_e4 < 2000 and not out[2].repetitive
    assert out[3].n_tokens == 1 and out[3].dup2_frac_e4 == 0


def test_source_mix_weights_inverts_shares(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i < 75 else "books") for i in range(100)],
        ["doc_id", "source"],
    )
    out = {r.source: r for r in ops.source_mix_weights(docs, "source").collect()}
    assert out["web"].frac_e4 == 7500 and out["books"].frac_e4 == 2500
    # uniform target = 50/50: downweight web (<1), upweight books (>1)
    assert out["web"].weight_e4 == 6666 and out["books"].weight_e4 == 20000


def test_embedding_outliers_flags_planted_vector(spark):
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, [v + 0.01 * i for v in base], 0) for i in range(5)]
    rows.append((99, [-1.0, 0.0, 0.0, 0.0], 0))  # anti-aligned plant
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    out = {r.vec_id: r for r in
           ops.embedding_outliers(emb, "embedding", "vec_id", "label").collect()}
    assert out[99].is_outlier and out[99].cos_c < 0
    assert all(not out[i].is_outlier for i in range(5))
    # centroid broadcast join: big side must not exchange
    plan = ops.embedding_outliers(
        emb, "embedding", "vec_id", "label"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bloom_gate_has_no_false_negatives(spark, sf_dir):
    """Every doc the exact n-gram join flags must also be flagged by
    the Bloom gate (structural guarantee), and the gate's extras
    (false positives) must stay a small fraction of the corpus."""
    from odsc_agentic_ai_summit_2025_spark.plans.curation import (
        q71_decontamination,
        q75_bloom_decontam,
    )
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_table

    exact = {r.corpus_id for r in q71_decontamination(spark, sf_dir).collect()}
    bloom = {r.doc_id for r in q75_bloom_decontam(spark, sf_dir).collect()}
    assert exact <= bloom
    n_corpus = (
        read_table(spark, sf_dir, "documents")
        .filter("doc_id % 97 <> 0")
        .count()
    )
    assert len(bloom - exact) <= max(5, n_corpus // 10)


def test_curriculum_order_tiers_and_determinism(spark):
    from odsc_agentic_ai_summit_2025_spark import cache
    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        curriculum_order,
    )

    rows = [
        (i, ("great clean prose with the many varied tokens inside it "
             if i % 3 == 0 else "loop " * 8) + f"tail{i}")
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curriculum_order(df, "text", "doc_id", n_buckets=4)
    got = sorted(map(tuple, out.collect()))
    cache.release(out)

    # dense, 0-based, bucket-contiguous global positions
    assert sorted(r[3] for r in got) == list(range(24))
    by_bucket = {}
    for _id, _q, b, pos in got:
        by_bucket.setdefault(b, []).append(pos)
    assert sorted(by_bucket) == [0, 1, 2, 3]
    assert all(len(v) == 6 for v in by_bucket.values())  # equal tiers
    bounds = [sorted(v) for _, v in sorted(by_bucket.items())]
    for earlier, later in zip(bounds, bounds[1:]):
        assert earlier[-1] < later[0]  # tiers are walked in order
    # quality ordering across tiers: min quality of bucket b >= max of b+1
    qs = {}
    for _id, q, b, _pos in got:
        qs.setdefault(b, []).append(q)
    for b in range(3):
        assert min(qs[b]) >= max(qs[b + 1])

    # deterministic under physical layout
    out2 = curriculum_order(df.repartition(7, "text"), "text", "doc_id",
                            n_buckets=4)
    got2 = sorted(map(tuple, out2.collect()))
    cache.release(out2)
    assert got == got2


def test_token_budget_sample_greedy_per_source(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release

    docs = spark.createDataFrame(
        [
            (i, " ".join(["tok"] * (3 + i % 4)), f"s{i % 2}")
            for i in range(20)
        ],
        ["doc_id", "text", "source"],
    )
    budgets = {"s0": 12, "s1": 10_000}
    out = ops.token_budget_sample(
        docs, "text", "doc_id", "source", budgets, salt="t"
    )
    rows = out.collect()
    release(out)

    def h(i: int) -> int:
        acc = 0
        for c in f"{i}:t":
            acc = (acc * 31 + ord(c)) % 1_000_000_007
        return acc

    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # cum_tokens must be the running sum in salted-hash visit order,
    # and admit must flip exactly at the budget boundary
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (h(r["doc_id"]), r["doc_id"]))
        run = 0
        for r in rs:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run, (src, r)
            assert r["admit"] == (run <= budgets[src]), (src, r)
    # s1's budget covers everything; s0's cuts partway
    assert all(r["admit"] for r in by_src["s1"])
    admitted0 = [r for r in by_src["s0"] if r["admit"]]
    assert 0 < len(admitted0) < len(by_src["s0"])
    assert sum(r["n_tokens"] for r in admitted0) <= 12


def test_token_budget_sample_unknown_source_gets_zero_budget(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release

    docs = spark.createDataFrame(
        [(1, "a b c", "known"), (2, "d e", "mystery")],
        ["doc_id", "text", "source"],
    )
    out = ops.token_budget_sample(
        docs, "text", "doc_id", "source", {"known": 100}, salt="t"
    )
    got = {r["doc_id"]: r["admit"] for r in out.collect()}
    release(out)
    assert got == {1: True, 2: False}


def test_epoch_shards_dense_and_shard_arithmetic(spark):
    from odsc_agentic_ai_summit_2025_spark.cache import release

    docs = spark.createDataFrame(
        [(i, "x") for i in range(150)], ["doc_id", "text"]
    )
    out = ops.epoch_shards(docs, "doc_id", docs_per_shard=64, salt="e")
    rows = out.collect()
    release(out)
    assert sorted(r["epoch_pos"] for r in rows) == list(range(150))
    for r in rows:
        assert r["shard_id"] == r["epoch_pos"] // 64
        assert r["pos_in_shard"] == r["epoch_pos"] % 64
    # a different salt draws a different permutation
    out2 = ops.epoch_shards(docs, "doc_id", docs_per_shard=64, salt="f")
    perm1 = {r["doc_id"]: r["epoch_pos"] for r in rows}
    rows2 = out2.collect()
    release(out2)
    perm2 = {r["doc_id"]: r["epoch_pos"] for r in rows2}
    assert perm1 != perm2

    with pytest.raises(ValueError, match="docs_per_shard"):
        ops.epoch_shards(docs, "doc_id", docs_per_shard=0)


def test_dsir_scores_match_reference(spark):
    """dsir_scores == a plain-Python bigram importance reference
    (add-one-smoothed integer ratio, per-doc count weighting, cap)."""
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        dsir_scores,
    )

    rows = [
        (0, "a b a b c", "tgt"),
        (1, "a b x y", "bg"),
        (2, "x y x y", "bg"),
        (3, "a b", "bg"),
        (4, "", "bg"),          # gram-less: scores 0
        (5, "q", "tgt"),        # single token: no bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_scores(df, "text", "doc_id", "source", "tgt", n=2)
    got = {r["doc_id"]: (r["n_grams"], r["importance_e4"]) for r in out.collect()}
    release(out)

    # reference
    def bigrams(t):
        ws = t.split()
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    t_counts: dict[str, int] = {}
    r_counts: dict[str, int] = {}
    for _, t, s in rows:
        for g in bigrams(t):
            d = t_counts if s == "tgt" else r_counts
            d[g] = d.get(g, 0) + 1
    cap = 10**8
    for i, t, _ in rows:
        gs = bigrams(t)
        n = len(gs)
        s = sum(
            min(((t_counts.get(g, 0) + 1) * 10000) // (r_counts.get(g, 0) + 1), cap)
            for g in gs
        )
        assert got[i] == (n, s // max(n, 1)), (i, got[i])


def test_quality_representatives_argmax_and_ties(spark):
    """Survivor = max quality, ties -> min id; singletons keep."""
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        quality_representatives,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 8), (8, 8)],
        "id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (8, 40), (9, 40)],
        "id long, quality_e4 long",
    )
    out = quality_representatives(comp, scores)
    got = {r["id"]: (r["keep"], r["cluster_size"]) for r in out.collect()}
    release(out)
    # cluster 1: 2 and 3 tie at 90 -> min id 2 survives
    assert got == {
        1: (False, 3), 2: (True, 3), 3: (False, 3),
        7: (True, 1),
        8: (True, 2), 9: (False, 2),  # tie at 40 -> min id 8
    }

    # PARTIAL score table: unscored members keep their rows and the
    # full cluster_size; a cluster with no scored member falls back
    # to the min-id survivor (the dedup_decisions rule)
    partial = spark.createDataFrame([(1, 50)], "id long, quality_e4 long")
    out = quality_representatives(comp, partial)
    got = {
        r["id"]: (r["keep"], r["cluster_size"], r["quality_e4"])
        for r in out.collect()
    }
    release(out)
    assert got == {
        1: (True, 3, 50), 2: (False, 3, None), 3: (False, 3, None),
        7: (True, 1, None),            # all-unscored: min id keeps
        8: (True, 2, None), 9: (False, 2, None),
    }


def test_semantic_decontamination(spark):
    """Embedding-tier decontam (r8): a corpus doc is contaminated iff
    some benchmark vector clears the cosine threshold; every corpus
    row appears (clean docs 0/false); an empty benchmark flags
    nothing. Map-only — the plan must contain no Exchange."""
    from pyspark.sql import functions as F

    from odsc_agentic_ai_summit_2025_spark.operators.curation import (
        semantic_decontamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),       # = bench 10 → cos 1
            (2, [0.9, 0.4359]),    # cos ~0.90 vs bench 10
            (3, [0.0, 1.0]),       # orthogonal to bench 10
            (4, [-1.0, 0.0]),      # opposite
        ],
        "id long, v array<double>",
    )
    bench = spark.createDataFrame(
        [(10, [2.0, 0.0])], "id long, v array<double>"
    )
    out = semantic_decontamination(corpus, bench, "v", "id", threshold=0.85)
    got = {r["id"]: (r["n_bench_hits"], r["contaminated"]) for r in out.collect()}
    assert got == {1: (1, True), 2: (1, True), 3: (0, False), 4: (0, False)}
    # no KEYED shuffle anywhere (no group/join hash partitioning);
    # ensure_min_partitions MAY add one round-robin fan-out on
    # under-split input, which never appears here because
    # createDataFrame already yields defaultParallelism slices
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert "Exchange" not in plan, plan

    empty_bench = bench.filter(F.col("id") < 0)
    clean = semantic_decontamination(
        corpus, empty_bench, "v", "id", threshold=0.5
    )
    assert all(
        not r["contaminated"] and r["n_bench_hits"] == 0
        for r in clean.collect()
    )


# ---------------------------------------------------------------------------
# Folded from test_review_r5d: null-text curriculum exclusion
# ---------------------------------------------------------------------------


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
