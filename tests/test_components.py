"""Connected components + multi-rule PII guardrails."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min id in component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_matches_union_find(spark, seed):
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find_components(n, edges)

    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs, vertices=verts).collect()
    }
    assert got == expected


def test_connected_components_chain_converges(spark):
    """A path graph — worst-case diameter. 200 nodes would need 199
    rounds under pure neighbor-min propagation (far beyond the
    25-round cap); pointer jumping must close it in O(log n)."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
        dedup_decisions,
    )

    n = 200
    chain = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(chain, "a_id long, b_id long")
    # driver_max_edges=0 forces the DISTRIBUTED loop (the r13 driver
    # fast path would otherwise absorb a graph this small) — this
    # test exists to pin the pointer-jumping convergence bound
    comp = connected_components(pairs, driver_max_edges=0)
    rows = dedup_decisions(comp).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert sorted(r["id"] for r in rows if r["keep"]) == [0]
    assert all(r["cluster_size"] == n for r in rows)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_driver_components_match_distributed_loop(spark, seed):
    """The r13 driver fast path (bounded edge list solved with numpy
    min-label + pointer jumping) must label every vertex identically
    to the distributed fixpoint loop — including isolated vertices."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(1000 + seed)
    n = 150
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(110)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    fast = {
        r["id"]: r["cluster_id"]
        for r in connected_components(pairs, vertices=verts).collect()
    }
    loop = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            pairs, vertices=verts, driver_max_edges=0
        ).collect()
    }
    assert fast == loop
    assert len(fast) == n


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_components_matches_union_find(spark, seed):
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    rng = random.Random(seed)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find_components(n, edges)

    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            pairs, vertices=verts, algorithm="star"
        ).collect()
    }
    assert got == expected


def test_star_components_giant_component_skew(spark):
    """The topology min-label propagation is skew-hot on: ONE giant
    component — a hub star fused with a long chain, so every node
    funnels to label 0 (hot key) and the diameter stresses rounds.
    The star variant must solve it, both directly and as the
    ``auto`` fallback when the min-label budget is exhausted."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    hub = [(0, i) for i in range(1, 400)]          # giant star at 0
    chain = [(399 + i, 400 + i) for i in range(200)]  # chain off one leaf
    pairs = spark.createDataFrame(hub + chain, "a_id long, b_id long")

    for algo in ("star", "auto"):
        rows = connected_components(
            pairs, algorithm=algo, max_iterations=3 if algo == "auto" else 25
        ).collect()
        assert {r["cluster_id"] for r in rows} == {0}, algo
        assert len(rows) == 600, algo


def test_minlabel_raises_without_fallback(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
    )

    chain = [(i, i + 1) for i in range(199)]
    pairs = spark.createDataFrame(chain, "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="star"):
        connected_components(
            pairs, algorithm="minlabel", max_iterations=2
        ).collect()


def test_pii_trace_multi_rule(spark):
    from odsc_agentic_ai_summit_2025_spark.functions.guardrails import (
        mask_pii,
        pii_trace_df,
    )

    df = spark.createDataFrame(
        [
            (1, "call 555-123-4567 or (555) 987-6543 now"),
            (2, "ssn 123-45-6789 email alice@x.com"),
            (3, "clean text"),
        ],
        "id int, text string",
    )
    rows = {
        (r["id"], r["rule"]): r
        for r in pii_trace_df(df, "text", "id").collect()
    }
    # 3 records × 3 rules
    assert len(rows) == 9
    assert rows[(1, "phone")]["n_matches"] == 2
    assert rows[(1, "phone")]["action"] == "WARN"
    assert rows[(1, "email")]["n_matches"] == 0
    assert rows[(2, "ssn")]["triggered"] and rows[(2, "email")]["triggered"]
    assert not rows[(3, "email")]["masking_applied"]
    assert rows[(2, "email")]["masking_applied"]

    masked = {
        r["id"]: r["m"]
        for r in df.select("id", mask_pii(F.col("text")).alias("m")).collect()
    }
    assert "XXX-XXX-XXXX" in masked[1] and "555" not in masked[1]
    assert "XXX-XX-XXXX" in masked[2] and "a***e@x.com" in masked[2]
    assert masked[3] == "clean text"


def test_train_split_stable_and_salted(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.textops import (
        train_split,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in train_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in train_split(df, "doc_id").collect()}
    assert a == b  # pure function of id
    # roughly 80/10/10
    from collections import Counter

    c = Counter(a.values())
    assert 350 < c["train"] < 450 and c["val"] > 20 and c["test"] > 20
    # a different salt re-splits independently
    other = {
        r["doc_id"]: r["split"]
        for r in train_split(df, "doc_id", salt="resplit").collect()
    }
    assert other != a


def test_corpus_filter_rules_discriminate(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.textops import (
        corpus_filter,
    )

    df = spark.createDataFrame(
        [
            (1, "plenty of ordinary words keep this document around fine"),
            (2, "too short"),                       # len_ok fails
            (3, "the a the a the a the a the a"),   # stop_ok fails
            (4, "x " * 20),                         # avg_len_ok fails (1 char)
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_filter(df, "text", "doc_id").collect()}
    assert rows[1]["kept"]
    assert not rows[2]["len_ok"] and not rows[2]["kept"]
    assert not rows[3]["stop_ok"] and not rows[3]["kept"]
    assert not rows[4]["avg_len_ok"] and not rows[4]["kept"]


def test_triangle_counts_k4_plus_chain(spark):
    """K4 → every member in C(3,2)=3 triangles; chain → none."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(10, 11), (11, 12), (12, 13)]
    pairs = spark.createDataFrame(k4 + chain, "a_id long, b_id long")
    verts = spark.createDataFrame(
        [(i,) for i in list(range(4)) + [10, 11, 12, 13, 99]], "id long"
    )
    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, verts).collect()
    }
    assert all(got[i] == 3 for i in range(4))
    assert all(got[i] == 0 for i in (10, 11, 12, 13, 99))


@pytest.mark.parametrize("cap", [None, 0])
def test_triangle_counts_hub_star_vs_bruteforce(spark, cap):
    """Degree-oriented counting (r10) on the hub shape that hot-keyed
    the old id-ordered join: a mid-id hub tied to every spoke plus
    ring edges among consecutive spokes, checked per-vertex against a
    brute-force Python count. Orientation must not change counts —
    they are a property of the undirected graph. Parametrized over
    the r14 driver fast path (cap=None) and the distributed join
    (cap=0) so both paths stay pinned to ground truth."""
    import itertools

    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        triangle_counts,
    )

    n, hub = 40, 20
    edges = {tuple(sorted((i, hub))) for i in range(n) if i != hub}
    edges |= {
        (i, i + 1)
        for i in range(0, n - 1)
        if i % 3 == 1 and hub not in (i, i + 1)
    }
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {
        i: sum(
            1
            for v, w in itertools.combinations(sorted(adj[i]), 2)
            if w in adj[v]
        )
        for i in range(n)
    }
    pairs = spark.createDataFrame(sorted(edges), "a_id long, b_id long")
    verts = spark.range(n).select(F.col("id"))
    got = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, verts, driver_max_edges=cap).collect()
    }
    assert got == want and sum(want.values()) > 0


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_driver_triangle_counts_match_distributed(spark, seed):
    """The r14 driver fast path (entry-level numpy wedge counting)
    must count every vertex identically to the distributed
    degree-oriented wedge join — isolated vertices and vertices
    outside every triangle included."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        triangle_counts,
    )

    rng = random.Random(400 + seed)
    n = 60
    edges = sorted(
        {
            tuple(sorted((rng.randrange(n), rng.randrange(n))))
            for _ in range(140)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame(
        [(i,) for i in range(n + 5)], "id long"
    )  # 5 isolated vertices past the edge id range
    fast = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, verts).collect()
    }
    dist = {
        r["id"]: r["n_triangles"]
        for r in triangle_counts(pairs, verts, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert len(fast) == n + 5 and sum(fast.values()) > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_driver_pagerank_match_distributed(spark, seed):
    """The r14 driver fast path (vectorized int64 power steps) must
    be bit-identical to the distributed unrolled plan — including
    isolated vertices (teleport-only mass) and edge endpoints OUTSIDE
    the vertex set (they dilute degree but hold no pr row)."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        pagerank_fixed,
    )

    rng = random.Random(700 + seed)
    n = 50
    edges = [
        (rng.randrange(n + 4), rng.randrange(n + 4)) for _ in range(90)
    ]  # ids n..n+3 appear in edges but NOT in the vertex table
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    fast = {
        r["id"]: r["pr_e9"]
        for r in pagerank_fixed(pairs, verts, iterations=3).collect()
    }
    dist = {
        r["id"]: r["pr_e9"]
        for r in pagerank_fixed(
            pairs, verts, iterations=3, driver_max_edges=0
        ).collect()
    }
    assert fast == dist
    assert len(fast) == n


def test_pagerank_fixed_star_and_determinism(spark):
    """Star center outranks leaves; isolated vertex holds teleport
    mass only; result identical under input repartitioning."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        pagerank_fixed,
    )

    star = [(0, i) for i in range(1, 9)]
    pairs = spark.createDataFrame(star, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    got = {r["id"]: r["pr_e9"] for r in pagerank_fixed(pairs, verts).collect()}
    assert got[0] > got[1] > got[9]
    base = 10**9 // 10
    assert got[9] == (15 * base) // 100  # isolated: teleport only
    again = {
        r["id"]: r["pr_e9"]
        for r in pagerank_fixed(
            pairs.repartition(5, "b_id"), verts, iterations=3
        ).collect()
    }
    assert got == again


def test_pagerank_checkpoint_every_bounds_plan_and_matches(spark):
    """iterations=12 with checkpoint_every=3 returns the exact same
    fixed-point ranks as the pure unrolled plan, with analysis-plan
    size bounded (lineage cut at the checkpoints) and all storage —
    persists AND checkpoint blocks — freed by release."""
    from odsc_agentic_ai_summit_2025_spark.cache import release
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        pagerank_fixed,
    )

    random.seed(91)
    edges = list({(random.randrange(30), random.randrange(30)) for _ in range(60)})
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    verts = spark.createDataFrame([(i,) for i in range(30)], "id long")

    # driver_max_edges=0 forces the DISTRIBUTED unroll (the r14 driver
    # fast path would otherwise absorb a graph this small) — this test
    # exists to pin the checkpoint machinery of the unrolled plan
    plain = pagerank_fixed(pairs, verts, iterations=12, driver_max_edges=0)
    want = {r["id"]: r["pr_e9"] for r in plain.collect()}
    plain_depth = plain._jdf.queryExecution().analyzed().treeString().count("\n")
    release(plain)

    baseline = len(spark.sparkContext._jsc.getPersistentRDDs())
    ck = pagerank_fixed(
        pairs, verts, iterations=12, checkpoint_every=3, driver_max_edges=0
    )
    got = {r["id"]: r["pr_e9"] for r in ck.collect()}
    ck_depth = ck._jdf.queryExecution().analyzed().treeString().count("\n")
    assert got == want
    # 12 unrolled joins vs a plan rooted at the step-9 checkpoint:
    # the checkpointed analysis plan must be a small fraction
    assert ck_depth < plain_depth / 3, (ck_depth, plain_depth)

    # storage stays O(1) in iterations: intermediate checkpoints are
    # freed as soon as their successor materializes, so only sym +
    # verts + the LAST checkpoint hold blocks (not iterations/k frames)
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(before) <= baseline + 3, (baseline, len(before))
    release(ck)
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(after) < len(before), "release freed nothing"
    assert len(after) <= max(len(before) - 3, 0)


# ---------------------------------------------------------------------------
# Folded from test_review_r5d: components release/ownership
# ---------------------------------------------------------------------------


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
