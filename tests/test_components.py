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
    """A path graph (worst-case diameter for label propagation)."""
    from odsc_agentic_ai_summit_2025_spark.operators.components import (
        connected_components,
        dedup_decisions,
    )

    chain = [(i, i + 1) for i in range(15)]
    pairs = spark.createDataFrame(chain, "a_id long, b_id long")
    comp = connected_components(pairs)
    rows = dedup_decisions(comp).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert sorted(r["id"] for r in rows if r["keep"]) == [0]
    assert all(r["cluster_size"] == 16 for r in rows)


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
