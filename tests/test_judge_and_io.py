"""Judge metrics (L10/U2), source round-trips (S3-S5), graph
persistence, and variable-length path queries (J3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

EXTRACTED = "/root/reference/data/extracted_fhir.json"
needs_ref = pytest.mark.skipif(
    not os.path.exists(EXTRACTED), reason="reference data not present"
)


# ---------------------------------------------------------------------------
# L10 judge metrics
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def answers(spark):
    return spark.createDataFrame(
        [
            (
                "How many patients are there?",
                "There are 42 patients in total.",
                "records show 42 patients registered",
                "42",
            ),
            (
                "Which city?",
                "Boston, contact admin@leak.example.com",
                "the patient lives in Salem",
                "Salem",
            ),
        ],
        "question string, answer string, context string, expected string",
    )


def test_judge_metrics_columns(spark, answers):
    from odsc_agentic_ai_summit_2025_spark.llm.judge import judge_metrics

    rows = judge_metrics(
        answers, expected_col="expected", sample_rate=1.0
    ).collect()
    good = next(r for r in rows if "42" in r["answer"])
    bad = next(r for r in rows if "Boston" in r["answer"])
    assert good["contains"] == 1.0 and bad["contains"] == 0.0
    assert good["context_recall"] > bad["context_recall"]
    assert good["moderation"] == 0.0 and bad["moderation"] == 1.0
    assert 0.0 <= good["answer_relevance"] <= 1.0


def test_judge_sampling_bounds_cost(spark):
    from odsc_agentic_ai_summit_2025_spark.llm.judge import judge_metrics

    big = spark.range(1000).select(
        F.lit("q").alias("question"),
        F.lit("a").alias("answer"),
        F.lit("c").alias("context"),
    )
    n = judge_metrics(big, sample_rate=0.05, seed=7).count()
    assert 10 <= n <= 120  # ~5% of 1000


def test_answer_similarity_u2(spark):
    from odsc_agentic_ai_summit_2025_spark.llm.judge import answer_similarity

    df = spark.createDataFrame(
        [("the quick brown fox", "the slow brown fox")], "a string, b string"
    )
    (val,) = df.select(answer_similarity(F.col("a"), F.col("b"))).first()
    assert abs(val - 3 / 4) < 1e-12  # {the, brown, fox} over max(4, 4)


def test_metrics_summary(spark, answers):
    from odsc_agentic_ai_summit_2025_spark.llm.judge import (
        judge_metrics,
        metrics_summary,
    )

    row = metrics_summary(
        judge_metrics(answers, expected_col="expected", sample_rate=1.0)
    ).first()
    assert row["n_scored"] == 2
    assert row["avg_contains"] == 0.5


# ---------------------------------------------------------------------------
# S3/S4/S5 sources round-trip
# ---------------------------------------------------------------------------

def test_json_sink_and_multifile_concat(spark, tmp_path):
    from odsc_agentic_ai_summit_2025_spark.sources.io import write_json

    df = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, "b")], "record_id long, note string"
    )
    write_json(df.repartition(3), str(tmp_path / "out"))
    # S4: glob read of the per-batch files + global order
    back = (
        spark.read.schema("record_id long, note string")
        .json(str(tmp_path / "out"))
        .orderBy("record_id")
    )
    assert [r["record_id"] for r in back.collect()] == [1, 2, 3]


def test_with_row_index_deterministic(spark):
    from odsc_agentic_ai_summit_2025_spark.sources.io import with_row_index

    df = spark.createDataFrame(
        [("x",), ("a",), ("m",)], "note string"
    )
    out1 = with_row_index(df.repartition(3), ["note"]).collect()
    out2 = with_row_index(df.coalesce(1), ["note"]).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    byname = {r["note"]: r["record_id"] for r in out1}
    assert byname == {"a": 1, "m": 2, "x": 3}  # 1-based, order-defined


# ---------------------------------------------------------------------------
# Graph persistence (bucketed tables) + variable-length paths
# ---------------------------------------------------------------------------

@needs_ref
def test_graph_write_read_bucketed(spark, tmp_path):
    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        build_graph,
        read_graph,
        write_graph,
    )
    from odsc_agentic_ai_summit_2025_spark.schemas import EXTRACTED_FHIR
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_json_records

    g = build_graph(read_json_records(spark, EXTRACTED, EXTRACTED_FHIR))
    write_graph(g, str(tmp_path / "graph"), n_buckets=4)
    tables = read_graph(spark, str(tmp_path / "graph"))
    assert tables["patient"].count() == g.patient.count()
    assert tables["treats"].count() == g.treats.count()
    # bucketed co-located join: with broadcast disabled, the plan must
    # be a sort-merge join with NO shuffle exchange (bucket layout
    # satisfies the join's distribution requirement)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = tables["treats"].join(
            tables["practitioner"].withColumnRenamed("id", "src"), "src"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


@needs_ref
def test_variable_length_paths(spark):
    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        build_graph,
        variable_length_paths,
    )
    from odsc_agentic_ai_summit_2025_spark.schemas import EXTRACTED_FHIR
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_json_records

    g = build_graph(read_json_records(spark, EXTRACTED, EXTRACTED_FHIR))
    # patient -EXPERIENCES-> allergy <-CAUSES- substance is 1 hop on
    # the union graph in each direction; 2 hops connects patient to
    # substance ids
    edges = g.experiences.select(
        F.col("src").cast("string").alias("src"),
        F.col("dst").cast("string").alias("dst"),
    ).unionByName(
        g.causes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    paths = variable_length_paths(edges, "src", "dst", 1, 2)
    hops = {r["hops"] for r in paths.select("hops").distinct().collect()}
    assert hops == {1, 2}
    two = paths.filter(F.col("hops") == 2)
    # patient 45 reaches substance 'shellfish' in exactly 2 hops
    assert (
        two.filter(
            (F.col("start") == "45") & (F.col("end") == "shellfish")
        ).count()
        == 1
    )


def test_variable_length_paths_undirected_vs_directed(spark):
    """The Cypher `-[r*..]-` pattern is UNDIRECTED: a trail may not
    reuse a relationship in either direction. Directed mode treats
    a→b and b→a as two relationships (the 2-hop round trip is legal);
    undirected mode must prune it."""
    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        variable_length_paths,
    )

    mutual = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    directed = {
        (r.start, r.end, r.hops)
        for r in variable_length_paths(mutual, "src", "dst", 1, 2).collect()
    }
    one_way = spark.createDataFrame([("a", "b")], "src string, dst string")
    undirected = {
        (r.start, r.end, r.hops)
        for r in variable_length_paths(
            one_way, "src", "dst", 1, 2, undirected=True
        ).collect()
    }
    assert ("a", "a", 2) in directed and ("b", "b", 2) in directed
    assert undirected == {("a", "b", 1), ("b", "a", 1)}
    # a triangle gives undirected 2-hop paths without edge reuse
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    utri = {
        (r.start, r.end, r.hops)
        for r in variable_length_paths(
            tri, "src", "dst", 2, 2, undirected=True
        ).collect()
    }
    assert utri == {
        (s, e, 2)
        for s in "abc"
        for e in "abc"
        if s != e  # s==e needs reuse at 2 hops; s≠e reachable via third
    }


def test_variable_length_paths_frontier_guard(spark):
    """The hub-graph guard: max_frontier_rows must fail fast (before
    launching the expansion join) on a star graph whose hop-2
    frontier is quadratic in the hub degree, identify the offending
    hop, and leave no persisted frontier behind."""
    import pytest

    from odsc_agentic_ai_summit_2025_spark import cache
    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        FrontierExplosionError,
        variable_length_paths,
    )

    # star: hub "h" — 200 leaves, undirected. Hop-1 frontier = 400
    # directed trail rows; the hop-2 expansion joins every leaf→hub
    # row against the hub's 200 out-edges → bound 200·200 + 200.
    leaves = [(f"v{i}", "h") for i in range(200)]
    star = spark.createDataFrame(leaves, "src string, dst string")
    with pytest.raises(FrontierExplosionError, match="hop-2 .*40200"):
        variable_length_paths(
            star, "src", "dst", 1, 3, undirected=True,
            max_frontier_rows=5_000,
        )
    # the edge list itself can trip the hop-1 check
    with pytest.raises(FrontierExplosionError, match="hop-1"):
        variable_length_paths(
            star, "src", "dst", 1, 3, undirected=True,
            max_frontier_rows=100,
        )
    # guard off the hot seat: under the cap, guarded ≡ unguarded, and
    # releasing the result drops the persisted frontiers (block
    # census back to the pre-run count)
    baseline = len(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    guarded = variable_length_paths(
        tri, "src", "dst", 1, 3, max_frontier_rows=1_000
    )
    plain = variable_length_paths(tri, "src", "dst", 1, 3)
    rows_g = {(r.start, r.end, r.hops) for r in guarded.collect()}
    rows_p = {(r.start, r.end, r.hops) for r in plain.collect()}
    assert rows_g == rows_p and rows_g
    assert cache.handles(guarded)
    cache.release(guarded)
    after = len(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    assert after <= baseline, (baseline, after)


def test_variable_length_paths_releases_on_any_error(spark):
    """Guarded-path persist hygiene beyond the guard itself: the
    guarded loop eagerly persists (e1, deg, frontiers), so an
    arbitrary execution failure mid-run — not only
    FrontierExplosionError — must release every persisted handle
    instead of leaking frontier-sized cache blocks."""
    import pytest

    from odsc_agentic_ai_summit_2025_spark.operators.graph import (
        variable_length_paths,
    )

    baseline = len(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    # JVM-side runtime failure (no UDF): assert_true(false) raises in
    # the scan feeding e1, i.e. during the guarded path's first
    # eager action (e1.count()), well under the frontier cap.
    booby = edges.filter(F.assert_true(F.lit(False)).isNull())
    with pytest.raises(Exception) as exc:
        variable_length_paths(
            booby, "src", "dst", 1, 3, max_frontier_rows=1_000_000
        )
    assert "FrontierExplosion" not in type(exc.value).__name__
    after = len(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    assert after <= baseline, (baseline, after)


# ---------------------------------------------------------------------------
# Single-record debug diff (SURVEY §5, src/debug.py parity)
# ---------------------------------------------------------------------------

@needs_ref
def test_debug_record(spark):
    from odsc_agentic_ai_summit_2025_spark.llm.debug import debug_record
    from odsc_agentic_ai_summit_2025_spark.operators.graph import build_graph
    from odsc_agentic_ai_summit_2025_spark.schemas import EXTRACTED_FHIR, NOTES
    from odsc_agentic_ai_summit_2025_spark.sources.io import read_json_records

    notes = read_json_records(spark, "/root/reference/data/note.json", NOTES)
    gold = read_json_records(spark, EXTRACTED, EXTRACTED_FHIR)
    d = debug_record(notes, gold, 45, graph=build_graph(gold))
    assert "Marisol" in d["note"]
    assert d["extracted"]["name"]["family"] == "Rodríguez"
    assert d["graph"]["patient"][0]["surname"] == "Rodríguez"
    assert any(e for e in d["graph"]["edges"]["experiences"])


def test_row_index_distributed_matches_window_form(spark, sf_dir):
    """The range-partition + offset form must assign exactly the
    global-window indexes, with no unpartitioned window in its plan."""
    from pyspark.sql import functions as F

    from odsc_agentic_ai_summit_2025_spark.sources.io import (
        read_table,
        with_row_index,
        with_row_index_distributed,
    )

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = with_row_index(cust, ["c_custkey"]).select("c_custkey", "record_id")
    b = with_row_index_distributed(cust, ["c_custkey"]).select(
        "c_custkey", "record_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = b._jdf.queryExecution().executedPlan().toString()
    # every window in the distributed form is keyed by partition id
    assert "partitionBy" not in plan or "_pid" in plan


def test_write_compacted_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """Compacting writer: data fidelity, file-count scaling with
    target size, and row-group stats that let a range predicate prune
    (the reason sort_cols exists)."""
    from odsc_agentic_ai_summit_2025_spark.sources.io import (
        read_table,
        write_compacted,
    )

    docs = read_table(spark, sf_dir, "documents")
    small = str(tmp_path / "small")
    n_small = write_compacted(
        docs, small, target_mb=1, sort_cols=["doc_id"]
    )
    big = str(tmp_path / "big")
    n_big = write_compacted(docs, big, target_mb=1024, sort_cols=["doc_id"])
    assert n_big <= n_small
    assert n_big == 1  # 500 docs << 1 GiB

    back = spark.read.parquet(small)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )
    # range-sorted layout: each file covers a disjoint doc_id range, so
    # min/max footer stats satisfy a point-range scan from ONE file
    import pyarrow.parquet as pq
    import pathlib

    files = sorted(pathlib.Path(small).glob("*.parquet"))
    if len(files) > 1:
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().names.index("doc_id")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2  # disjoint → file-level pruning works

    empty = str(tmp_path / "empty")
    assert write_compacted(docs.limit(0), empty, target_mb=1) == 1
    assert spark.read.parquet(empty).count() == 0


def test_judge_column_path_null_parity(spark):
    """NULL question/context/answer must score exactly like the
    HeuristicJudge (which treats None as empty) — the raw columns
    null-propagated to NULL metrics before the r5 fix, silently
    skewing metrics_summary averages."""
    from odsc_agentic_ai_summit_2025_spark.llm.judge import (
        HeuristicJudge,
        judge_metrics,
    )

    rows = [
        ("q text", "ans words here", None),
        (None, "ans words here", "ctx words"),
        ("q text", None, "ctx words"),
        (None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "question string, answer string, context string"
    )
    out = judge_metrics(df, sample_rate=1.0).collect()
    judge = HeuristicJudge()
    for r in out:
        for metric, col in [
            ("context_recall", "context_recall"),
            ("answer_relevance", "answer_relevance"),
            ("moderation", "moderation"),
            ("answer_similarity", "answer_similarity"),
        ]:
            want = judge.score(metric, r["question"], r["answer"], r["context"])
            assert r[col] is not None, (metric, r)
            assert abs(r[col] - want) < 1e-12, (metric, r[col], want)


def test_running_totals_stream_null_values(spark, tmp_path):
    """A null event value must not kill the stateful stream: the
    event is counted, the sum skips it — matching the batch decimal
    SUM (before the r5 fix int(round(NaN)) crashed the query)."""
    import pandas as pd

    from odsc_agentic_ai_summit_2025_spark.streaming.pipeline import (
        user_running_totals,
        user_running_totals_stream,
    )

    d = tmp_path / "events_nulls"
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
                 "2024-01-01 00:02:00", "2024-01-01 00:03:00"]
            ),
            "user_id": [7, 7, 7, 8],
            "event_type": ["click"] * 4,
            "value": [1.5, None, 2.25, None],
            "props": ["{}"] * 4,
        }
    )
    pdf.to_parquet(d / "part-0.parquet", index=False)

    batch_df = spark.createDataFrame(pdf)
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in user_running_totals(batch_df).collect()
    }

    stream = user_running_totals_stream(spark, str(d))
    q = (
        stream.writeStream.format("memory")
        .queryName("urt_null_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("urt_null_stream").collect()
    }
    assert got == {7: (3, 3.75), 8: (1, 0.0)}
    assert got == want


def test_hostload_sample_and_delta():
    """The bench artifacts' load evidence: samples parse /proc and the
    delta math yields a bounded steal percentage (no Spark needed)."""
    from odsc_agentic_ai_summit_2025_spark import hostload

    a = hostload.sample()
    assert set(a) == {"la1", "jt", "js"}
    # on this Linux host the reads succeed; keep the None tolerance
    # for the fields' CONSUMERS, not for the host we test on
    assert a["la1"] is not None and a["jt"] is not None
    b = dict(a)
    b["jt"] = a["jt"] + 1000
    b["js"] = a["js"] + 50
    d = hostload.delta(a, b)
    assert d == {
        "la1": a["la1"], "dtotal": 1000, "dsteal": 50, "steal_pct": 5.0,
    }
    # missing counters degrade to None, never raise
    d2 = hostload.delta({"la1": None, "jt": None, "js": None}, b)
    assert d2["steal_pct"] is None and d2["la1"] is None


# ---------------------------------------------------------------------------
# Folded from the round-named review modules (r3/r5c): IO unit
# detection, distributed row index, trail semantics
# ---------------------------------------------------------------------------

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, name, unit):
    ts = pa.array([1_704_067_200_000_000 + i * 3_600_000_000 for i in range(4)],
                  type=pa.timestamp("us"))
    if unit == "ns":
        ts = ts.cast(pa.timestamp("ns"))
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "event_type": pa.array(["a", "b", "a", "c"]),
        "value": pa.array([1.5, 2.5, 3.5, 4.5]),
        "props": pa.array(["{}", "{}", "{}", "{}"]),
    })
    path = str(tmp_path / name)
    pq.write_table(t, path)
    return path


def test_events_ts_unit_detected(spark, tmp_path):
    """NANOS and MICROS files with identical instants read identically."""
    import shutil

    from odsc_agentic_ai_summit_2025_spark.sources.io import read_table

    for unit in ("us", "ns"):
        d = tmp_path / unit
        d.mkdir()
        _write_events(d, "events.parquet", unit)
    a = read_table(spark, str(tmp_path / "us"), "events").orderBy("event_id").collect()
    b = read_table(spark, str(tmp_path / "ns"), "events").orderBy("event_id").collect()
    assert [r["ts"] for r in a] == [r["ts"] for r in b]
    assert a[0]["ts"].year == 2024
    shutil.rmtree(tmp_path / "us")
    shutil.rmtree(tmp_path / "ns")


def test_row_index_distributed_empty_input(spark):
    from odsc_agentic_ai_summit_2025_spark.sources.io import (
        with_row_index_distributed,
    )

    df = spark.createDataFrame([], "k long, v string")
    out = with_row_index_distributed(df, ["k"])
    assert out.count() == 0
    assert "record_id" in out.columns


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
