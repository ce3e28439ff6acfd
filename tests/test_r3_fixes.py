"""Round-3 regression tests: events-ts unit detection, empty-input
row indexing, and the integer fixed-point ppjoin prefix bound."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


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


@pytest.mark.parametrize("threshold,n", [(0.07, 100), (0.8, 10), (0.1, 30)])
def test_ppjoin_prefix_bound_integer_exact(threshold, n):
    """(n*t_e4 + 9999) div 10000 equals true ceil(t*n) where double
    arithmetic can overshoot (0.07*100 -> 7.000000000000001)."""
    import math
    from fractions import Fraction

    t_e4 = int(threshold * 10000)
    got = (n * t_e4 + 9999) // 10000
    want = math.ceil(Fraction(t_e4, 10000) * n)
    assert got == want


def test_jaccard_pairs_low_threshold_lossless(spark):
    """At t=0.07 the double-ceil form dropped qualifying pairs; the
    fixed-point prefix must keep every pair the naive all-pairs
    program finds."""
    from itertools import combinations

    from odsc_agentic_ai_summit_2025_spark.operators.dedup import jaccard_pairs

    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + 25)))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs(df, "text", "doc_id", threshold=0.07).collect()
    }
    toks = {i: set(t.split()) for i, t in rows}
    want = {
        (a, b)
        for a, b in combinations(sorted(toks), 2)
        if (len(toks[a] & toks[b]) * 10000) // len(toks[a] | toks[b]) >= 700
    }
    assert got == want
