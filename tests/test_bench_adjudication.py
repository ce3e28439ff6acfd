"""The bench self-adjudication machinery (r10, VERDICT r9 #3) —
pure-Python units over bench.py's baseline discovery and flag logic,
so the behavior the driver's BENCH artifact depends on is pinned by
the suite, not only by full bench runs."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import bench


def _write(root, name, sf, queries, parsed=True):
    body = {"parsed": {"sf": sf, "queries": queries}} if parsed else {}
    (root / name).write_text(json.dumps(body))


def test_prior_round_picks_latest_at_same_sf(tmp_path):
    _write(tmp_path, "BENCH_r08.json", 0.1, {"q01": 1.0, "q02": 2.0})
    _write(tmp_path, "BENCH_r09.json", 0.1, {"q01": 1.5})
    # a later round at a DIFFERENT sf must not shadow the 0.1 baseline
    _write(tmp_path, "BENCH_r11.json", 0.01, {"q01": 0.2})
    got = bench._prior_round_queries(0.1, root=tmp_path)
    assert got == {"q01": 1.5}
    assert bench._prior_round_queries(0.01, root=tmp_path) == {"q01": 0.2}
    # no baseline at an unmeasured sf → empty → nothing can flag
    assert bench._prior_round_queries(0.001, root=tmp_path) == {}


def test_prior_round_skips_unparsed_and_nulls(tmp_path):
    _write(tmp_path, "BENCH_r09.json", 0.1, {}, parsed=False)
    _write(
        tmp_path, "BENCH_r08.json", 0.1, {"q01": 1.0, "q02": None}
    )
    got = bench._prior_round_queries(0.1, root=tmp_path)
    # the unparsed r09 falls through to r08; null cells are dropped
    assert got == {"q01": 1.0}
    (tmp_path / "BENCH_r07.json").write_text("not json")
    assert bench._prior_round_queries(0.1, root=tmp_path) == {"q01": 1.0}


def test_flag_rule_and_ordering():
    """bench._flag_regressions: >25% AND >0.5 s over prior;
    adjudication order = largest absolute regression first; NaN
    (all-passes-errored) and no-prior cells can never flag."""
    prior = {"q01": 1.0, "q02": 4.0, "q03": 0.2, "q04": 10.0, "q06": 1.0}
    timings = {
        "q01_a": 1.3,           # +0.3 s: fails the absolute bar
        "q02_b": 5.2,           # +1.2 s, 1.3x: flags
        "q03_c": 0.9,           # +0.7 s, 4.5x: flags
        "q04_d": 11.0,          # 1.1x: fails the ratio bar
        "q05_e": 9.9,           # no prior: cannot flag
        "q06_f": float("nan"),  # errored every pass: cannot flag
    }
    assert bench._flag_regressions(timings, prior) == ["q02_b", "q03_c"]
    assert bench._flag_regressions({}, prior) == []
    assert bench._flag_regressions(timings, {}) == []
