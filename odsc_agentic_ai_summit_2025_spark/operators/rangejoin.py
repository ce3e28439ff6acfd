"""Bucketed interval (range) join — the scale path for time-window
joins.

The reference has no temporal join (its only joins are FK equi-joins,
src/build_graph.py), but a training-data/event pipeline needs "rows of
R within a time window of each row of L". Naively that is a non-equi
join: Spark plans it as a broadcast-nested-loop or a cartesian per
user — O(|L|·|R|) comparisons within each key.

The bucketed plan: with window [ts+lower, ts+upper) of length
``w = upper - lower``, quantize both sides to w-wide epoch buckets.
The right row's bucket is fixed; the left row's window overlaps AT
MOST TWO consecutive buckets (its length equals the bucket width), so
each left row is expanded to ≤ 2 (key, bucket) probes and the join is
a plain EQUI hash join on (key, bucket) — shuffle O(|L| + |R|),
comparisons only within bucket-aligned candidates. The exact window
predicate is applied after the equi-match as a codegen filter.

This is the standard stream-stream interval-join decomposition
(Structured Streaming does the same internally for
``join(..., "l.ts BETWEEN r.ts - x AND r.ts + y")``) expressed as a
batch DataFrame program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _with_row_key(
    left: DataFrame, left_key: str | None
) -> tuple[DataFrame, str, bool]:
    """Row identity for left-preserving variants. Row identity must
    be a KEY, not the row's values: value-keyed anti-joins/group-bys
    drop NULL-bearing rows (NULL never equi-matches) and merge
    duplicate rows. Callers pass their unique key (``left_key``) —
    free; otherwise a surrogate ``monotonically_increasing_id`` is
    attached and the keyed frame is cached, because the id is only
    stable across the plan's two consumers if the input isn't
    recomputed with a different row→partition placement. At 100 TB
    pass a real key."""
    if left_key is not None:
        return left, left_key, False
    keyed = left.withColumn("_lid", F.monotonically_increasing_id()).cache()
    return keyed, "_lid", True


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
    left_key: str | None = None,
) -> DataFrame:
    """Join rows of ``right`` whose ``right_ts`` falls in
    ``[left_ts + lower_s, left_ts + upper_s)`` for each left row.

    ``how`` is ``inner`` or ``left`` (unmatched left rows kept with
    nulls; pass ``left_key`` — a unique left column — so row identity
    survives NULLs and duplicates). Timestamps are compared at
    microsecond precision (exact integer arithmetic — no double
    epoch round-trip).
    """
    lower_us = int(lower_s * _US)
    upper_us = int(upper_s * _US)
    if upper_us <= lower_us:
        raise ValueError("upper_s must be > lower_s")
    w = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    keyed, lk, added_key = (
        _with_row_key(left, left_key) if how == "left" else (left, None, False)
    )

    lo = l_us + F.lit(lower_us)
    hi = l_us + F.lit(upper_us) - F.lit(1)
    lhs = keyed.withColumn("_lo_us", lo).withColumn(
        "_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(lo / F.lit(w)).cast("long"),
                    F.floor(hi / F.lit(w)).cast("long"),
                )
            )
        ),
    )
    rhs = right.withColumn("_r_us", r_us).withColumn(
        "_bucket", F.floor(r_us / F.lit(w)).cast("long")
    )
    cond = (
        (F.col("_r_us") >= F.col("_lo_us"))
        & (F.col("_r_us") < F.col("_lo_us") + F.lit(w))
    )
    joined = lhs.join(rhs, on=[on, "_bucket"], how="inner").filter(cond)
    if how == "inner":
        return joined.drop("_lo_us", "_bucket", "_r_us")
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    # left join: re-attach unmatched left rows — anti-join on the ROW
    # KEY (an anti-join on all columns would re-emit matched rows that
    # contain NULLs and collapse duplicate rows)
    matched = joined.drop("_lo_us", "_bucket", "_r_us")
    right_cols = [c for c in right.columns if c != on]
    unmatched = keyed.join(
        matched.select(lk).distinct(), on=lk, how="left_anti"
    )
    for c in right_cols:
        unmatched = unmatched.withColumn(c, F.lit(None))
    out = matched.unionByName(unmatched)
    return out.drop("_lid") if added_key else out


def window_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    count_col: str = "n_in_window",
    left_key: str | None = None,
) -> DataFrame:
    """Per left row: COUNT of right rows inside its window (0 kept).

    Aggregates the inner interval join on the left ROW KEY and joins
    the counts back by that key, so zero-match rows survive, NULL-
    bearing rows keep their counts, and duplicate left rows each keep
    their own count (grouping on the row's values would merge
    duplicates and fan a doubled count back to both). Pass
    ``left_key`` (a unique left column) to avoid the surrogate-key
    cache.
    """
    keyed, lk, added_key = _with_row_key(left, left_key)
    probe = right.select(on, right_ts)
    hits = interval_join(
        keyed.select(lk, on, left_ts),
        probe.withColumnRenamed(right_ts, "_rts"),
        on=on,
        left_ts=left_ts,
        right_ts="_rts",
        lower_s=lower_s,
        upper_s=upper_s,
        how="inner",
    )
    counts = hits.groupBy(lk).agg(F.count(F.lit(1)).alias(count_col))
    out = keyed.join(counts, on=lk, how="left").withColumn(
        count_col, F.coalesce(F.col(count_col), F.lit(0))
    )
    return out.drop("_lid") if added_key else out
