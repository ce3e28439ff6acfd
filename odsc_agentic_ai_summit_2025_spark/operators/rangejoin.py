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

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _nullsafe_cond(left_alias: str, right_alias: str, cols: list[str]) -> Column:
    """AND of ``<=>`` over ``cols`` — an EQUI condition (Catalyst's
    ExtractEquiJoinKeys accepts EqualNullSafe), so the join stays a
    hash/sort-merge join, never a nested loop. NULL-safe equality is
    what makes whole-ROW identity sound: plain ``=`` never matches a
    NULL-bearing row, which would resurrect matched rows in an
    anti-join."""
    return functools.reduce(
        operator.and_,
        [
            F.col(f"{left_alias}.{c}").eqNullSafe(F.col(f"{right_alias}.{c}"))
            for c in cols
        ],
    )


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
    nulls). Row identity for the left-preserving path is either the
    caller's unique ``left_key`` (the cheap path — narrow anti-join
    key; use it at 100 TB) or, when no key exists, NULL-safe
    whole-row semantics: a left row is unmatched iff its full value
    tuple produced no match, so duplicates rise and fall together
    (they have identical windows) and NULL-bearing rows neither drop
    nor double. Both paths are deterministic under recomputation —
    no surrogate ids, no reliance on cached partitions surviving
    executor loss. Timestamps are compared at microsecond precision
    (exact integer arithmetic — no double epoch round-trip).
    """
    # round, not truncate: 0.7 * 1e6 is 699999.999... in binary and
    # int() would shift the window bound by a microsecond
    lower_us = round(lower_s * _US)
    upper_us = round(upper_s * _US)
    if upper_us <= lower_us:
        raise ValueError("upper_s must be > lower_s")
    w = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lo = l_us + F.lit(lower_us)
    hi = l_us + F.lit(upper_us) - F.lit(1)
    lhs = left.withColumn("_lo_us", lo).withColumn(
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
    # left join: re-attach unmatched left rows via anti-join on the
    # caller's key when given, else NULL-safe anti-join on the full
    # row tuple (duplicates match or miss together — same window)
    matched = joined.drop("_lo_us", "_bucket", "_r_us")
    right_cols = [c for c in right.columns if c != on]
    if left_key is not None:
        unmatched = left.join(
            matched.select(left_key).distinct(), on=left_key, how="left_anti"
        )
    else:
        seen = matched.select(*left.columns).distinct()
        unmatched = left.alias("_ij_l").join(
            seen.alias("_ij_s"),
            _nullsafe_cond("_ij_l", "_ij_s", left.columns),
            how="left_anti",
        )
    for c in right_cols:
        unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched)


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

    With ``left_key`` (a unique left column — use it at 100 TB) the
    inner interval join is aggregated on that key and the counts join
    back by it: one narrow-key shuffle. Without a key, row identity is
    the NULL-safe value tuple: count per DISTINCT left row, then fan
    the count back with a ``<=>`` equi-join — duplicate left rows have
    identical windows so each duplicate keeps its own (equal) count,
    and NULL-bearing rows keep theirs. Both paths are deterministic
    under partition recomputation (no surrogate ids, no cache).
    """
    if count_col in left.columns:
        raise ValueError(f"count_col {count_col!r} collides with a left column")
    probe = right.select(on, F.col(right_ts).alias("_rts"))
    if left_key is not None:
        hits = interval_join(
            left.select(left_key, on, left_ts),
            probe,
            on=on,
            left_ts=left_ts,
            right_ts="_rts",
            lower_s=lower_s,
            upper_s=upper_s,
            how="inner",
        )
        counts = hits.groupBy(left_key).agg(F.count(F.lit(1)).alias(count_col))
        return left.join(counts, on=left_key, how="left").withColumn(
            count_col, F.coalesce(F.col(count_col), F.lit(0))
        )
    ldist = left.distinct()
    hits = interval_join(
        ldist,
        probe,
        on=on,
        left_ts=left_ts,
        right_ts="_rts",
        lower_s=lower_s,
        upper_s=upper_s,
        how="inner",
    )
    counts = hits.groupBy(*[F.col(c) for c in left.columns]).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    out = left.alias("_wc_l").join(
        counts.alias("_wc_c"),
        _nullsafe_cond("_wc_l", "_wc_c", left.columns),
        how="left",
    )
    return out.select(
        *[F.col(f"_wc_l.{c}") for c in left.columns],
        F.coalesce(F.col(f"_wc_c.{count_col}"), F.lit(0)).alias(count_col),
    )
