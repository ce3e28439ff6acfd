"""As-of join — for each left row, the latest right row at-or-before
its timestamp, per key.

Not in the reference (SURVEY §2.3 notes no range/as-of joins exist
there), but a first-class operator for time-series training data.
Spark has no native ASOF JOIN, so this is the standard union-tag
composition (SURVEY's "custom operator" tier (a): composition of
existing DataFrame ops — no UDF):

1. tag left (probe) and right (reference) rows, union them,
2. one window pass per key ordered by (ts, tag): ``last(right value,
   ignorenulls)`` over the preceding frame = the as-of match,
3. keep probe rows.

Cost: ONE shuffle by key (the window), vs. the naive range-join
(t_left >= t_right) which is a cartesian blowup per key. Ties: a
right row at exactly the probe ts matches (tag orders right rows
first at equal ts) — the same semantics as DuckDB's ASOF JOIN ON
l.ts >= r.ts, which oracles this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """left + (latest right ``value_cols`` with right_ts <= left_ts),
    nulls where no right row precedes."""
    lt = left.withColumn("_tag", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            on,
            F.col(right_ts).alias("_ts"),
            *[F.col(c) for c in value_cols],
        )
        # a NULL-timestamp right row can never be anyone's predecessor
        # (DuckDB ASOF: l.ts >= r.ts is never true for NULL r.ts) —
        # unfiltered it sorts nulls-first and becomes the match for
        # probes with no real predecessor. Likewise a NULL KEY: the
        # window's partitionBy groups NULL keys together, but an
        # equality join never matches NULL = NULL — probe rows with a
        # NULL key must come back with NULL values, not each other's
        .filter(F.col("_ts").isNotNull() & F.col(on).isNotNull())
        .withColumn("_tag", F.lit(0))
    )
    probe_cols = [c for c in lt.columns if c not in ("_tag", "_ts")]
    unioned = lt.select(
        *probe_cols,
        "_tag",
        "_ts",
        *[F.lit(None).cast(rt.schema[c].dataType).alias(c) for c in value_cols],
    ).unionByName(
        rt.select(
            on,
            *[
                F.lit(None).cast(lt.schema[c].dataType).alias(c)
                for c in probe_cols
                if c != on
            ],
            "_tag",
            "_ts",
            *value_cols,
        )
    )
    # final tie-breaker: among right rows sharing (key, ts), order by
    # the value columns so the surviving match is deterministic under
    # any partitioning (greatest value wins); left rows sort after all
    # same-ts right rows via _tag regardless
    w = (
        W.partitionBy(on)
        .orderBy("_ts", "_tag", *[F.asc_nulls_first(c) for c in value_cols])
        .rowsBetween(W.unboundedPreceding, 0)
    )
    # carry the matched right row ATOMICALLY (one struct, NULL for
    # probe rows) — per-column last() could stitch values from
    # different right rows when one of them holds a NULL
    vstruct = F.when(
        F.col("_tag") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    matched = unioned.select(
        *probe_cols,
        "_tag",
        F.last(vstruct, ignorenulls=True).over(w).alias("_v"),
    )
    return (
        matched.filter(F.col("_tag") == 1)
        .select(
            *probe_cols,
            *[F.col("_v").getField(c).alias(c) for c in value_cols],
        )
    )
