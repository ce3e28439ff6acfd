"""Second extension batch: windowed analytics, skew-safe aggregation,
exact moment statistics, document chunking, interval joins, and
sketch aggregates — operators a 100 TB training-data pipeline leans
on daily, each expressed so the DuckDB oracle reproduces it exactly.

Determinism notes (registry conventions apply):
- Rolling sums/deciles ride on exact DECIMAL accumulation; doubles
  only at the output boundary.
- q60 derives corr/stddev from exact decimal moment sums with an
  explicit, identically-parenthesized double formula in both engines
  (never the engines' own one-pass corr(), whose accumulation order
  is partition-dependent).
- q57 (HLL sketch) runs the repo's own engine-portable HLL
  (operators/sketches.py: md5-derived hash, 32 registers, integer
  estimator) so the sketch itself is DuckDB-oracle-checked exactly;
  native ``approx_count_distinct`` is the production alternative at
  scale, covered by a pytest error-bound against the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.rangejoin import window_count
from ..sources.io import read_table
from .registry import Query


# ---------------------------------------------------------------------------
# q55 — 7-day rolling revenue (RANGE window over day numbers)
# ---------------------------------------------------------------------------

def q55_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d")
    ).withColumn(
        "day_no", F.datediff(F.col("day"), F.lit("1992-01-01").cast("date"))
    )
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("day_no")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        "day",
        F.col("rev_d").cast("double").alias("day_rev"),
        F.sum("rev_d").over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("n_days_7d"),
    )


Q55_SQL = """
WITH daily AS (
  SELECT o_orderpriority,
         CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d,
         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no
  FROM orders GROUP BY 1, 2, 4)
SELECT o_orderpriority, day,
       CAST(rev_d AS DOUBLE) AS day_rev,
       CAST(SUM(rev_d) OVER (
         PARTITION BY o_orderpriority ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d,
       COUNT(*) OVER (
         PARTITION BY o_orderpriority ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days_7d
FROM daily
"""


# ---------------------------------------------------------------------------
# q56 — decile stats (ntile over a total order)
# ---------------------------------------------------------------------------

def q56_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("decile", F.ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


Q56_SQL = """
SELECT o_orderpriority, decile, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT o_orderpriority, o_totalprice,
         ntile(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q57 — portable-HLL approx distinct beside the exact count, fully
# oracle-checked (operators/sketches.py implements the sketch with
# engine-portable integer math; the native HLL++ alternative is
# covered by a pytest error-bound instead)
# ---------------------------------------------------------------------------

def q57_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_approx_distinct

    orders = read_table(spark, sf_dir, "orders")
    hll = hll_approx_distinct(
        orders, ["o_orderpriority"], "o_custkey", out_col="approx_custs"
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    return hll.join(exact, "o_orderpriority")


def _q57_sql() -> str:
    from ..operators.sketches import hll_sql

    inner = hll_sql("orders", "o_orderpriority", "o_custkey", "approx_custs")
    return f"""
WITH hll AS ({inner}),
ex AS (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_custs
       FROM orders GROUP BY 1)
SELECT o_orderpriority, approx_custs, exact_custs
FROM hll JOIN ex USING (o_orderpriority)
"""


# ---------------------------------------------------------------------------
# q58 — corpus heavy hitters (document frequency ≥ 5%)
# ---------------------------------------------------------------------------

def q58_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    dfc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # total is one row — broadcast; threshold as exact integer algebra
    return (
        dfc.crossJoin(F.broadcast(total))
        .filter(F.col("df") * 20 >= F.col("n_docs"))
        .select("tok", "df")
    )


Q58_SQL = r"""
WITH tok AS (
  SELECT unnest(list_distinct(string_split_regex(text, '\s+'))) AS tok
  FROM documents),
dfc AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tok, df FROM dfc, n WHERE df * 20 >= n_docs
"""


# ---------------------------------------------------------------------------
# q59 — salted two-phase aggregation (skew-safe; result ≡ plain GROUP BY)
# ---------------------------------------------------------------------------

def q59_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum per supplier via an explicit salt: shuffle 1 spreads any
    hot key over 16 sub-keys, shuffle 2 combines 16 tiny partials.
    Decimal partials make the two-phase result bit-identical to the
    direct aggregation (the oracle), so the skew-mitigation shape is
    verified, not just trusted. (AQE skew handling covers sort-merge
    joins; pre-aggregation salting is the portable recipe for skewed
    groupBys and is what you'd reach for on a 100 TB hot-key table.)"""
    li = read_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_suppkey", "_salt").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
        F.count(F.lit(1)).alias("pn"),
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("pq").cast("double").alias("sum_qty"),
        F.sum("pn").alias("n_items"),
    )


Q59_SQL = """
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_items
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q60 — correlation / stddev from exact decimal moments
# ---------------------------------------------------------------------------

def q60_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sx2"),
        F.sum(y * y).alias("sy2"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy2 = F.col("sy2").cast("double")
    corr = (n * sxy - sx * sy) / F.sqrt(
        (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    )
    std_x = F.sqrt((n * sx2 - sx * sx) / (n * (n - F.lit(1.0))))
    return m.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 2).alias("mean_qty"),
        F.round(std_x, 4).alias("std_qty"),
        F.round(corr, 6).alias("corr_qty_price"),
    )


Q60_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dsx,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dsy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS dsxy,
         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS dsx2,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS dsy2
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, n,
       ROUND(CAST(dsx AS DOUBLE) / CAST(n AS DOUBLE), 2) AS mean_qty,
       ROUND(SQRT((CAST(n AS DOUBLE) * CAST(dsx2 AS DOUBLE)
                   - CAST(dsx AS DOUBLE) * CAST(dsx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 4) AS std_qty,
       ROUND((CAST(n AS DOUBLE) * CAST(dsxy AS DOUBLE)
              - CAST(dsx AS DOUBLE) * CAST(dsy AS DOUBLE))
             / SQRT((CAST(n AS DOUBLE) * CAST(dsx2 AS DOUBLE)
                     - CAST(dsx AS DOUBLE) * CAST(dsx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(dsy2 AS DOUBLE)
                       - CAST(dsy AS DOUBLE) * CAST(dsy AS DOUBLE))), 6) AS corr_qty_price
FROM m
"""


# ---------------------------------------------------------------------------
# q61 — sliding-window document chunking (RAG ingestion shape)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def q61_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks per document (size 32, stride 24) —
    the standard embed-ingestion splitter, as pure array algebra: one
    tokenize, per-row ``sequence`` of chunk starts, explode + slice.
    Map-only (no shuffle); chunk ids are derived, not assigned."""
    docs = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    return (
        docs.select("doc_id", toks.alias("_toks"), F.explode(starts).alias("_s"))
        .select(
            "doc_id",
            (F.col("_s") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_s") + 1, CHUNK_SIZE), " "
            ).alias("chunk_text"),
            F.size(F.slice(F.col("_toks"), F.col("_s") + 1, CHUNK_SIZE)).alias(
                "n_chunk_tokens"
            ),
        )
    )


Q61_SQL = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
s AS (
  SELECT doc_id, toks, unnest(range(0, greatest(len(toks), 1), {CHUNK_STRIDE})) AS st
  FROM t)
SELECT doc_id,
       CAST(st // {CHUNK_STRIDE} AS INT) AS chunk_id,
       array_to_string(toks[st + 1 : st + {CHUNK_SIZE}], ' ') AS chunk_text,
       CAST(len(toks[st + 1 : st + {CHUNK_SIZE}]) AS INT) AS n_chunk_tokens
FROM s
"""


# ---------------------------------------------------------------------------
# q62 — interval join: clicks in the hour before each purchase
# ---------------------------------------------------------------------------

def q62_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    return window_count(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="cts",
        lower_s=-3600, upper_s=0, count_col="n_clicks_1h",
        left_key="event_id",
    ).select("event_id", "user_id", "n_clicks_1h")


Q62_SQL = """
SELECT p.event_id, p.user_id, COUNT(c.user_id) AS n_clicks_1h
FROM (SELECT event_id, user_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, epoch_us(ts) AS c_us
           FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.c_us >= p.p_us - 3600000000 AND c.c_us < p.p_us
GROUP BY 1, 2
"""


QUERIES = [
    Query("q55_rolling_revenue", q55_rolling_revenue, Q55_SQL,
          ("A3", "O1"), "7-day rolling revenue via RANGE window"),
    Query("q56_decile_stats", q56_decile_stats, Q56_SQL,
          ("A3", "O2"), "ntile deciles over a total order"),
    Query("q57_approx_distinct", q57_approx_distinct, _q57_sql(),
          ("A4",), "portable-HLL approx distinct beside exact (oracled)"),
    Query("q58_heavy_hitters", q58_heavy_hitters, Q58_SQL,
          ("A10", "F6"), "document-frequency heavy hitters"),
    Query("q59_salted_agg", q59_salted_agg, Q59_SQL,
          ("A1", "A3"), "salted two-phase aggregation (skew-safe)"),
    Query("q60_corr_moments", q60_corr_moments, Q60_SQL,
          ("A3",), "corr/stddev from exact decimal moments"),
    Query("q61_chunk_docs", q61_chunk_docs, Q61_SQL,
          ("multimodal", "V1"), "sliding-window document chunking"),
    Query("q62_window_join", q62_window_join, Q62_SQL,
          ("J3", "streaming"), "bucketed interval join (clicks before purchase)"),
]


# ---------------------------------------------------------------------------
# q108 — windowed approx-distinct (the oracle-checked batch half of
# streaming.windowed_distinct_stream, r8's windowed-HLL twin): hourly
# event windows, portable-HLL distinct users per window NEXT TO the
# exact count, plus the window row count. Same buckets as
# F.window("ts", "1 hour") (hour windows align to epoch, so
# date_trunc('hour') is the identical bucketing — asserted by
# tests/test_extended_ops.py). The production form uses native
# approx_count_distinct (HLL++); the portable sketch is what makes
# the per-window rollup DuckDB-oracle-checkable bit for bit.
# ---------------------------------------------------------------------------

def q108_windowed_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_approx_distinct

    ev = read_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "user_id"
    )
    hll = hll_approx_distinct(
        ev, ["window_start"], "user_id", out_col="n_users_approx"
    )
    exact = ev.groupBy("window_start").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return hll.join(exact, "window_start")


def _q108_sql() -> str:
    from ..operators.sketches import hll_sql

    inner = hll_sql("we", "window_start", "user_id", "n_users_approx")
    return f"""
WITH we AS (SELECT date_trunc('hour', ts) AS window_start, user_id
            FROM events),
ex AS (SELECT window_start,
              COUNT(DISTINCT user_id) AS n_users_exact,
              COUNT(*) AS n_events
       FROM we GROUP BY 1),
hll AS ({inner})
SELECT window_start, n_users_approx, n_users_exact, n_events
FROM hll JOIN ex USING (window_start)
"""


# ---------------------------------------------------------------------------
# q109 — HDR-histogram quantiles (the 100-TB percentile path): exact
# `percentile()` (q52) sorts per group; the native approximations
# (GK / t-digest) cannot be oracle-checked across engines. The
# portable HDR sketch (operators/sketches.py) buckets o_totalprice
# cents on a log scale with integer arithmetic only, so the p50/p90/
# p99 answer buckets hash-match DuckDB bit for bit, per priority,
# next to the exact percentile for the error story.
# ---------------------------------------------------------------------------

_Q109_QS = [5000, 9000, 9900]


def q109_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hdr_quantiles

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        # exact integer cents: totals have 2 decimals by construction
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    return hdr_quantiles(
        orders, "cents", ["o_orderpriority"], _Q109_QS
    )


def _q109_sql() -> str:
    from ..operators.sketches import hdr_quantile_sql

    inner = hdr_quantile_sql(
        "(SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)"
        " AS cents FROM orders)",
        "cents",
        "o_orderpriority",
        _Q109_QS,
    )
    return inner


# ---------------------------------------------------------------------------
# q110 — HLL shard union (the sketch MERGE as a query): per-day
# register tables built independently per (event_type, day), folded
# by MAX into per-type registers, then finalized — the exact shape a
# 1000-executor rollup uses (daily partitions keep standing register
# tables; a global distinct never revisits old rows). The oracle
# estimates the unsharded input directly, so a hash match IS the
# merge ≡ refit algebra, end to end, small-range correction included.
# ---------------------------------------------------------------------------

def q110_hll_shard_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import (
        hll_estimate_registers,
        hll_merge_registers,
        hll_registers,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    shard_regs = hll_registers(ev, ["event_type", "day"], "user_id")
    est = hll_estimate_registers(
        hll_merge_registers(shard_regs, ["event_type"]),
        ["event_type"],
        out_col="n_users_approx",
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.countDistinct("day").alias("n_shards"),
    )
    return est.join(exact, "event_type")


def _q110_sql() -> str:
    from ..operators.sketches import hll_sql

    inner = hll_sql("events", "event_type", "user_id", "n_users_approx")
    return f"""
WITH hll AS ({inner}),
ex AS (SELECT event_type,
              COUNT(DISTINCT user_id) AS n_users_exact,
              COUNT(DISTINCT CAST(ts AS DATE)) AS n_shards
       FROM events GROUP BY 1)
SELECT event_type, n_users_approx, n_users_exact, n_shards
FROM hll JOIN ex USING (event_type)
"""


# ---------------------------------------------------------------------------
# q113 — the streaming tier surfaced as a driver-oracled query
# (VERDICT r10 #5): replay the events table as three one-file
# micro-batch deliveries through hll_register_stream's REAL
# incremental fold (availableNow trigger, foreachBatch, sink-first
# commit, eager-checkpointed standing state — streaming/pipeline.py),
# then finalize the standing registers. Merge ≡ refit is the
# sketch's pinned algebra, so the oracle estimates the UNSHARDED
# table directly — a hash match proves the streaming fold's final
# state equals the batch refit end to end.
# ---------------------------------------------------------------------------

def q113_hll_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.sketches import hll_estimate_registers
    from ..streaming.pipeline import hll_register_stream

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n_shards = 3
    d = tempfile.mkdtemp(prefix="q113_hll_replay_")
    # MICROS, not the INT96 default: INT96 footers read back as
    # nanoseconds under pyarrow, which would flip the stream reader's
    # ns-vs-µs footer detection onto the raw-long path and fail the
    # scan. Save/restore is safe here because the writes are EAGER.
    _ts_key = "spark.sql.parquet.outputTimestampType"
    _ts_prev = spark.conf.get(_ts_key, None)
    spark.conf.set(_ts_key, "TIMESTAMP_MICROS")
    try:
        try:
            # one FILE per delivery: maxFilesPerTrigger=1 makes file
            # count == micro-batch count (order is irrelevant — the
            # max-merge is commutative and merge ≡ refit). ONE write
            # job stages all shards (r14, guide §6): hash-partition
            # by the shard key, then partitionBy writes exactly one
            # part file per shard value (each value lives in exactly
            # one task), where the r13 loop paid one full scan +
            # filter + write per shard. Shards are written
            # EXECUTOR-SIDE; the driver only renames finished files —
            # events rows never cross the driver, so the replay setup
            # scales with the cluster, not driver memory.
            stage = f"{d}/stage"
            (
                ev.withColumn("_shard", F.pmod("event_id", n_shards))
                .repartition(n_shards, "_shard")
                .write.partitionBy("_shard")
                .parquet(stage)
            )
            for name in os.listdir(stage):
                if not name.startswith("_shard="):
                    continue
                i = int(name.split("=", 1)[1])
                part = next(
                    p for p in os.listdir(f"{stage}/{name}")
                    if p.startswith("part-") and p.endswith(".parquet")
                )
                os.rename(
                    f"{stage}/{name}/{part}", f"{d}/shard-{i}.parquet"
                )
            shutil.rmtree(stage, ignore_errors=True)
        finally:
            if _ts_prev is None:
                spark.conf.unset(_ts_key)
            else:
                spark.conf.set(_ts_key, _ts_prev)
        q = hll_register_stream(spark, d, ["event_type"], None)
        try:
            # fail LOUDLY on a stalled drain: returning the standing
            # state after a False timeout would silently hand back a
            # partially-folded frame with a correct-looking schema
            if not q.awaitTermination(600):
                raise RuntimeError(
                    "q113: streaming fold did not drain within 600 s"
                )
        finally:
            # stop before the outer finally deletes the input shards
            # (harmless after a clean availableNow drain; essential on
            # the timeout path — a still-running query must not race
            # the rmtree)
            q.stop()
        regs = q.hllRegisterState["regs"]
    finally:
        # the standing state is an EAGER localCheckpoint — the input
        # shards are dead weight once the stream drains
        shutil.rmtree(d, ignore_errors=True)
    est = hll_estimate_registers(
        regs, ["event_type"], out_col="n_users_approx"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_users_approx", "n_users_exact"
    )


def _q113_sql() -> str:
    from ..operators.sketches import hll_sql

    inner = hll_sql("events", "event_type", "user_id", "n_users_approx")
    return f"""
WITH hll AS ({inner}),
ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact
       FROM events GROUP BY 1)
SELECT event_type, n_users_approx, n_users_exact
FROM hll JOIN ex USING (event_type)
"""


# ---------------------------------------------------------------------------
# q114 — the DSIR fit-once/score-many SERVING loop surfaced as a
# driver-oracled query (VERDICT r12 #2, the q113 pattern): the count
# model is fit ONCE in batch on the doc_id<250 slice (exactly q102's
# serving split), then the corpus is replayed as three one-file
# micro-batch deliveries through dsir_score_stream's REAL streaming
# drive (availableNow trigger, foreachBatch, stream-static model
# join) — each delivery is scored and appended to the sink
# EXECUTOR-SIDE (foreachBatch df.write; no rows ever cross the
# driver). Scoring is per-doc given a fixed model, so the union of
# per-delivery scores IS the batch serving answer — the oracle is
# q102's SQL verbatim, and a hash match proves the streamed drive
# end-to-end equals the batch refit, neutral-term path included.
# ---------------------------------------------------------------------------

def q114_dsir_stream_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..cache import release_frame
    from ..operators.curation import dsir_model
    from ..streaming.pipeline import dsir_score_stream

    docs = read_table(spark, sf_dir, "documents")
    model = dsir_model(
        docs.filter(F.col("doc_id") < 250), "text", "source", "src1", n=2
    )
    n_shards = 3
    d = tempfile.mkdtemp(prefix="q114_dsir_stream_")
    try:
        in_dir = f"{d}/in"
        out_dir = f"{d}/out"
        os.mkdir(in_dir)
        # one FILE per delivery (maxFilesPerTrigger=1 in the stream
        # makes file count == micro-batch count), staged by ONE write
        # job exactly like q113's replay shards (r14, guide §6):
        # hash-partition by the shard key, partitionBy emits one part
        # file per shard value, the driver only renames finished
        # files — document text never crosses the driver.
        stage = f"{in_dir}/stage"
        (
            docs.withColumn("_shard", F.pmod("doc_id", n_shards))
            .repartition(n_shards, "_shard")
            .write.partitionBy("_shard")
            .parquet(stage)
        )
        for name in os.listdir(stage):
            if not name.startswith("_shard="):
                continue
            i = int(name.split("=", 1)[1])
            part = next(
                p for p in os.listdir(f"{stage}/{name}")
                if p.startswith("part-") and p.endswith(".parquet")
            )
            os.rename(
                f"{stage}/{name}/{part}", f"{in_dir}/shard-{i}.parquet"
            )
        shutil.rmtree(stage, ignore_errors=True)

        def _sink(scored: DataFrame, batch_id: int) -> None:
            # append-mode parquet from inside foreachBatch: the
            # scored rows flow executor→sink files directly
            scored.write.mode("append").parquet(out_dir)

        q = dsir_score_stream(spark, in_dir, model, _sink)
        try:
            # fail LOUDLY on a stalled drain (q113 rationale: a False
            # timeout would silently score a delivery prefix)
            if not q.awaitTermination(600):
                raise RuntimeError(
                    "q114: streaming scorer did not drain within 600 s"
                )
        finally:
            q.stop()
            # the stream pinned the model for its per-batch joins
            release_frame(q.dsirModelHandle)
        # eager checkpoint so the result survives the rmtree below
        # (3 small columns per doc — the text stayed in the shards)
        return spark.read.parquet(out_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def _q114_sql() -> str:
    from .curation import _q102_sql

    return _q102_sql()


# q108/q109 are r9 TAIL additions (pulled into the r10 window per the
# COVERAGE.md invariant); q110 is the r10 TAIL addition (pinned right
# after the five bumps in the r11 rotation note, registry.py); q113
# is the r11 TAIL addition (enters the r12 window per the rotation
# note); q114 is the r13 TAIL addition (pinned right after the nine
# bumps in the r14 rotation note).
TAIL_QUERIES = [
    Query("q108_windowed_hll", q108_windowed_hll, _q108_sql(),
          ("A4", "streaming"),
          "windowed approx-distinct: per-hour portable HLL + exact"),
    Query("q109_hdr_quantiles", q109_hdr_quantiles, _q109_sql(),
          ("A3", "O2"),
          "HDR-histogram quantiles: portable log-bucket percentile sketch"),
    Query("q110_hll_shard_union", q110_hll_shard_union, _q110_sql(),
          ("A4",),
          "HLL shard union: per-day registers max-merged, then finalized"),
    Query("q113_hll_stream_replay", q113_hll_stream_replay, _q113_sql(),
          ("A4", "streaming"),
          "streaming HLL fold replayed over 3 micro-batch deliveries, "
          "finalized == batch refit"),
    Query("q114_dsir_stream_scoring", q114_dsir_stream_scoring, _q114_sql(),
          ("streaming",),
          "DSIR fit-once model serving 3 streamed deliveries, "
          "union of scores == batch serving split"),
]
