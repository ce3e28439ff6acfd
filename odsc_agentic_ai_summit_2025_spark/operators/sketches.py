"""Engine-portable HyperLogLog.

Spark's native ``approx_count_distinct`` (HyperLogLog++) and DuckDB's
``approx_count_distinct`` use different internal hashes and bias
tables, so a native sketch can never be oracle-checked across
engines. This module implements HLL with every step explicit and
deterministic — md5-derived 60-bit hash, 32 registers, integer-only
estimator — so the *same* algorithm runs as a DataFrame program in
Spark and as plain SQL in DuckDB, register-for-register and
bit-for-bit.

Algorithm (classic Flajolet HLL, raw estimator):

- ``h``     = first 15 hex digits of ``md5(cast(value as string))``
              parsed as a 60-bit integer (cryptographic mixing, no
              engine-native hash involved),
- bucket    = top ``p=5`` bits (m = 32 registers),
- ``w``     = low 55 bits; rank = leading-zero count of w + 1,
              clamped at 50 so the power-of-two terms below stay in
              int64 (the clamp fires with probability 2⁻⁵⁰ per row),
- register  = max rank per (group, bucket),
- estimate  = ``C // Σ 2^(50-reg)`` with missing buckets contributing
              ``2^50`` — where ``C = floor(α₃₂ · m² · 2⁵⁰)`` and
              ``α₃₂ = 0.697``. The sum is an exact int64 (≤ 32·2⁵⁰ =
              2⁵⁵) and the one division is integer division, so the
              result is identical in any engine: no floats, no logs,
              no partition-order dependence anywhere.

Small-cardinality correction (r10): classic linear counting —
``m·ln(m/V)`` with ``V`` = number of untouched registers — normally
needs ``ln`` (libm results differ across engines by ulps), but with
m = 32 the estimator has only 31 possible inputs, so it is embedded
as the precomputed integer table ``HLL_LC`` (``round(32·ln(32/V))``,
checked ≥0.02 away from every rounding boundary) and rendered as the
same literal in both engines. The correction applies, per the
standard rule, when the raw estimate ≤ 5m/2 = 80 AND V > 0 — an
integer-decidable condition — fixing the documented low-cardinality
bias of the raw estimator (which reads ~27 for n=5). Above that the
raw estimator's ~1.04/√32 ≈ 18 % relative error applies — this
operator is the portable *correctness* tier; at scale, where no
oracle rides along, Spark's native ``approx_count_distinct`` (also
algebraic, tighter rsd) is the drop-in production alternative.

Scale shape: the sketch is algebraic — ``groupBy(group, bucket).
max(rank)`` partial-aggregates map-side, so each task ships at most
``groups × 32`` registers into the shuffle regardless of row count;
register tables merge by ``max`` exactly like any HLL union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 5
HLL_M = 1 << HLL_P  # 32 registers
HLL_W_BITS = 60 - HLL_P  # 55 low bits feed the rank
HLL_W_MASK = (1 << HLL_W_BITS) - 1
HLL_RANK_CAP = 50
HLL_SCALE = 1 << HLL_RANK_CAP  # 2^50, the zero-register term
# floor(alpha_32 * m^2 * 2^50), alpha_32 = 0.697
HLL_C = 803586288710972288
# linear-counting table: HLL_LC[V-1] = round(32 * ln(32 / V)) for
# V = 1..31 untouched registers — hardcoded so both engine renderings
# embed the exact same integers (no runtime libm anywhere)
HLL_LC = (
    111, 89, 76, 67, 59, 54, 49, 44, 41, 37, 34, 31, 29, 26, 24, 22,
    20, 18, 17, 15, 13, 12, 11, 9, 8, 7, 5, 4, 3, 2, 1,
)
HLL_LC_MAX_RAW = 5 * HLL_M // 2  # apply correction when raw est ≤ 80


def hll_approx_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str = "approx"
) -> DataFrame:
    """Per-group portable-HLL distinct estimate (see module doc)."""
    return hll_estimate_registers(
        hll_registers(df, group_cols, value_col), group_cols, out_col
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The sketch STATE: per-group register table ``[*group_cols,
    _bucket, _reg]`` — the mergeable half of the HLL. Register tables
    fit on disjoint shards union by MAX per (group, bucket) into
    exactly the full-corpus registers (:func:`hll_merge_registers`),
    which is what makes the sketch a one-pass algebraic aggregate:
    each task ships ≤ groups × 32 rows whatever the row count, and a
    standing register table absorbs new shards without revisiting old
    rows."""
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = h.bitwiseAND(F.lit(HLL_W_MASK))
    rank = F.least(
        F.lit(HLL_W_BITS + 1)
        - F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w))),
        F.lit(HLL_RANK_CAP),
    )
    # NULLs are ignored, matching native approx_count_distinct: an
    # unfiltered null would hash to a phantom (group, null-bucket,
    # null-rank) register row that inflates _nb without feeding _s,
    # skewing the estimate. Groups whose values are ALL null drop out
    # entirely (the oracle twin filters identically).
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, HLL_W_BITS).alias("_bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rank").alias("_reg"))
    )


def hll_merge_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """HLL union: fold shard register tables (stacked rows or a finer
    grouping, e.g. per-day registers collapsing to per-type) into one
    register table by MAX per (group, bucket). Merge-then-estimate ≡
    estimate-on-concatenated-input bit for bit (pinned by test and by
    q110's oracle, which estimates the unsharded input directly)."""
    return regs.groupBy(*group_cols, "_bucket").agg(
        F.max("_reg").alias("_reg")
    )


def hll_estimate_registers(
    regs: DataFrame, group_cols: list[str], out_col: str = "approx"
) -> DataFrame:
    """Finalize a register table into per-group estimates (raw
    estimator + the HLL_LC small-range correction; see module doc)."""
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RANK_CAP} - _reg AS INT))")
        ).alias("_s"),
        F.count("*").alias("_nb"),
    )
    intsum = F.col("_s") + (F.lit(HLL_M) - F.col("_nb")) * F.lit(HLL_SCALE)
    raw = per_group.select(
        *group_cols,
        F.col("_nb"),
        intsum.alias("_d"),
    ).select(
        *group_cols,
        "_nb",
        F.expr(f"CAST({HLL_C} AS BIGINT) div _d").alias("_raw"),
    )
    lc = F.element_at(
        F.array(*[F.lit(int(x)) for x in HLL_LC]),
        (F.lit(HLL_M) - F.col("_nb")).cast("int"),
    )
    return raw.select(
        *group_cols,
        F.when(
            (F.col("_nb") < HLL_M) & (F.col("_raw") <= HLL_LC_MAX_RAW), lc
        )
        .otherwise(F.col("_raw"))
        .cast("long")
        .alias(out_col),
    )


BLOOM_BITS = 65536  # 8 KiB bitmap = 2048 int64 words at 32 used bits/word
BLOOM_WORDS = BLOOM_BITS // 32  # 32 bits per int64 word: 1<<63 overflows DuckDB
BLOOM_K = 3  # 65536^3 = 2^48 < 2^60, so the md5 hash feeds all 3 slots


def _bloom_h(h):  # noqa: ANN001 — Column in, list[Column] out
    """The K bit positions of a 60-bit hash: its base-2^16 digits,
    extracted with shifts — ``/`` on longs is double division in
    Spark and loses bits past 2^53."""
    return [
        F.shiftright(h, 16 * i).bitwiseAND(F.lit(BLOOM_BITS - 1))
        for i in range(BLOOM_K)
    ]


def bloom_build(items: DataFrame, value_col: str) -> DataFrame:
    """Build a Bloom-filter bitmap over ``value_col`` as a
    ``(word_idx, word)`` table of ``BLOOM_WORDS`` int64 rows (32 bits
    used per word: a 1<<63 mask overflows DuckDB's checked shift).

    Same portable 60-bit md5 hash as the HLL; the three bit positions
    are its base-65536 digits. The build is one explode + ``bit_or``
    aggregation — algebraic, map-side combined, and the result is a
    fixed 8 KiB regardless of input size: the membership structure a
    100 TB decontamination pass ships to every executor when the
    benchmark gram set itself is too large to broadcast as strings.
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    slots = F.array(*_bloom_h(h))
    return (
        items.select(F.explode(slots).alias("_bit"))
        .select(
            F.shiftright(F.col("_bit"), 5).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 32 AS INT))").alias(
                "_mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_mask)").alias("word"))
    )


def bloom_probe_counts(
    probes: DataFrame, bloom: DataFrame, value_col: str, id_col: str
) -> DataFrame:
    """Count, per ``id_col``, the distinct ``value_col`` items whose
    K Bloom bits are all set — ``(id, n_suspect)`` for ids with ≥ 1
    hit. Join-based (no driver collect): the ≤2048-row bitmap
    broadcasts, each probe item expands to K (word_idx, mask) rows,
    and an item is a hit when all K joined words contain its bit.
    Guaranteed no false negatives; false-positive rate is the classic
    (1-e^(-kn/m))^k. Identical SQL runs in DuckDB (the oracle)."""
    hits = _bloom_hits(probes, bloom, value_col, [id_col])
    return hits.groupBy(id_col).agg(F.count("*").alias("n_suspect"))


def _bloom_hits(
    probes: DataFrame, bloom: DataFrame, value_col: str, keep_cols: list[str]
) -> DataFrame:
    """Rows of ``[*keep_cols, _v]`` (distinct) whose K Bloom bits are
    all set — the shared membership join under the probe counters."""
    h = F.conv(
        F.substring(F.md5(F.col("_v").cast("string")), 1, 15), 16, 10
    ).cast("long")
    expanded = (
        probes.select(*keep_cols, F.col(value_col).alias("_v"))
        .distinct()
        .select(
            *keep_cols, "_v", F.explode(F.array(*_bloom_h(h))).alias("_bit")
        )
        .select(
            *keep_cols,
            "_v",
            F.shiftright(F.col("_bit"), 5).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 32 AS INT))").alias(
                "_mask"
            ),
        )
    )
    return (
        expanded.join(F.broadcast(bloom), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("_mask")) == F.col("_mask"))
        .groupBy(*keep_cols, "_v")
        .agg(F.count("*").alias("_nbits"))
        .filter(F.col("_nbits") == BLOOM_K)
    )


def bloom_suspects(
    probes: DataFrame, bloom: DataFrame, value_col: str
) -> DataFrame:
    """The DISTINCT ``value_col`` values whose K bits are all set in
    ``bloom`` — one column, named like the input. No false negatives;
    FP rate is the classic (1-e^(-kn/m))^k. The membership primitive
    the sketch-bounded novelty stream folds against."""
    return _bloom_hits(probes, bloom, value_col, []).select(
        F.col("_v").alias(value_col)
    )


CMS_W = BLOOM_BITS  # 2^16 columns per row — reuses the hash digits
CMS_D = BLOOM_K  # 3 rows


def _cms_pairs(value):  # noqa: ANN001 — Column in, Column out
    """The D Count-Min cells of a value as an array of
    ``(row_idx, col_idx)`` structs — one md5-derived 60-bit hash whose
    base-2^16 digits are the D row hashes (the same family Bloom and
    HLL use). Shared by :func:`cms_build`, :func:`cms_estimate` and
    the DSIR CMS model tier (operators/curation.py)."""
    h = F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")
    return F.array(
        *[
            F.struct(F.lit(i).alias("row_idx"), d.alias("col_idx"))
            for i, d in enumerate(_bloom_h(h))
        ]
    )


def cms_build(items: DataFrame, value_col: str) -> DataFrame:
    """Count-Min sketch over ``value_col`` occurrences as a
    ``(row_idx, col_idx, cnt)`` table (≤ 3·65536 rows, fixed size).

    Completes the portable-sketch family (HLL = cardinality, Bloom =
    membership, CMS = frequency): the same md5-derived hash feeds all
    three, its base-2^16 digits serving as the D row hashes here.
    Algebraic — explode to D counter increments per item, groupBy
    partial-aggregates map-side, and sketches merge by element-wise
    sum. The result is bounded regardless of input size: the
    frequency structure a 100 TB pass ships around instead of a
    token→count table with unbounded key cardinality.
    """
    pairs = _cms_pairs(F.col(value_col))
    return (
        items.select(F.explode(pairs).alias("_p"))
        .select("_p.row_idx", "_p.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(probes: DataFrame, cms: DataFrame, value_col: str) -> DataFrame:
    """Point-query the sketch: per distinct probe value, the minimum
    of its D counters — ``(value_col, est)``, never an underestimate
    (missing counters coalesce to 0). The ≤196k-row sketch broadcasts;
    probes expand to D rows and never shuffle wide."""
    expanded = (
        probes.select(F.col(value_col).alias("_v"))
        .distinct()
        .select("_v", F.explode(_cms_pairs(F.col("_v"))).alias("_p"))
        .select("_v", "_p.row_idx", "_p.col_idx")
    )
    return (
        expanded.join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
        .groupBy(F.col("_v").alias(value_col))
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def hll_sql(
    table_expr: str, group_col: str, value_col: str, out_col: str = "approx"
) -> str:
    """The DuckDB twin of :func:`hll_approx_distinct` (same constants,
    same integer math; SUMs cast back to BIGINT — DuckDB widens to
    HUGEINT)."""
    hexfold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(md5(CAST({value_col} AS VARCHAR)), 1, 15), ''), "
        f"c -> CAST(CASE WHEN c BETWEEN '0' AND '9' THEN ascii(c) - 48 "
        f"ELSE ascii(c) - 87 END AS BIGINT))), (a, b) -> a * 16 + b)"
    )
    return f"""
WITH hll_h AS (
  SELECT {group_col} AS g, {hexfold} AS h FROM {table_expr}
  WHERE {value_col} IS NOT NULL
),
hll_br AS (
  SELECT g, h // {1 << HLL_W_BITS} AS b, h % {1 << HLL_W_BITS} AS w FROM hll_h
),
hll_r AS (
  SELECT g, b,
         MAX(LEAST({HLL_W_BITS + 1} - CASE WHEN w = 0 THEN 0
                   ELSE length(bin(w)) END, {HLL_RANK_CAP})) AS reg
  FROM hll_br GROUP BY 1, 2
),
hll_s AS (
  SELECT g,
         CAST(SUM(CAST(1 AS BIGINT) << CAST({HLL_RANK_CAP} - reg AS INT)) AS BIGINT) AS s,
         COUNT(*) AS nb
  FROM hll_r GROUP BY 1
),
hll_e AS (
  SELECT g, nb,
         CAST({HLL_C} AS BIGINT)
           // (s + ({HLL_M} - nb) * CAST({HLL_SCALE} AS BIGINT)) AS raw
  FROM hll_s
)
SELECT g AS {group_col},
       CAST(CASE WHEN nb < {HLL_M} AND raw <= {HLL_LC_MAX_RAW}
            THEN (LIST_VALUE({", ".join(str(x) for x in HLL_LC)})
                 )[CAST({HLL_M} - nb AS INT)]
            ELSE raw END AS BIGINT) AS {out_col}
FROM hll_e
""".strip()


# ---------------------------------------------------------------------------
# Engine-portable HDR-histogram quantiles (r9)
# ---------------------------------------------------------------------------
#
# The 100-TB path for percentiles: exact `percentile()` (q52) sorts
# per group — fine at bench scale, quadratic pain at corpus scale —
# and the native alternatives (Spark approx_percentile = Greenwald-
# Khanna, DuckDB approx_quantile = t-digest) use different float
# internals, so neither can be oracle-checked across engines. This
# sketch is the quantile analog of the portable HLL above: a
# log-scale (HDR) histogram with HDR_MANTISSA_BITS of sub-bucket
# resolution, INTEGER ARITHMETIC ONLY (length(bin(v)) exponent,
# shift/div bucketing, ceil-division rank targets), so Spark and
# DuckDB produce identical buckets, identical cumulative ranks, and
# identical answers bit for bit.
#
# Guarantees: for non-negative int64 values, the reported bucket
# [bucket_lo, bucket_hi] contains the exact q-quantile (rank
# ceil(q·n), ties to the lower bucket), and bucket width is
# ≤ 2^-HDR_MANTISSA_BITS · value (≤ 6.25 % relative error at 4
# mantissa bits); values < 2^HDR_MANTISSA_BITS are EXACT (unit
# buckets).
#
# Scale shape: algebraic like the HLL — groupBy(group, bucket).count
# partial-aggregates map-side; each task ships at most groups ×
# (64 · 2^HDR_MANTISSA_BITS ≈ 1024) bucket rows into the shuffle
# whatever the row count, and shard histograms merge by SUM (the
# merge ≡ refit algebra is pinned by test).

HDR_MANTISSA_BITS = 4


def hdr_histogram(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HDR bucket counts: [*group_cols, bucket_lo,
    bucket_hi, n_rows]. Nulls and negatives are rejected by
    filter (documented contract: non-negative int64 measures —
    cents, token counts, byte sizes)."""
    v = F.col(value_col).cast("long")
    base = df.filter(v.isNotNull() & (v >= 0)).select(
        *group_cols, v.alias("_hdr_v")
    )
    # bucket power: 2^max(exponent − mantissa_bits, 0), exponent via
    # the binary-string length (the same integer device the HLL rank
    # uses) — no logs, no floats
    b = base.select(
        *group_cols,
        "_hdr_v",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(greatest("
            f"length(bin(_hdr_v)) - 1 - {HDR_MANTISSA_BITS}, 0) AS INT))"
        ).alias("_p2"),
    ).select(
        *group_cols,
        (F.expr("_hdr_v div _p2") * F.col("_p2")).alias("bucket_lo"),
        # bucket_lo + (p2 - 1), NOT (v/p2 + 1)*p2 - 1: the latter's
        # intermediate hits 2^63 for top-bucket values (v ≥ 31·2^58)
        # and overflows int64 under ANSI mode; parenthesization
        # matters — lo + p2 is the same overflow
        (
            F.expr("_hdr_v div _p2") * F.col("_p2")
            + (F.col("_p2") - F.lit(1))
        ).alias("bucket_hi"),
    )
    return b.groupBy(*group_cols, "bucket_lo", "bucket_hi").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def hdr_merge_histograms(
    hists: DataFrame, group_cols: list[str]
) -> DataFrame:
    """HDR union: fold shard histograms (stacked rows) into one by
    SUM per (group, bucket) — merge-then-query ≡ fit-on-concatenated-
    input, the same pinned shard algebra as
    :func:`hll_merge_registers` (tested by the shard-merge suite and
    the streaming fold's prefix parity)."""
    return hists.groupBy(*group_cols, "bucket_lo", "bucket_hi").agg(
        F.sum("n_rows").cast("long").alias("n_rows")
    )


def hdr_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles_e4: list[int],
) -> DataFrame:
    """Per-group quantiles from the HDR histogram: one row per
    (group, q_e4) with the containing bucket. Rank target is the
    exact integer ceil(q·n) = (q_e4·n + 9999) div 10000; the answer
    bucket is the first (by bucket_lo) whose cumulative count
    reaches it — identical integer math in the DuckDB twin
    (:func:`hdr_quantile_sql`)."""
    from pyspark.sql import Window as W

    hist = hdr_histogram(df, value_col, group_cols)
    w = W.partitionBy(*group_cols).orderBy("bucket_lo")
    wall = W.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bucket_lo",
        "bucket_hi",
        F.sum("n_rows").over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ).alias("_cum"),
        F.sum("n_rows").over(wall).alias("_n"),
    )
    qs = F.explode(
        F.array(*[F.lit(int(q)) for q in quantiles_e4])
    ).alias("q_e4")
    expanded = cum.select(*group_cols, "bucket_lo", "bucket_hi",
                          "_cum", "_n", qs)
    hit = expanded.filter(
        F.col("_cum") * 10000 >= F.col("q_e4") * F.col("_n")
    )
    pick = W.partitionBy(*group_cols, "q_e4").orderBy("bucket_lo")
    return (
        hit.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select(
            *group_cols,
            "q_e4",
            "bucket_lo",
            "bucket_hi",
            F.col("_n").alias("n_rows"),
        )
    )


def hdr_quantile_sql(
    table_expr: str,
    value_col: str,
    group_col: str,
    quantiles_e4: list[int],
) -> str:
    """DuckDB twin of :func:`hdr_quantiles` (same integer math)."""
    qlist = ", ".join(f"({int(q)})" for q in quantiles_e4)
    return f"""
WITH hdr_v AS (
  SELECT {group_col} AS g, CAST({value_col} AS BIGINT) AS v
  FROM {table_expr}
  WHERE {value_col} IS NOT NULL AND {value_col} >= 0
),
hdr_b AS (
  SELECT g,
         (v // p2) * p2 AS bucket_lo,
         -- lo + (p2 - 1): same value as (v//p2 + 1)*p2 - 1 without
         -- the 2^63 intermediate for top-bucket values
         (v // p2) * p2 + (p2 - 1) AS bucket_hi
  FROM (
    SELECT g, v,
           (CAST(1 AS BIGINT) << CAST(GREATEST(length(bin(v)) - 1
              - {HDR_MANTISSA_BITS}, 0) AS INT)) AS p2
    FROM hdr_v
  )
),
hdr_h AS (
  SELECT g, bucket_lo, bucket_hi, COUNT(*) AS n_rows
  FROM hdr_b GROUP BY 1, 2, 3
),
hdr_c AS (
  SELECT g, bucket_lo, bucket_hi,
         CAST(SUM(n_rows) OVER (PARTITION BY g ORDER BY bucket_lo
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(n_rows) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM hdr_h
),
hdr_q AS (SELECT * FROM (VALUES {qlist}) AS t(q_e4)),
hdr_hit AS (
  SELECT g, q_e4, bucket_lo, bucket_hi, n,
         ROW_NUMBER() OVER (PARTITION BY g, q_e4
                            ORDER BY bucket_lo) AS rk
  FROM hdr_c CROSS JOIN hdr_q
  WHERE cum * 10000 >= q_e4 * n
)
SELECT g AS {group_col}, q_e4, bucket_lo, bucket_hi, n AS n_rows
FROM hdr_hit WHERE rk = 1
""".strip()
