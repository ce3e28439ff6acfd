"""Text-analysis query inventory (documents table), each with a
DuckDB oracle twin of the exact same integer/IEEE arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import char_poly_hash_sql
from ..operators import textops as ops
from ..sources.io import read_table
from .registry import Query

_TOKS = "string_split_regex(text, '\\s+')"
_UTOKS = f"list_distinct({_TOKS})"


def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.token_stats(read_table(spark, sf_dir, "documents"), "text", "doc_id")


Q30_SQL = f"""
SELECT doc_id,
       CAST(len({_TOKS}) AS INT) AS n_tokens,
       CAST(len({_UTOKS}) AS INT) AS n_unique
FROM documents
"""


def q31_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.quality_score(read_table(spark, sf_dir, "documents"), "text", "doc_id")


def quality_ctes(src: str) -> str:
    """The q31 quality arithmetic as a reusable CTE chain over a
    relation with ``doc_id, text`` — ends in ``quality(doc_id,
    n_tokens, stop_ratio_e4, avg_token_len_e4, quality_e4)``. Shared
    by the q31/q70/q99/q100 oracles so the fixed-point formula exists
    in exactly one SQL rendering (the ``minhash_pairs_ctes``
    anti-drift rationale)."""
    return f"""qbase AS (
  SELECT doc_id,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform({_TOKS}, x -> CAST(length(x) AS BIGINT))),
             (a, b) -> a + b) AS sum_len,
         CAST(len(list_filter({_TOKS}, x -> x IN ('the', 'a'))) AS BIGINT)
             AS n_stop
  FROM {src}
),
quality AS (
  SELECT doc_id, n_tokens,
         (n_stop * 10000) // n_tokens AS stop_ratio_e4,
         (sum_len * 10000) // n_tokens AS avg_token_len_e4,
         ((n_tokens - n_stop) * LEAST(sum_len, n_tokens * 10) * 10000)
             // (n_tokens * n_tokens * 10) AS quality_e4
  FROM qbase
)"""


Q31_SQL = f"""
WITH {quality_ctes('documents')}
SELECT doc_id, n_tokens, stop_ratio_e4, avg_token_len_e4, quality_e4
FROM quality
"""


def q32_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.lang_id(read_table(spark, sf_dir, "documents"), "text", "lang")


Q32_SQL = f"""
SELECT lang,
       CASE WHEN list_contains({_TOKS}, 'the') THEN 'en'
            WHEN list_contains({_TOKS}, 'a') THEN 'en'
            ELSE 'unknown' END AS lang_guess,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.fingerprint(read_table(spark, sf_dir, "documents"), "text", "doc_id")


Q33_SQL = f"SELECT doc_id, {char_poly_hash_sql('text')} AS fingerprint FROM documents"


def q69_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    return ops.train_split(docs, "doc_id").select("doc_id", "split")


Q69_SQL = f"""
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id,
             {char_poly_hash_sql("CAST(doc_id AS VARCHAR) || ':split'")} % 100 AS b
      FROM documents)
"""


def q70_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.corpus_filter(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


Q70_SQL = f"""
WITH {quality_ctes('documents')}
SELECT doc_id, n_tokens, stop_ratio_e4, avg_token_len_e4, quality_e4,
       n_tokens >= {ops.FILTER_MIN_TOKENS} AS len_ok,
       stop_ratio_e4 <= {ops.FILTER_MAX_STOP_RATIO_E4} AS stop_ok,
       avg_token_len_e4 BETWEEN {ops.FILTER_MIN_AVG_LEN_E4}
           AND {ops.FILTER_MAX_AVG_LEN_E4} AS avg_len_ok,
       (n_tokens >= {ops.FILTER_MIN_TOKENS}
        AND stop_ratio_e4 <= {ops.FILTER_MAX_STOP_RATIO_E4}
        AND avg_token_len_e4 BETWEEN {ops.FILTER_MIN_AVG_LEN_E4}
            AND {ops.FILTER_MAX_AVG_LEN_E4}) AS kept
FROM quality
"""


def q77_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.bpe_token_stats(
        read_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def _q77_sql() -> str:
    from ..functions.text import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")  # SQL string-literal quoting
    pieces = f"regexp_extract_all(lower(text), '{pat}')"
    return f"""
SELECT doc_id,
       CAST(len({pieces}) AS BIGINT) AS n_bpe,
       CAST(len(list_distinct({pieces})) AS BIGINT) AS n_bpe_unique,
       CAST((length(text) * 10000) // greatest(len({pieces}), 1) AS BIGINT)
         AS chars_per_piece_e4
FROM documents
"""


def q80_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing at seq_len=512 — per doc its
    global token offset and the training-chunk span it lands in. The
    Spark side computes the offset as a distributed prefix sum
    (range partition + per-partition totals); the oracle is the
    single-window cumsum, which must agree bit-for-bit. Both sides
    order by the TOTAL key (doc_id, n_tokens, sha256(text)) so the
    result is well-defined even under duplicate doc_ids."""
    return ops.pack_sequences(
        read_table(spark, sf_dir, "documents"), "text", "doc_id", seq_len=512
    )


Q80_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         sha256(text) AS _h
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id, n_tokens, _h
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS tok_offset
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // 512 AS BIGINT) AS first_chunk,
       CAST((tok_offset + n_tokens - 1) // 512 AS BIGINT) AS last_chunk,
       CAST((tok_offset + n_tokens - 1) // 512
            - tok_offset // 512 + 1 AS BIGINT) AS n_chunks
FROM c
"""


# Frozen BPE merge table: bpe_learn_merges(documents@sf0.001, "text",
# n_merges=16) — learned once and pinned so q97 is a pure map query
# (the driver runs at sf0.01, the local gate at sf0.01+sf0.1; a
# per-SF re-fit would make the oracle unserializable). Merge LEARNING
# itself stays pytest-verified (iterative argmax, not
# SQL-expressible); this covers the APPLY half with a driver row.
FROZEN_BPE_MERGES = [
    ("e", "r", 4650), ("e", "</w>", 4644), ("n", "</w>", 2898),
    ("o", "r", 2880), ("t", "</w>", 2850), ("er", "</w>", 2781),
    ("o", "w", 2763), ("ow", "</w>", 2763), ("l", "u", 1928),
    ("i", "n", 1922), ("y", "</w>", 1879), ("a", "r", 1873),
    ("p", "ar", 1873), ("g", "</w>", 1843), ("a", "s", 1836),
    ("h", "</w>", 1833),
]


def q97_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts under the FROZEN trained BPE merge table —
    the number a trainer's data loader would see. The Spark side is
    the broadcast-rules Arrow kernel (operators/textops.py
    bpe_segment_stats); the oracle UNROLLS the 16 merge rules into
    nested list_reduce folds (a left-fold replacing (a,b) suffixes is
    provably equivalent to the kernel's single greedy left-to-right
    scan per rule: a merged token a||b can never re-match a, b
    non-empty). Corpus is ASCII with no U+001F, so chr(31) is a safe
    symbol separator."""
    return ops.bpe_segment_stats(
        read_table(spark, sf_dir, "documents"), "text", "doc_id",
        FROZEN_BPE_MERGES,
    )


def bpe_seg_len_sql(
    merges: list[tuple], word_expr: str = "w", end_token: str = "</w>"
) -> str:
    """DuckDB expression for the trained-BPE token count of one word:
    the merge rules UNROLLED into nested list_reduce folds. Each fold
    is one greedy left-to-right scan of rule (a, b) — merge when the
    accumulator's LAST symbol is exactly ``a`` (suffix check on the
    chr(31) separator boundary) and the next symbol is ``b``. A fold
    is equivalent to the kernel's index scan because a merged token
    ``a||b`` can never re-match ``a`` (``b`` non-empty) — property-
    tested against the Python scan in tests/test_properties.py.
    Symbols must not contain U+001F (the separator)."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    seg = (
        f"array_to_string(list_append(string_split({word_expr}, ''),"
        f" {lit(end_token)}), chr(31))"
    )
    for a, b, *_ in merges:
        seg = (
            f"list_reduce(string_split({seg}, chr(31)), (acc, x) -> "
            f"CASE WHEN (acc = {lit(a)} OR ends_with(acc, chr(31) || {lit(a)}))"
            f" AND x = {lit(b)} THEN acc || {lit(b)}"
            f" ELSE acc || chr(31) || x END)"
        )
    return f"len(string_split({seg}, chr(31)))"


def _q97_sql() -> str:
    from ..functions.text import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    pieces = (
        f"list_filter(list_transform(regexp_extract_all(lower(text), '{pat}'),"
        " p -> trim(p)),"
        " p -> len(p) > 0 AND NOT regexp_matches(p, '^\\s+$'))"
    )
    seg_len = bpe_seg_len_sql(FROZEN_BPE_MERGES, word_expr="w")
    return f"""
WITH p AS (
  SELECT doc_id, {pieces} AS pieces FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(len(pieces) AS BIGINT) AS n_pieces,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(pieces, w -> CAST({seg_len} AS BIGINT))),
            (a, b) -> a + b) AS BIGINT) AS n_bpe_tokens
FROM p
"""


def q101_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ops.distinct_ngram_diversity(
        read_table(spark, sf_dir, "documents"), "text", "source"
    )


def _q101_sql(ns: tuple = (1, 2, 3)) -> str:
    from .curation import _grams_sql

    selects = []
    for n in ns:
        head, parts = _grams_sql(n)
        selects.append(f"""
SELECT id AS source, CAST({n} AS INT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct,
       CAST(COUNT(DISTINCT gram) * 10000
            // GREATEST(COUNT(*), 1) AS BIGINT) AS distinct_e4
FROM (SELECT id, {parts} AS gram
      FROM ({head} FROM (SELECT source AS id, {_TOKS} AS ts FROM documents)))
GROUP BY id""")
    return "\nUNION ALL\n".join(selects)


QUERIES = [
    Query("q30_token_stats", q30_token_stats, Q30_SQL,
          ("A10", "F6"), "per-doc token counting"),
    Query("q101_distinct_ngrams", q101_distinct_ngrams, _q101_sql(),
          ("A4", "A10"), "distinct-n diversity per source slice"),
    Query("q97_bpe_segment", q97_bpe_segment, _q97_sql(),
          ("A10", "F6"), "trained-BPE segmentation counts, frozen merge table"),
    Query("q77_bpe_tokens", q77_bpe_tokens, _q77_sql(),
          ("A10", "F6"), "BPE-ish pre-tokenizer piece counting"),
    Query("q80_pack_sequences", q80_pack_sequences, Q80_SQL,
          ("A10", "O1"), "concat-and-chunk sequence packing (training batches)"),
    Query("q31_quality_score", q31_quality_score, Q31_SQL,
          ("F12",), "heuristic quality features"),
    Query("q32_lang_id", q32_lang_id, Q32_SQL,
          ("F1", "F2"), "marker-based language ID + confusion"),
    Query("q33_fingerprint", q33_fingerprint, Q33_SQL,
          ("F12",), "rolling-hash document fingerprint"),
    Query("q69_train_split", q69_train_split, Q69_SQL,
          ("F12",), "deterministic hash-bucketed train/val/test split"),
    Query("q70_quality_filter", q70_quality_filter, Q70_SQL,
          ("F12", "P8"), "C4-style quality filter with per-rule reasons"),
]
