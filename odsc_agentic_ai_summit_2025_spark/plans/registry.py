"""Declared query inventory registry.

Every operator claimed in SURVEY.md §2 gets a named entry here: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string
for DuckDB. The driver hash-compares the two at sf=0.01.

Determinism conventions (both sides must follow them):

- Alias every computed column identically in Spark and SQL.
- Money aggregates: ``SUM(CAST(x AS DECIMAL(18,2)))`` — exact decimal
  arithmetic, identical in any engine and any partition order — cast
  to DOUBLE only at output (magnitudes here fit a double exactly).
- Ratios/averages: IEEE division of two exactly-determined operands,
  then ``ROUND(., 2)`` — identical doubles in, identical double out.
- Top-k: always break ties with a unique key so LIMIT is a function.
- Never output raw float accumulations (partition-order dependent).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One declared-inventory entry."""

    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    covers: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids
    description: str = ""


def all_queries() -> dict[str, Query]:
    """Assemble the full inventory from every plan module."""
    from . import (
        corpus,
        curation,
        dedup,
        extended,
        extended2,
        observability,
        relational,
        retrieval,
        textops,
    )

    # The external correctness gate checks the FIRST 50 entries in
    # insertion order. Round 6 needs finer-than-module rotation (q96
    # comes from a TAIL list, q80 from mid-textops, plus 41 stale
    # queries spanning three modules), so the window is now pinned by
    # the explicit _GATE_HEAD list below; module order only decides
    # the remaining filler slots and the post-window tail.
    #
    # Round-7 rotation plan: after r6, the queries with r5-last rows
    # are the ones OUTSIDE this head — extended q51-q54, extended2
    # q55-q62, observability q64-q68, curation q69-q75 cohort, textops
    # non-q80, corpus q83-q95, dedup q82/q89/q90/q91 (42 total ≤ 50
    # slots). Replace _GATE_HEAD with that cohort next round.
    mods = (
        extended,
        extended2,
        observability,
        curation,
        textops,
        corpus,
        dedup,
        retrieval,
        relational,
    )
    out: dict[str, Query] = {}
    for mod in mods:
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    # TAIL_QUERIES sit OUTSIDE the 50-entry gate window by
    # construction: late-round additions whose window slot would
    # displace a query still waiting for its first driver row. The
    # local gate covers them at both SFs; the next rotation pulls
    # them forward.
    for mod in mods:
        for q in getattr(mod, "TAIL_QUERIES", ()):
            if q.name in out:
                raise ValueError(f"duplicate query name: {q.name}")
            out[q.name] = q
    # Pull the gate-window head to the front (insertion order = gate
    # order); everything else keeps module order behind it.
    ordered: dict[str, Query] = {}
    for name in _GATE_HEAD:
        ordered[name] = out.pop(name)  # KeyError = head names a missing query
    ordered.update(out)
    return ordered


# Round-13 rotation plan: after r12 the stale set is the r11 window
# (q04/q05/q16-q18, q110/q111, q02, q106/q107, q102-q104, q32,
# q46-q51, q54, q56-q62, q64-q65, q67-q68, q71, q73-q75, q77,
# q82-q87, q89-q95 — 50 queries, all r11-green) plus the NINE
# queries bumped out of the r12 window at exactly 2 rounds stale:
# q01_pricing_summary, q03_row_number, q06_string_ops,
# q07_date_parts, q10_semijoin, q11_antijoin, q12_having,
# q13_count_distinct, q15_distinct_enum (pin these nine FIRST).
# 59 candidates for 50 slots → lead with the nine bumps, then the
# r11 cohort minus NINE derisked bumps (candidates: q02/q32/q46/
# q48/q50/q54/q56/q59/q61 — single-operator column/window/date ops
# whose kernels every other window exercises); pin the bumped names
# first in the r14 note.
# Steady-state invariant (COVERAGE.md): every query's last driver row
# is ≤2 rounds old.
#
# Round-12 gate window head (executes the rotation pinned in the r11
# note): q30_token_stats / q31_quality_score / q33_fingerprint /
# q88_normalize_text / q69_train_split / q70_quality_filter /
# q72_repetition_stats lead (the seven exactly-2-rounds-stale bumps
# from r11), then q112_neardup_index_lifecycle +
# q113_hll_stream_replay (r11 TAILs, never driver-checked — q113
# enters on the executor-side shard-write fix per VERDICT r11 #2),
# then the r10 cohort (q52/q53/q55, q108/q109, q105, q08/q09/q14,
# q19-q25, q34-q45, q63, q66, q76, q78-q81, q96-q101) minus the
# nine derisked bumps q01_pricing_summary / q03_row_number /
# q06_string_ops / q07_date_parts / q10_semijoin / q11_antijoin /
# q12_having / q13_count_distinct / q15_distinct_enum (pure
# column/date/predicate ops exercised by every other query; they age
# to exactly 2 rounds and lead r13). 50 head entries; after this
# round every query's last driver row is ≤2 rounds old with no
# exceptions — the first round at the full steady-state invariant.
_GATE_HEAD = (
    "q30_token_stats",
    "q31_quality_score",
    "q33_fingerprint",
    "q88_normalize_text",
    "q69_train_split",
    "q70_quality_filter",
    "q72_repetition_stats",
    "q112_neardup_index_lifecycle",
    "q113_hll_stream_replay",
    "q52_percentiles",
    "q53_cube",
    "q55_rolling_revenue",
    "q108_windowed_hll",
    "q109_hdr_quantiles",
    "q105_undirected_paths",
    "q08_join_agg",
    "q09_multihop_revenue",
    "q14_argmax",
    "q19_window_running",
    "q20_window_rank",
    "q21_json_extract",
    "q22_pivot",
    "q23_rollup",
    "q24_time_bucket",
    "q25_above_avg",
    "q34_dedup_exact",
    "q35_jaccard_pairs",
    "q36_minhash_lsh",
    "q37_simhash",
    "q38_embedding_neardup",
    "q39_knn_bruteforce",
    "q40_bm25_topk",
    "q41_fts_postings",
    "q42_lsh_buckets",
    "q43_hybrid_rrf",
    "q44_blob_stats",
    "q45_byte_histogram",
    "q63_neardup_lsh",
    "q66_dedup_clusters",
    "q76_pq_knn",
    "q78_simhash_pairs",
    "q79_ivfpq_knn",
    "q80_pack_sequences",
    "q81_knn_self_join",
    "q96_epoch_shards",
    "q97_bpe_segment",
    "q98_dsir_importance",
    "q99_quality_reps",
    "q100_curation_pipeline",
    "q101_distinct_ngrams",
)
