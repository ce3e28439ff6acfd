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


# Round-15 rotation plan: after r14 the stale set is the r13 window
# (q01/q03-q07, q10-q13, q15-q18, q47, q49, q51, q57/q58, q60, q62,
# q64/q65, q67/q68, q71, q73-q75, q77, q82-q87, q89-q95, q102-q104,
# q106/q107, q110/q111 — 50 queries, all r13-green) plus the TEN
# queries bumped out of the r14 window at exactly 2 rounds stale:
# q30_token_stats, q31_quality_score, q33_fingerprint,
# q88_normalize_text, q69_train_split, q70_quality_filter,
# q72_repetition_stats, q19_window_running, q22_pivot, q23_rollup
# (pin these ten FIRST). 60 candidates for 50 slots → lead with the
# ten bumps, then the r13 cohort minus TEN derisked bumps
# (candidates: q04/q05/q16/q17/q18 single-expression relational cells
# plus q57/q58/q60/q62/q73 — approx-agg/window single-operator cells
# every other window's kernels exercise; pin the bumped names first
# in the r16 note).
# Steady-state invariant (COVERAGE.md): every query's last driver row
# is ≤2 rounds old.
#
# Round-14 gate window head (executes the rotation pinned in the r13
# note and prescribed as VERDICT r13 item #1): the nine
# exactly-2-rounds-stale bumps q02_filter_project / q32_lang_id /
# q46_frame_sample / q48_sessionize / q50_email_stats / q54_asof_join
# / q56_decile_stats / q59_salted_agg / q61_chunk_docs lead, then
# q114_dsir_stream_scoring (the r13 TAIL addition, never
# driver-checked — pulled forward exactly like q112/q113 were in
# r12), then the r12 cohort minus the ten derisked bumps
# q30_token_stats / q31_quality_score / q33_fingerprint /
# q88_normalize_text / q69_train_split / q70_quality_filter /
# q72_repetition_stats (single-kernel text/split ops rechecked twice
# in two rounds) / q19_window_running / q22_pivot / q23_rollup
# (window/pivot/rollup single-operator cells; they age to exactly 2
# rounds and lead r15). This window deliberately contains the entire
# r13 Arrow-kernel rewrite cohort (q34-q45, q63, q66, q76, q78-q81,
# q96-q101, q112) so the driver's oracle finally sees those rewritten
# versions. 50 head entries; the ≤2-rounds-stale invariant holds a
# third consecutive round.
_GATE_HEAD = (
    "q02_filter_project",
    "q32_lang_id",
    "q46_frame_sample",
    "q48_sessionize",
    "q50_email_stats",
    "q54_asof_join",
    "q56_decile_stats",
    "q59_salted_agg",
    "q61_chunk_docs",
    "q114_dsir_stream_scoring",
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
    "q20_window_rank",
    "q21_json_extract",
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
