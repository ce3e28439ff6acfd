"""Single-record debug diff (SURVEY §5; reference src/debug.py:1-18).

The reference prints one source note next to its extracted record for
manual inspection. Same here, plus the record's graph footprint —
a driver-side convenience, not a data-plane op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def debug_record(
    notes: DataFrame,
    extracted: DataFrame,
    record_id: int,
    graph=None,
) -> dict:
    """Return {note, extracted, graph} for one record_id; prints a
    readable diff when used interactively."""
    out: dict = {"record_id": record_id}
    note_row = notes.filter(F.col("record_id") == record_id).collect()
    out["note"] = note_row[0]["note"] if note_row else None
    ext_row = extracted.filter(F.col("record_id") == record_id).collect()
    out["extracted"] = ext_row[0].asDict(recursive=True) if ext_row else None
    if graph is not None:
        out["graph"] = {
            "patient": [
                r.asDict()
                for r in graph.patient.filter(
                    F.col("patient_id") == record_id
                ).collect()
            ],
            "edges": {
                name: [
                    r.asDict()
                    for r in df.filter(
                        (F.col("src").cast("string") == str(record_id))
                        | (F.col("dst").cast("string") == str(record_id))
                    ).collect()
                ]
                for name, df in graph.tables().items()
                if "src" in df.columns
            },
        }
    return out
