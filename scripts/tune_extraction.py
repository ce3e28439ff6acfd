#!/usr/bin/env python3
"""Fast extraction-accuracy tuning loop (no Spark).

Runs MockLLMClient over the reference's 2,726 notes and scores it
against the reference's own LLM extraction (the gold), replicating
eval.field_map()'s comparators in plain Python. Numbers here match
llm/eval.py's Spark report cell-for-cell (asserted by
tests/test_llm_surface.py::test_field_accuracy_report staying green)
— this script exists so a rule change can be measured in ~2 s
instead of a ~40 s Spark round.

Usage:
    python scripts/tune_extraction.py              # per-field table
    python scripts/tune_extraction.py given 12     # 12 mismatch samples
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

from odsc_agentic_ai_summit_2025_spark.llm.client import MockLLMClient  # noqa: E402
from odsc_agentic_ai_summit_2025_spark.llm.eval_states import US_STATES  # noqa: E402

NOTES = "/root/reference/data/note.json"
GOLD = "/root/reference/data/extracted_fhir.json"


def _lower(v):
    return v.strip().lower() if isinstance(v, str) else None


def _strict_lower(a, b):
    return _lower(a) == _lower(b)


def _list_lower(a, b):
    la = [_lower(x) for x in a] if a is not None else None
    lb = [_lower(x) for x in b] if b is not None else None
    return la == lb


def _strip_spaces(a, b):
    f = lambda v: re.sub(r"\s+", "", v.strip().lower()) if isinstance(v, str) else None
    return f(a) == f(b)


def _norm_state(v):
    if not isinstance(v, str):
        return None
    return US_STATES.get(v.strip().upper(), v).lower()


def _state_eq(a, b):
    return _norm_state(a) == _norm_state(b)


def _substring_bidir(a, b):
    la, lb = _lower(a), _lower(b)
    if la == lb:
        return True
    return la is not None and lb is not None and (lb in la or la in lb)


def _count_eq(a, b):
    sz = lambda v: len(v) if isinstance(v, list) else 0
    return sz(a) == sz(b)


def _get(d, *path):
    for p in path:
        if d is None:
            return None
        d = d.get(p) if isinstance(d, dict) else None
    return d


def _first_imm_date(rec):
    imm = rec.get("immunization")
    if isinstance(imm, list) and imm:
        return _get(imm[0], "occurrenceDateTime")
    return None


FIELDS = {
    "family": (lambda r: _get(r, "name", "family"), _strict_lower),
    "given": (lambda r: _get(r, "name", "given"), _list_lower),
    "prefix": (lambda r: _get(r, "name", "prefix"), _strict_lower),
    "line": (lambda r: _get(r, "address", "line"), _strict_lower),
    "city": (lambda r: _get(r, "address", "city"), _strict_lower),
    "state": (lambda r: _get(r, "address", "state"), _state_eq),
    "postalCode": (lambda r: _get(r, "address", "postalCode"), _strict_lower),
    "country": (lambda r: _get(r, "address", "country"), _strict_lower),
    "gender": (lambda r: r.get("gender"), _strict_lower),
    "birthDate": (lambda r: r.get("birthDate"), lambda a, b: a == b),
    "maritalStatus": (lambda r: r.get("maritalStatus"), _strip_spaces),
    "practitioner": (
        lambda r: _get(r, "practitioner", "name", "family"),
        _substring_bidir,
    ),
    "allergyRecordedCount": (
        lambda r: _get(r, "allergy", "substance"),
        _count_eq,
    ),
    "immunizationCount": (lambda r: r.get("immunization"), _count_eq),
    "immunizationDate": (_first_imm_date, _substring_bidir),
}


def main() -> None:
    notes = {r["record_id"]: r["note"] for r in json.load(open(NOTES))}
    gold = {r["record_id"]: r for r in json.load(open(GOLD))}
    client = MockLLMClient()
    ext = {}
    for rid, note in notes.items():
        rec = client.extract_patient(note)
        rec["immunization"] = client.extract_immunizations(note)
        rec["practitioner"] = client.extract_practitioner(note)
        ext[rid] = rec

    focus = sys.argv[1] if len(sys.argv) > 1 else None
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    total_m = total_n = 0
    shown = 0
    table = []
    for fld, (getter, cmp_) in FIELDS.items():
        m = n = 0
        for rid in notes:
            a, b = getter(ext[rid]), getter(gold[rid])
            ok = cmp_(a, b)
            m += ok
            n += 1
            if not ok and fld == focus and shown < n_samples:
                shown += 1
                print(f"--- rid={rid} ext={a!r} gold={b!r}")
                print("   ", re.sub(r"\s+", " ", notes[rid])[:420])
        table.append((fld, m, n))
        total_m += m
        total_n += n
    if not focus:
        for fld, m, n in sorted(table, key=lambda t: t[1]):
            print(f"{fld:25s} {m:5d}/{n} {m / n:.4f}")
    print(f"OVERALL {total_m}/{total_n} {total_m / total_n:.4f}")


if __name__ == "__main__":
    main()
