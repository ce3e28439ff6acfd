"""Per-prompt-function unit tests for the deterministic mock client —
the analog of the reference's BAML ``@@assert`` prompt tests
(extract_fhir.baml:107-202, rag.baml:180-367): pinned inputs, pinned
expected structure. No Spark session needed."""

from __future__ import annotations

from odsc_agentic_ai_summit_2025_spark.llm.client import MockLLMClient

NOTE = (
    "Ms. Jane Ann Doe, who was born on March 5, 1980, resides at her home "
    "at 12 Main Street, Boston, Massachusetts, 02111, United States. She is "
    "never married and identifies Spanish as her primary language. Her home "
    "phone is 555-111-2222. She has a confirmed allergy towards penicillin. "
    "Dr. Sam Smith managed her care; reach him at Sam1.Smith2@example.com. "
    "She received a seasonal influenza vaccine on June 5, 2021."
)


def test_extract_patient_assertions():
    p = MockLLMClient().extract_patient(NOTE)
    assert p["name"] == {"family": "Doe", "given": ["Jane", "Ann"], "prefix": "Ms."}
    assert p["birthDate"] == "1980-03-05"
    assert p["address"]["line"] == "12 Main Street"
    assert p["address"]["city"] == "Boston"
    assert p["address"]["state"] == "Massachusetts"
    assert p["address"]["postalCode"] == "02111"
    assert p["address"]["country"] == "US"
    assert p["maritalStatus"] == "NeverMarried"
    assert p["primaryLanguage"] == "Spanish"
    assert p["phone"] == "555-111-2222"
    assert p["allergy"]["substance"][0]["name"] == "penicillin"
    assert p["allergy"]["substance"][0]["category"] == "medication"


def test_extract_practitioner_assertions():
    pr = MockLLMClient().extract_practitioner(NOTE)
    assert pr["name"]["family"] == "Smith"
    assert pr["name"]["prefix"] == "Dr."
    assert pr["email"] == "Sam1.Smith2@example.com"


def test_extract_immunizations_assertions():
    im = MockLLMClient().extract_immunizations(NOTE)
    assert im and im[0]["status"] == "completed"
    assert im[0]["occurrenceDateTime"] == "2021-06-05"
    assert MockLLMClient().extract_immunizations("nothing medical here.") is None


def test_prune_schema_keeps_relevant_elements():
    xml = (
        "<schema>\n"
        '<node label="patient"><property name="birthDate" type="DATE"/></node>\n'
        '<node label="part"><property name="p_size" type="INT32"/></node>\n'
        "</schema>"
    )
    pruned = MockLLMClient().prune_schema(xml, "How many patients were born in 1990?")
    assert "patient" in pruned
    assert "p_size" not in pruned


def test_entity_keywords():
    ents = MockLLMClient().extract_entity_keywords(
        "Is the patient allergic to 'shellfish'?", "<schema/>"
    )
    assert {"key": "value", "value": "shellfish"} in ents


def test_text2sql_known_and_fallback():
    c = MockLLMClient()
    known = c.text2sql(
        "How many substances cause allergies in the category 'food'?",
        "<schema/>",
        [],
    )
    assert "causes" in known and "COUNT" in known.upper()
    fallback = c.text2sql("Tell me about practitioner workload", "<schema/>", [])
    assert fallback.strip().upper().endswith("LIMIT 10")  # rag.baml:73 rule


def test_synthesize_graph_wins():
    c = MockLLMClient()
    assert c.synthesize("q", "vector says 5", "graph says 7") == "graph says 7"
    assert c.synthesize("q", "vector says 5", "") == "vector says 5"


def test_number_variants_f8():
    from odsc_agentic_ai_summit_2025_spark.functions.text import number_variants

    assert "one" in number_variants("1")
    assert "2" in number_variants("two")
    assert number_variants("13") == ["13"]


# --- r11 tuner-pass rules, pinned per behavior -----------------------------


def test_trailing_credentials_are_not_family_names():
    p = MockLLMClient().extract_patient(
        "Patient named Mrs. Layla Mariko Auer PhD was seen today. "
        "She was born on May 2, 1970."
    )
    assert p["name"]["family"] == "Auer"
    assert p["name"]["given"] == ["Layla", "Mariko"]


def test_all_caps_name_stops_at_prose_verb():
    p = MockLLMClient().extract_patient(
        "DURING AN AMBULATORY VISIT, MRS. MONSERRATE FRANCINA BEDNAR WAS "
        "PROVIDED MEDICAL SERVICES."
    )
    assert p["name"]["family"] == "BEDNAR"
    assert p["name"]["given"] == ["MONSERRATE", "FRANCINA"]


def test_pronoun_after_title_is_not_a_family_name():
    p = MockLLMClient().extract_patient(
        "The individual's name is Avery Faustino Nitzsche and he goes by "
        "the title, Mr. He is male and was born on the 29th of December, "
        "1978."
    )
    assert p["name"]["family"] == "Nitzsche"
    assert p["name"]["given"] == ["Avery", "Faustino"]


def test_former_name_fills_given_for_single_token_lead():
    p = MockLLMClient().extract_patient(
        "Patient: Mrs. Halvorson, previously known as Stacia Tam. She is "
        "a female, born on April 17, 1914."
    )
    assert p["name"]["family"] == "Halvorson"
    assert p["name"]["given"] == ["Stacia"]


def test_latin1_uppercase_tokens_stay_in_the_name():
    p = MockLLMClient().extract_patient(
        "Clinical Note: Ms. Vela underwent an examination. Ms. Soledad "
        "Ángela Vela, a female patient, was born on the 26th of April, "
        "1948."
    )
    assert p["name"]["family"] == "Vela"
    assert p["name"]["given"] == ["Soledad", "Ángela"]


def test_residence_cue_reclaims_street_from_facility_window():
    p = MockLLMClient().extract_patient(
        "This is the medical overview for Mr. Virgil Lawrence Stroman. "
        "Virgil is a male living in Boston, Massachusetts. More "
        "specifically, his residence is at 1048 Koepp Flat, with the "
        "postal code 02116 in the United States."
    )
    assert p["address"]["line"] == "1048 Koepp Flat"
    assert p["address"]["city"] == "Boston"
    assert p["address"]["postalCode"] == "02116"
