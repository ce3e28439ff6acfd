"""Explicit schemas for every table the engine touches.

The reference declares schemas everywhere (BAML classes
``src/baml_src/extract_fhir.baml:1-56``, Kuzu DDL
``src/build_graph.py:19-78``, LanceDB pydantic model
``src/generate_note_embeddings.py:17-23``); inference is used only at
JSON read time. We go further: explicit StructTypes even for JSON, so
a 100 TB read never pays a sampling pass and schema drift fails fast.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Corpus tables (reference data model, SURVEY §1.1)
# ---------------------------------------------------------------------------

# data/note.json — list of {record_id, note} (create_dataset.py:25-27)
NOTES = T.StructType(
    [
        T.StructField("record_id", T.LongType(), False),
        T.StructField("note", T.StringType(), False),
    ]
)

_NAME = T.StructType(
    [
        T.StructField("family", T.StringType()),
        T.StructField("given", T.ArrayType(T.StringType())),
        T.StructField("prefix", T.StringType()),
    ]
)

_ADDRESS = T.StructType(
    [
        T.StructField("line", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postalCode", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)

_SUBSTANCE = T.StructType(
    [
        T.StructField("category", T.StringType()),  # environment|food|medication|other
        T.StructField("name", T.StringType()),
        T.StructField("manifestation", T.ArrayType(T.StringType())),
    ]
)

_ALLERGY = T.StructType([T.StructField("substance", T.ArrayType(_SUBSTANCE))])

_IMMUNIZATION = T.StructType(
    [
        T.StructField("traits", T.ArrayType(T.StringType())),
        T.StructField("status", T.StringType()),  # 'completed' | null
        T.StructField("occurrenceDateTime", T.StringType()),  # ISO-8601 w/ tz
    ]
)

_PRACTITIONER = T.StructType(
    [
        T.StructField("name", _NAME),
        T.StructField("address", _ADDRESS),
        T.StructField("phone", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)

# data/extracted_fhir.json — nested per-patient record
# (src/baml_src/extract_fhir.baml:1-56)
EXTRACTED_FHIR = T.StructType(
    [
        T.StructField("record_id", T.LongType(), False),
        T.StructField("name", _NAME),
        T.StructField("age", T.IntegerType()),
        T.StructField("gender", T.StringType()),  # 'Male'|'Female'|null
        T.StructField("birthDate", T.StringType()),  # ISO date; some year-only
        T.StructField("address", _ADDRESS),
        T.StructField("phone", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("maritalStatus", T.StringType()),
        T.StructField("primaryLanguage", T.StringType()),
        T.StructField("allergy", _ALLERGY),
        T.StructField("immunization", T.ArrayType(_IMMUNIZATION)),
        T.StructField("practitioner", _PRACTITIONER),
    ]
)

# Vector table (src/generate_note_embeddings.py:17-23): row = doc +
# metadata + fixed-size float vector.
NOTE_EMBEDDINGS = T.StructType(
    [
        T.StructField("record_id", T.LongType(), False),
        T.StructField("prefix", T.StringType()),
        T.StructField("surname", T.StringType()),
        T.StructField("given_name", T.StringType()),
        T.StructField("note", T.StringType()),
        T.StructField("vector", T.ArrayType(T.FloatType())),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — declared so scans never infer.
# ---------------------------------------------------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)
