"""Nested-FHIR normalization layer (SURVEY §2.2, P1-P16).

Spark re-expression of the reference's five ``prep_*`` Polars
transforms (src/build_graph.py:82-206): struct unnest, array explode,
array-join, synthetic-key building, year-only date repair, timezone
normalization. All built-ins — no UDFs — so the whole layer stays in
whole-stage codegen.

Key-building note: the reference chains ``.str.replace(r"\\\\.", "")``
intending to strip dots from ids (build_graph.py:88,129,160); the
written pattern matches a literal backslash + any char, so it is a
no-op on this data. We implement the evident intent (strip all
dots); ids remain internally consistent because every producer and
consumer uses the same function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _clean_id(col: F.Column) -> F.Column:
    return F.regexp_replace(F.lower(col), r"\.", "")


def _concat_null(sep: str, *cols: F.Column) -> F.Column:
    """Null-propagating concat with separator.

    Polars ``concat_str`` yields null when ANY part is null
    (build_graph.py:85-88 etc.), and the ingests then drop those rows
    via ``WHERE id IS NOT NULL``. Spark's ``concat_ws`` silently
    skips nulls — which would merge every null-named entity into one
    giant key — so synthetic ids must use plain ``concat``.
    """
    parts: list[F.Column] = []
    for i, c in enumerate(cols):
        if i:
            parts.append(F.lit(sep))
        parts.append(c)
    return F.concat(*parts)


def prep_address(df: DataFrame) -> DataFrame:
    """build_graph.py:82-95 — unnest address, synthetic id
    ``lower(line_postalCode)``, rename line→street."""
    return df.select(
        "record_id",
        _clean_id(_concat_null("_", F.col("address.line"), F.col("address.postalCode"))).alias("id"),
        F.col("address.line").alias("street"),
        F.col("address.city").alias("city"),
        F.col("address.state").alias("state"),
        F.col("address.postalCode").alias("postalCode"),
        F.col("address.country").alias("country"),
    )


def prep_patient(df: DataFrame) -> DataFrame:
    """build_graph.py:98-114 + gender inference from
    ingest_patient_nodes (build_graph.py:232-239)."""
    birth = F.when(
        F.length("birthDate") == 4, F.concat(F.col("birthDate"), F.lit("-01-01"))
    ).otherwise(F.col("birthDate"))
    gender_inferred = (
        F.when(F.lower("gender") == "male", "M")
        .when(F.lower("gender") == "female", "F")
        .when(F.col("name.prefix") == "Mr.", "M")
        .when(F.col("name.prefix").isin("Mrs.", "Ms."), "F")
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        F.col("record_id").alias("patient_id"),
        F.col("name.prefix").alias("prefix"),
        gender_inferred.alias("gender_inferred"),
        F.col("name.family").alias("surname"),
        F.array_join(F.col("name.given"), " ").alias("givenName"),
        birth.cast("date").alias("birthDate"),
        F.col("phone"),
        F.col("email"),
        F.col("maritalStatus"),
        F.col("primaryLanguage"),
    )


def prep_practitioner(df: DataFrame) -> DataFrame:
    """build_graph.py:117-132 — practitioner slug id + name fields."""
    p = F.col("practitioner")
    slug = _clean_id(
        _concat_null(
            "_",
            F.lower(p["name"]["prefix"]),
            F.lower(F.array_join(p["name"]["given"], "_")),
            F.lower(p["name"]["family"]),
        )
    )
    addr = p["address"]
    return df.filter(p.isNotNull()).select(
        "record_id",
        slug.alias("id"),
        p["name"]["family"].alias("surname"),
        F.array_join(p["name"]["given"], "").alias("givenName"),
        # Kuzu stores Practitioner.address as STRING; render the struct
        F.concat_ws(
            ", ", addr["line"], addr["city"], addr["state"], addr["postalCode"], addr["country"]
        ).alias("address"),
        p["phone"].alias("phone"),
        p["email"].alias("email"),
    )


def prep_substance(df: DataFrame) -> DataFrame:
    """build_graph.py:135-171 — explode allergy.substance[], join
    manifestations, synthetic allergy id, lowercase values."""
    base = df.select("record_id", F.col("allergy.substance").alias("substance")).filter(
        F.col("substance").isNotNull()
    )
    ex = base.select("record_id", F.posexplode("substance").alias("pos", "s"))
    sid = _clean_id(
        _concat_null(
            "_",
            F.col("record_id").cast("string"),
            F.lower(F.coalesce(F.col("s.category"), F.lit("unknown"))),
            F.lower(F.coalesce(F.col("s.name"), F.lit("unknown"))),
        )
    )
    return ex.select(
        "record_id",
        F.col("pos").alias("_pos"),
        sid.alias("id"),
        F.lower(F.col("s.name")).alias("name"),
        F.lower(F.col("s.category")).alias("category"),
        F.lower(F.array_join(F.col("s.manifestation"), ", ")).alias("manifestation"),
    )


def prep_immunization(df: DataFrame) -> DataFrame:
    """build_graph.py:174-206 — explode immunization[], tz-normalize
    occurrenceDateTime to naive UTC, drop all-null rows.

    Polars ``explode`` keeps a null row for a null list (then unnest
    yields all-null fields) — Spark's ``explode_outer`` mirrors that;
    the all-null filter afterwards removes those rows in both.
    Timestamp parse is non-strict: unparseable → null (Polars
    strict=False ≡ Spark try to_timestamp).
    """
    ex = df.select(
        "record_id", F.posexplode_outer("immunization").alias("pos", "im")
    )
    # try_to_timestamp ≡ Polars strict=False: malformed values (e.g.
    # date-only) become null instead of raising under ANSI mode. The
    # tz section is optional ([XXX]): the reference's documented
    # counts (65 immunized post-2022, README golden QA) are only
    # reproduced when tz-less datetimes parse as UTC — verified by
    # emulating its MERGE pipeline over the raw JSON.
    ts = F.try_to_timestamp(
        F.col("im.occurrenceDateTime"), F.lit("yyyy-MM-dd'T'HH:mm:ss[XXX]")
    )
    traits = F.array_join(F.col("im.traits"), ", ")
    iid = _concat_null(
        "_",
        F.col("record_id").cast("string"),
        F.lower(F.coalesce(F.col("im.status"), F.lit("unknown"))),
    )
    out = ex.select(
        "record_id",
        F.col("pos").alias("_pos"),
        iid.alias("id"),
        F.lower(F.col("im.status")).alias("status"),
        # session tz is UTC → cast renders the naive-UTC string the
        # reference produces via replace_time_zone (build_graph.py:181-187)
        ts.cast("string").alias("occurrenceDateTime"),
        F.lower(traits).alias("traits"),
        F.col("im.traits").alias("_traits_raw"),
    )
    return out.filter(
        ~(
            F.col("status").isNull()
            & F.col("occurrenceDateTime").isNull()
            & F.col("_traits_raw").isNull()
        )
    ).drop("_traits_raw")  # _pos kept: arrival order for MERGE parity
