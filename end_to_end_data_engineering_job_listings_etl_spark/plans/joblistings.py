"""The reference pipeline itself, reference-shaped: landing
``job_listings`` → 7 dims + fact + bridge with the reference's own
table and column names. A user of the reference points this at their
landing table and gets the same star schema out.

Reference analog: the whole of ``dags/spark_etl_script.py:41-192``,
rebuilt on this engine's operators:
- UDF ``parse_relative_time`` (:12-29,:86-87) → native expressions
  with an injected deterministic ``now`` (functions/relative_time.py)
- ``monotonically_increasing_id`` natural key (:88) → deterministic
  row_number over the landing's natural ordering (documented
  deviation, SURVEY.md §7.3)
- per-dim select→filter→distinct→row_number (:92-144) → build_dim
- ``from_json`` with the reference's (wrong) array schema (:126) →
  reproduced faithfully: ``job_highlights_array`` is null for every
  object-shaped payload; the corrected map parse ships alongside as
  ``job_highlights_map``
- fact join chain (:157-173) and skill bridge (:175-179) → broadcast
  left joins on the same normalized expressions
- the 9 ``write_to_snowflake`` overwrite sinks (:181-189) →
  ``sinks.writers.overwrite_parquet_table`` / ``write_counted``

Tested end-to-end in tests/test_joblistings.py on a deterministic
synthetic landing (FIXTURES.md fixture-2 shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import date_attributes
from ..functions.keywords import extract_keywords
from ..functions.normalize import norm_initcap, norm_upper, parse_string_array
from ..functions.relative_time import parse_relative_time
from ..operators.dims import build_dim

SKILL_KEYWORDS = (
    "sql", "python", "spark", "aws", "excel", "tableau", "java", "airflow",
    "docker", "kubernetes", "snowflake", "etl",
)


def build_star_schema(
    landing: DataFrame, now: Column | None = None, sk_mode: str = "global"
) -> dict[str, DataFrame]:
    """Landing job_listings → the 9 warehouse tables (reference
    ``dags/spark_etl_script.py:92-189``).

    ``now`` anchors relative-time parsing (pass a literal for
    replayable runs; defaults to current_timestamp() like the
    reference's utcnow())."""
    if now is None:
        now = F.current_timestamp()

    base = landing.withColumn(
        "job_posted_at_ts", parse_relative_time("job_posted_at", now)
    ).withColumn(
        "job_posted_at_utc", F.to_timestamp("job_posted_at_datetime_utc")
    ).withColumn(
        # deterministic natural key (vs monotonically_increasing_id)
        "job_natural_key",
        F.row_number().over(
            Window.orderBy("job_title", "employer_name", "job_posted_at_datetime_utc")
        ),
    )

    dim_company = build_dim(
        base, [norm_upper("employer_name").alias("employer_name")], "company_sk",
        mode=sk_mode,
    )
    dim_publisher = build_dim(
        base, [norm_initcap("job_publisher").alias("publisher_name")], "publisher_sk",
        mode=sk_mode,
    )
    dim_employment_type = build_dim(
        base,
        [norm_initcap("job_employment_type").alias("employment_type_name")],
        "employment_type_sk",
        mode=sk_mode,
    )
    dim_location = build_dim(
        base,
        [
            F.col("job_location"),
            F.col("job_city"),
            F.col("job_state"),
            F.col("job_country"),
        ],
        "location_sk",
        mode=sk_mode,
    )
    dim_date = (
        base.select(*date_attributes("job_posted_at_utc"))
        .filter(F.col("full_date").isNotNull())
        .distinct()
    )

    dim_job_details = base.select(
        F.col("job_natural_key").alias("job_sk"),
        F.trim("job_title").alias("job_title"),
        "job_description",
        # faithful F12: array schema on an object payload → always null
        F.from_json("job_highlights", "array<string>").alias("job_highlights_array"),
        # corrected default the engine actually serves
        F.from_json("job_highlights", "map<string,array<string>>").alias(
            "job_highlights_map"
        ),
        F.col("job_is_remote").cast("boolean").alias("job_is_remote"),
        "job_posted_at",
        "job_posted_at_utc",
    )

    skills = base.select(
        "job_natural_key",
        F.explode(
            F.coalesce(
                parse_string_array("skills"), F.array().cast("array<string>")
            )
        ).alias("skill_raw"),
    ).filter(F.col("skill_raw") != "")
    dim_skill = build_dim(
        skills, [norm_initcap("skill_raw").alias("skill_name")], "skill_sk",
        mode=sk_mode,
    )

    f = base
    j = f.join(
        F.broadcast(dim_company),
        norm_upper(f["employer_name"]) == dim_company["employer_name"],
        "left",
    ).drop(dim_company["employer_name"])
    j = j.join(
        F.broadcast(dim_publisher),
        norm_initcap(j["job_publisher"]) == dim_publisher["publisher_name"],
        "left",
    )
    j = j.join(
        F.broadcast(dim_employment_type),
        norm_initcap(j["job_employment_type"])
        == dim_employment_type["employment_type_name"],
        "left",
    )
    j = j.join(F.broadcast(dim_location), ["job_location", "job_city", "job_state", "job_country"], "left")
    j = j.join(
        F.broadcast(dim_date),
        F.to_date(j["job_posted_at_utc"]) == dim_date["full_date"],
        "left",
    )
    fact = j.select(
        F.row_number().over(Window.orderBy("job_natural_key")).alias("job_posting_pk"),
        F.col("job_natural_key").alias("job_sk"),
        "company_sk",
        "location_sk",
        "date_sk",
        "employment_type_sk",
        "publisher_sk",
        F.lit(1).alias("job_count"),
    )

    bridge = (
        skills.select(
            "job_natural_key", norm_initcap("skill_raw").alias("skill_name")
        )
        .join(F.broadcast(dim_skill), "skill_name")
        .join(
            fact.select("job_posting_pk", "job_sk"),
            F.col("job_natural_key") == F.col("job_sk"),
        )
        .select("job_posting_pk", "skill_sk")
        .distinct()
    )

    return {
        "DIM_COMPANY": dim_company,
        "DIM_PUBLISHER": dim_publisher,
        "DIM_EMPLOYMENT_TYPE": dim_employment_type,
        "DIM_LOCATION": dim_location,
        "DIM_DATE": dim_date,
        "DIM_JOB_DETAILS": dim_job_details,
        "DIM_SKILL": dim_skill,
        "FACT_JOB_POSTINGS": fact,
        "BRIDGE_JOB_SKILL": bridge,
    }


def synth_job_listings(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic reference-shaped landing table (FIXTURES.md
    fixture 2): dirty employment types (en-dash variants), relative
    posting times, JSON-object highlights, serialized skills lists."""
    import json

    from ..sources.readers import JOB_LISTINGS_SCHEMA, conform_schema

    companies = ["acme corp", " ACME CORP", "Globex", "initech ", "Umbrella", "Stark Industries"]
    publishers = ["linkedin", "INDEED", "glassdoor ", "ziprecruiter"]
    emp_types = ["Full-time", "full–time", "Part-time", "CONTRACT", "Full-time and Part-time"]
    cities = [("Washington", "District of Columbia", "US", "Washington, DC"),
              ("Tokyo", "Tokyo", "JP", "Tokyo"),
              ("Pune", "Maharashtra", "IN", "Pune, Maharashtra"),
              ("Moscow", "Moscow", "RU", "Moscow")]
    rel = ["{} hours ago", "{} days ago", "yesterday", "3 weeks ago", "just posted"]
    rows = []
    for i in range(n):
        city, state, country, loc = cities[i % len(cities)]
        sk = sorted({SKILL_KEYWORDS[i % 12], SKILL_KEYWORDS[(i * 5 + 2) % 12]})
        highlights = {
            "Qualifications": [f"{sk[0]} experience", "BS degree"],
            "Benefits": ["health", "dental"] if i % 3 else [],
            "Responsibilities": [f"build {sk[-1]} pipelines"],
        }
        r = rel[i % len(rel)]
        rows.append(
            {
                "job_title": f"  Engineer {i % 17} ",
                "employer_name": companies[i % len(companies)],
                "job_publisher": publishers[i % len(publishers)],
                "job_employment_type": emp_types[i % len(emp_types)],
                "job_description": f"We use {sk[0]} and {sk[-1]} daily. Requires {sk[0]}.",
                "job_is_remote": i % 4 == 0,
                "job_posted_at": r.format((i % 23) + 1),
                "job_posted_at_datetime_utc": f"2025-06-{(i % 28) + 1:02d}T00:00:00.000Z",
                "job_location": loc,
                "job_city": city,
                "job_state": state,
                "job_country": country,
                "job_highlights": json.dumps(highlights),
                "skills": json.dumps(sk),
            }
        )
    return conform_schema(spark.createDataFrame(rows), JOB_LISTINGS_SCHEMA)
