"""Source operators: explicit-schema file scans + the reference's
edge-projection semantics.

Reference analogs:
- S3 per-record projection + null-fill (``dags/test_extraction.py:68-71``)
  and the 15-column target reorder (``:135-146``) → ``conform_schema``.
- S4 JSON list-of-records file source (``:96-97``) → ``read_json_records``.
- S5/S6 JDBC (sub)query scans (``dags/spark_etl_script.py:65-72``;
  ``scripts/pyspark/extract_postgres_table.py:47-56``) → in this engine
  the landing zone is parquet (catalog.py); the incremental predicate
  is a plain Catalyst filter that pushes into the scan.
- K1's CSV is also re-readable here with the landing schema.

Everything takes an explicit StructType: schema-on-read inference is a
startup cost and a drift hazard at 100 TB (and the reference itself
pins its edges with hard-coded column lists — SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixture-1 landing schema (FIXTURES.md): the reference's 15-column
# target list as a declared StructType.
JOB_LISTINGS_SCHEMA = T.StructType(
    [
        T.StructField("job_title", T.StringType()),
        T.StructField("employer_name", T.StringType()),
        T.StructField("job_publisher", T.StringType()),
        T.StructField("job_employment_type", T.StringType()),
        T.StructField("job_description", T.StringType()),
        T.StructField("job_is_remote", T.BooleanType()),
        T.StructField("job_posted_at", T.StringType()),
        T.StructField("job_posted_at_datetime_utc", T.StringType()),
        T.StructField("job_location", T.StringType()),
        T.StructField("job_city", T.StringType()),
        T.StructField("job_state", T.StringType()),
        T.StructField("job_country", T.StringType()),
        T.StructField("job_highlights", T.StringType()),
        T.StructField("skills", T.StringType()),
        T.StructField("ingested_at", T.TimestampType()),
    ]
)


def conform_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project onto a declared schema: missing columns become typed
    nulls, extra columns are dropped, order is fixed, types are cast —
    the reference's dict-get-with-default + target-column-list pattern
    as one declarative select (null-fill S3 + reorder P5)."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for field in schema.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_json_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """List-of-records JSON file (the raw_jobs.json shape): multiLine
    because the file is one JSON array, then conform."""
    return conform_schema(
        spark.read.schema(schema).option("multiLine", "true").json(path), schema
    )


def read_csv_landing(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Header CSV with declared schema (transformed_jobs.csv shape —
    multiline quoted descriptions need the multiLine/escape options)."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
