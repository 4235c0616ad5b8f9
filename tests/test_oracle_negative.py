"""Negative controls for the oracle harness itself: ``compare`` must
FAIL on row-count, schema, and value drift — otherwise every green
result in the suite is vacuously green. (The driver replays the same
strict comparison; a harness that can't reject is the one failure mode
no per-query test would ever catch.)"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_check import compare

GOOD = "SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus"


def _frame(spark):
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    return (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def test_compare_accepts_matching_results(spark, duck):
    compare(_frame(spark), duck, GOOD, "negctl_match")


def test_compare_rejects_row_count_drift(spark, duck):
    with pytest.raises(AssertionError):
        compare(_frame(spark), duck, GOOD + " LIMIT 1", "negctl_rows")


def test_compare_rejects_value_drift(spark, duck):
    wrong = GOOD.replace("count(*)", "count(*) + 1")
    with pytest.raises(AssertionError):
        compare(_frame(spark), duck, wrong, "negctl_values")


def test_compare_rejects_schema_drift(spark, duck):
    wrong = GOOD.replace("AS n", "AS n_rows")
    with pytest.raises(AssertionError):
        compare(_frame(spark), duck, wrong, "negctl_schema")


def test_compare_rejects_type_representation_drift(spark, duck):
    """The driver hashes str-level cells (oracle_check module
    docstring): an uncast DuckDB sum() (HUGEINT → float64 '123.0')
    must NOT match Spark's int64 '123'."""
    wrong = GOOD.replace("CAST(count(*) AS BIGINT)", "count(*) * 1.0")
    with pytest.raises(AssertionError):
        compare(_frame(spark), duck, wrong, "negctl_repr")
