"""BI surface + function/incremental coverage vs DuckDB oracle."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import bi, functional
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(bi.QUERIES))
def test_bi_query_matches_oracle(spark, duck, name):
    compare(bi.QUERIES[name](spark, SF_DIR), duck, bi.ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(functional.QUERIES))
def test_functional_query_matches_oracle(spark, duck, name):
    compare(
        functional.QUERIES[name](spark, SF_DIR), duck, functional.ORACLES[name], name
    )


def test_scd2_intervals_chain_per_key(spark):
    """Per key: exactly one open (current) interval, and each closed
    interval's valid_to equals the next interval's valid_from."""
    from pyspark.sql import functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.plans.functional import inc_scd2_status

    df = inc_scd2_status(spark, SF_DIR)
    opens = (
        df.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert opens == 0
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    chained = df.withColumn("next_from", F.lead("valid_from").over(w)).filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    )
    assert chained.count() == 0
