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
