"""Lineitem-scale analytics vs DuckDB oracle."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import pricing
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(pricing.QUERIES))
def test_pricing_query_matches_oracle(spark, duck, name):
    compare(pricing.QUERIES[name](spark, SF_DIR), duck, pricing.ORACLES[name], name)
