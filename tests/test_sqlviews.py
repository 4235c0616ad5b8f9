"""SQL entry point vs oracle."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import sqlviews
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(sqlviews.QUERIES))
def test_sql_query_matches_oracle(spark, duck, name):
    compare(sqlviews.QUERIES[name](spark, SF_DIR), duck, sqlviews.ORACLES[name], name)
