"""Round-3 TPC-H shapes (Q4/Q6/Q7/Q9/Q17 forms) under the DuckDB
oracle gate."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import tpch3
from oracle_check import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(tpch3.ORACLES))
def test_tpch3_matches_oracle(spark, duck, name):
    compare(tpch3.QUERIES[name](spark, SF_DIR), duck, tpch3.ORACLES[name], name)
