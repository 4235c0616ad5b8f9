"""Round-2 fact-scale decision-support shapes vs DuckDB oracle."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import tpch_more
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(tpch_more.QUERIES))
def test_tpch_more_matches_oracle(spark, duck, name):
    compare(
        tpch_more.QUERIES[name](spark, SF_DIR), duck, tpch_more.ORACLES[name], name
    )


def test_big_orders_nonempty(spark):
    assert tpch_more.li_big_orders(spark, SF_DIR).limit(1).count() == 1


def test_disjunctive_join_is_not_nested_loop(spark):
    plan = tpch_more.li_disjunctive_part_join(
        spark, SF_DIR
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
