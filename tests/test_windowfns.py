"""Window-function / grouping-sets / array-HOF surface vs DuckDB."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import windowfns
from tests.conftest import SF_DIR
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(windowfns.ORACLES))
def test_windowfns_query_matches_oracle(spark, duck, name):
    compare(windowfns.QUERIES[name](spark, SF_DIR), duck, windowfns.ORACLES[name], name)


def test_topk_per_group_bound(spark):
    """No customer carries more than 3 rows, and ranks are 1..k."""
    from pyspark.sql import functions as F

    df = windowfns.w_topk_per_group(spark, SF_DIR)
    worst = (
        df.groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.max("rk").alias("mx"))
        .agg(F.max("n").alias("n"), F.max("mx").alias("mx"))
        .collect()[0]
    )
    assert worst["n"] <= 3 and worst["mx"] <= 3


def test_moving_sum_includes_self(spark):
    """Every trailing-30d sum is at least the row's own price."""
    from pyspark.sql import functions as F

    orders_sum = windowfns.w_moving_sum_30d(spark, SF_DIR)
    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_e2"),
    )
    bad = (
        orders_sum.join(orders, "o_orderkey")
        .filter(F.col("trailing_30d_spend_e2") < F.col("price_e2"))
        .count()
    )
    assert bad == 0


def test_windows_are_partitioned_not_global(spark):
    """Plan check: no single-partition global Window exchange in the
    ranked top-N plan (the W1 scale hazard this module avoids)."""
    plan = windowfns.w_topk_per_group(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
