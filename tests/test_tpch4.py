"""Round-3 TPC-H shapes (Q2/Q5/Q11/Q16/Q20/Q21 adapted forms) under
the DuckDB oracle gate, plus shape assertions on the physical plans
(broadcast dims, no cartesian products)."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import tpch4
from oracle_check import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(tpch4.ORACLES))
def test_tpch4_matches_oracle(spark, duck, name):
    compare(tpch4.QUERIES[name](spark, SF_DIR), duck, tpch4.ORACLES[name], name)


@pytest.mark.parametrize("name", sorted(tpch4.QUERIES))
def test_tpch4_no_cartesian(spark, name):
    plan = (
        tpch4.QUERIES[name](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan or name == "q11_nation_stock_share", (
        # q11's single-row global total rides a broadcast nest — 1 row.
        name
    )


def test_q21_blame_is_exclusive(spark):
    """Every blamed order in the Q21 rollup has exactly one late
    supplier and at least two suppliers — the exists/not-exists
    contract the aggregation re-expresses."""
    import pyspark.sql.functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
            ).cast("int").alias("is_late"),
        )
    )
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("supp_late").alias("n_late")
    )
    blamed_orders = (
        per_os.filter(F.col("supp_late") == 1)
        .join(per_o, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    bad = blamed_orders.filter(
        (F.col("n_late") != 1) | (F.col("n_supp") < 2)
    ).count()
    assert bad == 0
