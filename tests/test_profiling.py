"""Profiling / data-quality surface under the DuckDB oracle gate."""

from __future__ import annotations

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.plans import profiling
from oracle_check import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(profiling.ORACLES))
def test_profiling_matches_oracle(spark, duck, name):
    compare(
        profiling.QUERIES[name](spark, SF_DIR), duck, profiling.ORACLES[name], name
    )


def test_profile_invariants(spark):
    rows = {
        r["column_name"]: r
        for r in profiling.profile_table(spark, SF_DIR).collect()
    }
    assert set(rows) == set(profiling._PROFILE_COLS)
    for r in rows.values():
        assert 0 <= r["n_nulls"] <= r["n_rows"]
        assert 0 <= r["n_distinct"] <= r["n_rows"] - r["n_nulls"]
    # the PK profile must see every row distinct
    pk = rows["o_orderkey"]
    assert pk["n_distinct"] == pk["n_rows"] - pk["n_nulls"]


def test_dq_detects_injected_violations(spark):
    """The rule expressions actually fire: a frame with known dirt
    yields the expected violation counts (guards against rules that
    are vacuously true)."""
    import pyspark.sql.functions as F

    from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table

    orders = load_table(spark, SF_DIR, "orders")
    dirty = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 100 == 0, -1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    viol = dirty.agg(
        F.sum((F.col("o_totalprice") < 0).cast("bigint")).alias("v")
    ).collect()[0]["v"]
    expected = dirty.filter(F.col("o_orderkey") % 100 == 0).count()
    assert viol == expected > 0
