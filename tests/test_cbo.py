"""Cost-based-optimization stats flow: ANALYZE-computed statistics must
actually reach the optimizer (catalog → logical-plan stats), because
profile_catalog_stats only proves the catalog STORES them. With
spark.sql.cbo.enabled, a stats-bearing table's optimized plan carries
the exact rowCount; without ANALYZE only sizeInBytes exists. This is
the feed for stats-informed join reordering on a real cluster."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_analyze_stats_reach_the_optimizer(spark):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        spark.sql("DROP TABLE IF EXISTS t_cbo_orders")
        path = os.path.join(tempfile.mkdtemp(prefix="cbo_t_"), "t")
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey"
        )
        n = orders.count()
        orders.write.option("path", path).saveAsTable("t_cbo_orders")

        # before ANALYZE: no row count in the plan stats
        pre = spark.table("t_cbo_orders")._jdf.queryExecution().optimizedPlan().stats()
        assert "None" in pre.rowCount().toString()

        spark.sql("ANALYZE TABLE t_cbo_orders COMPUTE STATISTICS")
        post = spark.table("t_cbo_orders")._jdf.queryExecution().optimizedPlan().stats()
        assert f"Some({n})" == post.rowCount().toString()

        # filter selectivity estimation consumes column stats
        spark.sql(
            "ANALYZE TABLE t_cbo_orders COMPUTE STATISTICS FOR COLUMNS o_custkey"
        )
        filtered = spark.table("t_cbo_orders").where(F.col("o_custkey") == 1)
        fstats = filtered._jdf.queryExecution().optimizedPlan().stats()
        est = fstats.rowCount()
        # CBO estimates a selective equality filter at far below the
        # table row count (ndv-based) — the signal join reordering uses
        assert est.isDefined() and int(str(est.get())) < n // 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cbo_orders")
        spark.conf.set("spark.sql.cbo.enabled", "false")
