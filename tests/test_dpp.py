"""Dynamic partition pruning, plan-asserted.

At 100 TB the fact table is partitioned on disk; a join against a
filtered dimension must prune fact partitions AT RUNTIME from the
dimension's build side (static pruning can't see through the join).
This stages a partitioned fact, joins it to a selective dim, and
asserts the scan carries a dynamicpruning subquery — plus that the
pruned result is correct.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from tests.conftest import SF_DIR


def test_dynamic_partition_pruning_fires(spark):
    path = os.path.join(tempfile.gettempdir(), "dpp_fact_orders")
    orders = load_table(spark, SF_DIR, "orders")
    (
        orders.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    # DPP requires a *selective predicate* on the dim side (a bare
    # small table doesn't qualify) — filter 3 statuses down to one
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")],
        "o_orderstatus string, label string",
    ).filter(F.col("label") == "finished")
    joined = fact.join(F.broadcast(dim), "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    n = joined.collect()[0]["n"]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert n == expected and n > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
